package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LocalRelation, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, ShortType, StringType}

/** Automatic file skipping for point/IN lookups — the optimizer-rule
  * twin of [[graft.ops.Layout.readPrunedEquals]], following the
  * [[MvRewrite]] precedent: register a membership-fingerprint index for
  * a directory once, and every plain `WHERE key = x` / `WHERE key IN
  * (…)` over that directory is rewritten to scan only the files whose
  * fingerprints may hold the probed values — no explicit API call in
  * the query. At 100 TB this turns the commonest needle query (a
  * hash-scattered high-cardinality lookup min/max can never prune)
  * from a full-table scan into O(|files|) driver-side bit tests plus a
  * handful of file reads.
  *
  * STALENESS SAFETY (the fresh-composition rule): the index trails
  * ingestion — a [[graft.streaming.Streams.skippingIndexSink]] version
  * lags by one microbatch, an offline index by however long since the
  * last [[graft.ops.Layout.statsIndexUpdate]]. Files in the scan's
  * listing that the index does NOT cover (the un-indexed tail) are
  * ALWAYS read unpruned, so a key that only exists in a seconds-old
  * file is still found; a stale index can only cost pruning
  * opportunity, never rows. No false negatives end to end: indexed
  * files are pruned by Bloom fingerprints (every ingested value lit
  * its positions), tail files are never pruned at all. The row-level
  * Filter stays in the plan untouched — false-positive files just add
  * a redundant read.
  *
  * Strictly conservative matching: only `Filter` directly over the
  * registered file relation (through a column-pruning Project);
  * equality/IN conjuncts over fingerprinted columns with integral or
  * string literals (the canonical-string rendering the build used is
  * unambiguous for those); range conjuncts (`>`, `>=`, `<`, `<=`,
  * BETWEEN's two halves) over min/max-indexed columns with integral,
  * date, or timestamp literals — the time-range shape over a range- or
  * z-order-clustered layout; prefix predicates (`LIKE 'abc%'` /
  * `startswith`) over min/max-indexed string columns as the
  * [prefix, successor) box — the domain/source filter over a
  * URL-clustered corpus; only unpartitioned layouts (a hive-partitioned scan prunes
  * by partition values the leaf-file listing cannot see). Any failure
  * to resolve the index bails to the original plan with a log line —
  * degraded, never wrong.
  */
object SkipRewrite {

  /** `index` is a THUNK so a versioned registration resolves the
    * freshest committed version at every rewrite; None means "no index
    * available yet" and the rule bails. `location` is the
    * human-readable resolved source for [[registered]] operability.
    * `persistedPath` is set only for [[register]]'s static on-disk
    * index — the path a corpus-mutating maintenance op
    * ([[graft.streaming.Streams.forget]]'s corpus leg) writes the
    * refreshed index back to; a versioned registration maintains
    * itself. */
  final case class Entry(base: String, rootPaths: Set[String],
                         index: () => Option[org.apache.spark.sql.DataFrame],
                         location: () => Option[String],
                         persistedPath: Option[String] = None)

  private val entries =
    new java.util.concurrent.ConcurrentHashMap[String, Entry]()

  private def rootsOf(spark: SparkSession, basePath: String,
                      who: String): Set[String] = {
    val analyzed = spark.read.parquet(basePath).queryExecution.analyzed
    analyzed match {
      case lr: LogicalRelation => lr.relation match {
        case fs: HadoopFsRelation =>
          require(fs.partitionSchema.isEmpty,
            s"$who: $basePath is hive-partitioned — partition pruning " +
              "already covers it, and a leaf-file rewrite would lose the " +
              "directory-encoded partition values")
          fs.location.rootPaths.map(_.toString).toSet
        case _ => throw new IllegalArgumentException(
          s"$who: $basePath is not a file-backed relation")
      }
      case _ => throw new IllegalArgumentException(
        s"$who: $basePath is not a file-backed relation")
    }
  }

  /** Register a PERSISTED fingerprint index
    * ([[graft.ops.Layout.statsIndexFingerprint]] written to parquet)
    * for `basePath`. The index is re-read per rewrite, so refreshing it
    * in place ([[graft.ops.Layout.statsIndexUpdate]] + overwrite) takes
    * effect on the next query with no re-registration. */
  def register(spark: SparkSession, basePath: String, indexPath: String): Unit =
    entries.put(basePath,
      Entry(basePath, rootsOf(spark, basePath, "SkipRewrite.register"),
        () => Some(SparkSession.active.read.parquet(indexPath)),
        () => Some(indexPath), persistedPath = Some(indexPath)))

  /** Register against a [[graft.streaming.Streams.skippingIndexSink]]
    * TARGET DIRECTORY: the freshest committed index version is
    * resolved at every rewrite (per-batch stats rows unioned,
    * compaction-aware), so lookups track the maintained index batch
    * over batch. Before the first committed version the rule bails
    * (full scan — correct, just not pruned). */
  def registerVersioned(spark: SparkSession, basePath: String,
                        targetDir: String): Unit =
    entries.put(basePath,
      Entry(basePath, rootsOf(spark, basePath, "SkipRewrite.registerVersioned"),
        () => graft.streaming.Streams
          .latestSkippingIndex(SparkSession.active, targetDir),
        () => graft.streaming.Streams
          .latestSnapshotPath(SparkSession.active, targetDir)))

  def unregister(basePath: String): Unit = entries.remove(basePath)
  def clear(): Unit = entries.clear()
  private[plans] def isEmpty: Boolean = entries.isEmpty

  /** Operability: each registered base with its CURRENTLY-resolved
    * index path (None = versioned registration with no committed
    * version yet) — the session's answer to "why didn't this lookup
    * prune". */
  def registered: Seq[(String, Option[String])] = {
    import scala.jdk.CollectionConverters._
    entries.values().asScala.toSeq.sortBy(_.base)
      .map(e => (e.base, try e.location() catch {
        case scala.util.control.NonFatal(_) => None
      }))
  }

  /** The registration of a base directory (exact path-string match,
    * the key [[register]]/[[registerVersioned]] stored) — the handle
    * [[graft.streaming.Streams.forget]]'s corpus leg resolves its
    * probe index and write-back path through. */
  def registrationOf(basePath: String): Option[Entry] =
    Option(entries.get(basePath))

  private[plans] def lookup(roots: Set[String]): Option[Entry] = {
    import scala.jdk.CollectionConverters._
    entries.values().asScala.find(_.rootPaths == roots)
  }

  /** The live entries, base-sorted — for
    * [[Acceleration.explainAcceleration]]. */
  private[plans] def allEntries: Seq[Entry] = {
    import scala.jdk.CollectionConverters._
    entries.values().asScala.toSeq.sortBy(_.base)
  }

  // ---- emptied-scan ledger -------------------------------------------
  // The optimizer can remove a scan for reasons SkipRewrite had nothing
  // to do with (constant-false folding, join pruning), so "this scan
  // vanished between analyzed and optimized" does NOT mean "the index
  // pruned it to empty". The rule records the OUTPUT exprIds of every
  // scan it actually rewrites to the empty relation (exprIds are
  // JVM-unique, so entries from other queries can never match this
  // plan's scans); explainAcceleration reports from the ledger instead
  // of inferring from plan-shape subtraction. Bounded FIFO — operability
  // metadata, not a correctness dependency.
  private val emptiedLedger = new java.util.LinkedHashSet[Set[Long]]()

  private[plans] def recordEmptied(outputIds: Set[Long]): Unit =
    emptiedLedger.synchronized {
      emptiedLedger.add(outputIds)
      while (emptiedLedger.size > 256) {
        val it = emptiedLedger.iterator(); it.next(); it.remove()
      }
    }

  /** Did the rule rewrite the scan with these output exprIds to the
    * empty relation? (Force the plan's optimization first.) */
  private[plans] def wasEmptied(outputIds: Set[Long]): Boolean =
    emptiedLedger.synchronized(emptiedLedger.contains(outputIds))
}

object SkipRewriteRule extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan =
    // fast path: no registered indexes (the common session state) must
    // cost nothing per query
    if (SkipRewrite.isEmpty) plan
    else plan.transformUp {
      case f @ Filter(cond, child) if cond.deterministic =>
        try rewrite(f, cond, child).getOrElse(f)
        catch {
          case scala.util.control.NonFatal(ex) =>
            // an unreadable/mis-shaped index must degrade to the full
            // scan, never abort the user's query
            logWarning(s"SkipRewrite: bailing to the full scan " +
              s"(${ex.getMessage})")
            f
        }
    }

  /** The scan under the Filter: the relation itself, or through one
    * column-pruning Project (attributes only — an alias Project is
    * already some other rewrite's output, not a bare scan). */
  private def scanOf(child: LogicalPlan)
      : Option[(LogicalRelation, HadoopFsRelation, Option[Seq[NamedExpression]])] =
    child match {
      case lr: LogicalRelation => lr.relation match {
        case fs: HadoopFsRelation if fs.partitionSchema.isEmpty =>
          Some((lr, fs, None))
        case _ => None
      }
      case Project(pl, lr: LogicalRelation)
          if pl.forall(_.isInstanceOf[AttributeReference]) =>
        lr.relation match {
          case fs: HadoopFsRelation if fs.partitionSchema.isEmpty =>
            Some((lr, fs, Some(pl)))
          case _ => None
        }
      case _ => None
    }

  /** A literal the fingerprint build's `cast(col as string)` rendering
    * is unambiguous for — integral and string types. Doubles/decimals/
    * timestamps have format-dependent renderings; equality lookups on
    * those don't auto-navigate (the explicit readPrunedEquals API still
    * serves them with caller-controlled rendering). */
  private def probeValue(l: Literal): Option[Any] = l.dataType match {
    case StringType => Option(l.value).map(_.toString)
    case ByteType | ShortType | IntegerType | LongType => Option(l.value)
    case _ => None
  }

  /** A literal whose min/max box comparison is exact through `lit()` —
    * integral types, plus dates and timestamps: those are exact
    * integers internally (days / microseconds since epoch), and
    * converting the internal value to its external java type makes
    * `lit()` rebuild a literal of the SAME Catalyst type, so the
    * min/max comparison in `filesForPredicates` is the identical
    * integer compare the row-level Filter performs. No session-tz
    * guard is needed — a TimestampType literal was already resolved to
    * an absolute instant (µs) at analysis time and the index's parquet
    * min/max are instants too, so the comparison never re-interprets
    * wall-clock text (unlike [[MvRewrite]]'s `date_trunc` hierarchy,
    * which re-applies a zone-dependent function and therefore carries
    * its `sameZone` guard). Doubles/decimals stay out: their box
    * compare would be exact too, but equality-style probes on them are
    * rendering-dependent and the stats columns may hold -0.0/NaN
    * subtleties — the explicit readPruned API serves those. */
  private def boundValue(l: Literal): Option[Any] = l.dataType match {
    case ByteType | ShortType | IntegerType | LongType => Option(l.value)
    // string bounds are exact too: the box compare runs Spark-side
    // against Spark-built min/max stats, so both sides use the same
    // UTF8 binary (code-point) ordering the row-level Filter does.
    // Strings never reach the IN-envelope branch (probeValue claims
    // them for fingerprint probing first), so no JVM-side Comparable
    // sort — whose UTF-16 order differs on supplementary characters —
    // ever touches one.
    case StringType => Option(l.value).map(_.toString)
    case org.apache.spark.sql.types.DateType => Option(l.value).map(v =>
      org.apache.spark.sql.catalyst.util.DateTimeUtils
        .toJavaDate(v.asInstanceOf[Int]))
    case org.apache.spark.sql.types.TimestampType => Option(l.value).map(v =>
      org.apache.spark.sql.catalyst.util.DateTimeUtils
        .toJavaTimestamp(v.asInstanceOf[Long]))
    case org.apache.spark.sql.types.TimestampNTZType => Option(l.value).map(v =>
      org.apache.spark.sql.catalyst.util.DateTimeUtils
        .microsToLocalDateTime(v.asInstanceOf[Long]))
    case _ => None
  }

  private def conjunctsOf(ex: Expression): Seq[Expression] = ex match {
    case And(l, r) => conjunctsOf(l) ++ conjunctsOf(r)
    case other => Seq(other)
  }

  private def disjunctsOf(ex: Expression): Seq[Expression] = ex match {
    case Or(l, r) => disjunctsOf(l) ++ disjunctsOf(r)
    case other => Seq(other)
  }

  /** Equality probes the condition implies, per column: `c = v`,
    * `c <=> v` (non-null v), and `c IN (v…)` conjuncts. OR within a
    * column's IN-list, AND across conjuncts — exactly the semantics
    * [[graft.ops.Layout.filesForEqualities]] compiles. */
  private def probesOf(cond: Expression): Seq[(String, Seq[Any])] =
    conjunctsOf(cond).flatMap {
      case EqualTo(a: AttributeReference, l: Literal) =>
        probeValue(l).map(v => (a.name, Seq(v)))
      case EqualTo(l: Literal, a: AttributeReference) =>
        probeValue(l).map(v => (a.name, Seq(v)))
      case EqualNullSafe(a: AttributeReference, l: Literal) if l.value != null =>
        probeValue(l).map(v => (a.name, Seq(v)))
      case EqualNullSafe(l: Literal, a: AttributeReference) if l.value != null =>
        probeValue(l).map(v => (a.name, Seq(v)))
      case In(a: AttributeReference, vs) if vs.forall(_.isInstanceOf[Literal]) =>
        val rendered = vs.map(v => probeValue(v.asInstanceOf[Literal]))
        if (rendered.forall(_.isDefined)) Some((a.name, rendered.map(_.get)))
        else None
      // `k = a OR k = b` is semantically an IN but Spark leaves the Or
      // tree alone — prune it like one when every disjunct is an
      // equality on the SAME column
      case or @ Or(_, _) =>
        val eqs = disjunctsOf(or).map {
          case EqualTo(a: AttributeReference, l: Literal) =>
            probeValue(l).map(v => (a.name, v))
          case EqualTo(l: Literal, a: AttributeReference) =>
            probeValue(l).map(v => (a.name, v))
          case _ => None
        }
        if (eqs.forall(_.isDefined) &&
            eqs.flatMap(_.map(_._1)).distinct.size == 1)
          Some((eqs.head.get._1, eqs.flatten.map(_._2)))
        else None
      // the optimizer converts IN-lists past inSetConversionThreshold
      // (default 10) to InSet — the realistic multi-tenant lookup shape;
      // its values are raw internal Catalyst values, typed by the
      // attribute
      case InSet(a: AttributeReference, hset) if hset.size <= 1024 =>
        val rendered = hset.toSeq.map(v =>
          probeValue(Literal(v, a.dataType)))
        if (rendered.forall(_.isDefined))
          // deterministic probe order: the pruning expression and the
          // surviving file set must not depend on hash-set iteration
          Some((a.name, rendered.map(_.get).sortBy(String.valueOf)))
        else None
      case _ => None
    }

  /** Range bounds the condition implies, per conjunct: `c > v` /
    * `c >= v` contribute a lower bound, `c < v` / `c <= v` an upper —
    * pruned against the min/max stats ([[graft.ops.Layout.statsIndex]]
    * alone serves these; no fingerprints needed). Exclusive bounds are
    * probed inclusively: conservative, never a false negative. This is
    * the time-range dashboard shape over a range- or z-order-clustered
    * layout. */
  private def rangesOf(cond: Expression): Seq[(String, Option[Any], Option[Any])] =
    conjunctsOf(cond).flatMap {
      // an equality whose literal the FINGERPRINT rendering can't serve
      // (dates/timestamps — probeValue rejects them) still box-prunes
      // exactly as the degenerate range [v, v]: the min/max compare is
      // the same integer compare the row filter performs. Probe-able
      // literals stay out of here — probesOf owns them (fingerprint
      // membership beats a box on hash-clustered layouts, and the
      // eqAsRange fallback in rewrite() already covers stats-only
      // columns).
      case EqualTo(a: AttributeReference, l: Literal)
          if probeValue(l).isEmpty =>
        boundValue(l).map(v => (a.name, Some(v), Some(v)))
      case EqualTo(l: Literal, a: AttributeReference)
          if probeValue(l).isEmpty =>
        boundValue(l).map(v => (a.name, Some(v), Some(v)))
      // a date/timestamp IN-list prunes by its [min, max] ENVELOPE — a
      // conservative superset of the OR-of-points (sound: a file whose
      // box misses the envelope misses every point). The common
      // dashboard list is a few adjacent days, where the envelope is
      // nearly as tight as the points; every boundValue output is
      // Comparable, so the natural order is the column's order.
      case In(a: AttributeReference, vs)
          if vs.nonEmpty && vs.forall(v => v.isInstanceOf[Literal] &&
            probeValue(v.asInstanceOf[Literal]).isEmpty) =>
        val bs = vs.map(v => boundValue(v.asInstanceOf[Literal]))
        if (bs.forall(_.isDefined)) {
          val sorted = bs.map(_.get).sortWith((x, y) =>
            x.asInstanceOf[Comparable[Any]].compareTo(y) < 0)
          Some((a.name, Some(sorted.head), Some(sorted.last)))
        } else None
      // prefix predicates over a min/max-indexed STRING column —
      // `url LIKE 'https://en.wikipedia%'`, the domain/path filter of
      // a corpus pipeline: every match lies in [prefix,
      // successor(prefix)) lexicographically, so a URL- or
      // source-clustered layout prunes it like a range. StartsWith is
      // what LikeSimplification rewrites a trailing-% pattern to; a
      // raw Like still prunes by its leading literal run (the row
      // filter enforces the rest of the pattern). The box compare runs
      // Spark-side against Spark-built min/max stats, so both sides
      // order strings identically (UTF8 binary = code-point order).
      case StartsWith(a: AttributeReference, l: Literal)
          if l.dataType == StringType && l.value != null =>
        prefixRange(a.name, l.value.toString)
      case Like(a: AttributeReference, l: Literal, escapeChar)
          if l.dataType == StringType && l.value != null =>
        likePrefix(l.value.toString, escapeChar)
          .flatMap(prefixRange(a.name, _))
      case GreaterThan(a: AttributeReference, l: Literal) =>
        boundValue(l).map(v => (a.name, Some(v), None))
      case GreaterThanOrEqual(a: AttributeReference, l: Literal) =>
        boundValue(l).map(v => (a.name, Some(v), None))
      case LessThan(a: AttributeReference, l: Literal) =>
        boundValue(l).map(v => (a.name, None, Some(v)))
      case LessThanOrEqual(a: AttributeReference, l: Literal) =>
        boundValue(l).map(v => (a.name, None, Some(v)))
      case GreaterThan(l: Literal, a: AttributeReference) =>
        boundValue(l).map(v => (a.name, None, Some(v)))
      case GreaterThanOrEqual(l: Literal, a: AttributeReference) =>
        boundValue(l).map(v => (a.name, None, Some(v)))
      case LessThan(l: Literal, a: AttributeReference) =>
        boundValue(l).map(v => (a.name, Some(v), None))
      case LessThanOrEqual(l: Literal, a: AttributeReference) =>
        boundValue(l).map(v => (a.name, Some(v), None))
      case _ => None
    }

  /** The leading LITERAL run of a LIKE pattern — the chars before its
    * first unescaped wildcard, with escapes resolved. None when the
    * pattern opens with a wildcard (nothing to bound) or is malformed
    * (trailing bare escape — bail, never guess a prefix: a wrong
    * prefix would prune wrongly). A wildcard-free pattern is plain
    * equality and [prefix, successor) still bounds it exactly. */
  private def likePrefix(pattern: String, escapeChar: Char): Option[String] = {
    val sb = new StringBuilder
    var i = 0
    while (i < pattern.length) {
      val c = pattern.charAt(i)
      if (c == escapeChar) {
        if (i + 1 >= pattern.length) return None
        sb.append(pattern.charAt(i + 1)); i += 2
      } else if (c == '%' || c == '_') i = pattern.length
      else { sb.append(c); i += 1 }
    }
    if (sb.isEmpty) None else Some(sb.toString)
  }

  /** The least string GREATER (code-point order — UTF8String's) than
    * every string starting with `prefix`: increment the last char that
    * can be incremented without touching the surrogate range and drop
    * everything after it. None when no char qualifies (all ≥ U+D7FF)
    * — the prefix then prunes lower-bound-only, still sound. */
  private def prefixSuccessor(prefix: String): Option[String] = {
    var i = prefix.length - 1
    while (i >= 0 && prefix.charAt(i) >= '\uD7FF') i -= 1
    if (i < 0) None
    else Some(prefix.substring(0, i) + (prefix.charAt(i) + 1).toChar)
  }

  private def prefixRange(name: String, prefix: String)
      : Option[(String, Option[Any], Option[Any])] =
    if (prefix.isEmpty) None
    else Some((name, Some(prefix),
      prefixSuccessor(prefix).map(s => s: Any)))

  private def uriPath(s: String): String = new java.net.URI(s).getPath

  private def rewrite(f: Filter, cond: Expression,
                      child: LogicalPlan): Option[LogicalPlan] = {
    val (lr, fsRel, projList) = scanOf(child) match {
      case Some(t) => t
      case None => return None
    }
    val roots = fsRel.location.rootPaths.map(_.toString).toSet
    val entry = SkipRewrite.lookup(roots) match {
      case Some(e) => e
      case None => return None
    }
    // disjunctive split: a condition whose conjunct walk yields
    // nothing prunable may still be an OR of independently prunable
    // branches — `ts BETWEEN a AND b OR k IN (…)`, the mixed
    // dashboard shape. Each disjunct's surviving file set
    // over-approximates its matches, so their UNION over-approximates
    // the OR's — sound. Every disjunct must prune (one unprunable
    // branch can match anywhere → the union is the full listing).
    val condParts: Seq[Expression] = {
      val whole = probesOf(cond).nonEmpty || rangesOf(cond).nonEmpty
      if (whole) Seq(cond)
      else cond match {
        case or @ Or(_, _) =>
          val ds = disjunctsOf(or)
          if (ds.forall(d => probesOf(d).nonEmpty || rangesOf(d).nonEmpty))
            ds
          else return None
        case _ => return None
      }
    }
    val idx = entry.index() match {
      case Some(frame) => frame
      case None =>
        logDebug(s"SkipRewrite: ${entry.base} has no committed index " +
          "version yet — full scan")
        return None
    }
    val spark = SparkSession.active
    val fields = idx.schema.fieldNames.toSet
    // only probe what the index can answer: equalities prefer the
    // column's fingerprint; on a stats-only column they box-prune
    // instead — each probed value checked against the [min, max] box
    // individually (a sparse IN-list over a range-clustered layout
    // prunes the gaps between its points), ranges off the same stats.
    val perPart = condParts.map { part =>
      val probes = probesOf(part)
      val ranges = rangesOf(part)
      val usableEq = probes.filter(p =>
        fields.contains(s"fp_${p._1}") && fields.contains("fp_bits"))
      val boxedIn = probes.filter(p =>
        !(fields.contains(s"fp_${p._1}") && fields.contains("fp_bits")) &&
          fields.contains(s"min_${p._1}"))
      val usableRg = ranges.filter(r => fields.contains(s"min_${r._1}"))
      (usableEq, usableRg, boxedIn)
    }
    if (perPart.exists { case (eq, rg, bx) =>
        eq.isEmpty && rg.isEmpty && bx.isEmpty }) return None
    // the scan's OWN listing decides coverage: the rewritten plan must
    // answer over exactly the files the unrewritten scan would read —
    // files the index has not covered yet (the un-indexed tail) are
    // read unpruned, so a seconds-old key is still found
    val baseFiles = fsRel.location.inputFiles
    val keepSets = perPart.map { case (usableEq, usableRg, boxedIn) =>
      val (indexed, survivors) = graft.ops.Layout.filesForPredicates(
        idx, usableEq, usableRg, "SkipRewrite", boxedIn)
      val indexedSet = indexed.map(uriPath).toSet
      val survivorSet = survivors.map(uriPath).toSet
      baseFiles.filter { bf =>
        val p = uriPath(bf)
        !indexedSet.contains(p) || survivorSet.contains(p)
      }.toSet
    }
    val keep = baseFiles.filter(bf => keepSets.exists(_.contains(bf)))
    if (keep.length >= baseFiles.length) {
      logDebug(s"SkipRewrite: index pruned nothing for ${entry.base} — " +
        "plan left untouched")
      return None
    }
    val pruned: LogicalPlan =
      if (keep.isEmpty) {
        SkipRewrite.recordEmptied(lr.output.map(_.exprId.id).toSet)
        LocalRelation(lr.output)
      } else {
        val scan = spark.read.parquet(keep.toIndexedSeq: _*)
          .queryExecution.analyzed
        // re-establish the original output attributes (exprIds) so the
        // Filter above — and everything above it — is untouched
        val aliases = lr.output.map { o =>
          val src = scan.output.find(a =>
            a.name == o.name && a.dataType == o.dataType) match {
            case Some(a) => a
            case None => return None // schema drift: bail, never guess
          }
          Alias(src, o.name)(exprId = o.exprId)
        }
        Project(aliases, scan)
      }
    logInfo(s"SkipRewrite: ${entry.base} lookup pruned to ${keep.length} " +
      s"of ${baseFiles.length} files" +
      (if (condParts.length > 1)
         s" (union of ${condParts.length} disjunct survivor sets)"
       else ""))
    val inner = projList.map(pl => Project(pl, pruned)).getOrElse(pruned)
    Some(Filter(cond, inner))
  }
}
