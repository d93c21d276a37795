package graft.plans

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, ApproximatePercentile, Average, Complete, Count, KllMergeAggDouble, Max, Min, Sum}
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Expand, Filter, Join, JoinHint, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.types.{DoubleType, LongType}

/** Aggregate-navigation (materialized-view rewrite) for maintained
  * [[graft.ops.Cdc.aggSnapshot]] snapshots.
  *
  * The 100 TB pattern: the base fact table is petabytes, its (count,
  * fixed-point sum) snapshot is kilobytes and kept current by
  * [[graft.ops.Cdc.incrementalAggRefresh]] from the change feed. This
  * optimizer rule makes ad-hoc queries benefit WITHOUT opting in:
  * `base.groupBy(keys').agg(count/sum/avg(m))` for any `keys' ⊆ keys`
  * is rewritten to aggregate the snapshot instead — `count(*)` becomes
  * `sum(cnt)`, `sum(m)` becomes `sum(sum_m)/10^scale`, `avg(m)` the
  * quotient — so the petabyte scan becomes a kilobyte one. Coarser
  * groupings re-aggregate the snapshot (sums of sums are exact over
  * the fixed-point LONGs, the property that makes navigation sound).
  *
  * Strictly conservative matching: the aggregate's child must be the
  * registered base relation through column-pruning Projects, plus at
  * most deterministic Filters that reference ONLY snapshot keys (a
  * key-only predicate selects whole groups, so it applies to the
  * snapshot unchanged — `WHERE key = x GROUP BY …` is the bread-and-
  * butter dashboard shape; any predicate touching a measure or other
  * column disqualifies). Grouping must be a subset of the snapshot
  * keys — either plain key columns or registered DERIVED bucket keys
  * (`date_trunc('day', ts)`-style expressions materialized as snapshot
  * key columns; matched semantically like derived measures) — and
  * every aggregate count(*)/count(1)/sum(m)/avg(m) over snapshot
  * measures. Anything else leaves the plan untouched. A `HAVING`
  * (a Filter ABOVE the aggregate, referencing its outputs) composes
  * for free: output attribute ids/names are preserved, so the filter
  * keeps referring to the rewritten aggregate's outputs and the
  * rewrite stays invisible to downstream operators.
  *
  * Semantics note (documented, deliberate): sums come back as the
  * snapshot's exact fixed-point total — summing the raw doubles in a
  * different order can differ in final ULPs; the snapshot's answer is
  * the order-independent one.
  *
  * A `.cache()`d base never navigates: Spark's cache substitution runs
  * BEFORE optimizer extensions, so this rule sees an InMemoryRelation,
  * not the registered file relation — the cache the user explicitly
  * asked for wins, which is the right precedence.
  */
object MvRewrite {

  /** `snapshotPath` is a THUNK so a versioned registration can resolve
    * the freshest `v=<batchId>` at every rewrite — queries against a
    * stream-maintained view then trail the change stream by one
    * microbatch with no re-registration. `tail` (fresh registrations)
    * is called with the resolved snapshot version path and returns the
    * partial-aggregate rows covering base files the snapshot has NOT
    * ingested yet (None = snapshot covers everything); unioning them
    * under the navigation aggregate makes the answer EXACTLY current. */
  final case class Entry(rootPaths: Set[String], keys: Seq[String],
                         measures: Seq[String], scale: Int,
                         snapshotPath: () => String,
                         derived: Seq[(String, Expression)] = Nil,
                         minMax: Seq[String] = Nil,
                         distinct: Seq[String] = Nil,
                         kmvK: Int = graft.functions.Kmv.DefaultK,
                         derivedKeys: Seq[(String, Expression)] = Nil,
                         tuples: Seq[(String, Expression)] = Nil,
                         kll: Seq[String] = Nil,
                         kllK: Int = 200,
                         tail: Option[String => Option[DataFrame]] = None,
                         base: String = "",
                         nullFiltered: Set[String] = Set.empty,
                         staleGate: () => Option[String] = () => None,
                         predicate: Seq[Expression] = Nil)

  /** Keyed by (basePath, sorted key set): ONE BASE MAY CARRY SEVERAL
    * VIEWS — a (flag, status) rollup and a (day) rollup over the same
    * fact register side by side; the rewrite tries the matching views
    * coarsest-first (fewest keys = smallest snapshot) and takes the
    * first that can answer. Re-registering the same (base, keys) pair
    * replaces that view (the refresh idiom). */
  private val entries =
    new java.util.concurrent.ConcurrentHashMap[String, Entry]()

  private def entryKey(basePath: String, keys: Seq[String],
                       predicate: Seq[Expression] = Nil): String =
    basePath + "#" + keys.sorted.mkString(",") +
      // a filtered view keys separately from its unfiltered sibling —
      // a full view and a hot-subset view over the same (base, keys)
      // coexist; re-registering the same (base, keys, predicate) still
      // replaces (the refresh idiom)
      (if (predicate.isEmpty) ""
       else "#" + predicate.map(_.canonicalized.toString).sorted.mkString("&"))

  /** Lookup matches on EXACT root-path sets, so two registrations whose
    * roots intersect but differ (e.g. a parent dir and one partition
    * subdirectory of it) could never both match one scan — one of them
    * would be silently dead, and which one depends on registration
    * order. Fail loudly at register time instead. */
  /** The rewrite replaces sum/avg outputs with DOUBLE expressions while
    * reusing the original exprId — sound only when the original was
    * double-typed, so non-floating measures are rejected up front.
    * Precision contract (documented, deliberate): snapshot sums are
    * per-row `round(m · 10^scale)` fixed-point LONGs, so measures whose
    * values carry more than `scale` decimal digits are answered at
    * that rounding — pick `scale` to cover the measure's precision. */
  private def requireFloatingMeasures(schema: org.apache.spark.sql.types.StructType,
                                      measures: Seq[String], who: String): Unit =
    measures.foreach { m =>
      val dt = schema.find(_.name == m).map(_.dataType).getOrElse(
        throw new IllegalArgumentException(s"$who: measure $m not in base schema"))
      require(dt == DoubleType || dt == org.apache.spark.sql.types.FloatType,
        s"$who: measure $m is ${dt.simpleString} — only double/float measures are " +
          "navigable (the rewrite emits DOUBLE sums/averages; an integral or decimal " +
          "original would silently change type under downstream operators)")
    }

  private def requireNoOverlap(basePath: String, roots: Set[String]): Unit = {
    import scala.jdk.CollectionConverters._
    entries.values().asScala.foreach { other =>
      if (other.base != basePath && other.rootPaths.intersect(roots).nonEmpty)
        throw new IllegalArgumentException(
          s"MvRewrite.register: $basePath overlaps already-registered ${other.base} " +
            s"(shared roots: ${other.rootPaths.intersect(roots).mkString(", ")}) — " +
            "unregister it first or register a disjoint path")
    }
  }

  /** Resolve a registration-time Column against the base relation
    * through the OPTIMIZED plan: the rewrite rule sees query
    * expressions after analysis AND constant folding (lit(1) - x
    * arrives as (1.0 - x), not cast(1 as double) - x), so the stored
    * tree must take the same trip or semantic comparison can never
    * line up. */
  private def resolveAgainst(base: DataFrame, n: String, c: Column,
                             who: String): Expression =
    resolveKeyAgainst(base, n, c, who)._1

  /** Derived-KEY resolution additionally captures the isnotnull
    * filters the expression's own analysis inserted below the Project —
    * `window($"ts", …)` (TimeWindowing) is the canonical case: BOTH the
    * snapshot build (`base.withColumn(n, c)`) and every query grouping
    * by the same formula carry `Filter isnotnull(ts)`, so at rewrite
    * time that conjunct is implied-by-construction and droppable when
    * replaying over the snapshot (whose groups already exclude those
    * rows). */
  private def resolveKeyAgainst(base: DataFrame, n: String, c: Column,
                                who: String): (Expression, Set[String]) =
    base.select(c.as(n)).queryExecution.optimizedPlan match {
      case Project(Seq(al: Alias), child) =>
        val implied = child match {
          case Filter(cond, _) => cond.collect {
            case IsNotNull(a: AttributeReference) => a.name
          }.toSet
          case _ => Set.empty[String]
        }
        (al.child, implied)
      case other => throw new IllegalArgumentException(
        s"$who: cannot resolve $n: $other")
    }

  /** Is `c` guaranteed FALSE-or-filtered on a NULL in column `name` —
    * i.e. does a row surviving `c` certainly have `name` non-null? A
    * conservative whitelist of null-rejecting shapes (comparisons, IN,
    * string predicates); anything else answers false. Used to decide
    * when an `isnotnull` conjunct is implied by its neighbors — both
    * when canonicalizing a registered view predicate and when dropping
    * the query's own inferred `isnotnull` after its implying conjunct
    * was consumed by the predicate match. */
  private[plans] def nullRejectingOn(c: Expression, name: String): Boolean =
    c.references.exists(_.name == name) && (c match {
      case _: EqualTo | _: GreaterThan | _: GreaterThanOrEqual |
           _: LessThan | _: LessThanOrEqual | _: In | _: InSet |
           _: StartsWith | _: EndsWith | _: Contains | _: Like => true
      case _ => false
    })

  private def splitConjuncts(ex: Expression): Seq[Expression] = ex match {
    case And(l, r) => splitConjuncts(l) ++ splitConjuncts(r)
    case other => Seq(other)
  }

  /** Resolve a view PREDICATE against the base through the optimizer
    * (the [[resolveAgainst]] trip — query conjuncts arrive constant-
    * folded, so the stored ones must too), canonicalized to conjuncts
    * with optimizer-inferred `isnotnull`s dropped when another
    * null-rejecting conjunct on the same column already implies them
    * (the query side infers — and we consume — the same way). A
    * predicate the optimizer folds away entirely (tautology) or folds
    * to an empty relation (contradiction) is rejected: the first needs
    * no filtered view, the second describes an empty one. */
  private def resolvePredicate(base: DataFrame, pred: Column,
                               who: String): Seq[Expression] =
    base.filter(pred).queryExecution.optimizedPlan match {
      case Filter(cond, _) =>
        val conjuncts = splitConjuncts(cond)
        conjuncts.filter {
          case nn @ IsNotNull(a: AttributeReference) =>
            !conjuncts.exists(c => !c.fastEquals(nn) && nullRejectingOn(c, a.name))
          case _ => true
        }
      case other => throw new IllegalArgumentException(
        s"$who: predicate ${pred.toString} did not survive optimization as a " +
          s"Filter over the base (got ${other.nodeName}) — a tautology needs " +
          "no filtered view and a contradiction describes an empty one")
    }

  /** The canonical string a composite distinct key hashes —
    * [[graft.ops.Sketches.kmvTupleHash]]'s inner concat, resolved
    * against the base so a query-side `kmv_distinct(concat_ws(…))`
    * matches semantically. */
  private def tupleConcat(cols: Seq[String]): Column = {
    import org.apache.spark.sql.functions.{col, concat_ws}
    concat_ws(graft.ops.Sketches.TupleSep, cols.map(col(_).cast("string")): _*)
  }

  /** Register a maintained snapshot for `basePath`: queries aggregating
    * the base over `keys` (or a subset) on `measures` will read the
    * snapshot parquet at `snapshotPath` instead. The snapshot must be
    * (re)written by the maintenance pipeline; this only records the
    * mapping. */
  def register(spark: SparkSession, basePath: String, keys: Seq[String],
               measures: Seq[String], snapshotPath: String,
               scale: Int = 2, minMaxMeasures: Seq[String] = Nil,
               distinctCols: Seq[String] = Nil,
               kmvK: Int = graft.functions.Kmv.DefaultK,
               distinctTuples: Seq[Seq[String]] = Nil,
               kllCols: Seq[String] = Nil, kllK: Int = 200,
               predicate: Option[Column] = None): Unit =
    registerDerived(spark, basePath, keys, measures, Map.empty, snapshotPath,
      scale, minMaxMeasures, distinctCols, kmvK, Map.empty, distinctTuples,
      kllCols, kllK, predicate)

  /** Like [[register]], plus DERIVED measures (name → Column expression
    * over base columns, e.g. `"disc_price" -> col("l_extendedprice") *
    * (lit(1) - col("l_discount"))`) and DERIVED KEYS (name → bucket
    * expression, e.g. `"day" -> date_trunc("day", col("ts"))` — the
    * dashboard rollup shape). The snapshot must carry `sum_<name>` /
    * the key column built from the same expression
    * (`base.withColumn(name, expr)` before [[graft.ops.Cdc.aggSnapshot]]);
    * queries summing/averaging/grouping by a SEMANTICALLY EQUAL
    * expression are then answered from it. Derived key names must be
    * listed in `keys` (they ARE snapshot keys, just not base columns). */
  /** `predicate` makes the registration a PARTIAL (filtered) view: the
    * snapshot was built over `base.filter(predicate)` only — the
    * "hot subset" MV (this quarter's rows, one tenant, the curated
    * split). A query navigates ONLY when its own predicates contain
    * every conjunct of the view predicate (matched semantically, the
    * derived-formula machinery's equality — exact-conjunct matching,
    * no implication reasoning: `x > 3` does not serve `x > 5`);
    * matched conjuncts are consumed (every snapshot row already
    * passed them), and any residual predicates still face the
    * key-only gate. A query NOT carrying the predicate keeps its
    * direct scan — never answered from a subset. */
  def registerDerived(spark: SparkSession, basePath: String, keys: Seq[String],
                      measures: Seq[String],
                      derived: Map[String, Column],
                      snapshotPath: String, scale: Int = 2,
                      minMaxMeasures: Seq[String] = Nil,
                      distinctCols: Seq[String] = Nil,
                      kmvK: Int = graft.functions.Kmv.DefaultK,
                      derivedKeys: Map[String, Column] = Map.empty,
                      distinctTuples: Seq[Seq[String]] = Nil,
                      kllCols: Seq[String] = Nil, kllK: Int = 200,
                      predicate: Option[Column] = None): Unit = {
    val base = spark.read.parquet(basePath)
    val roots = rootPathsOf(base.queryExecution.analyzed)
      .getOrElse(throw new IllegalArgumentException(
        s"MvRewrite.register: $basePath is not a file-backed relation"))
    requireFloatingMeasures(base.schema, measures, "MvRewrite.register")
    derivedKeys.keys.foreach(n => require(keys.contains(n),
      s"MvRewrite.registerDerived: derived key $n must be listed in keys " +
        "(it is a snapshot key column)"))
    val derivedExprs = derived.toSeq.map { case (n, c) =>
      val resolved = resolveAgainst(base, n, c, "MvRewrite.registerDerived")
      require(resolved.dataType == DoubleType ||
          resolved.dataType == org.apache.spark.sql.types.FloatType,
        s"MvRewrite.registerDerived: derived measure $n is " +
          s"${resolved.dataType.simpleString} — only double/float measures are navigable")
      (n, resolved)
    }
    val derivedKeyResolved = derivedKeys.toSeq.map { case (n, c) =>
      (n, resolveKeyAgainst(base, n, c, "MvRewrite.registerDerived"))
    }
    val derivedKeyExprs = derivedKeyResolved.map { case (n, (ex, _)) => (n, ex) }
    val nullFiltered = derivedKeyResolved.flatMap(_._2._2).toSet
    val tupleExprs = distinctTuples.map(t =>
      (graft.ops.Cdc.tupleSketchName(t),
        resolveAgainst(base, t.mkString("_"), tupleConcat(t),
          "MvRewrite.registerDerived")))
    requireNoOverlap(basePath, roots)
    val predExprs = predicate.map(resolvePredicate(base, _,
      "MvRewrite.registerDerived")).getOrElse(Nil)
    entries.put(entryKey(basePath, keys, predExprs),
      Entry(roots, keys, measures, scale, () => snapshotPath, derivedExprs,
        minMaxMeasures, distinctCols, kmvK, derivedKeyExprs, tupleExprs,
        kllCols, kllK, base = basePath, nullFiltered = nullFiltered,
        predicate = predExprs))
  }

  /** Register against a [[graft.streaming.Streams.aggSnapshotSink]]
    * TARGET DIRECTORY instead of a fixed snapshot file: the freshest
    * committed `v=<batchId>` version is resolved at every rewrite, so
    * a long-lived session's queries track the stream-maintained view
    * batch over batch without re-registering. If no version has
    * committed yet the rule leaves the plan untouched (bail path).
    * Version resolution happens at OPTIMIZATION time: a Dataset handle
    * kept around while the stream advances pins the version it planned
    * against, which the sink's retention may eventually delete — build
    * queries fresh per use (the normal shape), or size
    * `retainVersions` to the longest handle lifetime.
    *
    * `maxPendingFiles` is the STALENESS GATE: a versioned view serves
    * answers one committed microbatch behind by contract, which is
    * usually fine — but when it isn't (the maintaining stream died on
    * Friday, a backfill landed a thousand files), silently serving last
    * week's snapshot is worse than scanning. With the gate set, every
    * rewrite first counts the base files the freshest version's
    * `_files` manifest has NOT covered ([[graft.streaming.Streams
    * .freshnessLagOf]]'s pending count — one base listing, the same
    * listing planning pays anyway) and NAVIGATES ONLY when
    * `pending <= maxPendingFiles`; beyond it the query falls back to
    * the direct scan — always current, just slower — and the bail is
    * recorded in [[recentBails]] with the measured lag. Requires the
    * sink to write manifests (a file-source single-stream
    * aggSnapshotSinkAppendOnly); an unverifiable lag (no manifest, no
    * freshness record) also bails, because unverifiable currency is
    * not currency. */
  def registerVersioned(spark: SparkSession, basePath: String, keys: Seq[String],
                        measures: Seq[String], targetDir: String,
                        scale: Int = 2, minMaxMeasures: Seq[String] = Nil,
                        distinctCols: Seq[String] = Nil,
                        kmvK: Int = graft.functions.Kmv.DefaultK,
                        distinctTuples: Seq[Seq[String]] = Nil,
                        kllCols: Seq[String] = Nil, kllK: Int = 200,
                        derivedKeys: Map[String, Column] = Map.empty,
                        maxPendingFiles: Option[Long] = None): Unit = {
    val e = versionedEntry(spark, basePath, keys, measures, targetDir, scale,
      minMaxMeasures, distinctCols, kmvK, distinctTuples, kllCols, kllK,
      derivedKeys)
    val gated = maxPendingFiles match {
      case None => e
      case Some(max) => e.copy(staleGate = () =>
        try {
          graft.streaming.Streams.freshnessLagOf(
            SparkSession.active, targetDir, Some(basePath)) match {
            case Some(lag) => lag.pendingFiles match {
              case Some(p) if p <= max => None
              case Some(p) => Some(s"staleness gate: $p base files not " +
                s"covered by version ${lag.version} (max $max allowed)")
              case None => Some("staleness gate: version carries no _files " +
                "manifest — lag unverifiable")
            }
            case None => Some("staleness gate: no freshness record yet")
          }
        } catch {
          case scala.util.control.NonFatal(ex) =>
            Some(s"staleness gate unreadable: ${ex.getMessage}")
        })
    }
    entries.put(entryKey(basePath, keys), gated)
  }

  /** [[registerVersioned]] plus EXACTLY-CURRENT answers: the freshest
    * committed snapshot version is composed with a partial aggregate
    * over only the base files its `_files` manifest has NOT covered yet
    * (the post-snapshot tail), merged by the same combinable algebra
    * the snapshot itself is built from — so navigated answers equal the
    * direct aggregate over the CURRENT base, not the base as of one
    * microbatch ago.
    *
    * Contract: the maintaining stream must be
    * [[graft.streaming.Streams.aggSnapshotSinkAppendOnly]] reading
    * `basePath` as a FILE stream (file granularity is what makes
    * "covered" well-defined — file sources ingest whole files
    * atomically), with the same keys/measures/sketch configuration
    * passed here. If a version carries no manifest the rewrite bails to
    * the direct scan (correct, just not navigated) — it never serves a
    * stale answer under a fresh registration.
    *
    * Scale shape: resolving the tail costs one base-directory LISTING
    * per optimization (the same listing the un-navigated scan's
    * planning would do) and scans ONLY the tail files — steady state is
    * a kilobyte snapshot plus the seconds-old files the stream hasn't
    * committed yet.
    *
    * Mixing registrations: freshness is a PER-VIEW property. If the
    * same base also carries a plain versioned view, the coarsest view
    * that can answer wins regardless of freshness — register ALL views
    * of a base fresh (or none) when cross-grouping consistency under
    * lag matters. */
  def registerVersionedFresh(spark: SparkSession, basePath: String,
                             keys: Seq[String], measures: Seq[String],
                             targetDir: String, scale: Int = 2,
                             minMaxMeasures: Seq[String] = Nil,
                             distinctCols: Seq[String] = Nil,
                             kmvK: Int = graft.functions.Kmv.DefaultK,
                             hllCols: Seq[String] = Nil, hllLgK: Int = 12,
                             distinctTuples: Seq[Seq[String]] = Nil,
                             kllCols: Seq[String] = Nil, kllK: Int = 200,
                             derivedKeys: Map[String, Column] = Map.empty): Unit = {
    val e = versionedEntry(spark, basePath, keys, measures, targetDir, scale,
      minMaxMeasures, distinctCols, kmvK, distinctTuples, kllCols, kllK,
      derivedKeys)
    val tailFn: String => Option[DataFrame] = { snapPath =>
      val s = SparkSession.active
      val covered = graft.streaming.Streams.snapshotManifest(s, snapPath)
        .getOrElse(throw new IllegalStateException(
          s"MvRewrite: $snapPath has no _files manifest — fresh composition " +
            "needs aggSnapshotSinkAppendOnly's file accounting"))
      def norm(p: String): String = new org.apache.hadoop.fs.Path(p).toString
      val baseFiles = s.read.parquet(basePath).inputFiles.map(norm)
      // mutation guard: a covered file missing from the live listing
      // means the base was REWRITTEN under the manifest (targetedDelete
      // / offline compaction) — the snapshot still carries the vanished
      // file's surviving rows AND its rewrite outputs would compose as
      // tail, double-counting them. Throwing here surfaces as a
      // recorded bail (degraded to the always-current direct scan,
      // never a wrong dashboard); forget() repairs manifests for its
      // corpus leg.
      val vanished = covered.map(norm).diff(baseFiles.toSet)
      if (vanished.nonEmpty) throw new IllegalStateException(
        s"MvRewrite: ${vanished.size} file(s) covered by $snapPath no " +
          s"longer exist under $basePath (base rewritten under the " +
          "manifest) — fresh composition would double-count the " +
          "rewritten files' surviving rows; re-run the sink or rebuild")
      val tailFiles = baseFiles.filterNot(covered.contains).sorted
      if (tailFiles.isEmpty) None
      else {
        // tail rows must carry the same derived bucket key columns the
        // sink's input stream materialized before snapshotting
        val tailRows = derivedKeys.foldLeft(
          s.read.parquet(tailFiles.toIndexedSeq: _*)) {
          case (df, (n, c)) => df.withColumn(n, c)
        }
        Some(graft.ops.Cdc.aggSnapshotMinMax(tailRows, keys, measures, scale,
          distinctCols, kmvK, hllCols, hllLgK, distinctTuples, kllCols, kllK))
      }
    }
    entries.put(entryKey(basePath, keys), e.copy(tail = Some(tailFn)))
  }

  private def versionedEntry(spark: SparkSession, basePath: String,
                             keys: Seq[String], measures: Seq[String],
                             targetDir: String, scale: Int,
                             minMaxMeasures: Seq[String],
                             distinctCols: Seq[String], kmvK: Int,
                             distinctTuples: Seq[Seq[String]],
                             kllCols: Seq[String], kllK: Int,
                             derivedKeys: Map[String, Column] = Map.empty): Entry = {
    val base = spark.read.parquet(basePath)
    val roots = rootPathsOf(base.queryExecution.analyzed)
      .getOrElse(throw new IllegalArgumentException(
        s"MvRewrite.registerVersioned: $basePath is not a file-backed relation"))
    requireFloatingMeasures(base.schema, measures, "MvRewrite.registerVersioned")
    derivedKeys.keys.foreach(n => require(keys.contains(n),
      s"MvRewrite.registerVersioned: derived key $n must be listed in keys " +
        "(it is a snapshot key column)"))
    val tupleExprs = distinctTuples.map(t =>
      (graft.ops.Cdc.tupleSketchName(t),
        resolveAgainst(base, t.mkString("_"), tupleConcat(t),
          "MvRewrite.registerVersioned")))
    val derivedKeyResolved = derivedKeys.toSeq.map { case (n, c) =>
      (n, resolveKeyAgainst(base, n, c, "MvRewrite.registerVersioned"))
    }
    requireNoOverlap(basePath, roots)
    Entry(roots, keys, measures, scale,
      () => graft.streaming.Streams
        .latestSnapshotPath(SparkSession.active, targetDir)
        .getOrElse(throw new IllegalStateException(
          s"MvRewrite: no committed snapshot version under $targetDir yet")),
      minMax = minMaxMeasures, distinct = distinctCols, kmvK = kmvK,
      derivedKeys = derivedKeyResolved.map { case (n, (ex, _)) => (n, ex) },
      tuples = tupleExprs,
      kll = kllCols, kllK = kllK, base = basePath,
      nullFiltered = derivedKeyResolved.flatMap(_._2._2).toSet)
  }

  /** Operability: the live registry as (basePath, keys) pairs —
    * what a session would print to answer "why did/didn't this query
    * navigate". */
  def registered: Seq[(String, Seq[String])] = {
    import scala.jdk.CollectionConverters._
    entries.values().asScala.map(e => (e.base, e.keys)).toSeq.sortBy(_.toString)
  }

  /** The live entries in [[explainNavigation]]'s display order — for
    * [[Acceleration.explainAcceleration]]'s freshness column. */
  private[plans] def allEntries: Seq[Entry] = {
    import scala.jdk.CollectionConverters._
    entries.values().asScala.toSeq.sortBy(e => (e.base, e.keys.mkString(",")))
  }

  /** Operability: one line per registered view saying whether `df`'s
    * OPTIMIZED plan navigated it — the session's direct answer to "why
    * is this dashboard suddenly scanning the base". A view is NAVIGATED
    * when its resolved snapshot is scanned and its base is not, NOT
    * NAVIGATED when the base is still scanned (the query shape is
    * unanswerable: non-key filters/groupings, unregistered measures, a
    * FILTER clause over row-level predicates, …), and NOT REFERENCED
    * when the plan touches neither. A cached base is called out
    * explicitly (cache substitution precedes optimizer extensions, so
    * a .cache()d base can never navigate — expected Spark precedence). */
  def explainNavigation(df: DataFrame): String =
    explainNavigationFor(df, allEntries)

  /** [[explainNavigation]] over a CALLER-HELD entry snapshot — what
    * lets [[Acceleration.explainAcceleration]] pair each verdict line
    * with its freshness line by position without racing a concurrent
    * register/unregister between two registry reads. */
  private[plans] def explainNavigationFor(df: DataFrame,
                                          es: Seq[Entry]): String = {
    if (es.isEmpty) return "MvRewrite: no views registered"
    val optimized = df.queryExecution.optimizedPlan
    // scheme-insensitive (a registration path "/x" must match the
    // relation's "file:/x")
    def norm(p: String): String = new org.apache.hadoop.fs.Path(p).toUri.getPath
    val scannedRoots: Set[String] = optimized.collect {
      case lr: LogicalRelation => lr.relation match {
        case fs: HadoopFsRelation => fs.location.rootPaths.map(p => norm(p.toString)).toSet
        case _ => Set.empty[String]
      }
    }.flatten.toSet
    val cached = optimized.exists(
      _.isInstanceOf[org.apache.spark.sql.execution.columnar.InMemoryRelation])
    val lines = es.map { e =>
      val head = s"view(base=${e.base}, keys=${e.keys.mkString(",")}" +
        (if (e.predicate.isEmpty) ")"
         else s", where=${e.predicate.map(_.sql).mkString(" AND ")})")
      val snapPath = try Some(e.snapshotPath())
        catch { case _: IllegalStateException => None }
      val baseScanned = e.rootPaths.map(norm).exists(scannedRoots.contains)
      // path-COMPONENT prefix, not raw string prefix: /x/snap must not
      // claim an unrelated sibling /x/snap2's scan as its own. A
      // partials-layout versioned snapshot (v= marker dirs) is scanned
      // through its target's delta/ batch dirs and compact/delta/
      // generations, so those prefixes count as "the snapshot" too.
      val snapScanned = snapPath.exists { p =>
        val pp = new org.apache.hadoop.fs.Path(p)
        val prefixes =
          if (pp.getName.startsWith("v=") && pp.getParent != null) {
            val t = norm(pp.getParent.toString)
            Seq(norm(p), s"$t/delta", s"$t/compact/delta")
          } else Seq(norm(p))
        scannedRoots.exists(r =>
          prefixes.exists(np => r == np || r.startsWith(np + "/")))
      }
      (baseScanned, snapScanned, snapPath) match {
        case (false, true, Some(p)) => s"$head: NAVIGATED — answering from $p"
        case (true, true, Some(p)) => s"$head: PARTIALLY NAVIGATED — $p scanned " +
          "but the base is scanned too (another aggregate in the plan bailed)"
        case (true, _, Some(_)) => s"$head: NOT NAVIGATED — base still scanned " +
          "(query shape unanswerable: non-key filter/grouping, unregistered " +
          "measure, row-level FILTER clause, or a non-inner join)"
        case (true, _, None) => s"$head: NOT NAVIGATED — no committed snapshot version yet"
        case (false, _, _) => s"$head: NOT REFERENCED — the plan does not scan this base"
      }
    }
    val cacheNote = if (cached)
      Seq("note: plan contains an InMemoryRelation — a .cache()d base never " +
        "navigates (cache substitution precedes optimizer extensions)")
    else Nil
    (lines ++ cacheNote).mkString("\n")
  }

  /** Operability: the last few rewrite BAILS (view + shape reason),
    * newest last — "why is the dashboard suddenly scanning the base"
    * answered without re-running anything. Populated whenever a view
    * MATCHED the scanned base but could not answer the query shape
    * (the same events the rule logs at debug level); lookup misses
    * (plan never touched a registered base) don't record. Bounded
    * ring, best-effort under concurrency. */
  private val bailRing =
    new java.util.concurrent.ConcurrentLinkedQueue[String]()
  def recentBails: Seq[String] = {
    import scala.jdk.CollectionConverters._
    bailRing.asScala.toSeq
  }
  private[plans] def noteBail(e: Entry, reason: String): String = {
    val line = s"MvRewrite: view(base=${e.base}, keys=${e.keys.mkString(",")}) " +
      s"did not navigate — $reason"
    bailRing.add(line)
    while (bailRing.size > 32) bailRing.poll()
    line
  }

  /** Remove EVERY view registered for `basePath` (all key sets). To
    * replace one view, just re-register the same (base, keys) pair. */
  def unregister(basePath: String): Unit = {
    import scala.jdk.CollectionConverters._
    entries.asScala.filter(_._2.base == basePath).keys
      .foreach(entries.remove)
  }
  def clear(): Unit = entries.clear()
  private[plans] def isEmpty: Boolean = entries.isEmpty

  private def rootPathsOf(p: LogicalPlan): Option[Set[String]] = p match {
    case Project(pl, child) if pl.forall(_.isInstanceOf[AttributeReference]) =>
      rootPathsOf(child)
    case lr: LogicalRelation => lr.relation match {
      case fs: HadoopFsRelation => Some(fs.location.rootPaths.map(_.toString).toSet)
      case _ => None
    }
    case _ => None
  }

  /** Descend through Projects and DETERMINISTIC Filters to the base
    * relation, collecting the filter conditions and every Project-level
    * alias binding (exprId → defining expression). Pass-through
    * Projects are not just column pruning: the optimizer's
    * PullOutGroupingExpressions hoists a `groupBy(date_trunc(…))` into
    * `Project(date_trunc(…) AS _groupingexpression)` below the
    * Aggregate, so derived-key matching must see THROUGH such aliases —
    * the rewrite inlines the bindings before comparing formulas.
    * Whether the collected filters are answerable (key-only) is decided
    * later, once the matching registry entry is known. */
  private def rootPathsAndFilters(p: LogicalPlan, conds: Seq[Expression],
                                  binds: Map[ExprId, Expression])
      : Option[(Set[String], Seq[Expression], Map[ExprId, Expression])] = p match {
    case Project(pl, child) if pl.forall {
          case _: AttributeReference => true
          case al: Alias => al.child.deterministic
          case _ => false
        } =>
      val newBinds = pl.collect { case al: Alias => al.exprId -> al.child }
      rootPathsAndFilters(child, conds, binds ++ newBinds)
    case Filter(cond, child) if cond.deterministic =>
      rootPathsAndFilters(child, conds :+ cond, binds)
    case lr: LogicalRelation => lr.relation match {
      case fs: HadoopFsRelation =>
        Some((fs.location.rootPaths.map(_.toString).toSet, conds, binds))
      case _ => None
    }
    case _ => None
  }

  /** All views whose root-path set matches the scan, COARSEST FIRST
    * (fewest keys = smallest snapshot; ties broken by key names for
    * determinism) — the rewrite takes the first that can answer. */
  private[plans] def lookup(child: LogicalPlan)
      : Option[(Seq[Entry], Seq[Expression], Map[ExprId, Expression])] =
    rootPathsAndFilters(child, Nil, Map.empty).flatMap { case (roots, conds, binds) =>
      import scala.jdk.CollectionConverters._
      val matches = entries.values().asScala.filter(_.rootPaths == roots)
        .toSeq.sortBy(e => (e.keys.size, -e.predicate.size, e.keys.sorted.mkString(",")))
      if (matches.isEmpty) None else Some((matches, conds, binds))
    }

  /** Every file-relation root anywhere under `p` — the dim-side overlap
    * check for star navigation (a dim subtree that scans the registered
    * base itself is out of the narrow sound case). */
  private def allFileRoots(p: LogicalPlan): Set[String] = p.collect {
    case lr: LogicalRelation => lr.relation match {
      case fs: HadoopFsRelation => fs.location.rootPaths.map(_.toString).toSet
      case _ => Set.empty[String]
    }
  }.flatten.toSet

  /** Star-rollup lookup: FLATTEN a tree of INNER joins (descending
    * through Projects — alias binds collected — and deterministic
    * Filters anywhere on the spine, both of which commute over inner
    * joins) into leaf branches + the pooled condition set. Exactly one
    * branch must descend to a registered base (through its own
    * Projects/Filters); every other branch — the dims, an arbitrary
    * snowflake — must not touch the base. Returns the matching views,
    * ALL collected conditions (join conditions and filters together:
    * the rewrite replays them above a rebuilt
    * `snap ⋈ dim₁ ⋈ … ⋈ dimₙ` chain and the optimizer's own pushdown,
    * running in the same fixed-point batch, re-forms the equi-joins),
    * merged alias bindings, and the untouched dim subtrees. */
  private[plans] def lookupStar(child: LogicalPlan)
      : Option[(Seq[Entry], Seq[Expression], Map[ExprId, Expression],
                Seq[LogicalPlan])] = {
    def flattenJoins(p: LogicalPlan, conds: Seq[Expression],
                     binds: Map[ExprId, Expression])
        : Option[(Seq[LogicalPlan], Seq[Expression], Map[ExprId, Expression])] =
      p match {
        case Project(pl, c) if pl.forall {
              case _: AttributeReference => true
              case al: Alias => al.child.deterministic
              case _ => false
            } =>
          flattenJoins(c, conds, binds ++ pl.collect { case al: Alias => al.exprId -> al.child })
        case Filter(cond, c) if cond.deterministic => flattenJoins(c, conds :+ cond, binds)
        case Join(l, r, Inner, condOpt, _) if condOpt.forall(_.deterministic) =>
          for {
            (lb, lc, lbinds) <- flattenJoins(l, Nil, Map.empty)
            (rb, rc, rbinds) <- flattenJoins(r, Nil, Map.empty)
          } yield (lb ++ rb, conds ++ condOpt.toSeq ++ lc ++ rc,
            binds ++ lbinds ++ rbinds)
        case other => Some((Seq(other), conds, binds))
      }
    flattenJoins(child, Nil, Map.empty).flatMap { case (branches, conds, binds) =>
      if (branches.size < 2) None
      else {
        import scala.jdk.CollectionConverters._
        // exactly ONE branch is the registered fact; a second base-
        // touching branch (self-join) is out of the sound narrow case
        val resolved = branches.map(b => (b, rootPathsAndFilters(b, Nil, Map.empty)))
        val factMatches = resolved.flatMap { case (b, r) =>
          r.flatMap { case (roots, fConds, fBinds) =>
            val matches = entries.values().asScala.filter(_.rootPaths == roots)
              .toSeq.sortBy(e => (e.keys.size, -e.predicate.size, e.keys.sorted.mkString(",")))
            if (matches.isEmpty) None else Some((b, matches, fConds, fBinds))
          }
        }
        factMatches match {
          case Seq((fact, matches, fConds, fBinds)) =>
            val dims = branches.filterNot(_ eq fact)
            val dimRoots = dims.map(allFileRoots).fold(Set.empty)(_ ++ _)
            if (matches.exists(_.rootPaths.intersect(dimRoots).nonEmpty)) None
            else Some((matches, conds ++ fConds, binds ++ fBinds, dims))
          case _ => None
        }
      }
    }
  }

  /** What the grouping-sets rewrite needs to rebuild an Expand over the
    * snapshot: the original node, the positions KEPT in the rebuilt
    * Expand (masked grouping keys + the grouping-id literals — their
    * output attrs survive with their exprIds so the Aggregate above is
    * untouched), and per kept masked position the unmasked expression
    * (key-matched against the registered view in the rewrite). Pass-
    * through positions (identical in every projection row — the
    * measures and unmasked keys) become alias BINDS instead: the
    * aggregate's references inline straight to base expressions and the
    * ordinary measure/key machinery takes over. */
  final case class ExpandInfo(ex: Expand, kept: Seq[Int],
                              masked: Map[Int, Expression])

  /** Rollup/cube/grouping-sets lookup: descend Projects to an Expand
    * whose child reaches a registered base — directly, or through an
    * inner-join STAR ([[lookupStar]]: rollup dashboards over fact ⋈
    * dims, the full BI cube shape; the returned dim subtrees are
    * untouched and the rebuilt Expand passes their attributes
    * through). Classifies every Expand output position as pass-through
    * (all projection rows identical → bind), masked key (one distinct
    * non-null expression + nulls → kept), or literal (the grouping id
    * → kept); any other shape is not a grouping-sets Expand and
    * bails. */
  private[plans] def lookupExpand(child: LogicalPlan)
      : Option[(Seq[Entry], Seq[Expression], Map[ExprId, Expression],
                ExpandInfo, Seq[LogicalPlan])] = {
    def descend(p: LogicalPlan, binds: Map[ExprId, Expression])
        : Option[(Expand, Map[ExprId, Expression])] = p match {
      case Project(pl, c) if pl.forall {
            case _: AttributeReference => true
            case al: Alias => al.child.deterministic
            case _ => false
          } =>
        descend(c, binds ++ pl.collect { case al: Alias => al.exprId -> al.child })
      case ex: Expand => Some((ex, binds))
      case _ => None
    }
    descend(child, Map.empty).flatMap { case (ex, aboveBinds) =>
      rootPathsAndFilters(ex.child, Nil, Map.empty)
        .map { case (roots, conds, cBinds) =>
          import scala.jdk.CollectionConverters._
          val matches = entries.values().asScala.filter(_.rootPaths == roots)
            .toSeq.sortBy(e => (e.keys.size, -e.predicate.size, e.keys.sorted.mkString(",")))
          (matches, conds, cBinds, Seq.empty[LogicalPlan])
        }
        .orElse(lookupStar(ex.child).map { case (ms, conds, sBinds, dims) =>
          (ms, conds, sBinds, dims)
        })
        .flatMap { case (matches, conds, cBinds, dims) =>
          if (matches.isEmpty) None
          else {
            def isNullLit(e: Expression): Boolean = e match {
              case Literal(null, _) => true
              case _ => false
            }
            val kept = Seq.newBuilder[Int]
            val masked = Map.newBuilder[Int, Expression]
            var passBinds = Map.empty[ExprId, Expression]
            var ok = true
            ex.output.indices.foreach { i =>
              val elems = ex.projections.map(_(i))
              val head = elems.head
              if (elems.forall(_.fastEquals(head)) && !isNullLit(head))
                passBinds += ex.output(i).exprId -> head
              else if (elems.forall(_.isInstanceOf[Literal]))
                kept += i // the grouping-id column
              else {
                val nonNull = elems.filterNot(isNullLit).distinct
                if (nonNull.size == 1 &&
                    elems.forall(e => isNullLit(e) || e.fastEquals(nonNull.head))) {
                  kept += i
                  masked += i -> nonNull.head
                } else ok = false
              }
            }
            if (!ok) None
            else Some((matches, conds, aboveBinds ++ cBinds ++ passBinds,
              ExpandInfo(ex, kept.result(), masked.result()), dims))
          }
      }
    }
  }
}

object MvRewriteRule extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan =
    // fast path: with no registered views (the overwhelmingly common
    // session state) the rule must cost nothing per query
    if (MvRewrite.isEmpty) plan
    else plan.transformUp {
      case agg @ Aggregate(groupings, results, child, _) =>
        MvRewrite.lookup(child) match {
          case Some((candidates, filters, binds)) =>
            // coarsest view that can answer wins (lookup pre-sorts)
            candidates.view
              .flatMap(e => rewrite(agg, groupings, results, e, filters, binds,
                None, None))
              .headOption.getOrElse(agg)
          case None =>
            // star rollup: fact ⋈ dim(s) GROUP BY dim attrs — the fact
            // side navigates to its snapshot, the dims stay untouched
            MvRewrite.lookupStar(child) match {
              case Some((candidates, filters, binds, dims)) =>
                candidates.view
                  .flatMap(e => rewrite(agg, groupings, results, e, filters,
                    binds, Some(dims), None))
                  .headOption.getOrElse(agg)
              case None =>
                // rollup/cube/grouping sets: the Expand rebuilds over
                // the snapshot (or over snapshot ⋈ dims for a rollup
                // of a star), masked-key/gid columns untouched
                MvRewrite.lookupExpand(child) match {
                  case Some((candidates, filters, binds, info, dims)) =>
                    candidates.view
                      .flatMap(e => rewrite(agg, groupings, results, e, filters,
                        binds, if (dims.isEmpty) None else Some(dims), Some(info)))
                      .headOption.getOrElse(agg)
                  case None => agg
                }
            }
        }
    }

  /** Control-flow bail: any unanswerable shape aborts the rewrite and
    * leaves the original plan untouched. The reason-carrying form
    * feeds the per-view debug log line and [[MvRewrite.recentBails]];
    * the bare singleton remains for sites whose reason is the generic
    * shape message. */
  private object Unanswerable extends scala.util.control.ControlThrowable
  private final class UnanswerableEx(val reason: String)
      extends scala.util.control.ControlThrowable
  private def bail(reason: String): Nothing = throw new UnanswerableEx(reason)

  /** Two resolutions of the same formula over the same relation carry
    * different exprIds; rebasing every attribute's exprId onto a
    * name-derived constant makes `semanticEquals` compare the SHAPE
    * (with canonicalization's commutativity/case normalizations) while
    * still distinguishing different columns. */
  private def nameNormalized(ex: Expression): Expression = ex.transformUp {
    case a: AttributeReference =>
      AttributeReference(a.name.toLowerCase, a.dataType, nullable = true)(
        exprId = ExprId(a.name.toLowerCase.hashCode.toLong & 0x7fffffffL))
  }

  private def sameFormula(a: Expression, b: Expression): Boolean =
    nameNormalized(a).semanticEquals(nameNormalized(b))

  /** Does truncating to `coarse` commute with FIRST truncating to
    * `fine` — i.e. is every coarse boundary a fine boundary? True along
    * the ascending second→minute→hour→day→month→quarter→year chain,
    * plus week over day-or-finer (week boundaries are midnights).
    * month/quarter/year over week are NOT aligned (months start
    * mid-week), and a finer request can never be served by a coarser
    * key. This is what lets `GROUP BY date_trunc('month', ts)` navigate
    * a DAY-keyed snapshot: month(ts) == month(day(ts)). */
  private val truncLevel = Map(
    "microsecond" -> 0, "millisecond" -> 1, "second" -> 2, "minute" -> 3,
    "hour" -> 4, "day" -> 5, "dd" -> 5, "month" -> 6, "mon" -> 6, "mm" -> 6,
    "quarter" -> 7, "year" -> 8, "yyyy" -> 8, "yy" -> 8)
  private def truncNests(fine: String, coarse: String): Boolean = {
    val f = fine.toLowerCase(java.util.Locale.ROOT)
    val c = coarse.toLowerCase(java.util.Locale.ROOT)
    if (c == "week") truncLevel.get(f).exists(_ <= 5)
    else if (f == "week") false
    else (for { lf <- truncLevel.get(f); lc <- truncLevel.get(c) } yield lf <= lc)
      .getOrElse(false)
  }

  /** Same RESOLVED time zone on both trunc keys — "Etc/UTC" vs "UTC"
    * spellings compare equal, an unresolved (None) side never matches:
    * truncNests only holds when registration and query bucket in the
    * same zone. */
  private def sameZone(a: Option[String], b: Option[String]): Boolean =
    (a, b) match {
      case (Some(za), Some(zb)) =>
        try {
          org.apache.spark.sql.catalyst.util.DateTimeUtils.getZoneId(za)
            .normalized() ==
            org.apache.spark.sql.catalyst.util.DateTimeUtils.getZoneId(zb)
              .normalized()
        } catch { case scala.util.control.NonFatal(_) => false }
      case _ => false
    }

  /** `star` carries the untouched dim subtrees when the aggregate sits
    * over an inner-join tree containing the registered base: the
    * snapshot replaces ONLY the fact branch, so every fact group's
    * join multiplicity — and with it the exactness of every mapped
    * aggregate — is preserved (a group's rows all share the join-key
    * columns the conditions reference, so they match the same dim rows
    * the group-row does). Aggregates over DIM columns navigate by
    * count-weighting (a group-row carries the group once, not cnt
    * times, so sum(dim.x) → sum(dim.x · cnt), integral types only;
    * min/max/count(DISTINCT) are multiplicity-free); aggregates mixing
    * fact and dim references bail. All name-based matching (keys,
    * derived formulas, measures) is guarded by exprId against dim
    * attributes, so a dim column that happens to share a key's name
    * can never cross-match. */
  private def rewrite(orig: Aggregate, groupings: Seq[Expression],
                      results: Seq[NamedExpression],
                      e: MvRewrite.Entry,
                      filters: Seq[Expression],
                      binds: Map[ExprId, Expression],
                      star: Option[Seq[LogicalPlan]],
                      expand: Option[MvRewrite.ExpandInfo]): Option[LogicalPlan] = try {
    // "untouched" attributes — dim-side columns under a star, plus the
    // masked-key/grouping-id columns a grouping-sets Expand keeps: they
    // survive the rewrite with their exprIds, pass through groupings
    // and results unchanged, and may never cross-match a key or
    // measure by name. Kept separate because they behave differently
    // under aggregates: a dim column navigates by count-weighting, a
    // masked/gid column can never (it sees nulls the rebuilt source
    // lacks). Both may be present at once — a rollup OVER a star.
    val keptAttrs: Seq[Attribute] =
      expand.map(i => i.kept.map(i.ex.output)).getOrElse(Nil)
    val keptSet: AttributeSet = AttributeSet(keptAttrs)
    val starDims: AttributeSet =
      star.map(_.map(_.outputSet).fold(AttributeSet.empty)(_ ++ _))
        .getOrElse(AttributeSet.empty)
    val dimOut: AttributeSet = starDims ++ keptSet
    // substitute Project-level alias bindings (PullOutGroupingExpressions'
    // _groupingexpression etc.) until expressions are in terms of base
    // attributes — the form registered formulas were resolved to
    def inline(ex: Expression): Expression = {
      var cur = ex
      var changed = binds.nonEmpty
      while (changed) {
        val next = cur.transformUp {
          case a: Attribute if binds.contains(a.exprId) => binds(a.exprId)
        }
        changed = !next.fastEquals(cur)
        cur = next
      }
      cur
    }
    def isDimOnly(ex: Expression): Boolean =
      ex.references.nonEmpty && ex.references.subsetOf(dimOut)
    // grouping must be snapshot keys: plain key columns, registered
    // derived bucket keys matched semantically (the date_trunc rollup),
    // or a COARSER date_trunc over a registered trunc key (the rollup
    // hierarchy — month(ts) == month(day(ts)) when boundaries nest,
    // truncNests). keyMatch returns the key name plus, for the coarser
    // case, the (format, timeZoneId) to re-apply over the snapshot's
    // bucket column. Anything touching a dim attribute can never be a
    // key of THIS view (names don't transfer across relations —
    // exprIds decide).
    def keyMatch(g: Expression): Option[(String, Option[(String, Option[String])])] = {
      val in = inline(g)
      if (in.references.exists(dimOut.contains)) None
      else in match {
        case a: AttributeReference if e.keys.contains(a.name) => Some((a.name, None))
        case Alias(ex, _) => keyMatch(ex)
        case ex =>
          e.derivedKeys.collectFirst {
            case (n, d) if sameFormula(d, ex) => (n, None)
          }.orElse(ex match {
            case TruncTimestamp(Literal(fmtQ, org.apache.spark.sql.types.StringType), inner, tz) =>
              e.derivedKeys.collectFirst {
                // the registered key's zone must MATCH the query's:
                // month/quarter/week boundaries in the query tz only
                // align with stored day buckets computed in the SAME
                // zone — a wildcard here would navigate a
                // registered-in-UTC snapshot from a +05:30 session and
                // silently mis-bucket every boundary-straddling row
                case (n, TruncTimestamp(Literal(fmtK, org.apache.spark.sql.types.StringType), innerK, tzK))
                    if truncNests(fmtK.toString, fmtQ.toString) &&
                      sameFormula(inner, innerK) && sameZone(tzK, tz) =>
                  (n, Some((fmtQ.toString, tz)))
              }
            case _ => None
          })
      }
    }
    def keyNameOpt(g: Expression): Option[String] = keyMatch(g).map(_._1)
    val groupNames = groupings.flatMap { g =>
      if (isDimOnly(inline(g))) None // dim grouping: passes through untouched
      else Some(keyNameOpt(g).getOrElse(bail(
        s"grouping expression ${g.sql} is not a snapshot key " +
          "(plain key column, registered derived bucket key, or a " +
          "coarser date_trunc over one)")))
    }
    // filters are answerable only when they select WHOLE groups — i.e.
    // reference nothing but snapshot keys (inlined: a filter over a
    // projected rename of a key still selects whole groups). A
    // registered derived bucket key is a key too, just spelled as a
    // formula: `WHERE date_trunc('month', ts) BETWEEN a AND b` is
    // constant within each month-group, so substituting the matched
    // formula with the snapshot's bucket column keeps whole-group
    // selection — the dashboard time-range shape navigates. A predicate
    // mixing bucket and RAW timestamp terms still bails: the leftover
    // raw reference fails the key-only check below.
    def bucketize(cond: Expression): Expression =
      if (e.derivedKeys.isEmpty) cond
      else cond.transformUp {
        case ex if !ex.isInstanceOf[AttributeReference] =>
          keyMatch(ex).map {
            case (n, None) =>
              AttributeReference(n, ex.dataType, nullable = true)(): Expression
            case (n, Some((fmt, tz))) =>
              // coarser trunc: re-apply over the bucket key column —
              // a year-range predicate navigates a day-keyed snapshot
              TruncTimestamp(Literal(fmt),
                AttributeReference(n, org.apache.spark.sql.types.TimestampType,
                  nullable = true)(), tz): Expression
          }.getOrElse(ex)
      }
    def conjunctsOf(ex: Expression): Seq[Expression] = ex match {
      case And(l, r) => conjunctsOf(l) ++ conjunctsOf(r)
      case other => Seq(other)
    }
    // an `isnotnull(c)` conjunct the derived-key registration implied
    // (window()'s TimeWindowing filter) is already baked into the
    // snapshot's groups — drop it rather than reject the query
    val allFilters = filters.flatMap(f => conjunctsOf(inline(f)))
      .filterNot {
        case IsNotNull(a: AttributeReference) =>
          !dimOut.contains(a) && e.nullFiltered.contains(a.name)
        case _ => false
      }
      .map(bucketize)
    // PARTIAL (filtered) view: the snapshot holds only base rows that
    // passed the registered predicate, so the query must be at least
    // as selective — every predicate conjunct must appear semantically
    // among the query's own fact-side conjuncts (exact-conjunct match,
    // no implication reasoning: `x > 3` never serves `x > 5`). Matched
    // conjuncts are CONSUMED — every snapshot row passed them at build
    // time, so replaying them is unnecessary (and impossible: they may
    // reference non-key columns the snapshot doesn't carry). The
    // query's own optimizer-inferred `isnotnull`s whose implying
    // conjunct was just consumed go with it (same null-rejecting
    // whitelist the registration canonicalized by); a query NOT
    // carrying the predicate bails to its always-complete direct scan.
    val inlinedFilters =
      if (e.predicate.isEmpty) allFilters
      else {
        def factOnly(q: Expression): Boolean =
          q.references.nonEmpty && !q.references.exists(dimOut.contains)
        var rem = allFilters
        e.predicate.foreach { p =>
          val i = rem.indexWhere(q => factOnly(q) && sameFormula(q, p))
          if (i < 0) bail(s"view is filtered on ${p.sql}, which the " +
            "query's own predicates do not contain — a partial view " +
            "answers only queries at least as selective")
          rem = rem.patch(i, Nil, 1)
        }
        rem.filterNot {
          case IsNotNull(a: AttributeReference) if !dimOut.contains(a) =>
            e.predicate.exists(MvRewrite.nullRejectingOn(_, a.name))
          case _ => false
        }
      }
    // answerable filters select WHOLE fact groups: every reference is a
    // dim attribute (evaluated per joined pair, untouched) or a snapshot
    // key (constant within a group)
    inlinedFilters.foreach(_.references.foreach(a =>
      if (!dimOut.contains(a) && !e.keys.contains(a.name)) bail(
        s"filter references ${a.name}, which is neither a snapshot key " +
          "nor a dim attribute — a non-key predicate selects partial " +
          "groups the snapshot cannot see")))

    val spark = SparkSession.active
    // versioned registrations resolve their freshest committed version
    // here; "no version yet" means the view can't answer — bail clean
    val snapPath =
      try e.snapshotPath()
      catch { case ex: IllegalStateException => bail(ex.getMessage) }
    // staleness gate (registerVersioned's maxPendingFiles): a view
    // whose maintained snapshot trails its base by more than the
    // registration allows must NOT answer — the direct scan is always
    // current, so bailing is the correct-and-fresh degradation. The
    // gate's own failure (unreadable freshness record) also bails:
    // unverifiable currency is not currency.
    e.staleGate() match {
      case Some(reason) => bail(reason)
      case None =>
    }
    // a snapshot that fails to READ (deleted by retention between
    // resolution and planning, torn directory, wrong path) must degrade
    // to the unrewritten plan — never abort the user's query. Same for
    // a fresh registration whose tail can't be resolved (missing
    // manifest, mismatched schema): bail — NEVER serve stale under a
    // fresh contract.
    val snap =
      try {
        // layout-aware: a partials-layout versioned snapshot resolves to
        // its delta/compact layers — for an append-only target as RAW
        // per-batch partials (several rows per key whose columns are all
        // mergeable), which is sound everywhere below because every
        // rewritten aggregate merges snapshot rows anyway: sums/counts
        // add, min/max combine, sketches union, count(DISTINCT key)
        // dedups, and the star count-weighting is linear in cnt. A
        // retraction target comes back pre-folded (fully-retracted keys
        // must vanish, which only the fold can decide).
        val snapDf = graft.streaming.Streams.readSnapshotVersion(spark, snapPath)
        val combined = e.tail.flatMap(f => f(snapPath)) match {
          case Some(tailPartials) => snapDf.unionByName(tailPartials)
          case None => snapDf
        }
        combined.queryExecution.analyzed
      } catch {
        case scala.util.control.NonFatal(ex) =>
          // loud degradation: "why is my query suddenly slow / not
          // navigated" must be answerable from the log, not archaeology
          logWarning(s"MvRewrite: view over ${e.base} cannot answer from " +
            s"$snapPath (${ex.getMessage}) — falling back to the direct scan")
          bail(s"snapshot $snapPath unreadable: ${ex.getMessage}")
      }
    def snapAttr(name: String): Attribute =
      snap.output.find(_.name == name).getOrElse(throw Unanswerable)
    // the snapshot-side expression for a key-valued query expression:
    // the key column itself, or a coarser trunc re-applied over it
    def keySubst(ex: Expression): Option[Expression] = keyMatch(ex).map {
      case (n, None) => snapAttr(n)
      case (n, Some((fmt, tz))) => TruncTimestamp(Literal(fmt), snapAttr(n), tz)
    }
    val unit = math.pow(10, e.scale)

    // an aggregate's FILTER clause navigates when it selects WHOLE
    // groups — same gate as the outer filters: every reference a
    // snapshot key (constant within a group) or a dim attribute
    // (evaluated per joined pair, untouched), derived-key formulas
    // substituted. The navigated clause replays INSIDE the rewritten
    // aggregate over the snapshot's columns; any other FILTER bails
    // (a per-row subset is invisible to group rows).
    def navFilter(filt: Option[Expression]): Option[Expression] = filt.map { f =>
      val fx = bucketize(inline(f))
      fx.references.foreach(a =>
        if (!dimOut.contains(a) && !e.keys.contains(a.name)) bail(
          s"aggregate FILTER clause references ${a.name} — a row-level " +
            "subset is invisible to the snapshot's group rows"))
      fx.transform {
        case a: AttributeReference if !dimOut.contains(a) => snapAttr(a.name)
      }
    }

    // the optimizer runs AFTER analysis: no implicit coercions happen
    // anymore, so every type adjustment must be an explicit Cast
    def sumOf(a: Attribute, filt: Option[Expression] = None): Expression =
      AggregateExpression(Sum(a), Complete, isDistinct = false, filter = filt)
    def sumAsDouble(a: Attribute, filt: Option[Expression] = None): Expression =
      Cast(sumOf(a, filt), DoubleType)

    // resolve a summed/averaged expression to a snapshot measure: a
    // plain registered column, or a derived measure whose registered
    // formula is semantically equal (both sides went through the same
    // analysis, so coercions/promotions line up)
    def measureName(ex0: Expression): String = inline(ex0) match {
      case ar: AttributeReference if e.measures.contains(ar.name) => ar.name
      case other => e.derived.collectFirst {
        case (n, d) if sameFormula(d, other) => n
      }.getOrElse(bail(s"aggregate argument ${other.sql} is not a " +
        "registered measure or derived-measure formula"))
    }

    // a distinct-count target resolves through the implicit string cast
    // kmv_distinct's analysis inserts (approx_count_distinct takes the
    // raw attribute); only columns registered as distinctCols carry a
    // sketch in the snapshot
    def distinctAttr(ex0: Expression): Option[String] = (inline(ex0) match {
      case ar: AttributeReference => Some(ar.name)
      case Cast(ar: AttributeReference, _, _, _) => Some(ar.name)
      case _ => None
    }).filter(e.distinct.contains)

    // a COMPOSITE distinct target: kmv_distinct over the canonical
    // concat_ws tuple encoding (Sketches.kmvTupleHash's inner string)
    // resolves to the registered tuple's snapshot sketch column
    def tupleSketch(ex0: Expression): Option[String] = {
      val inner = inline(ex0) match {
        case Cast(c, _, _, _) => c
        case other => other
      }
      e.tuples.collectFirst { case (n, t) if sameFormula(t, inner) => n }
    }

    def kllAttr(ex0: Expression): Option[String] = (inline(ex0) match {
      case ar: AttributeReference => Some(ar.name)
      case _ => None
    }).filter(e.kll.contains)

    // total NON-NULL count of a measure across the groups being merged —
    // the denominator SQL's NULL-skipping avg needs (count(*) would
    // overweight NULL-bearing groups), and the sentinel that tells an
    // all-NULL group's sum (NULL) apart from a genuine zero total
    def nnCnt(m: String, filt: Option[Expression] = None): Expression =
      Coalesce(Seq(sumOf(snapAttr(s"cnt_$m"), filt), Literal(0L, LongType)))

    // untouched-attr guard, checked by exprId up front so no name-based
    // case below can ever cross-match a dim/kept attribute. Under a
    // grouping-sets EXPAND an aggregate over a masked key sees nulls
    // the snapshot key column doesn't — bail. Under a STAR an aggregate
    // FUNCTION over dim columns IS answerable by count-weighting (the
    // dedicated case below), but only when the function references dims
    // EXCLUSIVELY — a mixed fact+dim function bails here, before any
    // name-matched fact case could see it. The FILTER clause is gated
    // separately (navFilter accepts keys and dims), so
    // `sum(m) FILTER (WHERE dim.x = …)` stays navigable.
    if (expand.isDefined) results.foreach(_.foreach {
      case ae: AggregateExpression
          if ae.references.exists(keptSet.contains) => bail(
        s"aggregate ${ae.sql} reads a masked grouping-sets key — it sees " +
          "nulls the rebuilt source lacks")
      case _ =>
    })
    if (star.isDefined) results.foreach(_.foreach {
      case ae: AggregateExpression =>
        val fnRefs = inline(ae.aggregateFunction).references
        if (fnRefs.exists(starDims.contains) && !fnRefs.subsetOf(starDims))
          bail(s"aggregate ${ae.sql} mixes fact and dim references — " +
            "count-weighting is only sound for dim-exclusive functions")
      case _ =>
    })
    // map each result expression onto the snapshot; bail on anything
    // the snapshot can't answer exactly. Sum/avg rewrites emit DOUBLE:
    // only a double-typed original may be replaced, or the attribute's
    // type would silently change under downstream operators (register
    // already rejects non-floating measures; derived expressions can
    // still surface e.g. a LONG sum, so the guard stays here too).
    val mapped: Seq[NamedExpression] = results.map {
      // a dim attribute passes through — the dim subtree is untouched,
      // so its exprIds stay valid under the rewritten join
      case a: AttributeReference if dimOut.contains(a) => a
      // a bare grouping attribute: a plain key column, or an attribute
      // whose Project-level binding IS a derived bucket key (window()'s
      // TimeWindowing aliases the struct below the Aggregate, so the
      // output arrives un-aliased) — or, under star, a dropped-Project
      // alias of a dim-only expression, re-emitted inline
      case a: AttributeReference if isDimOnly(inline(a)) =>
        Alias(inline(a), a.name)(exprId = a.exprId)
      case a: AttributeReference if keyNameOpt(a).exists(groupNames.contains) =>
        Alias(keySubst(a).get, a.name)(exprId = a.exprId)
      // an aggregate-free output is a function of grouping keys (Spark
      // enforces that) — a grouping expression surfaced as an alias
      // (PullOutGroupingExpressions' shape), or an expression DERIVED
      // from one, e.g. `window.start` after the optimizer collapses a
      // post-aggregate Project into the Aggregate. Substitute every
      // key-valued subexpression with its snapshot column; leftover
      // base references mean the snapshot can't reproduce it — bail.
      // (Inlined first: a dropped Project's alias must not leak into
      // the rebuilt plan; dim references survive untouched.)
      case al @ Alias(ex, name)
          if !ex.exists(_.isInstanceOf[AggregateExpression]) =>
        val sub = inline(ex).transformDown {
          case a: AttributeReference if dimOut.contains(a) => a
          case ex2 if keyNameOpt(ex2).exists(groupNames.contains) =>
            keySubst(ex2).get
        }
        if (!sub.references.subsetOf(AttributeSet(snap.output) ++ dimOut))
          throw Unanswerable
        Alias(sub, name)(exprId = al.exprId)
      // STAR dim-attribute aggregates — the other half of the BI rollup
      // (`fact ⋈ dim GROUP BY dim.a` aggregating dim columns). The
      // rewritten plan carries each (fact-group, dim-row) pair ONCE
      // where the original join carried it cnt(group) times, so
      // row-weighted aggregates over dim columns re-weight by the
      // snapshot's cnt. Exactness: integral inputs only — Σ x·cnt is
      // identical to adding x cnt-times in the integers (mod 2⁶⁴, so
      // even wraparound agrees), and avg divides the same exact integer
      // operands on both sides below 2⁵³. min/max/count(DISTINCT) are
      // multiplicity-free and pass through for ANY type. A fractional
      // dim attribute bails: x+x+x ≠ 3·x in IEEE in general, which
      // would break exact-answer navigation.
      case al @ Alias(AggregateExpression(fn, _, isDistinct, filt, _), name)
          if star.isDefined && {
            val refs = inline(fn).references
            refs.nonEmpty && refs.subsetOf(starDims)
          } =>
        def integral(dt: org.apache.spark.sql.types.DataType): Boolean = dt match {
          case org.apache.spark.sql.types.ByteType |
               org.apache.spark.sql.types.ShortType |
               org.apache.spark.sql.types.IntegerType | LongType => true
          case _ => false
        }
        val cntA = snapAttr("cnt")
        val nf = navFilter(filt)
        def weighted(ex: Expression): Expression =
          Multiply(Cast(inline(ex), LongType), cntA)
        def nnWeight(ex: Expression): Expression =
          Coalesce(Seq(AggregateExpression(
            Sum(If(IsNotNull(inline(ex)), cntA, Literal(0L, LongType))),
            Complete, isDistinct = false, filter = nf), Literal(0L, LongType)))
        (fn, isDistinct) match {
          case (Count(args), true) =>
            Alias(AggregateExpression(Count(args.map(inline)), Complete,
              isDistinct = true, filter = nf), name)(exprId = al.exprId)
          // distinct SKETCHES over dim values are multiplicity-free
          // too (KMV and HLL insertion are idempotent per value), so
          // they pass through over the rebuilt join — same estimator,
          // same result. ApproximatePercentile is NOT (quantiles
          // weight by row count) and falls to the bail below.
          case (kd: graft.functions.KmvDistinct, false) =>
            Alias(AggregateExpression(kd.copy(child = inline(kd.child)),
              Complete, isDistinct = false, filter = nf), name)(exprId = al.exprId)
          case (h: org.apache.spark.sql.catalyst.expressions.aggregate.HyperLogLogPlusPlus, false) =>
            Alias(AggregateExpression(h.copy(child = inline(h.child)),
              Complete, isDistinct = false, filter = nf), name)(exprId = al.exprId)
          case (Count(Seq(ex)), false) if !ex.isInstanceOf[Literal] =>
            Alias(nnWeight(ex), name)(exprId = al.exprId)
          case (Sum(ex, _), false) if integral(ex.dataType) =>
            if (al.dataType != LongType) throw Unanswerable
            Alias(AggregateExpression(Sum(weighted(ex)), Complete,
              isDistinct = false, filter = nf), name)(exprId = al.exprId)
          case (Average(ex, _), false) if integral(ex.dataType) =>
            if (al.dataType != DoubleType) throw Unanswerable
            Alias(If(EqualTo(nnWeight(ex), Literal(0L, LongType)),
              Literal(null, DoubleType),
              Divide(Cast(AggregateExpression(Sum(weighted(ex)), Complete,
                isDistinct = false, filter = nf), DoubleType),
                Cast(nnWeight(ex), DoubleType))), name)(exprId = al.exprId)
          case (Min(ex), false) =>
            Alias(AggregateExpression(Min(inline(ex)), Complete,
              isDistinct = false, filter = nf), name)(exprId = al.exprId)
          case (Max(ex), false) =>
            Alias(AggregateExpression(Max(inline(ex)), Complete,
              isDistinct = false, filter = nf), name)(exprId = al.exprId)
          case _ => throw Unanswerable
        }
      // a FILTER clause in any pattern below navigates ONLY through
      // navFilter's whole-group gate (keys/dims); anything else throws
      // Unanswerable there — a per-row FILTER can never silently drop
      case al @ Alias(AggregateExpression(Count(Seq(Literal(_, _))), _, false, filt, _), name) =>
        Alias(Coalesce(Seq(sumOf(snapAttr("cnt"), navFilter(filt)),
          Literal(0L, LongType))), name)(exprId = al.exprId)
      // count(m) — the measure's non-null count is maintained exactly
      case al @ Alias(AggregateExpression(Count(Seq(ar: AttributeReference)), _, false, filt, _), name)
          if e.measures.contains(ar.name) =>
        Alias(nnCnt(ar.name, navFilter(filt)), name)(exprId = al.exprId)
      // count(DISTINCT key[, key…]) over SNAPSHOT KEYS is exact: the
      // snapshot holds one row per live group, so distinct key
      // combinations are identical by construction (refresh drops
      // cnt=0 groups; NULL keys form their own group and count
      // semantics skip them identically on both sides). Derived bucket
      // keys match by formula like everywhere else — count(DISTINCT
      // date_trunc('day', ts)) = "days present", a snapshot lookup.
      case al @ Alias(AggregateExpression(Count(args), _, true, filt, _), name)
          if args.nonEmpty && args.forall(a => keyNameOpt(a).isDefined) =>
        Alias(AggregateExpression(
          Count(args.map(a => keySubst(a).getOrElse(throw Unanswerable))),
          Complete, isDistinct = true, filter = navFilter(filt)),
          name)(exprId = al.exprId)
      case al @ Alias(AggregateExpression(Sum(ex, _), _, false, filt, _), name) =>
        if (al.dataType != DoubleType) throw Unanswerable
        val m = measureName(ex)
        val nf = navFilter(filt)
        Alias(If(EqualTo(nnCnt(m, nf), Literal(0L, LongType)),
          Literal(null, DoubleType),
          Divide(sumAsDouble(snapAttr(s"sum_$m"), nf), Literal(unit))),
          name)(exprId = al.exprId)
      case al @ Alias(AggregateExpression(Average(ex, _), _, false, filt, _), name) =>
        if (al.dataType != DoubleType) throw Unanswerable
        val m = measureName(ex)
        val nf = navFilter(filt)
        Alias(If(EqualTo(nnCnt(m, nf), Literal(0L, LongType)),
          Literal(null, DoubleType),
          Divide(Divide(sumAsDouble(snapAttr(s"sum_$m"), nf), Literal(unit)),
            Cast(nnCnt(m, nf), DoubleType))), name)(exprId = al.exprId)
      // min/max navigate only for measures registered as append-only
      // maintained (aggSnapshotMinMax / incrementalAggRefreshAppendOnly)
      // — they are not retractable, so a plain snapshot can't carry them
      case al @ Alias(AggregateExpression(Min(ar: AttributeReference), _, false, filt, _), name)
          if e.minMax.contains(ar.name) =>
        Alias(AggregateExpression(Min(snapAttr(s"min_${ar.name}")), Complete,
          isDistinct = false, filter = navFilter(filt)), name)(exprId = al.exprId)
      case al @ Alias(AggregateExpression(Max(ar: AttributeReference), _, false, filt, _), name)
          if e.minMax.contains(ar.name) =>
        Alias(AggregateExpression(Max(snapAttr(s"max_${ar.name}")), Complete,
          isDistinct = false, filter = navFilter(filt)), name)(exprId = al.exprId)
      // distinct-count navigation from the snapshot's mergeable KMV
      // sketch columns (append-only maintained). kmv_distinct gets the
      // IDENTICAL estimator over the merged sketches — KMV merge is
      // exact, so navigated == direct, bit for bit. approx_count_
      // distinct is answered by the KMV estimate too: a documented
      // estimator swap (HLL++ → KMV), legitimate because the
      // aggregate's contract is approximate — both estimators sit
      // within ~1/sqrt(k) relative error. Composite (tuple) distinct
      // keys resolve through their canonical concat_ws encoding.
      case al @ Alias(AggregateExpression(kd: graft.functions.KmvDistinct, _, false, filt, _), name)
          if kd.k == e.kmvK &&
            (distinctAttr(kd.child).map(c => s"kmv_$c") orElse
              tupleSketch(kd.child)).isDefined =>
        val sketchCol = (distinctAttr(kd.child).map(c => s"kmv_$c") orElse
          tupleSketch(kd.child)).get
        Alias(AggregateExpression(graft.functions.KmvUnionEstimate(
          snapAttr(sketchCol), e.kmvK), Complete,
          isDistinct = false, filter = navFilter(filt)), name)(exprId = al.exprId)
      // precision contract: the user's relativeSD is a promise, and the
      // KMV estimator's standard error is ~1/sqrt(k−2) — only navigate
      // when the registered sketch is at least that precise (default
      // rsd 0.05 needs kmvK >= 402; a k=64 registration serves only
      // explicitly-loose requests). kmv_distinct above has no such
      // guard because its k IS the request.
      case al @ Alias(AggregateExpression(
            h: org.apache.spark.sql.catalyst.expressions.aggregate.HyperLogLogPlusPlus,
            _, false, filt, _), name)
          if distinctAttr(h.child).isDefined &&
            h.relativeSD >= 1.0 / math.sqrt(e.kmvK - 2.0) =>
        Alias(AggregateExpression(graft.functions.KmvUnionEstimate(
          snapAttr(s"kmv_${distinctAttr(h.child).get}"), e.kmvK), Complete,
          isDistinct = false, filter = navFilter(filt)), name)(exprId = al.exprId)
      // quantile navigation from the snapshot's per-key KLL sketches:
      // merge the surviving groups' sketches (Datasketches KLL merge)
      // and read the requested quantile. approx_percentile's accuracy
      // argument is a promise of ~1/accuracy rank error, and the
      // stored sketch guarantees ~getNormalizedRankError(kllK) — only
      // navigate when the sketch meets the request (the default
      // accuracy=10000 ≈ 0.01% NEVER navigates at k=200's ~1.65%;
      // dashboards opt in with an explicitly loose accuracy). Estimator
      // swap (GK-quantile → KLL) within the requested band — the
      // approx_count_distinct precedent.
      case al @ Alias(AggregateExpression(ap: ApproximatePercentile, _, false, filt, _), name)
          if kllAttr(ap.child).isDefined &&
            (ap.accuracyExpression match {
              case Literal(acc: Int, _) =>
                1.0 / acc >= org.apache.datasketches.kll.KllSketch
                  .getNormalizedRankError(e.kllK, false)
              case Literal(acc: Long, _) =>
                1.0 / acc >= org.apache.datasketches.kll.KllSketch
                  .getNormalizedRankError(e.kllK, false)
              case _ => false
            }) &&
            (ap.percentageExpression match {
              // the KLL read mirrors both shapes: a scalar percentage
              // returns DOUBLE, an array of percentages ARRAY<DOUBLE> —
              // the guard pins the replacement to the original's type
              case Literal(_, DoubleType) => al.dataType == DoubleType
              case Literal(_, org.apache.spark.sql.types.ArrayType(DoubleType, _)) =>
                al.dataType ==
                  org.apache.spark.sql.types.ArrayType(DoubleType, false)
              case _ => false
            }) =>
        val m = kllAttr(ap.child).get
        Alias(KllSketchGetQuantileDouble(
          AggregateExpression(
            KllMergeAggDouble(snapAttr(s"kll_$m"), None), Complete,
            isDistinct = false, filter = navFilter(filt)),
          ap.percentageExpression), name)(exprId = al.exprId)
      case _ => throw Unanswerable
    }
    val snapGroupings = groupings.map { g =>
      val in = inline(g)
      if (isDimOnly(in)) in
      else keySubst(g).getOrElse(throw Unanswerable)
    }
    // star: rebuild the join chain with the snapshot standing in for
    // the fact branch. ALL conditions (join conditions included) were
    // pooled into `inlinedFilters` and replay as Filters on top — their
    // fact-side references are snapshot keys (the gate above), constant
    // within a group, so group-level matching is exact. The optimizer's
    // own predicate pushdown runs in the same fixed-point batch and
    // re-forms the equi-joins; the snapshot side is kilobytes, so AQE
    // broadcasts it.
    val joined: LogicalPlan = star match {
      case Some(dims) =>
        dims.foldLeft(snap: LogicalPlan)((acc, d) =>
          Join(acc, d, Inner, None, JoinHint.NONE))
      case None => snap
    }
    // replay the collected predicates: dim references untouched, fact
    // references (all keys, the gate above) onto the snapshot's columns
    val filteredSnap = inlinedFilters.foldLeft(joined) { (p, cond) =>
      Filter(cond.transform {
        case a: AttributeReference if !dimOut.contains(a) => snapAttr(a.name)
      }, p)
    }
    // grouping sets: rebuild the Expand over the (filtered) snapshot —
    // every snapshot column passes through every projection row, the
    // masked-key positions re-emit null / the snapshot's key column
    // (coarser truncs included via keySubst), the grouping-id literals
    // survive verbatim. Output reuses the ORIGINAL masked/gid attrs, so
    // the Aggregate above references them unchanged; each snapshot
    // group-row reaches every grouping set exactly once — the same
    // replication the raw rows had, so the mapped partial aggregates
    // stay exact per (masked keys, gid) cell.
    val snapChild = expand match {
      case Some(info) =>
        // under a rollup-over-star the Expand sits above the rebuilt
        // join, so the dim attributes pass through every projection
        // row alongside the snapshot's columns; a masked key may be a
        // DIM expression (rollup over dim.attr) — re-emitted inline,
        // the dim subtree keeps its exprIds
        val passAttrs: Seq[Attribute] =
          snap.output ++ star.map(_.flatMap(_.output)).getOrElse(Nil)
        val newProjections = info.ex.projections.map { row =>
          passAttrs.map(a => a: Expression) ++ info.kept.map { i =>
            row(i) match {
              case l: Literal => l // a null mask or the grouping id
              case _ =>
                val im = inline(info.masked(i))
                if (im.references.nonEmpty && im.references.subsetOf(starDims)) im
                else keySubst(info.masked(i)).getOrElse(throw Unanswerable)
            }
          }
        }
        Expand(newProjections, passAttrs ++ keptAttrs, filteredSnap)
      case None => filteredSnap
    }
    logInfo(s"MvRewrite: answering aggregate over ${e.rootPaths} " +
      s"from snapshot $snapPath" +
      star.map(_ => " (star: snapshot ⋈ dim)").getOrElse(""))
    Some(Aggregate(snapGroupings, mapped, snapChild))
  } catch {
    // one debug line per bailed view AT REWRITE TIME — shape bails are
    // otherwise silent and "why is this dashboard slow" becomes
    // archaeology; the same line lands in MvRewrite.recentBails.
    // noteBail runs EAGERLY (logDebug's by-name arg would skip the
    // recording whenever debug logging is off)
    case u: UnanswerableEx =>
      val line = MvRewrite.noteBail(e, u.reason)
      logDebug(line); None
    case Unanswerable =>
      val line = MvRewrite.noteBail(e, "query shape unanswerable " +
        "(non-key filter/grouping, unregistered measure, row-level " +
        "FILTER clause, or an unsupported aggregate kind)")
      logDebug(line); None
  }
}
