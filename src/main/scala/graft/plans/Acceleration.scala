package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}

/** One-call operability for "why is this query slow": every registered
  * acceleration artifact — [[MvRewrite]] views and [[SkipRewrite]]
  * file-skipping indexes — reported against one plan, each with what
  * the plan actually did with it (navigated / pruned / bailed /
  * untouched) AND, for stream-maintained artifacts, how far the
  * artifact trails its source (version, source offsets, pending base
  * files). The two rules log well individually; this is the single
  * entry point a session pastes when a dashboard degrades — navigation,
  * skipping, and staleness in one report, no re-running anything.
  */
object Acceleration {

  // ---- maintained-target registry -------------------------------------
  // Merge tables and agg snapshots registered for the report: the
  // _merge/_layout marker is the self-description, so registration is
  // just the path. MvRewrite/SkipRewrite entries register through their
  // own rules; targets read directly (the Scala API or format("graft"))
  // have no rule, hence this list.
  private val targets =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()

  /** Include a maintained merge-table / agg-snapshot target in
    * [[explainAcceleration]] reports: version, freshness, lifecycle
    * (generations + uncompacted tail), and — when the plan reads it
    * through `format("graft")` — which key predicates pushed down. */
  def registerTarget(targetDir: String): Unit = targets.add(targetDir)
  def unregisterTarget(targetDir: String): Unit = targets.remove(targetDir)
  def clearTargets(): Unit = targets.clear()

  def explainAcceleration(df: DataFrame): String = {
    val spark = df.sparkSession
    def norm(p: String): String =
      new org.apache.hadoop.fs.Path(p).toUri.getPath
    // PER-SCAN root sets (one entry per LogicalRelation instance, not
    // merged) — a self-join scans one base twice and the two scans can
    // resolve differently (one pruned, one not); a blended set would
    // report a single wrong verdict for both. Analyzed scans also carry
    // their output exprIds, the key SkipRewrite's emptied ledger records
    // under.
    final case class ScanInfo(roots: Set[String], outputIds: Set[Long])
    def scansOf(plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)
        : Seq[ScanInfo] = plan.collect {
      case lr: LogicalRelation => lr.relation match {
        case fs: HadoopFsRelation =>
          Some(ScanInfo(fs.location.rootPaths.map(p => norm(p.toString)).toSet,
            lr.output.map(_.exprId.id).toSet))
        case _ => None
      }
    }.flatten
    val analyzedScans = scansOf(df.queryExecution.analyzed)
    // forces optimization — which runs SkipRewriteRule and fills its
    // emptied ledger for this plan's exprIds, consulted below
    val optimizedScans = scansOf(df.queryExecution.optimizedPlan)

    // freshness of a versioned target, rendered for humans; the v= path
    // comes from the entry's own resolution, its parent is the target
    def freshLineOf(versionPath: String, base: String): String =
      try {
        val p = new org.apache.hadoop.fs.Path(versionPath)
        if (!p.getName.startsWith("v=") || p.getParent == null)
          s"static artifact at $versionPath (no freshness record)"
        else graft.streaming.Streams
          .freshnessLagOf(spark, p.getParent.toString, Some(base)) match {
          case Some(l) =>
            val offs = l.sourceLogOffsets
              .map(_.map(String.valueOf).getOrElse("?")).mkString(",")
            val pend = l.pendingFiles
              .map(n => s", pendingBaseFiles=$n").getOrElse("")
            s"version=${l.version}, sourceOffsets=[$offs]$pend"
          case None => "versioned target, but no freshness record " +
            "(foreign checkpoint layout?)"
        }
      } catch {
        case scala.util.control.NonFatal(ex) =>
          s"freshness unavailable (${ex.getMessage})"
      }

    // ---- MvRewrite views: navigation verdict + freshness -------------
    // ONE registry snapshot feeds both the navigation pass and the
    // freshness column, so a concurrent register/unregister can never
    // misalign a verdict with another view's staleness; per-entry lines
    // come first in this exact order, trailing lines (the cache note)
    // are kept verbatim
    val mvEntries = MvRewrite.allEntries
    val navReport = MvRewrite.explainNavigationFor(df, mvEntries).split("\n").toSeq
    val mvLines =
      if (mvEntries.isEmpty) Seq("MvRewrite: no views registered")
      else {
        val (perEntry, rest) = navReport.splitAt(mvEntries.length)
        perEntry.zip(mvEntries).flatMap { case (line, e) =>
          val fresh =
            try freshLineOf(e.snapshotPath(), e.base)
            catch {
              case ex: IllegalStateException =>
                s"no committed snapshot version yet (${ex.getMessage})"
            }
          Seq(line, s"  freshness: $fresh")
        } ++ rest
      }

    // ---- SkipRewrite indexes: prune verdict + freshness ---------------
    val skipLines = SkipRewrite.allEntries match {
      case Seq() => Seq("SkipRewrite: no indexes registered")
      case es => es.map { e =>
        val head = s"skip(base=${e.base})"
        val baseRoots = e.rootPaths.map(norm)
        // classify each OPTIMIZED scan instance of this base: roots
        // CONTAINING the base dir = still a full scan (a multi-root
        // relation like parquet(base, other) reads the base unpruned
        // too — never "not referenced"); roots that are files UNDER
        // the base = a pruned rewrite (its file count is the roots'
        // size); a scan pruned to the empty relation leaves no
        // LogicalRelation at all — counted off the analyzed total
        val analyzedOfBase = analyzedScans.filter(s =>
          baseRoots.subsetOf(s.roots))
        val baseAnalyzed = analyzedOfBase.length
        // a "pruned" verdict requires the ANALYZED plan to have scanned
        // the base dir: a query that reads files/subdirs under the base
        // DIRECTLY (spark.read.parquet("<base>/part-3.parquet")) also
        // has under-base optimized roots, but SkipRewrite never touched
        // it — claiming PRUNED would mislead the operator
        val prunedScans =
          if (baseAnalyzed == 0) Seq.empty[Set[String]]
          else optimizedScans.map(_.roots).filter(rs => rs != baseRoots &&
            rs.nonEmpty &&
            rs.forall(r => baseRoots.exists(b => r.startsWith(b + "/"))))
        val fullScans = optimizedScans.count(s => baseRoots.subsetOf(s.roots))
        // pruned-to-empty comes from the rule's OWN ledger (keyed by the
        // scan's output exprIds), not from plan-shape subtraction: the
        // optimizer also removes scans for reasons SkipRewrite never
        // touched (constant-false folding, join/column pruning), and
        // those must not be reported as the index's work
        val emptied = analyzedOfBase.count(s =>
          SkipRewrite.wasEmptied(s.outputIds))
        val eliminated = math.max(0,
          baseAnalyzed - fullScans - prunedScans.length - emptied)
        val status =
          if (baseAnalyzed == 0 && fullScans == 0)
            "NOT REFERENCED — the plan does not scan this base"
          else if (baseAnalyzed <= 1)
            if (fullScans > 0) "NOT PRUNED — full scan (no eligible " +
              "equality/range conjunct, index pruned nothing, or no " +
              "committed version)"
            else if (prunedScans.nonEmpty)
              s"PRUNED — scan rewritten to ${prunedScans.head.size} file(s)"
            else if (emptied > 0)
              "PRUNED — scan rewritten to the empty relation"
            else "SCAN ELIMINATED by the optimizer — not by this index " +
              "(constant folding or join/column pruning removed it)"
          else {
            // self-join / multi-scan: one verdict per scan, not blended
            val prunedPart =
              if (prunedScans.isEmpty) ""
              else s" to ${prunedScans.map(_.size).mkString("/")} file(s)"
            val elimPart =
              if (eliminated == 0) ""
              else s", $eliminated eliminated by the optimizer (not the index)"
            s"$baseAnalyzed scans of this base: " +
              s"${prunedScans.length} PRUNED$prunedPart, " +
              s"$fullScans NOT PRUNED (full), $emptied pruned to empty" +
              elimPart
          }
        val fresh = (try e.location() catch {
          case scala.util.control.NonFatal(_) => None
        }) match {
          case Some(loc) => s"\n  freshness: ${freshLineOf(loc, e.base)}"
          case None => "\n  freshness: no committed index version yet"
        }
        s"$head: $status$fresh"
      }
    }

    // ---- maintained targets: version, freshness, lifecycle, pushdown --
    import scala.jdk.CollectionConverters._
    // AUTO-DISCOVERY: graft-format scans in THIS plan name their target
    // on the scan itself — report them even when nobody registered the
    // path (an operator pasting a slow dashboard query should not need
    // to know the registration step first)
    def scanGraftOf(s: org.apache.spark.sql.connector.read.Scan)
        : Option[graft.sources.v2.GraftScan] = s match {
      case g: graft.sources.v2.GraftScan => Some(g)
      case w: org.apache.spark.sql.execution.datasources.v2
          .V1ScanWrapper => w.v1Scan match {
        case g: graft.sources.v2.GraftScan => Some(g)
        case _ => None
      }
      case _ => None
    }
    val discovered = df.queryExecution.optimizedPlan.collect {
      case r: org.apache.spark.sql.execution.datasources.v2
          .DataSourceV2ScanRelation => scanGraftOf(r.scan).map(_.ref.path)
    }.flatten.distinct
    val tgtLines = (targets.asScala.toSeq ++ discovered)
      .distinct.sorted match {
      case Seq() => Seq.empty[String]
      case ts => ts.map { t =>
        try {
          val streams = graft.streaming.Streams
          val (kind, keys, sub) = streams.mergeLayoutOf(spark, t) match {
            case Some(l) => ("merge-table", l.keys, "rows")
            case None => streams.aggLayoutOf(spark, t) match {
              case Some(l) => ("agg-snapshot", l.keys, "delta")
              case None => throw new IllegalStateException(
                "no _merge/_layout marker — not a maintained target")
            }
          }
          val version = streams.snapshotVersionsOf(spark, t).lastOption
          val fresh = version match {
            case None => "no committed version yet"
            case Some(v) => freshLineOf(s"$t/v=$v", t)
          }
          val (gens, batches) = streams.compactionsOf(spark, t, sub)
          val tail = batches.count(_ > gens.lastOption.getOrElse(-1L))
          // plan attribution: format("graft") scans of THIS target —
          // their accepted key filters are the commuting pushdown
          // (scanGraftOf unwraps the post-pushdown V1ScanWrapper)
          val graftScans = df.queryExecution.optimizedPlan.collect {
            case r: org.apache.spark.sql.execution.datasources.v2
                .DataSourceV2ScanRelation =>
              scanGraftOf(r.scan).filter(_.ref.path == t)
          }.flatten
          val push =
            if (graftScans.isEmpty)
              s"not read via format(\"graft\") in this plan; key " +
                s"predicates on (${keys.mkString(", ")}) push down " +
                "through the commuting point-read shapes"
            else graftScans.map { s =>
              val base =
                if (s.acceptedFilters.isEmpty)
                  "scan: no key-only predicate pushed (full resolution)"
                else s"scan: pushed ${s.acceptedFilters.mkString(", ")} " +
                  "before resolution"
              // a CHANGE-FEED scan serves history, not resolved state —
              // report the version range it reads and the retention
              // floor, the two numbers that explain both an unexpected
              // row count and a sudden refusal after truncateChangelog
              if (s.ref.changelog) {
                val floor = streams.changelogFloor(
                  spark.sparkContext.hadoopConfiguration, t)
                val hi = s.ref.effectiveAsOf.orElse(version).getOrElse(-1L)
                val floorTxt =
                  if (floor >= 0L) s"retention floor=$floor"
                  else "never truncated"
                s"$base; change-feed read: versions " +
                  s"(${s.ref.sinceVersion}, $hi], $floorTxt"
              } else base
            }.mkString("; ")
          s"target($kind: $t): version=${version.getOrElse("none")}, " +
            s"generations=${gens.length}, uncompactedTail=$tail\n" +
            s"  freshness: $fresh\n  pushdown: $push"
        } catch {
          case scala.util.control.NonFatal(ex) =>
            s"target($t): unreadable (${ex.getMessage})"
        }
      }
    }
    (mvLines ++ skipLines ++ tgtLines).mkString("\n")
  }
}
