package graft.plans

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Average, Complete, Count, Max, Min, Sum}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Filter, LogicalPlan, Project}
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
  * keys and every aggregate count(*)/count(1)/sum(m)/avg(m) over
  * snapshot measures. Anything else leaves the plan untouched. Output
  * attribute ids/names are preserved, so the rewrite is invisible to
  * downstream operators.
  *
  * Semantics note (documented, deliberate): sums come back as the
  * snapshot's exact fixed-point total — summing the raw doubles in a
  * different order can differ in final ULPs; the snapshot's answer is
  * the order-independent one.
  */
object MvRewrite {

  /** `snapshotPath` is a THUNK so a versioned registration can resolve
    * the freshest `v=<batchId>` at every rewrite — queries against a
    * stream-maintained view then trail the change stream by one
    * microbatch with no re-registration. */
  final case class Entry(rootPaths: Set[String], keys: Seq[String],
                         measures: Seq[String], scale: Int,
                         snapshotPath: () => String,
                         derived: Seq[(String, Expression)] = Nil,
                         minMax: Seq[String] = Nil,
                         distinct: Seq[String] = Nil,
                         kmvK: Int = graft.functions.Kmv.DefaultK)

  private val entries =
    new java.util.concurrent.ConcurrentHashMap[String, Entry]()

  /** Lookup matches on EXACT root-path sets, so two registrations whose
    * roots intersect but differ (e.g. a parent dir and one partition
    * subdirectory of it) could never both match one scan — one of them
    * would be silently dead, and which one depends on registration
    * order. Fail loudly at register time instead; re-registering the
    * SAME basePath replaces its entry (the refresh idiom). */
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
    entries.asScala.foreach { case (otherBase, other) =>
      if (otherBase != basePath && other.rootPaths.intersect(roots).nonEmpty)
        throw new IllegalArgumentException(
          s"MvRewrite.register: $basePath overlaps already-registered $otherBase " +
            s"(shared roots: ${other.rootPaths.intersect(roots).mkString(", ")}) — " +
            "unregister it first or register a disjoint path")
    }
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
               kmvK: Int = graft.functions.Kmv.DefaultK): Unit =
    registerDerived(spark, basePath, keys, measures, Map.empty, snapshotPath,
      scale, minMaxMeasures, distinctCols, kmvK)

  /** Like [[register]], plus DERIVED measures: name → Column expression
    * over base columns (e.g. `"disc_price" -> col("l_extendedprice") *
    * (lit(1) - col("l_discount"))`). The snapshot must carry
    * `sum_<name>` built from the same expression
    * (`base.withColumn(name, expr)` before [[graft.ops.Cdc.aggSnapshot]]);
    * queries summing/averaging a SEMANTICALLY EQUAL expression are then
    * answered from it — the TPC-H q1 revenue shape. */
  def registerDerived(spark: SparkSession, basePath: String, keys: Seq[String],
                      measures: Seq[String],
                      derived: Map[String, org.apache.spark.sql.Column],
                      snapshotPath: String, scale: Int = 2,
                      minMaxMeasures: Seq[String] = Nil,
                      distinctCols: Seq[String] = Nil,
                      kmvK: Int = graft.functions.Kmv.DefaultK): Unit = {
    val base = spark.read.parquet(basePath)
    val roots = rootPathsOf(base.queryExecution.analyzed)
      .getOrElse(throw new IllegalArgumentException(
        s"MvRewrite.register: $basePath is not a file-backed relation"))
    requireFloatingMeasures(base.schema, measures, "MvRewrite.register")
    // resolve each derived expression against the base relation through
    // the OPTIMIZED plan: the rewrite rule sees query expressions after
    // analysis AND constant folding (lit(1) - x arrives as (1.0 - x),
    // not cast(1 as double) - x), so the stored tree must take the same
    // trip or semantic comparison can never line up
    val derivedExprs = derived.toSeq.map { case (n, c) =>
      val optimized = base.select(c.as(n)).queryExecution.optimizedPlan
      val resolved = optimized match {
        case Project(Seq(al: Alias), _) => al.child
        case other => throw new IllegalArgumentException(
          s"MvRewrite.registerDerived: cannot resolve measure $n: $other")
      }
      require(resolved.dataType == DoubleType ||
          resolved.dataType == org.apache.spark.sql.types.FloatType,
        s"MvRewrite.registerDerived: derived measure $n is " +
          s"${resolved.dataType.simpleString} — only double/float measures are navigable")
      (n, resolved)
    }
    requireNoOverlap(basePath, roots)
    entries.put(basePath,
      Entry(roots, keys, measures, scale, () => snapshotPath, derivedExprs,
        minMaxMeasures, distinctCols, kmvK))
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
    * `retainVersions` to the longest handle lifetime. */
  def registerVersioned(spark: SparkSession, basePath: String, keys: Seq[String],
                        measures: Seq[String], targetDir: String,
                        scale: Int = 2, minMaxMeasures: Seq[String] = Nil,
                        distinctCols: Seq[String] = Nil,
                        kmvK: Int = graft.functions.Kmv.DefaultK): Unit = {
    val base = spark.read.parquet(basePath)
    val roots = rootPathsOf(base.queryExecution.analyzed)
      .getOrElse(throw new IllegalArgumentException(
        s"MvRewrite.registerVersioned: $basePath is not a file-backed relation"))
    requireFloatingMeasures(base.schema, measures, "MvRewrite.registerVersioned")
    requireNoOverlap(basePath, roots)
    entries.put(basePath, Entry(roots, keys, measures, scale,
      () => graft.streaming.Streams
        .latestSnapshotPath(SparkSession.active, targetDir)
        .getOrElse(throw new IllegalStateException(
          s"MvRewrite: no committed snapshot version under $targetDir yet")),
      minMax = minMaxMeasures, distinct = distinctCols, kmvK = kmvK))
  }

  def unregister(basePath: String): Unit = entries.remove(basePath)
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

  /** Descend through column-pruning Projects and DETERMINISTIC Filters
    * to the base relation, collecting the filter conditions — whether
    * those conditions are answerable (key-only) is decided later, once
    * the matching registry entry is known. */
  private def rootPathsAndFilters(p: LogicalPlan, conds: Seq[Expression])
      : Option[(Set[String], Seq[Expression])] = p match {
    case Project(pl, child) if pl.forall(_.isInstanceOf[AttributeReference]) =>
      rootPathsAndFilters(child, conds)
    case Filter(cond, child) if cond.deterministic =>
      rootPathsAndFilters(child, conds :+ cond)
    case lr: LogicalRelation => lr.relation match {
      case fs: HadoopFsRelation =>
        Some((fs.location.rootPaths.map(_.toString).toSet, conds))
      case _ => None
    }
    case _ => None
  }

  private[plans] def lookup(child: LogicalPlan): Option[(Entry, Seq[Expression])] =
    rootPathsAndFilters(child, Nil).flatMap { case (roots, conds) =>
      import scala.jdk.CollectionConverters._
      entries.values().asScala.find(_.rootPaths == roots).map((_, conds))
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
          case Some((e, filters)) =>
            rewrite(agg, groupings, results, e, filters).getOrElse(agg)
          case None => agg
        }
    }

  /** Control-flow bail: any unanswerable shape aborts the rewrite and
    * leaves the original plan untouched. */
  private object Unanswerable extends scala.util.control.ControlThrowable

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

  private def rewrite(orig: Aggregate, groupings: Seq[Expression],
                      results: Seq[NamedExpression],
                      e: MvRewrite.Entry,
                      filters: Seq[Expression]): Option[LogicalPlan] = try {
    // grouping must be plain key columns, a subset of the snapshot keys
    val groupNames = groupings.map {
      case a: AttributeReference => a.name
      case _ => throw Unanswerable
    }
    if (!groupNames.forall(e.keys.contains)) throw Unanswerable
    // filters are answerable only when they select WHOLE groups — i.e.
    // reference nothing but snapshot keys
    filters.foreach(_.references.foreach(a =>
      if (!e.keys.contains(a.name)) throw Unanswerable))

    val spark = SparkSession.active
    // versioned registrations resolve their freshest committed version
    // here; "no version yet" means the view can't answer — bail clean
    val snapPath =
      try e.snapshotPath()
      catch { case _: IllegalStateException => throw Unanswerable }
    // a snapshot that fails to READ (deleted by retention between
    // resolution and planning, torn directory, wrong path) must degrade
    // to the unrewritten plan — never abort the user's query
    val snap =
      try spark.read.parquet(snapPath).queryExecution.analyzed
      catch { case scala.util.control.NonFatal(_) => throw Unanswerable }
    def snapAttr(name: String): Attribute =
      snap.output.find(_.name == name).getOrElse(throw Unanswerable)
    val unit = math.pow(10, e.scale)

    // the optimizer runs AFTER analysis: no implicit coercions happen
    // anymore, so every type adjustment must be an explicit Cast
    def sumOf(a: Attribute): Expression =
      AggregateExpression(Sum(a), Complete, isDistinct = false)
    def sumAsDouble(a: Attribute): Expression = Cast(sumOf(a), DoubleType)

    // resolve a summed/averaged expression to a snapshot measure: a
    // plain registered column, or a derived measure whose registered
    // formula is semantically equal (both sides went through the same
    // analysis, so coercions/promotions line up)
    def measureName(ex: Expression): String = ex match {
      case ar: AttributeReference if e.measures.contains(ar.name) => ar.name
      case other => e.derived.collectFirst {
        case (n, d) if sameFormula(d, other) => n
      }.getOrElse(throw Unanswerable)
    }

    // a distinct-count target resolves through the implicit string cast
    // kmv_distinct's analysis inserts (approx_count_distinct takes the
    // raw attribute); only columns registered as distinctCols carry a
    // sketch in the snapshot
    def distinctAttr(ex: Expression): Option[String] = (ex match {
      case ar: AttributeReference => Some(ar.name)
      case Cast(ar: AttributeReference, _, _, _) => Some(ar.name)
      case _ => None
    }).filter(e.distinct.contains)

    // total NON-NULL count of a measure across the groups being merged —
    // the denominator SQL's NULL-skipping avg needs (count(*) would
    // overweight NULL-bearing groups), and the sentinel that tells an
    // all-NULL group's sum (NULL) apart from a genuine zero total
    def nnCnt(m: String): Expression =
      Coalesce(Seq(sumOf(snapAttr(s"cnt_$m")), Literal(0L, LongType)))

    // map each result expression onto the snapshot; bail on anything
    // the snapshot can't answer exactly. Sum/avg rewrites emit DOUBLE:
    // only a double-typed original may be replaced, or the attribute's
    // type would silently change under downstream operators (register
    // already rejects non-floating measures; derived expressions can
    // still surface e.g. a LONG sum, so the guard stays here too).
    val mapped: Seq[NamedExpression] = results.map {
      case a: AttributeReference if groupNames.contains(a.name) =>
        Alias(snapAttr(a.name), a.name)(exprId = a.exprId)
      case al @ Alias(AggregateExpression(Count(Seq(Literal(_, _))), _, false, _, _), name) =>
        Alias(Coalesce(Seq(sumOf(snapAttr("cnt")), Literal(0L, LongType))),
          name)(exprId = al.exprId)
      // count(m) — the measure's non-null count is maintained exactly
      case al @ Alias(AggregateExpression(Count(Seq(ar: AttributeReference)), _, false, _, _), name)
          if e.measures.contains(ar.name) =>
        Alias(nnCnt(ar.name), name)(exprId = al.exprId)
      case al @ Alias(AggregateExpression(Sum(ex, _), _, false, _, _), name) =>
        if (al.dataType != DoubleType) throw Unanswerable
        val m = measureName(ex)
        Alias(If(EqualTo(nnCnt(m), Literal(0L, LongType)),
          Literal(null, DoubleType),
          Divide(sumAsDouble(snapAttr(s"sum_$m")), Literal(unit))),
          name)(exprId = al.exprId)
      case al @ Alias(AggregateExpression(Average(ex, _), _, false, _, _), name) =>
        if (al.dataType != DoubleType) throw Unanswerable
        val m = measureName(ex)
        Alias(If(EqualTo(nnCnt(m), Literal(0L, LongType)),
          Literal(null, DoubleType),
          Divide(Divide(sumAsDouble(snapAttr(s"sum_$m")), Literal(unit)),
            Cast(nnCnt(m), DoubleType))), name)(exprId = al.exprId)
      // min/max navigate only for measures registered as append-only
      // maintained (aggSnapshotMinMax / incrementalAggRefreshAppendOnly)
      // — they are not retractable, so a plain snapshot can't carry them
      case al @ Alias(AggregateExpression(Min(ar: AttributeReference), _, false, _, _), name)
          if e.minMax.contains(ar.name) =>
        Alias(AggregateExpression(Min(snapAttr(s"min_${ar.name}")), Complete,
          isDistinct = false), name)(exprId = al.exprId)
      case al @ Alias(AggregateExpression(Max(ar: AttributeReference), _, false, _, _), name)
          if e.minMax.contains(ar.name) =>
        Alias(AggregateExpression(Max(snapAttr(s"max_${ar.name}")), Complete,
          isDistinct = false), name)(exprId = al.exprId)
      // distinct-count navigation from the snapshot's mergeable KMV
      // sketch columns (append-only maintained). kmv_distinct gets the
      // IDENTICAL estimator over the merged sketches — KMV merge is
      // exact, so navigated == direct, bit for bit. approx_count_
      // distinct is answered by the KMV estimate too: a documented
      // estimator swap (HLL++ → KMV), legitimate because the
      // aggregate's contract is approximate — both estimators sit
      // within ~1/sqrt(k) relative error.
      case al @ Alias(AggregateExpression(kd: graft.functions.KmvDistinct, _, false, _, _), name)
          if kd.k == e.kmvK && distinctAttr(kd.child).isDefined =>
        Alias(AggregateExpression(graft.functions.KmvUnionEstimate(
          snapAttr(s"kmv_${distinctAttr(kd.child).get}"), e.kmvK), Complete,
          isDistinct = false), name)(exprId = al.exprId)
      // precision contract: the user's relativeSD is a promise, and the
      // KMV estimator's standard error is ~1/sqrt(k−2) — only navigate
      // when the registered sketch is at least that precise (default
      // rsd 0.05 needs kmvK >= 402; a k=64 registration serves only
      // explicitly-loose requests). kmv_distinct above has no such
      // guard because its k IS the request.
      case al @ Alias(AggregateExpression(
            h: org.apache.spark.sql.catalyst.expressions.aggregate.HyperLogLogPlusPlus,
            _, false, _, _), name)
          if distinctAttr(h.child).isDefined &&
            h.relativeSD >= 1.0 / math.sqrt(e.kmvK - 2.0) =>
        Alias(AggregateExpression(graft.functions.KmvUnionEstimate(
          snapAttr(s"kmv_${distinctAttr(h.child).get}"), e.kmvK), Complete,
          isDistinct = false), name)(exprId = al.exprId)
      case _ => throw Unanswerable
    }
    val snapGroupings = groupNames.map(snapAttr)
    // replay key-only predicates against the snapshot's key columns
    val snapChild = filters.foldLeft(snap) { (p, cond) =>
      Filter(cond.transform { case a: AttributeReference => snapAttr(a.name) }, p)
    }
    logInfo(s"MvRewrite: answering aggregate over ${e.rootPaths} " +
      s"from snapshot $snapPath")
    Some(Aggregate(snapGroupings, mapped, snapChild))
  } catch { case Unanswerable => None }
}
