package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Sketch-based approximate statistics for corpus-scale counting.
  *
  * Count–min sketch (Cormode & Muthukrishnan): a depth × width counter
  * table; every occurrence increments one bucket per row, an item's
  * estimate is the MIN of its buckets. Estimates are one-sided
  * (est >= true count, always) with expected excess N/width — the
  * standard way to track token/domain/n-gram frequencies over a corpus
  * whose key cardinality dwarfs memory.
  *
  * Scale shape: the sketch is a groupBy over (row, bucket) — bounded
  * depth×width cells regardless of key cardinality, fully map-side
  * combinable, and broadcastable back for estimation. Hashing is the
  * FNV + universal-family arithmetic shared with minhash, so the whole
  * sketch reproduces bit-for-bit in a SQL oracle.
  */
object Sketches {

  /** Per-token CMS estimate vs exact count for the `k` most frequent
    * tokens: (token, exact_cnt, cms_est). The exact count exists to
    * grade the sketch — production pipelines keep only the sketch and
    * a candidate set. */
  def cmsHeavyHitters(docs: DataFrame, textCol: String,
                      depth: Int = 4, width: Int = 1024, k: Int = 20): DataFrame = {
    require(depth <= Dedup.A.length, s"depth $depth exceeds coefficient family")
    val spark = docs.sparkSession
    import spark.implicits._
    // one narrow pass: every token occurrence with its FNV hash
    val toks = docs.select(col(textCol).cast("string")).as[String]
      .flatMap { t =>
        t.split(" ").iterator.filter(_.nonEmpty).map(tok => (tok, Dedup.strHash64(tok)))
      }
      .toDF("token", "sv")
      .withColumn("hm", ((col("sv") % Dedup.P) + Dedup.P) % Dedup.P)
    val buckets = (0 until depth).map { r =>
      ((lit(Dedup.A(r)) * col("hm") + lit(Dedup.B(r))) % Dedup.P % width).as(s"b$r")
    }
    val exploded = toks.select(
      (col("token") +: buckets): _*)
      .select(col("token"), posexplode(array((0 until depth).map(r => col(s"b$r")): _*))
        .as(Seq("r", "bucket")))
    // the sketch: bounded depth×width cells, map-side combinable
    val cms = exploded.groupBy("r", "bucket").agg(count(lit(1)).as("c"))
    // estimate = min over rows of the token's bucket counters
    val est = exploded.distinct()
      .join(broadcast(cms), Seq("r", "bucket"))
      .groupBy("token").agg(min("c").as("cms_est"))
    val exact = toks.groupBy("token").agg(count(lit(1)).as("exact_cnt"))
    exact.join(est, "token")
      .orderBy(col("exact_cnt").desc, col("token"))
      .limit(k)
      .select("token", "exact_cnt", "cms_est")
  }

  // ---- Mergeable HLL sketch rollup --------------------------------------
  //
  // The 100 TB pattern for distinct counting: you cannot afford to
  // re-scan history to answer "distinct users this month", so each
  // partition/day materializes a BINARY HyperLogLog sketch once, and any
  // later query merges the stored sketches (register-wise max — exact
  // associative/commutative algebra, order-insensitive) instead of
  // touching rows. Built on Spark's Datasketches-backed hll_sketch_agg /
  // hll_union_agg / hll_sketch_estimate builtins; SketchesSpec pins the
  // contract that makes rollups trustworthy: estimate(merge(parts)) ==
  // estimate(whole) EXACTLY (same registers), not merely approximately.

  /** One HLL sketch per `keyCols` group over `col`'s values, as a
    * binary column `hll` — the pre-aggregated, parquet-storable unit of
    * an incremental distinct-count pipeline. `lgK` trades 2^lgK
    * registers for accuracy (±~1.04/sqrt(2^lgK)). */
  def hllPartials(df: DataFrame, keyCols: Seq[String], valueCol: String,
                  lgK: Int = 12): DataFrame =
    df.groupBy(keyCols.map(col).toIndexedSeq: _*)
      .agg(hll_sketch_agg(col(valueCol), lit(lgK)).as("hll"))

  /** Merge stored [[hllPartials]] sketches UP a hierarchy (e.g. day →
    * month): register-wise union per `keyCols` group, plus the
    * estimate. Touches only |sketches| rows — never the base table. */
  def hllRollup(partials: DataFrame, keyCols: Seq[String]): DataFrame = {
    val grouped =
      if (keyCols.isEmpty) partials.groupBy()
      else partials.groupBy(keyCols.map(col).toIndexedSeq: _*)
    grouped.agg(hll_union_agg(col("hll"), lit(true)).as("hll"))
      .withColumn("distinct_est", hll_sketch_estimate(col("hll")))
  }

  // ---- KMV: the DETERMINISTIC mergeable distinct-count sketch -----------
  //
  // HLL's register-max merge is exact but its estimate is seeded by
  // implementation-internal randomization; the KMV sketch (k smallest
  // distinct fnv64 hashes) is a pure order statistic — merge == rebuild
  // EXACTLY and the estimate replays bit-for-bit in a DuckDB oracle
  // (q12_kmv_distinct / q_incr_kmv). This is the sketch
  // Cdc.aggSnapshotMinMax stores per key and MvRewrite navigates.

  /** Raw fnv64 of the value's string rendering — the input every KMV
    * sketch aggregate expects (the Fibonacci mix into [0, 2^61) is
    * applied inside the aggregate; see [[graft.functions.Kmv.mix]]). */
  def kmvHash(c: Column): Column =
    call_function("fnv64", c.cast("string"))

  /** Canonical separator for composite distinct keys: U+0001 — outside
    * the value alphabet of the id/code columns tuples are built from,
    * and replayable in DuckDB as chr(1). */
  val TupleSep = "\u0001"

  /** fnv64 of a COMPOSITE key — "distinct (user, day) pairs": the tuple
    * canonicalizes to one string via `concat_ws(U+0001, casts)` and
    * hashes like a single column, so every KMV law (exact merge,
    * deterministic estimate, DuckDB replay via
    * `concat_ws(chr(1), CAST(a AS VARCHAR), ...)`) carries over
    * unchanged. NULL components are SKIPPED by concat_ws on both
    * engines — identical grouping, though ("a", NULL) and ("a") collide;
    * tuples over nullable columns should coalesce to a sentinel first. */
  def kmvTupleHash(cols: Column*): Column = {
    require(cols.size >= 2, "Sketches.kmvTupleHash: need >= 2 columns")
    call_function("fnv64", tupleKey(cols: _*))
  }

  /** The canonical composite-key STRING (before hashing) — what a
    * query-side `kmv_distinct(tupleKey(a, b))` must pass so
    * [[graft.plans.MvRewrite]] can recognize it against a registered
    * tuple sketch (the match is semantic equality of this expression). */
  def tupleKey(cols: Column*): Column =
    concat_ws(TupleSep, cols.map(_.cast("string")): _*)

  /** One KMV sketch per `keyCols` group over `col`'s values, as a
    * sorted `array<bigint>` column `kmv` — the parquet-storable unit of
    * an incremental distinct-count pipeline (the deterministic twin of
    * [[hllPartials]]). */
  def kmvPartials(df: DataFrame, keyCols: Seq[String], valueCol: String,
                  k: Int = graft.functions.Kmv.DefaultK): DataFrame = {
    import org.apache.spark.sql.graftshim.Shim
    df.groupBy(keyCols.map(col).toIndexedSeq: _*)
      .agg(Shim.column(graft.functions.KmvSketchAgg(
        Shim.expression(kmvHash(col(valueCol))), k).toAggregateExpression()).as("kmv"))
  }

  /** Merge stored [[kmvPartials]] sketches up a hierarchy per `keyCols`
    * group, plus the estimate — touches only |sketches| rows, and the
    * merged sketch EQUALS the one built from the union of the original
    * values (exact mergeability — the order-statistic property). */
  def kmvRollup(partials: DataFrame, keyCols: Seq[String],
                k: Int = graft.functions.Kmv.DefaultK): DataFrame = {
    import org.apache.spark.sql.graftshim.Shim
    val grouped =
      if (keyCols.isEmpty) partials.groupBy()
      else partials.groupBy(keyCols.map(col).toIndexedSeq: _*)
    grouped
      .agg(Shim.column(graft.functions.KmvUnionAgg(
        Shim.expression(col("kmv")), k).toAggregateExpression()).as("kmv"))
      .withColumn("distinct_est", kmvEstimate(col("kmv"), k))
  }

  /** Distinct-count estimate of a stored KMV sketch column: exact size
    * below k, else `round((k−1)·M / kth_min)` — the same arithmetic as
    * [[graft.functions.Kmv.estimate]] (Spark round == BigDecimal
    * HALF_UP), so Column-side and aggregate-side estimates agree. */
  def kmvEstimate(kmv: Column, k: Int = graft.functions.Kmv.DefaultK): Column = {
    val m = graft.functions.Kmv.M
    when(size(kmv) < k, size(kmv).cast("long"))
      .otherwise(round(lit((k - 1).toDouble) * lit(m.toDouble) /
        element_at(kmv, k).cast("double")).cast("long"))
  }

  /** Distinct-count of the INTERSECTION of two value sets from their
    * stored KMV sketches alone — "users active in BOTH segments"
    * without re-scanning either: the Bar-Yossef/Beyer KMV set-operation
    * estimator. Let U = the union sketch (merge, exact); among U's
    * retained hashes, the fraction ρ present in BOTH input sketches
    * estimates the Jaccard similarity, and |A∩B| ≈ ρ · est(U). Every
    * step is integer set algebra over the stored arrays plus the shared
    * estimator arithmetic — deterministic, so it hash-checks like the
    * rest of the KMV family. Exact when both sets held < k distinct
    * values (the sketches then ARE the hashed sets).
    *
    * All builtin array functions (codegen'd): no UDF, no re-hash. */
  def kmvIntersectEstimate(a: Column, b: Column,
                           k: Int = graft.functions.Kmv.DefaultK): Column = {
    val u = kmvUnion(a, b, k)
    val inBoth = size(array_intersect(array_intersect(u, a), b))
    // round(ρ · est(U)) with ρ = inBoth/|U| — |U| > 0 whenever either
    // input is non-empty; both empty → 0
    when(size(u) === 0, lit(0L))
      .otherwise(round(inBoth.cast("double") / size(u).cast("double") *
        kmvEstimate(u, k).cast("double")).cast("long"))
  }

  /** Jaccard similarity estimate of two value sets from their KMV
    * sketches: ρ = |U ∩ A ∩ B| / |U| over the union sketch's retained
    * hashes — the similarity component of [[kmvIntersectEstimate]],
    * exposed directly for segment-similarity analytics ("how alike are
    * these two audiences"). Exact when both sets held < k values. */
  def kmvJaccard(a: Column, b: Column,
                 k: Int = graft.functions.Kmv.DefaultK): Column = {
    val u = kmvUnion(a, b, k)
    when(size(u) === 0, lit(0.0))
      .otherwise(size(array_intersect(array_intersect(u, a), b)).cast("double") /
        size(u).cast("double"))
  }

  /** Per-row merge of two KMV sketch arrays (both sorted distinct,
    * k-bounded): the k smallest of their union — exact mergeability. */
  def kmvUnion(a: Column, b: Column,
               k: Int = graft.functions.Kmv.DefaultK): Column =
    slice(array_sort(array_distinct(concat(a, b))), 1, k)

  /** All-pairs segment-overlap matrix from stored [[kmvPartials]]:
    * every (seg_a < seg_b) pair with its distinct-count, union,
    * intersection and Jaccard estimates — the "how do my N corpus
    * segments overlap" audience matrix, answered ENTIRELY from the
    * sketch table. Scale shape: the self-join is |segments|² pairs of
    * k-long arrays — segments are few (domains, sources, snapshots) so
    * one broadcast self-join of a kilobyte table; the base corpus is
    * never touched. Output: seg_a, seg_b, est_a, est_b, union_est,
    * intersect_est, jaccard. */
  def kmvOverlapMatrix(partials: DataFrame, keyCol: String,
                       k: Int = graft.functions.Kmv.DefaultK,
                       maxSegments: Int = 1000): DataFrame = {
    // loud-misuse guard: the matrix is |segments|² pairs — sane for the
    // documented audience (few segments: domains, sources, snapshots),
    // quadratic blowup for a high-cardinality key column. Counting the
    // (kilobyte) partials table up front costs one tiny job and turns a
    // silent quadratic broadcast join into an explicit error; callers
    // who genuinely want a bigger matrix raise maxSegments consciously.
    val n = partials.select(col(keyCol)).limit(maxSegments + 1).count()
    require(n <= maxSegments,
      s"Sketches.kmvOverlapMatrix: > $maxSegments segments in '$keyCol' — the " +
        s"overlap matrix is quadratic in segments (>${maxSegments.toLong * maxSegments / 2} " +
        "pairs); pass a coarser segment key or raise maxSegments explicitly")
    val a = partials.select(col(keyCol).as("seg_a"), col("kmv").as("kmv_a"))
    val b = partials.select(col(keyCol).as("seg_b"), col("kmv").as("kmv_b"))
    a.join(broadcast(b), col("seg_a") < col("seg_b"))
      .select(col("seg_a"), col("seg_b"),
        kmvEstimate(col("kmv_a"), k).as("est_a"),
        kmvEstimate(col("kmv_b"), k).as("est_b"),
        kmvEstimate(kmvUnion(col("kmv_a"), col("kmv_b"), k), k).as("union_est"),
        kmvIntersectEstimate(col("kmv_a"), col("kmv_b"), k).as("intersect_est"),
        kmvJaccard(col("kmv_a"), col("kmv_b"), k).as("jaccard"))
  }

  /** The quantile companion to [[hllPartials]]: one Datasketches KLL
    * sketch per group over a DOUBLE column, parquet-storable — each
    * partition/day materializes its value-distribution sketch once, and
    * percentile queries over any key range merge the sketches instead
    * of re-scanning values. `k` trades size for rank accuracy (~1.65%
    * rank error at the 200 default). Unlike HLL's register-max, KLL
    * compaction is randomized, so merge-then-query equals
    * whole-sketch-query only within the rank-error bound — the spec
    * asserts the bound, not bit-equality. */
  def kllPartials(df: DataFrame, keyCols: Seq[String], valueCol: String,
                  k: Int = 200): DataFrame =
    df.groupBy(keyCols.map(col).toIndexedSeq: _*)
      .agg(kll_sketch_agg_double(col(valueCol), k).as("kll"))

  /** The scale-safe twin of the exact IQR-fence gate (`q_outliers`,
    * `queries/Relational.scala`): Tukey fences from KLL sketch
    * quantiles instead of exact `percentile`. The exact aggregate
    * buffers a value→count map per group — O(distinct values) memory,
    * the one unbounded-in-data-scale buffer in the suite — while the
    * KLL sketch is O(k·log n) per group regardless of cardinality, at
    * ~1.65% rank error (k=200). Same two-pass shape: tiny per-group
    * fence aggregate BROADCAST back onto the fact (never a second fact
    * shuffle), then one counting pass. Output matches q_outliers:
    * keyCols + lo, hi, n_outliers, n_rows. */
  def iqrOutliersKll(df: DataFrame, keyCols: Seq[String], valueCol: String,
                     k: Int = 200): DataFrame = {
    require(keyCols.nonEmpty, "Sketches.iqrOutliersKll: empty key")
    val fences = kllRollup(kllPartials(df, keyCols, valueCol, k), keyCols,
        Seq(0.25, 0.75))
      .select((keyCols.map(col) ++ Seq(
        (col("q_25") - (col("q_75") - col("q_25")) * 1.5).as("lo"),
        (col("q_75") + (col("q_75") - col("q_25")) * 1.5).as("hi"))): _*)
    df.join(broadcast(fences), keyCols.toIndexedSeq)
      .groupBy(keyCols.map(col).toIndexedSeq: _*)
      .agg(min("lo").as("lo"), min("hi").as("hi"),
        sum(when(col(valueCol) < col("lo") || col(valueCol) > col("hi"), 1L)
          .otherwise(0L)).as("n_outliers"),
        count(lit(1)).as("n_rows"))
  }

  /** Merge stored [[kllPartials]] up a hierarchy and evaluate
    * `quantiles` (0–1 fractions) per merged group: keyCols + one
    * `q_<pct>` column per requested quantile. Touches only |sketches|
    * rows. */
  def kllRollup(partials: DataFrame, keyCols: Seq[String],
                quantiles: Seq[Double]): DataFrame = {
    require(quantiles.nonEmpty && quantiles.forall(q => q >= 0 && q <= 1),
      "Sketches.kllRollup: quantiles must be fractions in [0,1]")
    val grouped =
      if (keyCols.isEmpty) partials.groupBy()
      else partials.groupBy(keyCols.map(col).toIndexedSeq: _*)
    val merged = grouped.agg(kll_merge_agg_double(col("kll")).as("kll"))
    quantiles.foldLeft(merged)((d, q) =>
      d.withColumn(f"q_${math.round(q * 100)}%d",
        kll_sketch_get_quantile_double(col("kll"), lit(q))))
  }
}
