package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Change-data-capture apply: MERGE a change batch (upserts + deletes,
  * each stamped with a monotonic sequence) into a snapshot — the
  * incremental-ingestion primitive behind corpus versioning, label
  * fixups, and takedown compliance at 100 TB, where rewriting the
  * corpus per delta is not an option but replaying a day's changes is.
  *
  * Scale shape: the snapshot is the big side and is touched exactly
  * once, by a key anti-join that BROADCASTS the (tiny) change-key set
  * when it fits — the normal CDC regime is |changes| ≪ |snapshot|, so
  * the snapshot never shuffles at all; latest-change-per-key reduction
  * shuffles only the change batch. Both joins are equi-joins on the
  * merge key; nothing collects to the driver.
  */
object Cdc {

  /** Latest change per key (by `seqCol`, descending) applied to
    * `target`: delete rows win by vanishing, upserts replace or append.
    * `changes` must carry `target`'s columns plus `seqCol` and a
    * boolean `deleteCol`; (key, seq) pairs must be unique (the CDC
    * source's ordering contract — ties would make "latest" undefined).
    *
    * `broadcastKeys` = true (default) forces the change-key set to
    * broadcast — right for the normal CDC regime where
    * |changes| ≪ |snapshot|. For a backfill-sized batch (change keys
    * too big for the driver/executors to hold) pass false and the
    * anti-join falls back to Catalyst's choice (shuffle join). */
  def mergeUpsert(target: DataFrame, changes: DataFrame, keyCols: Seq[String],
                  seqCol: String, deleteCol: String,
                  broadcastKeys: Boolean = true): DataFrame = {
    require(keyCols.nonEmpty, "Cdc.mergeUpsert: empty key")
    val keyCs = keyCols.map(col)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(keyCs: _*).orderBy(col(seqCol).desc)
    val latest = changes.withColumn("__rk", row_number().over(w))
      .filter(col("__rk") === 1).drop("__rk")
    val keySet = latest.select(keyCs: _*).distinct()
    val survivors = target.join(
      if (broadcastKeys) broadcast(keySet) else keySet, keyCols, "left_anti")
    val upserts = latest.filter(!col(deleteCol))
      .select(target.columns.map(col).toIndexedSeq: _*)
    survivors.unionByName(upserts)
  }

  /** The (count, per-measure sum) aggregate snapshot
    * [[incrementalAggRefresh]] maintains: one row per key with `cnt`,
    * `sum_<measure>` and `cnt_<measure>` columns — the algebraic
    * (combinable) shape.
    *
    * Sums are stored as LONG fixed-point units (`scale` decimal
    * digits, default cents): floating-point addition is not
    * associative, so a DOUBLE snapshot maintained by base + delta −
    * retract DRIFTS from the rebuilt aggregate — the exact failure
    * this operator exists to avoid. Integer sums are
    * order-independent, so refresh(snapshot, delta) is bit-identical
    * to rebuild(final rows), always. Headroom: at scale=2 a LONG
    * holds ~9.2e16 currency units of sum per group — 1e12 rows of
    * 1e4-unit values — before overflow; raise concerns by keying
    * finer, not by reverting to doubles. Convert to doubles for
    * presentation with [[aggView]].
    *
    * `cnt_<m>` is the measure's NON-NULL count — the column SQL's
    * NULL-skipping avg/sum semantics need: `avg(m)` divides by it (not
    * by `cnt` = count(*)), and `sum(m)` over a group whose every value
    * is NULL is NULL, which only `cnt_<m> = 0` can tell apart from a
    * genuine zero total (the stored `sum_<m>` is canonicalized to 0 in
    * both cases so refresh == rebuild stays bit-exact). */
  def aggSnapshot(df: DataFrame, keyCols: Seq[String],
                  measures: Seq[String], scale: Int = 2): DataFrame = {
    val unit = math.pow(10, scale)
    df.groupBy(keyCols.map(col).toIndexedSeq: _*)
      .agg(count(lit(1)).as("cnt"),
        (measures.map(m =>
          coalesce(sum(round(col(m) * unit).cast("long")), lit(0L))
            .as(s"sum_$m", scaleMeta(scale))) ++
          measures.map(m => count(col(m)).as(s"cnt_$m"))): _*)
  }

  /** Column-metadata stamp carrying the snapshot's fixed-point scale, so
    * refresh/view can verify they were handed a snapshot in the units
    * they are about to combine with, instead of trusting every caller to
    * repeat the same default. */
  private val ScaleKey = "graft.cdc.scale"
  private def scaleMeta(scale: Int) =
    new org.apache.spark.sql.types.MetadataBuilder().putLong(ScaleKey, scale.toLong).build()

  /** Guard against silently combining mismatched units: a snapshot from
    * the old DOUBLE-based aggSnapshot (or any non-LONG source) would
    * type-coerce through `coalesce + delta` into plausible-looking but
    * wrong sums, and a snapshot built at a different `scale` would be
    * off by powers of 10. Column metadata survives parquet round-trips,
    * so a persisted snapshot keeps its stamp; snapshots assembled by
    * hand (no stamp) are only checked for the LONG type. */
  private def requireSnapshotScale(snapshot: DataFrame, measures: Seq[String],
                                   scale: Int, op: String): Unit =
    measures.foreach { m =>
      val f = snapshot.schema(s"sum_$m")
      require(f.dataType == org.apache.spark.sql.types.LongType,
        s"Cdc.$op: sum_$m is ${f.dataType.simpleString}, expected LONG fixed-point " +
          "(was this snapshot built by aggSnapshot?)")
      if (f.metadata.contains(ScaleKey))
        require(f.metadata.getLong(ScaleKey) == scale.toLong,
          s"Cdc.$op: snapshot sum_$m was built at scale=${f.metadata.getLong(ScaleKey)} " +
            s"but scale=$scale was passed — combining them would be off by powers of 10")
      require(snapshot.columns.contains(s"cnt_$m"),
        s"Cdc.$op: snapshot lacks cnt_$m — the per-measure non-null count that makes " +
          "NULL-skipping avg/sum exact; rebuild it with the current aggSnapshot")
    }

  /** Presentation view of an [[aggSnapshot]]: fixed-point LONG sums
    * divided back to doubles, with SQL NULL semantics restored — a
    * group whose measure was all-NULL (cnt_<m> = 0) presents sum NULL,
    * not 0. The internal cnt_<m> helper columns are dropped from the
    * view. The snapshot itself stays exact — only read through this,
    * never write it back. */
  def aggView(snapshot: DataFrame, measures: Seq[String],
              scale: Int = 2): DataFrame = {
    requireSnapshotScale(snapshot, measures, scale, "aggView")
    val unit = math.pow(10, scale)
    measures.foldLeft(snapshot)((d, m) =>
        d.withColumn(s"sum_$m",
          when(col(s"cnt_$m") === 0, lit(null)).otherwise(col(s"sum_$m") / unit)))
      .drop(measures.map(m => s"cnt_$m"): _*)
  }

  /** [[aggSnapshot]] plus per-measure MIN/MAX columns (`min_<m>`,
    * `max_<m>`, raw type — min/max are order-insensitive so they need
    * no fixed-point treatment), plus one KMV distinct-count sketch
    * column `kmv_<c>` per `distinctCols` entry (sorted `array<bigint>`
    * of the `kmvK` smallest distinct value hashes —
    * [[graft.functions.KmvSketchAgg]]). Min/max and KMV sketches are
    * NOT retractable (a deleted row's extremum/hash can't be undone
    * without the base), so this snapshot shape is maintained by
    * [[incrementalAggRefreshAppendOnly]] — the append-only fact regime
    * (logs, events, immutable corpus shards), where it is exact. */
  /** Snapshot column name for a composite distinct key — `kmv_a__b`
    * for the tuple (a, b). */
  def tupleSketchName(cols: Seq[String]): String = s"kmv_${cols.mkString("__")}"

  def aggSnapshotMinMax(df: DataFrame, keyCols: Seq[String],
                        measures: Seq[String], scale: Int = 2,
                        distinctCols: Seq[String] = Nil,
                        kmvK: Int = graft.functions.Kmv.DefaultK,
                        hllCols: Seq[String] = Nil,
                        hllLgK: Int = 12,
                        distinctTuples: Seq[Seq[String]] = Nil,
                        kllCols: Seq[String] = Nil,
                        kllK: Int = 200): DataFrame = {
    import org.apache.spark.sql.graftshim.Shim
    val unit = math.pow(10, scale)
    distinctTuples.foreach(t => require(t.size >= 2,
      s"Cdc.aggSnapshotMinMax: distinctTuples entry ${t.mkString(",")} has fewer " +
        "than 2 columns — use distinctCols for single columns"))
    df.groupBy(keyCols.map(col).toIndexedSeq: _*)
      .agg(count(lit(1)).as("cnt"),
        (measures.map(m =>
          coalesce(sum(round(col(m) * unit).cast("long")), lit(0L))
            .as(s"sum_$m", scaleMeta(scale))) ++
          measures.map(m => count(col(m)).as(s"cnt_$m")) ++
          measures.map(m => min(col(m)).as(s"min_$m")) ++
          measures.map(m => max(col(m)).as(s"max_$m")) ++
          distinctCols.map(c => Shim.column(graft.functions.KmvSketchAgg(
            Shim.expression(Sketches.kmvHash(col(c))), kmvK)
            .toAggregateExpression()).as(s"kmv_$c")) ++
          // composite distinct keys — "distinct (user, day) PAIRS": the
          // tuple is canonicalized to one string (Sketches.kmvTupleHash)
          // and sketched exactly like a single column, so the same
          // exact-merge law holds; the DuckDB oracle replays the
          // concat_ws canonicalization literally
          distinctTuples.map(t => Shim.column(graft.functions.KmvSketchAgg(
            Shim.expression(Sketches.kmvTupleHash(t.map(col): _*)), kmvK)
            .toAggregateExpression()).as(tupleSketchName(t))) ++
          // the Datasketches-standard twin of kmv_<c>: binary HLL per
          // key, mergeable with Sketches.hllRollup and any external
          // Datasketches reader — register-max union is exact, so
          // refresh == rebuild in ESTIMATE (serialized bytes may
          // differ: sparse/dense mode depends on build order)
          hllCols.map(c =>
            hll_sketch_agg(col(c), lit(hllLgK)).as(s"hll_$c")) ++
          // per-key KLL quantile sketch (Datasketches, binary): the
          // value-DISTRIBUTION summary min/max can't give. Unlike the
          // KMV/min/max algebra, KLL compaction is randomized, so
          // refresh == rebuild only within the rank-error bound
          // (~1.65% at k=200) — never hash-gated, tolerance-gated
          kllCols.map(c =>
            kll_sketch_agg_double(col(c), lit(kllK)).as(s"kll_$c"))): _*)
  }

  /** Append-only incremental refresh of an [[aggSnapshotMinMax]]: the
    * delta is PLAIN NEW ROWS (no op column — insert-only is the
    * contract that makes min/max maintainable), pre-aggregated per
    * touched key and merged by one full-outer join: counts and
    * fixed-point sums add, minima/maxima combine via least/greatest —
    * all order-insensitive, so refresh == rebuild exactly. Same scale
    * shape as [[incrementalAggRefresh]]. */
  def incrementalAggRefreshAppendOnly(baseAgg: DataFrame, delta: DataFrame,
                                      keyCols: Seq[String], measures: Seq[String],
                                      scale: Int = 2,
                                      distinctCols: Seq[String] = Nil,
                                      kmvK: Int = graft.functions.Kmv.DefaultK,
                                      hllCols: Seq[String] = Nil,
                                      hllLgK: Int = 12,
                                      distinctTuples: Seq[Seq[String]] = Nil,
                                      kllCols: Seq[String] = Nil,
                                      kllK: Int = 200): DataFrame = {
    require(keyCols.nonEmpty, "Cdc.incrementalAggRefreshAppendOnly: empty key")
    requireSnapshotScale(baseAgg, measures, scale, "incrementalAggRefreshAppendOnly")
    val sketchNames = distinctCols.map(c => s"kmv_$c") ++
      distinctTuples.map(tupleSketchName)
    (sketchNames ++ hllCols.map(c => s"hll_$c") ++ kllCols.map(c => s"kll_$c"))
      .foreach(c => require(baseAgg.columns.contains(c),
        s"Cdc.incrementalAggRefreshAppendOnly: snapshot lacks $c — was it built " +
          "with the same distinctCols/distinctTuples/hllCols/kllCols?"))
    val d = aggSnapshotMinMax(delta, keyCols, measures, scale, distinctCols, kmvK,
      hllCols, hllLgK, distinctTuples, kllCols, kllK)
    val dr = (Seq("cnt") ++ measures.flatMap(m =>
      Seq(s"sum_$m", s"cnt_$m", s"min_$m", s"max_$m")) ++
      sketchNames ++ hllCols.map(c => s"hll_$c") ++ kllCols.map(c => s"kll_$c"))
      .foldLeft(d)((df, c) => df.withColumnRenamed(c, s"__d_$c"))
    // per-row KMV merge: both sides are sorted distinct k-bounded
    // arrays, so concat → distinct → sort → first k equals the sketch
    // rebuilt from the union of the original values (exact
    // mergeability) — all builtin array functions, codegen'd
    val emptyKmv = typedLit(Array.empty[Long])
    baseAgg.join(dr, keyCols, "full_outer")
      .select((keyCols.map(col) ++
        Seq((coalesce(col("cnt"), lit(0L)) + coalesce(col("__d_cnt"), lit(0L))).as("cnt")) ++
        measures.map(m =>
          (coalesce(col(s"sum_$m"), lit(0L)) + coalesce(col(s"__d_sum_$m"), lit(0L)))
            .as(s"sum_$m", scaleMeta(scale))) ++
        measures.map(m =>
          (coalesce(col(s"cnt_$m"), lit(0L)) + coalesce(col(s"__d_cnt_$m"), lit(0L)))
            .as(s"cnt_$m")) ++
        measures.map(m =>
          least(col(s"min_$m"), col(s"__d_min_$m")).as(s"min_$m")) ++
        measures.map(m =>
          greatest(col(s"max_$m"), col(s"__d_max_$m")).as(s"max_$m")) ++
        sketchNames.map(c =>
          Sketches.kmvUnion(
            coalesce(col(c), emptyKmv),
            coalesce(col(s"__d_$c"), emptyKmv), kmvK)
            .as(c)) ++
        // per-row HLL union; a key present on only one side keeps that
        // side's sketch (hll_union(NULL, x) would be NULL)
        hllCols.map(c =>
          when(col(s"hll_$c").isNull, col(s"__d_hll_$c"))
            .when(col(s"__d_hll_$c").isNull, col(s"hll_$c"))
            .otherwise(hll_union(col(s"hll_$c"), col(s"__d_hll_$c")))
            .as(s"hll_$c")) ++
        // per-row KLL merge, same one-sided NULL handling; randomized
        // compaction means refresh == rebuild within rank-error only
        kllCols.map(c =>
          when(col(s"kll_$c").isNull, col(s"__d_kll_$c"))
            .when(col(s"__d_kll_$c").isNull, col(s"kll_$c"))
            .otherwise(kll_sketch_merge_double(col(s"kll_$c"), col(s"__d_kll_$c")))
            .as(s"kll_$c"))).toIndexedSeq: _*)
  }

  /** The ±op PARTIAL of one change batch in [[aggSnapshot]]'s shape:
    * one row per touched key whose `cnt` / `sum_<m>` / `cnt_<m>` are
    * the batch's SIGNED contributions (op = +1 insert / −1 retract), so
    * a key's true snapshot row is the plain integer SUM of its partials
    * across batches — order-free and exact, the same fixed-point LONG
    * algebra [[incrementalAggRefresh]] applies, just left unapplied.
    * This is what lets a streaming maintainer write O(|touched keys|)
    * per batch instead of rewriting the whole snapshot: partials only
    * ever append, and readers (or compaction) fold them with
    * [[mergeSnapshotPartials]]. A partial's `cnt` can be negative
    * (a batch that only retracts) and a fully-retracted key sums to
    * cnt = 0 — merge drops those, exactly like the eager refresh. */
  def aggSnapshotDelta(delta: DataFrame, keyCols: Seq[String], opCol: String,
                       measures: Seq[String], scale: Int = 2): DataFrame = {
    require(keyCols.nonEmpty, "Cdc.aggSnapshotDelta: empty key")
    val unit = math.pow(10, scale)
    delta.groupBy(keyCols.map(col).toIndexedSeq: _*)
      .agg(coalesce(sum(col(opCol).cast("long")), lit(0L)).as("cnt"),
        (measures.map(m =>
          coalesce(sum(col(opCol) * round(col(m) * unit).cast("long")), lit(0L))
            .cast("long").as(s"sum_$m", scaleMeta(scale))) ++
          measures.map(m =>
            coalesce(sum(when(col(m).isNotNull, col(opCol).cast("long"))
              .otherwise(lit(0L))), lit(0L)).as(s"cnt_$m"))): _*)
  }

  /** Fold per-batch snapshot PARTIALS (either [[aggSnapshotDelta]]'s
    * ±op shape or whole [[aggSnapshotMinMax]] rows computed per batch)
    * back into one row per key — the merge-on-read half of the
    * append-only maintained-snapshot layout. Column roles are inferred
    * from the snapshot naming convention ([[aggSnapshot]] /
    * [[aggSnapshotMinMax]] own every non-key name): `cnt`, `sum_<m>`,
    * `cnt_<m>` sum; `min_<m>` / `max_<m>` combine via min/max;
    * `kmv_<c>` merges by exact k-bounded union
    * ([[graft.functions.KmvUnionAgg]] — merge == rebuild bit-for-bit);
    * `hll_<c>` by register-max union (estimate-exact); `kll_<c>` by
    * Datasketches KLL merge (rank-error-exact). All operations are
    * associative and commutative, so folding partials in ANY grouping
    * or order equals the one-shot build — which is also why a reader
    * that re-aggregates partials to a COARSER key (MvRewrite's
    * rewritten plans) needs no pre-merge at all. `dropEmpty` removes
    * keys whose summed `cnt` is 0 (fully retracted — the eager
    * refresh's vanishing rule); `extraMax` names provenance columns
    * (e.g. a `batch` id) merged by max. */
  def mergeSnapshotPartials(partials: DataFrame, keyCols: Seq[String],
                            scale: Int = 2,
                            kmvK: Int = graft.functions.Kmv.DefaultK,
                            dropEmpty: Boolean = true,
                            extraMax: Seq[String] = Nil): DataFrame = {
    import org.apache.spark.sql.graftshim.Shim
    require(keyCols.nonEmpty, "Cdc.mergeSnapshotPartials: empty key")
    val aggCols = partials.columns.filterNot(keyCols.contains)
    require(aggCols.contains("cnt"),
      "Cdc.mergeSnapshotPartials: no cnt column — not a snapshot-partials frame")
    val exprs = aggCols.toIndexedSeq.map {
      case c if extraMax.contains(c) => max(col(c)).as(c)
      case "cnt" => coalesce(sum(col("cnt")), lit(0L)).as("cnt")
      case c if c.startsWith("sum_") =>
        coalesce(sum(col(c)), lit(0L)).as(c, scaleMeta(scale))
      case c if c.startsWith("cnt_") => coalesce(sum(col(c)), lit(0L)).as(c)
      case c if c.startsWith("min_") => min(col(c)).as(c)
      case c if c.startsWith("max_") => max(col(c)).as(c)
      case c if c.startsWith("kmv_") =>
        Shim.column(graft.functions.KmvUnionAgg(
          Shim.expression(col(c)), kmvK).toAggregateExpression()).as(c)
      case c if c.startsWith("hll_") => hll_union_agg(col(c), lit(true)).as(c)
      case c if c.startsWith("kll_") => kll_merge_agg_double(col(c)).as(c)
      case c => throw new IllegalArgumentException(
        s"Cdc.mergeSnapshotPartials: unrecognized snapshot column $c — " +
          "is keyCols missing a key?")
    }
    val merged = partials.groupBy(keyCols.map(col).toIndexedSeq: _*)
      .agg(exprs.head, exprs.tail: _*)
    if (dropEmpty) merged.filter(col("cnt") > 0) else merged
  }

  /** Incremental materialized-aggregate refresh: apply a change batch
    * (rows tagged `opCol` = +1 insert / −1 retract) to an existing
    * [[aggSnapshot]] WITHOUT rescanning the base table — the batch
    * form of streaming view maintenance, and the only viable refresh
    * at 100 TB where the base aggregate is petabytes of history and
    * the delta is a day's partition. Count/sum over fixed-point LONGs
    * are algebraic AND exact, so retractions cancel bit-for-bit:
    * the refreshed snapshot equals the rebuilt one, not merely
    * approximates it. Groups whose count reaches zero vanish, unseen
    * keys appear. `scale` must match the snapshot's.
    *
    * Scale shape: the delta is pre-aggregated (map-side combinable) to
    * one row per touched key, then merged into the snapshot by a
    * single full-outer equi-join on the key — the snapshot is touched
    * once, and with |delta keys| ≪ |groups| the join broadcasts. */
  def incrementalAggRefresh(baseAgg: DataFrame, delta: DataFrame,
                            keyCols: Seq[String], opCol: String,
                            measures: Seq[String], scale: Int = 2): DataFrame = {
    require(keyCols.nonEmpty, "Cdc.incrementalAggRefresh: empty key")
    requireSnapshotScale(baseAgg, measures, scale, "incrementalAggRefresh")
    val unit = math.pow(10, scale)
    // per-measure non-null count delta: ±op per row where the measure is
    // non-NULL — a retraction of a NULL-measure row must not decrement it
    val d = delta.groupBy(keyCols.map(col).toIndexedSeq: _*)
      .agg(sum(col(opCol)).as("__dc"),
        (measures.map(m =>
          sum(col(opCol) * round(col(m) * unit).cast("long")).as(s"__ds_$m")) ++
          measures.map(m =>
            sum(when(col(m).isNotNull, col(opCol)).otherwise(lit(0)))
              .as(s"__dn_$m"))): _*)
    baseAgg.join(d, keyCols, "full_outer")
      .select((keyCols.map(col) ++
        Seq((coalesce(col("cnt"), lit(0L)) + coalesce(col("__dc"), lit(0L))).as("cnt")) ++
        measures.map(m =>
          (coalesce(col(s"sum_$m"), lit(0L)) + coalesce(col(s"__ds_$m"), lit(0L)))
            .as(s"sum_$m", scaleMeta(scale))) ++
        measures.map(m =>
          (coalesce(col(s"cnt_$m"), lit(0L)) + coalesce(col(s"__dn_$m"), lit(0L)))
            .as(s"cnt_$m"))).toIndexedSeq: _*)
      .filter(col("cnt") > 0)
  }

  /** Build an SCD-2 (type-2 slowly-changing-dimension) history from a
    * change stream: every change row becomes a version whose validity
    * interval is [its own `orderCols.head`, the key's NEXT change)
    * — `valid_to` NULL and `is_current` true on the latest version.
    * The dimension-table idiom behind "what did this customer's record
    * say when the order shipped" point-in-time joins, and the durable
    * form of [[mergeUpsert]]'s history that upserts throw away.
    *
    * `orderCols` must be a deterministic total order per key (ties
    * would make version boundaries ambiguous — pass a tiebreaker
    * column, e.g. the change's own id, after the event time).
    *
    * Scale shape: one window over (key, order) — a single hash shuffle
    * on the key, the same exchange any per-key history operation pays;
    * no self-join, nothing driver-side. */
  def scd2Build(changes: DataFrame, keyCols: Seq[String],
                orderCols: Seq[String]): DataFrame = {
    require(keyCols.nonEmpty, "Cdc.scd2Build: empty key")
    require(orderCols.nonEmpty, "Cdc.scd2Build: empty ordering")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(keyCols.map(col): _*).orderBy(orderCols.map(col): _*)
    changes
      .withColumn("valid_to", lead(col(orderCols.head), 1).over(w))
      .withColumn("is_current", col("valid_to").isNull)
  }

  /** Incrementally apply a change batch to an existing [[scd2Build]]
    * dimension: versions of untouched keys pass through UNREAD beyond
    * one anti-join probe; only touched keys' histories are re-versioned
    * (their old rows + the new changes re-run through [[scd2Build]]) —
    * so a day's delta against a 100 TB dimension costs one scan plus
    * O(|touched histories|), with the (tiny) change-key set broadcast
    * by default, same regime switch as [[mergeUpsert]]. */
  def scd2Apply(dim: DataFrame, changes: DataFrame, keyCols: Seq[String],
                orderCols: Seq[String], broadcastKeys: Boolean = true): DataFrame = {
    require(keyCols.nonEmpty, "Cdc.scd2Apply: empty key")
    val keySet = changes.select(keyCols.map(col).toIndexedSeq: _*).distinct()
    val bc: DataFrame = if (broadcastKeys) broadcast(keySet) else keySet
    val untouched = dim.join(bc, keyCols, "left_anti")
    val touchedHistory = dim.join(bc, keyCols, "left_semi")
      .drop("valid_to", "is_current")
    untouched.unionByName(
      scd2Build(touchedHistory.unionByName(changes), keyCols, orderCols))
  }

  /** Point-in-time join against an SCD-2 dimension ([[scd2Build]]'s
    * output shape): each fact row joins the dimension VERSION that was
    * current at the fact's own timestamp — `valid_from <= ts < valid_to`
    * (NULL valid_to = still current) — the "what did this customer's
    * record say when the order shipped" lookup that upsert-style
    * dimensions cannot answer.
    *
    * Scale shape: an equi-join on the key plus a version-interval
    * filter — the fact shuffles once on the key (or not at all when the
    * dimension broadcasts, the normal regime); the pre-filter fan-out
    * is |versions per key|, small by the dimension contract, never a
    * cross product. Facts whose key has no version valid at their ts
    * (or no version at all) are dropped — inner semantics; left-join
    * variants are a select away from [[scd2Build]]'s history. */
  def pointInTimeJoin(fact: DataFrame, dim: DataFrame, keyCols: Seq[String],
                      factTsCol: String, validFromCol: String,
                      validToCol: String = "valid_to"): DataFrame = {
    require(keyCols.nonEmpty, "Cdc.pointInTimeJoin: empty key")
    fact.join(dim, keyCols)
      .filter(col(factTsCol) >= col(validFromCol) &&
        (col(validToCol).isNull || col(factTsCol) < col(validToCol)))
  }

  /** Snapshot diff: classify every key across two corpus versions as
    * `added` (new only), `removed` (old only), `changed` (present in
    * both, any compare column differs — null-safe), or `unchanged` —
    * the audit step between two pipeline runs ("what did this rebuild
    * actually touch?") and the input to incremental downstream refresh
    * (recompute embeddings/dedup only for added+changed).
    *
    * One full-outer hash equi-join on the key — both sides shuffle
    * once on the same key, so at 100 TB the cost is the two scans plus
    * one co-partitioned merge; comparison is a narrow codegen'd
    * expression, and nothing collects. Output: keyCols + change_type.
    */
  def snapshotDiff(oldDf: DataFrame, newDf: DataFrame, keyCols: Seq[String],
                   compareCols: Seq[String]): DataFrame = {
    require(keyCols.nonEmpty, "Cdc.snapshotDiff: empty key")
    require(compareCols.nonEmpty, "Cdc.snapshotDiff: no compare columns")
    val o = oldDf.select((keyCols ++ compareCols).map(col).toIndexedSeq: _*)
      .withColumn("__old", lit(1))
    val n0 = newDf.select((keyCols ++ compareCols).map(col).toIndexedSeq: _*)
      .withColumn("__new", lit(1))
    val n = compareCols.foldLeft(n0)((d, c) => d.withColumnRenamed(c, s"__n_$c"))
    val joined = o.join(n, keyCols, "full_outer")
    val differs = compareCols
      .map(c => !(col(c) <=> col(s"__n_$c")))
      .reduce(_ || _)
    joined.withColumn("change_type",
        when(col("__old").isNull, lit("added"))
          .when(col("__new").isNull, lit("removed"))
          .when(differs, lit("changed"))
          .otherwise(lit("unchanged")))
      .select((keyCols.map(col) :+ col("change_type")).toIndexedSeq: _*)
  }
}
