package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** SURVEY §2.3 relational surface Q1–Q12 over the TPC-H-ish tables.
  *
  * All compositions of the reference's own operator model —
  * map/filter/keyBy/reduce/join/sink (flink_arch.drawio page
  * "DataStream分析") — expressed declaratively so Catalyst plans them
  * (pushdown, pruning, broadcast, AQE). Scale notes per query below.
  *
  * Oracle-parity conventions (DuckDB hash-compare):
  *  - every output column explicitly aliased, same name both sides;
  *  - aggregate/cast types aligned (DuckDB sum(int)→hugeint, year→bigint,
  *    row_number→bigint are cast to Spark's int/bigint equivalents);
  *  - deterministic tiebreakers on every order-sensitive query.
  */
object Relational {

  /** Queries where one ANSI SQL text runs identically on Spark (via
    * temp views over the parquet) and DuckDB: single source of truth. */
  private def shared(name: String, sql: String, bench: Boolean = true): QueryDef =
    QueryDef(name, Some(sql), bench) { (spark, dir) =>
      Tables(spark, dir).registerAll()
      spark.sql(sql)
    }

  // Q1 — projection + scalar expressions (arith, concat, lower, substr, year).
  // Scale: narrow map over the fact table; no shuffle; column-pruned scan.
  private val q1 = shared("q1_project",
    """SELECT l_orderkey,
      |       l_linenumber,
      |       l_extendedprice * (1 - l_discount)                AS revenue,
      |       l_extendedprice * (1 - l_discount) * (1 + l_tax)  AS charge,
      |       l_returnflag || '/' || l_linestatus               AS flag_status,
      |       lower(l_returnflag)                               AS rf_lower,
      |       substr(cast(l_shipdate AS STRING), 1, 7)          AS ship_month,
      |       cast(year(l_shipdate) AS INT)                     AS ship_year
      |FROM lineitem""".stripMargin)

  // Q2 — filter with conjunct/disjunct/IN/BETWEEN/LIKE/IS NULL.
  // Scale: all predicates pushable to the parquet scan (PushedFilters).
  private val q2 = QueryDef("q2_filter", Some(
    """SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice, l_returnflag, l_shipdate
      |FROM lineitem
      |WHERE l_shipdate BETWEEN '1996-01-01' AND '1998-12-31'
      |  AND l_returnflag IN ('A', 'N')
      |  AND l_quantity BETWEEN 5 AND 45
      |  AND (l_linestatus LIKE 'O%' OR l_discount > 0.05)
      |  AND l_extendedprice IS NOT NULL""".stripMargin)) { (spark, dir) =>
    Tables(spark, dir).lineitem
      .filter(col("l_shipdate").between("1996-01-01", "1998-12-31")
        && col("l_returnflag").isin("A", "N")
        && col("l_quantity").between(5, 45)
        && (col("l_linestatus").like("O%") || col("l_discount") > 0.05)
        && col("l_extendedprice").isNotNull)
      .select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice",
        "l_returnflag", "l_shipdate")
  }

  // Q3 — multi-key hash aggregate, sum/count/avg/min/max (TPC-H Q1 shape).
  // Scale: partial (map-side) agg before the shuffle is automatic for all
  // these aggregates; output cardinality is tiny (|flag|×|status|).
  private val q3 = QueryDef("q3_agg", Some(
    """SELECT l_returnflag, l_linestatus,
      |       sum(l_quantity)                                    AS sum_qty,
      |       sum(l_extendedprice)                               AS sum_base_price,
      |       sum(l_extendedprice * (1 - l_discount))            AS sum_disc_price,
      |       avg(l_quantity)                                    AS avg_qty,
      |       avg(l_discount)                                    AS avg_disc,
      |       min(l_extendedprice)                               AS min_price,
      |       max(l_extendedprice)                               AS max_price,
      |       count(*)                                           AS count_order
      |FROM lineitem
      |WHERE l_shipdate <= '1998-09-02'
      |GROUP BY l_returnflag, l_linestatus""".stripMargin)) { (spark, dir) =>
    Tables(spark, dir).lineitem
      .filter(col("l_shipdate") <= "1998-09-02")
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        sum("l_quantity").as("sum_qty"),
        sum("l_extendedprice").as("sum_base_price"),
        sum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("sum_disc_price"),
        avg("l_quantity").as("avg_qty"),
        avg("l_discount").as("avg_disc"),
        min("l_extendedprice").as("min_price"),
        max("l_extendedprice").as("max_price"),
        count(lit(1)).as("count_order"))
  }

  // Q4 — inner equi-join chain customer⋈orders⋈lineitem + aggregate.
  // Scale: both joins shuffle on their keys (SMJ/SHJ — AQE picks); the
  // aggregate reuses the o_custkey-side shuffle where possible. No
  // driver-side work; output is per-customer (bounded by |customer|).
  private val q4 = QueryDef("q4_join", Some(
    """SELECT c_custkey, c_name,
      |       count(*)                                AS n_items,
      |       sum(l_extendedprice * (1 - l_discount)) AS revenue
      |FROM customer
      |JOIN orders   ON c_custkey = o_custkey
      |JOIN lineitem ON o_orderkey = l_orderkey
      |GROUP BY c_custkey, c_name""".stripMargin)) { (spark, dir) =>
    val t = Tables(spark, dir)
    t.customer
      .join(t.orders, col("c_custkey") === col("o_custkey"))
      .join(t.lineitem, col("o_orderkey") === col("l_orderkey"))
      .groupBy("c_custkey", "c_name")
      .agg(count(lit(1)).as("n_items"),
        sum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("revenue"))
  }

  // Q4b — left outer join preserving customers without orders.
  private val q4l = QueryDef("q4_join_left", Some(
    """SELECT c_custkey, count(o_orderkey) AS n_orders
      |FROM customer LEFT JOIN orders ON c_custkey = o_custkey
      |GROUP BY c_custkey""".stripMargin)) { (spark, dir) =>
    val t = Tables(spark, dir)
    t.customer.join(t.orders, col("c_custkey") === col("o_custkey"), "left")
      .groupBy("c_custkey")
      .agg(count(col("o_orderkey")).as("n_orders"))
  }

  // Q4c — left semi join: customers having at least one high-value order.
  // Scale: semi-join avoids materializing the orders payload.
  private val q4s = QueryDef("q4_join_semi", Some(
    """SELECT c_custkey, c_name FROM customer
      |WHERE EXISTS (SELECT 1 FROM orders
      |              WHERE o_custkey = c_custkey AND o_totalprice > 200000)""".stripMargin)) { (spark, dir) =>
    val t = Tables(spark, dir)
    t.customer.join(
      t.orders.filter(col("o_totalprice") > 200000),
      col("c_custkey") === col("o_custkey"), "left_semi")
      .select("c_custkey", "c_name")
  }

  // Q4d — left anti join: customers with no 'F'-status order.
  private val q4a = QueryDef("q4_join_anti", Some(
    """SELECT c_custkey, c_name FROM customer
      |WHERE NOT EXISTS (SELECT 1 FROM orders
      |                  WHERE o_custkey = c_custkey AND o_orderstatus = 'F')""".stripMargin)) { (spark, dir) =>
    val t = Tables(spark, dir)
    t.customer.join(
      t.orders.filter(col("o_orderstatus") === "F"),
      col("c_custkey") === col("o_custkey"), "left_anti")
      .select("c_custkey", "c_name")
  }

  // Q4e — full outer join of per-customer order stats against customers.
  private val q4f = QueryDef("q4_join_full", Some(
    """SELECT c_custkey, c_name, o.n_orders AS n_orders
      |FROM customer
      |FULL JOIN (SELECT o_custkey, count(*) AS n_orders
      |           FROM orders GROUP BY o_custkey) o
      |  ON c_custkey = o.o_custkey""".stripMargin)) { (spark, dir) =>
    val t = Tables(spark, dir)
    val per = t.orders.groupBy("o_custkey").agg(count(lit(1)).as("n_orders"))
    t.customer.join(per, col("c_custkey") === col("o_custkey"), "full")
      .select(col("c_custkey"), col("c_name"), col("n_orders"))
  }

  // Q5 — broadcast join of small dims (nation 25 rows, region 5 rows).
  // Scale: explicit broadcast() hints keep the big side shuffle-free —
  // the dims replicate to every executor; only the final tiny aggregate
  // shuffles. At 100TB this is the only sane plan for dim joins.
  private val q5 = QueryDef("q5_broadcast_join", Some(
    """SELECT n_name, r_name, count(*) AS n_customers, sum(c_acctbal) AS total_bal
      |FROM customer
      |JOIN nation ON c_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |GROUP BY n_name, r_name""".stripMargin)) { (spark, dir) =>
    val t = Tables(spark, dir)
    t.customer
      .join(broadcast(t.nation), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(t.region), col("n_regionkey") === col("r_regionkey"))
      .groupBy("n_name", "r_name")
      .agg(count(lit(1)).as("n_customers"), sum("c_acctbal").as("total_bal"))
  }

  // Q6 — top-k: highest-revenue customers. Deterministic tiebreak on key.
  // Scale: planner turns orderBy+limit into TakeOrderedAndProject —
  // per-partition top-k then a k-row merge on the driver; never a full sort.
  private val q6 = QueryDef("q6_topk", Some(
    """SELECT c_custkey, c_name, revenue FROM (
      |  SELECT c_custkey, c_name,
      |         sum(l_extendedprice * (1 - l_discount)) AS revenue
      |  FROM customer
      |  JOIN orders   ON c_custkey = o_custkey
      |  JOIN lineitem ON o_orderkey = l_orderkey
      |  GROUP BY c_custkey, c_name)
      |ORDER BY revenue DESC, c_custkey
      |LIMIT 10""".stripMargin)) { (spark, dir) =>
    val t = Tables(spark, dir)
    t.customer
      .join(t.orders, col("c_custkey") === col("o_custkey"))
      .join(t.lineitem, col("o_orderkey") === col("l_orderkey"))
      .groupBy("c_custkey", "c_name")
      .agg(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("revenue"))
      .orderBy(col("revenue").desc, col("c_custkey"))
      .limit(10)
  }

  // Q7 — set operations (distinct semantics in both engines).
  private val q7u = QueryDef("q7_union", Some(
    """SELECT c_custkey AS custkey FROM customer WHERE c_mktsegment = 'BUILDING'
      |UNION
      |SELECT o_custkey AS custkey FROM orders WHERE o_totalprice > 250000""".stripMargin)) { (spark, dir) =>
    val t = Tables(spark, dir)
    t.customer.filter(col("c_mktsegment") === "BUILDING").select(col("c_custkey").as("custkey"))
      .union(t.orders.filter(col("o_totalprice") > 250000).select(col("o_custkey").as("custkey")))
      .distinct()
  }

  private val q7i = QueryDef("q7_intersect", Some(
    """SELECT c_custkey AS custkey FROM customer WHERE c_acctbal > 5000
      |INTERSECT
      |SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'O'""".stripMargin)) { (spark, dir) =>
    val t = Tables(spark, dir)
    t.customer.filter(col("c_acctbal") > 5000).select(col("c_custkey").as("custkey"))
      .intersect(t.orders.filter(col("o_orderstatus") === "O").select(col("o_custkey").as("custkey")))
  }

  private val q7e = QueryDef("q7_except", Some(
    """SELECT c_custkey AS custkey FROM customer
      |EXCEPT
      |SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'F'""".stripMargin)) { (spark, dir) =>
    val t = Tables(spark, dir)
    t.customer.select(col("c_custkey").as("custkey"))
      .except(t.orders.filter(col("o_orderstatus") === "F").select(col("o_custkey").as("custkey")))
  }

  // Q8 — window functions: row_number/rank/lag + running frame sum.
  // Deterministic ORDER BY (orderdate, orderkey — orderkey unique).
  // Scale: single shuffle on the partition key, in-partition sort; frames
  // evaluated streaming within each partition.
  private val q8 = QueryDef("q8_window", Some(
    """SELECT o_custkey, o_orderkey,
      |       cast(row_number() OVER w AS INT)         AS rn,
      |       cast(rank()       OVER w AS INT)         AS rnk,
      |       lag(o_totalprice) OVER w                 AS prev_price,
      |       sum(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
      |                               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      |                                                 AS running_spend
      |FROM orders
      |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)""".stripMargin)) { (spark, dir) =>
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    val wf = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables(spark, dir).orders.select(
      col("o_custkey"), col("o_orderkey"),
      row_number().over(w).as("rn"),
      rank().over(w).as("rnk"),
      lag("o_totalprice", 1).over(w).as("prev_price"),
      sum("o_totalprice").over(wf).as("running_spend"))
  }

  // Q9 — rollup and cube hierarchies over nation × order-year.
  private def q9Base(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    t.orders
      .join(t.customer, col("o_custkey") === col("c_custkey"))
      .join(broadcast(t.nation), col("c_nationkey") === col("n_nationkey"))
      .withColumn("order_year", year(col("o_orderdate")))
  }
  private val q9OracleBase =
    """FROM (SELECT n_name, cast(year(o_orderdate) AS INT) AS order_year, o_totalprice
      |      FROM orders
      |      JOIN customer ON o_custkey = c_custkey
      |      JOIN nation   ON c_nationkey = n_nationkey)""".stripMargin

  private val q9r = QueryDef("q9_rollup", Some(
    s"""SELECT n_name, order_year, sum(o_totalprice) AS revenue, count(*) AS n_orders
       |$q9OracleBase
       |GROUP BY ROLLUP(n_name, order_year)""".stripMargin)) { (spark, dir) =>
    q9Base(spark, dir)
      .rollup(col("n_name"), col("order_year"))
      .agg(sum("o_totalprice").as("revenue"), count(lit(1)).as("n_orders"))
  }

  private val q9c = QueryDef("q9_cube", Some(
    s"""SELECT n_name, order_year, sum(o_totalprice) AS revenue, count(*) AS n_orders
       |$q9OracleBase
       |GROUP BY CUBE(n_name, order_year)""".stripMargin)) { (spark, dir) =>
    q9Base(spark, dir)
      .cube(col("n_name"), col("order_year"))
      .agg(sum("o_totalprice").as("revenue"), count(lit(1)).as("n_orders"))
  }

  // Q10 — deterministic dedup-by-key (keep min doc_id per identical text).
  // Scale: hash-partition on the dedup key; map-side partial min.
  private val q10 = QueryDef("q10_dedup", Some(
    """SELECT cast(min(doc_id) AS BIGINT) AS doc_id, text
      |FROM documents GROUP BY text""".stripMargin)) { (spark, dir) =>
    graft.ops.Dedup.exactByKey(Tables(spark, dir).documents, "text", "doc_id")
  }

  // Q12 — exact + approximate distinct counting.
  private val q12 = shared("q12_count_distinct",
    """SELECT l_returnflag,
      |       count(DISTINCT l_orderkey) AS n_orders,
      |       count(DISTINCT l_partkey)  AS n_parts
      |FROM lineitem GROUP BY l_returnflag""".stripMargin)

  // Builtin HLL approx_count_distinct is covered SPEC-ONLY
  // (QueriesSmokeSpec's tolerance contract): its estimate is randomized
  // by implementation internals, so it can never hash-match an oracle —
  // the deterministic q12_kmv_distinct below is the registry's
  // approximate-distinct row, and carrying a permanently-`no_oracle`
  // entry would only blur the zero-failure gate.

  // The DETERMINISTIC approximate-distinct twin (same move as the
  // integer-quantized IVF): a K-minimum-values sketch over the engine's
  // own fnv64 finished by the Fibonacci mix into [0, 2^61) — est =
  // (k−1)·M / (kth smallest mixed hash), exact count when a group has
  // fewer than k distinct values. Every step is integer (FNV, mod-2^64
  // Fibonacci multiply replayed in HUGEINT split-multiply form, >>3,
  // kth-order statistic) except one final IEEE multiply+divide+round
  // mirrored literally in the oracle, so the whole estimator
  // hash-checks — approximate in STATISTICS, exact in ARITHMETIC. The
  // oracle SQL below is shared with q_incr_kmv so engine and checker
  // cannot drift. Scale shape: one narrow hash pass into the k-bounded
  // KmvSketchAgg buffer (at most k longs per group map-side), nothing
  // driver-side.
  /** DuckDB replay of [[graft.functions.Kmv]]: fnv64 per distinct
    * value, Fibonacci-mixed into [0, 2^61) (the HUGEINT split-multiply
    * form of `(h · 0x9E3779B97F4A7C15 mod 2^64) >>> 3`), k smallest
    * per group, shared estimator arithmetic. */
  /** The fnv64 + Fibonacci-mix CTE chain (h0 → mx → hp → rk) shared by
    * every KMV oracle: per-key distinct mixed hashes with their
    * ascending rank. */
  private def kmvHashCtes(tbl: String, keyCols: Seq[String], valExpr: String): String = {
    val keys = keyCols.mkString(", ")
    s"""h0 AS (SELECT DISTINCT $keys,
       |    list_reduce(list_prepend(14695981039346656037::HUGEINT,
       |      list_transform(str_split(CAST($valExpr AS VARCHAR), ''), c -> ascii(c)::HUGEINT)),
       |      (acc, x) -> ((acc - acc % 65536) + xor((acc % 65536)::BIGINT, x::BIGINT)::HUGEINT)
       |                  * 1099511628211 % 18446744073709551616::HUGEINT) AS h
       |  FROM $tbl),
       |mx AS (SELECT $keys,
       |    (((h // 4294967296) * 2135587861 + (h % 4294967296) * 2654435769) * 4294967296
       |      + (h % 4294967296) * 2135587861) % 18446744073709551616::HUGEINT AS p
       |  FROM h0),
       |hp AS (SELECT DISTINCT $keys, (p // 8)::BIGINT AS hp FROM mx),
       |rk AS (SELECT $keys, hp,
       |              row_number() OVER (PARTITION BY $keys ORDER BY hp) AS rn
       |       FROM hp)""".stripMargin
  }

  private def kmvOracleSql(tbl: String, keyCols: Seq[String], valExpr: String,
                           k: Int): String = {
    val m = 1L << 61
    val keys = keyCols.mkString(", ")
    s"""WITH ${kmvHashCtes(tbl, keyCols, valExpr)}
       |SELECT $keys,
       |       max(hp) AS kth_min_hash,
       |       CAST(count(*) AS INT) AS k_used,
       |       CAST(CASE WHEN count(*) < $k THEN count(*)
       |            ELSE round(${k - 1}.0 * $m.0 / CAST(max(hp) AS DOUBLE)) END AS BIGINT) AS kmv_est
       |FROM rk WHERE rn <= $k
       |GROUP BY $keys""".stripMargin
  }

  /** Present a stored KMV sketch column as (kth_min_hash, k_used,
    * kmv_est) — the [[kmvOracleSql]] output shape. */
  private def kmvPresentation(keyCols: Seq[String], kmvCol: String, k: Int) = {
    val kmv = col(kmvCol)
    (df: org.apache.spark.sql.DataFrame) => df.select(
      (keyCols.map(col) ++ Seq(
        // guard: element_at(_, 0) is an error; an empty sketch (all-NULL
        // group) presents NULL like the oracle's absent group would
        when(size(kmv) > 0, element_at(kmv, size(kmv))).as("kth_min_hash"),
        size(kmv).as("k_used"),
        graft.ops.Sketches.kmvEstimate(kmv, k).as("kmv_est"))): _*)
  }

  private val q12kmv = {
    val k = 64
    QueryDef("q12_kmv_distinct", Some(
      kmvOracleSql("lineitem", Seq("l_returnflag"), "l_orderkey", k))) { (spark, dir) =>
      val sketches = graft.ops.Sketches.kmvPartials(
        Tables(spark, dir).lineitem.select("l_returnflag", "l_orderkey"),
        Seq("l_returnflag"), "l_orderkey", k)
      kmvPresentation(Seq("l_returnflag"), "kmv", k)(sketches)
    }
  }

  // Q9c — GROUPING SETS (SQL surface; rollup/cube are the API surface).
  private val q9g = shared("q9_grouping_sets",
    """SELECT o_orderstatus, o_orderpriority,
      |       sum(o_totalprice) AS revenue, count(*) AS n_orders
      |FROM orders
      |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())""".stripMargin)

  // Q1b — date functions: month-level truncation + extraction.
  private val q1d = QueryDef("q1_dates", Some(
    """SELECT cast(cast(date_trunc('month', o_orderdate) AS TIMESTAMP) AS STRING) AS order_month,
      |       cast(year(o_orderdate) AS INT)    AS y,
      |       cast(month(o_orderdate) AS INT)   AS m,
      |       count(*)                          AS n,
      |       sum(o_totalprice)                 AS revenue
      |FROM orders
      |GROUP BY 1, 2, 3""".stripMargin)) { (spark, dir) =>
    Tables(spark, dir).orders
      .groupBy(
        date_trunc("month", col("o_orderdate")).cast("string").as("order_month"),
        year(col("o_orderdate")).as("y"),
        month(col("o_orderdate")).as("m"))
      .agg(count(lit(1)).as("n"), sum("o_totalprice").as("revenue"))
  }

  // Q11 — array functions over the embedding column: size, element
  // access, slice, reduction (the builtin-HOF surface).
  private val q11a = QueryDef("q11_array", Some(
    """SELECT vec_id,
      |       cast(len(embedding) AS INT)          AS dim,
      |       embedding[1]                         AS first_val,
      |       cast(list_sum(list_transform(embedding, x -> CASE WHEN x > 0 THEN 1 ELSE 0 END)) AS INT)
      |                                            AS n_positive,
      |       list_sum(list_transform(embedding::DOUBLE[], x -> x * x)) AS sq_norm
      |FROM embeddings""".stripMargin)) { (spark, dir) =>
    Tables(spark, dir).embeddings.select(
      col("vec_id"),
      size(col("embedding")).as("dim"),
      element_at(col("embedding"), 1).as("first_val"),
      aggregate(col("embedding"), lit(0),
        (acc, x) => acc + when(x > 0, 1).otherwise(0)).as("n_positive"),
      aggregate(col("embedding"), lit(0.0),
        (acc, x) => acc + x.cast("double") * x.cast("double")).as("sq_norm"))
  }

  // §2.5 UDAF surface: typed Aggregator registered as an untyped UDAF.
  // Partial buffers merge map-side like builtin aggregates.
  private val qUdaf = QueryDef("q_udaf_wavg", Some(
    """SELECT l_returnflag,
      |       sum(l_extendedprice * l_quantity) / sum(l_quantity) AS wavg_price,
      |       count(*) AS n
      |FROM lineitem GROUP BY l_returnflag""".stripMargin)) { (spark, dir) =>
    val wavg = udaf(graft.ops.Aggregators.WeightedAvg)
    Tables(spark, dir).lineitem
      .groupBy("l_returnflag")
      .agg(
        wavg(col("l_extendedprice"), col("l_quantity")).as("wavg_price"),
        count(lit(1)).as("n"))
  }

  // Q3b — percentile/median aggregates (interpolated, double column —
  // Spark `percentile` and DuckDB `quantile_cont` agree there).
  // SCALE BOUND (documented, deliberate): Spark's exact `percentile`
  // buffers a value→count map per group — O(distinct values) memory in
  // one task, unbounded in data scale (at 100× sf, ~10^7 distinct
  // prices ≈ hundreds of MB per group). Exactness is what the DuckDB
  // quantile_cont hash-match requires; the scale-safe path is the KLL
  // sketch (Sketches.kllPartials/kllRollup, ~1.65% rank error, O(k log
  // n) memory), probed against this exact version at 20× distinct
  // values in ScaleProbe's percentile stage.
  private val q3p = QueryDef("q3_percentiles", Some(
    """SELECT l_returnflag,
      |       median(l_quantity)              AS med_qty,
      |       quantile_cont(l_quantity, 0.9)  AS p90_qty,
      |       quantile_cont(l_extendedprice, 0.25) AS p25_price
      |FROM lineitem GROUP BY l_returnflag""".stripMargin)) { (spark, dir) =>
    // one percentile buffer serves both l_quantity cuts (median is
    // percentile 0.5 — same Percentile aggregate, same interpolation),
    // halving the O(distinct)-sized map builds and merges
    Tables(spark, dir).lineitem
      .groupBy("l_returnflag")
      .agg(
        expr("percentile(l_quantity, array(0.5D, 0.9D))").as("p_qty"),
        expr("percentile(l_extendedprice, 0.25)").as("p25_price"))
      .select(col("l_returnflag"),
        col("p_qty").getItem(0).as("med_qty"),
        col("p_qty").getItem(1).as("p90_qty"),
        col("p25_price"))
  }

  // Q3c — statistical aggregates.
  private val q3s = QueryDef("q3_stats", Some(
    """SELECT l_returnflag,
      |       stddev_samp(l_extendedprice)            AS sd_price,
      |       var_samp(l_quantity)                    AS var_qty,
      |       corr(l_quantity, l_extendedprice)       AS corr_qp,
      |       covar_samp(l_quantity, l_extendedprice) AS cov_qp
      |FROM lineitem GROUP BY l_returnflag""".stripMargin)) { (spark, dir) =>
    Tables(spark, dir).lineitem
      .groupBy("l_returnflag")
      .agg(
        stddev_samp("l_extendedprice").as("sd_price"),
        var_samp("l_quantity").as("var_qty"),
        corr("l_quantity", "l_extendedprice").as("corr_qp"),
        covar_samp("l_quantity", "l_extendedprice").as("cov_qp"))
  }

  // Q3d — argmax with deterministic tiebreak: max_by over a struct on
  // the Spark side; window formulation in the oracle (DuckDB arg_max
  // can't take a struct tiebreaker).
  private val q3m = QueryDef("q_agg_argmax", Some(
    """SELECT l_returnflag, l_orderkey AS top_orderkey, l_extendedprice AS top_price
      |FROM (SELECT l_returnflag, l_orderkey, l_extendedprice,
      |             row_number() OVER (PARTITION BY l_returnflag
      |                                ORDER BY l_extendedprice DESC, l_orderkey) AS rn
      |      FROM lineitem)
      |WHERE rn = 1""".stripMargin)) { (spark, dir) =>
    Tables(spark, dir).lineitem
      .groupBy("l_returnflag")
      .agg(
        max_by(col("l_orderkey"), struct(col("l_extendedprice"), -col("l_orderkey"))).as("top_orderkey"),
        max("l_extendedprice").as("top_price"))
  }

  // Q2b — null grouping keys flow through aggregation identically.
  private val q2n = shared("q2_null_groups",
    """SELECT nullif(l_returnflag, 'A') AS rf, count(*) AS n, sum(l_quantity) AS qty
      |FROM lineitem GROUP BY 1""".stripMargin)

  // Q4e — correlated EXISTS. Catalyst rewrites it to a left-semi join
  // (RewritePredicateSubquery), so the plan is the same shuffle-on-key
  // shape as q4_join_semi; the subquery syntax is what's under test.
  private val q4ex = shared("q_subq_exists",
    """SELECT c_custkey, c_name
      |FROM customer c
      |WHERE EXISTS (SELECT 1 FROM orders o
      |              WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 400000)""".stripMargin)

  // Q4n — NOT EXISTS → left-anti join rewrite.
  private val q4nx = shared("q_subq_not_exists",
    """SELECT c_custkey, c_mktsegment
      |FROM customer c
      |WHERE NOT EXISTS (SELECT 1 FROM orders o
      |                  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 300000)""".stripMargin)

  // Q4s2 — scalar subqueries: correlated (count per outer row → left
  // outer join + null→0 fixup by Catalyst) and uncorrelated (computed
  // once, broadcast as a literal).
  private val q4sc = shared("q_subq_scalar",
    """SELECT o_orderkey, o_totalprice,
      |       (SELECT count(*) FROM lineitem l WHERE l.l_orderkey = o.o_orderkey) AS n_items
      |FROM orders o
      |WHERE o_totalprice > (SELECT avg(o_totalprice) FROM orders)""".stripMargin)

  // Q7b — multiset set ops (ALL variants keep duplicates).
  private val q7ia = shared("q7_intersect_all",
    """SELECT l_partkey FROM lineitem WHERE l_returnflag = 'A'
      |INTERSECT ALL
      |SELECT l_partkey FROM lineitem WHERE l_returnflag = 'N'""".stripMargin)

  private val q7ea = shared("q7_except_all",
    """SELECT l_suppkey FROM lineitem WHERE l_linestatus = 'F'
      |EXCEPT ALL
      |SELECT l_suppkey FROM lineitem WHERE l_returnflag = 'R'""".stripMargin)

  // Q13 — pivot through the dedicated DataFrame API. Values are declared
  // explicitly (Seq("A","N","R")) so no driver-side distinct-collect
  // runs before planning — the scale-correct way to pivot. Oracle =
  // the equivalent conditional aggregation.
  private val qPivot = QueryDef("q_pivot", Some(
    """SELECT l_linestatus,
      |       sum(CASE WHEN l_returnflag = 'A' THEN l_quantity END) AS qty_a,
      |       sum(CASE WHEN l_returnflag = 'N' THEN l_quantity END) AS qty_n,
      |       sum(CASE WHEN l_returnflag = 'R' THEN l_quantity END) AS qty_r
      |FROM lineitem GROUP BY l_linestatus""".stripMargin)) { (spark, dir) =>
    Tables(spark, dir).lineitem
      .groupBy("l_linestatus")
      .pivot("l_returnflag", Seq("A", "N", "R"))
      .agg(sum("l_quantity"))
      .withColumnRenamed("A", "qty_a")
      .withColumnRenamed("N", "qty_n")
      .withColumnRenamed("R", "qty_r")
  }

  // Q8b — ranking/distribution window functions beyond q8_window:
  // ntile, percent_rank, cume_dist, first_value, nth_value with an
  // explicit ROWS frame. Deterministic total order via the custkey
  // tiebreaker. Casts are no-ops on Spark, needed by DuckDB (ntile →
  // bigint there).
  private val q8b = shared("q8_window_dist",
    """SELECT c_custkey, c_mktsegment, c_acctbal,
      |       cast(ntile(4) OVER w AS INT)  AS bal_quartile,
      |       percent_rank() OVER w          AS pct_rank,
      |       cume_dist() OVER w             AS cum_dist,
      |       first_value(c_custkey) OVER w  AS richest_cust,
      |       nth_value(c_custkey, 2) OVER (PARTITION BY c_mktsegment
      |                                     ORDER BY c_acctbal DESC, c_custkey
      |                                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      |                                      AS second_cust
      |FROM customer
      |WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey)""".stripMargin)

  // Q1s — string-function coverage: levenshtein, split_part, translate,
  // lpad, regexp_extract, reverse. One narrow projection; casts are
  // no-ops on Spark (DuckDB levenshtein/length → bigint).
  private val qStrings = shared("q_strings",
    """SELECT p_partkey,
      |       cast(levenshtein(p_brand, 'Brand#13') AS INT) AS lev_brand,
      |       split_part(p_name, ' ', 1)                    AS first_word,
      |       split_part(p_brand, '#', 2)                   AS brand_num,
      |       translate(p_type, 'AEIOU', 'aeiou')           AS type_tr,
      |       lpad(cast(p_size AS STRING), 4, '0')          AS size_pad,
      |       regexp_extract(p_brand, '([0-9]+)', 1)        AS brand_digits,
      |       upper(substr(p_name, 1, 3))                   AS name_pfx,
      |       reverse(p_name)                               AS name_rev,
      |       cast(length(p_name) AS INT)                   AS name_len
      |FROM part""".stripMargin)

  // Q6b — global ORDER BY with no limit: exercises RangePartitioning
  // (sampled range boundaries → shuffle → per-partition sort) rather
  // than TakeOrderedAndProject. The hash compare is order-insensitive;
  // what's under test is that the full-sort plan computes the same
  // rows. Scale: the one operator that must see every row through a
  // range shuffle — kept off narrow outputs (3 columns).
  private val qSortGlobal = shared("q_sort_global",
    """SELECT o_orderkey, o_totalprice, o_orderpriority
      |FROM orders
      |WHERE o_orderstatus = 'F'
      |ORDER BY o_totalprice DESC, o_orderkey""".stripMargin)

  // Q4c — explicit cross join (CartesianProduct over two broadcastable
  // dims; 125 rows). The one join shape with no key to shuffle on.
  private val qCross = shared("q_cross_join",
    """SELECT n.n_name, r.r_name
      |FROM nation n CROSS JOIN region r
      |WHERE n.n_regionkey <> r.r_regionkey""".stripMargin)

  // Q4i — uncorrelated IN subquery → left-semi join rewrite.
  private val q4in = shared("q_subq_in",
    """SELECT o_orderkey, o_custkey, o_totalprice
      |FROM orders
      |WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_acctbal > 8000)""".stripMargin)

  // Q14 — data-quality gate: null keys, range violations, duplicate
  // (orderkey, linenumber) pairs, referential orphans. Row predicates
  // fold into one scan; uniqueness and the orphan anti-join each take
  // their own (necessary) shuffle.
  private val qValidate = QueryDef("q_validate", Some(
    """SELECT 'null_l_orderkey' AS check_name,
      |       cast(count(CASE WHEN l_orderkey IS NULL THEN 1 END) AS BIGINT) AS n_violations
      |FROM lineitem
      |UNION ALL
      |SELECT 'range_l_quantity',
      |       cast(count(CASE WHEN l_quantity IS NOT NULL
      |                        AND (l_quantity < 0 OR l_quantity > 100) THEN 1 END) AS BIGINT)
      |FROM lineitem
      |UNION ALL
      |SELECT 'range_l_quantity_30',
      |       cast(count(CASE WHEN l_quantity IS NOT NULL
      |                        AND (l_quantity < 0 OR l_quantity > 30) THEN 1 END) AS BIGINT)
      |FROM lineitem
      |UNION ALL
      |SELECT 'dup_line_id',
      |       cast(coalesce(sum(c - 1), 0) AS BIGINT)
      |FROM (SELECT count(*) AS c FROM lineitem GROUP BY l_orderkey, l_linenumber)
      |UNION ALL
      |SELECT 'orphan_lineitem', cast(count(*) AS BIGINT)
      |FROM lineitem l
      |WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey)""".stripMargin)) {
    (spark, dir) =>
      import graft.ops.Validate
      val t = Tables(spark, dir)
      val li = t.lineitem
      Validate.report(
        Validate.rowViolations(li, Seq(
          Validate.notNull("l_orderkey"),
          Validate.inRange("l_quantity", 0, 100),
          // a deliberately tight bound that real rows violate, so the
          // oracle hash-compare exercises non-zero counting too
          Validate.inRange("l_quantity", 0, 30).copy(name = "range_l_quantity_30"))),
        Validate.duplicateKeys(li, "dup_line_id", Seq("l_orderkey", "l_linenumber")),
        Validate.orphans(li, "orphan_lineitem", "l_orderkey", t.orders, "o_orderkey"))
  }

  // Q4sk — the salted join under the oracle gate: lineitem⋈orders via
  // Skew.saltedJoin (big side salted randomly, small side exploded
  // across all salts) must produce EXACTLY the rows of the plain join —
  // salting redistributes hot keys, never changes semantics. At scale
  // this is the manual fallback when AQE's skew splitting can't help
  // (e.g. skewed broadcast-ineligible dimensions).
  private val qSkewJoin = QueryDef("q_salted_join", Some(
    """SELECT l_orderkey, l_quantity, o_totalprice
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey""".stripMargin)) { (spark, dir) =>
    val t = Tables(spark, dir)
    graft.ops.Skew.saltedJoin(
        graft.ops.Par.scan(t.lineitem.select("l_orderkey", "l_quantity")),
        t.orders.select(col("o_orderkey").as("l_orderkey"), col("o_totalprice")),
        "l_orderkey", salt = 8)
      .select("l_orderkey", "l_quantity", "o_totalprice")
  }

  // Q3sk — two-phase salted aggregation vs the plain GROUP BY oracle:
  // partial sums per (key, salt), combined per key. Equal results by
  // the algebraic-aggregate law; the point at scale is that no single
  // reducer sees a hot key's full row set.
  private val qSkewAgg = QueryDef("q_salted_agg", Some(
    """SELECT l_returnflag, sum(l_quantity) AS sum_qty, count(*) AS n
      |FROM lineitem GROUP BY l_returnflag""".stripMargin)) { (spark, dir) =>
    graft.ops.Skew.saltedAgg(
      Tables(spark, dir).lineitem.select("l_returnflag", "l_quantity"),
      "l_returnflag", salt = 8)(
      partial = _.agg(sum("l_quantity").as("ps"), count(lit(1)).as("pn")),
      combine = _.agg(sum("ps").as("sum_qty"), sum("pn").as("n")))
  }

  // CDC MERGE apply: a synthetic change batch (two versioned update
  // waves, deletes, and new-key inserts, all derived deterministically
  // from orders itself) merged into the orders snapshot. Latest seq
  // wins per key, deletes vanish, inserts append; the snapshot side is
  // touched once by a broadcast key anti-join.
  private val qMerge = QueryDef("q_merge_upsert", Some(
    """WITH o AS (SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice FROM orders),
      |ch AS (
      |  SELECT o_orderkey, o_custkey, o_orderstatus,
      |         o_totalprice + 1000 AS o_totalprice,
      |         1 AS seq, (o_orderkey % 21 = 0) AS del
      |  FROM o WHERE o_orderkey % 7 = 0
      |  UNION ALL
      |  SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice + 2000, 2, false
      |  FROM o WHERE o_orderkey % 14 = 0
      |  UNION ALL
      |  SELECT o_orderkey + 100000000, o_custkey, o_orderstatus, o_totalprice, 1, false
      |  FROM o WHERE o_orderkey % 97 = 0),
      |latest AS (SELECT * FROM (
      |    SELECT ch.*, row_number() OVER (PARTITION BY o_orderkey ORDER BY seq DESC) AS rk
      |    FROM ch) WHERE rk = 1)
      |SELECT o.o_orderkey, o.o_custkey, o.o_orderstatus, o.o_totalprice FROM o
      |WHERE o.o_orderkey NOT IN (SELECT o_orderkey FROM latest)
      |UNION ALL
      |SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice
      |FROM latest WHERE NOT del""".stripMargin)) { (spark, dir) =>
    val o = Tables(spark, dir).orders
      .select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")
    val v1 = o.filter(col("o_orderkey") % 7 === 0)
      .withColumn("o_totalprice", col("o_totalprice") + 1000)
      .withColumn("seq", lit(1L))
      .withColumn("del", col("o_orderkey") % 21 === 0)
    val v2 = o.filter(col("o_orderkey") % 14 === 0)
      .withColumn("o_totalprice", col("o_totalprice") + 2000)
      .withColumn("seq", lit(2L)).withColumn("del", lit(false))
    val ins = o.filter(col("o_orderkey") % 97 === 0)
      .withColumn("o_orderkey", col("o_orderkey") + 100000000L)
      .withColumn("seq", lit(1L)).withColumn("del", lit(false))
    graft.ops.Cdc.mergeUpsert(o, v1.unionByName(v2).unionByName(ins),
      Seq("o_orderkey"), "seq", "del")
  }

  // Snapshot diff between two corpus versions (both derived
  // deterministically from orders: "old" drops every 13th key, "new"
  // drops every 11th and reprices every 5th): one full-outer equi-join,
  // null-safe compare, one verdict row per key — the rebuild audit and
  // the driver of incremental downstream refresh.
  private val qDiff = QueryDef("q_snapshot_diff", Some(
    """WITH o AS (SELECT o_orderkey, o_totalprice, o_orderstatus FROM orders
      |           WHERE o_orderkey % 13 <> 0),
      |n AS (SELECT o_orderkey,
      |             CASE WHEN o_orderkey % 5 = 0 THEN o_totalprice + 10
      |                  ELSE o_totalprice END AS o_totalprice,
      |             o_orderstatus
      |      FROM orders WHERE o_orderkey % 11 <> 0)
      |SELECT coalesce(o.o_orderkey, n.o_orderkey) AS o_orderkey,
      |       CASE WHEN o.o_orderkey IS NULL THEN 'added'
      |            WHEN n.o_orderkey IS NULL THEN 'removed'
      |            WHEN o.o_totalprice IS DISTINCT FROM n.o_totalprice
      |              OR o.o_orderstatus IS DISTINCT FROM n.o_orderstatus THEN 'changed'
      |            ELSE 'unchanged' END AS change_type
      |FROM o FULL OUTER JOIN n ON o.o_orderkey = n.o_orderkey""".stripMargin)) {
    (spark, dir) =>
      val orders = Tables(spark, dir).orders
        .select("o_orderkey", "o_totalprice", "o_orderstatus")
      val old = orders.filter(col("o_orderkey") % 13 =!= 0)
      val neu = orders.filter(col("o_orderkey") % 11 =!= 0)
        .withColumn("o_totalprice",
          when(col("o_orderkey") % 5 === 0, col("o_totalprice") + 10)
            .otherwise(col("o_totalprice")))
      graft.ops.Cdc.snapshotDiff(old, neu, Seq("o_orderkey"),
        Seq("o_totalprice", "o_orderstatus"))
  }

  // Incremental aggregate refresh: a (cnt, sums) snapshot built from
  // 90% of lineitem is brought up to date by a delta batch (inserts =
  // the missing 10%, retracts = every 7th base row) WITHOUT rescanning
  // the base — the materialized-view maintenance move. The oracle is
  // the direct aggregate over the equivalent final row set. Both sides
  // sum integer cents (the tpch_q11 lesson): double sums are
  // accumulation-order-dependent, and base + delta − retract drifted
  // across the 6-sig-digit canonicalization boundary in round 3.
  private val qIncr = QueryDef("q_incr_agg", Some(
    """SELECT l_returnflag, l_linestatus, count(*)::BIGINT AS cnt,
      |       sum(cast(round(l_quantity * 100) AS BIGINT)) / 100.0 AS sum_l_quantity,
      |       sum(cast(round(l_extendedprice * 100) AS BIGINT)) / 100.0 AS sum_l_extendedprice
      |FROM lineitem
      |WHERE l_orderkey % 10 = 0 OR l_orderkey % 7 <> 0
      |GROUP BY 1, 2""".stripMargin)) { (spark, dir) =>
    val li = Tables(spark, dir).lineitem.select("l_orderkey", "l_returnflag",
      "l_linestatus", "l_quantity", "l_extendedprice")
    val keys = Seq("l_returnflag", "l_linestatus")
    val ms = Seq("l_quantity", "l_extendedprice")
    val base = li.filter(col("l_orderkey") % 10 =!= 0)
    val baseAgg = graft.ops.Cdc.aggSnapshot(base, keys, ms)
    val ins = li.filter(col("l_orderkey") % 10 === 0).withColumn("op", lit(1))
    val del = base.filter(col("l_orderkey") % 7 === 0).withColumn("op", lit(-1))
    val refreshed = graft.ops.Cdc.incrementalAggRefresh(
      baseAgg, ins.unionByName(del), keys, "op", ms)
    graft.ops.Cdc.aggView(refreshed, ms)
  }

  // Equi-width histogram — the OLAP distribution primitive. Bucket by
  // integer arithmetic (not width_bucket, which the two engines define
  // with different edge conventions); the top bucket is clamped so the
  // max value doesn't create a singleton bucket 20. Scale: one partial
  // agg per partition into 20 groups — scan-bound at any volume.
  private val qHist = QueryDef("q_histogram", Some(
    """SELECT least(cast(floor(o_totalprice / 25000) AS INT), 19) AS bucket,
      |       count(*)                                            AS n_orders,
      |       sum(o_totalprice)                                   AS sum_price
      |FROM orders
      |GROUP BY 1""".stripMargin)) { (spark, dir) =>
    Tables(spark, dir).orders
      .groupBy(least(floor(col("o_totalprice") / 25000).cast("int"), lit(19)).as("bucket"))
      .agg(count(lit(1)).as("n_orders"), sum("o_totalprice").as("sum_price"))
  }

  // Shared change-stream frame for the q_merge_* trio: seq = the
  // (linenumber, partkey, suppkey) composite (the driver's lineitem
  // carries duplicate (orderkey, linenumber) pairs, and latest-wins
  // needs a TOTAL per-key order). The composite is injective only
  // while partkey/suppkey < 1e7 and linenumber < 92233 (long
  // headroom); TPC-H crosses the partkey bound around SF >= 50, where
  // duplicate (key, seq) pairs would make the row_number tie-break
  // nondeterministic and flake the oracle hash — so the bounds are
  // REQUIRED loudly instead of assumed (one tiny agg, bench = false
  // rows only).
  private def mergeChangeFrame(spark: SparkSession, dir: String,
                               extraCols: Seq[String]): DataFrame = {
    val raw = spark.read.parquet(s"$dir/lineitem.parquet")
    val mx = raw.agg(
      max(col("l_partkey").cast("long")), max(col("l_suppkey").cast("long")),
      max(col("l_linenumber").cast("long"))).head
    require(mx.getLong(0) < 10000000L && mx.getLong(1) < 10000000L &&
        mx.getLong(2) < 92233L,
      s"mergeChangeFrame: composite seq loses injectivity at this scale " +
        s"(max partkey=${mx.getLong(0)}, suppkey=${mx.getLong(1)}, " +
        s"linenumber=${mx.getLong(2)}) — widen the seq derivation")
    raw.select(
      (Seq("l_orderkey", "l_partkey", "l_suppkey", "l_quantity") ++ extraCols)
        .map(col) ++ Seq(
        (col("l_linenumber") * 100000000000000L + col("l_partkey") * 10000000L
          + col("l_suppkey")).cast("long").as("seq"),
        (col("l_returnflag") === "R").as("del")): _*)
  }

  // Shared replay harness for the whole q_merge_*/q_graft_* family:
  // lineitem split into three deterministic batches (l_suppkey % 3 —
  // the file split IS the batch assignment, SQL-replayable), streamed
  // through mergeSink one file per trigger, and the populated target
  // handed to `body`. The result is materialized (localCheckpoint)
  // BEFORE the temp dirs are deleted. One copy of the harness means
  // one place to change its batch-ordering assumptions.
  private def withMergeReplay(spark: SparkSession, dir: String,
                              extraCols: Seq[String], changelog: Boolean,
                              transform: DataFrame => DataFrame = identity)(
      body: String => DataFrame): DataFrame = {
    val work = java.nio.file.Files.createTempDirectory("graft-mor-q").toString
    try {
      val changes = transform(mergeChangeFrame(spark, dir, extraCols))
      (0 until 3).foreach(i => changes.filter(col("l_suppkey") % 3 === i)
        .coalesce(1).write.mode("append").parquet(s"$work/base"))
      val sink = graft.streaming.Streams.mergeSink(
        spark.readStream.schema(changes.schema)
          .option("maxFilesPerTrigger", 1).parquet(s"$work/base"),
        s"$work/t", s"$work/ck", Seq("l_orderkey"), "seq", "del",
        changelog = changelog)
      try sink.processAllAvailable() finally sink.stop()
      body(s"$work/t").localCheckpoint(true)
    } finally {
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(work))
    }
  }

  // MERGE-ON-READ keyed table (Streams.mergeSink): lineitem rows
  // replayed as a three-batch CDC stream keyed by l_orderkey —
  // seq = the injectivity-guarded composite from mergeChangeFrame,
  // tombstone when
  // l_returnflag = 'R', batch =
  // l_suppkey % 3 (so the file split IS the batch assignment,
  // deterministically replayable in SQL). Each microbatch lands as one
  // O(|touched keys|) delta layer; the read resolves latest-wins by
  // (batch, seq) descending and drops tombstones — upsertSink's exact
  // application order without its per-trigger full-table rewrite. The
  // require() gates on compaction having folded the layers into a
  // live-rows generation, so the served answer provably comes off the
  // compacted path and still hash-matches the window replay.
  private val qMergeTable = QueryDef("q_merge_table", Some(
    """WITH c AS (SELECT l_orderkey, l_partkey, l_suppkey, l_quantity,
      |                  l_extendedprice,
      |                  l_linenumber * 100000000000000 + l_partkey * 10000000
      |                    + l_suppkey AS seq,
      |                  (l_returnflag = 'R') AS del,
      |                  l_suppkey % 3 AS b
      |           FROM lineitem),
      |r AS (SELECT *, row_number() OVER (PARTITION BY l_orderkey
      |                  ORDER BY b DESC, seq DESC) AS rk
      |      FROM c)
      |SELECT l_orderkey, l_partkey, l_suppkey, l_quantity, l_extendedprice
      |FROM r WHERE rk = 1 AND NOT del""".stripMargin),
    bench = false) { (spark, dir) =>
    withMergeReplay(spark, dir, Seq("l_extendedprice"), changelog = false) {
      tgt =>
        val r = graft.streaming.Streams.maintainArtifact(spark, tgt,
          targetFiles = 2, minBatches = 1)
        require(r.exists(x => x._1 == "rows" && x._2.contains(2L)),
          s"q_merge_table: compaction did not cover the three batches ($r)")
        graft.streaming.Streams.latestTable(spark, tgt).get
    }
  }

  // CHANGE FEED of the merge-on-read table (Streams.changelogOf): the
  // sink derives ±op retraction rows per batch — -1 with each touched
  // key's PRE-batch values, +1 with its new values — and the ops
  // TELESCOPE per key, so a grouped integer-algebra aggregate computed
  // ONLY from the feed must equal the same aggregate over the resolved
  // final table, which is what the oracle replays (window latest-wins,
  // then GROUP BY). Fixed-point sums keep the compare exact (float
  // addition over ±ops visits different addends than the final-state
  // sum). The require() gates on retractions actually flowing — a
  // feed without -1 rows would be an insert-only run in disguise.
  private val qMergeChangelog = QueryDef("q_merge_changelog", Some(
    """WITH c AS (SELECT l_orderkey, l_suppkey, l_quantity,
      |                  l_linenumber * 100000000000000 + l_partkey * 10000000
      |                    + l_suppkey AS seq,
      |                  (l_returnflag = 'R') AS del,
      |                  l_suppkey % 3 AS b
      |           FROM lineitem),
      |r AS (SELECT *, row_number() OVER (PARTITION BY l_orderkey
      |                  ORDER BY b DESC, seq DESC) AS rk
      |      FROM c),
      |f AS (SELECT * FROM r WHERE rk = 1 AND NOT del)
      |SELECT l_suppkey % 10 AS g,
      |       cast(count(*) AS BIGINT) AS n_rows,
      |       sum(cast(round(l_quantity * 100) AS BIGINT)) / 100.0 AS sum_qty
      |FROM f GROUP BY 1""".stripMargin),
    bench = false) { (spark, dir) =>
    withMergeReplay(spark, dir, Nil, changelog = true) { tgt =>
      val feed = graft.streaming.Streams.changelogOf(spark, tgt)
      require(!feed.filter(col("op") === -1).isEmpty,
        "q_merge_changelog: the feed must carry retractions")
      feed.groupBy((col("l_suppkey") % 10).as("g"))
        .agg(sum(col("op")).cast("long").as("n_rows"),
          (sum(col("op") * round(col("l_quantity") * 100).cast("long"))
            / 100.0).as("sum_qty"))
    }
  }

  // TIME TRAVEL on the merge-on-read table: the same three-batch CDC
  // replay as q_merge_table, served AS OF version 1 — what the table
  // held before the third batch landed, which the oracle replays by
  // simply bounding the batch column (b <= 1). The require() gates on
  // a version ABOVE the pinned one existing, so the row can never
  // silently degrade into "read the latest".
  private val qMergeAsOf = QueryDef("q_merge_asof", Some(
    """WITH c AS (SELECT l_orderkey, l_partkey, l_suppkey, l_quantity,
      |                  l_extendedprice,
      |                  l_linenumber * 100000000000000 + l_partkey * 10000000
      |                    + l_suppkey AS seq,
      |                  (l_returnflag = 'R') AS del,
      |                  l_suppkey % 3 AS b
      |           FROM lineitem
      |           WHERE l_suppkey % 3 <= 1),
      |r AS (SELECT *, row_number() OVER (PARTITION BY l_orderkey
      |                  ORDER BY b DESC, seq DESC) AS rk
      |      FROM c)
      |SELECT l_orderkey, l_partkey, l_suppkey, l_quantity, l_extendedprice
      |FROM r WHERE rk = 1 AND NOT del""".stripMargin),
    bench = false) { (spark, dir) =>
    withMergeReplay(spark, dir, Seq("l_extendedprice"), changelog = false) {
      tgt =>
        require(graft.streaming.Streams.snapshotVersionsOf(spark, tgt)
          .max > 1L, "q_merge_asof: no version committed above the pinned one")
        graft.streaming.Streams.latestTable(spark, tgt, asOf = Some(1L)).get
    }
  }

  // THE DSv2 FACE of the merge table (GraftDataSource): the same
  // three-batch CDC replay as q_merge_table, but the served state is
  // read through plain `spark.read.format("graft")` — no graft API on
  // the read path at all. The provider classifies the target by its
  // _merge marker and serves the identical latest-wins resolution, so
  // the oracle (window replay) must hash-match exactly as it does for
  // the API read. This is what lets external Spark sessions / SQL
  // open maintained tables: an engine feature, not a library
  // convention.
  private val qGraftFormat = QueryDef("q_graft_format", Some(
    """WITH c AS (SELECT l_orderkey, l_partkey, l_suppkey, l_quantity,
      |                  l_extendedprice,
      |                  l_linenumber * 100000000000000 + l_partkey * 10000000
      |                    + l_suppkey AS seq,
      |                  (l_returnflag = 'R') AS del,
      |                  l_suppkey % 3 AS b
      |           FROM lineitem),
      |r AS (SELECT *, row_number() OVER (PARTITION BY l_orderkey
      |                  ORDER BY b DESC, seq DESC) AS rk
      |      FROM c)
      |SELECT l_orderkey, l_partkey, l_suppkey, l_quantity, l_extendedprice
      |FROM r WHERE rk = 1 AND NOT del""".stripMargin),
    bench = false) { (spark, dir) =>
    withMergeReplay(spark, dir, Seq("l_extendedprice"), changelog = false) {
      tgt => spark.read.format("graft").load(tgt)
    }
  }

  // The change feed through the same DSv2 face (`changelog` option):
  // a pure-SQL consumer maintains downstream aggregates off the ±op
  // telescoping algebra without graft on its read path — the grouped
  // integer-algebra aggregate over the feed must equal the same
  // aggregate over the resolved final table, which the oracle replays.
  private val qGraftChangelog = QueryDef("q_graft_changelog", Some(
    """WITH c AS (SELECT l_orderkey, l_suppkey, l_quantity,
      |                  l_linenumber * 100000000000000 + l_partkey * 10000000
      |                    + l_suppkey AS seq,
      |                  (l_returnflag = 'R') AS del,
      |                  l_suppkey % 3 AS b
      |           FROM lineitem),
      |r AS (SELECT *, row_number() OVER (PARTITION BY l_orderkey
      |                  ORDER BY b DESC, seq DESC) AS rk
      |      FROM c),
      |f AS (SELECT * FROM r WHERE rk = 1 AND NOT del)
      |SELECT l_suppkey % 10 AS g,
      |       cast(count(*) AS BIGINT) AS n_rows,
      |       sum(cast(round(l_quantity * 100) AS BIGINT)) / 100.0 AS sum_qty
      |FROM f GROUP BY 1""".stripMargin),
    bench = false) { (spark, dir) =>
    withMergeReplay(spark, dir, Nil, changelog = true) { tgt =>
      val feed = spark.read.format("graft").option("changelog", true)
        .load(tgt)
      require(!feed.filter(col("op") === -1).isEmpty,
        "q_graft_changelog: the feed must carry retractions")
      feed.groupBy((col("l_suppkey") % 10).as("g"))
        .agg(sum(col("op")).cast("long").as("n_rows"),
          (sum(col("op") * round(col("l_quantity") * 100).cast("long"))
            / 100.0).as("sum_qty"))
    }
  }

  // THE STREAMING FACE of the change feed (readStream.format("graft")):
  // an EXTERNAL streaming aggregation subscribes to the feed —
  // version-offset microbatches, each committed version served exactly
  // once — and its final state must equal the same grouped
  // integer-algebra aggregate over the resolved table, which the oracle
  // replays (the ±ops telescope per key). This is the cross-session
  // medallion hop as a driver-checked row: no polling, no graft API on
  // the consumer beyond the format name.
  private val qGraftStream = QueryDef("q_graft_stream", Some(
    """WITH c AS (SELECT l_orderkey, l_suppkey, l_quantity,
      |                  l_linenumber * 100000000000000 + l_partkey * 10000000
      |                    + l_suppkey AS seq,
      |                  (l_returnflag = 'R') AS del,
      |                  l_suppkey % 3 AS b
      |           FROM lineitem),
      |r AS (SELECT *, row_number() OVER (PARTITION BY l_orderkey
      |                  ORDER BY b DESC, seq DESC) AS rk
      |      FROM c),
      |f AS (SELECT * FROM r WHERE rk = 1 AND NOT del)
      |SELECT l_suppkey % 10 AS g,
      |       cast(count(*) AS BIGINT) AS n_rows,
      |       sum(cast(round(l_quantity * 100) AS BIGINT)) / 100.0 AS sum_qty
      |FROM f GROUP BY 1""".stripMargin),
    bench = false) { (spark, dir) =>
    withMergeReplay(spark, dir, Nil, changelog = true) { tgt =>
      val qn = s"graft_stream_q_${System.nanoTime}"
      val ck = java.nio.file.Files.createTempDirectory("graft-stream-qck")
      val q = spark.readStream.format("graft").option("changelog", true)
        .load(tgt)
        .groupBy((col("l_suppkey") % 10).as("g"))
        .agg(sum(col("op")).cast("long").as("n_rows"),
          (sum(col("op") * round(col("l_quantity") * 100).cast("long"))
            / 100.0).as("sum_qty"))
        .writeStream.format("memory").queryName(qn)
        .option("checkpointLocation", ck.toString)
        .outputMode(org.apache.spark.sql.streaming.OutputMode.Complete())
        .start()
      try q.processAllAvailable() finally q.stop()
      spark.table(qn)
    }
  }

  // DECIMAL through the STREAMING face: the same external feed
  // subscription as q_graft_stream, but the table carries a
  // decimal(12,2) measure — THE warehouse money type. The executor-side
  // changelog stream reader decodes parquet's physical decimal
  // encodings (INT64 unscaled cents here) into Catalyst Decimal, so an
  // external consumer of a money-carrying merge table is a
  // driver-checked row, not a refusal. The decimal is derived from
  // exact integer cents on both sides (round(x*100)), so the oracle's
  // replay hash-matches bit-for-bit; the require() gates on the feed
  // schema actually carrying DecimalType, so the row can never
  // silently degrade into a double-typed pass.
  private val qGraftStreamDec = QueryDef("q_graft_stream_dec", Some(
    """WITH c AS (SELECT l_orderkey, l_suppkey,
      |                  CAST(round(l_extendedprice * 100) AS BIGINT) AS cents,
      |                  l_linenumber * 100000000000000 + l_partkey * 10000000
      |                    + l_suppkey AS seq,
      |                  (l_returnflag = 'R') AS del,
      |                  l_suppkey % 3 AS b
      |           FROM lineitem),
      |r AS (SELECT *, row_number() OVER (PARTITION BY l_orderkey
      |                  ORDER BY b DESC, seq DESC) AS rk
      |      FROM c),
      |f AS (SELECT * FROM r WHERE rk = 1 AND NOT del)
      |SELECT l_suppkey % 10 AS g,
      |       cast(count(*) AS BIGINT) AS n_rows,
      |       sum(cents) / 100.0 AS sum_price
      |FROM f GROUP BY 1""".stripMargin),
    bench = false) { (spark, dir) =>
    val asDecimal: DataFrame => DataFrame = df => df
      .withColumn("price_d",
        (round(col("l_extendedprice") * 100).cast("long")
          .cast("decimal(14,2)") / 100).cast("decimal(12,2)"))
      .drop("l_extendedprice")
    withMergeReplay(spark, dir, Seq("l_extendedprice"), changelog = true,
      transform = asDecimal) { tgt =>
      val feed = spark.readStream.format("graft").option("changelog", true)
        .load(tgt)
      require(feed.schema("price_d").dataType ==
          org.apache.spark.sql.types.DecimalType(12, 2),
        "q_graft_stream_dec: the stream must serve the decimal column " +
          s"as decimal(12,2), got ${feed.schema("price_d").dataType}")
      val qn = s"graft_stream_dec_q_${System.nanoTime}"
      val ck = java.nio.file.Files.createTempDirectory("graft-streamd-qck")
      val q = feed
        .groupBy((col("l_suppkey") % 10).as("g"))
        .agg(sum(col("op")).cast("long").as("n_rows"),
          (sum(col("op") * (col("price_d") * 100).cast("long"))
            / 100.0).as("sum_price"))
        .writeStream.format("memory").queryName(qn)
        .option("checkpointLocation", ck.toString)
        .outputMode(org.apache.spark.sql.streaming.OutputMode.Complete())
        .start()
      try q.processAllAvailable() finally q.stop()
      spark.table(qn)
    }
  }

  // ARRAYS through the STREAMING face: the table carries an
  // array<bigint> token-id column (the tokenized-document shape every
  // training pipeline ships), and the external stream consumer folds
  // it with integer algebra — the executor-side reader must decode
  // parquet's LIST encoding, not refuse. The oracle replays the same
  // arithmetic from the scalar columns the array was derived from, so
  // the hash check is exact; the require() gates on the feed schema
  // actually serving ArrayType.
  private val qGraftStreamArr = QueryDef("q_graft_stream_arr", Some(
    """WITH c AS (SELECT l_orderkey, l_suppkey,
      |                  l_linenumber * 100000000000000 + l_partkey * 10000000
      |                    + l_suppkey AS seq,
      |                  (l_returnflag = 'R') AS del,
      |                  l_suppkey % 3 AS b
      |           FROM lineitem),
      |r AS (SELECT *, row_number() OVER (PARTITION BY l_orderkey
      |                  ORDER BY b DESC, seq DESC) AS rk
      |      FROM c),
      |f AS (SELECT * FROM r WHERE rk = 1 AND NOT del)
      |SELECT l_suppkey % 10 AS g,
      |       cast(count(*) AS BIGINT) AS n_rows,
      |       cast(sum((l_orderkey % 7) + (l_suppkey % 5)) AS BIGINT)
      |         AS sum_tok
      |FROM f GROUP BY 1""".stripMargin),
    bench = false) { (spark, dir) =>
    val withTokens: DataFrame => DataFrame = df => df
      .withColumn("tokens", array(
        (col("l_orderkey") % 7).cast("long"),
        (col("l_suppkey") % 5).cast("long")))
      .drop("l_quantity")
    withMergeReplay(spark, dir, Nil, changelog = true,
      transform = withTokens) { tgt =>
      val feed = spark.readStream.format("graft").option("changelog", true)
        .load(tgt)
      require(feed.schema("tokens").dataType ==
          org.apache.spark.sql.types.ArrayType(
            org.apache.spark.sql.types.LongType),
        "q_graft_stream_arr: the stream must serve the token column as " +
          s"array<bigint>, got ${feed.schema("tokens").dataType}")
      val qn = s"graft_stream_arr_q_${System.nanoTime}"
      val ck = java.nio.file.Files.createTempDirectory("graft-streama-qck")
      val q = feed
        .groupBy((col("l_suppkey") % 10).as("g"))
        .agg(sum(col("op")).cast("long").as("n_rows"),
          sum(col("op") *
            expr("aggregate(tokens, 0L, (a, x) -> a + x)"))
            .cast("long").as("sum_tok"))
        .writeStream.format("memory").queryName(qn)
        .option("checkpointLocation", ck.toString)
        .outputMode(org.apache.spark.sql.streaming.OutputMode.Complete())
        .start()
      try q.processAllAvailable() finally q.stop()
      spark.table(qn)
    }
  }

  // FEED RETENTION (Streams.truncateChangelog): the same three-batch
  // replay, then the feed's history at and below version 1 is DROPPED.
  // The row verifies the whole retention contract end-to-end: the
  // truncation reports exactly the dropped versions, a full-feed read
  // below the recorded floor REFUSES (never a silently-gapped feed),
  // and the documented consumer recipe — bootstrap from the retained
  // table state AS OF the floor, plus the feed above it — reconstructs
  // the exact full-history answer, which the oracle replays as the
  // plain window replay over all three batches. Storage for a
  // year-old feed is bounded by one call, losing no reconstructible
  // state.
  private val qGraftFeedTrunc = QueryDef("q_graft_feed_trunc", Some(
    """WITH c AS (SELECT l_orderkey, l_suppkey, l_quantity,
      |                  l_linenumber * 100000000000000 + l_partkey * 10000000
      |                    + l_suppkey AS seq,
      |                  (l_returnflag = 'R') AS del,
      |                  l_suppkey % 3 AS b
      |           FROM lineitem),
      |r AS (SELECT *, row_number() OVER (PARTITION BY l_orderkey
      |                  ORDER BY b DESC, seq DESC) AS rk
      |      FROM c),
      |f AS (SELECT * FROM r WHERE rk = 1 AND NOT del)
      |SELECT l_suppkey % 10 AS g,
      |       cast(count(*) AS BIGINT) AS n_rows,
      |       sum(cast(round(l_quantity * 100) AS BIGINT)) / 100.0 AS sum_qty
      |FROM f GROUP BY 1""".stripMargin),
    bench = false) { (spark, dir) =>
    withMergeReplay(spark, dir, Nil, changelog = true) { tgt =>
      val dropped = graft.streaming.Streams.truncateChangelog(
        spark, tgt, keepAfter = 1L)
      require(dropped == Seq(0L, 1L),
        s"q_graft_feed_trunc: expected versions 0,1 dropped, got $dropped")
      val refused =
        try { graft.streaming.Streams.changelogOf(spark, tgt); false }
        catch { case e: IllegalArgumentException =>
          e.getMessage.contains("truncateChangelog") }
      require(refused,
        "q_graft_feed_trunc: a feed read cutting below the floor must " +
          "refuse, not serve gapped history")
      val base = graft.streaming.Streams.latestTable(
          spark, tgt, asOf = Some(1L)).get
        .select(col("l_suppkey"), col("l_quantity"), lit(1L).as("op"))
      val delta = graft.streaming.Streams.changelogOf(
          spark, tgt, sinceVersion = 1L)
        .select(col("l_suppkey"), col("l_quantity"),
          col("op").cast("long").as("op"))
      base.unionByName(delta)
        .groupBy((col("l_suppkey") % 10).as("g"))
        .agg(sum(col("op")).cast("long").as("n_rows"),
          (sum(col("op") * round(col("l_quantity") * 100).cast("long"))
            / 100.0).as("sum_qty"))
    }
  }

  // MAPS + ARRAYS-OF-STRUCTS through the STREAMING face: the table
  // carries a map<string,bigint> feature bag and an
  // array<struct<t,w>> weighted-token column — the two nested shapes
  // the flat/array rows above don't cover — and the external consumer
  // folds BOTH with integer algebra (element_at over the map, a
  // struct-field product inside aggregate over the array). The oracle
  // replays the same arithmetic from the scalar columns the nested
  // values were derived from, so the hash check is exact; the
  // require()s gate on the feed actually serving MapType and
  // array-of-struct, so the row can never degrade into a flat pass.
  private val qGraftStreamMap = QueryDef("q_graft_stream_map", Some(
    """WITH c AS (SELECT l_orderkey, l_partkey, l_suppkey,
      |                  l_linenumber * 100000000000000 + l_partkey * 10000000
      |                    + l_suppkey AS seq,
      |                  (l_returnflag = 'R') AS del,
      |                  l_suppkey % 3 AS b
      |           FROM lineitem),
      |r AS (SELECT *, row_number() OVER (PARTITION BY l_orderkey
      |                  ORDER BY b DESC, seq DESC) AS rk
      |      FROM c),
      |f AS (SELECT * FROM r WHERE rk = 1 AND NOT del)
      |SELECT l_suppkey % 10 AS g,
      |       cast(count(*) AS BIGINT) AS n_rows,
      |       cast(sum((l_orderkey % 7) + (l_suppkey % 5)) AS BIGINT)
      |         AS sum_map,
      |       cast(sum((l_partkey % 11) * (l_orderkey % 3 + 1)) AS BIGINT)
      |         AS sum_st
      |FROM f GROUP BY 1""".stripMargin),
    bench = false) { (spark, dir) =>
    val withNested: DataFrame => DataFrame = df => df
      .withColumn("feat", map(
        lit("a"), (col("l_orderkey") % 7).cast("long"),
        lit("b"), (col("l_suppkey") % 5).cast("long")))
      .withColumn("toks", array(struct(
        (col("l_partkey") % 11).cast("long").as("t"),
        (col("l_orderkey") % 3 + 1).cast("long").as("w"))))
      .drop("l_quantity")
    withMergeReplay(spark, dir, Nil, changelog = true,
      transform = withNested) { tgt =>
      val feed = spark.readStream.format("graft").option("changelog", true)
        .load(tgt)
      require(feed.schema("feat").dataType ==
          org.apache.spark.sql.types.MapType(
            org.apache.spark.sql.types.StringType,
            org.apache.spark.sql.types.LongType),
        "q_graft_stream_map: the stream must serve the feature column " +
          s"as map<string,bigint>, got ${feed.schema("feat").dataType}")
      require(feed.schema("toks").dataType match {
          case org.apache.spark.sql.types.ArrayType(
            _: org.apache.spark.sql.types.StructType, _) => true
          case _ => false
        },
        "q_graft_stream_map: the stream must serve the token column as " +
          s"array<struct>, got ${feed.schema("toks").dataType}")
      val qn = s"graft_stream_map_q_${System.nanoTime}"
      val ck = java.nio.file.Files.createTempDirectory("graft-streamm-qck")
      val q = feed
        .groupBy((col("l_suppkey") % 10).as("g"))
        .agg(sum(col("op")).cast("long").as("n_rows"),
          sum(col("op") * (expr("element_at(feat, 'a')")
            + expr("element_at(feat, 'b')")))
            .cast("long").as("sum_map"),
          sum(col("op") *
            expr("aggregate(toks, 0L, (a, x) -> a + x.t * x.w)"))
            .cast("long").as("sum_st"))
        .writeStream.format("memory").queryName(qn)
        .option("checkpointLocation", ck.toString)
        .outputMode(org.apache.spark.sql.streaming.OutputMode.Complete())
        .start()
      try q.processAllAvailable() finally q.stop()
      spark.table(qn)
    }
  }

  // THE WRITE FACE of the merge table (Streams.mergeTableInsert /
  // format("graft") writes): the same three-batch lineitem replay as
  // q_merge_table, but applied as EXTERNAL batch writes — no streaming
  // sink anywhere. Each source batch is reduced to its per-key winner
  // (the write face's one-version-per-write contract), split into
  // upsert and tombstone writes, and committed; the resolved table must
  // hash-match the same window replay the sink path matches, proving
  // the two write paths share one latest-wins contract. Read back
  // through format("graft") so both faces are on the oracle path.
  private val qGraftWrite = QueryDef("q_graft_write", Some(
    """WITH c AS (SELECT l_orderkey, l_partkey, l_suppkey, l_quantity,
      |                  l_extendedprice,
      |                  l_linenumber * 100000000000000 + l_partkey * 10000000
      |                    + l_suppkey AS seq,
      |                  (l_returnflag = 'R') AS del,
      |                  l_suppkey % 3 AS b
      |           FROM lineitem),
      |r AS (SELECT *, row_number() OVER (PARTITION BY l_orderkey
      |                  ORDER BY b DESC, seq DESC) AS rk
      |      FROM c)
      |SELECT l_orderkey, l_partkey, l_suppkey, l_quantity, l_extendedprice
      |FROM r WHERE rk = 1 AND NOT del""".stripMargin),
    bench = false) { (spark, dir) =>
    val work = java.nio.file.Files.createTempDirectory("graft-write-q").toString
    try {
      val changes = mergeChangeFrame(spark, dir, Seq("l_extendedprice"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("l_orderkey").orderBy(col("seq").desc)
      (0 until 3).foreach { i =>
        // one external write carries one version: reduce the source
        // batch to its per-key seq-winner, then apply upserts and
        // tombstones as separate writes (latest batch wins, so the
        // tombstone write landing after the upserts of the SAME source
        // batch preserves the winner's verdict exactly)
        val winners = changes.filter(col("l_suppkey") % 3 === i)
          .withColumn("__rk", row_number().over(w))
          .filter(col("__rk") === 1).drop("__rk")
          .localCheckpoint(true)
        val dataCols = winners.columns.filterNot(c => c == "seq" || c == "del")
          .toIndexedSeq
        val ups = winners.filter(!col("del")).select(dataCols.map(col): _*)
        val dels = winners.filter(col("del")).select(dataCols.map(col): _*)
        if (!ups.isEmpty)
          graft.streaming.Streams.mergeTableInsert(spark, s"$work/t", ups,
            createKeys = Seq("l_orderkey"))
        if (!dels.isEmpty)
          graft.streaming.Streams.mergeTableInsert(spark, s"$work/t", dels,
            delete = true, createKeys = Seq("l_orderkey"))
      }
      spark.read.format("graft").load(s"$work/t").localCheckpoint(true)
    } finally {
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(work))
    }
  }

  // SCD-2 dimension build (Cdc.scd2Build): every order is a "change"
  // to its customer's record; versions get [own date, next change)
  // validity with (o_orderdate, o_orderkey) as the deterministic
  // per-key total order. One window over one hash shuffle on the key.
  private val qScd2 = QueryDef("q_scd2", Some(
    """SELECT o_custkey, o_orderkey, o_orderdate, o_totalprice,
      |       lead(o_orderdate) OVER w AS valid_to,
      |       lead(o_orderdate) OVER w IS NULL AS is_current
      |FROM orders
      |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)""".stripMargin)) {
    (spark, dir) =>
      graft.ops.Cdc.scd2Build(
        Tables(spark, dir).orders
          .select("o_custkey", "o_orderkey", "o_orderdate", "o_totalprice"),
        Seq("o_custkey"), Seq("o_orderdate", "o_orderkey"))
  }

  // Z-order (Morton) clustering key (Layout.zvalue2): the multi-dim
  // layout primitive for scan pruning at 100 TB. The oracle replays
  // the bit interleave with unrolled shift/mask arithmetic — the same
  // pure-integer computation, so the hash check covers every row's
  // 16-bit z-value exactly.
  private val qZorder = {
    val zBits = 8
    val zSql = (0 until zBits).map(i =>
      s"(((a >> $i) & 1) << ${2 * i}) | (((b >> $i) & 1) << ${2 * i + 1})")
      .mkString(" | ")
    QueryDef("q_zorder", Some(
      s"""WITH t AS (SELECT o_orderkey,
         |                  o_orderkey % 256 AS a,
         |                  CAST(floor(o_totalprice / 2000) AS BIGINT) % 256 AS b
         |           FROM orders)
         |SELECT o_orderkey, a, b, CAST($zSql AS BIGINT) AS zval
         |FROM t""".stripMargin)) { (spark, dir) =>
      Tables(spark, dir).orders
        .select(col("o_orderkey"),
          (col("o_orderkey") % 256).as("a"),
          (floor(col("o_totalprice") / 2000).cast("long") % 256).as("b"))
        .select(col("o_orderkey"), col("a"), col("b"),
          graft.ops.Layout.zvalue2(col("a"), col("b"), zBits).as("zval"))
    }
  }

  // 3-dimensional Z-order (Layout.zvalueN) — the (lat, lon, time)-style
  // layout that needs more than two clustering dimensions: bit i of
  // column d lands at i·3 + d. The oracle replays the interleave with
  // the SAME generator-emitted unrolled shift/mask SQL (one algorithm
  // description, two backends — the q_hilbert precedent).
  private val qZorder3 = {
    val zBits = 6
    QueryDef("q_zorder3", Some(
      s"""WITH t AS (SELECT o_orderkey,
         |                  o_orderkey % 64 AS a,
         |                  CAST(floor(o_totalprice / 4000) AS BIGINT) % 64 AS b,
         |                  CAST(month(o_orderdate) AS BIGINT) % 64 AS c
         |           FROM orders)
         |SELECT o_orderkey, a, b, c,
         |       CAST(${graft.ops.Layout.zvalueNSql(Seq("a", "b", "c"), zBits)} AS BIGINT) AS zval
         |FROM t""".stripMargin)) { (spark, dir) =>
      Tables(spark, dir).orders
        .select(col("o_orderkey"),
          (col("o_orderkey") % 64).as("a"),
          (floor(col("o_totalprice") / 4000).cast("long") % 64).as("b"),
          (month(col("o_orderdate")).cast("long") % 64).as("c"))
        .select(col("o_orderkey"), col("a"), col("b"), col("c"),
          graft.ops.Layout.zvalueN(Seq(col("a"), col("b"), col("c")), zBits)
            .as("zval"))
    }
  }

  // Hilbert-curve clustering key (Layout.hilbert2): the tighter-locality
  // alternative to q_zorder. The oracle SQL is EMITTED BY THE SAME
  // generator as the Column expression (Layout.hilbert2Sql — one
  // algorithm description, two backends), so engine and checker cannot
  // drift; the hash check covers every row's full 16-bit walk including
  // all eight levels of quadrant rotation.
  private val qHilbert = QueryDef("q_hilbert", Some(
    graft.ops.Layout.hilbert2Sql(
      src = """(SELECT o_orderkey,
              |        o_orderkey % 256 AS a,
              |        CAST(floor(o_totalprice / 2000) AS BIGINT) % 256 AS b
              | FROM orders) t""".stripMargin,
      keyCols = Seq("o_orderkey", "a", "b"), bits = 8))) { (spark, dir) =>
    Tables(spark, dir).orders
      .select(col("o_orderkey"),
        (col("o_orderkey") % 256).as("a"),
        (floor(col("o_totalprice") / 2000).cast("long") % 256).as("b"))
      .select(col("o_orderkey"), col("a"), col("b"),
        graft.ops.Layout.hilbert2(col("a"), col("b"), 8).as("hkey"))
  }

  // Append-only incremental refresh with min/max — the insert-only
  // regime's MV maintenance (q_incr_agg's sibling): base snapshot +
  // plain new-row delta must equal the rebuilt aggregate EXACTLY,
  // min/max included (least/greatest are order-insensitive; sums are
  // fixed-point LONGs). The oracle aggregates the full row set
  // directly with the same cents arithmetic.
  private val qIncrAo = QueryDef("q_incr_minmax", Some(
    """SELECT l_returnflag, l_linestatus,
      |       count(*) AS cnt,
      |       sum(cast(round(l_quantity * 100) AS BIGINT)) / 100.0 AS sum_l_quantity,
      |       min(l_quantity) AS min_l_quantity,
      |       max(l_quantity) AS max_l_quantity
      |FROM lineitem
      |GROUP BY 1, 2""".stripMargin)) { (spark, dir) =>
    val li = Tables(spark, dir).lineitem
      .select("l_orderkey", "l_returnflag", "l_linestatus", "l_quantity")
    val keys = Seq("l_returnflag", "l_linestatus")
    val base = li.filter(col("l_orderkey") % 10 =!= 0)
    val delta = li.filter(col("l_orderkey") % 10 === 0)
    val refreshed = graft.ops.Cdc.incrementalAggRefreshAppendOnly(
      graft.ops.Cdc.aggSnapshotMinMax(base, keys, Seq("l_quantity")),
      delta, keys, Seq("l_quantity"))
    graft.ops.Cdc.aggView(refreshed, Seq("l_quantity"))
  }

  // Append-only incremental refresh of a KMV distinct-count sketch —
  // the round-6 MV pillar: a snapshot carrying kmv_<col> per key is
  // brought up to date by a plain new-row delta WITHOUT rescanning the
  // base, and because the KMV merge is an exact order statistic the
  // refreshed sketch equals the one built over the full row set —
  // which is precisely what the oracle recomputes from scratch (shared
  // kmvOracleSql arithmetic). This is the hash-checked gate behind
  // MvRewrite's kmv_distinct / approx_count_distinct navigation.
  private val qIncrKmv = {
    val k = 64
    QueryDef("q_incr_kmv", Some(
      kmvOracleSql("lineitem", Seq("l_returnflag", "l_linestatus"), "l_partkey", k))) {
      (spark, dir) =>
        val li = Tables(spark, dir).lineitem
          .select("l_orderkey", "l_returnflag", "l_linestatus", "l_quantity", "l_partkey")
        val keys = Seq("l_returnflag", "l_linestatus")
        val base = li.filter(col("l_orderkey") % 10 =!= 0)
        val delta = li.filter(col("l_orderkey") % 10 === 0)
        val refreshed = graft.ops.Cdc.incrementalAggRefreshAppendOnly(
          graft.ops.Cdc.aggSnapshotMinMax(base, keys, Seq("l_quantity"),
            distinctCols = Seq("l_partkey"), kmvK = k),
          delta, keys, Seq("l_quantity"), distinctCols = Seq("l_partkey"), kmvK = k)
        kmvPresentation(keys, "kmv_l_partkey", k)(refreshed)
    }
  }

  // KMV set-operation estimate — "distinct l_partkey in BOTH the A and
  // R segments" answered from the two stored sketches alone (the
  // Bar-Yossef/Beyer KMV estimator: ρ = |U ∩ A ∩ B|/|U| over the union
  // sketch's retained hashes, |A∩B| ≈ ρ·est(U)), never re-scanning
  // either segment. Deterministic like the rest of the KMV family —
  // integer set algebra + the shared estimator arithmetic, mirrored
  // literally in the oracle — so the whole overlap pipeline
  // hash-checks. Scale shape: sketches are k longs per segment; the
  // overlap math is O(k) regardless of segment sizes.
  private val qKmvOverlap = {
    val k = 64
    val m = 1L << 61
    QueryDef("q_kmv_overlap", Some(
      s"""WITH ${kmvHashCtes("lineitem", Seq("l_returnflag"), "l_partkey")},
         |ka AS (SELECT hp FROM rk WHERE rn <= $k AND l_returnflag = 'A'),
         |kr AS (SELECT hp FROM rk WHERE rn <= $k AND l_returnflag = 'R'),
         |u0 AS (SELECT DISTINCT hp FROM (SELECT hp FROM ka UNION ALL SELECT hp FROM kr) t),
         |uk AS (SELECT hp, row_number() OVER (ORDER BY hp) AS rn FROM u0),
         |ukk AS (SELECT hp FROM uk WHERE rn <= $k),
         |st AS (SELECT count(*) AS usize, max(hp) AS ukth,
         |        sum(CASE WHEN hp IN (SELECT hp FROM ka) AND hp IN (SELECT hp FROM kr)
         |            THEN 1 ELSE 0 END) AS inboth
         |       FROM ukk),
         |est AS (SELECT usize, inboth,
         |         CAST(CASE WHEN usize < $k THEN usize
         |              ELSE round(${k - 1}.0 * $m.0 / CAST(ukth AS DOUBLE)) END AS BIGINT) AS union_est
         |        FROM st)
         |SELECT 'A' AS flag_a, 'R' AS flag_b,
         |       CAST(usize AS INT) AS u_size, CAST(inboth AS INT) AS in_both,
         |       union_est,
         |       CAST(round(CAST(inboth AS DOUBLE) / CAST(usize AS DOUBLE)
         |            * CAST(union_est AS DOUBLE)) AS BIGINT) AS intersect_est
         |FROM est""".stripMargin)) { (spark, dir) =>
      val sk = graft.ops.Sketches.kmvPartials(
        Tables(spark, dir).lineitem.select("l_returnflag", "l_partkey"),
        Seq("l_returnflag"), "l_partkey", k)
      val pair = sk.agg(
        first(when(col("l_returnflag") === "A", col("kmv")), ignoreNulls = true).as("ka"),
        first(when(col("l_returnflag") === "R", col("kmv")), ignoreNulls = true).as("kr"))
      val u = slice(array_sort(array_distinct(concat(col("ka"), col("kr")))), 1, k)
      pair.select(
        lit("A").as("flag_a"), lit("R").as("flag_b"),
        size(u).cast("int").as("u_size"),
        size(array_intersect(array_intersect(u, col("ka")), col("kr")))
          .cast("int").as("in_both"),
        graft.ops.Sketches.kmvEstimate(u, k).as("union_est"),
        graft.ops.Sketches.kmvIntersectEstimate(col("ka"), col("kr"), k)
          .as("intersect_est"))
    }
  }

  // Composite-key distinct sketch refresh — "distinct (part, supplier)
  // PAIRS per group" maintained incrementally: the tuple canonicalizes
  // to one string (concat_ws over U+0001, mirrored as chr(1) in the
  // oracle) and then the whole single-column KMV law applies unchanged
  // — append-only refresh == rebuild exactly, and the estimator
  // arithmetic replays bit-for-bit in DuckDB. Round-7 item #4.
  private val qIncrKmv2 = {
    val k = 64
    QueryDef("q_incr_kmv2", Some(
      kmvOracleSql("lineitem", Seq("l_returnflag", "l_linestatus"),
        "concat_ws(chr(1), CAST(l_partkey AS VARCHAR), CAST(l_suppkey AS VARCHAR))",
        k))) { (spark, dir) =>
      val li = Tables(spark, dir).lineitem
        .select("l_orderkey", "l_returnflag", "l_linestatus", "l_quantity",
          "l_partkey", "l_suppkey")
      val keys = Seq("l_returnflag", "l_linestatus")
      val base = li.filter(col("l_orderkey") % 10 =!= 0)
      val delta = li.filter(col("l_orderkey") % 10 === 0)
      val tuples = Seq(Seq("l_partkey", "l_suppkey"))
      val refreshed = graft.ops.Cdc.incrementalAggRefreshAppendOnly(
        graft.ops.Cdc.aggSnapshotMinMax(base, keys, Seq("l_quantity"),
          distinctTuples = tuples, kmvK = k),
        delta, keys, Seq("l_quantity"), distinctTuples = tuples, kmvK = k)
      kmvPresentation(keys, "kmv_l_partkey__l_suppkey", k)(refreshed)
    }
  }

  // Time-bucketed MV navigation with a HAVING on top — the dashboard
  // rollup shape (GROUP BY date_trunc('month', …) HAVING count(*) > n)
  // answered from a month-keyed maintained snapshot via MvRewrite's
  // derived-key matching; the require() makes this row fail LOUDLY if
  // navigation ever stops engaging (the values alone could not tell —
  // exactness means navigated == direct). localCheckpoint freezes the
  // navigated result before the registration is removed, so the row
  // gates the rewrite path, not the direct one. Rounds-7 items #2/#7.
  private val qIncrBucket = QueryDef("q_incr_bucket", Some(
    """SELECT cast(cast(date_trunc('month', o_orderdate) AS TIMESTAMP) AS STRING) AS order_month,
      |       count(*) AS n,
      |       sum(cast(round(o_totalprice * 100) AS BIGINT)) / 100.0 AS sum_price,
      |       (CAST(sum(cast(round(o_totalprice * 100) AS BIGINT)) AS DOUBLE) / 100.0)
      |         / CAST(count(o_totalprice) AS DOUBLE) AS avg_price
      |FROM orders
      |WHERE date_trunc('month', o_orderdate)
      |        BETWEEN TIMESTAMP '1994-06-01' AND TIMESTAMP '1997-03-01'
      |GROUP BY 1
      |HAVING count(*) > 3""".stripMargin), bench = false) { (spark, dir) =>
    val basePath = s"$dir/orders.parquet"
    val bucket = date_trunc("month", col("o_orderdate"))
    val work = java.nio.file.Files.createTempDirectory("graft-mv-bucket-q").toString
    graft.ops.Cdc.aggSnapshot(
        spark.read.parquet(basePath).withColumn("mon", bucket),
        Seq("mon"), Seq("o_totalprice"))
      .write.mode("overwrite").parquet(s"$work/snap")
    graft.plans.MvRewrite.registerDerived(spark, basePath, Seq("mon"),
      Seq("o_totalprice"), Map.empty, s"$work/snap",
      derivedKeys = Map("mon" -> bucket))
    try {
      // the month-range WHERE references the BUCKET FORMULA, not a base
      // column — navigable because the predicate is constant within
      // each month-group (round-7 next-round #1); the gate replays it
      // on the snapshot's bucket key column
      val out = spark.read.parquet(basePath)
        .filter(date_trunc("month", col("o_orderdate"))
          .between("1994-06-01", "1997-03-01"))
        .groupBy(date_trunc("month", col("o_orderdate")).as("mon"))
        .agg(count(lit(1)).as("n"), sum("o_totalprice").as("sum_price"),
          avg("o_totalprice").as("avg_price"))
        .filter(col("n") > 3)
        .select(col("mon").cast("string").as("order_month"),
          col("n"), col("sum_price"), col("avg_price"))
      // A session that has .cache()d the base pins the plan to the
      // cache: Spark's cache substitution runs BEFORE extension rules,
      // so MvRewrite never sees the file relation — correct Spark
      // semantics, and the one legitimate way navigation may not
      // engage. The driver's Verify session is cache-free, so the
      // oracle row still gates the rewrite there.
      val plan = out.queryExecution.executedPlan.toString
      require((plan.contains(s"$work/snap") && !plan.contains("orders.parquet"))
          || plan.contains("InMemoryRelation"),
        s"q_incr_bucket: time-bucket navigation did not engage:\n$plan")
      out.localCheckpoint(true)
    } finally {
      graft.plans.MvRewrite.unregister(basePath)
      // localCheckpoint materialized the result — the work dir (snapshot
      // parquet) is dead weight; repeated verify runs must not accrete it
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(work))
    }
  }

  // Star-rollup MV navigation — fact ⋈ dim GROUP BY dim.attr (TPC-H
  // Q5's shape, the commonest BI rollup): the lineitem side navigates
  // to its (l_orderkey)-keyed maintained snapshot while the orders dim
  // and the join stay untouched. Exact because a fact group's rows all
  // share the join key — the group-row matches exactly the dim rows
  // each member matched, so count→sum(cnt), sum→the fixed-point total.
  // The require() makes the row fail LOUDLY if star navigation stops
  // engaging (exactness means values alone could not tell).
  private val qStarRollup = QueryDef("q_star_rollup", Some(
    """SELECT o_orderpriority,
      |       count(*) AS n,
      |       sum(cast(round(l_quantity * 100) AS BIGINT)) / 100.0 AS sum_qty,
      |       (CAST(sum(cast(round(l_quantity * 100) AS BIGINT)) AS DOUBLE) / 100.0)
      |         / CAST(count(l_quantity) AS DOUBLE) AS avg_qty,
      |       min(l_quantity) AS min_qty,
      |       max(l_quantity) AS max_qty
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |GROUP BY 1""".stripMargin), bench = false) { (spark, dir) =>
    val basePath = s"$dir/lineitem.parquet"
    val work = java.nio.file.Files.createTempDirectory("graft-mv-star-q").toString
    graft.ops.Cdc.aggSnapshotMinMax(
        spark.read.parquet(basePath), Seq("l_orderkey"), Seq("l_quantity"))
      .write.mode("overwrite").parquet(s"$work/snap")
    graft.plans.MvRewrite.register(spark, basePath, Seq("l_orderkey"),
      Seq("l_quantity"), s"$work/snap", minMaxMeasures = Seq("l_quantity"))
    try {
      val out = spark.read.parquet(basePath)
        .join(spark.read.parquet(s"$dir/orders.parquet"),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n"), sum("l_quantity").as("sum_qty"),
          avg("l_quantity").as("avg_qty"), min("l_quantity").as("min_qty"),
          max("l_quantity").as("max_qty"))
      val plan = out.queryExecution.executedPlan.toString
      require((plan.contains(s"$work/snap") && !plan.contains("lineitem.parquet"))
          || plan.contains("InMemoryRelation"),
        s"q_star_rollup: star navigation did not engage:\n$plan")
      out.localCheckpoint(true)
    } finally {
      graft.plans.MvRewrite.unregister(basePath)
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(work))
    }
  }

  // Rollup hierarchy + FILTER-clause navigation in one row: a DAY-keyed
  // maintained snapshot answers a MONTH dashboard (month boundaries are
  // day boundaries, so re-truncating the bucket column is exact) with
  // pivot-style conditional aggregates (`count(*)/sum(x) FILTER (WHERE
  // keyPred)` — a key predicate selects whole groups and replays inside
  // the rewritten aggregate). require()-gated like its siblings.
  private val qMvRollup = QueryDef("q_mv_rollup", Some(
    """SELECT cast(cast(date_trunc('month', o_orderdate) AS TIMESTAMP) AS STRING) AS order_month,
      |       count(*) AS n,
      |       count(*) FILTER (WHERE o_orderstatus = 'F') AS n_f,
      |       sum(cast(round(o_totalprice * 100) AS BIGINT)) / 100.0 AS sum_price,
      |       sum(cast(round(o_totalprice * 100) AS BIGINT))
      |         FILTER (WHERE o_orderstatus = 'F') / 100.0 AS sum_f
      |FROM orders
      |GROUP BY 1""".stripMargin), bench = false) { (spark, dir) =>
    val basePath = s"$dir/orders.parquet"
    val day = date_trunc("day", col("o_orderdate"))
    val work = java.nio.file.Files.createTempDirectory("graft-mv-rollup-q").toString
    graft.ops.Cdc.aggSnapshot(
        spark.read.parquet(basePath).withColumn("day", day),
        Seq("day", "o_orderstatus"), Seq("o_totalprice"))
      .write.mode("overwrite").parquet(s"$work/snap")
    graft.plans.MvRewrite.registerDerived(spark, basePath,
      Seq("day", "o_orderstatus"), Seq("o_totalprice"), Map.empty,
      s"$work/snap", derivedKeys = Map("day" -> day))
    try {
      val out = spark.read.parquet(basePath)
        .groupBy(date_trunc("month", col("o_orderdate")).as("mon"))
        .agg(count(lit(1)).as("n"),
          expr("count(*) FILTER (WHERE o_orderstatus = 'F')").as("n_f"),
          sum("o_totalprice").as("sum_price"),
          expr("sum(o_totalprice) FILTER (WHERE o_orderstatus = 'F')").as("sum_f"))
        .select(col("mon").cast("string").as("order_month"),
          col("n"), col("n_f"), col("sum_price"), col("sum_f"))
      val plan = out.queryExecution.executedPlan.toString
      require((plan.contains(s"$work/snap") && !plan.contains("orders.parquet"))
          || plan.contains("InMemoryRelation"),
        s"q_mv_rollup: hierarchy/FILTER navigation did not engage:\n$plan")
      out.localCheckpoint(true)
    } finally {
      graft.plans.MvRewrite.unregister(basePath)
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(work))
    }
  }

  // Rollup (grouping sets) navigation — the BI subtotal report answered
  // from the kilobyte snapshot: the Expand node rebuilds over the
  // snapshot (masked-key/grouping-id columns untouched, measures mapped
  // to the partial columns), so every subtotal level re-aggregates
  // group-rows instead of base rows. require()-gated like its siblings.
  private val qMvGroupingSets = QueryDef("q_mv_grouping_sets", Some(
    """SELECT o_orderstatus, o_orderpriority,
      |       count(*) AS n,
      |       sum(cast(round(o_totalprice * 100) AS BIGINT)) / 100.0 AS sum_price
      |FROM orders
      |GROUP BY ROLLUP(o_orderstatus, o_orderpriority)""".stripMargin),
    bench = false) { (spark, dir) =>
    val basePath = s"$dir/orders.parquet"
    val work = java.nio.file.Files.createTempDirectory("graft-mv-gs-q").toString
    graft.ops.Cdc.aggSnapshot(
        spark.read.parquet(basePath), Seq("o_orderstatus", "o_orderpriority"),
        Seq("o_totalprice"))
      .write.mode("overwrite").parquet(s"$work/snap")
    graft.plans.MvRewrite.register(spark, basePath,
      Seq("o_orderstatus", "o_orderpriority"), Seq("o_totalprice"),
      s"$work/snap")
    try {
      val out = spark.read.parquet(basePath)
        .rollup("o_orderstatus", "o_orderpriority")
        .agg(count(lit(1)).as("n"), sum("o_totalprice").as("sum_price"))
      val plan = out.queryExecution.executedPlan.toString
      require((plan.contains(s"$work/snap") && !plan.contains("orders.parquet"))
          || plan.contains("InMemoryRelation"),
        s"q_mv_grouping_sets: rollup navigation did not engage:\n$plan")
      out.localCheckpoint(true)
    } finally {
      graft.plans.MvRewrite.unregister(basePath)
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(work))
    }
  }

  // Multi-dim star (the TPC-H Q5 shape): lineitem ⋈ orders ⋈ customer
  // GROUP BY c_mktsegment — the fact branch navigates to its
  // (l_orderkey)-keyed snapshot inside the rebuilt join chain; the
  // orders→customer hop is a pure dim-dim condition the rewrite replays
  // untouched. Same loud require() gate as q_star_rollup.
  private val qStarRollup2 = QueryDef("q_star_rollup2", Some(
    """SELECT c_mktsegment,
      |       count(*) AS n,
      |       sum(cast(round(l_quantity * 100) AS BIGINT)) / 100.0 AS sum_qty
      |FROM lineitem
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |GROUP BY 1""".stripMargin), bench = false) { (spark, dir) =>
    val basePath = s"$dir/lineitem.parquet"
    val work = java.nio.file.Files.createTempDirectory("graft-mv-star2-q").toString
    graft.ops.Cdc.aggSnapshot(
        spark.read.parquet(basePath), Seq("l_orderkey"), Seq("l_quantity"))
      .write.mode("overwrite").parquet(s"$work/snap")
    graft.plans.MvRewrite.register(spark, basePath, Seq("l_orderkey"),
      Seq("l_quantity"), s"$work/snap")
    try {
      val out = spark.read.parquet(basePath)
        .join(spark.read.parquet(s"$dir/orders.parquet"),
          col("l_orderkey") === col("o_orderkey"))
        .join(spark.read.parquet(s"$dir/customer.parquet"),
          col("o_custkey") === col("c_custkey"))
        .groupBy("c_mktsegment")
        .agg(count(lit(1)).as("n"), sum("l_quantity").as("sum_qty"))
      val plan = out.queryExecution.executedPlan.toString
      require((plan.contains(s"$work/snap") && !plan.contains("lineitem.parquet"))
          || plan.contains("InMemoryRelation"),
        s"q_star_rollup2: multi-dim star navigation did not engage:\n$plan")
      out.localCheckpoint(true)
    } finally {
      graft.plans.MvRewrite.unregister(basePath)
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(work))
    }
  }

  // Star rollup aggregating DIM columns — the other half of the BI
  // shape: fact ⋈ dim GROUP BY dim.attr with sums/avgs OVER the dim's
  // own columns. The fact branch navigates to its snapshot and the dim
  // aggregates re-weight by the snapshot's cnt (sum(dim.x) →
  // sum(dim.x · cnt); exact for integral x — integer arithmetic is
  // order-free), min/max/count(DISTINCT) pass through multiplicity-
  // free, and a fact-measure aggregate takes a dim-predicate FILTER
  // clause (whole joined pairs pass or not). require()-gated.
  private val qStarDim = QueryDef("q_star_dim", Some(
    """SELECT o_orderpriority,
      |       CAST(sum(o_custkey) AS BIGINT) AS sum_ck,
      |       count(o_custkey) AS cnt_ck,
      |       CAST(sum(o_custkey) AS DOUBLE) / CAST(count(o_custkey) AS DOUBLE) AS avg_ck,
      |       min(o_orderdate) AS min_dt,
      |       max(o_orderdate) AS max_dt,
      |       count(DISTINCT o_custkey) AS nd_ck,
      |       sum(cast(round(l_quantity * 100) AS BIGINT))
      |         FILTER (WHERE o_orderstatus = 'F') / 100.0 AS sum_f
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |GROUP BY 1""".stripMargin), bench = false) { (spark, dir) =>
    val basePath = s"$dir/lineitem.parquet"
    val work = java.nio.file.Files.createTempDirectory("graft-mv-stardim-q").toString
    graft.ops.Cdc.aggSnapshot(
        spark.read.parquet(basePath), Seq("l_orderkey"), Seq("l_quantity"))
      .write.mode("overwrite").parquet(s"$work/snap")
    graft.plans.MvRewrite.register(spark, basePath, Seq("l_orderkey"),
      Seq("l_quantity"), s"$work/snap")
    try {
      val out = spark.read.parquet(basePath)
        .join(spark.read.parquet(s"$dir/orders.parquet"),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderpriority")
        .agg(sum("o_custkey").as("sum_ck"),
          count("o_custkey").as("cnt_ck"),
          avg("o_custkey").as("avg_ck"),
          min("o_orderdate").as("min_dt"),
          max("o_orderdate").as("max_dt"),
          countDistinct("o_custkey").as("nd_ck"),
          expr("sum(l_quantity) FILTER (WHERE o_orderstatus = 'F')").as("sum_f"))
      val plan = out.queryExecution.executedPlan.toString
      require((plan.contains(s"$work/snap") && !plan.contains("lineitem.parquet"))
          || plan.contains("InMemoryRelation"),
        s"q_star_dim: dim-aggregate star navigation did not engage:\n$plan")
      out.localCheckpoint(true)
    } finally {
      graft.plans.MvRewrite.unregister(basePath)
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(work))
    }
  }

  // Rollup OVER a star — the full BI cube shape: fact ⋈ dim with
  // subtotal levels over the dim attribute, answered from the fact's
  // maintained snapshot (the Expand rebuilds ABOVE snapshot ⋈ dim;
  // fact measures map to the partial columns, dim aggregates
  // count-weight by cnt, per (masked keys, gid) cell). SQL because
  // GROUP BY ROLLUP over a join is the shape BI tools emit (and the
  // Dataset API's rollup-over-join trips Spark's self-join check
  // before any optimizer extension runs). require()-gated.
  private val qStarCube = QueryDef("q_star_cube", Some(
    """SELECT o_orderpriority, count(*) AS n,
      |       sum(cast(round(l_quantity * 100) AS BIGINT)) / 100.0 AS sum_qty,
      |       CAST(sum(o_custkey) AS BIGINT) AS sum_ck
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |GROUP BY ROLLUP(o_orderpriority)""".stripMargin), bench = false) { (spark, dir) =>
    val basePath = s"$dir/lineitem.parquet"
    val work = java.nio.file.Files.createTempDirectory("graft-mv-starcube-q").toString
    graft.ops.Cdc.aggSnapshot(
        spark.read.parquet(basePath), Seq("l_orderkey"), Seq("l_quantity"))
      .write.mode("overwrite").parquet(s"$work/snap")
    graft.plans.MvRewrite.register(spark, basePath, Seq("l_orderkey"),
      Seq("l_quantity"), s"$work/snap")
    try {
      spark.read.parquet(basePath).createOrReplaceTempView("sc_li")
      spark.read.parquet(s"$dir/orders.parquet").createOrReplaceTempView("sc_ord")
      val out = spark.sql(
        """SELECT o_orderpriority, count(*) AS n, sum(l_quantity) AS sum_qty,
          |       sum(o_custkey) AS sum_ck
          |FROM sc_li JOIN sc_ord ON l_orderkey = o_orderkey
          |GROUP BY ROLLUP(o_orderpriority)""".stripMargin)
      val plan = out.queryExecution.executedPlan.toString
      require((plan.contains(s"$work/snap") && !plan.contains("lineitem.parquet"))
          || plan.contains("InMemoryRelation"),
        s"q_star_cube: rollup-over-star navigation did not engage:\n$plan")
      out.localCheckpoint(true)
    } finally {
      graft.plans.MvRewrite.unregister(basePath)
      spark.catalog.dropTempView("sc_li")
      spark.catalog.dropTempView("sc_ord")
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(work))
    }
  }

  // File-skipping point lookup — the needle query over a 100 TB table:
  // the fact is HASH-clustered on the key (each key's rows in one
  // file) so every file spans the full key range and min/max pruning
  // keeps everything; the per-file membership FINGERPRINT
  // (Layout.statsIndexFingerprint) is what lets the read open ~1 of
  // the files. No false negatives by construction (every ingested
  // value lit its hash positions), so the pruned answer hash-matches
  // the full-scan oracle; the require() proves pruning engaged.
  private val qSkipping = QueryDef("q_skipping", Some(
    """SELECT l_orderkey, count(*) AS n,
      |       sum(cast(round(l_quantity * 100) AS BIGINT)) / 100.0 AS sum_qty
      |FROM lineitem WHERE l_orderkey = 1 GROUP BY 1""".stripMargin),
    bench = false) { (spark, dir) =>
    val work = java.nio.file.Files.createTempDirectory("graft-skip-q").toString
    try {
      spark.read.parquet(s"$dir/lineitem.parquet")
        .repartition(8, col("l_orderkey"))
        .write.mode("overwrite").parquet(s"$work/t")
      graft.ops.Layout.statsIndexFingerprint(spark, s"$work/t",
          Seq("l_orderkey"), Seq("l_orderkey"))
        .write.mode("overwrite").parquet(s"$work/idx")
      val pruned = graft.ops.Layout.readPrunedEquals(spark,
        spark.read.parquet(s"$work/idx"), Map("l_orderkey" -> 1L))
      val opened = pruned.inputFiles.length
      require(opened <= 3,
        s"q_skipping: fingerprint pruned nothing ($opened of 8 files opened)")
      pruned.filter(col("l_orderkey") === 1L)
        .groupBy("l_orderkey")
        .agg(count(lit(1)).as("n"),
          (sum(round(col("l_quantity") * 100).cast("long")) / 100.0).as("sum_qty"))
        .localCheckpoint(true)
    } finally {
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(work))
    }
  }

  // AUTO-consulted file skipping (plans.SkipRewrite) — same physics as
  // q_skipping but with NO explicit API in the query: the directory is
  // registered once, and a plain `WHERE l_orderkey IN (1, 32)` is
  // rewritten by the optimizer rule to open only the files the
  // fingerprints can't rule out. Key 32's rows land in a file APPENDED
  // AFTER the index was built — the un-indexed tail is always read
  // unpruned, so the stale index still answers exactly (never a wrong
  // prune under lag). The require() proves the plan actually navigated.
  private val qSkipAuto = QueryDef("q_skip_auto", Some(
    """SELECT l_orderkey, count(*) AS n,
      |       sum(cast(round(l_quantity * 100) AS BIGINT)) / 100.0 AS sum_qty
      |FROM lineitem WHERE l_orderkey IN (1, 32) GROUP BY 1""".stripMargin),
    bench = false) { (spark, dir) =>
    val work = java.nio.file.Files.createTempDirectory("graft-skipauto-q").toString
    try {
      val li = spark.read.parquet(s"$dir/lineitem.parquet")
      li.filter(col("l_orderkey") =!= 32L)
        .repartition(8, col("l_orderkey"))
        .write.mode("overwrite").parquet(s"$work/t")
      graft.ops.Layout.statsIndexFingerprint(spark, s"$work/t",
          Seq("l_orderkey"), Seq("l_orderkey"))
        .write.mode("overwrite").parquet(s"$work/idx")
      // ingestion races ahead: key 32's rows land AFTER the index build
      li.filter(col("l_orderkey") === 32L)
        .coalesce(1).write.mode("append").parquet(s"$work/t")
      graft.plans.SkipRewrite.register(spark, s"$work/t", s"$work/idx")
      val out = spark.read.parquet(s"$work/t")
        .filter(col("l_orderkey").isin(1L, 32L))
        .groupBy("l_orderkey")
        .agg(count(lit(1)).as("n"),
          (sum(round(col("l_quantity") * 100).cast("long")) / 100.0).as("sum_qty"))
      // navigation gate: the OPTIMIZED plan opens a fraction of the 9
      // files (fingerprint survivors + the one un-indexed tail file)
      val opened = out.queryExecution.optimizedPlan.collect {
        case lr: org.apache.spark.sql.execution.datasources.LogicalRelation =>
          lr.relation match {
            case fs: org.apache.spark.sql.execution.datasources.HadoopFsRelation =>
              fs.location.inputFiles.length
            case _ => 0
          }
      }.sum
      require(opened <= 4,
        s"q_skip_auto: auto-prune did not engage ($opened of 9 files opened)")
      out.localCheckpoint(true)
    } finally {
      graft.plans.SkipRewrite.unregister(s"$work/t")
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(work))
    }
  }

  // AUTO-consulted RANGE skipping — the time-range dashboard shape: the
  // fact is range-clustered on the key, a plain stats index (no
  // fingerprints) is registered, and a bare `WHERE l_orderkey BETWEEN
  // a AND b` is rewritten to open only the files whose [min, max] box
  // intersects the range. No false negatives (boxes are conservative),
  // so the aggregate hash-matches the full-scan oracle; the require()
  // proves the plan opened a fraction of the files.
  private val qSkipRange = QueryDef("q_skip_range", Some(
    """SELECT cast(count(*) AS BIGINT) AS n,
      |       sum(cast(round(l_quantity * 100) AS BIGINT)) / 100.0 AS sum_qty,
      |       count(DISTINCT l_orderkey) AS n_orders
      |FROM lineitem WHERE l_orderkey BETWEEN 1000 AND 2000""".stripMargin),
    bench = false) { (spark, dir) =>
    val work = java.nio.file.Files.createTempDirectory("graft-skiprange-q").toString
    try {
      spark.read.parquet(s"$dir/lineitem.parquet")
        .repartitionByRange(16, col("l_orderkey"))
        .write.mode("overwrite").parquet(s"$work/t")
      graft.ops.Layout.statsIndex(spark, s"$work/t", Seq("l_orderkey"))
        .write.mode("overwrite").parquet(s"$work/idx")
      graft.plans.SkipRewrite.register(spark, s"$work/t", s"$work/idx")
      val out = spark.read.parquet(s"$work/t")
        .filter(col("l_orderkey").between(1000L, 2000L))
        .agg(count(lit(1)).as("n"),
          (sum(round(col("l_quantity") * 100).cast("long")) / 100.0).as("sum_qty"),
          countDistinct(col("l_orderkey")).as("n_orders"))
      val opened = out.queryExecution.optimizedPlan.collect {
        case lr: org.apache.spark.sql.execution.datasources.LogicalRelation =>
          lr.relation match {
            case fs: org.apache.spark.sql.execution.datasources.HadoopFsRelation =>
              fs.location.inputFiles.length
            case _ => 0
          }
      }.sum
      // the fixed key range covers more of the domain at smaller SFs
      // (sf0.001 opens 6 of 16, sf0.01 opens 2) — the gate is "most
      // files skipped", which holds at every SF the driver runs
      require(opened <= 8,
        s"q_skip_range: range auto-prune did not engage ($opened of 16 files)")
      out.localCheckpoint(true)
    } finally {
      graft.plans.SkipRewrite.unregister(s"$work/t")
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(work))
    }
  }

  // AUTO-consulted range skipping over a TIMESTAMP column — THE
  // dashboard predicate (`WHERE ts BETWEEN …`): the fact is
  // range-clustered on event time, a plain stats index is registered,
  // and a bare time-range filter auto-prunes to the files whose
  // [min, max] time boxes intersect. Timestamp literals are exact
  // integers (µs since epoch) by analysis time, so the box compare is
  // the same integer compare the row filter performs — no text
  // rendering or zone reinterpretation anywhere. No false negatives,
  // so the aggregate hash-matches the full-scan oracle; the require()
  // proves the plan opened a fraction of the files.
  private val qSkipDate = QueryDef("q_skip_date", Some(
    """SELECT cast(count(*) AS BIGINT) AS n,
      |       sum(cast(round(l_quantity * 100) AS BIGINT)) / 100.0 AS sum_qty,
      |       count(DISTINCT l_orderkey) AS n_orders
      |FROM lineitem
      |WHERE l_shipdate >= '1994-01-01' AND l_shipdate < '1994-07-01'""".stripMargin),
    bench = false) { (spark, dir) =>
    val work = java.nio.file.Files.createTempDirectory("graft-skipdate-q").toString
    try {
      spark.read.parquet(s"$dir/lineitem.parquet")
        .repartitionByRange(16, col("l_shipdate"))
        .write.mode("overwrite").parquet(s"$work/t")
      graft.ops.Layout.statsIndex(spark, s"$work/t", Seq("l_shipdate"))
        .write.mode("overwrite").parquet(s"$work/idx")
      graft.plans.SkipRewrite.register(spark, s"$work/t", s"$work/idx")
      val out = spark.read.parquet(s"$work/t")
        .filter(col("l_shipdate") >= "1994-01-01" &&
          col("l_shipdate") < "1994-07-01")
        .agg(count(lit(1)).as("n"),
          (sum(round(col("l_quantity") * 100).cast("long")) / 100.0).as("sum_qty"),
          countDistinct(col("l_orderkey")).as("n_orders"))
      val opened = out.queryExecution.optimizedPlan.collect {
        case lr: org.apache.spark.sql.execution.datasources.LogicalRelation =>
          lr.relation match {
            case fs: org.apache.spark.sql.execution.datasources.HadoopFsRelation =>
              fs.location.inputFiles.length
            case _ => 0
          }
      }.sum
      // ~7 years of shipdates; half a year survives — most of the 16
      // time-clustered files must be skipped at every SF
      require(opened <= 8,
        s"q_skip_date: timestamp range auto-prune did not engage ($opened of 16 files)")
      out.localCheckpoint(true)
    } finally {
      graft.plans.SkipRewrite.unregister(s"$work/t")
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(work))
    }
  }

  // AUTO-consulted skipping of a MIXED DISJUNCTION — `range OR
  // IN-list`, the dashboard-plus-drilldown shape neither pure handler
  // owns: each disjunct's surviving file set over-approximates its
  // matches, so SkipRewrite unions them (sound — a row matching the OR
  // matches some disjunct, whose survivors retain its file). The fact
  // is range-clustered on the key; the range disjunct prunes by
  // [min, max] box intersection, the IN disjunct box-probes each point
  // individually, and the plan opens the union. No false negatives, so
  // the aggregate hash-matches the full-scan oracle; the require()
  // proves the union actually pruned.
  private val qSkipOr = QueryDef("q_skip_or", Some(
    """SELECT cast(count(*) AS BIGINT) AS n,
      |       sum(cast(round(l_quantity * 100) AS BIGINT)) / 100.0 AS sum_qty,
      |       count(DISTINCT l_orderkey) AS n_orders
      |FROM lineitem
      |WHERE l_orderkey BETWEEN 1000 AND 2000 OR l_orderkey IN (1, 32)""".stripMargin),
    bench = false) { (spark, dir) =>
    val work = java.nio.file.Files.createTempDirectory("graft-skipor-q").toString
    try {
      spark.read.parquet(s"$dir/lineitem.parquet")
        .repartitionByRange(16, col("l_orderkey"))
        .write.mode("overwrite").parquet(s"$work/t")
      graft.ops.Layout.statsIndex(spark, s"$work/t", Seq("l_orderkey"))
        .write.mode("overwrite").parquet(s"$work/idx")
      graft.plans.SkipRewrite.register(spark, s"$work/t", s"$work/idx")
      val out = spark.read.parquet(s"$work/t")
        .filter(col("l_orderkey").between(1000L, 2000L) ||
          col("l_orderkey").isin(1L, 32L))
        .agg(count(lit(1)).as("n"),
          (sum(round(col("l_quantity") * 100).cast("long")) / 100.0).as("sum_qty"),
          countDistinct(col("l_orderkey")).as("n_orders"))
      val opened = out.queryExecution.optimizedPlan.collect {
        case lr: org.apache.spark.sql.execution.datasources.LogicalRelation =>
          lr.relation match {
            case fs: org.apache.spark.sql.execution.datasources.HadoopFsRelation =>
              fs.location.inputFiles.length
            case _ => 0
          }
      }.sum
      // the range survives in a few adjacent files, the two points in
      // the first — the union must still skip most of the 16
      require(opened <= 8,
        s"q_skip_or: disjunction auto-prune did not engage ($opened of 16 files)")
      out.localCheckpoint(true)
    } finally {
      graft.plans.SkipRewrite.unregister(s"$work/t")
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(work))
    }
  }

  // AUTO-consulted PREFIX skipping over a STRING column — the
  // domain/source filter of a corpus pipeline (`WHERE url LIKE
  // 'https://<domain>%'`): the corpus is clustered by url, a plain
  // stats index is registered, and the bare LIKE auto-prunes to the
  // files whose [min, max] string boxes intersect [prefix,
  // successor(prefix)). Both sides of the box compare are Spark
  // strings (UTF8 code-point order), so no false negatives and the
  // aggregate hash-matches the full-scan oracle; the require() proves
  // the plan opened a fraction of the files.
  private val qSkipPrefix = QueryDef("q_skip_prefix", Some(
    """WITH d AS (SELECT doc_id, n_chars,
      |                  'https://' || source || '.example.com/'
      |                    || CAST(doc_id AS VARCHAR) AS url
      |           FROM documents)
      |SELECT cast(count(*) AS BIGINT) AS n,
      |       cast(sum(n_chars) AS BIGINT) AS total_chars,
      |       count(DISTINCT doc_id) AS n_docs
      |FROM d WHERE url LIKE 'https://src12.%'""".stripMargin),
    bench = false) { (spark, dir) =>
    val work = java.nio.file.Files.createTempDirectory("graft-skipprefix-q").toString
    try {
      spark.read.parquet(s"$dir/documents.parquet")
        .withColumn("url", concat(lit("https://"), col("source"),
          lit(".example.com/"), col("doc_id").cast("string")))
        .repartitionByRange(16, col("url"))
        .write.mode("overwrite").parquet(s"$work/t")
      graft.ops.Layout.statsIndex(spark, s"$work/t", Seq("url"))
        .write.mode("overwrite").parquet(s"$work/idx")
      graft.plans.SkipRewrite.register(spark, s"$work/t", s"$work/idx")
      val out = spark.read.parquet(s"$work/t")
        .filter(col("url").like("https://src12.%"))
        .agg(count(lit(1)).as("n"),
          sum(col("n_chars")).cast("long").as("total_chars"),
          countDistinct(col("doc_id")).as("n_docs"))
      val opened = out.queryExecution.optimizedPlan.collect {
        case lr: org.apache.spark.sql.execution.datasources.LogicalRelation =>
          lr.relation match {
            case fs: org.apache.spark.sql.execution.datasources.HadoopFsRelation =>
              fs.location.inputFiles.length
            case _ => 0
          }
      }.sum
      // one source of twenty, url-clustered: most of the 16 files
      // must be skipped at every SF
      require(opened <= 4,
        s"q_skip_prefix: prefix auto-prune did not engage ($opened of 16 files)")
      out.localCheckpoint(true)
    } finally {
      graft.plans.SkipRewrite.unregister(s"$work/t")
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(work))
    }
  }

  // Semi-join file skipping (Layout.readPrunedBy) — the unpartitioned
  // analogue of dynamic partition pruning: a selective dim filter
  // (one week of orders) yields a bounded key set; the fact table's
  // membership fingerprints prune the scan to the files that can hold
  // those keys BEFORE the join runs. No false negatives, so the joined
  // aggregate hash-matches the full-scan oracle; the require() proves
  // the scan actually shrank.
  private val qSkipJoin = QueryDef("q_skip_join", Some(
    """SELECT cast(count(*) AS BIGINT) AS n,
      |       sum(cast(round(l.l_quantity * 100) AS BIGINT)) / 100.0 AS sum_qty,
      |       count(DISTINCT l.l_orderkey) AS n_orders
      |FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
      |WHERE o.o_orderdate >= TIMESTAMP '1995-06-01 00:00:00'
      |  AND o.o_orderdate <  TIMESTAMP '1995-06-08 00:00:00'""".stripMargin),
    bench = false) { (spark, dir) =>
    val work = java.nio.file.Files.createTempDirectory("graft-skipjoin-q").toString
    try {
      spark.read.parquet(s"$dir/lineitem.parquet")
        .repartitionByRange(16, col("l_orderkey"))
        .write.mode("overwrite").parquet(s"$work/t")
      val idx = graft.ops.Layout.statsIndexFingerprint(spark, s"$work/t",
        Seq("l_orderkey"), Seq("l_orderkey"))
      val dim = spark.read.parquet(s"$dir/orders.parquet")
        .filter(col("o_orderdate") >= expr("TIMESTAMP '1995-06-01 00:00:00'")
          && col("o_orderdate") < expr("TIMESTAMP '1995-06-08 00:00:00'"))
        .select("o_orderkey")
      val pruned = graft.ops.Layout.readPrunedBy(spark, idx, "l_orderkey", dim)
      require(pruned.inputFiles.length < 16,
        s"q_skip_join: index pruned nothing " +
          s"(${pruned.inputFiles.length} of 16 files opened)")
      pruned.join(dim, pruned("l_orderkey") === dim("o_orderkey"))
        .agg(count(lit(1)).as("n"),
          (sum(round(col("l_quantity") * 100).cast("long")) / 100.0).as("sum_qty"),
          countDistinct(col("l_orderkey")).as("n_orders"))
        .localCheckpoint(true)
    } finally {
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(work))
    }
  }

  // Targeted deletion (Layout.targetedDelete) — right-to-be-forgotten
  // over an immutable-file corpus: the fingerprint index names the few
  // files that can hold the doomed keys, ONLY those are rewritten (one
  // distributed job), and the index refreshes incrementally. The
  // require()s prove most files survived untouched; the surviving
  // table hash-matches DuckDB's anti-filtered oracle.
  private val qDelete = QueryDef("q_delete", Some(
    """SELECT cast(count(*) AS BIGINT) AS n,
      |       sum(cast(round(l_quantity * 100) AS BIGINT)) / 100.0 AS sum_qty,
      |       count(DISTINCT l_orderkey) AS n_orders
      |FROM lineitem WHERE l_orderkey NOT IN (1, 3, 32)""".stripMargin),
    bench = false) { (spark, dir) =>
    val work = java.nio.file.Files.createTempDirectory("graft-delete-q").toString
    try {
      spark.read.parquet(s"$dir/lineitem.parquet")
        .repartitionByRange(16, col("l_orderkey"))
        .write.mode("overwrite").parquet(s"$work/t")
      val idx = graft.ops.Layout.statsIndexFingerprint(spark, s"$work/t",
        Seq("l_orderkey"), Seq("l_orderkey"))
      val before = spark.read.parquet(s"$work/t").inputFiles.toSet
      val idx2 = graft.ops.Layout.targetedDelete(spark, s"$work/t", idx,
        "l_orderkey", Seq(1L, 3L, 32L), Seq("l_orderkey"))
      val after = spark.read.parquet(s"$work/t").inputFiles.toSet
      val untouched = (before intersect after).size
      require(untouched >= 8,
        s"q_delete: rewrite was not targeted ($untouched of 16 files untouched)")
      require(idx2.count() == after.size,
        "q_delete: refreshed index out of sync with the directory")
      spark.read.parquet(s"$work/t")
        .agg(count(lit(1)).as("n"),
          (sum(round(col("l_quantity") * 100).cast("long")) / 100.0).as("sum_qty"),
          countDistinct(col("l_orderkey")).as("n_orders"))
        .localCheckpoint(true)
    } finally {
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(work))
    }
  }

  // SCD-2 point-in-time join — "what did the customer's record say when
  // the line shipped": every lineitem joins the dimension VERSION
  // (q_scd2's build: each order re-versions its customer's record)
  // current at its own l_shipdate. Equi-join on the key + the validity
  // interval filter; fan-out is versions-per-key, never a cross. The
  // zero-length interval a same-date double-change produces matches
  // nothing, identically in both engines (same lead() ordering).
  private val qScd2Pit = QueryDef("q_scd2_pit", Some(
    """WITH dim AS (SELECT o_custkey, o_orderkey AS d_orderkey,
      |                    o_totalprice AS d_price, o_orderdate AS valid_from,
      |                    lead(o_orderdate) OVER (PARTITION BY o_custkey
      |                      ORDER BY o_orderdate, o_orderkey) AS valid_to
      |             FROM orders),
      |fact AS (SELECT o.o_custkey, l.l_orderkey, l.l_linenumber, l.l_shipdate
      |         FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey)
      |SELECT f.o_custkey, f.l_orderkey, f.l_linenumber, d.d_orderkey, d.d_price
      |FROM fact f JOIN dim d ON f.o_custkey = d.o_custkey
      |WHERE f.l_shipdate >= d.valid_from
      |  AND (d.valid_to IS NULL OR f.l_shipdate < d.valid_to)""".stripMargin)) {
    (spark, dir) =>
      val t = Tables(spark, dir)
      val dim = graft.ops.Cdc.scd2Build(
        t.orders.select(col("o_custkey"), col("o_orderkey").as("d_orderkey"),
          col("o_totalprice").as("d_price"), col("o_orderdate").as("valid_from")),
        Seq("o_custkey"), Seq("valid_from", "d_orderkey")).drop("is_current")
      val fact = t.lineitem.select("l_orderkey", "l_linenumber", "l_shipdate")
        .join(t.orders.select("o_orderkey", "o_custkey"),
          col("l_orderkey") === col("o_orderkey"))
        .select("o_custkey", "l_orderkey", "l_linenumber", "l_shipdate")
      graft.ops.Cdc.pointInTimeJoin(fact, dim, Seq("o_custkey"),
          "l_shipdate", "valid_from")
        .select("o_custkey", "l_orderkey", "l_linenumber", "d_orderkey", "d_price")
  }

  // Exactly-current MV answers — the round-7 centerpiece (#1): the REAL
  // aggSnapshotSinkAppendOnly stream builds a versioned snapshot (with
  // its _files manifest) over 90% of lineitem, is stopped, the last 10%
  // lands as new base files, and a FRESH registration answers the
  // ad-hoc aggregate as snapshot ∪ tail-partials — hash-equal to the
  // direct aggregate over the FULL table that the oracle computes. The
  // require() gates that the snapshot actually served the query.
  private val qIncrFresh = QueryDef("q_incr_fresh", Some(
    """SELECT l_returnflag, l_linestatus,
      |       count(*) AS cnt,
      |       sum(cast(round(l_quantity * 100) AS BIGINT)) / 100.0 AS sum_l_quantity,
      |       min(l_quantity) AS min_l_quantity,
      |       max(l_quantity) AS max_l_quantity
      |FROM lineitem
      |GROUP BY 1, 2""".stripMargin), bench = false) { (spark, dir) =>
    val li = Tables(spark, dir).lineitem
      .select("l_orderkey", "l_returnflag", "l_linestatus", "l_quantity")
    val work = java.nio.file.Files.createTempDirectory("graft-fresh-q").toString
    val baseDir = s"$work/base"
    val keys = Seq("l_returnflag", "l_linestatus")
    li.filter(col("l_orderkey") % 10 =!= 0).drop("l_orderkey")
      .repartition(2).write.mode("overwrite").parquet(baseDir)
    val stream = graft.streaming.Streams.aggSnapshotSinkAppendOnly(
      spark.readStream.schema(spark.read.parquet(baseDir).schema).parquet(baseDir),
      s"$work/tgt", s"$work/ck", keys, Seq("l_quantity"))
    try stream.processAllAvailable() finally stream.stop()
    li.filter(col("l_orderkey") % 10 === 0).drop("l_orderkey")
      .repartition(1).write.mode("append").parquet(baseDir)
    graft.plans.MvRewrite.registerVersionedFresh(spark, baseDir, keys,
      Seq("l_quantity"), s"$work/tgt", minMaxMeasures = Seq("l_quantity"))
    try {
      val out = spark.read.parquet(baseDir)
        .groupBy(keys.map(col).toIndexedSeq: _*)
        .agg(count(lit(1)).as("cnt"), sum("l_quantity").as("sum_l_quantity"),
          min("l_quantity").as("min_l_quantity"),
          max("l_quantity").as("max_l_quantity"))
      // partials layout: the navigated plan scans the target's delta
      // layers (the snapshot), not the base files the snapshot covers
      val plan = out.queryExecution.executedPlan.toString
      require(plan.contains(s"$work/tgt/delta"),
        s"q_incr_fresh: fresh navigation did not engage:\n$plan")
      out.localCheckpoint(true)
    } finally {
      graft.plans.MvRewrite.unregister(baseDir)
      // base + snapshot versions + checkpoint all live under work; the
      // localCheckpoint'd result no longer references any of them
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(work))
    }
  }

  // IQR-fence outlier detection — the data-quality gate before training
  // statistics: per-group Tukey fences (Q1 − 1.5·IQR, Q3 + 1.5·IQR) and
  // the out-of-fence row count. Two passes: a tiny per-group fence
  // aggregate BROADCAST back onto the fact (never a second shuffle of
  // the fact — PlanInvariantsSpec pins the broadcast), then one
  // counting pass. Interpolated percentiles and the fence arithmetic
  // are IEEE-identical in both engines (the q3_percentiles precedent),
  // so the whole gate hash-checks. Same O(distinct)-per-group exact-
  // percentile memory bound as q3_percentiles (see there); the
  // scale-safe KLL-fenced twin is Sketches.iqrOutliersKll, tolerance-
  // spec'd against this exact version in SketchesSpec.
  private val qOutliers = QueryDef("q_outliers", Some(
    """WITH f AS (SELECT l_returnflag,
      |         quantile_cont(l_extendedprice, 0.25) AS q1,
      |         quantile_cont(l_extendedprice, 0.75) AS q3
      |       FROM lineitem GROUP BY l_returnflag),
      |b AS (SELECT l_returnflag, q1 - (q3 - q1) * 1.5 AS lo,
      |             q3 + (q3 - q1) * 1.5 AS hi FROM f)
      |SELECT l.l_returnflag, min(b.lo) AS lo, min(b.hi) AS hi,
      |       CAST(sum(CASE WHEN l.l_extendedprice < b.lo
      |                       OR l.l_extendedprice > b.hi THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers,
      |       count(*) AS n_rows
      |FROM lineitem l JOIN b ON l.l_returnflag = b.l_returnflag
      |GROUP BY l.l_returnflag""".stripMargin)) { (spark, dir) =>
    val li = graft.ops.Par.scan(
      Tables(spark, dir).lineitem.select("l_returnflag", "l_extendedprice"))
    // q1 and q3 from ONE percentile buffer (one O(distinct) map build
    // + merge instead of two over the same column)
    val fences = li.groupBy("l_returnflag")
      .agg(expr("percentile(l_extendedprice, array(0.25D, 0.75D))").as("q13"))
      .select(col("l_returnflag"),
        col("q13").getItem(0).as("q1"), col("q13").getItem(1).as("q3"))
      .select(col("l_returnflag"),
        (col("q1") - (col("q3") - col("q1")) * 1.5).as("lo"),
        (col("q3") + (col("q3") - col("q1")) * 1.5).as("hi"))
    li.join(broadcast(fences), "l_returnflag")
      .groupBy("l_returnflag")
      .agg(min("lo").as("lo"), min("hi").as("hi"),
        sum(when(col("l_extendedprice") < col("lo")
          || col("l_extendedprice") > col("hi"), 1L).otherwise(0L)).as("n_outliers"),
        count(lit(1)).as("n_rows"))
  }

  // Right-to-be-forgotten for the MAINTAINED MV itself — the fifth leg
  // (corpus, BM25 postings, ANN assignments, LSH signatures, and now
  // the agg-snapshot partials): the real aggSnapshotSinkAppendOnly
  // stream builds the snapshot over three microbatches, compactSnapshot
  // folds them into a generation, and snapshotDelete scrubs one key's
  // groups from EVERY layer — all three batch dirs AND the generation
  // (the require pins 4 rewrites). The served snapshot then hash-equals
  // the oracle's rebuild-without-those-groups: deletion leaves no
  // residue in any layer a reader could resolve.
  private val qMvForget = QueryDef("q_mv_forget", Some(
    """SELECT l_returnflag, l_linestatus,
      |       count(*) AS cnt,
      |       sum(cast(round(l_quantity * 100) AS BIGINT)) / 100.0 AS sum_l_quantity,
      |       min(l_quantity) AS min_l_quantity,
      |       max(l_quantity) AS max_l_quantity
      |FROM lineitem
      |WHERE l_returnflag <> 'R'
      |GROUP BY 1, 2""".stripMargin), bench = false) { (spark, dir) =>
    val li = Tables(spark, dir).lineitem
      .select("l_orderkey", "l_returnflag", "l_linestatus", "l_quantity")
    val keys = Seq("l_returnflag", "l_linestatus")
    val work = java.nio.file.Files.createTempDirectory("graft-forget-q").toString
    try {
      val baseDir = s"$work/base"
      (0 until 3).foreach(i => li.filter(col("l_orderkey") % 3 === i)
        .drop("l_orderkey").coalesce(1).write.mode("append").parquet(baseDir))
      val sink = graft.streaming.Streams.aggSnapshotSinkAppendOnly(
        spark.readStream.schema(spark.read.parquet(baseDir).schema)
          .option("maxFilesPerTrigger", 1).parquet(baseDir),
        s"$work/tgt", s"$work/ck", keys, Seq("l_quantity"))
      try sink.processAllAvailable() finally sink.stop()
      require(graft.streaming.Streams.compactSnapshot(spark, s"$work/tgt",
        targetFiles = 2).contains(2L),
        "q_mv_forget: compaction did not cover the three batches")
      val rewritten = graft.streaming.Streams.snapshotDelete(spark,
        s"$work/tgt", "l_returnflag", Seq("R"))
      require(rewritten == 4,
        s"q_mv_forget: expected all 3 batch dirs + 1 generation rewritten, " +
          s"got $rewritten")
      val snap = graft.streaming.Streams.latestSnapshot(spark, s"$work/tgt")
        .getOrElse(throw new IllegalStateException("q_mv_forget: no snapshot"))
      graft.ops.Cdc.aggView(snap, Seq("l_quantity"))
        .select("l_returnflag", "l_linestatus", "cnt", "sum_l_quantity",
          "min_l_quantity", "max_l_quantity")
        .localCheckpoint(true)
    } finally {
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(work))
    }
  }

  // TIME TRAVEL on the maintained MV: the v=<id>/_SUCCESS markers the
  // sinks already write ARE a version log, so "what did this MV serve
  // before that batch landed" is one resolution away. Two real sink
  // runs (stop, land the last 10%, restart on the same checkpoint) give
  // two committed versions; snapshotAsOf at the FIRST must hash-equal
  // the oracle's aggregate over only the first run's rows — the later
  // batch is invisible at the pinned version. The require()s gate that
  // a second version genuinely exists above the pin (this row is not
  // latestSnapshot in disguise).
  private val qMvAsOf = QueryDef("q_mv_asof", Some(
    """SELECT l_returnflag, l_linestatus,
      |       count(*) AS cnt,
      |       sum(cast(round(l_quantity * 100) AS BIGINT)) / 100.0 AS sum_l_quantity,
      |       min(l_quantity) AS min_l_quantity,
      |       max(l_quantity) AS max_l_quantity
      |FROM lineitem
      |WHERE l_orderkey % 10 <> 0
      |GROUP BY 1, 2""".stripMargin), bench = false) { (spark, dir) =>
    val li = Tables(spark, dir).lineitem
      .select("l_orderkey", "l_returnflag", "l_linestatus", "l_quantity")
    val keys = Seq("l_returnflag", "l_linestatus")
    val work = java.nio.file.Files.createTempDirectory("graft-asof-q").toString
    try {
      val baseDir = s"$work/base"
      li.filter(col("l_orderkey") % 10 =!= 0).drop("l_orderkey")
        .coalesce(1).write.mode("overwrite").parquet(baseDir)
      def runSink(): Unit = {
        val sink = graft.streaming.Streams.aggSnapshotSinkAppendOnly(
          spark.readStream.schema(spark.read.parquet(baseDir).schema)
            .parquet(baseDir),
          s"$work/tgt", s"$work/ck", keys, Seq("l_quantity"))
        try sink.processAllAvailable() finally sink.stop()
      }
      runSink()
      val pin = graft.streaming.Streams.snapshotVersionsOf(spark, s"$work/tgt").max
      li.filter(col("l_orderkey") % 10 === 0).drop("l_orderkey")
        .coalesce(1).write.mode("append").parquet(baseDir)
      runSink()
      require(graft.streaming.Streams.snapshotVersionsOf(spark, s"$work/tgt")
        .max > pin, "q_mv_asof: no version committed above the pinned one")
      val asOf = graft.streaming.Streams.snapshotAsOf(spark, s"$work/tgt", pin)
      graft.ops.Cdc.aggView(asOf, Seq("l_quantity"))
        .select("l_returnflag", "l_linestatus", "cnt", "sum_l_quantity",
          "min_l_quantity", "max_l_quantity")
        .localCheckpoint(true)
    } finally {
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(work))
    }
  }

  // PARTIAL (filtered) MV navigation — the hot-subset view: the
  // snapshot materializes only `l_quantity > 25` rows (a NON-key
  // predicate, which a full view could never answer — non-key filters
  // select partial groups), and a query carrying the same predicate is
  // answered from it with the predicate consumed (every snapshot row
  // already passed it). The require() pins that the navigated plan
  // scans the kilobyte snapshot, not the base; the oracle recomputes
  // the aggregate over the filtered base with the snapshot's own
  // fixed-point cents arithmetic, so the navigation hash-checks.
  private val qMvFiltered = QueryDef("q_mv_filtered", Some(
    """SELECT l_returnflag, l_linestatus,
      |       count(*) AS cnt,
      |       sum(cast(round(l_quantity * 100) AS BIGINT)) / 100.0 AS sum_qty
      |FROM lineitem
      |WHERE l_quantity > 25
      |GROUP BY 1, 2""".stripMargin), bench = false) { (spark, dir) =>
    val basePath = s"$dir/lineitem.parquet"
    val keys = Seq("l_returnflag", "l_linestatus")
    val work = java.nio.file.Files.createTempDirectory("graft-mvfilt-q").toString
    try {
      val base = spark.read.parquet(basePath)
      val pred = col("l_quantity") > 25
      graft.ops.Cdc.aggSnapshot(base.filter(pred), keys, Seq("l_quantity"))
        .write.mode("overwrite").parquet(s"$work/hot")
      graft.plans.MvRewrite.register(spark, basePath, keys, Seq("l_quantity"),
        s"$work/hot", predicate = Some(pred))
      try {
        val out = spark.read.parquet(basePath)
          .filter(col("l_quantity") > 25)
          .groupBy("l_returnflag", "l_linestatus")
          .agg(count(lit(1)).as("cnt"), sum("l_quantity").as("sum_qty"))
        val plan = out.queryExecution.executedPlan.toString
        require(plan.contains(s"$work/hot") && !plan.contains("lineitem.parquet"),
          s"q_mv_filtered: partial-view navigation did not engage:\n$plan")
        out.localCheckpoint(true)
      } finally graft.plans.MvRewrite.unregister(basePath)
    } finally {
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(work))
    }
  }

  val defs: Seq[QueryDef] = Seq(
    q1, q1d, q2, q2n, q3, q3p, q3s, q3m, q4, q4l, q4s, q4a, q4f, q5, q6,
    q7u, q7i, q7e, q8, q9r, q9c, q9g, q10, q11a, q12, q12kmv, qUdaf,
    q4ex, q4nx, q4sc, q7ia, q7ea, qPivot, q8b, qStrings,
    qSortGlobal, qCross, q4in, qValidate, qSkewJoin, qSkewAgg, qMerge, qDiff,
    qIncr, qIncrAo, qIncrKmv, qKmvOverlap, qHist, qScd2, qMergeTable,
    qMergeAsOf, qMergeChangelog, qGraftFormat, qGraftChangelog, qGraftWrite,
    qGraftStream, qGraftStreamDec, qGraftStreamArr, qGraftStreamMap,
    qGraftFeedTrunc,
    qZorder, qHilbert,
    qOutliers, qIncrKmv2, qIncrBucket, qIncrFresh, qScd2Pit, qZorder3,
    qStarRollup, qStarRollup2, qStarDim, qStarCube, qMvRollup, qMvGroupingSets,
    qSkipping, qSkipAuto, qSkipRange, qSkipDate, qSkipPrefix, qSkipOr,
    qSkipJoin, qDelete,
    qMvForget, qMvAsOf, qMvFiltered)
}
