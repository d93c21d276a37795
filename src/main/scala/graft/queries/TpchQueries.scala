package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Composite analytical queries in all 22 classic TPC-H shapes,
  * adapted to the driver's column subset — no partsupp (the shapes that
  * need it derive the part↔supplier relationship and a unit cost from
  * the fact table), no shipmode/commitdate (lateness becomes "shipped
  * after the order date"), synthetic NATION_n names. Each is a multi-way
  * join + aggregate composition of the reference's own operator model
  * (map/filter/keyBy/reduce/join — flink_arch.drawio page
  * "DataStream分析"), written through the DataFrame API so Catalyst owns
  * join order, broadcast choice, and partial aggregation.
  *
  * These exist over and above the per-operator Q1–Q12 capability queries
  * because plan quality on composed multi-join pipelines is where a
  * 100 TB engine lives or dies: every one of these must show dims
  * broadcast, fact-side filters pushed into the parquet scan, and
  * map-side partial aggregation before the one key shuffle.
  */
object TpchQueries {

  private val revenue = col("l_extendedprice") * (lit(1) - col("l_discount"))

  /** TPC-H Q3 (shipping priority): top-10 undelivered orders by revenue
    * for one market segment. Scale: customer/orders filters cut both
    * sides before the fact join; the final top-10 is a
    * TakeOrderedAndProject (no global sort materialization). */
  private val q3 = QueryDef("tpch_q3", Some(
    """SELECT l_orderkey,
      |       sum(l_extendedprice * (1 - l_discount)) AS revenue,
      |       cast(o_orderdate AS STRING)             AS o_orderdate,
      |       o_orderpriority
      |FROM customer
      |JOIN orders   ON c_custkey = o_custkey
      |JOIN lineitem ON l_orderkey = o_orderkey
      |WHERE c_mktsegment = 'BUILDING'
      |  AND o_orderdate < '1997-06-30'
      |  AND l_shipdate  > '1997-06-30'
      |GROUP BY l_orderkey, o_orderdate, o_orderpriority
      |ORDER BY revenue DESC, l_orderkey
      |LIMIT 10""".stripMargin)) { (spark, dir) =>
    val t = Tables(spark, dir)
    t.customer.filter(col("c_mktsegment") === "BUILDING")
      .join(t.orders.filter(col("o_orderdate") < "1997-06-30"),
        col("c_custkey") === col("o_custkey"))
      .join(t.lineitem.filter(col("l_shipdate") > "1997-06-30"),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
      .agg(sum(revenue).as("revenue"))
      .withColumn("o_orderdate", col("o_orderdate").cast("string"))
      .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
      .orderBy(col("revenue").desc, col("l_orderkey"))
      .limit(10)
  }

  /** TPC-H Q5 (local supplier volume): revenue where customer and
    * supplier share a nation, per nation in one region, one year.
    * Scale: the 6-way join's dims (region/nation/supplier/customer) all
    * broadcast; only orders⋈lineitem shuffles, and the
    * c_nationkey = s_nationkey residual prunes cross-nation pairs
    * inside the join, never materializing them. */
  private val q5 = QueryDef("tpch_q5", Some(
    """SELECT n_name, sum(l_extendedprice * (1 - l_discount)) AS revenue
      |FROM customer
      |JOIN orders   ON c_custkey = o_custkey
      |JOIN lineitem ON l_orderkey = o_orderkey
      |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
      |JOIN nation   ON s_nationkey = n_nationkey
      |JOIN region   ON n_regionkey = r_regionkey
      |WHERE r_name = 'ASIA'
      |  AND o_orderdate >= '1996-01-01' AND o_orderdate < '1997-01-01'
      |GROUP BY n_name""".stripMargin)) { (spark, dir) =>
    val t = Tables(spark, dir)
    t.customer
      .join(t.orders.filter(col("o_orderdate") >= "1996-01-01"
        && col("o_orderdate") < "1997-01-01"), col("c_custkey") === col("o_custkey"))
      .join(t.lineitem, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(t.supplier),
        col("l_suppkey") === col("s_suppkey") && col("c_nationkey") === col("s_nationkey"))
      .join(broadcast(t.nation), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(t.region.filter(col("r_name") === "ASIA")),
        col("n_regionkey") === col("r_regionkey"))
      .groupBy("n_name")
      .agg(sum(revenue).as("revenue"))
  }

  /** TPC-H Q6 (forecast revenue change): single-table filter + global
    * aggregate. Scale: every predicate pushes into the parquet scan;
    * the aggregate is one partial per partition + a 1-row final —
    * the cheapest possible full-fact-scan query, a scan-speed probe. */
  private val q6 = QueryDef("tpch_q6", Some(
    """SELECT sum(l_extendedprice * l_discount) AS revenue
      |FROM lineitem
      |WHERE l_shipdate >= '1997-01-01' AND l_shipdate < '1998-01-01'
      |  AND l_discount BETWEEN 0.03 AND 0.07
      |  AND l_quantity < 24""".stripMargin)) { (spark, dir) =>
    Tables(spark, dir).lineitem
      .filter(col("l_shipdate") >= "1997-01-01" && col("l_shipdate") < "1998-01-01"
        && col("l_discount").between(0.03, 0.07) && col("l_quantity") < 24)
      .agg(sum(col("l_extendedprice") * col("l_discount")).as("revenue"))
  }

  /** TPC-H Q7 (volume shipping): revenue between two nations by year,
    * in both directions (supplier nation ≠ customer nation). Scale: the
    * nation-pair filter applies at the broadcast-joined dims, so the
    * fact shuffle carries only the two nations' rows. */
  private val q7 = QueryDef("tpch_q7", Some(
    """SELECT supp_nation, cust_nation, l_year, sum(volume) AS revenue
      |FROM (
      |  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
      |         cast(year(l_shipdate) AS INT) AS l_year,
      |         l_extendedprice * (1 - l_discount) AS volume
      |  FROM supplier
      |  JOIN lineitem ON s_suppkey = l_suppkey
      |  JOIN orders   ON o_orderkey = l_orderkey
      |  JOIN customer ON c_custkey = o_custkey
      |  JOIN nation n1 ON s_nationkey = n1.n_nationkey
      |  JOIN nation n2 ON c_nationkey = n2.n_nationkey
      |  WHERE (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_3')
      |     OR (n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_2')
      |) shipping
      |GROUP BY supp_nation, cust_nation, l_year""".stripMargin)) { (spark, dir) =>
    val t = Tables(spark, dir)
    val n1 = t.nation.select(col("n_nationkey").as("n1_key"), col("n_name").as("supp_nation"))
    val n2 = t.nation.select(col("n_nationkey").as("n2_key"), col("n_name").as("cust_nation"))
    t.supplier
      .join(t.lineitem, col("s_suppkey") === col("l_suppkey"))
      .join(t.orders, col("o_orderkey") === col("l_orderkey"))
      .join(t.customer, col("c_custkey") === col("o_custkey"))
      .join(broadcast(n1), col("s_nationkey") === col("n1_key"))
      .join(broadcast(n2), col("c_nationkey") === col("n2_key"))
      .filter((col("supp_nation") === "NATION_2" && col("cust_nation") === "NATION_3")
        || (col("supp_nation") === "NATION_3" && col("cust_nation") === "NATION_2"))
      .withColumn("l_year", year(col("l_shipdate")).cast("int"))
      .groupBy("supp_nation", "cust_nation", "l_year")
      .agg(sum(revenue).as("revenue"))
  }

  /** TPC-H Q10 (returned item reporting): top-20 customers by revenue
    * lost to returns in one half-year. Scale: orderdate filter prunes
    * the orders side before the fact join; top-20 via
    * TakeOrderedAndProject. */
  private val q10 = QueryDef("tpch_q10", Some(
    """SELECT c_custkey, c_name,
      |       sum(l_extendedprice * (1 - l_discount)) AS revenue,
      |       c_acctbal, n_name
      |FROM customer
      |JOIN orders   ON c_custkey = o_custkey
      |JOIN lineitem ON l_orderkey = o_orderkey
      |JOIN nation   ON c_nationkey = n_nationkey
      |WHERE l_returnflag = 'R'
      |  AND o_orderdate >= '1997-01-01' AND o_orderdate < '1997-07-01'
      |GROUP BY c_custkey, c_name, c_acctbal, n_name
      |ORDER BY revenue DESC, c_custkey
      |LIMIT 20""".stripMargin)) { (spark, dir) =>
    val t = Tables(spark, dir)
    t.customer
      .join(t.orders.filter(col("o_orderdate") >= "1997-01-01"
        && col("o_orderdate") < "1997-07-01"), col("c_custkey") === col("o_custkey"))
      .join(t.lineitem.filter(col("l_returnflag") === "R"),
        col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(t.nation), col("c_nationkey") === col("n_nationkey"))
      .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
      .agg(sum(revenue).as("revenue"))
      .select("c_custkey", "c_name", "revenue", "c_acctbal", "n_name")
      .orderBy(col("revenue").desc, col("c_custkey"))
      .limit(20)
  }

  /** TPC-H Q18 (large-volume customers): orders whose total quantity
    * exceeds a threshold, with customer detail. Scale: the HAVING
    * pre-aggregates lineitem by orderkey BEFORE joining — the join
    * input is |orders over threshold|, not |lineitem| (the classic
    * aggregate-pushdown-below-join formulation, written explicitly). */
  private val q18 = QueryDef("tpch_q18", Some(
    """SELECT c_custkey, c_name, o_orderkey,
      |       cast(o_orderdate AS STRING) AS o_orderdate,
      |       o_totalprice, sum_qty
      |FROM (
      |  SELECT l_orderkey, sum(l_quantity) AS sum_qty
      |  FROM lineitem GROUP BY l_orderkey HAVING sum(l_quantity) > 300
      |) big
      |JOIN orders   ON o_orderkey = l_orderkey
      |JOIN customer ON c_custkey = o_custkey
      |ORDER BY o_totalprice DESC, o_orderkey
      |LIMIT 100""".stripMargin)) { (spark, dir) =>
    val t = Tables(spark, dir)
    val big = t.lineitem.groupBy("l_orderkey")
      .agg(sum("l_quantity").as("sum_qty"))
      .filter(col("sum_qty") > 300)
    big.join(t.orders, col("o_orderkey") === col("l_orderkey"))
      .join(t.customer, col("c_custkey") === col("o_custkey"))
      .withColumn("o_orderdate", col("o_orderdate").cast("string"))
      .select("c_custkey", "c_name", "o_orderkey", "o_orderdate", "o_totalprice", "sum_qty")
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .limit(100)
  }

  /** TPC-H Q1 (pricing summary report): the canonical full-scan
    * aggregate — every measure of the pricing columns grouped by the
    * two status flags. Scale: one pass over the fact, partial
    * aggregation reduces each partition to ≤|flag×status| rows before
    * the single tiny shuffle; the scan reads only the 7 touched
    * columns. */
  private val q1t = QueryDef("tpch_q1", Some(
    """SELECT l_returnflag, l_linestatus,
      |       sum(l_quantity)                                       AS sum_qty,
      |       sum(l_extendedprice)                                  AS sum_base_price,
      |       sum(l_extendedprice * (1 - l_discount))               AS sum_disc_price,
      |       sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)) AS sum_charge,
      |       avg(l_quantity)                                       AS avg_qty,
      |       avg(l_extendedprice)                                  AS avg_price,
      |       avg(l_discount)                                       AS avg_disc,
      |       count(*)                                              AS count_order
      |FROM lineitem
      |WHERE l_shipdate <= '1998-09-02'
      |GROUP BY l_returnflag, l_linestatus""".stripMargin)) { (spark, dir) =>
    Tables(spark, dir).lineitem
      .filter(col("l_shipdate") <= "1998-09-02")
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        sum("l_quantity").as("sum_qty"),
        sum("l_extendedprice").as("sum_base_price"),
        sum(revenue).as("sum_disc_price"),
        sum(revenue * (lit(1) + col("l_tax"))).as("sum_charge"),
        avg("l_quantity").as("avg_qty"),
        avg("l_extendedprice").as("avg_price"),
        avg("l_discount").as("avg_disc"),
        count(lit(1)).as("count_order"))
  }

  /** TPC-H Q4 (order priority checking), adapted: the reference schema's
    * commitdate/receiptdate lateness test becomes "some line shipped
    * after the order date" — same correlated-EXISTS shape. Scale:
    * Catalyst rewrites the EXISTS to a left-semi join on l_orderkey
    * with the inequality as residual; lineitem carries only two columns
    * into the shuffle and orders' quarter filter pushes into its scan. */
  private val q4t = QueryDef("tpch_q4", Some(
    """SELECT o_orderpriority, count(*) AS order_count
      |FROM orders o
      |WHERE o_orderdate >= '1997-01-01' AND o_orderdate < '1997-04-01'
      |  AND EXISTS (SELECT 1 FROM lineitem l
      |              WHERE l.l_orderkey = o.o_orderkey
      |                AND l.l_shipdate > o.o_orderdate)
      |GROUP BY o_orderpriority""".stripMargin)) { (spark, dir) =>
    val t = Tables(spark, dir)
    t.orders
      .filter(col("o_orderdate") >= "1997-01-01" && col("o_orderdate") < "1997-04-01")
      .join(t.lineitem.select("l_orderkey", "l_shipdate"),
        col("l_orderkey") === col("o_orderkey") && col("l_shipdate") > col("o_orderdate"),
        "left_semi")
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("order_count"))
  }

  /** TPC-H Q8 (national market share): NATION_2 suppliers' share of
    * revenue delivered to ASIA customers, by order year. Scale: all
    * four dims broadcast; the share is a conditional-sum ratio computed
    * in the same single aggregation pass (no second scan, no join of
    * two aggregates). */
  private val q8t = QueryDef("tpch_q8", Some(
    """SELECT cast(year(o_orderdate) AS INT) AS o_year,
      |       sum(CASE WHEN n2.n_name = 'NATION_2'
      |                THEN l_extendedprice * (1 - l_discount) ELSE 0 END)
      |         / sum(l_extendedprice * (1 - l_discount)) AS mkt_share
      |FROM lineitem
      |JOIN orders   ON o_orderkey = l_orderkey
      |JOIN customer ON c_custkey = o_custkey
      |JOIN nation n1 ON c_nationkey = n1.n_nationkey
      |JOIN region   ON n1.n_regionkey = r_regionkey
      |JOIN supplier ON s_suppkey = l_suppkey
      |JOIN nation n2 ON s_nationkey = n2.n_nationkey
      |WHERE r_name = 'ASIA'
      |GROUP BY 1""".stripMargin)) { (spark, dir) =>
    val t = Tables(spark, dir)
    val n1 = t.nation.select(col("n_nationkey").as("n1_key"), col("n_regionkey").as("n1_region"))
    val n2 = t.nation.select(col("n_nationkey").as("n2_key"), col("n_name").as("supp_nation"))
    t.lineitem
      .join(t.orders, col("o_orderkey") === col("l_orderkey"))
      .join(t.customer, col("c_custkey") === col("o_custkey"))
      .join(broadcast(n1), col("c_nationkey") === col("n1_key"))
      .join(broadcast(t.region.filter(col("r_name") === "ASIA")),
        col("n1_region") === col("r_regionkey"))
      .join(broadcast(t.supplier), col("s_suppkey") === col("l_suppkey"))
      .join(broadcast(n2), col("s_nationkey") === col("n2_key"))
      .withColumn("o_year", year(col("o_orderdate")).cast("int"))
      .groupBy("o_year")
      .agg((sum(when(col("supp_nation") === "NATION_2", revenue).otherwise(lit(0)))
        / sum(revenue)).as("mkt_share"))
  }

  /** TPC-H Q14 (promotion effect): promo types' share of one month's
    * revenue. Scale: the month filter pushes into the fact scan before
    * the part join (part broadcasts); numerator and denominator come
    * from one aggregation pass via a conditional sum. */
  private val q14t = QueryDef("tpch_q14", Some(
    """SELECT 100.0 * sum(CASE WHEN p_type = 'PROMO'
      |                        THEN l_extendedprice * (1 - l_discount) END)
      |         / sum(l_extendedprice * (1 - l_discount)) AS promo_revenue
      |FROM lineitem
      |JOIN part ON p_partkey = l_partkey
      |WHERE l_shipdate >= '1997-09-01' AND l_shipdate < '1997-10-01'""".stripMargin)) { (spark, dir) =>
    val t = Tables(spark, dir)
    t.lineitem
      .filter(col("l_shipdate") >= "1997-09-01" && col("l_shipdate") < "1997-10-01")
      .join(broadcast(t.part), col("p_partkey") === col("l_partkey"))
      .agg((lit(100.0) * sum(when(col("p_type") === "PROMO", revenue))
        / sum(revenue)).as("promo_revenue"))
  }

  /** TPC-H Q15 (top supplier): the supplier(s) with maximum quarterly
    * revenue. Scale: revenue aggregates lineitem down to |suppliers|
    * rows FIRST; the max is a window over that tiny aggregate (computed
    * once — no re-evaluation of the revenue table, which double-sum
    * nondeterminism would make flaky), and supplier broadcasts. */
  private val q15t = QueryDef("tpch_q15", Some(
    """WITH rev AS (
      |  SELECT l_suppkey AS supplier_no,
      |         sum(l_extendedprice * (1 - l_discount)) AS total_revenue
      |  FROM lineitem
      |  WHERE l_shipdate >= '1997-01-01' AND l_shipdate < '1997-04-01'
      |  GROUP BY 1)
      |SELECT s_suppkey, s_name, total_revenue
      |FROM supplier JOIN rev ON s_suppkey = supplier_no
      |WHERE total_revenue = (SELECT max(total_revenue) FROM rev)""".stripMargin)) { (spark, dir) =>
    import org.apache.spark.sql.expressions.Window
    val t = Tables(spark, dir)
    val rev = t.lineitem
      .filter(col("l_shipdate") >= "1997-01-01" && col("l_shipdate") < "1997-04-01")
      .groupBy(col("l_suppkey").as("supplier_no"))
      .agg(sum(revenue).as("total_revenue"))
    // Empty-frame window = single partition, but its input is the
    // ≤|suppliers|-row aggregate (kB–MB at any SF), never the fact.
    rev.withColumn("max_rev", max("total_revenue").over(Window.partitionBy()))
      .filter(col("total_revenue") === col("max_rev"))
      .join(broadcast(t.supplier), col("s_suppkey") === col("supplier_no"))
      .select("s_suppkey", "s_name", "total_revenue")
  }

  /** TPC-H Q19 (discounted revenue): disjunction of brand/size/quantity
    * conjunctions — the classic OR-of-ANDs predicate that exercises
    * join-condition pushdown. Scale: part broadcasts; the per-branch
    * part predicates (brand, size) filter the broadcast side and the
    * quantity bounds stay as a residual on the fact rows, so no branch
    * materializes a cross product. */
  private val q19t = QueryDef("tpch_q19", Some(
    """SELECT sum(l_extendedprice * (1 - l_discount)) AS revenue
      |FROM lineitem
      |JOIN part ON p_partkey = l_partkey
      |WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
      |       AND l_quantity BETWEEN 1 AND 11)
      |   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10
      |       AND l_quantity BETWEEN 10 AND 20)
      |   OR (p_brand = 'Brand#21' AND p_size BETWEEN 1 AND 15
      |       AND l_quantity BETWEEN 20 AND 30)""".stripMargin)) { (spark, dir) =>
    val t = Tables(spark, dir)
    t.lineitem
      .join(broadcast(t.part), col("p_partkey") === col("l_partkey"))
      .filter(
        (col("p_brand") === "Brand#12" && col("p_size").between(1, 5)
          && col("l_quantity").between(1, 11))
          || (col("p_brand") === "Brand#23" && col("p_size").between(1, 10)
            && col("l_quantity").between(10, 20))
          || (col("p_brand") === "Brand#21" && col("p_size").between(1, 15)
            && col("l_quantity").between(20, 30)))
      .agg(sum(revenue).as("revenue"))
  }

  /** TPC-H Q22 (global sales opportunity), adapted: above-average-
    * balance customers with no RECENT orders (the driver's data gives
    * every customer at least one order ever, so the reference's
    * no-orders-at-all test is windowed to 1999+). Scale: the average is
    * an uncorrelated scalar subquery — one tiny aggregate broadcast
    * into the filter, not a per-row rescan; the NOT EXISTS becomes a
    * left-anti join against the date-pruned orders scan. */
  private val q22t = QueryDef("tpch_q22", Some(
    """SELECT c_mktsegment, count(*) AS numcust, sum(c_acctbal) AS totacctbal
      |FROM customer c
      |WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer WHERE c_acctbal > 0)
      |  AND NOT EXISTS (SELECT 1 FROM orders o
      |                  WHERE o.o_custkey = c.c_custkey
      |                    AND o.o_orderdate >= '1999-01-01')
      |GROUP BY c_mktsegment""".stripMargin)) { (spark, dir) =>
    val t = Tables(spark, dir)
    // Uncorrelated scalar: one 1-row aggregate, bound to every customer
    // row via a broadcast nested-loop whose build side is exactly that
    // one row — constant cost per probe row, the same plan Spark gives
    // a SQL scalar subquery. (A constant-key equi-join can't avoid it:
    // Catalyst folds lit = lit to true and drops the join keys.)
    // Declared in PlanInvariantsSpec.nestedLoopAllowed with the other
    // scalar binds.
    val avgBal = t.customer.filter(col("c_acctbal") > 0)
      .agg(avg("c_acctbal").as("avg_bal"))
    t.customer
      .crossJoin(broadcast(avgBal))
      .filter(col("c_acctbal") > col("avg_bal"))
      .join(t.orders.filter(col("o_orderdate") >= "1999-01-01").select("o_custkey"),
        col("o_custkey") === col("c_custkey"), "left_anti")
      .groupBy("c_mktsegment")
      .agg(count(lit(1)).as("numcust"), sum("c_acctbal").as("totacctbal"))
  }

  /** TPC-H Q12 (shipping priority classes), adapted: no shipmode or
    * commit/receipt dates in the driver schema, so "late" becomes
    * "shipped after the order date" and the grouping key is
    * l_linestatus. Scale: the year filter pushes into the fact scan,
    * orders contributes three columns, the lateness test rides the join
    * as a residual, and the aggregate collapses to two rows with
    * map-side partials before one tiny shuffle. */
  private val q12t = QueryDef("tpch_q12", Some(
    """SELECT l_linestatus,
      |       count(*) FILTER (WHERE o_orderpriority IN ('1-URGENT','2-HIGH'))     AS high_line_count,
      |       count(*) FILTER (WHERE o_orderpriority NOT IN ('1-URGENT','2-HIGH')) AS low_line_count
      |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
      |WHERE l_shipdate > o_orderdate
      |  AND l_shipdate >= '1997-01-01' AND l_shipdate < '1998-01-01'
      |GROUP BY l_linestatus""".stripMargin)) { (spark, dir) =>
    val t = Tables(spark, dir)
    t.orders.select("o_orderkey", "o_orderdate", "o_orderpriority")
      .join(t.lineitem
          .filter(col("l_shipdate") >= "1997-01-01" && col("l_shipdate") < "1998-01-01")
          .select("l_orderkey", "l_shipdate", "l_linestatus"),
        col("o_orderkey") === col("l_orderkey") && col("l_shipdate") > col("o_orderdate"))
      .groupBy("l_linestatus")
      .agg(
        count(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1))
          .as("high_line_count"),
        count(when(!col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1))
          .as("low_line_count"))
  }

  /** TPC-H Q13 (customer order-count distribution), adapted: the
    * comment-pattern exclusion becomes an order-priority exclusion.
    * Scale: the classic double aggregation — customer LEFT JOIN orders
    * keeps zero-order customers (count(o_orderkey) ignores the nulls),
    * first aggregate shuffles on c_custkey, the second on the ≤|distinct
    * counts| histogram keys — each stage strictly smaller. */
  private val q13t = QueryDef("tpch_q13", Some(
    """SELECT c_count, count(*) AS custdist
      |FROM (SELECT c_custkey, count(o_orderkey) AS c_count
      |      FROM customer LEFT JOIN orders
      |        ON c_custkey = o_custkey AND o_orderpriority <> '5-LOW'
      |      GROUP BY c_custkey) c_orders
      |GROUP BY c_count""".stripMargin)) { (spark, dir) =>
    val t = Tables(spark, dir)
    t.customer.select("c_custkey")
      .join(t.orders.filter(col("o_orderpriority") =!= "5-LOW")
          .select("o_custkey", "o_orderkey"),
        col("c_custkey") === col("o_custkey"), "left")
      .groupBy("c_custkey")
      .agg(count(col("o_orderkey")).as("c_count"))
      .groupBy("c_count")
      .agg(count(lit(1)).as("custdist"))
  }

  /** TPC-H Q17 (small-quantity-order revenue), adapted: no p_container,
    * so the part predicate is brand + size. Scale: the correlated
    * per-part average becomes an explicit aggregate joined back — the
    * broadcast part filter prunes BOTH fact passes to the qualifying
    * parts' lines before anything shuffles, and the threshold side
    * (≤|qualifying parts| rows) broadcasts into the final filter. */
  private val q17t = QueryDef("tpch_q17", Some(
    """SELECT sum(l_extendedprice) / 7.0 AS avg_yearly
      |FROM lineitem JOIN part ON p_partkey = l_partkey
      |WHERE p_brand = 'Brand#23' AND p_size < 15
      |  AND l_quantity < (SELECT 0.2 * avg(l_quantity)
      |                    FROM lineitem l2 WHERE l2.l_partkey = p_partkey)""".stripMargin)) { (spark, dir) =>
    val t = Tables(spark, dir)
    // size < 15 keeps qualifying lines at sf0.001 (size < 5 has none —
    // a NULL aggregate there would blind the smoke/plan checks)
    val parts = t.part.filter(col("p_brand") === "Brand#23" && col("p_size") < 15)
      .select("p_partkey")
    val lines = t.lineitem.select("l_partkey", "l_quantity", "l_extendedprice")
      .join(broadcast(parts), col("p_partkey") === col("l_partkey"))
    val thresh = lines.groupBy(col("l_partkey").as("t_partkey"))
      .agg((avg("l_quantity") * 0.2).as("qty_thresh"))
    lines.join(broadcast(thresh), col("l_partkey") === col("t_partkey"))
      .filter(col("l_quantity") < col("qty_thresh"))
      .agg((sum("l_extendedprice") / 7.0).as("avg_yearly"))
  }

  /** TPC-H Q21 (suppliers who kept orders waiting), adapted: lateness is
    * "shipped after the order date". A supplier qualifies per order when
    * its line was late, the order has other suppliers, and none of the
    * others were late. Scale: the double-EXISTS of the reference text is
    * one per-(order, supplier) aggregate plus per-order window counts —
    * the window input is the aggregated |order×supplier| table, far
    * smaller than the fact, and supplier/nation broadcast at the end. */
  private val q21t = QueryDef("tpch_q21", Some(
    """WITH supp_order AS (
      |  SELECT l_orderkey, l_suppkey,
      |         max(CASE WHEN l_shipdate > o_orderdate THEN 1 ELSE 0 END) AS late
      |  FROM lineitem JOIN orders ON o_orderkey = l_orderkey
      |  WHERE o_orderstatus = 'F'
      |  GROUP BY l_orderkey, l_suppkey),
      |flagged AS (
      |  SELECT l_suppkey, late,
      |         count(*) OVER (PARTITION BY l_orderkey) AS n_supp,
      |         sum(late) OVER (PARTITION BY l_orderkey) AS n_late
      |  FROM supp_order)
      |SELECT s_name, count(*) AS numwait
      |FROM flagged
      |JOIN supplier ON s_suppkey = l_suppkey
      |JOIN nation ON s_nationkey = n_nationkey
      |WHERE late = 1 AND n_supp > 1 AND n_late = 1 AND n_name = 'NATION_12'
      |GROUP BY s_name
      |ORDER BY numwait DESC, s_name
      |LIMIT 100""".stripMargin)) { (spark, dir) =>
    import org.apache.spark.sql.expressions.Window
    val t = Tables(spark, dir)
    val so = t.lineitem.select("l_orderkey", "l_suppkey", "l_shipdate")
      .join(t.orders.filter(col("o_orderstatus") === "F")
          .select("o_orderkey", "o_orderdate"),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy("l_orderkey", "l_suppkey")
      .agg(max(when(col("l_shipdate") > col("o_orderdate"), 1).otherwise(0)).as("late"))
    val w = Window.partitionBy("l_orderkey")
    so.withColumn("n_supp", count(lit(1)).over(w))
      .withColumn("n_late", sum("late").over(w))
      .filter(col("late") === 1 && col("n_supp") > 1 && col("n_late") === 1)
      .join(broadcast(t.supplier), col("s_suppkey") === col("l_suppkey"))
      // NATION_12 has qualifying waits at sf0.001 AND sf0.01 — an
      // empty result would AQE-collapse the plan to EmptyRelation and
      // blind the plan-invariant specs (see tpch_q7's nation choice)
      .join(broadcast(t.nation.filter(col("n_name") === "NATION_12")),
        col("s_nationkey") === col("n_nationkey"))
      .groupBy("s_name")
      .agg(count(lit(1)).as("numwait"))
      .orderBy(col("numwait").desc, col("s_name"))
      .limit(100)
  }

  // The remaining five reference shapes (Q2/Q9/Q11/Q16/Q20) need the
  // partsupp table the driver schema omits. Where the shape only needs
  // the part↔supplier RELATIONSHIP, it is derived from the fact table
  // (distinct (l_partkey, l_suppkey) — who actually supplied what);
  // where it needs a supply COST, the derived unit price
  // min(l_extendedprice / l_quantity) stands in. Both derivations are
  // deterministic, so the DuckDB oracle runs the identical definition.

  /** TPC-H Q2 (minimum-cost supplier), adapted: supply cost is the
    * supplier's best observed unit price. Scale: the derived ps table is
    * one fact aggregate; the per-part minimum over one region's
    * suppliers is a window over that aggregate joined to broadcast dims
    * — the correlated min-subquery never rescans anything. */
  private val q2t = QueryDef("tpch_q2", Some(
    """WITH ps AS (
      |  SELECT l_partkey, l_suppkey, min(l_extendedprice / l_quantity) AS ps_supplycost
      |  FROM lineitem GROUP BY 1, 2)
      |SELECT s_acctbal, s_name, n_name, p_partkey, p_name
      |FROM part
      |JOIN ps ON p_partkey = l_partkey
      |JOIN supplier ON s_suppkey = l_suppkey
      |JOIN nation ON s_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |WHERE p_size = 15 AND r_name = 'EUROPE'
      |  AND ps_supplycost = (SELECT min(ps2.ps_supplycost)
      |                       FROM ps ps2
      |                       JOIN supplier s2 ON s2.s_suppkey = ps2.l_suppkey
      |                       JOIN nation n2 ON n2.n_nationkey = s2.s_nationkey
      |                       JOIN region r2 ON r2.r_regionkey = n2.n_regionkey
      |                       WHERE ps2.l_partkey = p_partkey AND r2.r_name = 'EUROPE')
      |ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
      |LIMIT 100""".stripMargin)) { (spark, dir) =>
    import org.apache.spark.sql.expressions.Window
    val t = Tables(spark, dir)
    val ps = t.lineitem.select("l_partkey", "l_suppkey", "l_extendedprice", "l_quantity")
      .groupBy("l_partkey", "l_suppkey")
      .agg(min(col("l_extendedprice") / col("l_quantity")).as("ps_supplycost"))
    val euSupp = t.supplier
      .join(broadcast(t.nation), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(t.region.filter(col("r_name") === "EUROPE")),
        col("n_regionkey") === col("r_regionkey"))
      .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    val euPs = ps.join(broadcast(euSupp), col("l_suppkey") === col("s_suppkey"))
    euPs.withColumn("min_cost",
        min("ps_supplycost").over(Window.partitionBy("l_partkey")))
      .filter(col("ps_supplycost") === col("min_cost"))
      .join(broadcast(t.part.filter(col("p_size") === 15)),
        col("p_partkey") === col("l_partkey"))
      .select("s_acctbal", "s_name", "n_name", "p_partkey", "p_name")
      .orderBy(col("s_acctbal").desc, col("n_name"), col("s_name"), col("p_partkey"))
      .limit(100)
  }

  /** TPC-H Q9 (product type profit), adapted: the partsupp supply cost
    * becomes a retail-price-derived cost, so profit =
    * revenue − 0.6·p_retailprice·quantity. Scale: part's name filter
    * prunes the broadcast side first, which prunes the fact rows at the
    * join; supplier/nation broadcast; one shuffle at the
    * (nation, year) aggregate. */
  private val q9t = QueryDef("tpch_q9", Some(
    """SELECT n_name AS nation, cast(year(o_orderdate) AS INT) AS o_year,
      |       sum(l_extendedprice * (1 - l_discount)
      |           - 0.6 * p_retailprice * l_quantity) AS sum_profit
      |FROM lineitem
      |JOIN part ON p_partkey = l_partkey
      |JOIN supplier ON s_suppkey = l_suppkey
      |JOIN orders ON o_orderkey = l_orderkey
      |JOIN nation ON s_nationkey = n_nationkey
      |WHERE p_name LIKE '%widget%'
      |GROUP BY n_name, o_year""".stripMargin)) { (spark, dir) =>
    val t = Tables(spark, dir)
    t.lineitem
      .join(broadcast(t.part.filter(col("p_name").like("%widget%"))
        .select("p_partkey", "p_retailprice")), col("p_partkey") === col("l_partkey"))
      .join(broadcast(t.supplier.select("s_suppkey", "s_nationkey")),
        col("s_suppkey") === col("l_suppkey"))
      .join(t.orders.select("o_orderkey", "o_orderdate"),
        col("o_orderkey") === col("l_orderkey"))
      .join(broadcast(t.nation), col("s_nationkey") === col("n_nationkey"))
      .withColumn("o_year", year(col("o_orderdate")).cast("int"))
      .groupBy(col("n_name").as("nation"), col("o_year"))
      .agg(sum(revenue - lit(0.6) * col("p_retailprice") * col("l_quantity"))
        .as("sum_profit"))
  }

  /** TPC-H Q11 (important stock), adapted: a part's "stock value" for
    * one nation is its suppliers' lineitem revenue. Scale: the nation
    * filter rides the broadcast supplier dim into the fact scan's join;
    * the threshold is a 1-row aggregate OF the grouped result, reused
    * via a broadcast scalar bind, so the fact is scanned once. */
  private val q11t = QueryDef("tpch_q11", Some(
    // The stock value is summed in exact integer CENTS: a double sum's
    // result depends on accumulation order, and with 6+ integer digits
    // the oracle's 6-sig-digit canonicalization can land the two
    // engines on different sides of a rounding boundary. Integer sums
    // are order-independent, so value and threshold agree bit-for-bit.
    """WITH natl AS (
      |  SELECT l_partkey,
      |         sum(cast(round(l_extendedprice * 100) AS BIGINT)) AS cents
      |  FROM lineitem JOIN supplier ON s_suppkey = l_suppkey
      |  JOIN nation ON n_nationkey = s_nationkey
      |  WHERE n_name = 'NATION_3'
      |  GROUP BY 1)
      |SELECT l_partkey AS ps_partkey, cents / 100.0 AS part_value
      |FROM natl
      |WHERE cents > (SELECT sum(cents) * 0.001 FROM natl)""".stripMargin)) { (spark, dir) =>
    val t = Tables(spark, dir)
    // NATION_3 has suppliers at sf0.001 too — an empty nation would
    // AQE-collapse the whole plan to EmptyRelation at smoke scale
    val natSupp = t.supplier
      .join(broadcast(t.nation.filter(col("n_name") === "NATION_3")),
        col("s_nationkey") === col("n_nationkey"))
      .select("s_suppkey")
    val natl = t.lineitem.select("l_partkey", "l_suppkey", "l_extendedprice")
      .join(broadcast(natSupp), col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("l_partkey").as("ps_partkey"))
      .agg(sum(round(col("l_extendedprice") * 100).cast("long")).as("cents"))
    // 1-row scalar bind, same declared broadcast-NLJ shape as tpch_q22
    val thresh = natl.agg((sum("cents") * 0.001).as("thr"))
    natl.crossJoin(broadcast(thresh))
      .filter(col("cents") > col("thr"))
      .select(col("ps_partkey"), (col("cents") / 100.0).as("part_value"))
  }

  /** TPC-H Q16 (part/supplier relationship counts), adapted: the
    * relationship IS the derived distinct (part, supplier) pair set, and
    * the complaint exclusion becomes negative account balance. Scale:
    * the distinct pair-set is a map-side-combined aggregate of two fact
    * columns; part broadcasts; the excluded-supplier set (a handful of
    * rows) broadcasts as an anti-join; count(DISTINCT) expands once over
    * the pruned pairs. */
  private val q16t = QueryDef("tpch_q16", Some(
    """SELECT p_brand, p_type, p_size, count(DISTINCT l_suppkey) AS supplier_cnt
      |FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) ps
      |JOIN part ON p_partkey = l_partkey
      |WHERE p_brand <> 'Brand#23' AND p_type <> 'PROMO'
      |  AND p_size IN (1,4,7,10,14,19,22,25)
      |  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
      |GROUP BY p_brand, p_type, p_size""".stripMargin)) { (spark, dir) =>
    val t = Tables(spark, dir)
    val pairs = t.lineitem.select("l_partkey", "l_suppkey").distinct()
    val keptParts = t.part.filter(col("p_brand") =!= "Brand#23"
      && col("p_type") =!= "PROMO"
      && col("p_size").isin(1, 4, 7, 10, 14, 19, 22, 25))
      .select("p_partkey", "p_brand", "p_type", "p_size")
    pairs
      .join(broadcast(t.supplier.filter(col("s_acctbal") < 0).select("s_suppkey")),
        col("l_suppkey") === col("s_suppkey"), "left_anti")
      .join(broadcast(keptParts), col("p_partkey") === col("l_partkey"))
      .groupBy("p_brand", "p_type", "p_size")
      .agg(countDistinct("l_suppkey").as("supplier_cnt"))
  }

  /** TPC-H Q20 (potential part promotion), adapted: availqty is not in
    * the schema, so a supplier qualifies by having shipped more than a
    * threshold of some qualifying part in the year — the same nested
    * semi-join chain (nation → supplier ⋉ (per-(supp, part) HAVING over
    * name-filtered lines)). Scale: part's name filter broadcasts into
    * the fact scan, the HAVING aggregate is map-side combined, and the
    * supplier probe is a left-semi join against that small key set. */
  private val q20t = QueryDef("tpch_q20", Some(
    """SELECT s_name, s_acctbal
      |FROM supplier
      |JOIN nation ON s_nationkey = n_nationkey
      |WHERE n_name = 'NATION_3'
      |  AND s_suppkey IN (
      |    SELECT l_suppkey FROM lineitem
      |    JOIN part ON p_partkey = l_partkey
      |    WHERE p_name LIKE 'small%'
      |      AND l_shipdate >= '1997-01-01' AND l_shipdate < '1998-01-01'
      |    GROUP BY l_suppkey, l_partkey
      |    HAVING sum(l_quantity) > 30)""".stripMargin)) { (spark, dir) =>
    val t = Tables(spark, dir)
    val heavy = t.lineitem
      .filter(col("l_shipdate") >= "1997-01-01" && col("l_shipdate") < "1998-01-01")
      .join(broadcast(t.part.filter(col("p_name").like("small%")).select("p_partkey")),
        col("p_partkey") === col("l_partkey"))
      .groupBy("l_suppkey", "l_partkey")
      .agg(sum("l_quantity").as("qty"))
      .filter(col("qty") > 30)
      .select("l_suppkey")
    t.supplier
      .join(broadcast(t.nation.filter(col("n_name") === "NATION_3")),
        col("s_nationkey") === col("n_nationkey"))
      .join(heavy, col("s_suppkey") === col("l_suppkey"), "left_semi")
      .select("s_name", "s_acctbal")
  }

  val defs: Seq[QueryDef] = Seq(q1t, q2t, q3, q4t, q5, q6, q7, q8t, q9t, q10,
    q11t, q12t, q13t, q14t, q15t, q16t, q17t, q18, q19t, q20t, q21t, q22t)
}
