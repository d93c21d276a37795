package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Composite analytical queries in the classic TPC-H shapes (Q3/Q5/Q6/
  * Q7/Q10/Q18, adapted to the driver's column subset — no partsupp, no
  * shipmode/commitdate, synthetic NATION_n names). Each is a multi-way
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

  val defs: Seq[QueryDef] = Seq(q3, q5, q6, q7, q10, q18)
}
