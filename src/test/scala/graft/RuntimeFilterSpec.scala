package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Runtime bloom-filter semi-join reduction (Spark's InjectRuntimeFilter
  * rule): with a selective non-broadcastable build side, the fact side
  * of a shuffle join gains a `might_contain(key)` probe that prunes
  * rows BEFORE the exchange. On by default in Spark 4 but gated behind
  * a 10 GB application-side scan threshold — this spec lowers the gate
  * and pins that the injection actually fires for the engine's fact
  * joins, so a conf regression (or a Spark upgrade changing the rule's
  * preconditions) surfaces here and not in a 100 TB profile.
  */
class RuntimeFilterSpec extends AnyFunSuite {
  private lazy val spark = TestSession.spark

  test("selective shuffle join injects a bloom might_contain on the fact side") {
    val t = graft.sources.Tables(spark, TestSession.sf0001)
    val prev = spark.conf.getOption("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set(
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0")
    spark.conf.set(
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold", "64MB")
    try {
      val sel = t.orders.filter(col("o_orderpriority") === "1-URGENT")
      val df = t.lineitem.join(sel, col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n"))
      val optimized = df.queryExecution.optimizedPlan.toString
      assert(optimized.contains("might_contain"),
        s"no runtime bloom filter injected:\n$optimized")
      // and the filtered result is still correct
      assert(df.collect().map(_.getString(0)).toSeq == Seq("1-URGENT"))
    } finally {
      prev match {
        case Some(v) => spark.conf.set("spark.sql.autoBroadcastJoinThreshold", v)
        case None => spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      }
      spark.conf.unset(
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold")
      spark.conf.unset(
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold")
    }
  }
}
