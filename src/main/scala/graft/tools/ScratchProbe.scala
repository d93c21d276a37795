package graft.tools

import org.apache.spark.sql.functions._

object ScratchProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.Engine.session("scratch")
    val sf = "/root/testdata/sf0.001"
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
    val ord = spark.read.parquet(s"$sf/orders.parquet")
    val q = li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n"), sum("l_quantity").as("s"))
    println(q.queryExecution.optimizedPlan)
    spark.stop()
  }
}
