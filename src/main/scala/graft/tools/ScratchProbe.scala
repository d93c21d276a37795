package graft.tools

import org.apache.spark.sql.functions._

object ScratchProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.Engine.session("scratch")
    val sf = "/root/testdata/sf0.001"
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
    val q = li.rollup("l_returnflag", "l_linestatus")
      .agg(count(lit(1)).as("n"), sum("l_quantity").as("s"))
    println("=== rollup optimized ===")
    println(q.queryExecution.optimizedPlan.treeString)
    spark.stop()
  }
}
