package graft.tools

/** Local job-launch floor: times the BATCH equivalent of the w2 probe's
  * per-microbatch work (20k-row groupBy-sum through the noop sink, 8
  * shuffle partitions) so the streaming machinery's own cost can be read
  * as (per-batch time − this floor). */
object JobFloorProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.Engine.session("job-floor")
    spark.sparkContext.setLogLevel("WARN")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    import spark.implicits._
    val data = (0 until 20000).map(j => (j % 1000L, j.toDouble))
    def once(): Double = {
      val t0 = System.nanoTime()
      data.toDF("user_id", "value").groupBy("user_id")
        .agg(org.apache.spark.sql.functions.sum("value"))
        .write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    (0 until 3).foreach(_ => once()) // warmup
    val ts = (0 until 20).map(_ => once())
    println(f"STAGE floor: median=${ts.sorted.apply(10) * 1000}%.0f ms " +
      f"min=${ts.min * 1000}%.0f max=${ts.max * 1000}%.0f")
    Runtime.getRuntime.halt(0)
  }
}
