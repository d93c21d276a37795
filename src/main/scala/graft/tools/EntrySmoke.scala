package graft.tools
object EntrySmoke {
  def main(args: Array[String]): Unit = {
    val spark = graft.Engine.session("entry-smoke", "4")
    val df = graft.SparkEntry.entry(spark)
    val n = df.count()
    println(s"ENTRY_ROWS=$n")
    df.show(5)
    spark.stop()
  }
}
