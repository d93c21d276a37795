package graft.tools
import org.apache.spark.sql.SparkSession
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.001"
    for (t <- Seq("region","nation","customer","supplier","part","orders","lineitem","events","documents","embeddings")) {
      try {
        val df = spark.read.parquet(s"$dir/$t.parquet")
        println(s"== $t: ${df.count()} rows")
        df.printSchema()
        df.show(3, 60)
      } catch { case e: Throwable => println(s"== $t FAILED: ${e.getMessage.take(300)}") }
    }
    spark.stop()
  }
}
