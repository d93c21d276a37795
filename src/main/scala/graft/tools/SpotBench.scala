package graft.tools
object SpotBench {
  def main(args: Array[String]): Unit = {
    val spark = graft.Engine.session("spot", "32")
    val dir = "/root/testdata/sf0.1"
    for (n <- Seq("e1_ngram_jaccard", "e1_minhash_lsh", "txt_ngrams")) {
      val q = graft.queries.Registry.byName(n)
      def run() = { val t0=System.nanoTime(); q.run(spark, dir).write.format("noop").mode("overwrite").save(); (System.nanoTime()-t0)/1e9 }
      run(); println(f"SPOT $n%-20s ${Seq(run(), run()).min}%8.2fs")
    }
    spark.stop()
  }
}
