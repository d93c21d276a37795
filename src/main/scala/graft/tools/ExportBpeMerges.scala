package graft.tools

/** Regenerates the committed BPE merge-table fixture
  * (`fixtures/bpe_merges_sf001.csv`) by training on the sf0.01
  * documents corpus with the exact `txt_bpe` query parameters
  * (numMerges=60, minWordFreq=2).
  *
  * The fixture is the bridge of the txt_bpe two-stage oracle: training
  * is data-dependent iteration (not SQL-expressible) and stays pinned
  * by BpeSpec's reference-implementation parity; ENCODING with a fixed
  * merge table IS SQL-expressible, so the DuckDB oracle reads this CSV
  * and replays greedy-rank merging per word — giving `txt_bpe` a full
  * hash-checked oracle at the driver's sf0.01 verify scale. Training
  * is deterministic (count DESC, pair ASC tie-break), so the fixture
  * only changes if the algorithm or the corpus does; BpeSpec asserts
  * freshness against a live training run.
  *
  * Usage: runMain graft.tools.ExportBpeMerges [sfDir] [outCsv]
  */
object ExportBpeMerges {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val out = args.lift(1).getOrElse("fixtures/bpe_merges_sf001.csv")
    val spark = graft.Engine.session("export-bpe-merges", "8")
    val docs = graft.sources.Tables(spark, sfDir).documents
    val merges = graft.ops.Bpe.train(docs, "text", numMerges = 60, minWordFreq = 2)
    // the fixture is written unquoted and parsed by a plain split on
    // both sides (DuckDB read_csv with a fixed 3-column schema;
    // BpeSpec's staleness check) — fail LOUDLY if the corpus ever
    // evolves symbols that would silently corrupt either parse or the
    // oracle's chr(30)/chr(31) symbol brackets
    merges.foreach { case (a, b) =>
      val bad = "\",\n\r"
      require(!(a + b).exists(bad.contains(_)),
        s"merge symbol needs CSV quoting or clashes with the oracle delimiters: ($a,$b) — " +
          "teach ExportBpeMerges/BpeSpec/the txt_bpe oracle proper escaping first")
    }
    val f = new java.io.File(out)
    Option(f.getParentFile).foreach(_.mkdirs())
    val w = new java.io.PrintWriter(f, "UTF-8")
    try {
      w.println("rank,a,b")
      merges.zipWithIndex.foreach { case ((a, b), i) => w.println(s"$i,$a,$b") }
    } finally w.close()
    println(s"BPE_MERGES=${merges.length} -> $out")
    spark.stop()
  }
}
