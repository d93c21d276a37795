package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.examples.PipelineDemo

class PipelineDemoSpec extends AnyFunSuite {
  private lazy val spark = TestSession.spark

  test("end-to-end pipeline composes: quality -> LM -> dedup -> near-dup -> decontaminate -> leakage scan") {
    val r = PipelineDemo.run(spark, TestSession.sf0001)
    val kept = r.kept.count()
    assert(kept > 0 && kept <= 500)
    // near-dup removal dropped one doc per pair (pairs may be empty at sf0.001)
    val dropped = r.nearDupPairs.select("id_b").distinct().count()
    assert(kept == r.kept.select("doc_id").distinct().count()) // still unique
    assert(500L - kept >= dropped - 1) // quality + LM + dedup + decontamination account for the rest
    // no kept doc may still overlap the benchmark set at the drop threshold
    val keptContam = graft.ops.Contamination.contaminatedIds(
      r.kept, graft.sources.Tables(spark, TestSession.sf0001).documents
        .filter(org.apache.spark.sql.functions.col("doc_id") % 101 === 0),
      "doc_id", "text", minHits = 5L)
      .filter(org.apache.spark.sql.functions.col("doc_id") % 101 =!= 0)
    assert(keptContam.isEmpty, "contaminated doc survived the pipeline")
    r.leakage.collect() // runs without error; may be empty
    // layout stages: every kept doc gets exactly one split; the train
    // slice packs into full 1024-token windows (last may be partial)
    import org.apache.spark.sql.functions._
    assert(r.split.count() == r.split.select("doc_id").distinct().count())
    assert(r.split.filter(col("split").isNull).isEmpty, "doc without a split")
    val fills = graft.ops.Pack.packReport(r.packs, 1024L)
      .orderBy("pack_id").collect().map(_.getLong(2))
    assert(fills.nonEmpty && fills.dropRight(1).forall(_ == 1024L),
      s"interior pack not full: ${fills.toSeq}")
  }
}
