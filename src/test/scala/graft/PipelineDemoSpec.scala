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
  }
}
