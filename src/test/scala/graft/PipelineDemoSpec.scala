package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.examples.PipelineDemo

class PipelineDemoSpec extends AnyFunSuite {
  private lazy val spark = TestSession.spark

  test("end-to-end pipeline composes: quality -> dedup -> near-dup -> leakage scan") {
    val r = PipelineDemo.run(spark, TestSession.sf0001)
    val kept = r.kept.count()
    assert(kept > 0 && kept <= 500)
    // near-dup removal dropped one doc per pair (pairs may be empty at sf0.001)
    val dropped = r.nearDupPairs.select("id_b").distinct().count()
    assert(kept == r.kept.select("doc_id").distinct().count()) // still unique
    assert(500L - kept >= dropped - 1) // quality + dedup account for the rest
    r.leakage.collect() // runs without error; may be empty
  }
}
