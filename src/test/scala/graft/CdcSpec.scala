package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ops.Cdc

class CdcSpec extends AnyFunSuite {
  private lazy val spark = TestSession.spark
  import spark.implicits._

  private def target = Seq(
    (1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0)
  ).toDF("k", "v", "x")

  test("upsert replaces, insert appends, delete vanishes") {
    val changes = Seq(
      (2L, "b2", 21.0, 1L, false),  // update
      (3L, "c", 30.0, 1L, true),    // delete
      (9L, "new", 90.0, 1L, false)  // insert
    ).toDF("k", "v", "x", "seq", "del")
    val got = Cdc.mergeUpsert(target, changes, Seq("k"), "seq", "del")
      .orderBy("k").as[(Long, String, Double)].collect().toSeq
    assert(got == Seq((1L, "a", 10.0), (2L, "b2", 21.0), (9L, "new", 90.0)))
  }

  test("latest sequence wins, including delete-then-reinstate") {
    val changes = Seq(
      (1L, "v1", 11.0, 1L, false),
      (1L, "v2", 12.0, 2L, false),  // later version wins
      (2L, "gone", 0.0, 1L, true),
      (2L, "back", 22.0, 2L, false) // reinstated after delete
    ).toDF("k", "v", "x", "seq", "del")
    val got = Cdc.mergeUpsert(target, changes, Seq("k"), "seq", "del")
      .orderBy("k").as[(Long, String, Double)].collect().toSeq
    assert(got == Seq((1L, "v2", 12.0), (2L, "back", 22.0), (3L, "c", 30.0)))
  }

  test("delete as the latest version removes an updated row") {
    val changes = Seq(
      (1L, "v1", 11.0, 1L, false),
      (1L, "v1", 11.0, 2L, true)
    ).toDF("k", "v", "x", "seq", "del")
    val got = Cdc.mergeUpsert(target, changes, Seq("k"), "seq", "del")
      .orderBy("k").as[(Long, String, Double)].collect().toSeq
    assert(got == Seq((2L, "b", 20.0), (3L, "c", 30.0)))
  }

  test("composite keys and an empty change batch") {
    val t2 = Seq((1L, "x", 1.0), (1L, "y", 2.0)).toDF("k1", "k2", "v")
    val empty = Seq.empty[(Long, String, Double, Long, Boolean)]
      .toDF("k1", "k2", "v", "seq", "del")
    assert(Cdc.mergeUpsert(t2, empty, Seq("k1", "k2"), "seq", "del")
      .count() == 2)
    val ch = Seq((1L, "y", 9.0, 1L, false)).toDF("k1", "k2", "v", "seq", "del")
    val got = Cdc.mergeUpsert(t2, ch, Seq("k1", "k2"), "seq", "del")
      .orderBy("k2").as[(Long, String, Double)].collect().toSeq
    assert(got == Seq((1L, "x", 1.0), (1L, "y", 9.0)))
  }

  test("snapshot side is not shuffled: anti-join broadcasts the change keys") {
    val changes = Seq((2L, "b2", 21.0, 1L, false)).toDF("k", "v", "x", "seq", "del")
    val plan = Cdc.mergeUpsert(target, changes, Seq("k"), "seq", "del")
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") && plan.contains("LeftAnti"),
      s"expected broadcast anti-join, got:\n$plan")
  }
}
