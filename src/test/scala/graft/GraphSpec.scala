package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ops.Graph

class GraphSpec extends AnyFunSuite {
  private lazy val spark = TestSession.spark
  import spark.implicits._

  test("pageRank: conserves total rank, star center dominates, matches closed form") {
    // star: center 0 — leaves 1..4
    val star = (1L to 4L).map(l => (0L, l)).toDF("src", "dst")
    val r = Graph.pageRank(star, "src", "dst", iters = 60).collect()
      .map(x => x.getLong(0) -> x.getDouble(1)).toMap
    assert(r.size == 5)
    assert(math.abs(r.values.sum - 1.0) < 1e-9, s"rank not conserved: ${r.values.sum}")
    // fixed point: leaf x = 0.03 + 0.85·c/4, center c = 0.03 + 0.85·4x
    // => c = (0.03 + 3.4·0.03) / (1 − 3.4·0.2125) = 0.132 / 0.2775
    val cExpect = 0.132 / 0.2775
    // power iteration converges at rate d=0.85: 0.85^60 ≈ 6e-5
    assert(math.abs(r(0L) - cExpect) < 1e-4, s"center ${r(0L)} != $cExpect")
    (1L to 4L).foreach(l => assert(r(l) < r(0L)))
    assert((1L to 4L).map(r).distinct.size == 1, "leaves must tie exactly")
  }

  test("pageRank: duplicate and reverse input edges do not change the graph") {
    val clean = Seq((1L, 2L), (2L, 3L)).toDF("src", "dst")
    val noisy = Seq((1L, 2L), (2L, 1L), (1L, 2L), (2L, 3L), (3L, 2L)).toDF("src", "dst")
    val a = Graph.pageRank(clean, "src", "dst", iters = 10).collect()
      .map(x => x.getLong(0) -> x.getDouble(1)).toMap
    val b = Graph.pageRank(noisy, "src", "dst", iters = 10).collect()
      .map(x => x.getLong(0) -> x.getDouble(1)).toMap
    assert(a.keySet == b.keySet)
    a.foreach { case (k, v) => assert(math.abs(v - b(k)) < 1e-12, s"node $k: $v vs ${b(k)}") }
  }

  test("pageRank: higher-degree nodes rank higher on a skewed graph") {
    // hub 100 touches 20 nodes; 200 touches 2
    val edges = ((1L to 20L).map(i => (100L, i)) ++ Seq((200L, 1L), (200L, 2L)))
      .toDF("src", "dst")
    val r = Graph.pageRank(edges, "src", "dst", iters = 15).collect()
      .map(x => x.getLong(0) -> x.getDouble(1)).toMap
    assert(r(100L) > r(200L) * 3, s"hub ${r(100L)} vs minor ${r(200L)}")
    assert(math.abs(r.values.sum - 1.0) < 1e-9)
  }

  test("pageRank: reliable checkpoints give bit-identical ranks (durability-only switch)") {
    // the reliable=true path writes each round's state to the reliable
    // checkpoint dir (survives executor loss) instead of pinning
    // executor-local blocks; the arithmetic is untouched, so ranks are
    // bit-identical — the flag trades per-round IO for fault tolerance
    val dir = java.nio.file.Files.createTempDirectory("graft-pr-ck").toString
    try {
      spark.sparkContext.setCheckpointDir(dir)
      val rnd = new scala.util.Random(7)
      val edges = (0 until 400)
        .map(_ => (rnd.nextInt(60).toLong, rnd.nextInt(60).toLong))
        .filter(e => e._1 != e._2).toDF("src", "dst")
      def canon(rows: Array[org.apache.spark.sql.Row]) =
        rows.map(x => (x.getLong(0), x.getDouble(1))).sortBy(_._1).toSeq
      val local = canon(Graph.pageRank(edges, "src", "dst", iters = 8).collect())
      val durable = canon(Graph.pageRank(edges, "src", "dst", iters = 8,
        reliable = true).collect())
      assert(local == durable,
        "reliable checkpointing changed pageRank results")
    } finally
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
  }

  test("pageRank: broadcastRanks gives bit-identical ranks and a re-readable result") {
    val rnd = new scala.util.Random(13)
    val edges = (0 until 300)
      .map(_ => (rnd.nextInt(50).toLong, rnd.nextInt(50).toLong))
      .filter(e => e._1 != e._2).toDF("src", "dst")
    def canon(rows: Array[org.apache.spark.sql.Row]) =
      rows.map(x => (x.getLong(0), x.getDouble(1))).sortBy(_._1).toSeq
    val narrow = canon(Graph.pageRank(edges, "src", "dst", iters = 8).collect())
    val bcDf = Graph.pageRank(edges, "src", "dst", iters = 8, broadcastRanks = true)
    assert(canon(bcDf.collect()) == narrow,
      "broadcastRanks changed pageRank results")
    // the returned DataFrame must stay consumable after the call — the
    // final round's broadcast may not have been destroyed on success
    // (a destroyed broadcast would fail any recompute of the last map
    // stage instead of degrading); read it a second time
    assert(canon(bcDf.collect()) == narrow, "second read differs")
  }

  test("connectedComponents: reliable checkpoints give identical labels, star path included") {
    val dir = java.nio.file.Files.createTempDirectory("graft-cc-ck").toString
    try {
      spark.sparkContext.setCheckpointDir(dir)
      // a 40-node chain forces the propagation → star-contraction
      // switch (diameter ≫ switchAfter), covering both loops
      val chain = (0L until 39L).map(i => (i, i + 1)).toDF("src", "dst")
      def canon(df: org.apache.spark.sql.DataFrame) =
        df.collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1).toSeq
      assert(canon(graft.ops.Dedup.connectedComponents(chain, "src", "dst")) ==
        canon(graft.ops.Dedup.connectedComponents(chain, "src", "dst",
          reliable = true)),
        "reliable checkpointing changed connected-components labels")
    } finally
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
  }
}
