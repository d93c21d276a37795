package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.ops.{Mix, Pack}

class PackSpec extends AnyFunSuite {
  private lazy val spark = TestSession.spark

  private def docs(counts: (Long, Long)*) = {
    import spark.implicits._
    counts.toSeq.toDF("doc_id", "n")
  }

  test("sequencePack splits docs exactly at capacity boundaries") {
    val segs = Pack.sequencePack(docs((1L, 3L), (2L, 5L), (3L, 4L)), "doc_id", "n", capacity = 4L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .sortBy(s => (s._1, s._2)).toSeq
    // stream: doc1 [0,3), doc2 [3,8), doc3 [8,12); packs of 4
    assert(segs == Seq(
      (1L, 0L, 0L, 0L, 3L),             // doc1 fills pack0[0..3)
      (2L, 0L, 3L, 0L, 1L),             // doc2 head ends pack0
      (2L, 1L, 0L, 1L, 4L),             // doc2 tail fills pack1
      (3L, 2L, 0L, 0L, 4L)),            // doc3 = pack2
      s"segments: $segs")
  }

  test("sequencePack invariants: per-doc coverage, full packs, empty docs skipped") {
    import spark.implicits._
    val d = docs((0 until 200).map(i => (i.toLong, (i % 7).toLong)): _*)
    val segs = Pack.sequencePack(d, "doc_id", "n", capacity = 16L).cache()
    // every token of every non-empty doc is covered exactly once, in order
    val perDoc = segs.groupBy("doc_id").agg(sum("seg_len").as("s"), min("doc_off").as("o"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    d.collect().foreach { r =>
      val (id, n) = (r.getLong(0), r.getLong(1))
      if (n == 0) assert(!perDoc.contains(id), s"empty doc $id emitted segments")
      else assert(perDoc(id) == ((n, 0L)), s"doc $id coverage ${perDoc.get(id)} != $n")
    }
    // every pack except the last is exactly full
    val fills = Pack.packReport(segs, 16L).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).sortBy(_._1)
    assert(fills.dropRight(1).forall(_._2 == 16L), s"non-full interior pack: ${fills.toSeq}")
  }

  test("sequencePack output is independent of the partition count") {
    import spark.implicits._
    val d = docs((0 until 500).map(i => (i.toLong, (i % 11 + 1).toLong)): _*)
    def run(p: Int) = Pack.sequencePack(d, "doc_id", "n", capacity = 64L, numPartitions = p)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toSet
    val a = run(3)
    val b = run(17)
    assert(a == b, s"partitioning changed the packing: ${(a -- b).take(3)}")
  }

  test("tokenBudgetSample: budget respected, priority order, partition-invariant") {
    import spark.implicits._
    val d = docs((0 until 300).map(i => (i.toLong, (i % 13 + 1).toLong)): _*)
    def run(p: Int) = Pack.tokenBudgetSample(d, "doc_id", "n", budget = 500L, numPartitions = p)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val a = run(4)
    assert(a == run(19), "partitioning changed the sample")
    // every kept doc started strictly under budget; the kept set is a
    // prefix of the (hash, id) priority order
    assert(a.forall(_._3 < 500L))
    val keptIds = a.map(_._1)
    val pri = (0 until 300).map(i => (graft.ops.Similarity.mix32(i + 1L), i.toLong)).sorted
    var cum = 0L
    val want = pri.takeWhile { case (_, id) =>
      val keep = cum < 500L; cum += (id % 13 + 1); keep
    }.map(_._2).toSet
    assert(keptIds == want, s"sample != priority prefix: ${(keptIds -- want).take(3)} / ${(want -- keptIds).take(3)}")
  }

  test("capPerStratum keeps at most cap rows per stratum, deterministically") {
    import spark.implicits._
    val d = (0 until 1000).map(i => (i.toLong, s"src${i % 7}")).toDF("doc_id", "source")
    val capped = graft.ops.Mix.capPerStratum(d, "doc_id", "source", cap = 20)
    val bySrc = capped.groupBy("source").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(bySrc.values.forall(_ == 20L), s"caps: $bySrc")
    val again = graft.ops.Mix.capPerStratum(d.repartition(11), "doc_id", "source", cap = 20)
      .collect().map(r => r.getLong(0)).toSet
    assert(again == capped.collect().map(r => r.getLong(0)).toSet, "survivors not stable")
  }

  test("denseIds: contiguous 0..N-1 in order, partition-invariant") {
    import spark.implicits._
    // non-contiguous, shuffled input ids
    val d = scala.util.Random.shuffle((0 until 400).map(i => i.toLong * 7 + 3)).toDF("doc_id")
    def run(p: Int) = Pack.denseIds(d, "doc_id", numPartitions = p)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq.sortBy(_._2)
    val a = run(5)
    assert(a == run(23), "partitioning changed the numbering")
    assert(a.map(_._2) == (0L until 400L), s"ids not dense: ${a.take(5)}")
    assert(a.map(_._1) == a.map(_._1).sorted, "dense order != id order")
  }

  test("hashSplit is deterministic, complete, and near the requested proportions") {
    import spark.implicits._
    val d = (0 until 20000).map(_.toLong).toDF("doc_id")
    val s1 = Mix.hashSplit(d, "doc_id", Seq(("train", 9000), ("val", 9500), ("test", 10000)))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val s2 = Mix.hashSplit(d.repartition(7), "doc_id",
      Seq(("train", 9000), ("val", 9500), ("test", 10000)))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(s1 == s2, "split assignment not stable across partitionings")
    val shares = s1.values.groupBy(identity).view.mapValues(_.size / 20000.0).toMap
    assert(math.abs(shares("train") - 0.90) < 0.02, s"shares: $shares")
    assert(math.abs(shares("val") - 0.05) < 0.01, s"shares: $shares")
    assert(math.abs(shares("test") - 0.05) < 0.01, s"shares: $shares")
    // matches the JVM mix32 reference bit-for-bit
    s1.take(100).foreach { case (id, split) =>
      val b = graft.ops.Similarity.mix32(id + 1) % 10000
      val want = if (b < 9000) "train" else if (b < 9500) "val" else "test"
      assert(split == want, s"id $id: col-expr $split != jvm $want")
    }
  }

  test("epochShuffle: a dense permutation, seed-sensitive, partition-invariant") {
    import spark.implicits._
    val ids = (0L until 997L).toDF("id")
    val s1 = Pack.epochShuffle(ids, "id", seed = 1L).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // dense 0..N-1, every id present exactly once
    assert(s1.size == 997 && s1.values.toSet == (0L until 997L).toSet)
    // partition-invariant
    val s1b = Pack.epochShuffle(ids.repartition(7), "id", seed = 1L).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(s1 == s1b, "positions changed with input partitioning")
    // a different seed is a genuinely different permutation
    val s2 = Pack.epochShuffle(ids, "id", seed = 2L).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(s2.values.toSet == (0L until 997L).toSet)
    val moved = s1.count { case (id, p) => s2(id) != p }
    assert(moved > 900, s"seed change moved only $moved/997 positions")
    // and not the identity order either
    assert(s1.count { case (id, p) => id == p } < 50, "shuffle left ids nearly in place")
  }

  test("chunkWindows: overlap at seams, doc-bounded, full word coverage") {
    import spark.implicits._
    // 10 words, chunk 4, overlap 1 (stride 3): starts 0,3,6 -> last chunk
    // [6,10) len 4 reaches the end; no start-9 chunk (it adds no window)
    val d = Seq((1L, "w0 w1 w2 w3 w4 w5 w6 w7 w8 w9"), (2L, "a b")).toDF("doc_id", "text")
    val rows = Pack.chunkWindows(d, "doc_id", "text", chunkWords = 4, overlapWords = 1)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2), r.getLong(3)))
      .sortBy(t => (t._1, t._2)).toList
    assert(rows == List(
      (1L, 0, "w0 w1 w2 w3", 4L),
      (1L, 1, "w3 w4 w5 w6", 4L),
      (1L, 2, "w6 w7 w8 w9", 4L),
      (2L, 0, "a b", 2L)), s"got: $rows")
    // consecutive chunks share exactly `overlap` words at the seam
    rows.sliding(2).foreach {
      case List((d1, i1, t1, _), (d2, i2, t2, _)) if d1 == d2 && i2 == i1 + 1 =>
        assert(t1.split(' ').takeRight(1).sameElements(t2.split(' ').take(1)),
          s"seam mismatch between chunk $i1 and $i2")
      case _ =>
    }
    // every word of the doc appears in at least one chunk
    val covered = rows.filter(_._1 == 1L).flatMap(_._3.split(' ')).toSet
    assert(covered == (0 until 10).map("w" + _).toSet)
  }
}
