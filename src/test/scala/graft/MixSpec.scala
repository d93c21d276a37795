package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.ops.Mix

class MixSpec extends AnyFunSuite {
  private lazy val spark = TestSession.spark

  test("fractionsFor caps at 1.0 and realizes target ratios") {
    val f = Mix.fractionsFor(
      counts = Map("web" -> 8000L, "books" -> 1000L, "code" -> 1000L),
      targetShares = Map("web" -> 0.5, "books" -> 0.25, "code" -> 0.25))
    // books/code are the binding strata (need 1000/0.25 = 4000 total):
    // web samples 2000/8000, books+code keep everything
    assert(f("books") == 1.0 && f("code") == 1.0)
    assert(math.abs(f("web") - 0.25) < 1e-9)
  }

  test("toProportions approximates target mix on documents and is deterministic") {
    val docs = graft.sources.Tables(spark, TestSession.sf0001).documents
    val target = Map("en" -> 0.6, "de" -> 0.2, "fr" -> 0.2)
    val mixed = Mix.toProportions(docs, "lang", target)
    val got = mixed.groupBy("lang").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got.keySet == target.keySet) // other langs dropped
    val total = got.values.sum.toDouble
    target.foreach { case (lang, share) =>
      val actual = got(lang) / total
      assert(math.abs(actual - share) < 0.12,
        s"$lang: got share $actual, want ~$share (counts $got)")
    }
    // deterministic for the fixed seed
    val again = Mix.toProportions(docs, "lang", target).groupBy("lang").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(again == got)
  }

  test("temperatureSample flattens shares to count^0.5, exact targets, deterministic") {
    import spark.implicits._
    // heavily skewed strata: a=900, b=90, c=10 (N=1000)
    val rows = ((0 until 900).map(i => (i.toLong, "a")) ++
      (900 until 990).map(i => (i.toLong, "b")) ++
      (990 until 1000).map(i => (i.toLong, "c"))).toDF("id", "src")
    val out = Mix.temperatureSample(rows, "id", "src").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val got = out.groupBy(_._2).view.mapValues(_.length).toMap
    // w = floor(sqrt): a=30, b=9, c=3 (ΣW=42); t_s = min(c_s, 1000*w/42)
    assert(got == Map("a" -> 714, "b" -> 90, "c" -> 10), s"targets off: $got")
    // the flattening: head stratum is cut, tail strata keep everything
    assert(got("b") == 90 && got("c") == 10, "tail strata must not be downsampled")
    // deterministic: same survivors on rerun and under different partitioning
    val again = Mix.temperatureSample(rows.repartition(7), "id", "src").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    assert(out.toSet == again.toSet, "survivors changed across partitionings")
  }

  test("temperatureSample accepts a non-string stratum column") {
    import spark.implicits._
    val rows = ((0 until 900).map(i => (i.toLong, 1)) ++
      (900 until 990).map(i => (i.toLong, 2)) ++
      (990 until 1000).map(i => (i.toLong, 3))).toDF("id", "src")
    val got = Mix.temperatureSample(rows, "id", "src").collect()
      .map(r => (r.getLong(0), r.getInt(1)))
    val byStratum = got.groupBy(_._2).view.mapValues(_.length).toMap
    // same targets as the string-stratum test: the driver-side model
    // casts to string internally, output keeps the original type
    assert(byStratum == Map(1 -> 714, 2 -> 90, 3 -> 10), s"targets off: $byStratum")
  }

  test("weightedSample: inclusion tracks weight, deterministic, partition-invariant") {
    import spark.implicits._
    // 1000 heavy rows (w=100) vs 9000 light (w=1): heavy carries ~92%
    // of total weight, so a 500-draw sample is dominated by heavy
    val rows = (0 until 10000)
      .map(i => (i.toLong, if (i < 1000) 100L else 1L)).toDF("id", "w")
    val got = Mix.weightedSample(rows, "id", "w", 500).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got.size == 500)
    val heavy = got.count(_._2 == 100L)
    assert(heavy > 300, s"weighting ineffective: $heavy/500 heavy")
    // deterministic: same seed → same sample, bit for bit
    assert(Mix.weightedSample(rows, "id", "w", 500).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq == got)
    // partition-invariant: membership is a pure function of (id, seed)
    assert(Mix.weightedSample(rows.repartition(13), "id", "w", 500).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted == got.sorted)
    // another seed draws a genuinely different sample
    val reseeded = Mix.weightedSample(rows, "id", "w", 500, seed = 7L).collect()
      .map(_.getLong(0)).toSet
    assert(reseeded != got.map(_._1).toSet)
    // zero/negative weights are excluded outright
    val withZero = (0 until 100).map(i => (i.toLong, if (i % 2 == 0) 0L else 1L))
      .toDF("id", "w")
    assert(Mix.weightedSample(withZero, "id", "w", 100).collect()
      .forall(_.getLong(1) > 0))
  }
}
