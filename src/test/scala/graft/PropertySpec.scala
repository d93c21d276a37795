package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.api.Flow

/** SURVEY §5.3 — algebraic laws over the Flow combinators, sampled with
  * ScalaCheck generators (fixed seeds: deterministic CI). */
class PropertySpec extends AnyFunSuite {
  private lazy val spark = TestSession.spark
  import spark.implicits._

  private val listGen = Gen.listOfN(30, Gen.chooseNum(-50, 50))

  private def samples(n: Int): Seq[List[Int]] =
    (0 until n).map(i => listGen.apply(Gen.Parameters.default, Seed(i.toLong)).getOrElse(Nil))

  test("union count = sum of counts") {
    for (xs <- samples(5)) {
      val f = Flow.fromCollection(spark, xs).union(Flow.fromCollection(spark, xs.reverse))
      assert(f.count() == 2L * xs.size)
    }
  }

  test("filter p and filter !p partition the input") {
    for (xs <- samples(5)) {
      val f = Flow.fromCollection(spark, xs)
      val p = (x: Int) => x % 3 == 0
      assert(f.filter(p).count() + f.filter(x => !p(x)).count() == xs.size)
    }
  }

  test("keyBy+count equals Scala groupBy sizes") {
    for (xs <- samples(5)) {
      val got = Flow.fromCollection(spark, xs).keyBy(_ % 5).count().collectSeq().toMap
      val want = xs.groupBy(_ % 5).view.mapValues(_.size.toLong).toMap
      assert(got == want)
    }
  }

  test("dedup (distinct) is idempotent") {
    for (xs <- samples(5)) {
      val d1 = Flow.fromDataset(Flow.fromCollection(spark, xs).ds.distinct())
      assert(d1.ds.distinct().count() == d1.count())
    }
  }

  test("map fusion: map(f).map(g) == map(f andThen g)") {
    for (xs <- samples(5)) {
      val f = (x: Int) => x + 1
      val g = (x: Int) => x * 2
      val lhs = Flow.fromCollection(spark, xs).map(f).map(g).collectSeq().sorted
      val rhs = Flow.fromCollection(spark, xs).map(f andThen g).collectSeq().sorted
      assert(lhs == rhs)
    }
  }

  test("winnowing guarantee: any shared substring of length >= k+w-1 shares a fingerprint") {
    // k=5, w=4 defaults: guarantee threshold 8 chars
    val alpha = Gen.listOfN(12, Gen.alphaLowerChar).map(_.mkString)
    val shared = Gen.listOfN(9, Gen.alphaLowerChar).map(_.mkString)
    for (i <- 0 until 20) {
      val s = shared(Gen.Parameters.default, Seed(i.toLong)).get
      val p1 = alpha(Gen.Parameters.default, Seed(1000L + i)).get
      val p2 = alpha(Gen.Parameters.default, Seed(2000L + i)).get
      val p3 = alpha(Gen.Parameters.default, Seed(3000L + i)).get
      val p4 = alpha(Gen.Parameters.default, Seed(4000L + i)).get
      val f1 = graft.ops.Dedup.winnowFingerprints(p1 + s + p2).toSet
      val f2 = graft.ops.Dedup.winnowFingerprints(p3 + s + p4).toSet
      assert((f1 & f2).nonEmpty,
        s"""9-char shared substring "$s" produced no shared fingerprint (docs "${p1 + s + p2}", "${p3 + s + p4}")""")
    }
  }

  test("zvalue2 is invertible: de-interleaving the Morton code recovers both inputs") {
    import org.apache.spark.sql.functions._
    val pair = for {
      a <- Gen.chooseNum(0L, 1023L)
      b <- Gen.chooseNum(0L, 1023L)
    } yield (a, b)
    val cases = (0 until 50).map(i => pair(Gen.Parameters.default, Seed(i.toLong)).get)
    val got = cases.toDF("a", "b")
      .select(col("a"), col("b"), graft.ops.Layout.zvalue2(col("a"), col("b"), 10).as("z"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    got.foreach { case (a, b, z) =>
      var (ra, rb) = (0L, 0L)
      for (i <- 0 until 10) {
        ra |= ((z >> (2 * i)) & 1L) << i
        rb |= ((z >> (2 * i + 1)) & 1L) << i
      }
      assert(ra == a && rb == b, s"z=$z decoded to ($ra,$rb), want ($a,$b)")
    }
  }

  test("percentile_approx within declared accuracy of exact percentile") {
    import org.apache.spark.sql.functions._
    val li = graft.sources.Tables(spark, TestSession.sf0001).lineitem
    val r = li.agg(
      expr("percentile(l_extendedprice, 0.5)").as("exact"),
      expr("percentile_approx(l_extendedprice, 0.5, 1000)").as("approx")).collect().head
    val (exact, approx) = (r.getDouble(0), r.getDouble(1))
    // accuracy=1000 → rank error <= n/1000; check the VALUE error via the
    // empirical quantile spread: approx must land within the p45..p55 band
    val band = li.agg(
      expr("percentile(l_extendedprice, 0.45)"),
      expr("percentile(l_extendedprice, 0.55)")).collect().head
    assert(approx >= band.getDouble(0) && approx <= band.getDouble(1),
      s"approx median $approx outside p45..p55 band [$band] around exact $exact")
  }

  test("canonicalizeUrl is idempotent (canon of a canon is itself)") {
    import org.apache.spark.sql.functions._
    import graft.ops.TextAnalysis
    // generated messy URLs across case/param/fragment variations
    val urls = (0 until 60).map { i =>
      s"HTTPS://WWW.Host$i.COM/Path/$i" +
        (i % 3 match {
          case 0 => s"?utm_source=a&id=$i&utm_b=c"
          case 1 => s"?id=$i&page=${i % 5}&junk=z"
          case _ => ""
        }) + (if (i % 4 == 0) "#frag" else "")
    }
    val df = urls.toDF("text")
    val once = df.select(
      TextAnalysis.canonicalizeUrl(col("text"), Seq("id", "page")).as("text"))
    val twice = once.select(
      TextAnalysis.canonicalizeUrl(col("text"), Seq("id", "page")).as("text"))
    assert(once.as[String].collect().toSeq == twice.as[String].collect().toSeq)
  }

  test("scd2Build intervals partition each key's timeline") {
    import org.apache.spark.sql.functions._
    // random change streams: per key, sorted valid_from/valid_to must
    // chain exactly (next.valid_from == prev.valid_to) with one open tail
    for (seed <- 0 until 3) {
      val rnd = new scala.util.Random(seed)
      val changes = (0 until 200).map { i =>
        (rnd.nextInt(20).toLong, f"2024-${1 + rnd.nextInt(12)}%02d-${1 + rnd.nextInt(28)}%02d-$i%03d", i)
      }.toDF("k", "ts", "payload")
      val hist = graft.ops.Cdc.scd2Build(changes, Seq("k"), Seq("ts"))
        .select("k", "ts", "valid_to", "is_current")
        .as[(Long, String, Option[String], Boolean)].collect()
        .groupBy(_._1).values
      hist.foreach { vs =>
        val sorted = vs.sortBy(_._2)
        // exactly one current version per key, and it is the last one
        assert(sorted.count(_._4) == 1 && sorted.last._4)
        // intervals chain: each valid_to equals the next valid_from
        sorted.sliding(2).foreach {
          case Array(a, b) => assert(a._3.contains(b._2),
            s"gap in key ${a._1}: ${a._3} then ${b._2}")
          case _ => ()
        }
      }
    }
  }

  test("hilbert2 is a bijection with unit steps at every bits level 2..6") {
    import org.apache.spark.sql.functions._
    for (bits <- 2 to 6) {
      val n = 1 << bits
      val cells = spark.range(n.toLong * n)
        .select((col("id") % n).as("a"), (col("id") / n).cast("long").as("b"))
        .select(col("a"), col("b"),
          graft.ops.Layout.hilbert2(col("a"), col("b"), bits).as("h"))
        .collect().map(r => (r.getLong(2), (r.getLong(0), r.getLong(1)))).sortBy(_._1)
      assert(cells.map(_._1).toSeq == (0L until n.toLong * n).toSeq, s"bits=$bits not a bijection")
      cells.sliding(2).foreach { case Array((_, (x1, y1)), (h, (x2, y2))) =>
        assert(math.abs(x1 - x2) + math.abs(y1 - y2) == 1,
          s"bits=$bits jump at $h: ($x1,$y1)->($x2,$y2)")
      }
    }
  }

  test("KMV deterministic approx-distinct lands within its statistical error bound") {
    import org.apache.spark.sql.functions._
    val got = graft.queries.Registry.byName("q12_kmv_distinct")
      .run(spark, TestSession.sf001)
      .select("l_returnflag", "kmv_est").as[(String, Long)].collect().toMap
    val exact = graft.sources.Tables(spark, TestSession.sf001).lineitem
      .groupBy("l_returnflag").agg(countDistinct("l_orderkey").as("n"))
      .as[(String, Long)].collect().toMap
    exact.foreach { case (flag, n) =>
      val est = got(flag)
      // k=64 → σ ≈ 1/sqrt(k−2) ≈ 12.7%; allow 3σ
      assert(math.abs(est - n).toDouble / n < 0.4,
        s"KMV estimate $est far from exact $n for $flag")
    }
  }

  test("seeded sample is reproducible and near the requested fraction") {
    val li = graft.sources.Tables(spark, TestSession.sf0001).lineitem
    val n = li.count()
    val s1 = li.sample(withReplacement = false, 0.1, seed = 42).count()
    val s2 = li.sample(withReplacement = false, 0.1, seed = 42).count()
    assert(s1 == s2, "same seed must give the same sample")
    assert(math.abs(s1.toDouble / n - 0.1) < 0.03, s"fraction ${s1.toDouble / n} far from 0.1")
  }
}
