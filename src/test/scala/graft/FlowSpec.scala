package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.api.Flow

/** SURVEY §2.2 core transforms T1–T8 through the typed Flow facade. */
class FlowSpec extends AnyFunSuite {
  private lazy val spark = TestSession.spark
  import spark.implicits._

  test("T1 map / T3 filter / S7 collection source") {
    val out = Flow.fromCollection(spark, Seq(1, 2, 3, 4, 5))
      .map(_ * 2).filter(_ > 4).collectSeq().sorted
    assert(out == Seq(6, 8, 10))
  }

  test("T2 flatMap / T4 keyBy / T8 count (WordCount shape)") {
    val wc = Flow.fromCollection(spark, Seq("a b a", "b a"))
      .flatMap(_.split(" ")).keyBy(identity).count()
      .collectSeq().toMap
    assert(wc == Map("a" -> 3, "b" -> 2))
  }

  test("T5 keyed reduce — batch final-value semantics") {
    val out = Flow.fromCollection(spark, Seq(("k1", 1), ("k1", 2), ("k2", 5)))
      .keyBy(_._1)
      .reduce((a, b) => (a._1, a._2 + b._2))
      .map { case (k, v) => (k, v._2) }
      .collectSeq().toMap
    assert(out == Map("k1" -> 3, "k2" -> 5))
  }

  test("T5 edge cases: empty input, single element, all-equal keys") {
    assert(Flow.fromCollection(spark, Seq.empty[Int]).keyBy(_ % 2).count().count() == 0)
    assert(Flow.fromCollection(spark, Seq(7)).keyBy(_ => "k").count().collectSeq() == Seq(("k", 1L)))
    val allEq = Flow.fromCollection(spark, Seq.fill(100)(1)).keyBy(identity).count().collectSeq()
    assert(allEq == Seq((1, 100L)))
  }

  test("T6 mapPartitions (transform escape hatch)") {
    val out = Flow.fromCollection(spark, (1 to 10).toSeq)
      .mapPartitions(it => Iterator.single(it.sum))
      .collectSeq().sum
    assert(out == 55)
  }

  test("Q7 union preserves duplicates (union all semantics)") {
    val f = Flow.fromCollection(spark, Seq(1, 2))
    assert(f.union(f).count() == 4)
  }

  test("side-output split: first-match routing, no element in two outputs") {
    val f = Flow.fromCollection(spark, Seq(-3, -1, 0, 2, 4, 9))
    val outs = f.split(
      "negative" -> (_ < 0),
      "even" -> (_ % 2 == 0),   // 0,2,4 — but negatives already routed
      "small" -> (_ < 10))      // everything left: 9
    assert(outs("negative").collectSeq().sorted == Seq(-3, -1))
    assert(outs("even").collectSeq().sorted == Seq(0, 2, 4))
    assert(outs("small").collectSeq() == Seq(9))
    assertThrows[IllegalArgumentException](f.split("a" -> (_ => true), "a" -> (_ => true)))
  }

  test("splitCols: same first-match routing, predicates reach the parquet scan") {
    import org.apache.spark.sql.functions.col
    // routing parity with the typed split (including null-safety: the
    // o_comment IS NULL rows of a synthetic column route nowhere twice)
    val orders = graft.sources.Tables(spark, TestSession.sf0001).orders
    val f = new Flow(orders)
    val outs = f.splitCols(
      "high" -> (col("o_totalprice") > 200000),
      "open" -> (col("o_orderstatus") === "O"),
      "rest" -> col("o_totalprice").isNotNull)
    val n = outs.values.map(_.ds.count()).sum
    assert(n == orders.count(), s"split outputs must partition the input, got $n")
    // no element in two outputs: pairwise intersections are empty
    val high = outs("high").ds.select("o_orderkey")
    val open = outs("open").ds.select("o_orderkey")
    assert(high.intersect(open).count() == 0)
    // and the tag predicate is PUSHED to the scan — the whole point of
    // the Column variant (the typed split's lambdas are opaque)
    val plan = outs("high").ds.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("GreaterThan(o_totalprice"),
      s"predicate did not push into the scan:\n$plan")
  }

  test("T7 typed joinWith") {
    val l = Flow.fromCollection(spark, Seq((1, "a"), (2, "b")))
    val r = Flow.fromCollection(spark, Seq((1, 10.0), (3, 30.0)))
    val j = l.joinWith(r, l.ds("_1") === r.ds("_1"), "inner").collectSeq()
    assert(j == Seq(((1, "a"), (1, 10.0))))
  }

  test("multimodal REAL animated-GIF decode: frame-exact round trip, stride sampling") {
    import graft.ops.Multimodal
    import spark.implicits._
    // encode→decode round trip is pixel-exact (identity gray palette)
    val bytes = Multimodal.syntheticGif(id = 7, w = 5, h = 4, nFrames = 3)
    val frames = Multimodal.decodeGifFrames(bytes).get
    assert(frames.length == 3)
    for (f <- 0 until 3; y <- 0 until 4; x <- 0 until 5)
      assert((frames(f).getRGB(x, y) & 0xff) == (7 + 3 * f + x + 2 * y) % 256,
        s"pixel mismatch at f=$f x=$x y=$y")
    // non-GIF payloads yield None (and are dropped by videoFrameStats)
    assert(Multimodal.decodeGifFrames("not a gif".getBytes).isEmpty)
    // stride-2 sampling with maxFrames cap over a 6-frame clip: 0, 2
    val ds = Seq(Multimodal.MediaRecord(9L, "mem://v.gif", "image/gif",
      Multimodal.syntheticGif(9, 4, 2, nFrames = 6))).toDS()
    val got = Multimodal.videoFrameStats(ds, stride = 2, maxFrames = 2)
      .collect().map(v => (v.frame_idx, v.n_frames)).toSet
    assert(got == Set((0, 6), (2, 6)))
    // misuse fails loudly instead of silently decoding to None: stride=0
    // used to throw ArithmeticException inside the Try -> records dropped
    intercept[IllegalArgumentException](
      Multimodal.decodeGifSampled(bytes, stride = 0, maxFrames = 2))
    intercept[IllegalArgumentException](
      Multimodal.decodeGifSampled(bytes, stride = 1, maxFrames = 0))
  }

  test("multimodal resize stub shrinks payload, keeps record shape") {
    import graft.ops.Multimodal
    val docs = graft.sources.Tables(spark, TestSession.sf0001).documents.limit(20)
    val media = Multimodal.fromDocuments(docs)
    val resized = Multimodal.resize(media, targetW = 16, targetH = 16).collect().toSeq
    val orig = media.collect().map(r => r.id -> r.content.length).toMap
    resized.foreach { r =>
      assert(r.content.length <= orig(r.id))
      assert(r.path.endsWith("#16x16"))
    }
  }

  test("multimodal parseImageHeader reads real PNG and JPEG headers (pure JVM)") {
    import graft.ops.Multimodal
    // hand-built minimal PNG: signature + IHDR(640x360, colortype 6 = RGBA)
    def pngHeader(w: Int, h: Int, colorType: Int): Array[Byte] = {
      def be32(v: Int) = Array[Byte]((v >>> 24).toByte, (v >>> 16).toByte, (v >>> 8).toByte, v.toByte)
      Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a) ++
        be32(13) ++ "IHDR".getBytes ++ be32(w) ++ be32(h) ++
        Array[Byte](8, colorType.toByte, 0, 0, 0) ++ be32(0) // bitdepth, ct, misc, fake CRC
    }
    assert(Multimodal.parseImageHeader(pngHeader(640, 360, 6)) == Some((640, 360, 4)))
    assert(Multimodal.parseImageHeader(pngHeader(31, 7, 0)) == Some((31, 7, 1)))
    assert(Multimodal.parseImageHeader(pngHeader(16, 16, 2)) == Some((16, 16, 3)))
    // hand-built minimal JPEG: SOI, APP0 segment, then SOF0(1024x768, 3 comps)
    def be16(v: Int) = Array[Byte]((v >>> 8).toByte, v.toByte)
    val jpeg = Array[Byte](0xff.toByte, 0xd8.toByte) ++
      Array[Byte](0xff.toByte, 0xe0.toByte) ++ be16(16) ++ Array.fill[Byte](14)(0) ++ // APP0
      Array[Byte](0xff.toByte, 0xc0.toByte) ++ be16(17) ++ Array[Byte](8) ++
      be16(768) ++ be16(1024) ++ Array[Byte](3) ++ Array.fill[Byte](9)(0)
    assert(Multimodal.parseImageHeader(jpeg) == Some((1024, 768, 3)))
    // non-media bytes fall back to None (extractMeta then uses the stub)
    assert(Multimodal.parseImageHeader("plain text".getBytes).isEmpty)
    assert(Multimodal.parseImageHeader(Array[Byte]()).isEmpty)
  }

  test("multimodal extractMeta end-to-end: real headers parsed, text stubs unchanged") {
    import spark.implicits._
    import graft.ops.Multimodal
    def be32(v: Int) = Array[Byte]((v >>> 24).toByte, (v >>> 16).toByte, (v >>> 8).toByte, v.toByte)
    val png = Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a) ++
      be32(13) ++ "IHDR".getBytes ++ be32(320) ++ be32(200) ++
      Array[Byte](8, 2, 0, 0, 0) ++ be32(0)
    val txt = "some document text".getBytes("UTF-8")
    val ds = Seq(
      Multimodal.MediaRecord(1L, "mem://a.png", "image/png", png),
      Multimodal.MediaRecord(2L, "mem://b.txt", "text/plain", txt)).toDS()
    val metas = Multimodal.extractMeta(ds).collect().map(m => m.id -> m).toMap
    assert(metas(1L) == Multimodal.MediaMeta(1L, png.length, 320, 200, 3))
    val (sw, sh, sc) = Multimodal.decodeStub(txt)
    assert(metas(2L) == Multimodal.MediaMeta(2L, txt.length, sw, sh, sc))
  }

  test("multimodal REAL pixel decode: PNG and JPEG roundtrip through the JDK codec") {
    import spark.implicits._
    import graft.ops.Multimodal
    // real PNG: encode the deterministic gradient, decode, check exact sums
    val png = Multimodal.syntheticPng(5L, 32, 16)
    assert(Multimodal.parseImageHeader(png) == Some((32, 16, 3)), "real PNG header")
    val ds = Seq(Multimodal.MediaRecord(5L, "mem://g.png", "image/png", png)).toDS()
    val st = Multimodal.pixelStats(ds).collect().head
    def sumR(id: Long) = (0 until 32).map(x => (id + x) % 256).sum * 16
    def sumG(id: Long) = (0 until 16).map(y => (id + y) % 256).sum * 32
    def sumB(id: Long) = (for (x <- 0 until 32; y <- 0 until 16) yield (id + x + y) % 256).sum
    assert((st.width, st.height, st.channels) == ((32, 16, 3)))
    assert((st.sum_r, st.sum_g, st.sum_b) == ((sumR(5), sumG(5), sumB(5))),
      s"pixel sums: $st")
    // real JPEG decodes too (lossy — only dims asserted)
    val img = Multimodal.decodePixels(png).get
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpg", bos)
    val jst = Multimodal.pixelStats(
      Seq(Multimodal.MediaRecord(6L, "mem://g.jpg", "image/jpeg", bos.toByteArray)).toDS())
      .collect().head
    assert((jst.width, jst.height) == ((32, 16)))
    // non-image payloads are dropped by pixelStats, not errors
    assert(Multimodal.pixelStats(
      Seq(Multimodal.MediaRecord(7L, "mem://t.txt", "text/plain", "not an image".getBytes)).toDS())
      .isEmpty)
  }

  test("multimodal REAL resize: area-averaged downscale preserves channel means") {
    import spark.implicits._
    import graft.ops.Multimodal
    // constant-color image: any correct resampler preserves it exactly
    val img = new java.awt.image.BufferedImage(32, 32, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (x <- 0 until 32; y <- 0 until 32) img.setRGB(x, y, 0x406080)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    val ds = Seq(Multimodal.MediaRecord(1L, "mem://c.png", "image/png", bos.toByteArray)).toDS()
    val resized = Multimodal.resizeImages(ds, 8, 8).collect().head
    assert(resized.mediaType == "image/png" && resized.path.endsWith("#8x8"))
    val st = Multimodal.pixelStats(Seq(resized).toDS()).collect().head
    assert((st.width, st.height) == ((8, 8)))
    assert((st.sum_r, st.sum_g, st.sum_b) == ((0x40L * 64, 0x60L * 64, 0x80L * 64)),
      s"constant color not preserved: $st")
    // non-image payloads take the stub path and still flow
    val stub = Multimodal.resizeImages(
      Seq(Multimodal.MediaRecord(2L, "mem://t.txt", "text/plain",
        ("x" * 400).getBytes)).toDS(), 8, 8).collect().head
    assert(stub.content.nonEmpty && stub.path.endsWith("#8x8"))
  }

  test("multimodal REAL audio decode: WAV PCM roundtrip through the JDK codec") {
    import spark.implicits._
    import graft.ops.Multimodal
    // encode the deterministic clip with the real writer, decode with the
    // real reader, check exact sample aggregates against the closed form
    val n = 1000
    val wav = Multimodal.syntheticWav(37L, n, 16000)
    val ds = Seq(Multimodal.MediaRecord(37L, "mem://a.wav", "audio/wav", wav)).toDS()
    val st = Multimodal.audioStats(ds).collect().head
    val expected = (0 until n).map(i => ((37L * 37L + 7919L * i) % 65536L) - 32768L)
    assert((st.sample_rate, st.channels, st.n_samples) == ((16000, 1, n.toLong)))
    assert(st.sum_s == expected.sum, s"sum: $st")
    assert(st.sum_abs == expected.map(math.abs).sum, s"sumAbs: $st")
    assert(st.peak_abs == expected.map(math.abs).max.toInt, s"peak: $st")
    // stereo interleaving: channels reported, both channels' samples counted
    val pcm = Array.tabulate[Byte](400 * 2 * 2) { j => (j % 7).toByte }
    val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, 2, true, false)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(
      new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(pcm), fmt, 400L),
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    val st2 = Multimodal.audioStats(Seq(
      Multimodal.MediaRecord(2L, "mem://s.wav", "audio/wav", bos.toByteArray)).toDS())
      .collect().head
    assert((st2.channels, st2.n_samples) == ((2, 800L)))
    // non-audio payloads are dropped by audioStats, not errors
    assert(Multimodal.audioStats(Seq(
      Multimodal.MediaRecord(3L, "mem://t.txt", "text/plain", "not audio".getBytes)).toDS())
      .isEmpty)
  }

  test("T8 keyed sumBy/minBy/maxBy aggregate the reference's keyed shapes") {
    import spark.implicits._
    val data = Seq(("a", 1.0), ("a", 2.5), ("b", 4.0), ("b", 1.0), ("a", 0.5))
    val keyed = Flow.fromCollection(spark, data).keyBy(_._1)
    val sums = keyed.sumBy(_._2).collectSeq().toMap
    assert(sums == Map("a" -> 4.0, "b" -> 5.0))
    val mins = keyed.minBy(_._2).collectSeq().toMap
    assert(mins == Map("a" -> ("a", 0.5), "b" -> ("b", 1.0)))
    val maxs = keyed.maxBy(_._2).collectSeq().toMap
    assert(maxs == Map("a" -> ("a", 2.5), "b" -> ("b", 4.0)))
  }

  test("W3 typed window facade: tumbling/sliding/session identical for batch data") {
    import spark.implicits._
    def t(min: Int, sec: Int = 0) =
      java.sql.Timestamp.valueOf(f"2024-01-01 00:$min%02d:$sec%02d")
    val base = t(0).getTime
    val data = Seq(
      ("a", t(1), 1.0), ("a", t(4), 2.0),   // same 10-min window
      ("a", t(12), 4.0),                     // next window
      ("b", t(3), 10.0))
    val flow = Flow.fromCollection(spark, data)
    // tumbling 10 minutes — watermark is a no-op on batch, same API
    val tw = flow.windowCountSum[String](_._1, _._2, _._3, "1 minute", "10 minutes")
      .collectSeq().toSet
    assert(tw == Set(
      ("a", base, 2L, 3.0), ("a", base + 600000L, 1L, 4.0), ("b", base, 1L, 10.0)))
    // sliding 10/5 minutes: a@1 lands in windows starting -5 and 0
    // a@1 and a@4 share windows [-5,5) and [0,10); a@12 lands in [5,15)
    // and [10,20) — 4 distinct windows for key a
    val sw = flow.slidingWindowCountSum[String](_._1, _._2, _._3,
      "1 minute", "10 minutes", "5 minutes").collectSeq()
    assert(sw.count(_._1 == "a") == 4)
    assert(sw.contains(("a", base, 2L, 3.0))) // [0,10) holds a@1 + a@4
    // session gap 5 minutes: a@1+a@4 chain into one session [1, 9);
    // a@12 is its own [12, 17)
    val sess = flow.sessionWindowCountSum[String](_._1, _._2, _._3,
      "1 minute", "5 minutes").collectSeq().toSet
    assert(sess == Set(
      ("a", t(1).getTime, t(9).getTime, 2L, 3.0),
      ("a", t(12).getTime, t(17).getTime, 1L, 4.0),
      ("b", t(3).getTime, t(8).getTime, 1L, 10.0)))
  }

  test("S1 readTextFile + S6 parquet sink round-trip") {
    val dir = java.nio.file.Files.createTempDirectory("graft-flow").toString
    java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$dir/in.txt"), "x\ny\nz")
    val flow = Flow.fromText(spark, s"$dir/in.txt")
    assert(flow.count() == 3)
    flow.sinkParquet(s"$dir/out.parquet")
    assert(spark.read.parquet(s"$dir/out.parquet").count() == 3)
  }
}
