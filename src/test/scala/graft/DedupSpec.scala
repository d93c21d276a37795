package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.ops.Dedup
import graft.ops.TextAnalysis.{shingles3, tokens}
import graft.sources.Tables

class DedupSpec extends AnyFunSuite {
  private lazy val spark = TestSession.spark

  private lazy val docs = Tables(spark, TestSession.sf0001).documents
    .select(col("doc_id"), shingles3(col("text")).as("sh"))
    .cache()

  /** Exact all-pairs Jaccard >= t — the ground truth LSH must recall. */
  private def exactPairs(threshold: Double): Set[(Long, Long)] = {
    val a = docs.select(col("doc_id").as("id_a"), array_distinct(col("sh")).as("sa"))
    val b = docs.select(col("doc_id").as("id_b"), array_distinct(col("sh")).as("sb"))
    a.join(b, col("id_a") < col("id_b"))
      .withColumn("j", Dedup.jaccard(col("sa"), col("sb")))
      .filter(col("j") >= threshold)
      .select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
  }

  test("minhash-LSH near-dups: exact precision, full recall at j>=0.5 on sf0.001") {
    val got = Dedup.minhashNearDups(docs, "doc_id", "sh", 0.5)
      .select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val truth = exactPairs(0.5)
    // precision is exact by construction (candidates are re-verified)
    assert(got.subsetOf(truth), s"false positives: ${got -- truth}")
    // 64 bands x 2 rows: P(miss | j=0.5) ~ 1e-8 — expect full recall here
    assert(got == truth, s"missed pairs: ${truth -- got}")
  }

  test("minhash signature is deterministic across runs") {
    val s1 = Dedup.minhashSignatures(docs, "doc_id", "sh").orderBy("doc_id").collect()
    val s2 = Dedup.minhashSignatures(docs, "doc_id", "sh").orderBy("doc_id").collect()
    assert(s1.sameElements(s2))
  }

  test("sigOf Mersenne-fold reduction is bit-identical to plain % P") {
    // reference: the pre-r15 inner loop (hardware divide per permutation)
    def sigRef(hs: Array[Long]): Array[Long] = {
      val sig = Array.fill(Dedup.K)(Long.MaxValue)
      for (h <- hs) {
        val hm = ((h % Dedup.P) + Dedup.P) % Dedup.P
        var k = 0
        while (k < Dedup.K) {
          val v = (Dedup.A(k) * hm + Dedup.B(k)) % Dedup.P
          if (v < sig(k)) sig(k) = v
          k += 1
        }
      }
      sig
    }
    val rnd = new scala.util.Random(123)
    // adversarial inputs for the fold: extremes of hm and random hashes
    val cases = Seq(
      Array(0L), Array(1L), Array(-1L), Array(Long.MaxValue),
      Array(Long.MinValue), Array(Dedup.P - 1, Dedup.P, Dedup.P + 1),
      Array.fill(64)(rnd.nextLong()),
      Array.fill(64)(rnd.nextLong()),
      Array.fill(256)(rnd.nextLong()))
    cases.foreach { hs =>
      assert(Dedup.sigOf(hs).sameElements(sigRef(hs)),
        s"fold != %% on input head=${hs.headOption}")
    }
  }

  test("simhash: identical docs collide, near-dups within small hamming") {
    import spark.implicits._
    val d = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again and again"),
      (2L, "the quick brown fox jumps over the lazy dog again and again"),
      (3L, "the quick brown fox leaps over the lazy dog again and again"),
      (4L, "completely different content about spark catalyst optimizer internals")
    ).toDF("doc_id", "text").select(col("doc_id"), tokens(col("text")).as("t"))
    val sig = Dedup.simhash64(d, "doc_id", "t").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sig(1L) == sig(2L))
    assert(java.lang.Long.bitCount(sig(1L) ^ sig(3L)) <= 12)
    assert(java.lang.Long.bitCount(sig(1L) ^ sig(4L)) > 12)
  }

  test("simhashNearPairs finds the identical pair via pigeonhole blocking") {
    import spark.implicits._
    val d = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta"),
      (2L, "alpha beta gamma delta epsilon zeta eta theta"),
      (3L, "totally unrelated words nothing shared here at all ok")
    ).toDF("doc_id", "text").select(col("doc_id"), tokens(col("text")).as("t"))
    val sigs = Dedup.simhash64(d, "doc_id", "t")
    val pairs = Dedup.simhashNearPairs(sigs, "doc_id", maxDist = 3)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((1L, 2L)))
  }

  test("winnowing: shared substrings share fingerprints; edits stay local") {
    val base = "the quick brown fox jumps over the lazy dog and runs far away home"
    val edited = base.replace("jumps", "leaps")
    val f1 = Dedup.winnowFingerprints(base).toSet
    val f2 = Dedup.winnowFingerprints(edited).toSet
    assert((f1 & f2).nonEmpty, "no shared fingerprints after a one-word edit")
    val overlap = (f1 & f2).size.toDouble / f1.size
    assert(overlap > 0.5, s"edit destroyed too many fingerprints: $overlap")
    assert(Dedup.winnowFingerprints("ab").isEmpty)                   // shorter than k
    assert(Dedup.winnowFingerprints("abcde").length == 1)            // single k-gram
    assert(Dedup.winnowFingerprints(base).sameElements(Dedup.winnowFingerprints(base)))
  }

  test("W-side streaming dedup drops duplicate keys within watermark") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.OutputMode
    import spark.implicits._
    implicit val sql = spark.sqlContext
    val in = MemoryStream[(java.sql.Timestamp, Long)]
    val deduped = graft.streaming.Streams.dedupStream(
      in.toDF().toDF("ts", "event_id"), "ts", "10 minutes", Seq("event_id"))
    val q = deduped.writeStream.format("memory").queryName("dedup_stream")
      .outputMode(OutputMode.Append()).start()
    try {
      val t0 = java.sql.Timestamp.valueOf("2024-01-01 00:01:00")
      in.addData((t0, 1L), (t0, 1L), (t0, 2L)); q.processAllAvailable()
      in.addData((java.sql.Timestamp.valueOf("2024-01-01 00:02:00"), 1L)); q.processAllAvailable()
      val ids = spark.table("dedup_stream").select("event_id")
        .collect().map(_.getLong(0)).sorted.toSeq
      assert(ids == Seq(1L, 2L), s"dedup failed: $ids")
    } finally q.stop()
  }

  test("SQL minhash_sig aggregate equals typed minhashSignatures") {
    import spark.implicits._
    val hashed = Tables(spark, TestSession.sf0001).documents
      .select("doc_id", "text").as[(Long, String)]
      .map { case (id, t) => (id, graft.ops.TextAnalysis.shingleHashes3Typed(t)) }
      .toDF("doc_id", "sh")
    hashed.select(col("doc_id"), explode(col("sh")).as("h"))
      .createOrReplaceTempView("shingles")
    val viaSql = spark.sql(
      "SELECT doc_id, minhash_sig(h) AS sig FROM shingles GROUP BY doc_id")
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val viaTyped = Dedup.minhashSignatures(hashed, "doc_id", "sh")
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(viaSql.keySet == viaTyped.keySet)
    viaTyped.foreach { case (id, sig) => assert(viaSql(id) == sig, s"doc $id differs") }
  }

  test("connectedComponents matches local union-find on random graphs") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    // mix of chains, triangles, singleton-adjacent pairs
    val edges = (Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L), (11L, 12L), (20L, 21L)) ++
      Seq.fill(30)((rnd.nextInt(40).toLong, rnd.nextInt(40).toLong))).filter(e => e._1 != e._2)
    val df = edges.toDF("src", "dst")
    val got = Dedup.connectedComponents(df, "src", "dst").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // local union-find ground truth
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = { val p = parent.getOrElseUpdate(x, x); if (p == x) x else { val r = find(p); parent(x) = r; r } }
    edges.foreach { case (a, b) => val (ra, rb) = (find(a), find(b)); if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb) }
    val truth = parent.keys.map(n => n -> find(n)).toMap
    assert(got.keySet == truth.keySet)
    // same partition into components, canonical = min member
    got.foreach { case (n, c) => assert(c == truth(n), s"node $n: got $c want ${truth(n)}") }
  }

  test("connectedComponents handles a long chain (diameter > 2 rounds)") {
    import spark.implicits._
    val chain = (0L until 19L).map(i => (i, i + 1)).toDF("src", "dst")
    val got = Dedup.connectedComponents(chain, "src", "dst").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.size == 20 && got.values.forall(_ == 0L))
  }

  test("star contraction matches union-find on random graphs") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val edges = (Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L), (20L, 21L)) ++
      Seq.fill(40)((rnd.nextInt(50).toLong, rnd.nextInt(50).toLong))).filter(e => e._1 != e._2)
    val got = Dedup.connectedComponentsStar(edges.toDF("src", "dst"), "src", "dst")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = { val p = parent.getOrElseUpdate(x, x); if (p == x) x else { val r = find(p); parent(x) = r; r } }
    edges.foreach { case (a, b) => val (ra, rb) = (find(a), find(b)); if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb) }
    val truth = parent.keys.map(n => n -> find(n)).toMap
    assert(got == truth)
  }

  test("star contraction converges in O(log n) rounds on a 500-node chain") {
    import spark.implicits._
    val chain = (0L until 499L).map(i => (i, i + 1)).toDF("src", "dst")
    val (labels, rounds) =
      Dedup.connectedComponentsStarWithRounds(chain, "src", "dst", maxIter = 20)
    // Kiveris et al.: alternating rounds halve tree heights — expect
    // ~log2(500) ≈ 9 (+ slack); label propagation would need 499.
    assert(rounds <= 13, s"took $rounds rounds (not O(log n))")
    val got = labels.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.size == 500 && got.values.forall(_ == 0L))
  }

  test("connectedComponents auto-switches to star contraction past switchAfter") {
    import spark.implicits._
    // 60-node chain: diameter 59 >> switchAfter 3; label propagation
    // alone would need 59 rounds — the switch must still yield exact labels
    val chain = (100L until 159L).map(i => (i, i + 1)).toDF("src", "dst")
    val got = Dedup.connectedComponents(chain, "src", "dst", maxIter = 20, switchAfter = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.size == 60 && got.values.forall(_ == 100L))
  }

  test("embedNearDups: exact precision, recall vs all-pairs baseline, no NestedLoop") {
    val emb = Tables(spark, TestSession.sf001).embeddings
    val blocked = Dedup.embedNearDups(emb, threshold = 0.4)
    // plan must be the 100TB shape: equi-join candidates, never all-pairs
    val plan = blocked.queryExecution.executedPlan.toString
    assert(!plan.contains("NestedLoop") && !plan.contains("Cartesian"),
      "embedNearDups plan contains an all-pairs join node")
    val got = blocked.select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val truth = Dedup.embedNearDupsExact(emb, 0.4).select("id_a", "id_b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // precision exact by construction (candidates re-verified with exact cosine)
    assert(got.subsetOf(truth), s"false positives: ${got -- truth}")
    // worst case for sign-LSH: fully isotropic vectors at a 66-degree
    // threshold (these synthetic embeddings have no cluster structure and
    // max pair cos < 0.6). Deterministic given the data: 47/59 measured.
    val recall = got.size.toDouble / truth.size
    assert(recall >= 0.75, s"isotropic recall $recall < 0.75 (${got.size}/${truth.size})")
  }

  test("embedNearDups: full recall on clustered corpus at near-dup threshold") {
    import spark.implicits._
    // the real-world case: documents with true near-duplicates (clustered
    // embeddings, cos >= 0.9) — sign-LSH blocking must not lose any pair
    val rnd = new scala.util.Random(42)
    val centers = Array.fill(40, 64)(rnd.nextGaussian().toFloat)
    val pts = (0 until 400).map { i =>
      val c = centers(i / 10)
      (i.toLong, c.map(x => x + 0.15f * rnd.nextGaussian().toFloat))
    }
    val emb = pts.toDF("vec_id", "embedding")
    val got = Dedup.embedNearDups(emb, threshold = 0.9).select("id_a", "id_b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val truth = Dedup.embedNearDupsExact(emb, 0.9).select("id_a", "id_b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(truth.nonEmpty, "test corpus produced no near-dup pairs")
    assert(got == truth, s"missed: ${(truth -- got).take(5)}… extra: ${got -- truth}")
  }

  test("dedupAgainstBloom equals the exact anti-join (no false negatives possible)") {
    val docs = Tables(spark, TestSession.sf001).documents
    val newDocs = docs.filter(col("doc_id") % 2 === 1)
      .select(col("doc_id"), md5(col("text")).as("fp"))
    val refFps = docs.filter(col("doc_id") % 2 === 0)
      .select(md5(col("text")).as("fp"))
    val viaBloom = Dedup.dedupAgainstBloom(newDocs, refFps, "fp", expectedItems = 20000)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val viaAntiJoin = newDocs.join(refFps, Seq("fp"), "left_anti")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(viaBloom == viaAntiJoin,
      s"bloom path diverged: extra=${viaBloom -- viaAntiJoin} missing=${viaAntiJoin -- viaBloom}")
  }

  test("exactByKey keeps min id and is idempotent") {
    import spark.implicits._
    val df = Seq((10L, "x"), (3L, "x"), (5L, "y")).toDF("id", "k")
    val d1 = Dedup.exactByKey(df, "k", "id")
    assert(d1.collect().map(r => (r.getLong(0), r.getString(1))).toSet == Set((3L, "x"), (5L, "y")))
    assert(Dedup.exactByKey(d1, "k", "id").count() == d1.count())
  }

  test("duplicatedSpans finds a planted span at different offsets, exact boundaries") {
    import spark.implicits._
    val span = (1 to 20).map(i => s"shared$i").mkString(" ") // 20 shared tokens
    val docA = s"alpha beta gamma $span tail1 tail2"          // span starts at offset 3
    val docB = s"one $span other words here"                  // span starts at offset 1
    val docC = "completely different content with no overlap at all whatsoever"
    val docs = Seq((1L, docA), (2L, docB), (3L, docC)).toDF("doc_id", "text")
    val got = Dedup.duplicatedSpans(docs, "doc_id", "text", gramLen = 5, minRun = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getInt(3),
        r.getLong(4), r.getLong(5)))
    // one span: 20 shared tokens = 16 matching 5-grams
    assert(got.toSeq == Seq((1L, 2L, 3, 1, 16L, 20L)), s"got ${got.toSeq}")
    // below minRun the same span is dropped
    assert(Dedup.duplicatedSpans(docs, "doc_id", "text", gramLen = 5, minRun = 17).count() == 0)
  }

  test("duplicatedSpans maxGramFreq drops boilerplate-seeded runs, keeps rare spans") {
    import spark.implicits._
    val boiler = (1 to 20).map(i => s"tos$i").mkString(" ")
    val rare = (1 to 20).map(i => s"rare$i").mkString(" ")
    // boilerplate span appears in 30 docs; the rare span in exactly 2
    val docs = ((1 to 30).map(i => (i.toLong, s"pre$i $boiler post$i")) ++
      Seq((100L, s"x y z $rare"), (101L, s"q $rare w")))
      .toDF("doc_id", "text")
    val capped = Dedup.duplicatedSpans(docs, "doc_id", "text", gramLen = 5, minRun = 10,
        maxGramFreq = Some(5))
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(capped == Set((100L, 101L)), s"got $capped")
    // uncapped, the boilerplate pairs are all present too (30 choose 2)
    val uncapped = Dedup.duplicatedSpans(docs, "doc_id", "text", 5, 10).count()
    assert(uncapped == 435 + 1, s"got $uncapped")
  }

  test("duplicatedSpans cap mode bridges a hot-gram hole inside a long span") {
    import spark.implicits._
    // A and B share 15 tokens whose middle 3-gram also appears in 40
    // filler docs: the cap drops that gram, splitting the diagonal
    // into two 6-gram islands — both below minRun = 10. Bridging must
    // still report ONE span with the full 15-token extent.
    val shared = ((1 to 6).map(i => s"s$i") ++ Seq("hx", "hy", "hz") ++
      (1 to 6).map(i => s"t$i")).mkString(" ")
    val filler = (1 to 40).map(i => (1000L + i, "hx hy hz"))
    val docs = (Seq((1L, shared), (2L, s"p1 p2 $shared")) ++ filler)
      .toDF("doc_id", "text")
    val got = Dedup.duplicatedSpans(docs, "doc_id", "text",
        gramLen = 3, minRun = 10, maxGramFreq = Some(30))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getInt(3),
        r.getLong(4), r.getLong(5)))
    // 12 matched grams (hole at the hot gram), full span 15 tokens
    assert(got.toSeq == Seq((1L, 2L, 0, 2, 12L, 15L)), s"got ${got.toSeq}")
    // islands more than gramLen apart stay separate spans: without the
    // cap the same corpus yields the one exact 13-gram span
    val exact = Dedup.duplicatedSpans(docs, "doc_id", "text", 3, 10)
      .collect().map(r => (r.getLong(4), r.getLong(5)))
    assert(exact.toSeq == Seq((13L, 15L)), s"got ${exact.toSeq}")
  }

  test("removeDuplicatedSpans cuts later occurrences, merges overlapping masks") {
    import spark.implicits._
    val span = (1 to 20).map(i => s"s$i").mkString(" ")
    val docA = s"a1 a2 a3 $span a4 a5"       // first occurrence — survives intact
    val docB = s"b1 $span b2 b3"             // span cut
    // docC carries the span twice, adjacent: both cut, intervals merge
    val docC = s"c1 $span $span c2"
    val docs = Seq((1L, docA), (2L, docB), (3L, docC)).toDF("doc_id", "text")
    val got = Dedup.removeDuplicatedSpans(docs, "doc_id", "text", gramLen = 5, minRun = 10)
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2)))).toMap
    assert(got(1L) == (docA, 0L), s"first occurrence must survive: ${got(1L)}")
    assert(got(2L) == ("b1 b2 b3", 20L), s"got ${got(2L)}")
    // docC: both copies (and the bridging grams between them) removed
    assert(got(3L)._1.startsWith("c1") && !got(3L)._1.contains("s1")
      && got(3L)._2 >= 40L, s"got ${got(3L)}")
  }

  test("LSH hot-bucket cap bounds a mega-bucket's quadratic candidates, keeps real pairs") {
    import spark.implicits._
    // 200 identical boilerplate docs (one mega-bucket per band: 19,900
    // pairs × 64 bands uncapped) + one genuine near-dup pair far from
    // the boilerplate.
    val boiler = "terms of service apply to all users of this site always"
    val a = "the quick brown fox jumps over the lazy dog near the river bank today"
    val b = "the quick brown fox jumps over the lazy dog near the river bank"
    val docs = ((1 to 200).map(i => (i.toLong, boiler)) ++ Seq((1001L, a), (1002L, b)))
      .toDF("doc_id", "text").as[(Long, String)]
      .map { case (id, t) => (id, graft.ops.TextAnalysis.shingleHashes3Typed(t)) }
      .toDF("doc_id", "sh")
    val sigs = Dedup.minhashSignatures(docs, "doc_id", "sh").localCheckpoint()
    val uncapped = Dedup.lshCandidates(sigs, "doc_id").count()
    val capped = Dedup.lshCandidates(sigs, "doc_id", maxBucketSize = Some(10))
    val cappedPairs = capped.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(uncapped >= 19900, s"mega-bucket should pair quadratically, got $uncapped")
    // the cap removes the boilerplate blow-up entirely...
    assert(cappedPairs.size < 100, s"cap did not bound candidates: ${cappedPairs.size}")
    // ...but the genuine near-dup pair (its buckets have occupancy 2) survives
    assert(cappedPairs.contains((1001L, 1002L)), "capped LSH lost a real near-dup pair")
    // default (no cap) is bit-identical to the previous behavior
    assert(Dedup.lshCandidates(sigs, "doc_id", None).count() == uncapped)
  }

  test("incremental LSH: index path finds exactly the full-LSH cross-split pairs") {
    import spark.implicits._
    val hashed = Tables(spark, TestSession.sf0001).documents
      .select(col("doc_id"), col("text")).as[(Long, String)]
      .map { case (id, t) => (id, graft.ops.TextAnalysis.shingleHashes3Typed(t)) }
      .toDF("doc_id", "sh")
      .cache()
    val corpus = hashed.filter(col("doc_id") % 5 =!= 0)
    val batch = hashed.filter(col("doc_id") % 5 === 0)
    val index = Dedup.buildLshIndex(corpus, "doc_id", "sh")
    val got = Dedup.nearDupsAgainstIndex(index, batch, "doc_id", "sh", 0.5)
      .select("corpus_id", "batch_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // ground truth: full LSH over everything, keep only cross-split
    // pairs, re-orient to (corpus_id, batch_id)
    val full = Dedup.minhashNearDups(hashed, "doc_id", "sh", 0.5)
      .select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .filter { case (a, b) => (a % 5 == 0) != (b % 5 == 0) }
      .map { case (a, b) => if (a % 5 == 0) (b, a) else (a, b) }.toSet
    assert(got == full)
    hashed.unpersist()
  }

  test("incremental LSH: batch side broadcasts, corpus index never shuffles to the join") {
    import spark.implicits._
    val hashed = Tables(spark, TestSession.sf0001).documents
      .select(col("doc_id"), col("text")).as[(Long, String)]
      .map { case (id, t) => (id, graft.ops.TextAnalysis.shingleHashes3Typed(t)) }
      .toDF("doc_id", "sh")
    val index = Dedup.buildLshIndex(hashed.filter(col("doc_id") % 5 =!= 0), "doc_id", "sh")
    val plan = Dedup.nearDupsAgainstIndex(index,
        hashed.filter(col("doc_id") % 5 === 0), "doc_id", "sh", 0.5)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"batch side not broadcast:\n$plan")
  }

  test("incremental LSH: index survives a parquet round-trip") {
    import spark.implicits._
    val hashed = Tables(spark, TestSession.sf0001).documents
      .select(col("doc_id"), col("text")).as[(Long, String)]
      .map { case (id, t) => (id, graft.ops.TextAnalysis.shingleHashes3Typed(t)) }
      .toDF("doc_id", "sh")
    val corpus = hashed.filter(col("doc_id") % 5 =!= 0)
    val batch = hashed.filter(col("doc_id") % 5 === 0)
    val dir = java.nio.file.Files.createTempDirectory("graft-lsh-index").toString
    try {
      Dedup.buildLshIndex(corpus, "doc_id", "sh").write.mode("overwrite").parquet(dir)
      val reloaded = spark.read.parquet(dir)
      val viaDisk = Dedup.nearDupsAgainstIndex(reloaded, batch, "doc_id", "sh", 0.5)
        .select("corpus_id", "batch_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val direct = Dedup.nearDupsAgainstIndex(
          Dedup.buildLshIndex(corpus, "doc_id", "sh"), batch, "doc_id", "sh", 0.5)
        .select("corpus_id", "batch_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(viaDisk == direct && viaDisk.nonEmpty)
    } finally org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
  }

  test("incremental LSH: id collision drops true self-pairs but keeps near-dups with different content") {
    import spark.implicits._
    // re-ingest scenario: the batch's id space overlaps the corpus's.
    // corpus 1 / batch 1: identical content -> true self-pair, excluded.
    // corpus 3 / batch 3: same id but DIFFERENT (near-dup) content -> a
    // genuine candidate that an id-only filter would silently lose.
    val setA = (1L to 10L).toArray
    val setA2 = setA.dropRight(1) :+ 11L // jaccard 9/11 with A
    val setX = (101L to 110L).toArray
    val setXv = setX.dropRight(1) :+ 111L
    val corpus = Seq((1L, setA), (3L, setX)).toDF("doc_id", "sh")
    val batch = Seq((1L, setA), (2L, setA2), (3L, setXv)).toDF("doc_id", "sh")
    val index = Dedup.buildLshIndex(corpus, "doc_id", "sh")
    val got = Dedup.nearDupsAgainstIndex(index, batch, "doc_id", "sh", 0.5)
      .select("corpus_id", "batch_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(!got.contains((1L, 1L)), "identical-content self-pair must be excluded")
    assert(got.contains((3L, 3L)),
      "id-colliding near-dup with different content must be reported")
    assert(got.contains((1L, 2L)), "ordinary cross-id near-dup must be reported")
  }

  test("dedupSegments keeps first corpus occurrence, reassembles in order") {
    import spark.implicits._
    // doc 1: [a b, c d]; doc 2 repeats "a b" (stolen by doc 1) and adds
    // "e f"; doc 3 is an exact dup of doc 1 -> vanishes entirely;
    // doc 4 repeats doc 1's segment *within itself* -> only first kept
    val df = Seq(
      (1L, "a b c d"),
      (2L, "a b e f"),
      (3L, "a b c d"),
      (4L, "g h a b g h")).toDF("doc_id", "text")
    val out = Dedup.dedupSegments(df, "doc_id", "text", segWords = 2)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toList.sortBy(_._1)
    assert(out == List(
      (1L, "a b c d", 2L),
      (2L, "e f", 1L),
      (4L, "g h", 1L)), s"got: $out")
    // idempotent: a second pass removes nothing more
    val again = Dedup.dedupSegments(
      Seq((1L, "a b c d"), (2L, "e f"), (4L, "g h")).toDF("doc_id", "text"), "doc_id", "text", 2)
    assert(again.count() == 3)
    // short tail segment ("d") kept as its own unit
    val tail = Dedup.dedupSegments(Seq((7L, "x y d")).toDF("doc_id", "text"), "doc_id", "text", 2)
      .collect().head
    assert(tail.getString(1) == "x y d" && tail.getLong(2) == 2L)
  }
}
