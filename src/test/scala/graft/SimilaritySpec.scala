package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.ops.Similarity
import graft.sources.Tables

class SimilaritySpec extends AnyFunSuite {
  private lazy val spark = TestSession.spark

  private lazy val emb = Tables(spark, TestSession.sf0001).embeddings.cache()

  test("VectorizeCosineRule rewrites the HOF composition to cosine_f") {
    val df = emb.limit(10).select(
      Similarity.cosineHof(col("embedding"), col("embedding")).as("c"))
    val optimized = df.queryExecution.optimizedPlan.toString
    assert(optimized.contains("cosine_f"), s"rule did not fire:\n$optimized")
    assert(df.collect().forall(r => math.abs(r.getDouble(0) - 1.0) < 1e-12))
  }

  test("cosine_f callable from SQL via GraftExtensions") {
    graft.sources.Tables(spark, TestSession.sf0001).embeddings
      .createOrReplaceTempView("emb_sql")
    val r = spark.sql(
      """SELECT cosine_f(a.embedding, b.embedding) AS c
        |FROM emb_sql a JOIN emb_sql b ON a.vec_id = 0 AND b.vec_id = 0""".stripMargin)
      .collect().head.getDouble(0)
    assert(math.abs(r - 1.0) < 1e-12)
  }

  test("fnv64 SQL function = Dedup.strHash64 bit-for-bit (codegen + interpreted)") {
    import spark.implicits._
    val samples = Seq("", "a", "the quick brown fox", "tok", "uniécode",
      "a b c d e f g", "\t tabs \n and newlines")
    samples.toDF("s").createOrReplaceTempView("fnv_probe")
    val viaSql = spark.sql("SELECT s, fnv64(s) AS h FROM fnv_probe")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    samples.foreach { s =>
      val expect = graft.ops.Dedup.strHash64(s) // private[graft]; spec shares the package
      assert(viaSql(s) == expect, s"'$s': sql ${viaSql(s)} != jvm $expect")
    }
    // null propagates
    assert(spark.sql("SELECT fnv64(CAST(NULL AS STRING))").collect().head.isNullAt(0))
  }

  test("native cosine_f expression = HOF composition bit-for-bit") {
    val pairs = emb.select(col("vec_id"), col("embedding"))
      .crossJoin(emb.select(col("vec_id").as("id2"), col("embedding").as("e2"))
        .filter(col("id2") < 20))
      .withColumn("native", Similarity.cosine(col("embedding"), col("e2")))
      .withColumn("hof", Similarity.cosineHof(col("embedding"), col("e2")))
    assert(pairs.filter(col("native") =!= col("hof")).count() == 0)
  }

  test("cosine_f degenerate inputs yield null (zero norm, length mismatch)") {
    import spark.implicits._
    val data: Seq[(Seq[Option[Float]], Seq[Option[Float]])] = Seq(
      (Seq(Some(0.0f), Some(0.0f)), Seq(Some(1.0f), Some(2.0f))), // zero norm
      (Seq(Some(1.0f)), Seq(Some(1.0f), Some(2.0f))),             // length mismatch
      (Seq(Some(1.0f), None), Seq(Some(1.0f), Some(2.0f))),       // null element
      (Seq(Some(1.0f), Some(0.0f)), Seq(Some(1.0f), Some(0.0f)))) // well-formed
    val df = data.toDF("a", "b")
      .select(Similarity.cosine(col("a"), col("b")).as("c"))
    val rows = df.collect()
    assert(rows(0).isNullAt(0) && rows(1).isNullAt(0) && rows(2).isNullAt(0))
    assert(math.abs(rows(3).getDouble(0) - 1.0) < 1e-12)
    // and a null never wins a desc-ordered top-k
    assert(df.orderBy(col("c").desc).collect().head.getDouble(0) == 1.0)
  }

  test("VectorizeCosineRule does NOT rewrite non-dot-product lambdas") {
    import org.apache.spark.sql.functions.{aggregate => agg_, _}
    val sumSq = (c: org.apache.spark.sql.Column) => {
      val cd = transform(c, x => x.cast("double"))
      agg_(zip_with(cd, cd, (x, _) => x * x), lit(0.0), (acc, v) => acc + v)
    }
    val df = emb.limit(5).select(
      (sumSq(col("embedding")) / (sqrt(sumSq(col("embedding"))) * sqrt(sumSq(col("embedding")))))
        .as("not_cosine"))
    assert(!df.queryExecution.optimizedPlan.toString.contains("cosine_f"),
      "rule misfired on (x,y) -> x*x")
  }

  test("cosine: self-similarity = 1, orthogonal = 0") {
    import spark.implicits._
    val df = Seq(
      (Array(1.0f, 0.0f), Array(1.0f, 0.0f)),
      (Array(1.0f, 0.0f), Array(0.0f, 1.0f))
    ).toDF("a", "b").select(Similarity.cosine(col("a"), col("b")).as("c"))
    val cs = df.collect().map(_.getDouble(0))
    assert(math.abs(cs(0) - 1.0) < 1e-12)
    assert(math.abs(cs(1)) < 1e-12)
  }

  test("bruteForceTopK: k rows per query, self excluded, descending") {
    val q = emb.filter(col("vec_id") < 3)
    val out = Similarity.bruteForceTopK(q, emb, 5).collect()
    assert(out.length == 15)
    val byQuery = out.groupBy(_.getLong(0))
    byQuery.foreach { case (qid, rows) =>
      assert(rows.length == 5)
      assert(!rows.exists(_.getLong(1) == qid), "self-match leaked")
      val cs = rows.sortBy(_.getInt(3)).map(_.getDouble(2))
      assert(cs.zip(cs.tail).forall { case (x, y) => x >= y }, "not descending")
    }
  }

  test("ivfTopK recall vs brute force (16 cells, probe 4, Lloyd-trained)") {
    val q = emb.filter(col("vec_id") < 20)
    val truth = Similarity.bruteForceTopK(q, emb, 5).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val approx = Similarity.ivfTopK(q, emb, 5, nCells = 16, nProbe = 4).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(approx.nonEmpty)
    // isotropic synthetic embeddings are k-means' worst case (no cluster
    // structure; "neighbors" sit at cos 0.3-0.5 and scatter across
    // cells) — Lloyd training still lifts recall 0.43 → ~0.55 here.
    // The clustered-corpus test below is the shape real corpora have.
    val recall = (approx & truth).size.toDouble / truth.size
    assert(recall >= 0.45, s"recall $recall")
  }

  test("ivfTopK on a clustered corpus: trained centroids give ~full recall") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    val centers = Array.fill(16, 64)(rnd.nextGaussian().toFloat)
    val pts = (0 until 800).map { i =>
      val c = centers(i % 16)
      (i.toLong, c.map(x => x + 0.35f * rnd.nextGaussian().toFloat))
    }
    val clustered = pts.toDF("vec_id", "embedding").cache()
    val q = clustered.filter(col("vec_id") < 20)
    val truth = Similarity.bruteForceTopK(q, clustered, 5).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val approx = Similarity.ivfTopK(q, clustered, 5, nCells = 16, nProbe = 4).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (approx & truth).size.toDouble / truth.size
    assert(recall >= 0.95, s"clustered recall $recall") // measured 1.0 at 5 iters
  }

  test("pqTopK: recall vs exact L2 on a clustered corpus; bit-deterministic across partitionings") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val centers = Array.fill(16, 64)(rnd.nextGaussian().toFloat)
    val pts = (0 until 800).map { i =>
      val c = centers(i % 16)
      (i.toLong, c.map(x => x + 0.35f * rnd.nextGaussian().toFloat))
    }
    val clustered = pts.toDF("vec_id", "embedding").cache()
    val q = clustered.filter(col("vec_id") < 20)
    // exact L2 truth (PQ ranks by ADC ~ L2, not cosine) — driver-side
    // over the 20x800 test matrix
    val all = pts.toMap
    val truth = (0L until 20L).flatMap { qid =>
      val qv = all(qid)
      all.keys.filter(_ != qid).toSeq
        .map(n => (n, all(n).zip(qv).map { case (a, b) =>
          (a - b).toDouble * (a - b) }.sum))
        .sortBy { case (n, d) => (d, n) }.take(5).map(n => (qid, n._1))
    }.toSet
    val approx = Similarity.pqTopK(q, clustered, 5, m = 8, codes = 64, iters = 2, rescore = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (approx & truth).size.toDouble / truth.size
    assert(recall >= 0.8, s"pq recall $recall")
    // determinism: same answer (exact integer l2 included) across runs
    // and partitionings — the property that makes the SQL oracle possible
    def run(df: org.apache.spark.sql.DataFrame) =
      Similarity.pqTopK(q, df, 5, m = 8, codes = 64, iters = 2, rescore = 8)
        .orderBy("query_id", "rk")
        .as[(Long, Long, Long, Int)].collect().toSeq
    val a = run(clustered)
    val b = run(clustered.repartition(13))
    assert(a == b, "pqTopK not partition-invariant")
    // codes are m small ints — the 64x compression story at dim=64
    val (s, n) = Similarity.pqTrain(clustered, 4, 16, 1, 64)
    val enc = Similarity.pqEncode(clustered, s, n).collect()
    assert(enc.length == 800 &&
      enc.forall(_.getAs[scala.collection.Seq[Int]]("codes").size == 4))
    // codebooks persist: a parquet round-trip restores the exact arrays,
    // so a reloaded index encodes identically (train once, search forever)
    val dir = java.nio.file.Files.createTempDirectory("graft-pq-cb").toString
    try {
      Similarity.savePqCodebooks(spark, s, n, s"$dir/cb")
      val (s2, n2) = Similarity.loadPqCodebooks(spark, s"$dir/cb")
      assert(n2.map(_.toSeq).toSeq == n.map(_.toSeq).toSeq)
      s.indices.foreach(i => s(i).indices.foreach(j =>
        assert(s2(i)(j).toSeq == s(i)(j).toSeq)))
      val enc2 = Similarity.pqEncode(clustered, s2, n2)
        .orderBy("vec_id").collect().map(_.toString).toSeq
      val enc1 = Similarity.pqEncode(clustered, s, n)
        .orderBy("vec_id").collect().map(_.toString).toSeq
      assert(enc2 == enc1, "round-tripped codebook encoded differently")
    } finally org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
  }

  test("ivfPqTopK: cell-pruned + code-compressed search keeps recall on a clustered corpus") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val centers = Array.fill(16, 64)(rnd.nextGaussian().toFloat)
    val pts = (0 until 800).map { i =>
      val c = centers(i % 16)
      (i.toLong, c.map(x => x + 0.35f * rnd.nextGaussian().toFloat))
    }
    val clustered = pts.toDF("vec_id", "embedding").cache()
    val q = clustered.filter(col("vec_id") < 20)
    val all = pts.toMap
    val truth = (0L until 20L).flatMap { qid =>
      val qv = all(qid)
      all.keys.filter(_ != qid).toSeq
        .map(n => (n, all(n).zip(qv).map { case (a, b) =>
          (a - b).toDouble * (a - b) }.sum))
        .sortBy { case (n, d) => (d, n) }.take(5).map(n => (qid, n._1))
    }.toSet
    def run(df: org.apache.spark.sql.DataFrame) =
      Similarity.ivfPqTopK(q, df, topK = 5, nCells = 16, nProbe = 4,
        ivfIters = 2, m = 8, codes = 64, pqIters = 2, rescore = 8)
    val out = run(clustered).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (out & truth).size.toDouble / truth.size
    assert(recall >= 0.75, s"ivfpq recall $recall")
    // determinism across partitionings, both trainers included
    val a = run(clustered).orderBy("query_id", "rk")
      .as[(Long, Long, Long, Int)].collect().toSeq
    val b = run(clustered.repartition(13)).orderBy("query_id", "rk")
      .as[(Long, Long, Long, Int)].collect().toSeq
    assert(a == b, "ivfPqTopK not partition-invariant")
  }

  test("ivfPqSearch over a persisted index == in-process search, bit for bit") {
    import spark.implicits._
    val rnd = new scala.util.Random(13)
    val centers = Array.fill(16, 64)(rnd.nextGaussian().toFloat)
    val pts = (0 until 600).map { i =>
      (i.toLong, centers(i % 16).map(x => x + 0.3f * rnd.nextGaussian().toFloat))
    }
    val corpus = pts.toDF("vec_id", "embedding").cache()
    val q = corpus.filter(col("vec_id") < 15)
    val idx = Similarity.ivfPqBuild(corpus, nCells = 16, ivfIters = 2,
      m = 8, codes = 32, pqIters = 1)
    def search(index: org.apache.spark.sql.DataFrame,
               cs: Array[Array[Long]], cn: Array[Long],
               ps: Array[Array[Array[Long]]], pn: Array[Array[Long]]) =
      Similarity.ivfPqSearch(q, corpus, index, cs, cn, ps, pn,
          topK = 5, nProbe = 4, rescore = 6)
        .orderBy("query_id", "rk")
        .as[(Long, Long, Long, Int)].collect().toSeq
    val inProcess = search(idx.index,
      idx.cellSums, idx.cellCounts, idx.pqSums, idx.pqCounts)
    assert(inProcess.nonEmpty)
    // the composed path equals ivfPqTopK (build+search is a pure split)
    val composed = Similarity.ivfPqTopK(q, corpus, topK = 5, nCells = 16,
        nProbe = 4, ivfIters = 2, m = 8, codes = 32, pqIters = 1, rescore = 6)
      .orderBy("query_id", "rk").as[(Long, Long, Long, Int)].collect().toSeq
    assert(composed == inProcess, "build+search diverged from ivfPqTopK")
    // persist all three pieces, reload, search — bit-identical results
    val dir = java.nio.file.Files.createTempDirectory("graft-ivfpq-idx").toString
    try {
      Similarity.saveIvfCentroids(spark, idx.cellSums, idx.cellCounts, s"$dir/cells")
      Similarity.savePqCodebooks(spark, idx.pqSums, idx.pqCounts, s"$dir/cb")
      idx.index.write.mode("overwrite").parquet(s"$dir/index")
      val (cs, cn) = Similarity.loadIvfCentroids(spark, s"$dir/cells")
      val (ps, pn) = Similarity.loadPqCodebooks(spark, s"$dir/cb")
      val reloaded = search(spark.read.parquet(s"$dir/index"), cs, cn, ps, pn)
      assert(reloaded == inProcess,
        "search over the reloaded index diverged from in-process")
      // right-to-be-forgotten: deleting vectors from the persisted
      // index equals anti-filtering it in memory (centroids/codebooks
      // are trained parameters — untouched), and deleted ids can never
      // be returned as neighbors
      val victims = inProcess.map(_._2).distinct.take(3)
      Similarity.ivfPqIndexDelete(spark, s"$dir/index", victims)
      val afterDelete = search(spark.read.parquet(s"$dir/index"),
        cs, cn, ps, pn)
      val expected = search(
        idx.index.filter(!col("neighbor_id").isin(victims: _*)),
        cs, cn, ps, pn)
      assert(afterDelete == expected,
        "post-delete search diverged from the anti-filtered index")
      victims.foreach(v => assert(!afterDelete.exists(_._2 == v),
        s"deleted vector $v still returned as a neighbor"))
    } finally org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
  }

  test("int8 quantization: <=0.5-ulp-of-scale error, high reconstruction cosine, zero-safe") {
    import spark.implicits._
    val qd = Similarity.quantizeInt8(emb).collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getAs[Array[Byte]](2))).toList
    val orig = emb.collect().map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    qd.foreach { case (id, scale, q) =>
      val v = orig(id)
      assert(q.length == v.length)
      // per-element reconstruction error bounded by scale/2 (round-to-nearest)
      q.zip(v).foreach { case (qi, vi) =>
        assert(math.abs(qi * scale - vi) <= scale / 2 + 1e-12,
          s"vec $id: |${qi * scale} - $vi| > scale/2=$scale")
      }
    }
    // reconstruction cosine stays near 1 (int8 is plenty for 64-dim)
    val recon = Similarity.quantizeInt8Report(emb)
      .select("cos_recon").collect().map(_.getDouble(0))
    assert(recon.forall(_ >= 0.999), s"worst cos_recon ${recon.min}")
    // zero vector: scale 0, all-zero bytes, no crash
    val z = Similarity.quantizeInt8(
      Seq((1L, Array.fill(64)(0.0f))).toDF("vec_id", "embedding")).collect().head
    assert(z.getDouble(1) == 0.0 && z.getAs[Array[Byte]](2).forall(_ == 0))
  }

  test("trainCentroids is deterministic and empty cells keep previous centroid") {
    import spark.implicits._
    val c1 = Similarity.trainCentroids(emb, 16, iters = 3).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1))).toMap
    val c2 = Similarity.trainCentroids(emb, 16, iters = 3).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1))).toMap
    assert(c1 == c2, "training not deterministic across runs")
    // duplicate corpus of a single point: every vector lands in one cell,
    // the other cells must keep their (seed) centroid, not NaN out
    val onePt = (0 until 50).map(i => (i.toLong, Array.fill(64)(1.0f))).toDF("vec_id", "embedding")
    val cs = Similarity.trainCentroids(onePt, 4, iters = 2).collect()
    assert(cs.length == 4)
    assert(cs.forall(r => !r.getSeq[Float](1).exists(_.isNaN)), "NaN centroid from empty cell")
  }

  test("annTopK recall vs brute force (8 tables x 4 planes, sf0.001)") {
    val q = emb.filter(col("vec_id") < 20)
    val truth = Similarity.bruteForceTopK(q, emb, 5).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val approx = Similarity.annTopK(q, emb, 5).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // no planted near-dups: top-5 "neighbors" sit at cos ~0.3-0.5, where
    // per-plane collision p ~ 0.6; OR-amplification over 8 tables of 4
    // planes gives expected recall ~0.7 — assert a conservative floor
    assert(approx.nonEmpty)
    val recall = (approx & truth).size.toDouble / truth.size
    assert(recall >= 0.4, s"recall $recall")
  }

  test("annTopK and ivfTopK run their top-k through GroupedTopKExec, not a full window sort") {
    // the candidate-set top-k must be the bounded-heap operator; the
    // only Window allowed over candidate-scale data is none — row_number
    // re-ranking runs on the k×|queries| output of GroupedTopK
    def topKExecs(df: org.apache.spark.sql.DataFrame): Seq[graft.plans.GroupedTopKExec] = {
      def find(p: org.apache.spark.sql.execution.SparkPlan): Seq[graft.plans.GroupedTopKExec] =
        p.flatMap {
          case g: graft.plans.GroupedTopKExec => Seq(g)
          case s: org.apache.spark.sql.execution.adaptive.QueryStageExec => find(s.plan)
          case _ => Nil
        }
      df.collect() // execute so AQE finalizes the real plan
      df.queryExecution.executedPlan match {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec => find(a.executedPlan)
        case p => find(p)
      }
    }
    val q = emb.filter(col("vec_id") < 10)
    val ann = Similarity.annTopK(q, emb, 5)
    assert(topKExecs(ann).nonEmpty, s"annTopK plan lacks GroupedTopKExec:\n${ann.queryExecution.executedPlan}")
    val ivf = Similarity.ivfTopK(q, emb, 5, nCells = 8, nProbe = 2, lloydIters = 1)
    assert(topKExecs(ivf).nonEmpty, s"ivfTopK plan lacks GroupedTopKExec:\n${ivf.queryExecution.executedPlan}")
    val ivfQ = Similarity.ivfTopKQuant(q, emb, 5, nCells = 8, nProbe = 2, iters = 1)
    assert(topKExecs(ivfQ).nonEmpty, s"ivfTopKQuant plan lacks GroupedTopKExec:\n${ivfQ.queryExecution.executedPlan}")
  }

  test("ivfTopKQuant is bit-deterministic across runs and partitionings") {
    val q = emb.filter(col("vec_id") < 5)
    def run(c: org.apache.spark.sql.DataFrame) =
      Similarity.ivfTopKQuant(q, c, 5, nCells = 16, nProbe = 4, iters = 2)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSet
    val a = run(emb)
    val b = run(emb.repartition(13)) // different partitioning must not perturb training
    assert(a == b, s"quantized IVF diverged across partitionings: ${(a -- b).take(3)}")
  }

  test("incremental IVF: batched stats merge == one-shot; drift flags the wandered cell") {
    import spark.implicits._
    val base = emb.filter(org.apache.spark.sql.functions.col("vec_id") % 10 =!= 0)
    val delta = emb.filter(org.apache.spark.sql.functions.col("vec_id") % 10 === 0)
    val (s, n) = Similarity.trainCentroidsQuant(base, nCells = 8, iters = 2, dim = 64)
    // associativity law: folding the delta in 3 batches equals one-shot
    // stats over all rows — exact integer sums, array for array
    val batches = Seq(0, 10, 20).map(r =>
      delta.filter(org.apache.spark.sql.functions.col("vec_id") % 30 === r))
    val incr = batches.foldLeft(Similarity.ivfCellStats(base, s, n))(
        (acc, b) => Similarity.ivfCellStatsMerge(acc, Similarity.ivfCellStats(b, s, n)))
      .orderBy("cell_id").as[(Long, Long, Array[Long])].collect().toSeq
    val oneShot = Similarity.ivfCellStats(emb, s, n)
      .orderBy("cell_id").as[(Long, Long, Array[Long])].collect().toSeq
    assert(incr.map(t => (t._1, t._2)) == oneShot.map(t => (t._1, t._2)))
    incr.zip(oneShot).foreach { case ((c, _, a), (_, _, b)) =>
      assert(a.toSeq == b.toSeq, s"cell $c sum-vector diverged from one-shot")
    }
    // drift semantics: stats == the training state itself → drift 0 for
    // every cell; a cell whose members are replaced by an orthogonal
    // direction drifts hard
    val trainedStats = s.zipWithIndex
      .map { case (sv, c) => (c.toLong, n(c), sv) }.toSeq
      .toDF("cell_id", "n", "sv")
    val zeroDrift = Similarity.ivfDriftReport(trainedStats, s, n, threshold = 1e-12)
      .orderBy("cell_id").as[(Long, Long, Double, Boolean)].collect().toSeq
    zeroDrift.foreach { case (c, _, d, flagged) =>
      assert(math.abs(d) < 1e-12 && !flagged, s"cell $c drifted ($d) vs itself")
    }
    val shifted = trainedStats.withColumn("sv",
      org.apache.spark.sql.functions.expr(
        "transform(sequence(1, 64), i -> CASE WHEN cell_id = 0 AND i = 1 THEN 100000L ELSE element_at(sv, i) END)"))
    val drifted = Similarity.ivfDriftReport(shifted, s, n, threshold = 0.01)
      .orderBy("cell_id").as[(Long, Long, Double, Boolean)].collect().toSeq
    assert(drifted.head._4 && drifted.tail.forall(!_._4),
      s"only the shifted cell should flag: $drifted")
    // applying the decision: ONLY the drifted cell takes its member
    // stats as the new centroid state; every other cell is untouched
    val (ns, nc) = Similarity.ivfReseed(shifted, s, n, threshold = 0.01)
    assert(ns(0)(0) == 100000L && ns(0).drop(1).toSeq == s(0).drop(1).toSeq
      && nc(0) == n(0))
    (1 until s.length).foreach { c =>
      assert(ns(c).toSeq == s(c).toSeq && nc(c) == n(c),
        s"undrifted cell $c changed under reseed")
    }
  }

  test("semanticDedup: verdicts match an in-cell brute-force check and planted dups prune") {
    import spark.implicits._
    val out = Similarity.semanticDedup(emb, threshold = 0.4, nCells = 16, iters = 2)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), if (r.isNullAt(2)) None else Some(r.getLong(2))))
    assert(out.length == emb.count())
    // recompute every verdict from the collected assignment: dup_of must
    // be the LOWEST lower-id cluster-mate above threshold, None otherwise
    val vecs = emb.collect().map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0
      var i = 0
      while (i < a.length) {
        d += a(i).toDouble * b(i); na += a(i).toDouble * a(i); nb += b(i).toDouble * b(i)
        i += 1
      }
      d / (math.sqrt(na) * math.sqrt(nb))
    }
    val byCell = out.groupBy(_._2)
    out.foreach { case (id, cell, dupOf) =>
      val mates = byCell(cell).map(_._1).filter(_ < id).sorted
      val expect = mates.find(m => cos(vecs(m), vecs(id)) > 0.4)
      assert(dupOf == expect, s"vec $id cell $cell: got $dupOf expected $expect")
    }
    // some verdicts must actually fire on this corpus (threshold 0.4)
    assert(out.exists(_._3.isDefined), "no semantic duplicates found at 0.4")
    // planted exact duplicates always prune toward the lower id
    val planted = emb.limit(20).as[(Long, Array[Float], Int)]
      .map { case (id, v, _) => (id + 10000L, v) }
      .toDF("vec_id", "embedding")
      .unionByName(emb.select("vec_id", "embedding"))
    val verdicts = Similarity.semanticDedup(planted, threshold = 0.99, nCells = 16, iters = 2)
      .filter(col("vec_id") >= 10000L).collect()
    verdicts.foreach { r =>
      // the original (cos = 1) qualifies, so dup_of is non-null and at
      // most the original's id (a fixture near-dup may rank lower still)
      assert(!r.isNullAt(2) && r.getLong(2) <= r.getLong(0) - 10000L,
        s"planted dup ${r.getLong(0)} not pruned: $r")
    }
  }

  test("semanticDedup is deterministic across partitionings") {
    def run(c: org.apache.spark.sql.DataFrame) =
      Similarity.semanticDedup(c, threshold = 0.4, nCells = 16, iters = 2)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), if (r.isNullAt(2)) None else Some(r.getLong(2))))
        .toSet
    assert(run(emb) == run(emb.repartition(13)))
  }

  test("ivfTopKQuant recall vs brute force") {
    val q = emb.filter(col("vec_id") < 20)
    val truth = Similarity.bruteForceTopK(q, emb, 5).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val approx = Similarity.ivfTopKQuant(q, emb, 5, nCells = 16, nProbe = 4, iters = 2).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(approx.nonEmpty)
    val recall = (approx & truth).size.toDouble / truth.size
    // 4-of-16 cells probed on an unclustered corpus: same ballpark as
    // the float-Lloyd variant's floor
    assert(recall >= 0.5, s"recall $recall")
  }
}
