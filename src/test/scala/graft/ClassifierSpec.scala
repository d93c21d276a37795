package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.ops.Classifier

class ClassifierSpec extends AnyFunSuite {
  private lazy val spark = TestSession.spark
  import spark.implicits._

  // Two classes with disjoint vocabularies plus shared filler — any
  // working multinomial NB separates these perfectly.
  private def corpus(n: Int) = {
    val rnd = new scala.util.Random(7)
    (0 until n).map { i =>
      val sporty = i % 2 == 0
      val vocab = if (sporty) Seq("goal", "match", "team", "score")
                  else Seq("loop", "stack", "query", "thread")
      val words = (0 until 20).map(_ => vocab(rnd.nextInt(vocab.size))) ++
        Seq("the", "and", "of")
      (i.toLong, words.mkString(" "), if (sporty) "sport" else "tech")
    }.toDF("id", "text", "label")
  }

  test("NB separates disjoint-vocabulary classes perfectly") {
    val df = corpus(200)
    val model = Classifier.naiveBayesTrain(df.filter($"id" < 160), "text", "label")
    val pred = Classifier.naiveBayesPredict(
      df.filter($"id" >= 160), model, "id", "text")
    val joined = pred.join(df, Seq("id"))
    assert(joined.count() == 40)
    assert(joined.filter($"pred" === $"label").count() == 40)
  }

  test("token-free docs fall back to the prior argmax") {
    val train = Seq((1L, "a a a", "big"), (2L, "b", "big"), (3L, "c", "small"))
      .toDF("id", "text", "label")
    val model = Classifier.naiveBayesTrain(train, "text", "label")
    val pred = Classifier.naiveBayesPredict(
      Seq((10L, "")).toDF("id", "text"), model, "id", "text")
      .collect().head
    assert(pred.getAs[String]("pred") == "big") // 2 docs vs 1
    assert(pred.getAs[Long]("n_tokens") == 0L)
  }

  test("a class whose training docs have no tokens keeps its prior") {
    val train = Seq((1L, "x y", "a"), (2L, "   ", "b"), (3L, "", "b"))
      .toDF("id", "text", "label")
    val model = Classifier.naiveBayesTrain(train, "text", "label")
    val labels = model.labels.collect()
      .map(r => r.getAs[String]("label") ->
        (r.getAs[Long]("n_tokens"), r.getAs[Long]("n_docs"))).toMap
    // inner-joining totals would silently delete class b from the model
    assert(labels.contains("b"), s"token-free class dropped: $labels")
    assert(labels("b") == (0L, 2L), s"wrong b stats: $labels")
    // an empty doc scores on priors alone: b (2 docs) beats a (1 doc)
    val pred = Classifier.naiveBayesPredict(
      Seq((10L, "")).toDF("id", "text"), model, "id", "text").collect().head
    assert(pred.getAs[String]("pred") == "b", s"got $pred")
  }

  test("predictions are deterministic across partitionings") {
    val df = corpus(100)
    def run(parts: Int) = Classifier.naiveBayesPredict(
      df.repartition(parts),
      Classifier.naiveBayesTrain(df.repartition(parts), "text", "label"),
      "id", "text").orderBy("id")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(run(1) == run(13))
  }

  test("minCount prunes the model table but keeps totals honest") {
    val df = corpus(100)
    val full = Classifier.naiveBayesTrain(df, "text", "label", minCount = 1)
    val pruned = Classifier.naiveBayesTrain(df, "text", "label", minCount = 1000)
    assert(pruned.tokenCounts.count() < full.tokenCounts.count())
    // class token totals are computed before pruning
    val fullTotals = full.labels.select("label", "n_tokens").collect().toSet
    val prunedTotals = pruned.labels.select("label", "n_tokens").collect().toSet
    assert(fullTotals.map(r => (r.getString(0), r.getLong(1))) ==
      prunedTotals.map(r => (r.getString(0), r.getLong(1))))
  }
}
