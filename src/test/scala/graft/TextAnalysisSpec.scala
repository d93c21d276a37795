package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions.col
import graft.ops.TextAnalysis._

class TextAnalysisSpec extends AnyFunSuite {
  private lazy val spark = TestSession.spark
  import spark.implicits._

  private def one[T](c: org.apache.spark.sql.Column, text: String): T =
    Seq(text).toDF("text").select(c.as("r")).collect().head.getAs[T]("r")

  test("tokens drops empties; counts") {
    assert(one[Int](tokenCount(col("text")), "a  b c") == 3)
    assert(one[Int](tokenCount(col("text")), "") == 0)
    assert(one[Int](distinctTokenCount(col("text")), "a b a") == 2)
  }

  test("shingles3 guards short docs (no descending-sequence bug)") {
    assert(one[collection.Seq[String]](shingles3(col("text")), "a b").toSeq == Seq.empty)
    assert(one[collection.Seq[String]](shingles3(col("text")), "a b c d").toSeq == Seq("a b c", "b c d"))
  }

  test("bigrams") {
    assert(one[collection.Seq[String]](bigrams(col("text")), "x").toSeq == Seq.empty)
    assert(one[collection.Seq[String]](bigrams(col("text")), "x y z").toSeq == Seq("x y", "y z"))
  }

  test("fingerprint matches hand-rolled polynomial hash") {
    val expected = "ab".foldLeft(0L)((acc, c) => (acc * 31 + c.toInt) % 1000000007L)
    assert(one[Long](fingerprint(col("text")), "ab") == expected)
    assert(one[Long](fingerprint(col("text")), "") == 0L)
  }

  test("langId votes with precedence; no markers -> und") {
    assert(one[String](langIdPredicted(col("text")), "the cat and dog") == "en")
    assert(one[String](langIdPredicted(col("text")), "el los gato") == "es")
    assert(one[String](langIdPredicted(col("text")), "xyz qqq") == "und")
    // tie en vs es resolves to en (fixed precedence)
    assert(one[String](langIdPredicted(col("text")), "the el") == "en")
  }

  test("langIdCharNgram scores char trigrams with same precedence contract") {
    assert(one[String](langIdCharNgram(col("text")), "the cat of the house") == "en")
    assert(one[String](langIdCharNgram(col("text")), "der hund und das") == "de")
    assert(one[String](langIdCharNgram(col("text")), "zzz qqq") == "und")
  }

  test("qualityScore bounded [0,1]") {
    val s = one[Double](qualityScore(col("text")), "the " * 200)
    assert(s >= 0.0 && s <= 1.0)
    assert(one[Double](qualityScore(col("text")), "") == 0.0)
  }

  test("redactPii scrubs emails, IPs, cards, phones; leaves clean text alone") {
    def red(s: String) = one[String](redactPii(col("text")), s)
    assert(red("mail me at jane.doe+x@example.co.uk today") == "mail me at <EMAIL> today")
    assert(red("server 192.168.0.1 down") == "server <IP> down")
    assert(red("card 4111 1111 1111 1111 on file") == "card <CARD> on file")
    assert(red("call +1 (415) 555-2671 now") == "call <PHONE> now")
    assert(red("call 020 7946 0958.") == "call <PHONE>.")
    val clean = "no personal data here just words and the number 42"
    assert(red(clean) == clean)
  }

  test("piiCount counts exactly what redactPii replaces") {
    def cnt(s: String) = one[Int](piiCount(col("text")), s)
    assert(cnt("a@b.com and c@d.org at 10.0.0.1") == 3)
    assert(cnt("call +1 (415) 555-2671 now") == 1)
    // a card run counts once, not again as a phone
    assert(cnt("card 4111 1111 1111 1111 on file") == 1)
    assert(cnt("nothing here") == 0)
  }

  test("CMS heavy hitters: one-sided estimates, exact on the dominant token") {
    val docs = graft.sources.Tables(spark, TestSession.sf0001).documents
    val hh = graft.ops.Sketches.cmsHeavyHitters(docs, "text", k = 50).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(hh.nonEmpty)
    // CMS never under-counts
    hh.foreach { case (tok, exact, est) =>
      assert(est >= exact, s"'$tok': est $est < exact $exact")
    }
    // excess stays near the N/width expectation (one row would give
    // E[excess] = N/1024; min over 4 rows is far tighter)
    val n = hh.map(_._2).sum // lower bound on N; real N is the full token count
    hh.foreach { case (tok, exact, est) =>
      assert(est - exact <= math.max(64L, n / 16),
        s"'$tok': excess ${est - exact} too large for a 4x1024 sketch")
    }
  }

  test("bigram LM: in-distribution text scores higher than scrambled text") {
    import graft.ops.LanguageModel
    val fluent = "the quick brown fox jumps over the lazy dog near the river bank today"
    val train = Seq(
      (1L, fluent), (2L, fluent), (3L, s"$fluent and then $fluent"))
      .toDF("doc_id", "text")
    val model = LanguageModel.trainBigramModel(train, "text")
    // every training bigram has p in (0, 1]
    val ps = model.select("p").collect().map(_.getDouble(0))
    assert(ps.nonEmpty && ps.forall(p => p > 0 && p <= 1.0))
    val probe = Seq(
      (10L, fluent),                                                   // in-distribution
      (11L, "dog lazy the over jumps fox brown quick the bank river")) // scrambled
      .toDF("doc_id", "text")
    val scores = LanguageModel.scoreDocs(probe, "doc_id", "text", model)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(scores(10L) > scores(11L) + 1.0,
      s"fluent ${scores(10L)} not above scrambled ${scores(11L)}")
    // a doc with one token has no bigrams and is omitted
    val one = LanguageModel.scoreDocs(
      Seq((20L, "word")).toDF("doc_id", "text"), "doc_id", "text", model)
    assert(one.isEmpty)
  }

  test("contamination: planted benchmark sentence is flagged, clean docs are not") {
    val bench = "what is the capital of france and when was it founded exactly"
    val train = Seq(
      (1L, s"some long preamble then $bench plus trailing words"), // contaminated
      (2L, "a completely clean document about spark shuffle internals and memory"),
      (3L, "capital france founded when exactly scrambled words no shared trigram run"))
      .toDF("doc_id", "text")
    val evalSet = Seq((100L, bench)).toDF("doc_id", "text")
    val report = graft.ops.Contamination.overlapReport(train, evalSet, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(report.map(_._1).toSet == Set(1L), s"flagged: ${report.toSeq}")
    assert(report.head._3 >= 9, s"shared trigrams: ${report.head._3}") // 11-word sentence → 9 trigrams
    val dropList = graft.ops.Contamination.contaminatedIds(train, evalSet, "doc_id", "text")
      .collect().map(_.getLong(0)).toSet
    assert(dropList == Set(1L))
    // minHits raises the bar: no pair shares >= 100 trigrams
    assert(graft.ops.Contamination.overlapReport(train, evalSet, "doc_id", "text",
      minHits = 100L).isEmpty)
  }
}
