package graft

import graft.ops.KeywordTagger
import org.scalatest.funsuite.AnyFunSuite

class KeywordTaggerSpec extends AnyFunSuite {
  private lazy val spark = TestSession.spark
  import spark.implicits._

  private def run(text: String, kws: Seq[String]): Map[String, Long] =
    KeywordTagger.tag(Seq((1L, text)).toDF("doc_id", "text"), "doc_id", "text", kws)
      .collect().map(r => r.getString(1) -> r.getLong(2)).toMap

  test("counts every end position, overlaps included") {
    // "aa" ends at positions 2,3,4 in "aaaa"
    assert(run("aaaa", Seq("aa")) == Map("aa" -> 3L))
  }

  test("nested keywords all fire at the same end position") {
    // "she" ends → "he" also ends there via the output fail-chain merge
    assert(run("ushers", Seq("he", "she", "hers")) ==
      Map("he" -> 1L, "she" -> 1L, "hers" -> 1L))
  }

  test("fail transitions recover mid-keyword (no restart-from-scratch misses)") {
    // after matching "abab", failing on 'x' must not lose the "ab" that
    // could start "abx"... and "baba" overlaps "abab" through fail links
    assert(run("ababab", Seq("abab")) == Map("abab" -> 2L))
    assert(run("ababab", Seq("abab", "baba")) == Map("abab" -> 2L, "baba" -> 1L))
  }

  test("phrases cross token boundaries; absent keywords yield no rows") {
    val got = run("the table value is a table", Seq("table value", "zzz"))
    assert(got == Map("table value" -> 1L))
  }

  test("null text yields no rows, keyword validation rejects bad lexicons") {
    val df = Seq((1L, null.asInstanceOf[String]), (2L, "row row")).toDF("doc_id", "text")
    val got = KeywordTagger.tag(df, "doc_id", "text", Seq("row"))
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSeq
    assert(got == Seq((2L, 2L)))
    intercept[IllegalArgumentException](KeywordTagger.build(Seq.empty))
    intercept[IllegalArgumentException](KeywordTagger.build(Seq("a", "a")))
    intercept[IllegalArgumentException](KeywordTagger.build(Seq("")))
  }

  test("matches a per-keyword contains-scan baseline on a 200-doc corpus") {
    val vocab = Vector("spark", "table", "value", "fast", "key", "scan", "agg", "row", "a")
    val docs = (0 until 200).map { i =>
      val r = new scala.util.Random(i)
      (i.toLong, Vector.fill(40)(vocab(r.nextInt(vocab.length))).mkString(" "))
    }
    val kws = Seq("spark", "table value", "fast key", "agg", "row", "a a")
    val got = KeywordTagger.tag(docs.toDF("doc_id", "text"), "doc_id", "text", kws)
      .collect().map(r => (r.getLong(0), r.getString(1)) -> r.getLong(2)).toMap
    val expected = (for {
      (id, text) <- docs
      kw <- kws
      n = Iterator.range(0, text.length - kw.length + 1)
        .count(p => text.regionMatches(p, kw, 0, kw.length))
      if n > 0
    } yield (id, kw) -> n.toLong).toMap
    assert(got == expected)
  }
}
