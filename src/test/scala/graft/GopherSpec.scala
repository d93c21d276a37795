package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.ops.TextAnalysis.Gopher

/** Unit coverage for the Gopher rule set on hand-built docs — the
  * corpus is single-line synthetic text, so the line-structure rules
  * (bullets, ellipsis endings) only fire here. */
class GopherSpec extends AnyFunSuite {
  private lazy val spark = TestSession.spark
  import spark.implicits._

  private def flags(text: String): (Double, Double, Double, Double, Int, Boolean) = {
    val r = Seq(text).toDF("text").select(
      Gopher.meanWordLength(col("text")).as("mwl"),
      Gopher.symbolToWordRatio(col("text")).as("sym"),
      Gopher.bulletLineFraction(col("text")).as("bul"),
      Gopher.ellipsisLineFraction(col("text")).as("ell"),
      Gopher.requiredStopwordHits(col("text")).as("stop"),
      coalesce(Gopher.keep(col("text"), minWords = 5), lit(false)).as("keep")
    ).collect().head
    (r.getDouble(0), r.getDouble(1), r.getDouble(2), r.getDouble(3),
      r.getInt(4), r.getBoolean(5))
  }

  test("clean prose with two required stopwords keeps") {
    val (mwl, sym, bul, ell, stop, keep) =
      flags("the quick brown foxes jumped over seven lazy dogs and cats daily")
    assert(mwl >= 3.0 && mwl <= 10.0)
    assert(sym == 0.0 && bul == 0.0 && ell == 0.0)
    assert(stop == 2) // "the", "and"
    assert(keep)
  }

  test("only one required stopword rejects") {
    val (_, _, _, _, stop, keep) =
      flags("the quick brown foxes jumped over seven lazy dogs swiftly today")
    assert(stop == 1)
    assert(!keep)
  }

  test("bullet-dominated doc rejects via line rule") {
    val bullets = (1 to 10).map(i => s"- item number $i of the list and more").mkString("\n")
    val (_, _, bul, _, _, keep) = flags(bullets)
    assert(bul == 1.0)
    assert(!keep)
  }

  test("ellipsis-ended lines reject past 30%") {
    val t = "the first line ends with more to come...\nand this one too...\nplain third line of the doc"
    val (_, _, _, ell, _, keep) = flags(t)
    assert(math.abs(ell - 2.0 / 3.0) < 1e-9)
    assert(!keep)
  }

  test("symbol-heavy doc rejects") {
    val t = "the ### tags ### and ### more ### tags ### here ### now"
    val (_, sym, _, _, _, keep) = flags(t)
    assert(sym > 0.1)
    assert(!keep)
  }

  test("numeric-token doc rejects via alpha-word fraction") {
    val t = "the 101 202 303 404 505 606 707 808 909 and 111 222 333"
    val r = Seq(t).toDF("text")
      .select(Gopher.alphaWordFraction(col("text")).as("a"),
        coalesce(Gopher.keep(col("text"), minWords = 5), lit(false)).as("keep"))
      .collect().head
    assert(r.getDouble(0) < 0.8)
    assert(!r.getBoolean(1))
  }

  test("word-count bounds reject short docs") {
    val (_, _, _, _, _, keep) = flags("the cat and dog")
    assert(!keep) // 4 words < minWords=5
  }
}
