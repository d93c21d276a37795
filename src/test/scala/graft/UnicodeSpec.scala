package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.ops.{Dedup, TextAnalysis}

/** Non-ASCII robustness for the hash-based text/dedup operators.
  *
  * The DuckDB oracles constrain ORACLE parity to BMP text (documented
  * on [[graft.ops.Dedup.strHash64]]); this spec pins down that the
  * ENGINE itself is correct and deterministic well beyond that —
  * Cyrillic, CJK, combining accents, and astral-plane emoji (surrogate
  * pairs, the case the oracle can't mirror) must dedup, span-match,
  * and fingerprint exactly like ASCII does.
  */
class UnicodeSpec extends AnyFunSuite {
  private lazy val spark = TestSession.spark
  import spark.implicits._

  private val cyr = ("съешь же ещё этих мягких французских булок да выпей чаю " * 3).trim
  private val cyrNear = cyr.replace("мягких", "твёрдых")
  private val greek = ("και το ταχύ καφέ αλεπού πηδά πάνω από το τεμπέλικο σκυλί " * 3).trim
  private val cjkRun = "机器 学习 模型 在 大规模 数据 上 训练 需要 去重 和 质量 过滤 🚀 流水线 处理 文本 语料 很 重要"

  test("strHash64: astral chars hash by surrogate pair, distinct and stable") {
    // U+1D54F (𝕏) is a surrogate pair; must differ from ASCII X and from
    // its own halves-as-separate-strings, and be call-stable.
    assert(Dedup.strHash64("𝕏") !== Dedup.strHash64("X"))
    assert(Dedup.strHash64("𝕏") === Dedup.strHash64("𝕏"))
    assert(Dedup.strHash64("é") !== Dedup.strHash64("é"), "NFC vs NFD are distinct strings")
  }

  test("minhash-LSH near-dups find the perturbed Cyrillic copy, not the Greek doc") {
    val docs = Seq((0L, cyr), (1L, cyrNear), (2L, greek))
      .toDF("doc_id", "text")
      .select(col("doc_id"), TextAnalysis.shingles3(col("text")).as("sh"))
    def run() = Dedup.minhashNearDups(docs, "doc_id", "sh", 0.5)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val got = run()
    assert(got === Set((0L, 1L)), s"expected exactly the perturbed pair, got $got")
    assert(got === run(), "non-deterministic across runs")
  }

  test("simhash pairs the perturbed CJK/emoji doc within hamming distance") {
    // Simhash bit-flip probability per changed token is Θ(1/√n) — a
    // realistic-length doc (10 repeats, token counts 10) keeps a
    // single-occurrence edit within the production maxDist=3, same as
    // ASCII docs of that length.
    val a = (cjkRun + " ") * 10
    val b = a.replaceFirst("文本", "图像")
    val docs = Seq((0L, a), (1L, b), (2L, greek)).toDF("doc_id", "text")
      .select(col("doc_id"), TextAnalysis.tokens(col("text")).as("toks"))
    val pairs = Dedup.simhashNearPairs(
        Dedup.simhash64(docs, "doc_id", "toks"), "doc_id", maxDist = 3)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((0L, 1L)), s"perturbed CJK pair missed: $pairs")
    assert(!pairs.exists(p => p._1 == 2L || p._2 == 2L), s"greek doc falsely paired: $pairs")
  }

  test("duplicated spans across CJK/emoji docs at different offsets, then removal") {
    // The shared 20-token CJK run sits at offset 3 in doc 0, offset 0 in doc 1.
    val d0 = s"пролог один два $cjkRun эпилог"
    val d1 = s"$cjkRun χ ψ ω"
    val docs = Seq((0L, d0), (1L, d1)).toDF("doc_id", "text")
    val spans = Dedup.duplicatedSpans(docs, "doc_id", "text", gramLen = 3, minRun = 5)
      .collect()
    assert(spans.length === 1, s"expected one span, got ${spans.mkString("; ")}")
    val s = spans.head
    assert(s.getAs[Long]("start_a") === 3L && s.getAs[Long]("start_b") === 0L,
      s"wrong offsets: $s")
    assert(s.getAs[Long]("span_tokens") === 20L, s"wrong span length: $s")

    val cut = Dedup.removeDuplicatedSpans(docs, "doc_id", "text", gramLen = 3, minRun = 5)
      .orderBy("doc_id").collect()
    assert(cut(0).getAs[String]("text") === d0, "lowest-id occurrence must survive intact")
    assert(cut(1).getAs[Long]("n_removed") === 20L, s"span not cut from higher id: ${cut(1)}")
    assert(cut(1).getAs[String]("text") === "χ ψ ω", s"unexpected remainder: ${cut(1)}")
  }

  test("winnowing fingerprints are deterministic and non-trivial on astral text") {
    val t = "😀🚀🎉 ĤĕĺĻō wörld 机器学习 κόσμος"
    val f1 = Dedup.winnowFingerprints(t)
    assert(f1.nonEmpty)
    assert(f1.toSeq === Dedup.winnowFingerprints(t).toSeq)
    // Robust winnowing is INSENSITIVE to a 1-char suffix by design
    // (same window minima survive) — a changed PREFIX shifts every
    // k-gram and must change the fingerprint set.
    assert(f1.toSeq !== Dedup.winnowFingerprints("другой префикс " + t).toSeq)
  }

  test("cleanText / tokens / quality expressions survive astral input") {
    val df = Seq((0L, s"  ${cjkRun}  "), (1L, "😀 ­ é 𝕏 plain"))
      .toDF("doc_id", "text")
      .select(col("doc_id"),
        TextAnalysis.cleanText(col("text")).as("clean"),
        size(TextAnalysis.tokens(col("text"))).as("n_tok"))
      .collect()
    assert(df.length === 2)
    assert(df.forall(_.getAs[String]("clean") != null))
    assert(df.forall(_.getAs[Int]("n_tok") > 0))
  }
}
