package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multi-keyword tagging: count every occurrence of every keyword in
  * one pass per document via a broadcast Aho–Corasick automaton.
  *
  * This is the blocklist / contamination-canary / topic-lexicon shape:
  * the keyword set can reach 10⁵–10⁶ entries, where a regex
  * alternation degrades to per-keyword scans (or an NFA with
  * |keywords| live states) and a per-keyword `contains` loop is
  * O(|text|·|keywords|). Aho–Corasick is O(|text| + matches) per
  * document regardless of keyword count.
  *
  * Scale shape: the automaton builds once on the driver —
  * O(Σ|keyword|) time and memory, linear in the LEXICON, independent
  * of the corpus — and ships to executors as one broadcast; the scan
  * itself is a narrow mapPartitions (no shuffle until the caller
  * aggregates). Matches are counted at every end position (overlaps
  * included), the automaton's natural semantics and the one the
  * positional SQL oracle reproduces exactly.
  */
object KeywordTagger {

  /** Immutable, serializable automaton. `next` is the goto function per
    * node (char → node), `out` lists the keyword indices ending at each
    * node (own + inherited through fail links, pre-merged at build time
    * so the scan never chases fail chains for output). */
  final case class Automaton(next: Array[Map[Char, Int]], fail: Array[Int],
                             out: Array[Array[Int]], keywords: Array[String])

  def build(keywords: Seq[String]): Automaton = {
    require(keywords.nonEmpty, "KeywordTagger: empty keyword set")
    require(keywords.forall(_.nonEmpty), "KeywordTagger: empty keyword")
    require(keywords.distinct.size == keywords.size,
      "KeywordTagger: duplicate keywords")
    val next = scala.collection.mutable.ArrayBuffer(
      scala.collection.mutable.Map.empty[Char, Int])
    val outB = scala.collection.mutable.ArrayBuffer(List.empty[Int])
    // trie
    keywords.zipWithIndex.foreach { case (kw, ki) =>
      var s = 0
      kw.foreach { c =>
        s = next(s).getOrElseUpdate(c, {
          next += scala.collection.mutable.Map.empty[Char, Int]
          outB += Nil
          next.length - 1
        })
      }
      outB(s) = ki :: outB(s)
    }
    // fail links, BFS; outputs inherit from the fail target (already
    // finalized when its children are visited), so out is transitive
    val fail = Array.fill(next.length)(0)
    val queue = scala.collection.mutable.Queue.empty[Int]
    next(0).values.foreach(queue += _)
    while (queue.nonEmpty) {
      val u = queue.dequeue()
      next(u).foreach { case (c, v) =>
        var f = fail(u)
        while (f != 0 && !next(f).contains(c)) f = fail(f)
        fail(v) = if (next(f).contains(c) && next(f)(c) != v) next(f)(c) else 0
        outB(v) = outB(v) ::: outB(fail(v))
        queue += v
      }
    }
    Automaton(next.map(_.toMap).toArray, fail,
      outB.map(_.toArray).toArray, keywords.toArray)
  }

  /** One row per (doc, keyword) with n > 0: (idCol, keyword, n). */
  def tag(docs: DataFrame, idCol: String, textCol: String,
          keywords: Seq[String]): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val acB = spark.sparkContext.broadcast(build(keywords))
    docs.select(col(idCol).cast("long"), col(textCol).cast("string"))
      .as[(Long, String)]
      .mapPartitions { it =>
        val ac = acB.value
        it.flatMap { case (id, text) =>
          val counts = new Array[Long](ac.keywords.length)
          if (text != null) {
            var s = 0
            var i = 0
            while (i < text.length) {
              val c = text.charAt(i)
              while (s != 0 && !ac.next(s).contains(c)) s = ac.fail(s)
              s = ac.next(s).getOrElse(c, 0)
              val hits = ac.out(s)
              var j = 0
              while (j < hits.length) { counts(hits(j)) += 1L; j += 1 }
              i += 1
            }
          }
          counts.indices.iterator
            .filter(counts(_) > 0L)
            .map(k => (id, ac.keywords(k), counts(k)))
        }
      }
      .toDF(idCol, "keyword", "n")
  }
}
