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

  /** Immutable, serializable automaton. The goto function is flattened
    * into CSR-style parallel arrays — node v's transitions are
    * `chars/targets[charStart(v) until charStart(v+1))`, chars sorted
    * for binary search — keeping the per-character lookup boxing-free
    * and the broadcast compact. (Measured caveat: this flattening alone
    * was noise at 20x volume; the decisive cost was per-document
    * |lexicon|-sized count arrays — see the sparse reset in `tag`.)
    * `out` lists the keyword indices ending at each node (own +
    * inherited through fail links, pre-merged at build time so the
    * scan never chases fail chains for output). */
  final case class Automaton(charStart: Array[Int], chars: Array[Char],
                             targets: Array[Int], fail: Array[Int],
                             out: Array[Array[Int]], keywords: Array[String]) {
    /** goto(s, c), -1 when absent. */
    @inline def step(s: Int, c: Char): Int = {
      var lo = charStart(s)
      var hi = charStart(s + 1) - 1
      while (lo <= hi) {
        val mid = (lo + hi) >>> 1
        val mc = chars(mid)
        if (mc == c) return targets(mid)
        else if (mc < c) lo = mid + 1
        else hi = mid - 1
      }
      -1
    }
  }

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
    // flatten goto into CSR arrays, per-node chars sorted
    val n = next.length
    val charStart = new Array[Int](n + 1)
    var off = 0
    val chars = new Array[Char](next.iterator.map(_.size).sum)
    val targets = new Array[Int](chars.length)
    var v = 0
    while (v < n) {
      charStart(v) = off
      next(v).toArray.sortBy(_._1).foreach { case (c, t) =>
        chars(off) = c; targets(off) = t; off += 1
      }
      v += 1
    }
    charStart(n) = off
    Automaton(charStart, chars, targets, fail,
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
        // counts/touched are PARTITION-scoped and reset sparsely per
        // doc: zeroing + scanning a |lexicon|-sized array per document
        // was the measured bottleneck at 27k keywords (O(|lexicon|) per
        // doc dwarfs O(|text|)); tracking touched indices keeps the
        // per-doc cost at O(|text| + distinct matches).
        val counts = new Array[Long](ac.keywords.length)
        val touched = new Array[Int](ac.keywords.length)
        it.flatMap { case (id, text) =>
          var nTouched = 0
          if (text != null) {
            var s = 0
            var i = 0
            while (i < text.length) {
              val c = text.charAt(i)
              var t = ac.step(s, c)
              while (t < 0 && s != 0) { s = ac.fail(s); t = ac.step(s, c) }
              s = if (t >= 0) t else 0
              val hits = ac.out(s)
              var j = 0
              while (j < hits.length) {
                val k = hits(j)
                if (counts(k) == 0L) { touched(nTouched) = k; nTouched += 1 }
                counts(k) += 1L
                j += 1
              }
              i += 1
            }
          }
          val rows = new Array[(Long, String, Long)](nTouched)
          var r = 0
          while (r < nTouched) {
            val k = touched(r)
            rows(r) = (id, ac.keywords(k), counts(k))
            counts(k) = 0L // sparse reset for the next doc
            r += 1
          }
          rows
        }
      }
      .toDF(idCol, "keyword", "n")
  }
}
