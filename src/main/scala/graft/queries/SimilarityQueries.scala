package graft.queries

import org.apache.spark.sql.functions._
import graft.ops.Similarity
import graft.sources.Tables

/** SURVEY §2.6 E2 — similarity search over `embeddings`. */
object SimilarityQueries {

  // Exact cosine top-5 for query vectors vec_id < 5: broadcast the query
  // set, one scan of the corpus, per-query window top-k.
  private val knn = QueryDef("e2_knn_brute", Some(
    """WITH q AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qe
      |           FROM embeddings WHERE vec_id < 5),
      |c AS (SELECT vec_id AS neighbor_id, embedding::DOUBLE[] AS ne FROM embeddings),
      |s AS (SELECT query_id, neighbor_id,
      |             list_dot_product(qe, ne)
      |               / (sqrt(list_dot_product(qe, qe)) * sqrt(list_dot_product(ne, ne))) AS cos
      |      FROM q, c WHERE query_id <> neighbor_id),
      |r AS (SELECT query_id, neighbor_id, cos,
      |             cast(row_number() OVER (PARTITION BY query_id
      |                                     ORDER BY cos DESC, neighbor_id) AS INT) AS rk
      |      FROM s)
      |SELECT query_id, neighbor_id, cos, rk FROM r WHERE rk <= 5""".stripMargin)) { (spark, dir) =>
    val e = Tables(spark, dir).embeddings
    Similarity.bruteForceTopK(e.filter(col("vec_id") < 5), e, k = 5)
  }

  // LSH-bucketed approximate top-5 (the scale path: same-bucket
  // candidates only). The integer sign-LSH signatures are exact int64
  // arithmetic, so the DuckDB oracle reproduces the full operator —
  // bucketing, candidate join, exact rescoring, top-k — bit-for-bit
  // (was rows-only when the planes were JVM-seeded gaussians).
  private val ann = QueryDef("e2_ann_topk", Some(
    """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
      |q AS (SELECT vec_id, v, list_transform(v, x -> CAST(floor(x * 1048576) AS BIGINT)) AS qv FROM e),
      |idx AS (SELECT tbl, j, i, ((tbl*4 + j)*64 + i + 1) AS x
      |        FROM range(0,8) t(tbl), range(0,4) jj(j), range(0,64) ii(i)),
      |w1 AS (SELECT tbl, j, i, (x*2654435761) % 4294967296 AS h FROM idx),
      |w2 AS (SELECT tbl, j, i, (xor(h, h//65536) * 40503) % 4294967296 AS h FROM w1),
      |wt AS (SELECT tbl, j, i, xor(h, h//8192) - 2147483648 AS w FROM w2),
      |wl AS (SELECT tbl, j, list(w ORDER BY i) AS wv FROM wt GROUP BY tbl, j),
      |proj AS (SELECT q.vec_id, wl.tbl, wl.j,
      |           list_sum(list_transform(range(1,65), i -> q.qv[i]*wl.wv[i])) AS s
      |         FROM q, wl),
      |sig AS (SELECT vec_id, tbl,
      |          sum(CASE WHEN s > 0 THEN (1::BIGINT << j) ELSE 0 END) AS bucket
      |        FROM proj GROUP BY vec_id, tbl),
      |cand AS (SELECT DISTINCT a.vec_id AS query_id, b.vec_id AS neighbor_id
      |         FROM sig a JOIN sig b ON a.tbl = b.tbl AND a.bucket = b.bucket
      |         WHERE a.vec_id < 5 AND a.vec_id <> b.vec_id),
      |s AS (SELECT query_id, neighbor_id,
      |             list_dot_product(ea.v, eb.v)
      |               / (sqrt(list_dot_product(ea.v, ea.v)) * sqrt(list_dot_product(eb.v, eb.v))) AS cos
      |      FROM cand JOIN e ea ON ea.vec_id = cand.query_id JOIN e eb ON eb.vec_id = cand.neighbor_id),
      |r AS (SELECT query_id, neighbor_id, cos,
      |             cast(row_number() OVER (PARTITION BY query_id
      |                                     ORDER BY cos DESC, neighbor_id) AS INT) AS rk
      |      FROM s)
      |SELECT query_id, neighbor_id, cos, rk FROM r WHERE rk <= 5""".stripMargin)) { (spark, dir) =>
    val e = Tables(spark, dir).embeddings
    Similarity.annTopK(e.filter(col("vec_id") < 5), e, k = 5)
  }

  // IVF cells + probing — the clustered scale path, in its
  // deterministic integer-quantized form: seeds by a 32-bit avalanche
  // mix of vec_id, two integer-Lloyd rounds (exact associative sums),
  // assignment by dot(q, S_c)/n_c with one IEEE double division. Every
  // step replays bit-for-bit in SQL, so the FULL operator — training,
  // assignment, probing, rescoring, top-k — is hash-checked (was
  // rows-only when training used float means, whose partial-combine
  // order isn't reproducible). The float-Lloyd ivfTopK keeps its
  // recall specs as the statistically-nicer variant.
  private def ivfAssign(st: String, t: String, src: String = "q"): String =
    s"""a$t AS (SELECT q.vec_id, s.cell_id,
       |         (list_sum(list_transform(range(1, 65), i -> q.qv[i] * s.sv[i]))::DOUBLE
       |          / s.n::DOUBLE) AS m
       |       FROM $src q, $st s),
       |r$t AS (SELECT vec_id, cell_id,
       |          row_number() OVER (PARTITION BY vec_id ORDER BY m DESC, cell_id) AS rn
       |        FROM a$t),
       |g$t AS (SELECT vec_id, cell_id FROM r$t WHERE rn = 1)""".stripMargin
  private def ivfUpdate(prev: String, t: String, src: String = "q"): String =
    s"""s${t}e AS (SELECT g$t.cell_id, unnest(q.qv) AS x, generate_subscripts(q.qv, 1) AS i
       |        FROM g$t JOIN $src q USING (vec_id)),
       |s${t}g AS (SELECT cell_id, i, sum(x)::BIGINT AS sx FROM s${t}e GROUP BY cell_id, i),
       |s${t}v AS (SELECT cell_id, list(sx ORDER BY i) AS sv FROM s${t}g GROUP BY cell_id),
       |n$t AS (SELECT cell_id, count(*)::BIGINT AS n FROM g$t GROUP BY cell_id),
       |st$t AS (SELECT p.cell_id, coalesce(v.sv, p.sv) AS sv, coalesce(n$t.n, p.n) AS n
       |        FROM $prev p LEFT JOIN s${t}v v USING (cell_id) LEFT JOIN n$t USING (cell_id))""".stripMargin
  private val ivf = QueryDef("e2_ivf_topk", Some(
    s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
       |q AS (SELECT vec_id, v,
       |        list_transform(v, x -> CAST(floor(x * 1024) AS BIGINT)) AS qv FROM e),
       |mx0 AS (SELECT vec_id, ((vec_id + 1) * 2654435761) % 4294967296 AS h FROM q),
       |mx1 AS (SELECT vec_id, (xor(h, h // 65536) * 40503) % 4294967296 AS h FROM mx0),
       |mx AS (SELECT vec_id, xor(h, h // 8192) AS h FROM mx1),
       |sd AS (SELECT mx.h, mx.vec_id, q.qv FROM mx JOIN q USING (vec_id)
       |       ORDER BY mx.h, mx.vec_id LIMIT 16),
       |st0 AS (SELECT cast(row_number() OVER (ORDER BY h, vec_id) AS BIGINT) - 1 AS cell_id,
       |               qv AS sv, 1::BIGINT AS n
       |        FROM sd),
       |${ivfAssign("st0", "1")},
       |${ivfUpdate("st0", "1")},
       |${ivfAssign("st1", "2")},
       |${ivfUpdate("st1", "2")},
       |${ivfAssign("st2", "f")},
       |pf AS (SELECT vec_id AS query_id, cell_id,
       |          row_number() OVER (PARTITION BY vec_id ORDER BY m DESC, cell_id) AS rn
       |       FROM af WHERE vec_id < 5),
       |pr AS (SELECT query_id, cell_id FROM pf WHERE rn <= 4),
       |cand AS (SELECT pr.query_id, gf.vec_id AS neighbor_id
       |         FROM pr JOIN gf USING (cell_id) WHERE pr.query_id <> gf.vec_id),
       |sc AS (SELECT query_id, neighbor_id,
       |             list_dot_product(ea.v, eb.v)
       |               / (sqrt(list_dot_product(ea.v, ea.v)) * sqrt(list_dot_product(eb.v, eb.v))) AS cos
       |       FROM cand JOIN e ea ON ea.vec_id = cand.query_id
       |                 JOIN e eb ON eb.vec_id = cand.neighbor_id),
       |rr AS (SELECT query_id, neighbor_id, cos,
       |             cast(row_number() OVER (PARTITION BY query_id
       |                                     ORDER BY cos DESC, neighbor_id) AS INT) AS rk
       |       FROM sc)
       |SELECT query_id, neighbor_id, cos, rk FROM rr WHERE rk <= 5""".stripMargin)) { (spark, dir) =>
    val e = Tables(spark, dir).embeddings
    Similarity.ivfTopKQuant(e.filter(col("vec_id") < 5), e, k = 5,
      nCells = 16, nProbe = 4, iters = 2)
  }

  // SemDeDup semantic dedup: same deterministic integer k-means as
  // e2_ivf_topk (seeds, two Lloyd rounds, final assignment all replay
  // in SQL), then within each cell a vector is pruned iff some
  // lower-id cluster-mate's exact cosine exceeds 0.4 — the in-cell
  // self-join IS the scale story (Σ|cell|², never |corpus|²). One
  // verdict row per vector keeps the whole operator hash-checkable.
  private val semdedup = QueryDef("e1_semantic_dedup", Some(
    s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
       |q AS (SELECT vec_id, v,
       |        list_transform(v, x -> CAST(floor(x * 1024) AS BIGINT)) AS qv FROM e),
       |mx0 AS (SELECT vec_id, ((vec_id + 1) * 2654435761) % 4294967296 AS h FROM q),
       |mx1 AS (SELECT vec_id, (xor(h, h // 65536) * 40503) % 4294967296 AS h FROM mx0),
       |mx AS (SELECT vec_id, xor(h, h // 8192) AS h FROM mx1),
       |sd AS (SELECT mx.h, mx.vec_id, q.qv FROM mx JOIN q USING (vec_id)
       |       ORDER BY mx.h, mx.vec_id LIMIT 16),
       |st0 AS (SELECT cast(row_number() OVER (ORDER BY h, vec_id) AS BIGINT) - 1 AS cell_id,
       |               qv AS sv, 1::BIGINT AS n
       |        FROM sd),
       |${ivfAssign("st0", "1")},
       |${ivfUpdate("st0", "1")},
       |${ivfAssign("st1", "2")},
       |${ivfUpdate("st1", "2")},
       |${ivfAssign("st2", "f")},
       |pc AS (SELECT a.vec_id AS kept_id, b.vec_id AS cand_id,
       |          list_dot_product(ea.v, eb.v)
       |            / (sqrt(list_dot_product(ea.v, ea.v)) * sqrt(list_dot_product(eb.v, eb.v))) AS cos
       |       FROM gf a JOIN gf b ON a.cell_id = b.cell_id AND a.vec_id < b.vec_id
       |       JOIN e ea ON ea.vec_id = a.vec_id
       |       JOIN e eb ON eb.vec_id = b.vec_id),
       |dup AS (SELECT cand_id AS vec_id, min(kept_id) AS dup_of
       |        FROM pc WHERE cos > 0.4 GROUP BY 1)
       |SELECT gf.vec_id, gf.cell_id, dup.dup_of
       |FROM gf LEFT JOIN dup USING (vec_id)""".stripMargin)) { (spark, dir) =>
    Similarity.semanticDedup(Tables(spark, dir).embeddings, threshold = 0.4,
      nCells = 16, iters = 2)
  }

  // Per-label centroids as (label, dim, mean) rows — the map-side-
  // combinable shape distributed k-means uses for its mean step
  // (posexplode then partial-agg per (label, dim); the shuffle carries
  // one partial sum per group, not vectors). 1-based dim to match
  // SQL's generate_subscripts.
  private val centroids = QueryDef("e2_label_centroids", Some(
    """SELECT label, cast(i AS INT) AS dim_idx, avg(v) AS avg_val, count(*) AS n_vecs
      |FROM (SELECT label, unnest(embedding::DOUBLE[]) AS v,
      |             generate_subscripts(embedding, 1) AS i
      |      FROM embeddings)
      |GROUP BY label, i""".stripMargin)) { (spark, dir) =>
    Tables(spark, dir).embeddings
      .select(col("label"), posexplode(col("embedding")).as(Seq("i", "v")))
      .groupBy(col("label"), (col("i") + 1).as("dim_idx"))
      .agg(avg(col("v").cast("double")).as("avg_val"),
        count(lit(1)).as("n_vecs"))
  }

  // Int8 quantization report: per-vector scale, quantized sum, and the
  // reconstruction cosine cos(v, q) (== cos(v, dequantized v), the
  // positive scale cancels). floor(x+0.5) rounding is bit-identical in
  // SQL, so the whole quantizer is oracle-checked. bench=false: a
  // 500-row fixture op; the scale story is storage, not CPU.
  private val quantize = QueryDef("e2_quantize_int8", Some(
    """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
      |s AS (SELECT vec_id, v,
      |             list_max(list_transform(v, x -> abs(x))) / 127.0 AS scale
      |      FROM e),
      |q AS (SELECT vec_id, v, scale,
      |             CASE WHEN scale > 0
      |                  THEN list_transform(v, x -> floor(x / scale + 0.5))
      |                  ELSE list_transform(v, x -> 0.0) END AS qv
      |      FROM s)
      |SELECT vec_id, scale,
      |       cast(list_sum(qv) AS BIGINT) AS q_sum,
      |       list_dot_product(v, qv)
      |         / (sqrt(list_dot_product(v, v)) * sqrt(list_dot_product(qv, qv))) AS cos_recon
      |FROM q""".stripMargin), bench = false) { (spark, dir) =>
    Similarity.quantizeInt8Report(Tables(spark, dir).embeddings)
  }

  // Product quantization — the memory-bound ANN rung (round 7): m
  // per-subspace codebooks trained by exact integer Lloyd, the corpus
  // encoded to m code indices, candidates shortlisted by ADC (per-query
  // m×k table of exact sub-distances, LEFT-ASSOCIATED double sum), and
  // the shortlist re-ranked by the EXACT integer L2 of the quantized
  // vectors. Every stage is the deterministic house arithmetic, so the
  // FULL pipeline — seeding, per-subspace Lloyd, encoding, ADC ranking,
  // rescore — replays bit-for-bit in SQL.
  /** Shared prologue: quantized vectors + the mix32-ordered seed rows
    * (one `sd` serves both the IVF cell seeds and the PQ code seeds
    * when nCells == codes). */
  private def pqProloguesCtes(seeds: Int): String =
    s"""e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
       |q AS (SELECT vec_id, v,
       |        list_transform(v, x -> CAST(floor(x * 1024) AS BIGINT)) AS qv FROM e),
       |mx0 AS (SELECT vec_id, ((vec_id + 1) * 2654435761) % 4294967296 AS h FROM q),
       |mx1 AS (SELECT vec_id, (xor(h, h // 65536) * 40503) % 4294967296 AS h FROM mx0),
       |mx AS (SELECT vec_id, xor(h, h // 8192) AS h FROM mx1),
       |sd AS (SELECT mx.h, mx.vec_id, q.qv FROM mx JOIN q USING (vec_id)
       |       ORDER BY mx.h, mx.vec_id LIMIT $seeds),
       |sd0 AS (SELECT cast(row_number() OVER (ORDER BY h, vec_id) AS BIGINT) - 1 AS code_id,
       |               qv FROM sd)""".stripMargin

  /** Per-subspace PQ training + encoding + per-query ADC tables
    * (pq_gf_s, pq_tt_s, cj) — the composable core shared by the plain
    * PQ oracle and the IVF×PQ composition. */
  private def pqSubspaceCtes(m: Int, codes: Int, nQueries: Int): String = {
    val sub = 64 / m
    def dist(off: Int) =
      s"""CAST(list_sum(list_transform(range(1, ${sub + 1}),
         |   i -> (st.n * q.qv[$off + i] - st.sv[i]) * (st.n * q.qv[$off + i] - st.sv[i])))
         |   AS DOUBLE) / CAST(st.n * st.n AS DOUBLE)""".stripMargin
    def assign(s: Int, st: String, tag: String, src: String) =
      s"""pq_a${tag}_$s AS (SELECT q.vec_id, st.code_id, ${dist(s * sub)} AS d
         |  FROM $src q, $st st),
         |pq_g${tag}_$s AS (SELECT vec_id, code_id FROM (
         |  SELECT vec_id, code_id,
         |         row_number() OVER (PARTITION BY vec_id ORDER BY d, code_id) AS rn
         |  FROM pq_a${tag}_$s) WHERE rn = 1)""".stripMargin
    def update(s: Int) =
      s"""pq_ue_$s AS (SELECT g.code_id,
         |    unnest(list_slice(q.qv, ${s * sub + 1}, ${(s + 1) * sub})) AS x,
         |    generate_subscripts(list_slice(q.qv, ${s * sub + 1}, ${(s + 1) * sub}), 1) AS i
         |  FROM pq_g1_$s g JOIN q USING (vec_id)),
         |pq_ug_$s AS (SELECT code_id, i, sum(x)::BIGINT AS sx FROM pq_ue_$s GROUP BY code_id, i),
         |pq_uv_$s AS (SELECT code_id, list(sx ORDER BY i) AS sv FROM pq_ug_$s GROUP BY code_id),
         |pq_un_$s AS (SELECT code_id, count(*)::BIGINT AS n FROM pq_g1_$s GROUP BY code_id),
         |pq_st1_$s AS (SELECT p.code_id, coalesce(v.sv, p.sv) AS sv, coalesce(n.n, p.n) AS n
         |  FROM pq_st0_$s p LEFT JOIN pq_uv_$s v USING (code_id)
         |  LEFT JOIN pq_un_$s n USING (code_id))""".stripMargin
    val subspaces = (0 until m).map { s =>
      s"""pq_st0_$s AS (SELECT code_id,
         |    list_slice(qv, ${s * sub + 1}, ${(s + 1) * sub}) AS sv, 1::BIGINT AS n
         |  FROM sd0),
         |${assign(s, s"pq_st0_$s", "1", "q")},
         |${update(s)},
         |${assign(s, s"pq_st1_$s", "f", "q")},
         |pq_tt_$s AS (SELECT q.vec_id AS qid, st.code_id, ${dist(s * sub)} AS t
         |  FROM q, pq_st1_$s st WHERE q.vec_id < $nQueries)""".stripMargin
    }.mkString(",\n")
    val codeCols = (0 until m).map(s => s"g$s.code_id AS c$s").mkString(", ")
    val codeJoins = (1 until m)
      .map(s => s"JOIN pq_gf_$s g$s ON g$s.vec_id = g0.vec_id").mkString(" ")
    s"""$subspaces,
       |cj AS (SELECT g0.vec_id, $codeCols FROM pq_gf_0 g0 $codeJoins)""".stripMargin
  }

  /** ADC shortlist → exact integer-L2 rescore → top-k, from a
    * candidate CTE `$cand(qid, nid)`. */
  private def pqRankCtes(m: Int, codes: Int, topK: Int, rescore: Int,
                         cand: String): String = {
    val adc = (1 until m).foldLeft("t0.t")((acc, s) => s"($acc + t$s.t)")
    val ttJoins = (1 until m)
      .map(s => s"JOIN pq_tt_$s t$s ON t$s.code_id = cj.c$s AND t$s.qid = c.qid")
      .mkString(" ")
    s"""sc AS (SELECT c.qid, c.nid, $adc AS adc
       |       FROM $cand c JOIN cj ON cj.vec_id = c.nid
       |         JOIN pq_tt_0 t0 ON t0.code_id = cj.c0 AND t0.qid = c.qid $ttJoins),
       |sl AS (SELECT qid, nid FROM (
       |         SELECT qid, nid, row_number() OVER (PARTITION BY qid ORDER BY adc, nid) AS rn
       |         FROM sc) WHERE rn <= ${topK * rescore}),
       |rr AS (SELECT sl.qid, sl.nid,
       |         list_sum(list_transform(range(1, 65),
       |           i -> (a.qv[i] - b.qv[i]) * (a.qv[i] - b.qv[i])))::BIGINT AS l2
       |       FROM sl JOIN q a ON a.vec_id = sl.qid JOIN q b ON b.vec_id = sl.nid),
       |rnk AS (SELECT qid, nid, l2,
       |         cast(row_number() OVER (PARTITION BY qid ORDER BY l2, nid) AS INT) AS rk
       |       FROM rr)
       |SELECT qid AS query_id, nid AS neighbor_id, l2, rk FROM rnk WHERE rk <= $topK""".stripMargin
  }

  private def pqOracleSql(m: Int, codes: Int, topK: Int, rescore: Int): String =
    s"""WITH ${pqProloguesCtes(codes)},
       |${pqSubspaceCtes(m, codes, topK)},
       |allcand AS (SELECT t.qid, cj.vec_id AS nid FROM cj,
       |            (SELECT DISTINCT qid FROM pq_tt_0) t
       |            WHERE t.qid <> cj.vec_id),
       |${pqRankCtes(m, codes, topK, rescore, "allcand")}""".stripMargin
  private val pq = QueryDef("e2_pq_topk", Some(pqOracleSql(4, 16, 5, 4))) {
    (spark, dir) =>
      val e = Tables(spark, dir).embeddings
      Similarity.pqTopK(e.filter(col("vec_id") < 5), e, topK = 5,
        m = 4, codes = 16, iters = 1, rescore = 4)
  }

  // IVF × PQ — the production composition: coarse cells PRUNE the
  // candidate set (hash equi-join on cell id), PQ codes COMPRESS the
  // scoring (ADC over m ints per candidate), exact integer-L2 rescore
  // of the shortlist. Both trainers and both scorings are the
  // deterministic house arithmetic, so the composed oracle is pure
  // glue over the IVF and PQ CTE generators — candidates come from the
  // probed cells instead of the whole corpus, everything downstream is
  // shared.
  private val ivfpq = QueryDef("e2_ivfpq_topk", Some(
    s"""WITH ${pqProloguesCtes(16)},
       |st0 AS (SELECT cast(row_number() OVER (ORDER BY h, vec_id) AS BIGINT) - 1 AS cell_id,
       |               qv AS sv, 1::BIGINT AS n FROM sd),
       |${ivfAssign("st0", "1")},
       |${ivfUpdate("st0", "1")},
       |${ivfAssign("st1", "2")},
       |${ivfUpdate("st1", "2")},
       |${ivfAssign("st2", "f")},
       |pf AS (SELECT vec_id AS query_id, cell_id,
       |          row_number() OVER (PARTITION BY vec_id ORDER BY m DESC, cell_id) AS rn
       |       FROM af WHERE vec_id < 5),
       |pr AS (SELECT query_id, cell_id FROM pf WHERE rn <= 4),
       |${pqSubspaceCtes(4, 16, 5)},
       |cand AS (SELECT pr.query_id AS qid, gf.vec_id AS nid
       |         FROM pr JOIN gf USING (cell_id) WHERE pr.query_id <> gf.vec_id),
       |${pqRankCtes(4, 16, 5, 4, "cand")}""".stripMargin)) { (spark, dir) =>
    val e = Tables(spark, dir).embeddings
    Similarity.ivfPqTopK(e.filter(col("vec_id") < 5), e, topK = 5,
      nCells = 16, nProbe = 4, ivfIters = 2, m = 4, codes = 16, pqIters = 1,
      rescore = 4)
  }

  // Steady-state IVF×PQ search over a PREBUILT, PERSISTED index (round-7
  // item #2): the composed index is built once (ivfPqBuild), its three
  // pieces — coarse centroids, PQ codebooks, the (neighbor_id, cell_id,
  // codes) assignments — round-trip through parquet, and the query-time
  // path (ivfPqSearch) serves from the RELOADED state alone; the corpus
  // is touched only for the shortlist's exact rescore. Training is
  // deterministic, and persist+reload is bit-exact (SimilaritySpec), so
  // the oracle recomputes the same pipeline in SQL — distinct topK=4 /
  // nProbe=3 parameters keep this row from being a copy of
  // e2_ivfpq_topk's glue.
  private val ivfpqSearch = QueryDef("e2_ivfpq_search", Some(
    s"""WITH ${pqProloguesCtes(16)},
       |st0 AS (SELECT cast(row_number() OVER (ORDER BY h, vec_id) AS BIGINT) - 1 AS cell_id,
       |               qv AS sv, 1::BIGINT AS n FROM sd),
       |${ivfAssign("st0", "1")},
       |${ivfUpdate("st0", "1")},
       |${ivfAssign("st1", "2")},
       |${ivfUpdate("st1", "2")},
       |${ivfAssign("st2", "f")},
       |pf AS (SELECT vec_id AS query_id, cell_id,
       |          row_number() OVER (PARTITION BY vec_id ORDER BY m DESC, cell_id) AS rn
       |       FROM af WHERE vec_id < 5),
       |pr AS (SELECT query_id, cell_id FROM pf WHERE rn <= 3),
       |${pqSubspaceCtes(4, 16, 5)},
       |cand AS (SELECT pr.query_id AS qid, gf.vec_id AS nid
       |         FROM pr JOIN gf USING (cell_id) WHERE pr.query_id <> gf.vec_id),
       |${pqRankCtes(4, 16, 4, 4, "cand")}""".stripMargin), bench = false) {
    (spark, dir) =>
      val e = Tables(spark, dir).embeddings
      val work = java.nio.file.Files.createTempDirectory("graft-ivfpq-q").toString
      try {
        val idx = Similarity.ivfPqBuild(e, nCells = 16, ivfIters = 2,
          m = 4, codes = 16, pqIters = 1)
        Similarity.saveIvfCentroids(spark, idx.cellSums, idx.cellCounts,
          s"$work/cells")
        Similarity.savePqCodebooks(spark, idx.pqSums, idx.pqCounts,
          s"$work/codebooks")
        idx.index.write.mode("overwrite").parquet(s"$work/index")
        // everything below runs off RELOADED state — the steady path
        val (cs, cn) = Similarity.loadIvfCentroids(spark, s"$work/cells")
        val (ps, pn) = Similarity.loadPqCodebooks(spark, s"$work/codebooks")
        Similarity.ivfPqSearch(e.filter(col("vec_id") < 5), e,
            spark.read.parquet(s"$work/index"), cs, cn, ps, pn,
            topK = 4, nProbe = 3, rescore = 4)
          .localCheckpoint(true)
      } finally org.apache.commons.io.FileUtils.deleteQuietly(
        new java.io.File(work))
  }

  // ANN index MAINTAINED FROM THE STREAM (Streams.ivfPqIndexSink) —
  // trained state frozen offline, each ingestion microbatch encoded to
  // (neighbor_id, cell_id, codes) under it, search served off the
  // committed version with a driver-side probed-cell IN-list. Because
  // per-row encoding is a pure function of the frozen state, the
  // streamed assignments equal a one-shot encode row-for-row — so the
  // served ranking hash-checks against the SAME full-pipeline SQL
  // replay the one-shot forms use (distinct topK=3/nProbe=2 params
  // keep this row from being a copy of e2_ivfpq_search's glue).
  private val ivfpqStream = QueryDef("e2_ivfpq_stream", Some(
    s"""WITH ${pqProloguesCtes(16)},
       |st0 AS (SELECT cast(row_number() OVER (ORDER BY h, vec_id) AS BIGINT) - 1 AS cell_id,
       |               qv AS sv, 1::BIGINT AS n FROM sd),
       |${ivfAssign("st0", "1")},
       |${ivfUpdate("st0", "1")},
       |${ivfAssign("st1", "2")},
       |${ivfUpdate("st1", "2")},
       |${ivfAssign("st2", "f")},
       |pf AS (SELECT vec_id AS query_id, cell_id,
       |          row_number() OVER (PARTITION BY vec_id ORDER BY m DESC, cell_id) AS rn
       |       FROM af WHERE vec_id < 5),
       |pr AS (SELECT query_id, cell_id FROM pf WHERE rn <= 2),
       |${pqSubspaceCtes(4, 16, 5)},
       |cand AS (SELECT pr.query_id AS qid, gf.vec_id AS nid
       |         FROM pr JOIN gf USING (cell_id) WHERE pr.query_id <> gf.vec_id),
       |${pqRankCtes(4, 16, 3, 4, "cand")}""".stripMargin), bench = false) {
    (spark, dir) =>
      val e = Tables(spark, dir).embeddings
      val work = java.nio.file.Files.createTempDirectory("graft-ivfpqstream-q").toString
      try {
        // train ONCE offline over the corpus, freeze + persist — the
        // sink never retrains
        val idx = Similarity.ivfPqBuild(e, nCells = 16, ivfIters = 2,
          m = 4, codes = 16, pqIters = 1)
        Similarity.saveIvfCentroids(spark, idx.cellSums, idx.cellCounts,
          s"$work/cells")
        Similarity.savePqCodebooks(spark, idx.pqSums, idx.pqCounts,
          s"$work/codebooks")
        // the corpus arrives as a two-file STREAM (one per trigger) so
        // the maintained index exercises the cross-batch union
        e.filter(col("vec_id") % 2 === 0).coalesce(1)
          .write.mode("overwrite").parquet(s"$work/base")
        e.filter(col("vec_id") % 2 =!= 0).coalesce(1)
          .write.mode("append").parquet(s"$work/base")
        val sink = graft.streaming.Streams.ivfPqIndexSink(
          spark.readStream.schema(e.schema)
            .option("maxFilesPerTrigger", 1).parquet(s"$work/base"),
          s"$work/idx", s"$work/ck", s"$work/cells", s"$work/codebooks")
        try sink.processAllAvailable() finally sink.stop()
        graft.streaming.Streams.ivfPqSearchMaintained(spark, s"$work/idx",
            s"$work/cells", s"$work/codebooks",
            e.filter(col("vec_id") < 5), e, topK = 3, nProbe = 2)
          .localCheckpoint(true)
      } finally org.apache.commons.io.FileUtils.deleteQuietly(
        new java.io.File(work))
  }

  // CONSISTENT PINNED ANN (Streams.corpusPin): the pin names the full
  // real corpus (three files); a post-pin file CLONING the query
  // vectors (+1000000 ids, identical embeddings — each query's l2=0
  // twin, guaranteed rank-1 poison if visible) then lands AND gets
  // indexed, so the latest committed version covers files beyond the
  // pin while NO retained version aligns with it. The pinned search
  // must walk BACK to the newest contained version, encode the
  // pin-only tail on the fly, rescore against the pinned files alone,
  // and hash-match the SAME full-pipeline SQL replay over the real
  // corpus — the clones invisible even though the index serves them
  // (distinct topK=4/nProbe=2 params keep this row from being a copy
  // of its siblings' glue).
  private val ivfpqPinned = QueryDef("e2_ivfpq_pinned", Some(
    s"""WITH ${pqProloguesCtes(16)},
       |st0 AS (SELECT cast(row_number() OVER (ORDER BY h, vec_id) AS BIGINT) - 1 AS cell_id,
       |               qv AS sv, 1::BIGINT AS n FROM sd),
       |${ivfAssign("st0", "1")},
       |${ivfUpdate("st0", "1")},
       |${ivfAssign("st1", "2")},
       |${ivfUpdate("st1", "2")},
       |${ivfAssign("st2", "f")},
       |pf AS (SELECT vec_id AS query_id, cell_id,
       |          row_number() OVER (PARTITION BY vec_id ORDER BY m DESC, cell_id) AS rn
       |       FROM af WHERE vec_id < 5),
       |pr AS (SELECT query_id, cell_id FROM pf WHERE rn <= 2),
       |${pqSubspaceCtes(4, 16, 5)},
       |cand AS (SELECT pr.query_id AS qid, gf.vec_id AS nid
       |         FROM pr JOIN gf USING (cell_id) WHERE pr.query_id <> gf.vec_id),
       |${pqRankCtes(4, 16, 4, 4, "cand")}""".stripMargin), bench = false) {
    (spark, dir) =>
      val e = Tables(spark, dir).embeddings
      val work = java.nio.file.Files.createTempDirectory("graft-ivfpqpin-q").toString
      try {
        val idx = Similarity.ivfPqBuild(e, nCells = 16, ivfIters = 2,
          m = 4, codes = 16, pqIters = 1)
        Similarity.saveIvfCentroids(spark, idx.cellSums, idx.cellCounts,
          s"$work/cells")
        Similarity.savePqCodebooks(spark, idx.pqSums, idx.pqCounts,
          s"$work/codebooks")
        (0 until 2).foreach(i => e.filter(col("vec_id") % 3 === i).coalesce(1)
          .write.mode("append").parquet(s"$work/base"))
        val sink = graft.streaming.Streams.ivfPqIndexSink(
          spark.readStream.schema(e.schema)
            .option("maxFilesPerTrigger", 1).parquet(s"$work/base"),
          s"$work/idx", s"$work/ck", s"$work/cells", s"$work/codebooks")
        try sink.processAllAvailable() finally sink.stop()
        // the last real slice lands after the stream stopped — inside
        // the pin, encoded by no retained version (the pin-only tail)
        e.filter(col("vec_id") % 3 === 2).coalesce(1)
          .write.mode("append").parquet(s"$work/base")
        val pin = graft.streaming.Streams.corpusPin(spark, s"$work/base")
        // post-pin: query clones land AND a restarted sink encodes them
        e.filter(col("vec_id") < 5)
          .withColumn("vec_id", col("vec_id") + 1000000L).coalesce(1)
          .write.mode("append").parquet(s"$work/base")
        val sink2 = graft.streaming.Streams.ivfPqIndexSink(
          spark.readStream.schema(e.schema)
            .option("maxFilesPerTrigger", 2).parquet(s"$work/base"),
          s"$work/idx", s"$work/ck", s"$work/cells", s"$work/codebooks")
        try sink2.processAllAvailable() finally sink2.stop()
        val sizes = graft.streaming.Streams.snapshotVersionsOf(spark, s"$work/idx")
          .flatMap(v => graft.streaming.Streams
            .snapshotManifest(spark, s"$work/idx/v=$v").map(_.size))
        require(sizes.max == 4,
          s"e2_ivfpq_pinned: the latest version must index beyond the pin ($sizes)")
        require(!sizes.contains(3),
          s"e2_ivfpq_pinned: no version may align with the pin ($sizes)")
        graft.streaming.Streams.ivfPqSearchFresh(spark, s"$work/idx",
            s"$work/cells", s"$work/codebooks", s"$work/base",
            e.filter(col("vec_id") < 5), topK = 4, nProbe = 2,
            pin = Some(pin))
          .localCheckpoint(true)
      } finally org.apache.commons.io.FileUtils.deleteQuietly(
        new java.io.File(work))
  }

  // Incremental IVF maintenance — the index-never-reshuffles pattern
  // for embeddings (round-7 item #5): centroids trained ONCE over the
  // 90% base corpus and frozen; the 10% delta arrives in three batches,
  // each assigned + folded into per-cell (count, integer sum-vector)
  // stats associatively — so the incrementally-maintained stats equal
  // the one-shot stats over all rows, which is exactly what the oracle
  // recomputes (training CTEs over the base subset, assignment of ALL
  // rows under the frozen state, per-cell fold, drift vs the trained
  // centroid). The drift column (1 − cos(trained sum, member sum)) and
  // its re-seed flag replay in IEEE-identical doubles, so the whole
  // maintenance decision hash-checks.
  private val ivfIncr = {
    val th = 0.03 // re-seed fence: sized so sf0.01 flags a real mix (8/16 cells)
    QueryDef("e2_ivf_incremental", Some(
      s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
         |q AS (SELECT vec_id, v,
         |        list_transform(v, x -> CAST(floor(x * 1024) AS BIGINT)) AS qv FROM e),
         |qb AS (SELECT * FROM q WHERE vec_id % 10 <> 0),
         |mx0 AS (SELECT vec_id, ((vec_id + 1) * 2654435761) % 4294967296 AS h FROM qb),
         |mx1 AS (SELECT vec_id, (xor(h, h // 65536) * 40503) % 4294967296 AS h FROM mx0),
         |mx AS (SELECT vec_id, xor(h, h // 8192) AS h FROM mx1),
         |sd AS (SELECT mx.h, mx.vec_id, qb.qv FROM mx JOIN qb USING (vec_id)
         |       ORDER BY mx.h, mx.vec_id LIMIT 16),
         |st0 AS (SELECT cast(row_number() OVER (ORDER BY h, vec_id) AS BIGINT) - 1 AS cell_id,
         |               qv AS sv, 1::BIGINT AS n
         |        FROM sd),
         |${ivfAssign("st0", "1", "qb")},
         |${ivfUpdate("st0", "1", "qb")},
         |${ivfAssign("st1", "2", "qb")},
         |${ivfUpdate("st1", "2", "qb")},
         |${ivfAssign("st2", "f", "q")},
         |me AS (SELECT gf.cell_id, unnest(q.qv) AS x, generate_subscripts(q.qv, 1) AS i
         |       FROM gf JOIN q USING (vec_id)),
         |mg AS (SELECT cell_id, i, sum(x)::BIGINT AS sx FROM me GROUP BY cell_id, i),
         |mv AS (SELECT cell_id, list(sx ORDER BY i) AS sv FROM mg GROUP BY cell_id),
         |mn AS (SELECT cell_id, count(*)::BIGINT AS n_members FROM gf GROUP BY cell_id),
         |dr AS (SELECT s.cell_id, mn.n_members,
         |         1.0 - list_dot_product(list_transform(s.sv, x -> x::DOUBLE),
         |                                list_transform(mv.sv, x -> x::DOUBLE))
         |             / (sqrt(list_dot_product(list_transform(s.sv, x -> x::DOUBLE),
         |                                      list_transform(s.sv, x -> x::DOUBLE)))
         |                * sqrt(list_dot_product(list_transform(mv.sv, x -> x::DOUBLE),
         |                                        list_transform(mv.sv, x -> x::DOUBLE)))) AS drift
         |       FROM st2 s JOIN mv ON s.cell_id = mv.cell_id
         |                  JOIN mn ON s.cell_id = mn.cell_id)
         |SELECT cell_id, n_members, drift, drift > $th AS drifted
         |FROM dr""".stripMargin)) { (spark, dir) =>
      val e = Tables(spark, dir).embeddings
      val base = e.filter(col("vec_id") % 10 =!= 0)
      val (sums, counts) = Similarity.trainCentroidsQuant(base,
        nCells = 16, iters = 2, dim = 64)
      // the delta lands in THREE batches; stats fold associatively, so
      // this equals (and is checked against) one-shot ingestion
      val delta = e.filter(col("vec_id") % 10 === 0)
      val batches = Seq(0, 10, 20).map(r => delta.filter(col("vec_id") % 30 === r))
      val stats = batches.foldLeft(Similarity.ivfCellStats(base, sums, counts))(
        (acc, b) => Similarity.ivfCellStatsMerge(acc,
          Similarity.ivfCellStats(b, sums, counts)))
      Similarity.ivfDriftReport(stats, sums, counts, threshold = th)
    }
  }

  val defs: Seq[QueryDef] = Seq(knn, ann, ivf, semdedup, centroids, quantize,
    ivfIncr, pq, ivfpq, ivfpqSearch, ivfpqStream, ivfpqPinned)
}
