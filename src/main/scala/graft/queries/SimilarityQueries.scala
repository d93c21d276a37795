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

  // IVF cells + probing — the clustered scale path. Rows-only; recall
  // vs brute force is ScalaTest'd.
  private val ivf = QueryDef("e2_ivf_topk", None) { (spark, dir) =>
    val e = Tables(spark, dir).embeddings
    Similarity.ivfTopK(e.filter(col("vec_id") < 5), e, k = 5, nCells = 16, nProbe = 4)
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

  val defs: Seq[QueryDef] = Seq(knn, ann, ivf, centroids, quantize)
}
