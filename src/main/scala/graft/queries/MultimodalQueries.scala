package graft.queries

import org.apache.spark.sql.functions._
import graft.ops.Multimodal
import graft.sources.Tables

/** SURVEY §2.6 E4 — multimodal binary-column plumbing. The documents'
  * UTF-8 bytes stand in for media payloads (testdata has no binary
  * column); the decode step is a deterministic stub (see Multimodal).
  */
object MultimodalQueries {

  // Binary content identity: byte length + content hash — the exact-dup
  // primitive for media files. md5 over the same UTF-8 bytes both sides.
  private val features = QueryDef("mm_features", Some(
    """SELECT doc_id,
      |       cast(octet_length(cast(text AS BLOB)) AS INT) AS byte_len,
      |       md5(text) AS content_md5
      |FROM documents""".stripMargin)) { (spark, dir) =>
    Tables(spark, dir).documents.select(
      col("doc_id"),
      length(encode(col("text"), "UTF-8")).as("byte_len"),
      md5(encode(col("text"), "UTF-8")).as("content_md5"))
  }

  // Typed decode pipeline: MediaRecord → mapPartitions decode stub →
  // MediaMeta. The fake header fields are deterministic functions of the
  // bytes, so even the stub is oracle-checkable.
  private val meta = QueryDef("mm_meta", Some(
    """SELECT doc_id AS id,
      |       cast(octet_length(cast(text AS BLOB)) AS INT)       AS byte_len,
      |       cast(16 + ascii(substr(text, 1, 1)) % 240 AS INT)   AS width,
      |       cast(16 + ascii(substr(text, 2, 1)) % 240 AS INT)   AS height,
      |       cast(1 + octet_length(cast(text AS BLOB)) % 4 AS INT) AS channels
      |FROM documents""".stripMargin)) { (spark, dir) =>
    Multimodal.extractMeta(Multimodal.fromDocuments(Tables(spark, dir).documents))
      .toDF("id", "byte_len", "width", "height", "channels")
  }

  // Frame sampling (typed flatMap over binary payloads). The sampling
  // arithmetic — frame count, offsets, slice lengths over the UTF-8
  // byte payload — is fully deterministic, so it gets a real oracle
  // (was rows-only).
  private val frames = QueryDef("mm_frames", Some(
    """WITH f AS (SELECT doc_id, octet_length(cast(text AS BLOB)) AS len,
      |                  unnest(range(0, least(16, greatest(1, octet_length(cast(text AS BLOB)) // 256)))) AS i
      |           FROM documents)
      |SELECT doc_id AS id, cast(i AS INT) AS frame_idx, cast(i*256 AS INT) AS "offset",
      |       cast(least(256, len - i*256) AS INT) AS frame_len
      |FROM f""".stripMargin), bench = false) { (spark, dir) =>
    import spark.implicits._
    Multimodal.sampleFrames(
        Multimodal.fromDocuments(Tables(spark, dir).documents),
        stride = 256, maxFrames = 16)
      .select(col("id"), col("frameIdx").as("frame_idx"), col("offset"),
        length(col("frameBytes")).as("frame_len"))
  }

  // Resize plumbing (typed per-partition map): the stub's byte
  // subsampling is deterministic arithmetic — stride = width/16, output
  // length = ceil(len/stride) — so it gets an oracle too.
  private val resizeQ = QueryDef("mm_resize", Some(
    """SELECT doc_id AS id,
      |       'mem://documents/' || doc_id || '#16x16' AS path,
      |       cast((octet_length(cast(text AS BLOB))
      |             + greatest(1, (16 + ascii(substr(text, 1, 1)) % 240) // 16) - 1)
      |            // greatest(1, (16 + ascii(substr(text, 1, 1)) % 240) // 16) AS INT) AS n_bytes
      |FROM documents""".stripMargin), bench = false) { (spark, dir) =>
    import spark.implicits._
    Multimodal.resize(
        Multimodal.fromDocuments(Tables(spark, dir).documents), targetW = 16, targetH = 16)
      .select(col("id"), col("path"), length(col("content")).as("n_bytes"))
  }

  // REAL pixel decode through the JDK's ImageIO PNG codec: one
  // deterministic gradient PNG per doc_id < 64 is ENCODED by the real
  // PNG writer, DECODED by the real reader, and reduced to exact
  // integer channel sums — which the oracle reproduces from the
  // generating closed form. A broken or stubbed codec cannot pass
  // this. (Video/audio decode remains stubbed: the JDK ships no such
  // codecs.)
  private val pixels = QueryDef("mm_pixels", Some(
    """WITH ids AS (SELECT doc_id FROM documents WHERE doc_id < 64),
      |pxy AS (SELECT doc_id, x.x AS x, y.y AS y
      |        FROM ids, range(0, 32) x(x), range(0, 16) y(y))
      |SELECT doc_id AS id,
      |       cast(32 AS INT) AS width, cast(16 AS INT) AS height,
      |       cast(3 AS INT) AS channels,
      |       cast(sum((doc_id + x) % 256) AS BIGINT)     AS sum_r,
      |       cast(sum((doc_id + y) % 256) AS BIGINT)     AS sum_g,
      |       cast(sum((doc_id + x + y) % 256) AS BIGINT) AS sum_b
      |FROM pxy GROUP BY doc_id""".stripMargin), bench = false) { (spark, dir) =>
    import spark.implicits._
    val media = Tables(spark, dir).documents
      .filter(col("doc_id") < 64).select(col("doc_id")).as[Long]
      .map(id => Multimodal.MediaRecord(
        id, s"synthetic://$id", "image/png", Multimodal.syntheticPng(id, 32, 16)))
    Multimodal.pixelStats(media)
      .toDF("id", "width", "height", "channels", "sum_r", "sum_g", "sum_b")
  }

  // REAL audio decode through the JDK's sampled-audio WAV codec: one
  // deterministic 16-bit PCM clip per doc_id < 64 is ENCODED by the
  // real WAV writer, DECODED by the real reader, and reduced to exact
  // integer sample aggregates — reproduced by the oracle from the
  // generating closed form, sample i = ((37·id + 7919·i) % 65536) −
  // 32768 over n = 800 + id % 257 samples. PCM is lossless, so a
  // stubbed or lossy codec cannot pass this. (Only video decode
  // remains stubbed: the JDK ships no video codec.)
  private val audio = QueryDef("mm_audio", Some(
    """WITH ids AS (SELECT doc_id, 800 + doc_id % 257 AS n FROM documents WHERE doc_id < 64),
      |s AS (SELECT doc_id, n, unnest(range(0, n)) AS i FROM ids),
      |v AS (SELECT doc_id, n, (37*doc_id + 7919*i) % 65536 - 32768 AS smp FROM s)
      |SELECT doc_id AS id,
      |       cast(16000 AS INT) AS sample_rate, cast(1 AS INT) AS channels,
      |       cast(any_value(n) AS BIGINT)   AS n_samples,
      |       cast(sum(smp) AS BIGINT)       AS sum_s,
      |       cast(sum(abs(smp)) AS BIGINT)  AS sum_abs,
      |       cast(max(abs(smp)) AS INT)     AS peak_abs
      |FROM v GROUP BY doc_id""".stripMargin), bench = false) { (spark, dir) =>
    import spark.implicits._
    val media = Tables(spark, dir).documents
      .filter(col("doc_id") < 64).select(col("doc_id")).as[Long]
      .map(id => Multimodal.MediaRecord(
        id, s"synthetic://$id.wav", "audio/wav",
        Multimodal.syntheticWav(id, (800 + id % 257).toInt, 16000)))
    Multimodal.audioStats(media)
      .toDF("id", "sample_rate", "channels", "n_samples", "sum_s", "sum_abs", "peak_abs")
  }

  // REAL multi-frame decode through the JDK's animated-GIF codec: per
  // doc a deterministic 2-5-frame grayscale animation is ENCODED by the
  // real GIF sequence writer (identity gray palette — lossless within
  // GIF's 256 colors), every 2nd frame is sampled, DECODED by the real
  // reader, and reduced to exact gray sums — all reproduced by the
  // oracle from the closed form pixel(f,x,y) = (id+3f+x+2y) mod 256.
  // Only inter-frame-compressed codecs (H.264 etc.) remain out of
  // scope; no JDK codec exists for those.
  private val video = QueryDef("mm_video", Some(
    """WITH ids AS (SELECT doc_id, 2 + doc_id % 4 AS nf FROM documents WHERE doc_id < 64),
      |f AS (SELECT doc_id, nf, unnest(range(0, nf)) AS fi FROM ids),
      |sampled AS (SELECT doc_id, nf, fi FROM f WHERE fi % 2 = 0),
      |px AS (SELECT doc_id, nf, fi, x.x AS x, y.y AS y
      |       FROM sampled, range(0, 16) x(x), range(0, 8) y(y))
      |SELECT doc_id AS id, cast(fi AS INT) AS frame_idx,
      |       cast(any_value(nf) AS INT) AS n_frames,
      |       cast(16 AS INT) AS width, cast(8 AS INT) AS height,
      |       cast(sum((doc_id + 3*fi + x + 2*y) % 256) AS BIGINT) AS sum_gray
      |FROM px GROUP BY doc_id, fi""".stripMargin), bench = false) { (spark, dir) =>
    import spark.implicits._
    val media = Tables(spark, dir).documents
      .filter(col("doc_id") < 64).select(col("doc_id")).as[Long]
      .map(id => Multimodal.MediaRecord(
        id, s"synthetic://$id.gif", "image/gif",
        Multimodal.syntheticGif(id, 16, 8, (2 + id % 4).toInt)))
    Multimodal.videoFrameStats(media, stride = 2, maxFrames = 16)
      .toDF("id", "frame_idx", "n_frames", "width", "height", "sum_gray")
  }

  val defs: Seq[QueryDef] = Seq(features, meta, frames, resizeQ, pixels, audio, video)
}
