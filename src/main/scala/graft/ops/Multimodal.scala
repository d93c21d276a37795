package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing (SURVEY §2.6 E4): image/audio/video
  * payloads as opaque `binary` columns with a typed metadata struct.
  *
  * The Spark-side plumbing — schema, typed records, per-partition batch
  * decode, feature schema — is real and tested. The actual media decode
  * is STUBBED (`decodeStub`): the container has no image/audio codecs,
  * so it derives a deterministic fake header from the bytes. Swapping in
  * a real decoder (e.g. javacv / a JNI codec) changes only that one
  * function; the distributed shape (mapPartitions so a decoder instance
  * is created once per partition, not per row — the same
  * open-once-per-split pattern the reference traces in
  * `openInputFormat()`, ExecutionEnviromentreadTextFile创建DataSource分析.md:98-100)
  * stays identical.
  */
object Multimodal {

  case class MediaRecord(id: Long, path: String, mediaType: String, content: Array[Byte])
  case class MediaMeta(id: Long, byteLen: Int, width: Int, height: Int, channels: Int)
  case class Frame(id: Long, frameIdx: Int, offset: Int, frameBytes: Array[Byte])

  /** STUB decoder: deterministic fake dimensions derived from content
    * bytes. A real implementation would parse the codec header here. */
  def decodeStub(content: Array[Byte]): (Int, Int, Int) = {
    val n = content.length
    val b0 = if (n > 0) content(0) & 0xff else 0
    val b1 = if (n > 1) content(1) & 0xff else 0
    (16 + b0 % 240, 16 + b1 % 240, 1 + (n % 4))
  }

  /** Batch feature extraction: one decoder init per partition. */
  def extractMeta(ds: Dataset[MediaRecord]): Dataset[MediaMeta] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { it =>
      // decoder/codec context would be opened once here, per partition
      it.map { r =>
        val (w, h, c) = decodeStub(r.content)
        MediaMeta(r.id, r.content.length, w, h, c)
      }
    }
  }

  /** STUB resize: deterministic downscale of the fake payload — byte
    * subsampling at the scale ratio, dimensions scaled in the metadata.
    * A real implementation swaps in a pixel resampler; the per-partition
    * map shape (decoder/scaler context reused across rows) is the part
    * that matters at scale and stays identical. */
  def resize(ds: Dataset[MediaRecord], targetW: Int, targetH: Int): Dataset[MediaRecord] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { it =>
      it.map { r =>
        val (w, _, _) = decodeStub(r.content)
        val ratio = math.max(1, w / math.max(targetW, 1))
        val scaled = r.content.grouped(ratio).map(_.head).toArray
        r.copy(path = s"${r.path}#${targetW}x$targetH", content = scaled)
      }
    }
  }

  /** STUB frame sampler: every `stride` bytes stands in for a decoded
    * frame; real video sampling keeps this exact flatMap shape. */
  def sampleFrames(ds: Dataset[MediaRecord], stride: Int, maxFrames: Int): Dataset[Frame] = {
    import ds.sparkSession.implicits._
    ds.flatMap { r =>
      val n = math.min(maxFrames, math.max(1, r.content.length / math.max(stride, 1)))
      (0 until n).iterator.map { i =>
        val off = i * stride
        Frame(r.id, i, off, r.content.slice(off, math.min(off + stride, r.content.length)))
      }
    }
  }

  /** Fixture adapter: documents' text bytes as a stand-in media payload
    * (the testdata ships no real binary column). */
  def fromDocuments(docs: DataFrame): Dataset[MediaRecord] = {
    import docs.sparkSession.implicits._
    docs.select(
        col("doc_id").as("id"),
        concat(lit("mem://documents/"), col("doc_id")).as("path"),
        lit("text/plain").as("mediaType"),
        encode(col("text"), "UTF-8").as("content"))
      .as[MediaRecord]
  }
}
