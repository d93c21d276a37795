package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing (SURVEY §2.6 E4): image/audio/video
  * payloads as opaque `binary` columns with a typed metadata struct.
  *
  * The Spark-side plumbing — schema, typed records, per-partition batch
  * decode, feature schema — is real and tested, and so are TWO decode
  * levels: header METADATA extraction ([[parseImageHeader]], pure JVM
  * byte arithmetic over PNG/JPEG containers) and full PIXEL decode for
  * images ([[decodePixels]]/[[pixelStats]]/[[resizeImages]] on the
  * JDK's own ImageIO codecs — PNG/JPEG/GIF/BMP, headless, no external
  * library; oracle-verified end-to-end by `mm_pixels`) — and, as of
  * round 3, full AUDIO decode for WAV/AIFF/AU PCM payloads on the
  * JDK's own `javax.sound.sampled` codecs ([[decodeAudioSamples]]/
  * [[audioStats]], oracle-verified by `mm_audio` through the same
  * real-encoder→real-decoder→closed-form scheme), and — round 3b —
  * real MULTI-FRAME decode for animated-GIF payloads
  * ([[decodeGifFrames]]/[[videoFrameStats]], oracle-verified by
  * `mm_video`): frame enumeration, stride sampling, and per-frame
  * pixel decode on the JDK's own multi-frame codec. What remains
  * stubbed (`decodeStub`/`sampleFrames`) is payloads with no JDK
  * codec at all — inter-frame-compressed video (H.264 etc.).
  * Swapping in a real video decoder (e.g. javacv / a JNI
  * codec) changes only that one function; the distributed shape
  * (mapPartitions so a decoder instance is created once per partition,
  * not per row — the same open-once-per-split pattern the reference
  * traces in `openInputFormat()`,
  * ExecutionEnviromentreadTextFile创建DataSource分析.md:98-100) stays
  * identical.
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

  /** REAL container-header parse for PNG and JPEG payloads: width,
    * height, channels read straight from the header bytes — pure JVM
    * byte arithmetic, no codec library required (only pixel DECODING
    * needs one; that part remains [[decodeStub]] for synthetic
    * payloads). None when neither magic matches. */
  def parseImageHeader(content: Array[Byte]): Option[(Int, Int, Int)] = {
    def u8(i: Int) = content(i) & 0xff
    def be32(i: Int) = (u8(i) << 24) | (u8(i + 1) << 16) | (u8(i + 2) << 8) | u8(i + 3)
    def be16(i: Int) = (u8(i) << 8) | u8(i + 1)
    val n = content.length
    // PNG: 8-byte signature, then the IHDR chunk is mandatory-first:
    // len(4) "IHDR"(4) width(4 BE) height(4 BE) bitdepth(1) colortype(1)
    if (n >= 26 &&
        u8(0) == 0x89 && u8(1) == 'P' && u8(2) == 'N' && u8(3) == 'G' &&
        u8(4) == 0x0d && u8(5) == 0x0a && u8(6) == 0x1a && u8(7) == 0x0a &&
        content(12) == 'I' && content(13) == 'H' && content(14) == 'D' && content(15) == 'R') {
      val channels = u8(25) match {
        case 0 => 1 // greyscale
        case 2 => 3 // truecolour
        case 3 => 1 // palette-indexed
        case 4 => 2 // grey + alpha
        case 6 => 4 // truecolour + alpha
        case _ => return None
      }
      Some((be32(16), be32(20), channels))
    }
    // JPEG: FF D8, then marker segments; dimensions live in the first
    // start-of-frame marker (C0–CF excluding C4/C8/CC):
    // FF Cx len(2) precision(1) height(2 BE) width(2 BE) components(1)
    else if (n >= 4 && u8(0) == 0xff && u8(1) == 0xd8) {
      var i = 2
      // i+10 <= n: the SOF branch reads through u8(i+9) (components
      // byte) — a truncated stream whose SOF lands at the boundary must
      // fall out to None, not index past the array
      while (i + 10 <= n) {
        if (u8(i) != 0xff) return None // desynced marker stream
        val marker = u8(i + 1)
        if (marker == 0xd8 || (marker >= 0xd0 && marker <= 0xd7) || marker == 0x01) {
          i += 2 // standalone markers carry no length
        } else if (marker >= 0xc0 && marker <= 0xcf &&
                   marker != 0xc4 && marker != 0xc8 && marker != 0xcc) {
          return Some((be16(i + 7), be16(i + 5), u8(i + 9)))
        } else {
          i += 2 + be16(i + 2) // skip the segment payload
        }
      }
      None
    } else None
  }

  /** Header parse when the payload is a real container, stub otherwise —
    * the single decode entry point [[extractMeta]] batches over.
    * Malformed/truncated containers degrade to the stub instead of
    * failing the task: one corrupt blob must not kill a 100TB scan. */
  def decodeMeta(content: Array[Byte]): (Int, Int, Int) =
    scala.util.Try(parseImageHeader(content)).toOption.flatten
      .getOrElse(decodeStub(content))

  /** Batch feature extraction: one decoder init per partition. */
  def extractMeta(ds: Dataset[MediaRecord]): Dataset[MediaMeta] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { it =>
      // decoder/codec context would be opened once here, per partition
      it.map { r =>
        val (w, h, c) = decodeMeta(r.content)
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

  // ---- REAL pixel decode (JDK ImageIO — PNG/JPEG/GIF/BMP readers ship
  // with the JVM, no external codec needed; runs headless) ---------------

  /** Decode a real image container to pixels. None for payloads ImageIO
    * has no reader for (synthetic fixtures, audio/video — those keep the
    * labeled stubs; video/audio codecs genuinely don't ship in the JDK).
    * On a cluster, set `-Djava.awt.headless=true` in executor JVM opts;
    * here it's set lazily before first use. */
  def decodePixels(content: Array[Byte]): Option[java.awt.image.BufferedImage] = {
    System.setProperty("java.awt.headless", "true")
    scala.util.Try(Option(javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(content)))).toOption.flatten
  }

  /** Real per-image pixel statistics: dimensions, raster band count, and
    * exact integer per-channel sums (sums, not means, so an oracle can
    * reproduce them without float-division ambiguity). Rows whose
    * payload is not a decodable image are dropped — pair with
    * [[extractMeta]] for the metadata-only view of mixed corpora. One
    * ImageIO reader context per partition via mapPartitions. */
  case class PixelStats(id: Long, width: Int, height: Int, channels: Int,
                        sum_r: Long, sum_g: Long, sum_b: Long)
  def pixelStats(ds: Dataset[MediaRecord]): Dataset[PixelStats] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { it =>
      it.flatMap { r =>
        decodePixels(r.content).map { img =>
          val (w, h) = (img.getWidth, img.getHeight)
          var (sr, sg, sb) = (0L, 0L, 0L)
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              val rgb = img.getRGB(x, y)
              sr += (rgb >> 16) & 0xff; sg += (rgb >> 8) & 0xff; sb += rgb & 0xff
              x += 1
            }
            y += 1
          }
          PixelStats(r.id, w, h, img.getRaster.getNumBands, sr, sg, sb)
        }
      }
    }
  }

  /** REAL resize for decodable images (area-averaging resample via
    * Graphics2D, re-encoded as lossless PNG); payloads ImageIO can't
    * read fall back to the byte-subsampling stub so mixed corpora still
    * flow. Same per-partition shape as [[resize]]. */
  def resizeImages(ds: Dataset[MediaRecord], targetW: Int, targetH: Int): Dataset[MediaRecord] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { it =>
      it.map { r =>
        decodePixels(r.content) match {
          case Some(img) =>
            val out = new java.awt.image.BufferedImage(
              targetW, targetH, java.awt.image.BufferedImage.TYPE_INT_RGB)
            val g = out.createGraphics()
            g.drawImage(img.getScaledInstance(targetW, targetH,
              java.awt.Image.SCALE_AREA_AVERAGING), 0, 0, null)
            g.dispose()
            val bos = new java.io.ByteArrayOutputStream()
            javax.imageio.ImageIO.write(out, "png", bos)
            r.copy(path = s"${r.path}#${targetW}x$targetH",
              mediaType = "image/png", content = bos.toByteArray)
          case None =>
            val (w, _, _) = decodeStub(r.content)
            val ratio = math.max(1, w / math.max(targetW, 1))
            r.copy(path = s"${r.path}#${targetW}x$targetH",
              content = r.content.grouped(ratio).map(_.head).toArray)
        }
      }
    }
  }

  /** Deterministic synthetic PNG: pixel (x,y) = RGB((id+x)%256,
    * (id+y)%256, (id+x+y)%256), encoded through the REAL ImageIO PNG
    * writer. Lossless, so decode returns these exact values — which is
    * what lets a SQL oracle verify the whole encode→decode→aggregate
    * pipeline from the closed form. */
  def syntheticPng(id: Long, w: Int, h: Int): Array[Byte] = {
    System.setProperty("java.awt.headless", "true")
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val r = ((id + x) % 256).toInt
        val g = ((id + y) % 256).toInt
        val b = ((id + x + y) % 256).toInt
        img.setRGB(x, y, (r << 16) | (g << 8) | b)
        x += 1
      }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  // ---- REAL audio decode (JDK javax.sound.sampled — WAV/AIFF/AU PCM
  // readers ship with the JVM; no audio DEVICE is touched, only the
  // file codecs, so this runs headless) ---------------------------------

  /** Decoded PCM clip: container-level format fields plus the raw
    * samples as signed 16-bit values (channel-interleaved, exactly as
    * stored — WAV PCM is lossless, so these are the encoder's inputs
    * bit-for-bit). */
  case class AudioClip(sampleRateHz: Int, channels: Int, samples: Array[Short])

  /** Decode a real audio container (WAV/AIFF/AU, 8/16-bit PCM) to its
    * samples via the JDK's sampled-audio codecs. None for payloads the
    * JDK has no reader for (synthetic fixtures, video — those keep the
    * labeled stubs). 8-bit input is widened to 16-bit samples; only
    * PCM_SIGNED/PCM_UNSIGNED encodings are accepted (compressed
    * encodings like ULAW would need a conversion pass). */
  def decodeAudioSamples(content: Array[Byte]): Option[AudioClip] =
    scala.util.Try {
      val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(content))
      try {
        val f = ais.getFormat
        val enc = f.getEncoding
        val signed = enc == javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED
        val unsigned = enc == javax.sound.sampled.AudioFormat.Encoding.PCM_UNSIGNED
        if (!signed && !unsigned) None
        else if (f.getSampleSizeInBits != 8 && f.getSampleSizeInBits != 16) None
        else {
          val bytes = ais.readAllBytes()
          val out =
            if (f.getSampleSizeInBits == 8) {
              val a = new Array[Short](bytes.length)
              var i = 0
              while (i < bytes.length) {
                // 8-bit WAV is unsigned by convention; recenter to signed
                a(i) = (if (unsigned) ((bytes(i) & 0xff) - 128) else bytes(i).toInt).toShort
                i += 1
              }
              a
            } else {
              val n = bytes.length / 2
              val a = new Array[Short](n)
              val big = f.isBigEndian
              var i = 0
              while (i < n) {
                val (lo, hi) = if (big) (bytes(2 * i + 1), bytes(2 * i)) else (bytes(2 * i), bytes(2 * i + 1))
                val raw = ((hi.toInt) << 8) | (lo & 0xff)
                // 16-bit unsigned stores silence at 32768; recenter like
                // the 8-bit branch (raw is sign-extended from hi, so the
                // unsigned reading is (raw & 0xffff))
                a(i) = (if (unsigned) (raw & 0xffff) - 32768 else raw).toShort
                i += 1
              }
              a
            }
          Some(AudioClip(f.getSampleRate.toInt, f.getChannels, out))
        }
      } finally ais.close()
    }.toOption.flatten

  /** Real per-clip audio statistics: format fields plus exact integer
    * sample aggregates (sum, sum of |s|, peak |s|) — integers, not
    * float means, so a SQL oracle reproduces them exactly. Rows whose
    * payload is not decodable audio are dropped. One codec context per
    * partition via mapPartitions (the open-once-per-split shape). */
  case class AudioStats(id: Long, sample_rate: Int, channels: Int, n_samples: Long,
                        sum_s: Long, sum_abs: Long, peak_abs: Int)
  def audioStats(ds: Dataset[MediaRecord]): Dataset[AudioStats] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { it =>
      it.flatMap { r =>
        decodeAudioSamples(r.content).map { clip =>
          var (sum, sabs) = (0L, 0L)
          var peak = 0
          var i = 0
          while (i < clip.samples.length) {
            val s = clip.samples(i).toLong
            sum += s; sabs += math.abs(s)
            if (math.abs(s) > peak) peak = math.abs(s).toInt
            i += 1
          }
          AudioStats(r.id, clip.sampleRateHz, clip.channels, clip.samples.length.toLong, sum, sabs, peak)
        }
      }
    }
  }

  /** Deterministic synthetic mono WAV: sample i = ((37·id + 7919·i)
    * mod 65536) − 32768, 16-bit PCM at `sampleRateHz`, encoded through
    * the REAL JDK WAV writer. PCM is lossless, so decode returns these
    * exact values — the same closed-form-oracle scheme as
    * [[syntheticPng]]. */
  def syntheticWav(id: Long, nSamples: Int, sampleRateHz: Int): Array[Byte] = {
    val pcm = new Array[Byte](nSamples * 2)
    var i = 0
    while (i < nSamples) {
      val v = ((37L * id + 7919L * i) % 65536L) - 32768L
      val s = v.toShort
      pcm(2 * i) = (s & 0xff).toByte
      pcm(2 * i + 1) = ((s >> 8) & 0xff).toByte
      i += 1
    }
    val fmt = new javax.sound.sampled.AudioFormat(sampleRateHz.toFloat, 16, 1, true, false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, nSamples.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais, javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  // ---- REAL multi-frame (video-shaped) decode: animated GIF on the
  // JDK's own GIF codec. GIF is the one multi-frame container whose
  // reader AND writer ship with the JVM, so frame enumeration, frame
  // sampling, and per-frame pixel decode are all real — only
  // inter-frame-compressed codecs (H.264 etc.) remain out of scope
  // (no JDK codec exists; a javacv swap changes just decodeGifFrames).

  /** Decode every frame of a (possibly animated) GIF. None when the
    * payload has no GIF reader. Frames are decoded full-size in storage
    * order via the ImageReader index API — the same API a real video
    * demuxer exposes (seek by frame index), which is why
    * [[videoFrameStats]]'s sampling runs against it unchanged. */
  def decodeGifFrames(content: Array[Byte]): Option[IndexedSeq[java.awt.image.BufferedImage]] =
    decodeGifSampled(content, stride = 1, maxFrames = Int.MaxValue)
      .map { case (_, frames) => frames.map(_._2) }

  /** Decode ONLY the sampled frames of a (possibly animated) GIF:
    * every `stride`-th frame index up to `maxFrames` of them, via
    * `reader.read(i)` on just those indices — per-record decode cost
    * and heap are O(sampled frames), not O(total frames), which is the
    * whole point of stride sampling on an hour-long clip. Returns
    * (total frame count, sampled (index, frame) pairs); None when the
    * payload has no GIF reader. */
  def decodeGifSampled(content: Array[Byte], stride: Int, maxFrames: Int)
      : Option[(Int, IndexedSeq[(Int, java.awt.image.BufferedImage)])] = {
    // outside the Try: stride=0 would throw ArithmeticException inside it,
    // which toOption turns into None — indistinguishable from "payload has
    // no GIF reader", silently dropping every record instead of failing
    require(stride >= 1, s"decodeGifSampled: stride must be >= 1, got $stride")
    require(maxFrames >= 1, s"decodeGifSampled: maxFrames must be >= 1, got $maxFrames")
    System.setProperty("java.awt.headless", "true")
    scala.util.Try {
      val iis = javax.imageio.ImageIO.createImageInputStream(
        new java.io.ByteArrayInputStream(content))
      try {
        val readers = javax.imageio.ImageIO.getImageReaders(iis)
        if (!readers.hasNext) None
        else {
          val r = readers.next()
          if (!r.getFormatName.equalsIgnoreCase("gif")) None
          else {
            r.setInput(iis)
            val n = r.getNumImages(true)
            val sampled = (0 until n).collect {
              case i if i % stride == 0 && i / stride < maxFrames => (i, r.read(i))
            }
            r.dispose()
            Some((n, sampled))
          }
        }
      } finally iis.close()
    }.toOption.flatten
  }

  /** Real frame sampling + per-frame decode over animated-GIF payloads:
    * every `stride`-th frame up to `maxFrames`, reduced to exact
    * integer gray-channel sums (the frames are written with an identity
    * gray palette, so GIF's 256-color limit is lossless here and a SQL
    * oracle reproduces the sums from the generating closed form).
    * Non-GIF payloads are dropped. One reader per partition batch
    * (mapPartitions — the open-once-per-split shape); unsampled frames
    * are never decoded ([[decodeGifSampled]]). */
  case class VideoFrameStats(id: Long, frame_idx: Int, n_frames: Int,
                             width: Int, height: Int, sum_gray: Long)
  def videoFrameStats(ds: Dataset[MediaRecord], stride: Int,
                      maxFrames: Int): Dataset[VideoFrameStats] = {
    import ds.sparkSession.implicits._
    require(stride >= 1 && maxFrames >= 1, "videoFrameStats: stride/maxFrames must be >= 1")
    ds.mapPartitions { it =>
      it.flatMap { r =>
        decodeGifSampled(r.content, stride, maxFrames).toSeq.flatMap {
          case (nFrames, sampled) =>
            sampled.map { case (i, img) =>
              var sum = 0L
              var y = 0
              while (y < img.getHeight) {
                var x = 0
                while (x < img.getWidth) { sum += img.getRGB(x, y) & 0xff; x += 1 }
                y += 1
              }
              VideoFrameStats(r.id, i, nFrames, img.getWidth, img.getHeight, sum)
            }
        }
      }
    }
  }

  /** Deterministic synthetic animated GIF: `nFrames` full frames, frame
    * f pixel (x,y) = gray level (id + 3f + x + 2y) mod 256, written
    * through the REAL JDK GIF sequence writer over an identity 256-gray
    * palette (index i → RGB(i,i,i)), so encoding is lossless and decode
    * returns the closed form exactly — the [[syntheticPng]] scheme for
    * the multi-frame case. */
  def syntheticGif(id: Long, w: Int, h: Int, nFrames: Int): Array[Byte] = {
    System.setProperty("java.awt.headless", "true")
    val gray = Array.tabulate(256)(_.toByte)
    val cm = new java.awt.image.IndexColorModel(8, 256, gray, gray, gray)
    val writer = javax.imageio.ImageIO.getImageWritersByFormatName("gif").next()
    val bos = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
    writer.setOutput(ios)
    writer.prepareWriteSequence(null)
    var f = 0
    while (f < nFrames) {
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_BYTE_INDEXED, cm)
      val raster = img.getRaster
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          raster.setSample(x, y, 0, ((id + 3 * f + x + 2 * y) % 256).toInt)
          x += 1
        }
        y += 1
      }
      // The JDK GIF writer interlaces frames by default, which permutes
      // row STORAGE order (sum-invariant, so aggregate oracles can't
      // see it) and, at heights below the 8-row interlace cycle,
      // round-trips incorrectly. Force interlaceFlag=FALSE through the
      // image metadata tree so decode is position-exact.
      val meta = writer.getDefaultImageMetadata(
        new javax.imageio.ImageTypeSpecifier(img), writer.getDefaultWriteParam)
      val fmtName = meta.getNativeMetadataFormatName
      val root = meta.getAsTree(fmtName).asInstanceOf[javax.imageio.metadata.IIOMetadataNode]
      val kids = root.getChildNodes
      var i = 0
      while (i < kids.getLength) {
        kids.item(i) match {
          case n: javax.imageio.metadata.IIOMetadataNode
            if n.getNodeName == "ImageDescriptor" =>
            n.setAttribute("interlaceFlag", "FALSE")
          case _ =>
        }
        i += 1
      }
      meta.setFromTree(fmtName, root)
      writer.writeToSequence(new javax.imageio.IIOImage(img, null, meta), null)
      f += 1
    }
    writer.endWriteSequence()
    writer.dispose()
    ios.close()
    bos.toByteArray
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
