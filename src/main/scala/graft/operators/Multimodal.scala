package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Multimodal column plumbing: image/audio/video payloads travel as
 * opaque `binary` columns with a typed metadata struct, processed in
 * batch via `mapPartitions` (the Scala analog of `mapInPandas` — one
 * iterator per partition, so per-batch setup like codec init happens
 * once per task, not per row).
 *
 * Image decode and resize are REAL for the formats the JDK ships
 * codecs for (PNG/JPEG/BMP/GIF via `javax.imageio`, no external
 * dependencies — payloads are signature-sniffed first, so arbitrary
 * binary never reaches the codec). Audio decode is REAL for RIFF/WAVE
 * (dependency-free little-endian header walk — channels, sample rate,
 * bit depth, duration). Payloads that are neither fall back to
 * deterministic stubs standing in for the remaining codecs
 * (compressed audio/video containers — no codec libraries here); the
 * Spark-side contract — schema, batching, partitioning, null handling
 * — is identical on every path. Feature extraction is REAL for images
 * (single-decode bilinear-pooled grayscale grid) and a deterministic
 * hash stand-in for the rest.
 */
object Multimodal {

  /** Image format by magic bytes; None = not a JDK-decodable image. */
  private[operators] def imageFormat(p: Array[Byte]): Option[String] = {
    if (p == null || p.length < 8) None
    else if ((p(0) & 0xFF) == 0x89 && p(1) == 'P' && p(2) == 'N' && p(3) == 'G') Some("png")
    else if ((p(0) & 0xFF) == 0xFF && (p(1) & 0xFF) == 0xD8 && (p(2) & 0xFF) == 0xFF) Some("jpeg")
    else if (p(0) == 'G' && p(1) == 'I' && p(2) == 'F' && p(3) == '8') Some("gif")
    else if (p(0) == 'B' && p(1) == 'M') Some("bmp")
    else None
  }

  /** Single-decode core: metadata plus (for images) the decoded
   *  BufferedImage, so [[decodeAndFeaturize]] never pays the codec
   *  twice. One chain of fallbacks — [[decode]] is a thin view. */
  private def decodeFull(payload: Array[Byte]):
      ((String, Int, Int, Int, Long), Option[java.awt.image.BufferedImage]) =
    imageFormat(payload).flatMap { fmt =>
      try {
        Option(javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload)))
          .map(img => ((fmt, img.getWidth, img.getHeight,
            img.getColorModel.getNumComponents, 0L), Option(img)))
      } catch { case _: Exception => None }
    }.getOrElse {
      // same catch-to-stub discipline on every path: one hostile
      // payload must degrade to the stub row, never fail the task
      val m = (try decodeWav(payload) catch { case _: Exception => None })
        .getOrElse(decodeStub(payload))
      (m, None)
    }

  /** RIFF/WAVE signature sniff. */
  private[operators] def isWav(p: Array[Byte]): Boolean =
    p != null && p.length >= 12 &&
      p(0) == 'R' && p(1) == 'I' && p(2) == 'F' && p(3) == 'F' &&
      p(8) == 'W' && p(9) == 'A' && p(10) == 'V' && p(11) == 'E'

  /**
   * Real audio decode for RIFF/WAVE payloads — a dependency-free
   * little-endian chunk walk (the container header is a published
   * spec; no codec library needed for PCM metadata). Returns the
   * generic media tuple with the audio fields mapped as:
   * format="wav", width=sample_rate_hz, height=bits_per_sample,
   * channels=n_channels, duration_ms = data_bytes * 1000 / byte_rate.
   * None when the payload isn't WAV or the header is malformed —
   * the caller falls through to the stub, never throws.
   */
  private[operators] def decodeWav(p: Array[Byte]): Option[(String, Int, Int, Int, Long)] = {
    if (!isWav(p)) return None
    def u16(o: Int): Int = (p(o) & 0xFF) | ((p(o + 1) & 0xFF) << 8)
    def u32(o: Int): Long = (p(o) & 0xFFL) | ((p(o + 1) & 0xFFL) << 8) |
      ((p(o + 2) & 0xFFL) << 16) | ((p(o + 3) & 0xFFL) << 24)
    // The walk cursor is a Long: a hostile 32-bit chunk-size field near
    // 2^31 must advance past p.length and terminate, never wrap an Int
    // negative (which would read out of bounds and fail the whole task).
    var off = 12L
    var channels = 0; var rate = 0L; var bits = 0; var byteRate = 0L; var dataLen = -1L
    while (off + 8 <= p.length) {
      val o = off.toInt
      val isFmt = p(o) == 'f' && p(o + 1) == 'm' && p(o + 2) == 't' && p(o + 3) == ' '
      val isData = p(o) == 'd' && p(o + 1) == 'a' && p(o + 2) == 't' && p(o + 3) == 'a'
      val sz = u32(o + 4)
      if (isFmt && off + 8 + 16 <= p.length) {
        channels = u16(o + 10)
        rate = u32(o + 12)
        byteRate = u32(o + 16)
        bits = u16(o + 22)
      } else if (isData) {
        // clamp to the bytes actually present (truncated files)
        dataLen = math.min(sz, (p.length - o - 8).toLong)
      }
      off += 8L + sz + (sz & 1L) // chunks are word-aligned; sz < 2^32, monotone
    }
    if (channels <= 0 || rate <= 0 || rate > Int.MaxValue || bits <= 0 ||
        byteRate <= 0 || dataLen < 0) None
    else Some(("wav", rate.toInt, bits, channels, dataLen * 1000L / byteRate))
  }

  /** Minimal canonical PCM WAV builder (fixture/testing aid — the
   *  inverse of [[decodeWav]]'s header walk, byte-for-byte the
   *  published RIFF layout). Sample content is deterministic filler. */
  def wavBytes(sampleRate: Int, channels: Int, bitsPerSample: Int,
      nSamples: Int, seed: Long = 0L): Array[Byte] = {
    val blockAlign = channels * bitsPerSample / 8
    val byteRate = sampleRate * blockAlign
    val dataLen = nSamples * blockAlign
    val out = new Array[Byte](44 + dataLen)
    def put4(o: Int, s: String): Unit = { var i = 0; while (i < 4) { out(o + i) = s.charAt(i).toByte; i += 1 } }
    def w16(o: Int, v: Int): Unit = { out(o) = (v & 0xFF).toByte; out(o + 1) = ((v >> 8) & 0xFF).toByte }
    def w32(o: Int, v: Long): Unit = { var i = 0; while (i < 4) { out(o + i) = ((v >> (8 * i)) & 0xFF).toByte; i += 1 } }
    put4(0, "RIFF"); w32(4, 36L + dataLen); put4(8, "WAVE")
    put4(12, "fmt "); w32(16, 16L); w16(20, 1); w16(22, channels)
    w32(24, sampleRate.toLong); w32(28, byteRate.toLong); w16(32, blockAlign); w16(34, bitsPerSample)
    put4(36, "data"); w32(40, dataLen.toLong)
    var i = 0
    while (i < dataLen) { out(44 + i) = ((i * 7 + seed) & 0xFF).toByte; i += 1 }
    out
  }

  /** Decode entry point: real codec for recognized images, real header
   *  parse for WAV audio, stub for everything else (same output
   *  contract on every path). */
  private[operators] def decode(payload: Array[Byte]): (String, Int, Int, Int, Long) =
    decodeFull(payload)._1

  /** Real image resize via Graphics2D, re-encoded as PNG (lossless,
   *  always writable by the JDK). None for non-image payloads. */
  private[operators] def resizeImage(payload: Array[Byte], w: Int, h: Int): Option[Array[Byte]] =
    imageFormat(payload).flatMap { _ =>
      try {
        val src = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
        if (src == null) None
        else {
          val dst = new java.awt.image.BufferedImage(w, h,
            java.awt.image.BufferedImage.TYPE_INT_RGB)
          val g = dst.createGraphics()
          try {
            g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
              java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
            g.drawImage(src, 0, 0, w, h, null)
          } finally g.dispose()
          val bos = new java.io.ByteArrayOutputStream()
          javax.imageio.ImageIO.write(dst, "png", bos)
          Some(bos.toByteArray)
        }
      } catch { case _: Exception => None }
    }

  /** Metadata schema carried alongside every media column. */
  val mediaMetaType: StructType = StructType(Seq(
    StructField("format", StringType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("channels", IntegerType),
    StructField("duration_ms", LongType)))

  val decodedSchema: StructType = StructType(Seq(
    StructField("media_id", LongType),
    StructField("meta", mediaMetaType),
    StructField("feature", ArrayType(FloatType))))

  /**
   * STUB decode: derives deterministic pseudo-metadata from the
   * payload bytes (stands in for a real header parse). Real impl:
   * ImageIO.read / codec probe.
   */
  private[operators] def decodeStub(payload: Array[Byte]): (String, Int, Int, Int, Long) = {
    if (payload == null || payload.isEmpty) ("empty", 0, 0, 0, 0L)
    else {
      val h = java.util.Arrays.hashCode(payload)
      val fmt = Seq("jpeg", "png", "webp")(math.floorMod(h, 3))
      val w = 64 + math.floorMod(h >> 4, 1984)
      val ht = 64 + math.floorMod(h >> 8, 1984)
      (fmt, w, ht, 3, payload.length.toLong)
    }
  }

  /**
   * STUB feature extraction: `dim` floats hashed from payload content
   * (stands in for an embedding model / mel spectrogram). Deterministic.
   */
  /** REAL image features: bilinear resize to a g×g grid
   *  (g = floor(sqrt(dim))), per-cell grayscale mean in [0,1]
   *  (ITU-R 601 luma weights), remaining dims zero — the classic
   *  pooled-pixel embedding baseline. None for non-images / codec
   *  rejects (caller falls to the stub, same contract as decode). */
  /** Grayscale pooling kernel on an already-decoded image —
   *  [[decodeAndFeaturize]] decodes each payload ONCE (via
   *  [[decodeFull]]) and feeds the same BufferedImage here. */
  private def poolGray(img: java.awt.image.BufferedImage, dim: Int): Array[Float] = {
    if (dim <= 0) return new Array[Float](0) // featureStub parity
    val g = math.max(1, math.sqrt(dim.toDouble).toInt)
    val scaled = new java.awt.image.BufferedImage(g, g,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    val gr = scaled.createGraphics()
    try {
      gr.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
        java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
      gr.drawImage(img, 0, 0, g, g, null)
    } finally gr.dispose()
    val out = new Array[Float](dim)
    var y = 0
    while (y < g) {
      var x = 0
      while (x < g) {
        val rgb = scaled.getRGB(x, y)
        val gray = (((rgb >> 16) & 0xFF) * 299 + ((rgb >> 8) & 0xFF) * 587 +
          (rgb & 0xFF) * 114) / 1000
        out(y * g + x) = gray / 255.0f
        x += 1
      }
      y += 1
    }
    out
  }

  private[operators] def featureStub(payload: Array[Byte], dim: Int): Array[Float] = {
    val out = new Array[Float](dim)
    if (payload != null && payload.nonEmpty) {
      var i = 0
      while (i < dim) {
        var acc = 1469598103934665603L ^ i
        var j = i % payload.length
        val step = math.max(1, payload.length / 64)
        while (j < payload.length) {
          acc = (acc ^ payload(j)) * 1099511628211L
          j += step
        }
        out(i) = ((acc >>> 11).toDouble / (1L << 53).toDouble).toFloat
        i += 1
      }
    }
    out
  }

  /**
   * Decode + featurize a table of (id, payload) media rows. Batch
   * shape: one `mapPartitions` pass, schema [[decodedSchema]].
   * Partitioning is preserved (narrow transformation — no shuffle).
   */
  def decodeAndFeaturize(
      df: DataFrame, idCol: String, payloadCol: String, featureDim: Int = 64): DataFrame = {
    val enc = RowEncoder.encoderFor(decodedSchema)
    df.select(col(idCol).cast("long"), col(payloadCol))
      .mapPartitions { rows =>
        // per-partition setup would init the codec here (once per task)
        rows.map { r =>
          val id = r.getLong(0)
          val payload = if (r.isNullAt(1)) null else r.getAs[Array[Byte]](1)
          // images decode ONCE: metadata and pooled features come from
          // the same BufferedImage (the codec pass dominates CPU)
          val (meta, imgOpt) = decodeFull(payload)
          val feats = imgOpt.map(poolGray(_, featureDim))
            .getOrElse(featureStub(payload, featureDim))
          val (fmt, w, h, c, d) = meta
          Row(id, Row(fmt, w, h, c, d), feats.toSeq)
        }
      }(enc)
  }

  /** Resize: REAL transcode for recognized images (ImageIO decode →
   *  bilinear scale → PNG re-encode); deterministic stub bytes for
   *  non-image payloads, keeping the (binary in → binary out) contract
   *  and batch shape on both paths. */
  def resize(df: DataFrame, payloadCol: String, w: Int, h: Int): DataFrame = {
    val fields = df.schema.fields.map(f => StructField(f.name, f.dataType, f.nullable))
    val enc = RowEncoder.encoderFor(StructType(fields))
    val idx = df.schema.fieldIndex(payloadCol)
    df.mapPartitions { rows =>
      // per-partition setup would init a heavier transcoder here (once per task)
      rows.map { r =>
        val payload = if (r.isNullAt(idx)) null else r.getAs[Array[Byte]](idx)
        val resized =
          if (payload == null) null
          else resizeImage(payload, w, h).getOrElse {
            val target = math.max(16, (w * h) / 256)
            val out = new Array[Byte](target)
            var i = 0
            while (i < target) { out(i) = payload(i % payload.length); i += 1 }
            out
          }
        Row.fromSeq(r.toSeq.updated(idx, resized))
      }
    }(enc)
  }

  /** Frame sampling for video-like payloads: every `stride`-th 1 KiB
   *  block becomes a "frame" row (id, frame_no, frame_bytes). Real
   *  impl: keyframe extraction. Uses flatMap — narrow, no shuffle. */
  def sampleFrames(df: DataFrame, idCol: String, payloadCol: String, stride: Int = 4): DataFrame = {
    val schema = StructType(Seq(
      StructField("media_id", LongType),
      StructField("frame_no", IntegerType),
      StructField("frame", BinaryType)))
    val enc = RowEncoder.encoderFor(schema)
    df.select(col(idCol).cast("long"), col(payloadCol))
      .flatMap { r =>
        if (r.isNullAt(1)) Iterator.empty
        else {
          val payload = r.getAs[Array[Byte]](1)
          val blocks = payload.grouped(1024).zipWithIndex
          blocks.collect { case (b, i) if i % stride == 0 => Row(r.getLong(0), i, b) }
        }
      }(enc)
  }
}
