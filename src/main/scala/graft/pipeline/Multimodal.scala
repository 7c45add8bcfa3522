package graft.pipeline

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video payloads travel as opaque
  * `binary` columns with typed metadata; decode / feature-extraction runs
  * per-partition over batches.
  *
  * IMAGE decode is REAL: PNG/JPEG/BMP/GIF payloads (sniffed by magic bytes)
  * route through the JDK's `javax.imageio.ImageIO` into width/height plus a
  * grid-luminance feature vector. AUDIO decode is REAL too: WAV/AIFF/AU
  * payloads route through the JDK's `javax.sound.sampled.AudioSystem` into
  * sample-rate/duration plus a windowed-RMS feature vector. Video payloads
  * keep the deterministic `fakeDecode` stand-in (the JDK has no video
  * codec) — the Spark-side contract (schema, partition-wise batching,
  * vector shape) is identical either way, so a deployment swaps in a JNI
  * codec without touching the plan shape.
  */
object Multimodal {

  final case class Media(id: Long, modality: String, bytes: Array[Byte],
      width: Int, height: Int)
  final case class MediaFeatures(id: Long, modality: String, dim: Int,
      features: Array[Float])

  /** Deterministic stand-in for a real decoder: hashes the payload into a
    * fixed-dim pseudo-feature vector. Replace with a real codec in prod.
    */
  private[pipeline] def fakeDecode(bytes: Array[Byte], dim: Int): Array[Float] = {
    val out = new Array[Float](dim)
    var h = 1125899906842597L // FNV-ish rolling seed over the payload
    var i = 0
    while (i < bytes.length) { h = h * 31 + bytes(i); i += 1 }
    var j = 0
    while (j < dim) {
      h = h * 6364136223846793005L + 1442695040888963407L
      out(j) = ((h >>> 40).toInt % 1000) / 1000.0f
      j += 1
    }
    out
  }

  /** True iff the payload starts with a magic number ImageIO can decode
    * (PNG / JPEG / GIF / BMP).
    */
  private[pipeline] def looksLikeImage(b: Array[Byte]): Boolean =
    b.length >= 4 && (
      (b(0) == 0x89.toByte && b(1) == 'P' && b(2) == 'N' && b(3) == 'G') ||
      (b(0) == 0xFF.toByte && b(1) == 0xD8.toByte && b(2) == 0xFF.toByte) ||
      (b(0) == 'G' && b(1) == 'I' && b(2) == 'F' && b(3) == '8') ||
      (b(0) == 'B' && b(1) == 'M'))

  /** Real image decode (JDK `javax.imageio.ImageIO` — PNG/JPEG/GIF/BMP):
    * (width, height, per-pixel luminance in row-major order), or None when
    * the payload is not a decodable image.
    */
  def decodeImage(bytes: Array[Byte]): Option[(Int, Int, Array[Float])] = {
    if (!looksLikeImage(bytes)) return None
    // NonFatal, not just IOException: JDK image plugins throw runtime
    // exceptions (AIOOBE, NegativeArraySize, IAE) on payloads that pass
    // the magic sniff but are truncated/corrupt — a bad record must fall
    // back to None, not kill the Spark task
    val img =
      try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      catch { case scala.util.control.NonFatal(_) => null }
    if (img == null) None
    else {
      val (w, h) = (img.getWidth, img.getHeight)
      val lum = new Array[Float](w * h)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val rgb = img.getRGB(x, y)
          // ITU-R BT.601 luma from the sRGB channels
          lum(y * w + x) = (0.299f * ((rgb >> 16) & 0xFF) +
            0.587f * ((rgb >> 8) & 0xFF) + 0.114f * (rgb & 0xFF))
          x += 1
        }
        y += 1
      }
      Some((w, h, lum))
    }
  }

  /** Image → fixed-dim feature vector: [width, height, cell-mean luminances]
    * over a near-square grid of `dim − 2` cells (the classic tiny-thumbnail
    * descriptor) — resolution-independent and deterministic.
    */
  private[pipeline] def imageFeatures(w: Int, h: Int, lum: Array[Float],
      dim: Int): Array[Float] = {
    val out = new Array[Float](dim)
    out(0) = w.toFloat
    if (dim > 1) out(1) = h.toFloat
    val cells = math.max(1, dim - 2)
    val gw = math.max(1, math.sqrt(cells.toDouble).toInt)
    val gh = math.max(1, cells / gw)
    var c = 0
    while (c < gw * gh && c + 2 < dim) {
      val (cx, cy) = (c % gw, c / gw)
      val (x0, x1) = (cx * w / gw, math.max(cx * w / gw + 1, (cx + 1) * w / gw))
      val (y0, y1) = (cy * h / gh, math.max(cy * h / gh + 1, (cy + 1) * h / gh))
      var sum = 0.0
      var n = 0
      var y = y0
      while (y < y1 && y < h) {
        var x = x0
        while (x < x1 && x < w) { sum += lum(y * w + x); n += 1; x += 1 }
        y += 1
      }
      out(c + 2) = if (n == 0) 0f else (sum / n).toFloat
      c += 1
    }
    out
  }

  /** True iff the payload starts with a magic number AudioSystem can decode
    * (RIFF/WAVE, FORM/AIFF-AIFC, Sun AU).
    */
  private[pipeline] def looksLikeAudio(b: Array[Byte]): Boolean =
    b.length >= 12 && (
      (b(0) == 'R' && b(1) == 'I' && b(2) == 'F' && b(3) == 'F' &&
        b(8) == 'W' && b(9) == 'A' && b(10) == 'V' && b(11) == 'E') ||
      (b(0) == 'F' && b(1) == 'O' && b(2) == 'R' && b(3) == 'M' &&
        b(8) == 'A' && b(9) == 'I' && b(10) == 'F') ||
      (b(0) == '.' && b(1) == 's' && b(2) == 'n' && b(3) == 'd'))

  /** Real audio decode (JDK `javax.sound.sampled.AudioSystem` — WAV, AIFF,
    * AU): (sampleRate, channels, frames, normalized [-1,1) samples,
    * channel-interleaved), or None when the payload is not decodable audio.
    * Whatever the container's encoding, the stream converts to 16-bit
    * signed little-endian PCM first (the JDK converts between PCM
    * variants), so the sample view is uniform.
    */
  def decodeAudio(bytes: Array[Byte]): Option[(Float, Int, Long, Array[Float])] = {
    if (!looksLikeAudio(bytes)) return None
    try {
      val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(bytes))
      val src = in.getFormat
      val target = new javax.sound.sampled.AudioFormat(
        javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED,
        src.getSampleRate, 16, src.getChannels, src.getChannels * 2,
        src.getSampleRate, false)
      val pcm = javax.sound.sampled.AudioSystem.getAudioInputStream(target, in)
      val raw = pcm.readAllBytes()
      val n = raw.length / 2
      val samples = new Array[Float](n)
      var i = 0
      while (i < n) {
        val lo = raw(2 * i) & 0xFF
        val hi = raw(2 * i + 1).toInt
        samples(i) = ((hi << 8) | lo) / 32768.0f
        i += 1
      }
      val channels = math.max(1, src.getChannels)
      Some((src.getSampleRate, channels, (n / channels).toLong, samples))
    } catch {
      // bad payloads that pass the sniff must fall back, not kill the task
      case scala.util.control.NonFatal(_) => None
    }
  }

  /** Audio → fixed-dim feature vector: [sampleRate, durationSec, windowed
    * RMS over dim − 2 equal sample windows] — the audio analogue of the
    * image grid descriptor: length-independent and deterministic.
    */
  private[pipeline] def audioFeatures(rate: Float, channels: Int,
      samples: Array[Float], dim: Int): Array[Float] = {
    val out = new Array[Float](dim)
    out(0) = rate
    if (dim > 1 && rate > 0 && channels > 0)
      out(1) = (samples.length.toFloat / channels) / rate
    val cells = math.max(1, dim - 2)
    var c = 0
    while (c < cells && c + 2 < dim) {
      val lo = c * samples.length / cells
      val hi = math.max(lo + 1, (c + 1) * samples.length / cells)
      var sum = 0.0
      var n = 0
      var i = lo
      while (i < hi && i < samples.length) {
        sum += samples(i).toDouble * samples(i); n += 1; i += 1
      }
      out(c + 2) = if (n == 0) 0f else math.sqrt(sum / n).toFloat
      c += 1
    }
    out
  }

  /** Batch feature extraction: runs once per partition (the mapInPandas
    * shape), so a real decoder could amortize model/codec init per batch.
    * Image payloads (magic-sniffed) decode through ImageIO to real
    * luminance-grid features; audio payloads through AudioSystem to real
    * RMS-window features; other modalities keep the declared stand-in.
    */
  def extractFeatures(media: Dataset[Media], dim: Int): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      // per-partition init happens here (decoder/model handle in prod)
      rows.map { m =>
        // route by the DECLARED modality, not a magic-byte sniff: a text
        // payload that happens to start with 'GIF8' would otherwise reach
        // ImageIO, whose GIF reader allocates a raster from bytes 6-9 of
        // arbitrary data (up to 65535x65535 → OutOfMemoryError, which the
        // NonFatal catch cannot stop). The codec still validates — a
        // mislabeled/corrupt payload falls back to the stand-in features.
        val feats = m.modality match {
          case "image" => decodeImage(m.bytes)
            .map { case (w, h, lum) => imageFeatures(w, h, lum, dim) }
            .getOrElse(fakeDecode(m.bytes, dim))
          case "audio" => decodeAudio(m.bytes)
            .map { case (rate, ch, _, samples) =>
              audioFeatures(rate, ch, samples, dim) }
            .getOrElse(fakeDecode(m.bytes, dim))
          case _ => fakeDecode(m.bytes, dim)
        }
        MediaFeatures(m.id, m.modality, dim, feats)
      }
    }
  }

  /** Decode metadata for a binary audio column — one row per decodable
    * payload: (id, sample_rate, channels, n_frames, duration_s, rms).
    * Per-partition batches over the opaque payload column, like
    * [[decodeImageMeta]].
    */
  def decodeAudioMeta(df: DataFrame, idCol: String, bytesCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long").as("id"), col(bytesCol).as("bytes"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.flatMap { case (id, bytes) =>
          decodeAudio(bytes).map { case (rate, channels, frames, samples) =>
            val rms =
              if (samples.isEmpty) 0.0
              else math.sqrt(samples.map(s => s.toDouble * s).sum / samples.length)
            (id, rate.toInt, channels, frames,
              frames.toDouble / rate, rms)
          }
        }
      }
      .toDF("id", "sample_rate", "channels", "n_frames", "duration_s", "rms")
  }

  /** Decode metadata for a binary image column — one row per decodable
    * image: (id, width, height, npixels, mean_lum). Runs per-partition over
    * the opaque payload column (the `mapInPandas` batch shape).
    */
  def decodeImageMeta(df: DataFrame, idCol: String, bytesCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long").as("id"), col(bytesCol).as("bytes"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.flatMap { case (id, bytes) =>
          decodeImage(bytes).map { case (w, h, lum) =>
            val mean = if (lum.isEmpty) 0.0 else lum.map(_.toDouble).sum / lum.length
            (id, w, h, w.toLong * h, mean)
          }
        }
      }
      .toDF("id", "width", "height", "npixels", "mean_lum")
  }

  /** Frame sampling for video-like payloads: every `everyN`-th fixed-size
    * chunk of the payload, as (id, frameIdx, frame) rows — pure column ops.
    */
  def sampleFrames(df: DataFrame, idCol: String, bytesCol: String,
      frameSize: Int, everyN: Int): DataFrame = {
    require(frameSize >= 1, s"frameSize must be >= 1, got $frameSize")
    require(everyN >= 1, s"everyN must be >= 1, got $everyN")
    val nFrames = floor(length(col(bytesCol)) / frameSize).cast("int")
    // `i < nFrames` (null-safe) drops the spurious frameIdx=0 row a
    // shorter-than-one-frame (or null) payload would otherwise emit — the
    // greatest() below only keeps sequence() ascending, it is NOT the
    // emptiness guard; explode on the empty array drops the row entirely
    df.select(col(idCol).as("id"),
        explode(transform(
          filter(sequence(lit(0), greatest(nFrames - 1, lit(0))),
            i => i % everyN === 0 && i < coalesce(nFrames, lit(0))),
          i => struct(i.as("frameIdx"),
            substring(col(bytesCol), i * frameSize + 1, lit(frameSize)).as("frame"))))
          .as("f"))
      .select(col("id"), col("f.frameIdx").as("frameIdx"), col("f.frame").as("frame"))
  }

  /** Synthetic PNG corpus derived from the documents table: doc_id becomes a
    * (2 + id%5) × (3 + id%4) constant-gray image (gray = 20 + id%200)
    * ENCODED with the real ImageIO PNG writer — so the decode path
    * round-trips genuine codec bytes while every decoded property stays
    * SQL-predictable for the oracle (PNG is lossless).
    */
  def documentsAsImages(spark: SparkSession, dir: String, cap: Long): DataFrame = {
    import spark.implicits._
    graft.core.Tables.documents(spark, dir)
      .select(col("doc_id").cast("long").as("id"))
      .filter(col("id") <= cap)
      .as[Long]
      .mapPartitions { ids =>
        ids.map { id =>
          val w = (2 + id % 5).toInt
          val h = (3 + id % 4).toInt
          val g = (20 + id % 200).toInt
          val img = new java.awt.image.BufferedImage(
            w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
          val rgb = (g << 16) | (g << 8) | g
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) { img.setRGB(x, y, rgb); x += 1 }
            y += 1
          }
          val bos = new java.io.ByteArrayOutputStream()
          javax.imageio.ImageIO.write(img, "png", bos)
          (id, bos.toByteArray)
        }
      }.toDF("id", "bytes")
  }

  /** Synthetic WAV corpus derived from the documents table: doc_id becomes
    * a constant-amplitude 16-bit mono PCM signal (amp = (20 + id%200)·100,
    * frames = 100 + id%50, rate = 8000 Hz) ENCODED with the real
    * AudioSystem WAV writer — the decode path round-trips genuine codec
    * bytes while sample-rate/frames/duration/RMS stay SQL-predictable for
    * the oracle (PCM is lossless; amp/32768 is exact in binary floating
    * point, so RMS of the constant signal is exactly amp/32768).
    */
  def documentsAsAudio(spark: SparkSession, dir: String, cap: Long): DataFrame = {
    import spark.implicits._
    graft.core.Tables.documents(spark, dir)
      .select(col("doc_id").cast("long").as("id"))
      .filter(col("id") <= cap)
      .as[Long]
      .mapPartitions { ids =>
        ids.map { id =>
          val amp = ((20 + id % 200) * 100).toInt
          val frames = (100 + id % 50).toInt
          val pcm = new Array[Byte](frames * 2)
          var i = 0
          while (i < frames) {
            pcm(2 * i) = (amp & 0xFF).toByte
            pcm(2 * i + 1) = ((amp >> 8) & 0xFF).toByte
            i += 1
          }
          val fmt = new javax.sound.sampled.AudioFormat(
            javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED,
            8000f, 16, 1, 2, 8000f, false)
          val ais = new javax.sound.sampled.AudioInputStream(
            new java.io.ByteArrayInputStream(pcm), fmt, frames.toLong)
          val bos = new java.io.ByteArrayOutputStream()
          javax.sound.sampled.AudioSystem.write(ais,
            javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
          (id, bos.toByteArray)
        }
      }.toDF("id", "bytes")
  }

  /** Documents-as-media view over the test corpus: the text payload becomes
    * the binary column, giving the multimodal path deterministic input.
    */
  def documentsAsMedia(spark: SparkSession, dir: String): Dataset[Media] = {
    import spark.implicits._
    graft.core.Tables.documents(spark, dir)
      .select(col("doc_id").as("id"), lit("text").as("modality"),
        col("text").cast("binary").as("bytes"),
        lit(0).as("width"), lit(0).as("height"))
      .as[Media]
  }
}
