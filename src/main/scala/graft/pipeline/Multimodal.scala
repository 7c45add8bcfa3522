package graft.pipeline

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video payloads travel as opaque
  * `binary` columns with typed metadata; decode / feature-extraction runs
  * per-partition over batches.
  *
  * IMAGE decode is REAL: PNG/JPEG/BMP/GIF payloads (sniffed by magic bytes)
  * route through the JDK's `javax.imageio.ImageIO` into width/height plus a
  * grid-luminance feature vector. Audio/video payloads keep the
  * deterministic `fakeDecode` stand-in (no audio codecs in the JDK) — the
  * Spark-side contract (schema, partition-wise batching, vector shape) is
  * identical either way, so a deployment swaps in a JNI codec without
  * touching the plan shape.
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

  /** Batch feature extraction: runs once per partition (the mapInPandas
    * shape), so a real decoder could amortize model/codec init per batch.
    * Image payloads (magic-sniffed) decode through ImageIO to real
    * luminance-grid features; other modalities keep the declared stand-in.
    */
  def extractFeatures(media: Dataset[Media], dim: Int): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      // per-partition init happens here (decoder/model handle in prod)
      rows.map { m =>
        val feats = decodeImage(m.bytes) match {
          case Some((w, h, lum)) => imageFeatures(w, h, lum, dim)
          case None              => fakeDecode(m.bytes, dim)
        }
        MediaFeatures(m.id, m.modality, dim, feats)
      }
    }
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
    val nFrames = floor(length(col(bytesCol)) / frameSize).cast("int")
    df.select(col(idCol).as("id"),
        explode(transform(
          filter(sequence(lit(0), greatest(nFrames - 1, lit(0))),
            i => i % everyN === 0),
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
