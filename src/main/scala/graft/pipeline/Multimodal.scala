package graft.pipeline

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video payloads travel as opaque
  * `binary` columns with typed metadata; decode / feature-extraction runs
  * per-partition over batches.
  *
  * STUB NOTICE: this container has no image/audio codecs, so `decode` is a
  * deterministic fake (seeded by the payload bytes). The Spark-side contract
  * — schema, partition-wise batch processing, feature vector shape — is real
  * and tested; a deployment swaps `fakeDecode` for a JNI/codec call without
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

  /** Batch feature extraction: runs once per partition (the mapInPandas
    * shape), so a real decoder could amortize model/codec init per batch.
    */
  def extractFeatures(media: Dataset[Media], dim: Int): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      // per-partition init happens here (decoder/model handle in prod)
      rows.map(m => MediaFeatures(m.id, m.modality, dim, fakeDecode(m.bytes, dim)))
    }
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
