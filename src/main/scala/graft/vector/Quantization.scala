package graft.vector

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Vector quantization (SURVEY §2.7; reference vector/quantization.rs:
  * scalar, binary, and product quantizers). All build steps are one
  * distributed aggregation plus a driver-resident codebook (dim- or
  * m·k-sized — small by definition); encoding is pure column arithmetic so
  * it composes with any scan or join.
  */
object Quantization {

  /** Per-dimension min/max codebook for `bits`-bit scalar quantization. */
  final case class ScalarModel(mins: Seq[Double], maxs: Seq[Double], bits: Int) {
    require(bits >= 1 && bits <= 16, s"scalar quantization bits must be in [1, 16], got $bits")
    private def levels: Int = (1 << bits) - 1
    private def minsLit: Column = array(mins.map(lit): _*)
    private def maxsLit: Column = array(maxs.map(lit): _*)

    /** array<double> → array<long> of codes in [0, 2^bits). x = max maps to
      * exactly `levels` ((mx-mn)/(mx-mn) is exactly 1.0 in IEEE). The
      * ratio is CLAMPED to [0, 1]: the codebook is a reusable model, so a
      * later ingest batch can carry values outside the fitted range —
      * unclamped they would produce negative or > levels codes, corrupting
      * any downstream byte packing. Constant dimensions map to 0.
      */
    def quantize(vec: Column): Column =
      zip_with(vec, sequence(lit(0), lit(mins.size - 1)), (x, i) => {
        val mn = element_at(minsLit, i.cast("int") + 1)
        val mx = element_at(maxsLit, i.cast("int") + 1)
        val r = least(greatest((x.cast("double") - mn) / (mx - mn), lit(0.0)),
          lit(1.0))
        when(mx === mn, lit(0L)).otherwise(floor(r * levels).cast("long"))
      })

    /** Midpoint reconstruction: code c → min + (c + 0.5)·(max-min)/levels. */
    def dequantize(codes: Column): Column =
      zip_with(codes, sequence(lit(0), lit(mins.size - 1)), (c, i) => {
        val mn = element_at(minsLit, i.cast("int") + 1)
        val mx = element_at(maxsLit, i.cast("int") + 1)
        when(mx === mn, mn)
          .otherwise(mn + (c.cast("double") + 0.5) * (mx - mn) / levels)
      })
  }

  /** Fit the per-dimension min/max codebook — one posexplode + aggregation
    * over the corpus, dim rows back to the driver.
    */
  def fitScalar(df: DataFrame, vecCol: String, bits: Int = 8): ScalarModel = {
    val mm = df.select(posexplode(col(vecCol)).as(Seq("pos", "v")))
      .groupBy("pos")
      .agg(min(col("v").cast("double")).as("mn"), max(col("v").cast("double")).as("mx"))
      .collect()
      .sortBy(_.getInt(0))
    ScalarModel(mm.map(_.getDouble(1)).toSeq, mm.map(_.getDouble(2)).toSeq, bits)
  }

  /** Binary (sign) quantization: bit d set iff vec[d] >= threshold, packed
    * into 32-bit words (exact integer sums — a 64-bit pack would overflow
    * the sign bit, and float threshold aggregates would be summation-order
    * dependent; a fixed threshold keeps the code reproducible anywhere).
    * Returns (idCol, word, code) with dim/32 rows per vector.
    */
  def binaryCodes(df: DataFrame, idCol: String, vecCol: String,
      threshold: Double = 0.0): DataFrame =
    df.select(col(idCol), posexplode(col(vecCol)).as(Seq("pos", "v")))
      .select(col(idCol), (col("pos") / 32).cast("int").as("word"),
        when(col("v").cast("double") >= threshold,
          expr("shiftleft(CAST(1 AS BIGINT), pos % 32)")).otherwise(lit(0L)).as("b"))
      .groupBy(col(idCol), col("word"))
      .agg(sum(col("b")).as("code"))

  /** Hamming distance between two packed words. */
  def hamming(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  /** Product quantizer: m contiguous subspaces, each with its own k-centroid
    * codebook (the IVF k-means fitted per slice). Codes are m small ints —
    * dim·4 bytes become m bytes at scale.
    */
  final case class PqModel(subModels: Seq[Ivf.Model], subDim: Int) {
    def m: Int = subModels.size

    /** array<float/double> → array<int> of m centroid ids. */
    def encode(vec: Column): Column =
      array(subModels.zipWithIndex.map { case (sm, i) =>
        sm.cellOf(slice(vec, i * subDim + 1, subDim))
      }: _*)

    /** Approximate reconstruction: concatenation of the code's centroids. */
    def decode(codes: Column): Column =
      concat(subModels.zipWithIndex.map { case (sm, i) =>
        val centroidsLit = array(sm.centroids.map(c => array(c.map(lit): _*)): _*)
        element_at(centroidsLit, element_at(codes, i + 1) + 1)
      }: _*)
  }

  def fitProduct(df: DataFrame, idCol: String, vecCol: String,
      m: Int, k: Int, iters: Int = 3): PqModel = {
    val dim = df.select(size(col(vecCol))).first().getInt(0)
    require(dim % m == 0, s"m=$m must divide dim=$dim")
    val subDim = dim / m
    val subModels = (0 until m).map { i =>
      Ivf.fit(df.select(col(idCol),
        slice(col(vecCol), i * subDim + 1, subDim).as(vecCol)),
        idCol, vecCol, nlist = k, iters = iters)
    }
    PqModel(subModels, subDim)
  }
}
