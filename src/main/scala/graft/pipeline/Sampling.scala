package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling and splitting for training-data pipelines.
  *
  * Everything here derives from a PORTABLE multiplicative hash of the
  * record key — plain int64 arithmetic (Knuth's 2654435761 mixer mod a
  * large prime), reproducible in any engine, any run, any partitioning:
  * the same record always lands in the same bucket, so samples are stable
  * across reruns and train/test membership never leaks when the corpus is
  * re-partitioned or appended to. `df.sample()` gives none of that (seeded
  * per-partition RNG = resample on every repartition), which is exactly
  * the wrong property for dataset curation at scale; a pure column
  * expression also pushes into the scan and costs no shuffle at all.
  */
object Sampling {

  /** 0..999 bucket from an integral key: ((key mod p) * 2654435761) mod
    * the prime p = 1e9+7, mod 1000. The key is reduced mod p BEFORE the
    * multiply, so the product is bounded by (p-1)·2654435761 ≈ 2^61.3 and
    * stays exact in int64 for EVERY int64 key — the unreduced form
    * overflowed past ~2^32 keys, which a >2^31-document corpus reaches
    * (silent wraparound non-ANSI; a job-killing ARITHMETIC_OVERFLOW under
    * ANSI). Reduction first is a ring homomorphism, so for keys < p the
    * bucket is unchanged (oracle parity holds on the test corpora).
    */
  def bucketOf(key: Column): Column =
    pmod(pmod(key.cast("long"), lit(1000000007L)) * lit(2654435761L) % lit(1000000007L),
      lit(1000))

  /** Keep ~`permille`/1000 of rows, deterministically by key. Applied
    * uniformly the hash is stratum-blind: each stratum keeps ~the same
    * fraction, without a per-stratum pass.
    */
  def sampleByKey(df: DataFrame, keyCol: String, permille: Int): DataFrame =
    df.filter(bucketOf(col(keyCol)) < permille)

  /** Proportional stratified sample with EXACT per-stratum counts:
    * rows are ranked inside each stratum by the key hash (deterministic,
    * uniform) and the top ceil(n_s * permille / 1000) of each stratum are
    * kept. One window shuffle on the stratum key; use [[sampleByKey]]
    * when approximate per-stratum fractions are acceptable.
    */
  def stratifiedExact(df: DataFrame, strataCol: String, keyCol: String,
      permille: Int): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(strataCol).orderBy(bucketOf(col(keyCol)), col(keyCol))
    val n = org.apache.spark.sql.expressions.Window.partitionBy(strataCol)
    df.withColumn("__rk", row_number().over(w))
      .withColumn("__n", count(lit(1)).over(n))
      .filter(col("__rk") <= ceil(col("__n") * permille / 1000.0))
      .drop("__rk", "__n")
  }

  /** Deterministic train/test split: (train, test) with ~`testPermille`
    * of rows in test, disjoint and exhaustive by construction.
    */
  def trainTestSplit(df: DataFrame, keyCol: String,
      testPermille: Int): (DataFrame, DataFrame) = {
    val b = bucketOf(col(keyCol))
    (df.filter(b >= testPermille), df.filter(b < testPermille))
  }
}
