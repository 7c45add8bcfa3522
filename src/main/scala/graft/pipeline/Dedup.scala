package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators for training-data pipelines: exact, MinHash+LSH,
  * SimHash, and n-gram Jaccard. Everything is shaped for scale: shingling
  * and signatures are per-row column expressions (codegen, no explode of the
  * shingle set), candidate generation is an equi-join on band keys, and only
  * candidates are verified.
  */
object Dedup {

  /** Exact dedup (hash group-by): one row per DISTINCT key group —
    * singletons included (callers count/filter on `n` as needed) — with
    * the canonical (minimum) id and the group size.
    */
  def exact(df: DataFrame, keyCols: Seq[String], idCol: String): DataFrame =
    df.groupBy(keyCols.map(col): _*)
      .agg(min(col(idCol)).as("keep"), count(lit(1)).as("n"))

  /** Word n-gram shingles as a distinct array (empty when too few words).
    * Native codegen expression (graft.functions.WordShingles) — the HOF
    * chain was interpreted CodegenFallback and dominated the MinHash
    * pipelines. Value parity with the HOF form is pinned in DedupSpec.
    */
  def shingles(text: Column, n: Int): Column =
    graft.functions.TextHashExpressions.wordShingles(text, n)

  /** The pre-native HOF formulation of [[shingles]] — kept only as the
    * independent cross-check for DedupSpec's parity test.
    */
  private[graft] def shinglesHOF(text: Column, n: Int): Column = {
    val ws = split(text, " ")
    array_distinct(
      when(size(ws) >= n,
        transform(sequence(lit(0), size(ws) - n),
          i => concat_ws(" ", (0 until n).map(j => element_at(ws, i + j + 1)): _*)))
        .otherwise(array()))
  }

  /** Exact Jaccard similarity of two shingle arrays. */
  def jaccard(a: Column, b: Column): Column =
    graft.functions.TextHashExpressions.setJaccard(a, b)

  /** Pre-native HOF formulation of [[jaccard]] — DedupSpec parity only. */
  private[graft] def jaccardHOF(a: Column, b: Column): Column =
    size(array_intersect(a, b)).cast("double") /
      greatest(size(array_union(a, b)), lit(1)).cast("double")

  // Seeded universal-hash parameters for MinHash: h_i(x) = (a_i·x + b_i) mod p.
  private val P = 2147483647L // 2^31 - 1 (prime)
  private def hashParams(numHashes: Int, seed: Long): Seq[(Long, Long)] = {
    val rnd = new scala.util.Random(seed)
    Seq.fill(numHashes)((1 + rnd.nextInt(Int.MaxValue - 1)).toLong ->
      rnd.nextInt(Int.MaxValue).toLong).map { case (a, b) => (a, b) }
  }

  /** MinHash signature (length numHashes) over word n-gram shingles.
    * Single-pass native codegen expression (graft.functions.MinHashSig) —
    * the HOF formulation (transform + array_min per hash) was interpreted
    * CodegenFallback and dominated the LSH hot path. No shuffle to build
    * signatures. The HOF-equivalence is pinned in DedupSpec.
    */
  def minHashSignature(text: Column, n: Int, numHashes: Int,
      seed: Long = 42L): Column =
    graft.functions.TextHashExpressions.minHashSig(shingles(text, n), numHashes, seed)

  /** The pre-native HOF formulation of [[minHashSignature]] — kept only as
    * the independent cross-check for DedupSpec's signature-parity test.
    */
  private[graft] def minHashSignatureHOF(text: Column, n: Int, numHashes: Int,
      seed: Long = 42L): Column = {
    val grams = shingles(text, n)
    val hs = transform(grams, g => pmod(xxhash64(g), lit(P)))
    val mins = hashParams(numHashes, seed).map { case (a, b) =>
      when(size(hs) > 0,
        array_min(transform(hs, h => pmod(h * a + b, lit(P))))).otherwise(lit(P))
    }
    array(mins: _*)
  }

  /** LSH band keys: the signature cut into `bands` bands of rows hashed to
    * one key each; two docs collide if any band matches.
    */
  def bandKeys(sig: Column, numHashes: Int, bands: Int): Column = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    val r = numHashes / bands
    array((0 until bands).map { bIdx =>
      struct(lit(bIdx).as("band"),
        xxhash64(concat_ws(",",
          transform(slice(sig, bIdx * r + 1, r), _.cast("string")))).as("key"))
    }: _*)
  }

  /** Recall-biased LSH banding for a Jaccard threshold: the fewest bands
    * (longest rows) whose S-curve midpoint (1/b)^(1/r) still sits at or
    * below `threshold`. threshold 1.0 → one band of the whole signature
    * (provably recall-1 for exact duplicates with the smallest possible
    * candidate set); threshold 0.5 with 16 hashes → 8 bands of 2.
    */
  def lshBands(numHashes: Int, threshold: Double): Int =
    (1 to numHashes).filter(numHashes % _ == 0)
      .find { b =>
        val r = numHashes / b
        math.pow(1.0 / b, 1.0 / r) <= threshold
      }
      .getOrElse(numHashes)

  /** MinHash-LSH near-duplicate pairs: signature → band keys → band-key
    * equi-join for candidates → exact Jaccard verification at `threshold`.
    * Returns (id1, id2, jac) with id1 < id2. `bands = 0` (default) derives
    * the banding from the threshold via [[lshBands]] — a banding mismatched
    * to the threshold inflates the candidate join at any scale.
    *
    * Scale shape: the only shuffles are the band-key self-join (candidates,
    * not all pairs) and the final distinct; verification re-joins the two
    * shingle arrays by id.
    */
  def minHashNearDuplicates(df: DataFrame, idCol: String, textCol: String,
      n: Int = 3, numHashes: Int = 16, bands: Int = 0,
      threshold: Double = 0.5, seed: Long = 42L): DataFrame = {
    val numBands = if (bands > 0) bands else lshBands(numHashes, threshold)
    // single projected shingle column feeds both the signature and the
    // verification join. The plan consumes it through FOUR subtrees (the
    // band self-join's two sides + the two verification joins) and
    // exchange reuse does not dedup them (verified: 4 exchanges, 0 reused)
    // — a lazy localCheckpoint materializes the tokenize+shingle+sig pass
    // ONCE on first use; blocks are ContextCleaner-managed, laziness and
    // the call-site contract are preserved
    val withSig = df
      .select(col(idCol).as("__id"), shingles(col(textCol), n).as("__grams"))
      .select(col("__id"), col("__grams"),
        graft.functions.TextHashExpressions
          .minHashSig(col("__grams"), numHashes, seed).as("__sig"))
      .localCheckpoint(false)
    val banded = withSig.select(col("__id"),
      explode(bandKeys(col("__sig"), numHashes, numBands)).as("__bk"))
    val candidates = banded.as("l")
      .join(banded.as("r"), col("l.__bk") === col("r.__bk") &&
        col("l.__id") < col("r.__id"))
      .select(col("l.__id").as("id1"), col("r.__id").as("id2"))
      .distinct()
    val g1 = withSig.select(col("__id").as("id1"), col("__grams").as("__g1"))
    val g2 = withSig.select(col("__id").as("id2"), col("__grams").as("__g2"))
    candidates.join(g1, "id1").join(g2, "id2")
      .select(col("id1"), col("id2"),
        // round BEFORE the threshold filter, deliberately: the DuckDB
        // oracle applies the same round-then-filter, so boundary pairs
        // (true jac within 5e-7 of the threshold) agree bit-for-bit across
        // engines — filtering raw values would let engine-side ulp drift
        // flip membership
        round(jaccard(col("__g1"), col("__g2")), 6).as("jac"))
      .filter(col("jac") >= threshold)
  }

  /** 64-bit SimHash over words: bit i of the fingerprint is the sign of the
    * sum over words of ±1 according to bit i of xxhash64(word). Single-pass
    * native codegen expression (graft.functions.SimHash64Expr).
    */
  def simHash64(text: Column): Column =
    graft.functions.TextHashExpressions.simHash64(split(text, " "))

  /** Pre-native HOF formulation of [[simHash64]] — DedupSpec parity only. */
  private[graft] def simHash64HOF(text: Column): Column = {
    val hs = transform(split(text, " "), w => xxhash64(w))
    (0 until 64).map { i =>
      val bitSum = aggregate(hs, lit(0L),
        (acc, h) => acc + when(shiftright(h, i).bitwiseAND(1L) === 1L, 1L).otherwise(-1L))
      when(bitSum >= 0, lit(1L << i)).otherwise(0L)
    }.reduce(_ bitwiseOR _)
  }

  /** Hamming distance between two 64-bit fingerprints. */
  def hamming64(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))
}
