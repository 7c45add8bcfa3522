package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Property pins for the native gram expressions (GramStats, GramHashes,
  * SetJaccard): for ARBITRARY generated texts — adversarial space runs,
  * unicode, empty tokens, heavy repetition — the one-pass kernels must
  * equal the HOF formulations they replaced. The crafted-fixture parity
  * tests (RepetitionSpec, DedupSpec) pin the known edges; this pins the
  * space between them. Fixed seed, one Spark job per property.
  */
class GramPropertySpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private def sampled[A](g: Gen[A], n: Int, seed: Long): Seq[A] =
    Iterator.iterate((Seed(seed), Option.empty[A])) { case (s, _) =>
      val (v, s2) = g.pureApply(Gen.Parameters.default, s) -> s.next
      (s2, Some(v))
    }.drop(1).take(n).flatMap(_._2).toSeq

  // words over a tiny alphabet (forces repeats), unicode included, plus the
  // empty word (consecutive-space artifact); joined with SINGLE spaces so
  // the doc itself can contain runs of spaces via the empty words
  private val wordGen = Gen.frequency(
    4 -> Gen.oneOf("a", "b", "ab", "héllo", "日本", "ΩΩ"),
    1 -> Gen.const(""))
  private val textGen = for {
    n <- Gen.frequency(4 -> Gen.choose(0, 12), 1 -> Gen.choose(40, 80))
    ws <- Gen.listOfN(n, wordGen)
  } yield ws.mkString(" ")

  private lazy val texts = sampled(textGen, 300, seed = 11L)
    .zipWithIndex.map { case (t, i) => (i.toLong, t) }
    .toDF("id", "text")

  private def hofGrams(n: Int) = {
    val ws = split(col("text"), " ")
    when(size(ws) >= n,
      transform(sequence(lit(0), size(ws) - n),
        i => array_join(slice(ws, i + 1, lit(n)), " ")))
      .otherwise(array().cast("array<string>"))
  }

  test("GramStats equals the HOF counters on arbitrary texts (n = 1, 2, 3)") {
    for (n <- Seq(1, 2, 3)) {
      val g = hofGrams(n)
      val mismatches = texts
        .withColumn("st", graft.functions.TextHashExpressions.gramStats(col("text"), n))
        .withColumn("g", g)
        .filter(
          col("st.total") =!= size(col("g")) ||
          col("st.ndistinct") =!= size(array_distinct(col("g"))) ||
          col("st.top") =!= coalesce(array_max(transform(array_distinct(col("g")),
            gg => size(filter(col("g"), x => x === gg)))), lit(0)))
        .count()
      assert(mismatches == 0L, s"n=$n: $mismatches texts diverge from the HOF counters")
    }
  }

  test("GramHashes equals xxhash64 over HOF grams on arbitrary texts") {
    for (n <- Seq(2, 5)) {
      val mismatches = texts
        .withColumn("nat", graft.functions.TextHashExpressions.gramHashes(col("text"), n))
        .withColumn("hof", transform(hofGrams(n), s => xxhash64(s)))
        .filter(col("nat") =!= col("hof"))
        .count()
      assert(mismatches == 0L, s"n=$n: $mismatches texts diverge")
    }
  }

  test("SetJaccard equals the intersect/union HOF on arbitrary gram pairs") {
    val grams = texts.withColumn("g", hofGrams(2)).select(col("id"), col("g"))
    val pairs = grams.as("a").join(grams.as("b"),
        (col("a.id") % 17) === (col("b.id") % 17) && col("a.id") < col("b.id"))
      .select(col("a.g").as("g1"), col("b.g").as("g2"))
    val mismatches = pairs
      .withColumn("nat", graft.pipeline.Dedup.jaccard(col("g1"), col("g2")))
      .withColumn("hof", graft.pipeline.Dedup.jaccardHOF(col("g1"), col("g2")))
      .filter(col("nat") =!= col("hof"))
      .count()
    assert(mismatches == 0L, s"$mismatches pairs diverge from the HOF jaccard")
  }
}
