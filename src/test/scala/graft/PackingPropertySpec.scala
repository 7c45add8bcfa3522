package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite
import graft.core.Tables
import graft.pipeline.Curation

/** Property tests (scalacheck generators, fixed seed, batched through ONE
  * Spark job each so 200 cases cost one plan, not 200): the packing
  * invariants hold for arbitrary corpora, and timestamp unit inference
  * round-trips every epoch unit for arbitrary instants.
  */
class PackingPropertySpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private def sampled[A](g: Gen[A], n: Int, seed: Long): Seq[A] =
    Iterator.iterate((Seed(seed), Option.empty[A])) { case (s, _) =>
      val (v, s2) = g.pureApply(Gen.Parameters.default, s) -> s.next
      (s2, Some(v))
    }.drop(1).take(n).flatMap(_._2).toSeq

  test("packSequences invariants hold on a generated corpus") {
    // arbitrary word counts incl. empty and budget-straddling documents
    val wcGen = Gen.frequency(3 -> Gen.choose(0, 30), 2 -> Gen.choose(200, 700),
      1 -> Gen.const(0), 1 -> Gen.const(512))
    val wcs = sampled(wcGen, 200, seed = 7L)
    val docs = wcs.zipWithIndex.map { case (wc, i) =>
      (i.toLong, Seq.fill(wc)("w").mkString(" "))
    }.toDF("doc_id", "text")
    val budget = 512
    val out = Curation.packSequences(docs, "doc_id", "text", budget)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))

    // NOTE: split(" ") of "" yields one empty token, so wc=0 counts as 1 —
    // mirror the engine's token definition when re-deriving prefixes
    var prefix = 0L
    var lastBin = -1L
    for ((id, tok, bin) <- out) {
      assert(bin == prefix / budget,
        s"doc $id: bin $bin != exclusive-prefix ${prefix} / $budget")
      assert(bin >= lastBin, s"bins must be nondecreasing in doc order at $id")
      lastBin = bin
      prefix += tok
    }
    assert(out.head._3 == 0L, "first document must land in bin 0")
    assert(out.length == wcs.length, "no document may be dropped")
  }

  test("sharded packing ≡ global packing per shard, with disjoint bin ranges") {
    val wcGen = Gen.frequency(3 -> Gen.choose(0, 30), 2 -> Gen.choose(200, 700),
      1 -> Gen.const(0), 1 -> Gen.const(512))
    val wcs = sampled(wcGen, 240, seed = 13L)
    val docs = wcs.zipWithIndex.map { case (wc, i) =>
      (i.toLong, i.toLong % 5L, Seq.fill(wc)("w").mkString(" "))
    }.toDF("doc_id", "shard", "text")
    val budget = 512
    val sharded = Curation.packSequencesSharded(docs, "doc_id", "shard", "text", budget)
      .select("shard", "doc_id", "tok", "bin").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(t => (t._1, t._2))

    // per shard: bins minus the shard's base bin reproduce the GLOBAL form
    // run on that shard's documents alone
    for (shard <- sharded.map(_._1).distinct) {
      val mine = sharded.filter(_._1 == shard)
      val base = mine.map(_._4).min
      val alone = Curation.packSequences(
          docs.filter(col("shard") === shard), "doc_id", "text", budget)
        .orderBy("doc_id").collect()
        .map(r => (r.getLong(0), r.getLong(2)))
      assert(mine.map(t => (t._2, t._4 - base)).toSeq == alone.toSeq,
        s"shard $shard: sharded bins must equal the global form run per shard")
    }
    // global uniqueness: shards occupy pairwise-disjoint bin ranges
    val ranges = sharded.groupBy(_._1).map { case (s2, rows) =>
      (s2, rows.map(_._4).min, rows.map(_._4).max)
    }.toSeq.sortBy(_._2)
    for (Seq(a, b) <- ranges.sliding(2).toSeq if ranges.size > 1)
      assert(a._3 < b._2,
        s"bin ranges of shards ${a._1} and ${b._1} overlap: $a vs $b")
  }

  test("normalizeEventTs round-trips arbitrary instants in every epoch unit") {
    // instants across the inference window, all four encodings per instant
    val secGen = Gen.choose(
      java.time.Instant.parse("1975-01-01T00:00:00Z").getEpochSecond,
      java.time.Instant.parse("2090-01-01T00:00:00Z").getEpochSecond)
    val secs = sampled(secGen, 200, seed = 11L)
    val rows = secs.flatMap(s =>
      Seq((s, s), (s * 1000L, s), (s * 1000000L, s), (s * 1000000000L, s))) :+
      (0L, 0L) // the sentinel: unambiguous (1970-01-01 in every unit), must not raise
    val df = rows.toDF("ts", "expect")
    val bad = Tables.normalizeEventTs(df)
      .filter(col("ts").cast("long") =!= col("expect"))
      .count()
    assert(bad == 0, s"$bad of ${rows.size} encodings decoded to a wrong instant")
  }
}
