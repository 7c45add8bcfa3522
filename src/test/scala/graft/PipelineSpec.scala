package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.pipeline.{Dedup, Multimodal, TextAnalysis}
import graft.vector.Knn

class KnnSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  lazy val emb = spark.read.parquet(s"$sf/embeddings.parquet")

  test("TopKAgg keeps k best with deterministic tie-break") {
    val df = Seq((1L, 0.9, 10L), (1L, 0.9, 5L), (1L, 0.5, 7L), (1L, 0.99, 2L))
      .toDF("q", "s", "id")
    val topk = udaf(new Knn.TopKAgg(2),
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[(Double, Long)]())
    val out = df.groupBy("q")
      .agg(topk($"s", $"id").as("t"))
      .select(explode($"t")).collect()
      .map(r => (r.getStruct(0).getDouble(0), r.getStruct(0).getLong(1)))
    assert(out.toSeq == Seq((0.99, 2L), (0.9, 5L)))
  }

  test("a zero-norm vector scores 0 everywhere instead of failing the job") {
    // Spark 4 runs ANSI mode by default: an unguarded cosine divide threw
    // DIVIDE_BY_ZERO on the first all-zero embedding. cos(a, 0) := 0.0,
    // matching Hnsw.Index.dist's d == 0 → distance 1.0 convention.
    val df = Seq((1L, Array(0f, 0f)), (2L, Array(1f, 0f)), (3L, Array(0f, 1f)))
      .toDF("id", "v")
    val out = Knn.bruteForceTopK(df, "id", "v", df, "id", "v", k = 2)
      .filter($"qid" === 1L).orderBy($"rank")
      .select($"score").as[Double].collect().toSeq
    assert(out == Seq(0.0, 0.0))
  }

  test("nearDupAgainst pairs two new documents inside one batch") {
    val corpus = Seq((1L, Array(1f, 0f, 0f))).toDF("id", "v")
    // 10 and 11 are near-identical NEW docs not yet in the corpus; 12
    // matches the corpus doc — all three pairs routes must fire
    val batch = Seq(
      (10L, Array(0f, 1f, 0f)), (11L, Array(0f, 0.999f, 0.01f)),
      (12L, Array(0.999f, 0.01f, 0f))).toDF("id", "v")
    val pairs = Knn.nearDupAgainst(batch, corpus, "id", "v", 0.95)
      .select($"id1", $"id2").as[(Long, Long)].collect().toSet
    assert(pairs == Set((10L, 11L), (1L, 12L)),
      "intra-batch AND batch-vs-corpus near-dups must both surface")
  }

  test("brute-force knn is self-consistent and ranked") {
    val res = Knn.bruteForceTopK(
      emb.filter($"vec_id" < 3), "vec_id", "embedding",
      emb, "vec_id", "embedding", k = 4).collect()
    assert(res.length == 12)
    res.groupBy(_.getLong(0)).foreach { case (_, rows) =>
      val scores = rows.sortBy(_.getInt(3)).map(_.getDouble(2)).toSeq
      assert(scores == scores.sorted.reverse, "scores descend with rank")
    }
  }

  // Recall parity evidence vs the reference's HNSW claim (>95% recall@10 at
  // ef=64, docs/ecosystem/performance.md:128): that figure is measured on
  // real embedding spaces, which cluster. On a clustered corpus (12 jittered
  // copies of each query planted next to the isotropic synthetic vectors)
  // the bucketed paths reach comparable recall; on purely isotropic random
  // vectors every sublinear method degrades by construction (no neighbor
  // structure to exploit) — measured numbers in COVERAGE.md §ANN.
  private def clustered(queries: org.apache.spark.sql.DataFrame) = {
    val jittered = (1 to 12).map { j =>
      queries.select((col("vec_id") * 1000 + j).as("vec_id"),
        transform(col("embedding"),
          x => x + lit((j * 7 % 5 - 2) * 0.01f)).as("embedding"))
    }.reduce(_ unionByName _)
    emb.select("vec_id", "embedding").unionByName(jittered)
  }

  test("lsh recall@10 on a clustered corpus exceeds 0.9") {
    val q = emb.filter($"vec_id" < 20)
    val corpus = clustered(q)
    val brute = Knn.bruteForceTopK(q, "vec_id", "embedding",
      corpus, "vec_id", "embedding", k = 10).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val approx = Knn.lshTopK(q, "vec_id", "embedding",
      corpus, "vec_id", "embedding", k = 10, dim = 64, bits = 8, tables = 8,
      probes = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (brute & approx).size.toDouble / brute.size
    info(f"lsh clustered recall@10 = $recall%.4f")
    assert(recall >= 0.9, s"recall $recall below 0.9")
  }

  test("lsh knn recall vs brute force is reasonable") {
    val brute = Knn.bruteForceTopK(emb.filter($"vec_id" < 10), "vec_id", "embedding",
      emb, "vec_id", "embedding", k = 5).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val approx = Knn.lshTopK(emb.filter($"vec_id" < 10), "vec_id", "embedding",
      emb, "vec_id", "embedding", k = 5, dim = 64, bits = 4, tables = 8).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (brute & approx).size.toDouble / brute.size
    assert(recall >= 0.4, s"recall $recall too low")
  }

  test("semDedup hub clusters re-shard by LSH band: same removals, banded plan") {
    // one hub cluster holding ALL 120 vectors — the 100-TB norm the skew
    // guard exists for. 8 orthogonal directions × 15 magnitudes: every
    // same-direction pair is exactly collinear (cos 1 → collides in every
    // LSH table at any width, so the banded arm can never miss it) and
    // every cross-direction pair is cos 0 — band-on must equal band-off
    // EXACTLY, not just approximately
    val vs = (0 until 120).map { i =>
      (i.toLong, Array.tabulate(8)(d => if (d == i % 8) (i + 1).toFloat else 0f))
    }.toDF("vec_id", "embedding")
    val cent = Seq((0L, Array.fill(8)(1f))).toDF("cid", "cvec")
    def removals(cap: Int) =
      Knn.semDedup(vs, "vec_id", "embedding", cent, "cid", "cvec",
        tau = 0.99, maxClusterSize = cap)
    val banded = removals(50) // 120 > 50 → hub path
    val exact = removals(1 << 20) // uncapped → plain equi-join path
    val bandedRemoved = banded.filter(col("removed")).collect().map(_.getLong(0)).toSet
    val exactRemoved = exact.filter(col("removed")).collect().map(_.getLong(0)).toSet
    assert(bandedRemoved == exactRemoved,
      "the banded hub path must produce the exact path's removals")
    // keep-lowest policy: direction d keeps id d, removes the other 14
    assert(exactRemoved == (8L until 120L).toSet)
    // the hub pairwise step must actually be SHARDED by band: the band key
    // appears as a join key only on the guarded path
    val bandedPlan = banded.queryExecution.optimizedPlan.toString
    val exactPlan = exact.queryExecution.optimizedPlan.toString
    assert(bandedPlan.contains("__band"),
      s"hub cluster must route through the banded pairwise join:\n$bandedPlan")
    assert(!exactPlan.contains("__band"),
      "under-cap clusters must keep the exact equi-join path")
  }

  test("semDedup band sizing: occupancy-constant bits, tau-aware tables") {
    // 25k-member hub at SemDeDup's operating point: 12 bits, tables grown
    // until estimated true-pair miss < 1%
    val (b99, t99, m99) = Knn.semDedupBandSizing(25000L, tau = 0.99, 0, 0)
    assert(b99 == 12 && t99 >= 8 && m99 < 0.01, s"($b99,$t99,$m99)")
    // mid-range tau: even 32 tables cannot hold recall — the miss estimate
    // must exceed the 5% warn threshold (the path logs, never silently)
    val (_, t80, m80) = Knn.semDedupBandSizing(25000L, tau = 0.80, 0, 0)
    assert(t80 == 32 && m80 > 0.05, s"($t80,$m80)")
    // explicit overrides pass through untouched
    assert(Knn.semDedupBandSizing(25000L, 0.99, 8, 8)._1 == 8)
    assert(Knn.semDedupBandSizing(25000L, 0.99, 8, 8)._2 == 8)
    // bits never shrink below 8 nor grow past 16
    assert(Knn.semDedupBandSizing(10L, 0.99, 0, 0)._1 == 8)
    assert(Knn.semDedupBandSizing(100000000L, 0.99, 0, 0)._1 == 16)
  }

  test("semDedup removes exactly the lower-id-mated near-copies, cluster-locally") {
    // two well-separated clusters; ids 10/11 are exact copies of 0, id 20
    // is a copy of 1 — removal must keep the LOWEST id of each copy group
    val vs = Seq(
      (0L, Array(1f, 0f, 0f, 0f)), (1L, Array(0f, 1f, 0f, 0f)),
      (2L, Array(0.8f, 0.6f, 0f, 0f)), (10L, Array(1f, 0f, 0f, 0f)),
      (11L, Array(2f, 0f, 0f, 0f)), (20L, Array(0f, 3f, 0f, 0f))
    ).toDF("vec_id", "embedding")
    val cent = vs.filter(col("vec_id") < 2)
      .select(col("vec_id").as("cid"), col("embedding").as("cvec"))
    // force the non-broadcast regime so the plan guard is meaningful: with
    // autoBroadcast on, even a regressed corpus-wide pairing would plan as
    // BroadcastNestedLoopJoin on 6 rows and never show a CartesianProduct
    // (the explicit broadcast hint keeps the legitimate centroid cross-join)
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val out = Knn.semDedup(vs, "vec_id", "embedding", cent, "cid", "cvec",
          tau = 0.99)
      val removed = out.filter(col("removed")).collect().map(_.getLong(0)).toSet
      assert(removed == Set(10L, 11L, 20L),
        "copies keep their lowest id; cross-cluster items never pair")
      // the pairwise join must be KEYED on the cluster id: losing the
      // cid equi-predicate would now surface as a cartesian/BNLJ pair join
      val plan = out.queryExecution.executedPlan.toString
      assert(!plan.contains("CartesianProduct"),
        s"within-cluster pairing must be an equi-join on cid:\n$plan")
      assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"),
        s"expected a keyed pair join under broadcast-off:\n$plan")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }
}

class DedupSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  test("minhash finds planted near-duplicate") {
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa " +
      "lambda mu nu xi omicron pi rho sigma tau upsilon"
    val docs = Seq(
      (1L, base),
      (2L, base.replace("pi", "phi")), // near-dup of 1
      (3L, "one two three four five six seven eight nine ten eleven twelve"),
      (4L, "completely different words entirely unrelated content here now")
    ).toDF("id", "text")
    val pairs = Dedup.minHashNearDuplicates(docs, "id", "text",
      n = 2, numHashes = 16, bands = 8, threshold = 0.3).collect()
    assert(pairs.exists(r => r.getLong(0) == 1L && r.getLong(1) == 2L))
    assert(!pairs.exists(r => r.getLong(1) == 4L || r.getLong(0) == 4L))
  }

  test("native shingles match the HOF formulation exactly") {
    val texts = Seq(
      "a b c d e",
      "a b c a b c a b",     // repeats → distinct, first-occurrence order
      "one two",              // too few words → empty
      "",                     // empty text
      "x  y z",               // double space → empty token kept
      "trailing space ",      // trailing empty token
      "solo"
    ).toDF("text")
    val both = texts.select(
      Dedup.shingles(org.apache.spark.sql.functions.col("text"), 3).as("native"),
      Dedup.shinglesHOF(org.apache.spark.sql.functions.col("text"), 3).as("hof"))
      .collect()
    both.foreach { r =>
      assert(r.getSeq[String](0) == r.getSeq[String](1), s"mismatch: $r")
    }
  }

  test("mid-threshold output is sound: verified pairs are a subset of exact all-pairs") {
    // the q_neardup fixture shape: documents + planted 80%-prefix near-dups;
    // at the mid-threshold 8×2 banding candidate generation may MISS pairs
    // (recall < 1, signature-dependent) but exact-Jaccard verification must
    // make every EMITTED pair true — zero false positives, with the exact
    // jaccard value
    val base = spark.read.parquet(s"$sf/documents.parquet")
      .filter(col("doc_id") < 60)
      .select(col("doc_id").cast("long").as("id"), col("text"))
    val ws = split(col("text"), " ")
    val planted = base.select((col("id") + 1000L).as("id"),
      concat_ws(" ", slice(ws, lit(1),
        greatest(floor(size(ws) * 4 / 5).cast("int"), lit(3)))).as("text"))
    val docs = base.unionByName(planted)
    val out = Dedup.minHashNearDuplicates(docs, "id", "text",
      n = 2, numHashes = 16, bands = 8, threshold = 0.5)
    val sh = docs.select(col("id"), Dedup.shingles(col("text"), 2).as("s"))
    val exact = sh.as("a").join(sh.as("b"), col("a.id") < col("b.id"))
      .select(col("a.id").as("id1"), col("b.id").as("id2"),
        round(Dedup.jaccard(col("a.s"), col("b.s")), 6).as("jac"))
      .filter(col("jac") >= 0.5)
    assert(out.join(exact, Seq("id1", "id2"), "left_anti").isEmpty,
      "every verified pair must be a true >=threshold pair")
    val joined = out.withColumnRenamed("jac", "j1").join(exact, Seq("id1", "id2"))
    assert(joined.filter(col("j1") =!= col("jac")).isEmpty,
      "verified jaccard must equal the exact jaccard")
    info(s"soundness fixture: ${out.count()} verified of ${exact.count()} exact pairs")
  }

  test("lshBands derives recall-biased banding from the threshold") {
    assert(Dedup.lshBands(16, 1.0) == 1)  // exact dup: one full-sig band
    assert(Dedup.lshBands(16, 0.5) == 8)  // the classic 8×2 at 0.5
    assert(Dedup.lshBands(16, 0.0) == 16) // recall-everything: 16×1
    // monotone: lower threshold never yields fewer bands
    val bs = Seq(1.0, 0.9, 0.7, 0.5, 0.3, 0.1).map(Dedup.lshBands(16, _))
    assert(bs == bs.sorted)
  }

  test("minhash jaccard matches exact jaccard formula") {
    val docs = Seq((1L, "a b c d e f"), (2L, "a b c d e g")).toDF("id", "text")
    val pairs = Dedup.minHashNearDuplicates(docs, "id", "text",
      n = 2, numHashes = 16, bands = 16, threshold = 0.0).collect()
    // 2-gram sets: {ab,bc,cd,de,ef} vs {ab,bc,cd,de,eg}: |∩|=4, |∪|=6
    assert(pairs.length == 1)
    assert(math.abs(pairs.head.getDouble(2) - 4.0 / 6.0) < 1e-6)
  }

  test("simhash of near-identical texts has small hamming distance") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again and again"),
      (2L, "the quick brown fox jumps over the lazy cat again and again"),
      (3L, "entirely unrelated vocabulary describing something else wholly")
    ).toDF("id", "text")
    val hashed = docs.select($"id", Dedup.simHash64($"text").as("h"))
    val m = hashed.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(ham(m(1L), m(2L)) < ham(m(1L), m(3L)))
    assert(ham(m(1L), m(2L)) <= 16)
  }

  test("native minhash signature is value-identical to the HOF formulation") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select($"doc_id", $"text").limit(50)
    val both = docs.select(
      Dedup.minHashSignature($"text", 3, 16).as("nat"),
      Dedup.minHashSignatureHOF($"text", 3, 16).as("hof"))
    assert(both.filter($"nat" =!= $"hof").isEmpty, "signature drift vs HOF")
    // and empty/short texts fall back to the P sentinel identically
    val edge = Seq((1L, ""), (2L, "one two")).toDF("id", "text")
    val e = edge.select(Dedup.minHashSignature($"text", 3, 8).as("nat"),
      Dedup.minHashSignatureHOF($"text", 3, 8).as("hof"))
    assert(e.filter($"nat" =!= $"hof").isEmpty)
  }

  test("native set-jaccard is value-identical to the HOF formulation") {
    // corpus shingle arrays + engineered edges: dups WITHIN an array (set
    // semantics), empty vs non-empty, both empty, disjoint, identical
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select($"doc_id", $"text").limit(50)
    val pairs = docs.as("a").join(docs.as("b"), $"a.doc_id" < $"b.doc_id")
      .select(Dedup.shingles($"a.text", 3).as("g1"),
        Dedup.shingles($"b.text", 3).as("g2"))
    val both = pairs.select(Dedup.jaccard($"g1", $"g2").as("nat"),
      Dedup.jaccardHOF($"g1", $"g2").as("hof"))
    assert(both.filter($"nat" =!= $"hof").isEmpty, "jaccard drift vs HOF")
    val edge = Seq(
      (Seq("a", "a", "b"), Seq("b", "b", "c")),
      (Seq.empty[String], Seq("x")),
      (Seq.empty[String], Seq.empty[String]),
      (Seq("p", "q"), Seq("r", "s")),
      (Seq("m", "n"), Seq("n", "m"))).toDF("g1", "g2")
    val e = edge.select(Dedup.jaccard($"g1", $"g2").as("nat"),
      Dedup.jaccardHOF($"g1", $"g2").as("hof"))
    assert(e.filter($"nat" =!= $"hof").isEmpty)
  }

  test("native simhash is value-identical to the HOF formulation") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select($"doc_id", $"text").limit(50)
    val both = docs.select(Dedup.simHash64($"text").as("nat"),
      Dedup.simHash64HOF($"text").as("hof"))
    assert(both.filter($"nat" =!= $"hof").isEmpty, "simhash drift vs HOF")
  }

  test("exact dedup keeps min id") {
    val df = Seq((5L, "x"), (3L, "x"), (9L, "y")).toDF("id", "t")
    val out = Dedup.exact(df, Seq("t"), "id").orderBy("keep").collect()
    assert(out.map(r => (r.getLong(1), r.getLong(2))).toSeq == Seq((3L, 2L), (9L, 1L)))
  }
}

class TextAnalysisSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  test("token metrics on a known sentence") {
    val df = Seq((1L, "the cat sat on a mat")).toDF("id", "text")
    val r = df.select(
      TextAnalysis.tokenCount($"text"),
      TextAnalysis.avgWordLen($"text"),
      TextAnalysis.stopwordRatio($"text")).collect().head
    assert(r.getInt(0) == 6)
    assert(math.abs(r.getDouble(1) - 15.0 / 6) < 1e-9)
    assert(math.abs(r.getDouble(2) - 3.0 / 6) < 1e-9) // the, on, a
  }

  test("langId picks marker language, und when none") {
    val df = Seq(
      (1L, "der hund und das haus"),
      (2L, "the house and the dog"),
      (3L, "zzz qqq www")).toDF("id", "text")
    val out = df.select($"id", TextAnalysis.langId($"text")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out(1L) == "de")
    assert(out(2L) == "en")
    assert(out(3L) == "und")
  }

  test("fingerprint is order-sensitive") {
    val df = Seq((1L, "aa bbb c"), (2L, "c bbb aa")).toDF("id", "text")
    val fps = df.select(TextAnalysis.fingerprint($"text")).collect().map(_.getLong(0))
    assert(fps(0) != fps(1))
  }
}

class MultimodalSpec extends AnyFunSuite {
  import TestSpark._

  test("feature extraction is deterministic with fixed dim") {
    val media = Multimodal.documentsAsMedia(spark, sf).limit(10)
    val f1 = Multimodal.extractFeatures(media, 16).collect().sortBy(_.id)
    val f2 = Multimodal.extractFeatures(media, 16).collect().sortBy(_.id)
    assert(f1.length == 10)
    assert(f1.forall(_.features.length == 16))
    assert(f1.map(_.features.toSeq).toSeq == f2.map(_.features.toSeq).toSeq)
  }

  test("frame sampling slices payload") {
    val media = Multimodal.documentsAsMedia(spark, sf).limit(3).toDF()
    val frames = Multimodal.sampleFrames(media, "id", "bytes", frameSize = 16, everyN = 2)
      .collect()
    assert(frames.nonEmpty)
    assert(frames.forall(_.getInt(1) % 2 == 0))
  }

  test("frame sampling emits zero frames for sub-frame and null payloads") {
    import spark.implicits._
    // 10-byte payload at frameSize=16 holds ZERO complete frames — the
    // old form emitted a spurious truncated frameIdx=0 row; null likewise
    val media = Seq((1L, Array.fill[Byte](10)(7)), (2L, null),
      (3L, Array.fill[Byte](33)(1))).toDF("id", "bytes")
    val frames = Multimodal.sampleFrames(media, "id", "bytes",
      frameSize = 16, everyN = 1).collect()
    assert(frames.map(_.getLong(0)).toSet == Set(3L),
      "only the 2-complete-frame payload may emit rows")
    assert(frames.length == 2 && frames.forall(_.getAs[Array[Byte]](2).length == 16))
    intercept[IllegalArgumentException](
      Multimodal.sampleFrames(media, "id", "bytes", frameSize = 16, everyN = 0))
  }

  test("extractFeatures routes by declared modality, not magic bytes") {
    import spark.implicits._
    // a TEXT payload that happens to start with the GIF magic must go to
    // the stand-in features, never into ImageIO's GIF header parser
    val trap = ("GIF89a" + "ÿÿÿÿ lots of text").getBytes
    val media = Seq(Multimodal.Media(1L, "text", trap, 0, 0)).toDS()
    val f = Multimodal.extractFeatures(media, 4).collect().head
    assert(f.features.length == 4) // stand-in path, no decode attempt
  }

  test("real PNG decodes through ImageIO to exact pixels") {
    // hand-built 2×2 PNG: pure red/green/blue/white — known BT.601 lumas
    val img = new java.awt.image.BufferedImage(2, 2,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    img.setRGB(0, 0, 0xFF0000); img.setRGB(1, 0, 0x00FF00)
    img.setRGB(0, 1, 0x0000FF); img.setRGB(1, 1, 0xFFFFFF)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    val Some((w, h, lum)) = Multimodal.decodeImage(bos.toByteArray)
    assert(w == 2 && h == 2)
    val exp = Seq(0.299f, 0.587f, 0.114f, 1.0f).map(_ * 255f)
    assert(lum.toSeq.zip(exp).forall { case (a, b) => math.abs(a - b) < 0.01f })
    // a non-image payload is rejected, not crashed
    assert(Multimodal.decodeImage("not a png".getBytes).isEmpty)
    // a corrupt payload WITH the PNG magic is rejected via the codec error
    assert(Multimodal.decodeImage(
      Array[Byte](0x89.toByte, 'P', 'N', 'G', 1, 2, 3, 4)).isEmpty)
  }

  test("extractFeatures routes image payloads through the real decoder") {
    import spark.implicits._
    val img = new java.awt.image.BufferedImage(4, 4,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    (0 until 4).foreach(y => (0 until 4).foreach(x =>
      img.setRGB(x, y, 0x646464))) // constant gray 100
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    val media = Seq(
      Multimodal.Media(1L, "image", bos.toByteArray, 4, 4),
      Multimodal.Media(2L, "text", "plain text payload".getBytes, 0, 0)).toDS()
    val feats = Multimodal.extractFeatures(media, 6).collect().sortBy(_.id)
    // image row: [w, h, cell means...] — constant gray ⇒ every cell = 100
    assert(feats(0).features(0) == 4f && feats(0).features(1) == 4f)
    assert(feats(0).features.drop(2).forall(v => math.abs(v - 100f) < 0.01f))
    // text row keeps the deterministic stand-in (its values live in [0,1),
    // where the image path would put width/height/lumas)
    assert(feats(1).features.length == 6)
    assert(feats(1).features.forall(v => v >= 0f && v < 1f))
  }

  test("real WAV decodes through AudioSystem to exact samples") {
    // hand-built 4-frame 16-bit mono WAV via the real encoder: known samples
    val vals = Seq[Short](1000, -1000, 16384, 0)
    val pcm = new Array[Byte](vals.size * 2)
    vals.zipWithIndex.foreach { case (v, i) =>
      pcm(2 * i) = (v & 0xFF).toByte; pcm(2 * i + 1) = ((v >> 8) & 0xFF).toByte
    }
    val fmt = new javax.sound.sampled.AudioFormat(
      javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED,
      8000f, 16, 1, 2, 8000f, false)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(
      new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(pcm), fmt, vals.size.toLong),
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    val Some((rate, channels, frames, samples)) =
      Multimodal.decodeAudio(bos.toByteArray)
    assert(rate == 8000f && channels == 1 && frames == 4L)
    assert(samples.toSeq == vals.map(_ / 32768.0f))
    // a non-audio payload is rejected, not crashed
    assert(Multimodal.decodeAudio("not audio at all".getBytes).isEmpty)
    // a corrupt payload WITH the RIFF magic is rejected via the codec error
    assert(Multimodal.decodeAudio(
      "RIFF0000WAVEgarbage".getBytes.take(16)).isEmpty)
  }

  test("extractFeatures routes audio payloads through the real decoder") {
    import spark.implicits._
    // constant amplitude 8192 ⇒ every RMS window is exactly 0.25
    val pcm = new Array[Byte](64 * 2)
    (0 until 64).foreach { i =>
      pcm(2 * i) = 0x00.toByte; pcm(2 * i + 1) = 0x20.toByte
    }
    val fmt = new javax.sound.sampled.AudioFormat(
      javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED,
      8000f, 16, 1, 2, 8000f, false)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(
      new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(pcm), fmt, 64L),
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    val media = Seq(Multimodal.Media(1L, "audio", bos.toByteArray, 0, 0)).toDS()
    val feats = Multimodal.extractFeatures(media, 6).collect().head
    assert(feats.features(0) == 8000f, "feature 0 is the sample rate")
    assert(math.abs(feats.features(1) - 64f / 8000f) < 1e-6f, "feature 1 is duration")
    assert(feats.features.drop(2).forall(v => math.abs(v - 0.25f) < 1e-6f))
  }

  test("decodeAudioMeta round-trips the synthetic WAV corpus") {
    val wavs = Multimodal.documentsAsAudio(spark, sf, cap = 10L)
    val meta = Multimodal.decodeAudioMeta(wavs, "id", "bytes").collect()
      .map(r => r.getLong(0) -> ((r.getInt(1), r.getInt(2), r.getLong(3),
        r.getDouble(5)))).toMap
    assert(meta.nonEmpty)
    meta.foreach { case (id, (rate, ch, frames, rms)) =>
      assert(rate == 8000 && ch == 1 && frames == 100 + id % 50)
      assert(math.abs(rms - (20 + id % 200) * 100 / 32768.0) < 1e-9)
    }
  }

  test("decodeImageMeta round-trips the synthetic PNG corpus") {
    val imgs = Multimodal.documentsAsImages(spark, sf, cap = 10L)
    val meta = Multimodal.decodeImageMeta(imgs, "id", "bytes").collect()
      .map(r => r.getLong(0) -> ((r.getInt(1), r.getInt(2), r.getLong(3),
        math.round(r.getDouble(4))))).toMap
    assert(meta.nonEmpty)
    meta.foreach { case (id, (w, h, np, gray)) =>
      assert(w == 2 + id % 5 && h == 3 + id % 4)
      assert(np == w.toLong * h && gray == 20 + id % 200)
    }
  }
}

class IvfSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  lazy val emb = spark.read.parquet(s"$sf/embeddings.parquet")

  test("ivf recall vs brute force is reasonable") {
    val brute = Knn.bruteForceTopK(emb.filter($"vec_id" < 10), "vec_id", "embedding",
      emb, "vec_id", "embedding", k = 5).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val model = graft.vector.Ivf.fit(emb, "vec_id", "embedding", nlist = 8, iters = 2)
    val approx = graft.vector.Ivf.topK(model,
      emb.filter($"vec_id" < 10), "vec_id", "embedding",
      emb, "vec_id", "embedding", k = 5, nprobe = 4).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (brute & approx).size.toDouble / brute.size
    assert(recall >= 0.4, s"recall $recall too low")
  }

  test("ivf recall@10 on a clustered corpus exceeds 0.9") {
    val q = emb.filter($"vec_id" < 20)
    val jittered = (1 to 12).map { j =>
      q.select((col("vec_id") * 1000 + j).as("vec_id"),
        transform(col("embedding"),
          x => x + lit((j * 7 % 5 - 2) * 0.01f)).as("embedding"))
    }.reduce(_ unionByName _)
    val corpus = emb.select("vec_id", "embedding").unionByName(jittered)
    val brute = Knn.bruteForceTopK(q, "vec_id", "embedding",
      corpus, "vec_id", "embedding", k = 10).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val model = graft.vector.Ivf.fit(corpus, "vec_id", "embedding", nlist = 8, iters = 2)
    val approx = graft.vector.Ivf.topK(model, q, "vec_id", "embedding",
      corpus, "vec_id", "embedding", k = 10, nprobe = 3).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (brute & approx).size.toDouble / brute.size
    info(f"ivf clustered recall@10 = $recall%.4f")
    assert(recall >= 0.9, s"recall $recall below 0.9")
  }

  test("ivf is deterministic") {
    val m1 = graft.vector.Ivf.fit(emb, "vec_id", "embedding", nlist = 4, iters = 2)
    val m2 = graft.vector.Ivf.fit(emb, "vec_id", "embedding", nlist = 4, iters = 2)
    assert(m1.centroids == m2.centroids)
  }
}

class QuantizationSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._
  import graft.vector.Quantization

  lazy val emb = spark.read.parquet(s"$sf/embeddings.parquet")

  test("scalar quantize/dequantize round trip bounds the error") {
    val model = Quantization.fitScalar(emb, "embedding", bits = 8)
    val df = emb.select($"embedding".as("a"),
        model.dequantize(model.quantize($"embedding")).as("b"))
      .selectExpr("aggregate(zip_with(a, b, (x, y) -> abs(CAST(x AS DOUBLE) - y)), CAST(0 AS DOUBLE), (acc, v) -> greatest(acc, v)) AS maxerr")
    val maxErr = df.agg(org.apache.spark.sql.functions.max($"maxerr"))
      .collect().head.getDouble(0)
    // codes are 8-bit: error ≤ half a quantization step of the widest dim
    val model2 = model
    val widest = model2.maxs.zip(model2.mins).map { case (mx, mn) => mx - mn }.max
    assert(maxErr <= widest / 255.0 / 2 + 1e-9, s"max error $maxErr")
  }

  test("binary codes pack sign bits into two words") {
    val codes = Quantization.binaryCodes(emb.filter($"vec_id" === 0), "vec_id", "embedding")
      .orderBy("word").collect()
    assert(codes.length == 2) // dim 64 → 2 × 32-bit words
    val vec = emb.filter($"vec_id" === 0).select("embedding")
      .collect().head.getSeq[Float](0)
    val expected = codes.map(_.getLong(2))
    val recomputed = (0 until 2).map { w =>
      (0 until 32).map(b => if (vec(w * 32 + b) >= 0) 1L << b else 0L).sum
    }
    assert(expected.toSeq == recomputed)
    // hamming of a code with itself is 0, with complement is 32
    val h = emb.sparkSession.range(1)
      .select(Quantization.hamming(
        org.apache.spark.sql.functions.lit(expected(0)),
        org.apache.spark.sql.functions.lit(expected(0))))
      .collect().head.getInt(0)
    assert(h == 0)
  }

  test("product quantizer: identical vectors share codes, reconstruction beats zero") {
    val model = Quantization.fitProduct(emb, "vec_id", "embedding", m = 8, k = 4, iters = 1)
    val codes = emb.filter($"vec_id" < 3)
      .select($"vec_id", model.encode($"embedding").as("code")).collect()
    assert(codes.forall(_.getSeq[Int](1).size == 8))
    // determinism: same fit twice → same codes
    val model2 = Quantization.fitProduct(emb, "vec_id", "embedding", m = 8, k = 4, iters = 1)
    val codes2 = emb.filter($"vec_id" < 3)
      .select($"vec_id", model2.encode($"embedding").as("code")).collect()
    assert(codes.map(_.getSeq[Int](1)).toSeq == codes2.map(_.getSeq[Int](1)).toSeq)
    // reconstruction error < ||x|| (i.e. beats the zero-vector baseline)
    val errVsNorm = emb.select(
        model.decode(model.encode($"embedding")).as("rec"), $"embedding")
      .selectExpr(
        "sqrt(aggregate(zip_with(rec, embedding, (r, x) -> (r - CAST(x AS DOUBLE)) * (r - CAST(x AS DOUBLE))), CAST(0 AS DOUBLE), (a, v) -> a + v)) AS err",
        "sqrt(aggregate(embedding, CAST(0 AS DOUBLE), (a, x) -> a + CAST(x AS DOUBLE) * CAST(x AS DOUBLE))) AS nrm")
      .agg(org.apache.spark.sql.functions.avg($"err").as("e"),
        org.apache.spark.sql.functions.avg($"nrm").as("n"))
      .collect().head
    assert(errVsNorm.getDouble(0) < errVsNorm.getDouble(1))
  }
}

class ExtensionsSpec extends org.scalatest.funsuite.AnyFunSuite {
  import TestSpark._

  test("SQL functions registered via GraftExtensions match the DataFrame API") {
    graft.GraftExtensions.register(spark)
    val r = spark.sql(
      "SELECT vec_dot(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS d, " +
        "simhash64(split('a b c', ' ')) AS sh, " +
        "minhash_sig(word_shingles('a b c d e', 2), 16) AS sig").collect().head
    assert(r.getDouble(0) == 11.0)
    import spark.implicits._
    val exp = Seq("a b c d e").toDF("text")
      .select(graft.pipeline.Dedup.minHashSignature(
        org.apache.spark.sql.functions.col("text"), 2, 16).as("sig"))
      .collect().head.getSeq[Long](0)
    assert(r.getSeq[Long](2) == exp)
    val sh2 = Seq("a b c").toDF("text")
      .select(graft.pipeline.Dedup.simHash64(
        org.apache.spark.sql.functions.col("text")))
      .collect().head.getLong(0)
    assert(r.getLong(1) == sh2)
    // r12 kernels: gram counters/hashes + set-jaccard
    val g = spark.sql(
      "SELECT gram_stats('a b a b', 2) AS st, " +
        "size(gram_hashes('a b a b', 2)) AS nh, " +
        "set_jaccard(array('a', 'b'), array('b', 'c')) AS j").collect().head
    val st = g.getStruct(0)
    assert((st.getInt(0), st.getInt(1), st.getInt(2)) == ((3, 2, 2)))
    assert(g.getInt(1) == 3)
    assert(g.getDouble(2) == 1.0 / 3.0)
  }
}

/** Partitioned HNSW (reference index/vector/hnsw.rs; SURVEY §2.7
  * block-partitioned plan): per-partition graphs, broadcast queries,
  * global top-k merge.
  */
class HnswSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  lazy val emb = spark.read.parquet(s"$sf/embeddings.parquet")

  test("finds planted exact copies at rank 1") {
    val aug = emb.select($"vec_id", $"embedding").unionAll(
      emb.filter($"vec_id" < 5)
        .select(($"vec_id" + 100000).as("vec_id"), $"embedding"))
    val top = graft.vector.Hnsw.topK(
      aug.filter($"vec_id" < 5), "vec_id", "embedding",
      aug, "vec_id", "embedding", k = 1).collect()
    assert(top.length == 5)
    top.foreach { r =>
      assert(r.getLong(1) == r.getLong(0) + 100000)
      assert(r.getDouble(2) == 1.0)
    }
  }

  test("recall@10 vs brute force exceeds 0.9") {
    val q = emb.filter($"vec_id" < 20)
    val brute = Knn.bruteForceTopK(q, "vec_id", "embedding",
      emb, "vec_id", "embedding", k = 10).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val approx = graft.vector.Hnsw.topK(q, "vec_id", "embedding",
      emb, "vec_id", "embedding", k = 10, efSearch = 64).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (brute & approx).size.toDouble / brute.size
    info(f"hnsw recall@10 = $recall%.4f")
    assert(recall >= 0.9, s"recall $recall below 0.9")
  }

  test("euclidean metric agrees with brute force") {
    val q = emb.filter($"vec_id" < 10)
    val brute = Knn.bruteForceTopK(q, "vec_id", "embedding",
      emb, "vec_id", "embedding", k = 5, metric = Knn.Euclidean).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val approx = graft.vector.Hnsw.topK(q, "vec_id", "embedding",
      emb, "vec_id", "embedding", k = 5, metric = Knn.Euclidean).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (brute & approx).size.toDouble / brute.size
    info(f"hnsw euclidean recall@5 = $recall%.4f")
    assert(recall >= 0.9)
  }

  test("results are identical across partitionings") {
    val q = emb.filter($"vec_id" < 5)
    def run(parts: Int) = graft.vector.Hnsw.topK(q, "vec_id", "embedding",
      emb.repartition(parts), "vec_id", "embedding", k = 5).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSet
    assert(run(2) == run(7))
  }

  test("query side processes in bounded chunks, identically") {
    // the query collect is chunked per query partition (driver-memory bound
    // at scale) — results must not depend on the query partitioning
    val q = emb.filter($"vec_id" < 12)
    def run(qdf: org.apache.spark.sql.DataFrame) =
      graft.vector.Hnsw.topK(qdf, "vec_id", "embedding",
        emb, "vec_id", "embedding", k = 3).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSet
    assert(run(q.repartition(5)) == run(q.coalesce(1)))
    val idx = graft.vector.Hnsw.buildCached("chunkspec", emb, "vec_id", "embedding")
    def runIdx(qdf: org.apache.spark.sql.DataFrame) =
      graft.vector.Hnsw.searchIndex(idx, qdf, "vec_id", "embedding", k = 3)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSet
    assert(runIdx(q.repartition(5)) == runIdx(q.coalesce(1)))
    assert(runIdx(q.coalesce(1)).nonEmpty)
  }

  test("a saved index loads back with identical search results") {
    val dir = java.nio.file.Files.createTempDirectory("hnsw_persist").toString
    val corpus = emb.repartition(3)
    val built = graft.vector.Hnsw.build(corpus, "vec_id", "embedding")
    graft.vector.Hnsw.save(built, dir)
    val loaded = graft.vector.Hnsw.load(spark, dir)
    val q = emb.filter($"vec_id" < 8)
    def res(ix: org.apache.spark.rdd.RDD[graft.vector.Hnsw.Index]) =
      graft.vector.Hnsw.searchIndex(ix, q, "vec_id", "embedding", k = 5)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSet
    // the whole graph round-trips — results are identical, not merely
    // similar (same adjacency, same entry points, same tie-breaks)
    assert(res(loaded) == res(built))
    assert(res(loaded).nonEmpty)
    built.unpersist(blocking = false)
    loaded.unpersist(blocking = false)
  }
}

class RankingSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._
  import graft.pipeline.Ranking

  private val docs = Seq(
    (1L, "spark spark spark data"),
    (2L, "data model data model"),
    (3L, "data tuning guide"),
    (4L, "data data data data")).toDF("doc_id", "text")

  test("tfidf: a corpus-rare term outscores a corpus-wide term in its doc") {
    val scored = Ranking.tfidf(docs, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getString(1)) -> r.getDouble(3)).toMap
    // doc 1: 'spark' (df=1, tf=3) must beat 'data' (df=4, tf=1)
    assert(scored((1L, "spark")) > scored((1L, "data")))
    // same tf, different df: 'tuning' (df=1) beats 'data' (df=4) in doc 3
    assert(scored((3L, "tuning")) > scored((3L, "data")))
    // idf is smoothed strictly positive: even the everywhere-term scores > 0
    assert(scored((4L, "data")) > 0.0)
  }

  test("bm25: more matching terms rank higher; tf saturates") {
    val corpus = Seq(
      (1L, "spark query engine"),
      (2L, "spark spark spark spark spark spark spark spark"),
      (3L, "unrelated words entirely"),
      (4L, "spark query")).toDF("doc_id", "text")
    val s = Ranking.bm25(corpus, "doc_id", "text", Seq("spark", "query"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // both terms beat eight repeats of one term (k1 saturation)
    assert(s(1L) > s(2L) && s(4L) > s(2L))
    // no-match docs are absent, not zero-scored
    assert(!s.contains(3L))
  }
}

class SamplingSpec extends AnyFunSuite {
  import TestSpark._
  import graft.pipeline.Sampling

  private lazy val docs = spark.read.parquet(s"$sf/documents.parquet")

  test("split is disjoint, exhaustive, and repartition-invariant") {
    val (train, test) = Sampling.trainTestSplit(docs, "doc_id", 100)
    assert(train.count() + test.count() == docs.count())
    assert(train.join(test, "doc_id").count() == 0)
    // determinism: membership is a pure function of the key, so any
    // repartitioning yields the SAME test set (df.sample would not)
    val (_, test2) = Sampling.trainTestSplit(docs.repartition(7), "doc_id", 100)
    val ids = (d: org.apache.spark.sql.DataFrame) =>
      d.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(ids(test) == ids(test2) && ids(test).nonEmpty)
  }

  test("stratifiedExact keeps exactly ceil(n*p) rows per stratum") {
    val per = Sampling.stratifiedExact(docs, "lang", "doc_id", 200)
      .groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val full = docs.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(per.keySet == full.keySet)
    full.foreach { case (lang, n) =>
      assert(per(lang) == math.ceil(n * 200 / 1000.0).toLong,
        s"stratum $lang: got ${per(lang)} of $n")
    }
  }

  test("sampleByKey fraction lands near the target permille") {
    val kept = Sampling.sampleByKey(docs, "doc_id", 200).count().toDouble
    val frac = kept / docs.count()
    assert(frac > 0.12 && frac < 0.28, s"kept fraction $frac far from 0.2")
  }
}
