package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.pipeline.Curation

/** Corpus-curation operators: PII redaction, Gopher-style quality rules,
  * n-gram benchmark decontamination.
  */
class CurationSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  test("redact replaces emails and phones, leaves the rest") {
    val df = Seq(
      (1L, "mail me at a.b+c@ex-ample.co.uk or call 555-123-4567 today"),
      (2L, "no pii here"),
      (3L, "two mails x@y.io z@w.ai")
    ).toDF("id", "t")
    val out = df.select(col("id"), Curation.redact(col("t")).as("r"),
      Curation.emailCount(col("t")).as("ne"), Curation.phoneCount(col("t")).as("np"))
      .orderBy("id").collect()
    assert(out(0).getString(1) == "mail me at <EMAIL> or call <PHONE> today")
    assert(out(0).getInt(2) == 1 && out(0).getInt(3) == 1)
    assert(out(1).getString(1) == "no pii here")
    assert(out(2).getInt(2) == 2)
    // redacted text has zero residual matches
    val residual = df.select(
      (Curation.emailCount(Curation.redact(col("t"))) +
        Curation.phoneCount(Curation.redact(col("t")))).as("n"))
      .agg(sum("n")).head().getLong(0)
    assert(residual == 0L)
  }

  test("gopher rules gate on count, word shape, symbols and stopwords") {
    val df = Seq(
      (1L, "the cat sat on the mat with a hat and a bat"), // passes (wc min 5)
      (2L, "tiny doc"),                                    // fails word count
      (3L, "### $$$ !!! ??? *** ((( ))) ^^^ %%% @@@ the of to"), // fails symbol ratio
      (4L, "pneumonoultramicroscopic silicovolcanoconiosis " * 3 + "the of") // fails mean word len
    ).toDF("id", "t")
    val flags = df.select(col("id"), Curation.gopherKeep(col("t")).as("keep"))
      .orderBy("id").collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert(flags(1L))
    assert(!flags(2L) && !flags(3L) && !flags(4L))
  }

  test("ngrams handles short docs and exact window count") {
    val df = Seq((1L, "a b c d"), (2L, "a b")).toDF("id", "t")
    val g = df.select(col("id"), Curation.ngrams(col("t"), 3).as("g"))
      .orderBy("id").collect()
    assert(g(0).getSeq[String](1) == Seq("a b c", "b c d"))
    assert(g(1).getSeq[String](1).isEmpty)
  }

  test("contaminated finds shared n-grams only across the join") {
    val train = Seq((1L, "x y z q r"), (2L, "totally clean words here")).toDF("doc_id", "t")
    val bench = Seq((100L, "p p x y z p")).toDF("doc_id", "t")
    val df = Curation.contaminated(train, bench, "t", "doc_id", n = 3)
    val hits = df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(hits == Map(1L -> 1L)) // "x y z" shared; doc 2 untouched
    // scale shape: the benchmark gram set broadcasts — the train corpus is
    // filtered map-side, never shuffled on its grams
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin"), s"bench grams not broadcast:\n$p")
  }

  test("repeatedSpans counts only spans shared ACROSS documents") {
    val docs = Seq(
      (1L, "a b c d e f"),      // shares "a b c" with doc 2
      (2L, "x a b c y z"),
      (3L, "p q p q p q"),      // repeats its own span — NOT cross-doc
      (4L, "one two")           // shorter than n: zero windows
    ).toDF("doc_id", "text")
    val out = Curation.repeatedSpans(docs, "doc_id", "text", n = 3)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.toSeq == Seq((1L, 4L, 1L), (2L, 4L, 1L), (3L, 4L, 0L)),
      "only the cross-doc span counts; self-repeats and short docs don't")
  }

  test("dedupParagraphs keeps one deterministic winner per paragraph") {
    val docs = Seq(
      (2L, "Hello world. Unique two"),
      (1L, "Something else. hello world"),  // same para normalized, doc 1 pos 1
      (3L, "HELLO WORLD. Tail")
    ).toDF("doc_id", "text")
    val out = Curation.dedupParagraphs(docs, "doc_id", "text")
      .orderBy("doc_id", "pos").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(2)))
    // "hello world" appears in all three docs; the (1, 1) occurrence wins
    assert(out.count(_._3.toLowerCase.trim == "hello world") == 1)
    assert(out.contains((1L, 1, "hello world")))
    assert(out.map(_._3.toLowerCase.trim).distinct.length == out.length,
      "no duplicate normalized paragraphs may survive")
  }
}
