package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus-statistics text ranking for training-data pipelines: TF-IDF
  * weighting and BM25 retrieval over the `documents` table (reference
  * text-analysis surface; Robertson & Spärck Jones BM25 with the standard
  * k1/b parametrization).
  *
  * Scale shape: tokenize → explode shuffles O(total tokens) into the
  * per-(doc, term) frequency aggregate — the unavoidable cost, and it is
  * map-side-combined. The document-frequency table that feeds IDF is
  * O(distinct terms), orders of magnitude smaller than the corpus, so it
  * broadcasts; nothing here materializes a doc × term matrix.
  *
  * Tokenization is intentionally the trivial single-space split, matching
  * what a SQL oracle can replicate exactly (`string_split(text, ' ')`) —
  * swap [[termsOf]] for a real analyzer in production.
  */
object Ranking {

  /** Lower-cased single-space tokens; empty strings filtered (consecutive
    * spaces split into empties in both Spark and DuckDB).
    */
  def termsOf(text: Column): Column =
    filter(split(lower(text), " "), t => t =!= "")

  /** Per-(doc, term) frequencies: one row per distinct term occurrence
    * count — the long skinny layout every downstream weighting joins on.
    */
  def termFreqs(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol).as("doc_id"),
        explode(termsOf(col(textCol))).as("term"))
      .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))

  /** Smoothed-IDF TF-IDF scores: (doc_id, term, tf, score) with
    * idf = ln((N + 1) / (df + 1)) + 1 — strictly positive, so corpus-wide
    * terms still contribute ordering signal.
    */
  def tfidf(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val tf = termFreqs(docs, idCol, textCol)
    val n = docs.count()
    // df from the tf pairs: (doc, term) is already distinct
    val dfTab = tf.groupBy("term").agg(count(lit(1)).as("df"))
      .withColumn("idf", log((lit(n) + 1.0) / (col("df") + 1.0)) + 1.0)
    tf.join(broadcast(dfTab), "term")
      .select(col("doc_id"), col("term"), col("tf"),
        (col("tf") * col("idf")).as("score"))
  }

  /** BM25 document scores for a bag-of-terms query: standard
    * idf = ln(1 + (N - df + 0.5) / (df + 0.5)), saturation k1, length
    * normalization b against the corpus mean document length. Returns one
    * row per document matching at least one query term, with the summed
    * score. The query-term df/idf table is tiny and broadcasts.
    */
  def bm25(docs: DataFrame, idCol: String, textCol: String,
      queryTerms: Seq[String], k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    val tf = termFreqs(docs, idCol, textCol)
    val dl = docs.select(col(idCol).as("doc_id"),
      size(termsOf(col(textCol))).cast("double").as("dl"))
    val n = docs.count()
    // empty corpus → avg is SQL NULL (getDouble would NPE); all-empty docs
    // → avg 0.0 (the length norm would divide by zero and null every
    // score). 1.0 is inert in both: the result is empty / tf-driven anyway.
    val avgRow = dl.agg(avg("dl")).head()
    val avgdl =
      if (avgRow.isNullAt(0) || avgRow.getDouble(0) == 0.0) 1.0
      else avgRow.getDouble(0)
    val dfTab = tf.filter(col("term").isin(queryTerms: _*))
      .groupBy("term").agg(count(lit(1)).as("df"))
      .withColumn("idf", log(lit(1.0) +
        (lit(n.toDouble) - col("df") + 0.5) / (col("df") + 0.5)))
    tf.join(broadcast(dfTab), "term")
      .join(dl, "doc_id")
      .withColumn("part", col("idf") * (col("tf") * (k1 + 1)) /
        (col("tf") + lit(k1) * (lit(1 - b) + lit(b) * col("dl") / avgdl)))
      .groupBy("doc_id").agg(sum("part").as("score"))
  }
}
