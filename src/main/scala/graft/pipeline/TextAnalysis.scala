package graft.pipeline

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-scale training-data pipelines: token
  * counting, quality scoring, language ID, document fingerprinting. All pure
  * column expressions (codegen'd, no UDFs) with formulas simple enough to
  * mirror exactly in the DuckDB oracle.
  */
object TextAnalysis {

  def tokens(text: Column): Column = split(text, " ")

  def tokenCount(text: Column): Column = size(tokens(text))

  /** Mean word length in characters (0 for empty docs). */
  def avgWordLen(text: Column): Column = {
    val ws = tokens(text)
    aggregate(ws, lit(0L), (acc, w) => acc + length(w)).cast("double") /
      greatest(size(ws), lit(1)).cast("double")
  }

  val StopwordsEn: Seq[String] =
    Seq("the", "a", "of", "and", "to", "in", "is", "it", "for", "on")

  /** Fraction of tokens that are (English) stopwords. */
  def stopwordRatio(text: Column): Column = {
    val ws = tokens(text)
    aggregate(ws, lit(0L),
      (acc, w) => acc + when(w.isin(StopwordsEn: _*), 1L).otherwise(0L))
      .cast("double") / greatest(size(ws), lit(1)).cast("double")
  }

  /** Fraction of characters that are punctuation. */
  def punctRatio(text: Column): Column =
    (length(text) - length(regexp_replace(text, "[.,!?;:]", ""))).cast("double") /
      greatest(length(text), lit(1)).cast("double")

  /** Composite quality score in [0,1]: length prior + stopword prior + word
    * shape. Deterministic closed form (no model) so it is oracle-checkable;
    * a production pipeline would swap in a learned scorer behind the same
    * column contract.
    */
  def qualityScore(text: Column): Column =
    round(
      least(tokenCount(text).cast("double") / 50.0, lit(1.0)) * 0.5 +
        stopwordRatio(text) * 0.3 +
        least(avgWordLen(text) / 10.0, lit(1.0)) * 0.2,
      6)

  /** Language-marker lexicons — intentionally tiny and disjoint; the n-gram
    * profile approach of real language ID reduces to marker counting on the
    * whitespace-tokenized synthetic corpus.
    */
  val Markers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "for", "with"),
    "de" -> Seq("der", "und", "das", "ein"),
    "es" -> Seq("el", "los", "que", "una"),
    "fr" -> Seq("le", "les", "des", "une"))

  private def markerCount(text: Column, words: Seq[String]): Column =
    aggregate(tokens(text), lit(0L),
      (acc, w) => acc + when(w.isin(words: _*), 1L).otherwise(0L))

  /** Heuristic language ID: highest marker count wins, priority order
    * en > de > es > fr on ties, 'und' when no marker hits.
    */
  def langId(text: Column): Column = {
    val counts = Markers.map { case (lang, ws) => lang -> markerCount(text, ws) }
    val best = counts.map(_._2).reduce((a, b) => greatest(a, b))
    counts.foldRight(lit("und")) { case ((lang, c), elseCol) =>
      when(c === best && c > 0, lang).otherwise(elseCol)
    }
  }

  /** Order-sensitive document fingerprint (rolling-hash style): position-
    * weighted word lengths folded mod 2^31-1. Same closed form is written in
    * the oracle SQL via list_transform(range(…)).
    */
  def fingerprint(text: Column): Column = {
    val ws = tokens(text)
    aggregate(
      transform(sequence(lit(0), size(ws) - 1),
        i => (i.cast("long") + 1L) * length(element_at(ws, i + 1)).cast("long") *
          (lit(1L) + (i.cast("long") * 7L) % 13L)),
      lit(0L), _ + _) % 2147483647L
  }
}
