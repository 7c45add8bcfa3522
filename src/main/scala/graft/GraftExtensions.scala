package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import graft.functions.{GramHashes, GramStats, MinHashSig, SetJaccard, SimHash64Expr, VecDot, VecL1, VecL2Sq, WordShingles}

/** SparkSessionExtensions hook: registers graft's native codegen expressions
  * as SQL functions, so plain `spark.sql` users (and external SQL tools)
  * reach the same kernels the DataFrame API uses — the Spark-idiomatic
  * integration point for engine extensions (SURVEY §4; reference exposes its
  * kernels through the GQL function registry).
  *
  * Enable with:
  *   SparkSession.builder().withExtensions(new GraftExtensions) …
  * or `--conf spark.sql.extensions=graft.GraftExtensions`.
  *
  *   SELECT minhash_sig(word_shingles(text, 3), 16, 42) FROM docs
  *   SELECT vec_dot(a, b), simhash64(split(text, ' ')) FROM …
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  import GraftExtensions._

  override def apply(ext: SparkSessionExtensions): Unit =
    functions.foreach(ext.injectFunction)
}

object GraftExtensions {

  /** Register on an already-running session (extensions only apply at
    * session construction).
    */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    functions.foreach { case (id, inf, builder) =>
      spark.sessionState.functionRegistry.registerFunction(id, inf, builder)
    }

  private def intLit(e: Expression, what: String): Int = e match {
    case Literal(v: Int, _) => v
    case Literal(v: Long, _) => v.toInt
    case other => throw new IllegalArgumentException(
      s"$what must be an integer literal, got $other")
  }
  private def longLit(e: Expression, what: String): Long = e match {
    case Literal(v: Int, _) => v.toLong
    case Literal(v: Long, _) => v
    case other => throw new IllegalArgumentException(
      s"$what must be an integer literal, got $other")
  }

  private def info(name: String, usage: String) =
    new ExpressionInfo(classOf[GraftExtensions].getName, null, name, usage, "")

  private type FnEntry =
    (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)

  private val functions: Seq[FnEntry] = Seq(
    (FunctionIdentifier("word_shingles"),
      info("word_shingles", "word_shingles(text, n) - distinct word n-grams"),
      (args: Seq[Expression]) => WordShingles(args(0), intLit(args(1), "n"))),
    (FunctionIdentifier("minhash_sig"),
      info("minhash_sig", "minhash_sig(shingles, numHashes[, seed]) - MinHash signature"),
      (args: Seq[Expression]) => MinHashSig(args(0), intLit(args(1), "numHashes"),
        if (args.size > 2) longLit(args(2), "seed") else 42L)),
    (FunctionIdentifier("simhash64"),
      info("simhash64", "simhash64(words) - 64-bit SimHash fingerprint"),
      (args: Seq[Expression]) => SimHash64Expr(args(0))),
    (FunctionIdentifier("vec_dot"),
      info("vec_dot", "vec_dot(a, b) - dense vector dot product"),
      (args: Seq[Expression]) => VecDot(args(0), args(1))),
    (FunctionIdentifier("vec_l2sq"),
      info("vec_l2sq", "vec_l2sq(a, b) - squared euclidean distance"),
      (args: Seq[Expression]) => VecL2Sq(args(0), args(1))),
    (FunctionIdentifier("vec_l1"),
      info("vec_l1", "vec_l1(a, b) - manhattan distance"),
      (args: Seq[Expression]) => VecL1(args(0), args(1))),
    (FunctionIdentifier("gram_stats"),
      info("gram_stats", "gram_stats(text, n) - struct(total, ndistinct, top) word n-gram counters"),
      (args: Seq[Expression]) => GramStats(args(0), intLit(args(1), "n"))),
    (FunctionIdentifier("gram_hashes"),
      info("gram_hashes", "gram_hashes(text, n) - xxhash64 of every word n-gram, occurrence order"),
      (args: Seq[Expression]) => GramHashes(args(0), intLit(args(1), "n"))),
    (FunctionIdentifier("set_jaccard"),
      info("set_jaccard", "set_jaccard(a, b) - Jaccard similarity of two string arrays as sets"),
      (args: Seq[Expression]) => SetJaccard(args(0), args(1))))
}
