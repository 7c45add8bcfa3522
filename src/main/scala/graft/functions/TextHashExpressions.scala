package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, GenericInternalRow, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native single-pass MinHash / SimHash signatures (reference MinHash LSH,
  * crates/grafeo-engine/src/index/text/minhash.rs shape).
  *
  * The column-expression formulation (`transform` + `array_min` per hash
  * function) evaluates numHashes interpreted lambdas per row
  * (CodegenFallback) and re-traverses the shingle array numHashes times.
  * These expressions make ONE pass over the input array in generated code:
  * hash each element once with xxHash64 (identical to Spark's `xxhash64`,
  * seed 42), then fold every universal-hash permutation minimum (MinHash) or
  * every bit counter (SimHash) inside the same loop.
  */

/** MinHash signature over an array<string> of shingles: for each seeded
  * universal hash h_i(x) = (a_i·x + b_i) mod P over x = xxhash64(shingle)
  * mod P, the minimum across the array; P for empty arrays. Output
  * array<long> of length numHashes — value-identical to the HOF
  * formulation it replaces (asserted in DedupSpec).
  */
case class MinHashSig(child: Expression, numHashes: Int, seed: Long)
    extends UnaryExpression {

  private val P = 2147483647L // 2^31 - 1 (prime)

  // same parameter derivation as Dedup.hashParams — signatures must not drift
  @transient private lazy val params: (Array[Long], Array[Long]) = {
    val rnd = new scala.util.Random(seed)
    val ab = Array.fill(numHashes)(
      (1 + rnd.nextInt(Int.MaxValue - 1)).toLong -> rnd.nextInt(Int.MaxValue).toLong)
    (ab.map(_._1), ab.map(_._2))
  }

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"minhash_sig requires array<string>, got ${t.sql}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_sig"

  private def pmod(x: Long): Long = { val m = x % P; if (m < 0) m + P else m }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val (as, bs) = params
    val mins = Array.fill(numHashes)(P)
    var i = 0
    while (i < arr.numElements()) {
      val s = arr.getUTF8String(i)
      val h = pmod(XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, 42L))
      var j = 0
      while (j < numHashes) {
        val v = pmod(h * as(j) + bs(j))
        if (v < mins(j)) mins(j) = v
        j += 1
      }
      i += 1
    }
    new GenericArrayData(mins)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, arr => {
      val (asArr, bsArr) = params
      val as = ctx.addReferenceObj("minhashA", asArr, "long[]")
      val bs = ctx.addReferenceObj("minhashB", bsArr, "long[]")
      val mins = ctx.freshName("mins")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val s = ctx.freshName("s")
      val h = ctx.freshName("h")
      val v = ctx.freshName("v")
      s"""
         |long[] $mins = new long[$numHashes];
         |java.util.Arrays.fill($mins, ${P}L);
         |for (int $i = 0; $i < $arr.numElements(); $i++) {
         |  UTF8String $s = $arr.getUTF8String($i);
         |  long $h = org.apache.spark.sql.catalyst.expressions.XXH64.hashUnsafeBytes(
         |    $s.getBaseObject(), $s.getBaseOffset(), $s.numBytes(), 42L) % ${P}L;
         |  if ($h < 0) $h += ${P}L;
         |  for (int $j = 0; $j < $numHashes; $j++) {
         |    long $v = ($h * $as[$j] + $bs[$j]) % ${P}L;
         |    if ($v < 0) $v += ${P}L;
         |    if ($v < $mins[$j]) $mins[$j] = $v;
         |  }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($mins);
       """.stripMargin
    })

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** 64-bit SimHash over an array<string> of words: bit i of the output is set
  * iff Σ_words (±1 by bit i of xxhash64(word)) >= 0. One pass, one 64-slot
  * counter array — value-identical to the aggregate-lambda formulation.
  */
case class SimHash64Expr(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"simhash64 requires array<string>, got ${t.sql}")
  }

  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val counts = new Array[Long](64)
    var i = 0
    while (i < arr.numElements()) {
      val s = arr.getUTF8String(i)
      val h = XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, 42L)
      var b = 0
      while (b < 64) {
        counts(b) += (if (((h >>> b) & 1L) == 1L) 1L else -1L)
        b += 1
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) {
      if (counts(b) >= 0) out |= (1L << b)
      b += 1
    }
    out
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, arr => {
      val counts = ctx.freshName("counts")
      val i = ctx.freshName("i")
      val b = ctx.freshName("b")
      val s = ctx.freshName("s")
      val h = ctx.freshName("h")
      val out = ctx.freshName("out")
      s"""
         |long[] $counts = new long[64];
         |for (int $i = 0; $i < $arr.numElements(); $i++) {
         |  UTF8String $s = $arr.getUTF8String($i);
         |  long $h = org.apache.spark.sql.catalyst.expressions.XXH64.hashUnsafeBytes(
         |    $s.getBaseObject(), $s.getBaseOffset(), $s.numBytes(), 42L);
         |  for (int $b = 0; $b < 64; $b++) {
         |    $counts[$b] += ((($h >>> $b) & 1L) == 1L) ? 1L : -1L;
         |  }
         |}
         |long $out = 0L;
         |for (int $b = 0; $b < 64; $b++) {
         |  if ($counts[$b] >= 0) $out |= (1L << $b);
         |}
         |${ev.value} = $out;
       """.stripMargin
    })

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Distinct word n-gram shingles of a text, first-occurrence order — the
  * native replacement for the split/sequence/transform/array_distinct HOF
  * chain (interpreted CodegenFallback; it dominated the MinHash pipelines
  * at ~0.5 ms/row). Split semantics match Spark's `split(text, " ")`:
  * single-space separators, empty tokens kept.
  */
case class WordShingles(child: Expression, n: Int) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"word_shingles requires string, got ${t.sql}")
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "word_shingles"

  override def nullSafeEval(input: Any): Any =
    TextHashExpressions.shinglesEval(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.TextHashExpressions.shinglesEval($c, $n);")

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Single-pass word n-gram repetition counters of a text:
  * struct(total, ndistinct, top) where `total` = number of n-grams
  * (len − n + 1, 0 when shorter), `ndistinct` = distinct n-grams, `top` =
  * occurrence count of the most frequent n-gram. Exact integers — the same
  * values the split/transform/array_distinct/filter HOF chain produces
  * (RepetitionSpec pins equality), at O(grams) per row instead of
  * O(grams²) interpreted lambdas. Split semantics match `split(text, " ")`
  * (single-space separators, empty tokens kept), like [[WordShingles]].
  */
case class GramStats(child: Expression, n: Int) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"gram_stats requires string, got ${t.sql}")
  }

  override def dataType: DataType = StructType(Seq(
    StructField("total", IntegerType, nullable = false),
    StructField("ndistinct", IntegerType, nullable = false),
    StructField("top", IntegerType, nullable = false)))
  override def prettyName: String = "gram_stats"

  override def nullSafeEval(input: Any): Any =
    TextHashExpressions.gramStatsEval(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.TextHashExpressions.gramStatsEval($c, $n);")

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** xxHash64 (seed 42 — Spark's `xxhash64` convention) of every word n-gram
  * of a text, in occurrence order with duplicates kept: the native
  * replacement for `transform(ngrams(text, n), s => xxhash64(s))`, which
  * materializes every gram string through two interpreted lambda layers.
  * One split pass, one StringBuilder reused across grams; bit-identical to
  * hashing the joined gram strings (pinned in RepetitionSpec).
  */
case class GramHashes(child: Expression, n: Int) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"gram_hashes requires string, got ${t.sql}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "gram_hashes"

  override def nullSafeEval(input: Any): Any =
    TextHashExpressions.gramHashesEval(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.TextHashExpressions.gramHashesEval($c, $n);")

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Jaccard similarity of two array<string> treated as SETS:
  * |A∩B| / max(|A∪B|, 1). Value-identical to
  * `size(array_intersect)/greatest(size(array_union),1)` (pinned in
  * DedupSpec) — but one pass over two hash sets, no union-array
  * materialization, no per-row Catalyst set builders. This is the
  * verification kernel of every near-dup pipeline: it runs once per
  * CANDIDATE pair, which AQE often coalesces into few partitions (the
  * pair frame is byte-small), so per-evaluation CPU is the wall clock.
  */
case class SetJaccard(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(StringType, _), ArrayType(StringType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"set_jaccard requires (array<string>, array<string>), got (${l.sql}, ${r.sql})")
    }

  override def dataType: DataType = DoubleType
  override def prettyName: String = "set_jaccard"

  override def nullSafeEval(a: Any, b: Any): Any =
    TextHashExpressions.setJaccardEval(
      a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.TextHashExpressions.setJaccardEval($a, $b);")

  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): Expression = copy(left = l, right = r)
}

object TextHashExpressions {
  import GraftColumnBridge.{toColumn, toExpression}
  def minHashSig(shingles: Column, numHashes: Int, seed: Long = 42L): Column =
    toColumn(MinHashSig(toExpression(shingles), numHashes, seed))
  def simHash64(words: Column): Column =
    toColumn(SimHash64Expr(toExpression(words)))
  def wordShingles(text: Column, n: Int): Column =
    toColumn(WordShingles(toExpression(text), n))

  def gramStats(text: Column, n: Int): Column =
    toColumn(GramStats(toExpression(text), n))

  def gramHashes(text: Column, n: Int): Column =
    toColumn(GramHashes(toExpression(text), n))

  def setJaccard(a: Column, b: Column): Column =
    toColumn(SetJaccard(toExpression(a), toExpression(b)))

  /** Shared by interpreted eval and generated code. Null elements follow
    * array_intersect/array_union semantics (null equals null).
    */
  def setJaccardEval(a: ArrayData, b: ArrayData): Double = {
    val sa = new java.util.HashSet[UTF8String](a.numElements() * 2)
    var i = 0
    while (i < a.numElements()) {
      sa.add(if (a.isNullAt(i)) null else a.getUTF8String(i)); i += 1
    }
    val sb = new java.util.HashSet[UTF8String](b.numElements() * 2)
    var inter = 0
    var j = 0
    while (j < b.numElements()) {
      val s = if (b.isNullAt(j)) null else b.getUTF8String(j)
      if (sb.add(s) && sa.contains(s)) inter += 1
      j += 1
    }
    val union = sa.size + sb.size - inter
    if (union == 0) 0.0 else inter.toDouble / union
  }

  /** Shared by interpreted eval and generated code. */
  def gramHashesEval(text: UTF8String, n: Int): ArrayData = {
    val s = text.toString
    val words = new java.util.ArrayList[String]()
    var start = 0
    var i = 0
    while (i <= s.length) {
      if (i == s.length || s.charAt(i) == ' ') {
        words.add(s.substring(start, i)); start = i + 1
      }
      i += 1
    }
    val nw = words.size
    val total = nw - n + 1
    if (total <= 0) return new GenericArrayData(Array.empty[Long])
    val out = new Array[Long](total)
    val sb = new java.lang.StringBuilder()
    var k = 0
    while (k < total) {
      sb.setLength(0)
      var j = 0
      while (j < n) {
        if (j > 0) sb.append(' ')
        sb.append(words.get(k + j))
        j += 1
      }
      val g = UTF8String.fromString(sb.toString)
      out(k) = XXH64.hashUnsafeBytes(g.getBaseObject, g.getBaseOffset, g.numBytes, 42L)
      k += 1
    }
    new GenericArrayData(out)
  }

  /** Shared by interpreted eval and generated code. One split pass, one
    * counting pass over a string-keyed hash map (exact, no hash-collision
    * conflation — `top`/`ndistinct` feed correctness-gated screens).
    */
  def gramStatsEval(text: UTF8String, n: Int): InternalRow = {
    val s = text.toString
    val words = new java.util.ArrayList[String]()
    var start = 0
    var i = 0
    while (i <= s.length) {
      if (i == s.length || s.charAt(i) == ' ') {
        words.add(s.substring(start, i)); start = i + 1
      }
      i += 1
    }
    val nw = words.size
    val total = nw - n + 1
    if (total <= 0) return new GenericInternalRow(Array[Any](0, 0, 0))
    val counts = new java.util.HashMap[String, Int](total * 2)
    val sb = new java.lang.StringBuilder()
    var top = 0
    var k = 0
    while (k < total) {
      sb.setLength(0)
      var j = 0
      while (j < n) {
        if (j > 0) sb.append(' ')
        sb.append(words.get(k + j))
        j += 1
      }
      val c = counts.merge(sb.toString, 1, (a, b) => a + b)
      if (c > top) top = c
      k += 1
    }
    new GenericInternalRow(Array[Any](total, counts.size, top))
  }

  /** Shared by interpreted eval and generated code (static forwarder makes
    * it callable from codegen'd Java).
    */
  def shinglesEval(text: UTF8String, n: Int): ArrayData = {
    val s = text.toString
    val words = new java.util.ArrayList[String]()
    var start = 0
    var i = 0
    while (i <= s.length) {
      if (i == s.length || s.charAt(i) == ' ') {
        words.add(s.substring(start, i)); start = i + 1
      }
      i += 1
    }
    val nw = words.size
    if (nw < n) return new GenericArrayData(Array.empty[Any])
    val seen = new java.util.LinkedHashSet[String]()
    val sb = new java.lang.StringBuilder()
    var k = 0
    while (k <= nw - n) {
      sb.setLength(0)
      var j = 0
      while (j < n) {
        if (j > 0) sb.append(' ')
        sb.append(words.get(k + j))
        j += 1
      }
      seen.add(sb.toString)
      k += 1
    }
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    var m = 0
    while (it.hasNext) { out(m) = UTF8String.fromString(it.next()); m += 1 }
    new GenericArrayData(out)
  }
}
