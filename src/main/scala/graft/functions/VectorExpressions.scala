package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.types._

/** Native Catalyst expressions for the vector kernels (reference SIMD
  * kernels, crates/grafeo-core/src/index/vector/simd.rs) — the hot path of
  * brute-force k-NN and embedding dedup.
  *
  * Spark's higher-order functions (zip_with/aggregate) are CodegenFallback:
  * per-pair interpreted lambda eval with boxing, ~100× slower at millions of
  * pairs. These expressions emit a primitive loop via doGenCode instead —
  * the preferred extension order of SURVEY §7.2 (custom Expression before
  * custom operator).
  *
  * Accumulation is double precision, left-to-right over float or double
  * input arrays — bit-compatible with the DuckDB oracle's
  * CAST(… AS DOUBLE[]) list kernels.
  */
abstract class VecFoldExpression extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(t: DataType): Boolean = t match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float>/array<double> inputs, " +
        s"got ${left.dataType.sql} and ${right.dataType.sql}")
  }

  override def dataType: DataType = DoubleType

  protected def elemIsFloat(e: Expression): Boolean =
    e.dataType.asInstanceOf[ArrayType].elementType == FloatType

  /** Scala-side combine for interpreted eval. */
  protected def combine(x: Double, y: Double): Double

  /** Java source for the loop body accumulation into `acc` given `x`/`y`. */
  protected def combineCode(acc: String, x: String, y: String): String

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = math.min(a.numElements(), b.numElements())
    val (lf, rf) = (elemIsFloat(left), elemIsFloat(right))
    var acc = 0.0
    var i = 0
    while (i < n) {
      val x = if (lf) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (rf) b.getFloat(i).toDouble else b.getDouble(i)
      acc = combine(acc, combine(x, y)) // overridden below where not a sum
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      val x = ctx.freshName("x")
      val y = ctx.freshName("y")
      val getL = if (elemIsFloat(left)) s"(double) $a.getFloat($i)" else s"$a.getDouble($i)"
      val getR = if (elemIsFloat(right)) s"(double) $b.getFloat($i)" else s"$b.getDouble($i)"
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $x = $getL;
         |  double $y = $getR;
         |  ${combineCode(acc, x, y)}
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })
}

/** Σ aᵢ·bᵢ */
case class VecDot(left: Expression, right: Expression) extends VecFoldExpression {
  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = math.min(a.numElements(), b.numElements())
    val (lf, rf) = (elemIsFloat(left), elemIsFloat(right))
    var acc = 0.0
    var i = 0
    while (i < n) {
      val x = if (lf) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (rf) b.getFloat(i).toDouble else b.getDouble(i)
      acc += x * y
      i += 1
    }
    acc
  }
  protected def combine(x: Double, y: Double): Double = x * y
  protected def combineCode(acc: String, x: String, y: String): String =
    s"$acc += $x * $y;"
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}

/** Σ (aᵢ−bᵢ)² */
case class VecL2Sq(left: Expression, right: Expression) extends VecFoldExpression {
  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = math.min(a.numElements(), b.numElements())
    val (lf, rf) = (elemIsFloat(left), elemIsFloat(right))
    var acc = 0.0
    var i = 0
    while (i < n) {
      val x = if (lf) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (rf) b.getFloat(i).toDouble else b.getDouble(i)
      val d = x - y
      acc += d * d
      i += 1
    }
    acc
  }
  protected def combine(x: Double, y: Double): Double = { val d = x - y; d * d }
  protected def combineCode(acc: String, x: String, y: String): String =
    s"double d = $x - $y; $acc += d * d;"
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}

/** Σ |aᵢ−bᵢ| */
case class VecL1(left: Expression, right: Expression) extends VecFoldExpression {
  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = math.min(a.numElements(), b.numElements())
    val (lf, rf) = (elemIsFloat(left), elemIsFloat(right))
    var acc = 0.0
    var i = 0
    while (i < n) {
      val x = if (lf) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (rf) b.getFloat(i).toDouble else b.getDouble(i)
      acc += java.lang.Math.abs(x - y)
      i += 1
    }
    acc
  }
  protected def combine(x: Double, y: Double): Double = math.abs(x - y)
  protected def combineCode(acc: String, x: String, y: String): String =
    s"$acc += java.lang.Math.abs($x - $y);"
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}

object VectorExpressions {
  import GraftColumnBridge.{toColumn, toExpression}
  def vecDot(a: Column, b: Column): Column = toColumn(VecDot(toExpression(a), toExpression(b)))
  def vecL2Sq(a: Column, b: Column): Column = toColumn(VecL2Sq(toExpression(a), toExpression(b)))
  def vecL1(a: Column, b: Column): Column = toColumn(VecL1(toExpression(a), toExpression(b)))
}
