package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.types._

/** All-tables random-hyperplane LSH signature in ONE native expression.
  *
  * Composing the signature from per-plane [[VecDot]] calls scales the
  * EXPRESSION TREE with tables×bits: at the corpus-sized widths
  * [[graft.vector.Knn.nearDupPairsLSH]] picks for 10⁴+-row corpora
  * (12 bits × 8 tables = 96 dot products, each against a 64-element literal
  * array), the generated projection exceeds the JVM's 64 KB method limit
  * ("Code grows beyond 64 KB"), whole-stage codegen falls back to
  * interpreted eval, and the signature stage dominates the near-dup wall
  * time (measured 3× the total query at sf1). This expression keeps the
  * generated code CONSTANT-SIZE regardless of tables×bits: the plane
  * matrix rides along as a referenced object (`ctx.addReferenceObj`, the
  * mechanism Spark itself uses for large literals) and the signatures come
  * from one primitive triple loop.
  *
  * Output: `array<long>` of length `tables`; element t encodes
  * `(t << 32) | sig_t` where bit i of `sig_t` is set iff
  * `vec · planes(t)(i) >= 0` — the same sign convention as the composed
  * path, so bucket assignments (and therefore candidates, recall, and every
  * oracle result) are IDENTICAL; only the join-key encoding changed
  * (struct(table,sig) → long), which also shrinks the exploded shuffle row.
  */
case class LshSigs(child: Expression, planes: Array[Array[Double]], dim: Int)
    extends UnaryExpression {

  private val bits: Int = if (planes.isEmpty) 0 else planes(0).length / dim

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"lsh_sigs requires array<float>/array<double> input, got ${t.sql}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  private def elemIsFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(v: Any): Any = {
    val a = v.asInstanceOf[ArrayData]
    val n = math.min(a.numElements(), dim)
    val isF = elemIsFloat
    val out = new Array[Long](planes.length)
    var t = 0
    while (t < planes.length) {
      val p = planes(t)
      var sig = 0L
      var b = 0
      while (b < bits) {
        var acc = 0.0
        val off = b * dim
        var i = 0
        while (i < n) {
          acc += (if (isF) a.getFloat(i).toDouble else a.getDouble(i)) * p(off + i)
          i += 1
        }
        if (acc >= 0) sig |= (1L << b)
        b += 1
      }
      out(t) = (t.toLong << 32) | sig
      t += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val p = ctx.addReferenceObj("lshPlanes", planes, "double[][]")
      val out = ctx.freshName("out")
      val n = ctx.freshName("n")
      val t = ctx.freshName("t")
      val b = ctx.freshName("b")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      val sig = ctx.freshName("sig")
      val off = ctx.freshName("off")
      val getElem =
        if (elemIsFloat) s"(double) $a.getFloat($i)" else s"$a.getDouble($i)"
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $dim);
         |long[] $out = new long[${planes.length}];
         |for (int $t = 0; $t < ${planes.length}; $t++) {
         |  double[] ${off}p = $p[$t];
         |  long $sig = 0L;
         |  for (int $b = 0; $b < $bits; $b++) {
         |    double $acc = 0.0;
         |    int $off = $b * $dim;
         |    for (int $i = 0; $i < $n; $i++) {
         |      $acc += $getElem * ${off}p[$off + $i];
         |    }
         |    if ($acc >= 0) $sig |= (1L << $b);
         |  }
         |  $out[$t] = (((long) $t) << 32) | $sig;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): LshSigs =
    copy(child = newChild)
}

object LshExpressions {
  import GraftColumnBridge.{toColumn, toExpression}

  /** `array<long>` of per-table bucket keys for `vec` under `planes`
    * ([table] → flattened [bit][dim] row-major hyperplanes).
    */
  def lshSigs(vec: Column, planes: Array[Array[Double]], dim: Int): Column =
    toColumn(LshSigs(toExpression(vec), planes, dim))
}
