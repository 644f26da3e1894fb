package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Static kernels shared by interpreted eval and generated code.
  *
  * Both replay the expression-only specification EXACTLY —
  * `aggregate(zip_with(a, b, (u,v) => u.cast(double)*v.cast(double)),
  * 0.0, _+_)`: elements promote to double one at a time and accumulate
  * LEFT-TO-RIGHT (never pairwise/vectorized reassociation), so results
  * are bit-identical to the fold the DuckDB oracles replay
  * (`list_reduce` over double-promoted products). A length mismatch or
  * null element poisons the fold to NULL, exactly as zip_with's null
  * padding does. */
object DotProductUtil {
  /** float[] x float[] ordered-fold dot; null on mismatch/null element. */
  def dotFF(a: ArrayData, b: ArrayData): java.lang.Double = {
    val n = a.numElements()
    if (b.numElements() != n) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      acc += a.getFloat(i).toDouble * b.getFloat(i).toDouble
      i += 1
    }
    java.lang.Double.valueOf(acc)
  }

  /** Mixed-width variant: each side reads float or double per its
    * schema, promoting to double before the product — same fold. */
  def dotGen(a: ArrayData, aFloat: Boolean, b: ArrayData,
      bFloat: Boolean): java.lang.Double = {
    val n = a.numElements()
    if (b.numElements() != n) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val x = if (aFloat) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (bFloat) b.getFloat(i).toDouble else b.getDouble(i)
      acc += x * y
      i += 1
    }
    java.lang.Double.valueOf(acc)
  }
}

/**
 * Native Catalyst expression: ordered-fold dot product of two numeric
 * array columns (float or double elements), promoted to double.
 *
 * The expression-only formulation (`zip_with` + higher-order `aggregate`)
 * interprets two lambdas per element — at 64 dims that is 128 interpreted
 * closure calls per pair, the dominant cost of every all-pairs or
 * brute-force scoring pass. This expression runs the same fold as a tight
 * generated loop (the PolyHash/MinhashSig tier of the extension ladder);
 * semantics, IEEE op order, and the DuckDB oracles are unchanged.
 */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression with Serializable {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  private def elemIsFloat(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(e: Expression) = e.dataType match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
      case _ => false
    }
    if (ok(left) && ok(right)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"dot_product needs array<float|double> inputs, got " +
        s"${left.dataType.simpleString} / ${right.dataType.simpleString}")
  }

  override def nullSafeEval(a: Any, b: Any): Any =
    DotProductUtil.dotGen(
      a.asInstanceOf[ArrayData], elemIsFloat(left),
      b.asInstanceOf[ArrayData], elemIsFloat(right))

  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val tmp = ctx.freshName("dotRes")
      val call =
        if (elemIsFloat(left) && elemIsFloat(right))
          s"graft.functions.DotProductUtil.dotFF($a, $b)"
        else
          s"graft.functions.DotProductUtil.dotGen($a, ${elemIsFloat(left)}, " +
            s"$b, ${elemIsFloat(right)})"
      s"""
         |java.lang.Double $tmp = $call;
         |if ($tmp == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = $tmp.doubleValue(); }
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "dot_product"
}

object DotProduct {
  /** Column-level entry point. */
  def apply(a: Column, b: Column): Column =
    org.apache.spark.sql.GraftColumnBridge.column(
      DotProduct(
        org.apache.spark.sql.GraftColumnBridge.expression(a),
        org.apache.spark.sql.GraftColumnBridge.expression(b)))
}
