package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, LongType}

/** Static kernel shared by interpreted eval and generated code. */
object SrpBucketUtil {
  /** `planes`-bit sign-random-projection bucket of a float vector: bit j
    * set iff Σ_i v[i]·sign(seed,j,i) > 0, sign = +1 iff
    * ((i+1)·2654435761 + (j+1)·40503 + seed) >> 16 is even. Ordered double
    * accumulation, identical op-for-op to the expression-pipeline
    * specification (and hence to the DuckDB oracle). */
  def bucket(v: ArrayData, planes: Int, seed: Long): Long = {
    var b = 0L
    val n = v.numElements()
    var j = 0
    while (j < planes) {
      var acc = 0.0
      var i = 0
      while (i < n) {
        val h = ((i + 1) * 2654435761L + (j + 1) * 40503L + seed) >> 16
        val sign = if (h % 2 == 0) 1.0 else -1.0
        acc += v.getFloat(i).toDouble * sign
        i += 1
      }
      if (acc > 0) b += (1L << j)
      j += 1
    }
    b
  }
}

/**
 * Native Catalyst expression: SRP-LSH bucket id of an `array<float>`
 * column in one codegen'd pass. The expression-pipeline formulation
 * (aggregate over zip_with per plane — [[graft.operators.SimilaritySearch
 * .srpBucket]], kept as the executable specification) runs `planes`
 * interpreted folds per row; at corpus scale the bucketing pass touches
 * every vector, so it must be tight-loop code.
 */
case class SrpBucket(child: Expression, planes: Int, seed: Long)
    extends UnaryExpression with Serializable {

  override def dataType: DataType = LongType

  override def nullSafeEval(input: Any): Any =
    SrpBucketUtil.bucket(input.asInstanceOf[ArrayData], planes, seed)

  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.SrpBucketUtil.bucket($c, $planes, ${seed}L)")

  override protected def withNewChildInternal(
      newChild: Expression): SrpBucket = copy(child = newChild)

  override def prettyName: String = "srp_bucket"
}

object SrpBucket {
  def apply(c: Column, planes: Int, seed: Long): Column =
    org.apache.spark.sql.GraftColumnBridge.column(
      SrpBucket(org.apache.spark.sql.GraftColumnBridge.expression(c),
        planes, seed))
}
