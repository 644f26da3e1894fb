package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Static kernel shared by interpreted eval and generated code. */
object MinhashSigUtil {
  private final val Mod = PolyHashUtil.Mod

  /** k-hash MinHash signature of a text's distinct n-word shingles:
    * sig[i] = min over shingle hashes h of (h·(2i+1) + 1000003·i + 12345)
    * mod p — identical arithmetic to the explode→groupBy formulation and
    * the DuckDB oracle, INCLUDING the edge: fewer than n words ⇒ an
    * all-null signature (explode_outer of an empty shingle set feeds one
    * null hash to each MIN; DuckDB's list_min of [] is NULL likewise). */
  def signature(s: UTF8String, k: Int, shingleN: Int): ArrayData = {
    val hs = ShingleHashUtil.hashes(s, shingleN, true)
    val m = hs.numElements()
    if (m == 0) return new GenericArrayData(new Array[Any](k))
    val sig = new Array[Long](k)
    java.util.Arrays.fill(sig, Long.MaxValue)
    var idx = 0
    while (idx < m) {
      val h = hs.getLong(idx)
      var i = 0
      while (i < k) {
        val v = (h * (2 * i + 1) + (i * 1000003L + 12345L)) % Mod
        if (v < sig(i)) sig(i) = v
        i += 1
      }
      idx += 1
    }
    new GenericArrayData(sig)
  }
}

/**
 * Native Catalyst expression: per-row MinHash signature in one codegen'd
 * pass. The signature is a function of the row's own shingles; the r01/r02
 * explode→groupBy shape existed only as a CollapseProject barrier (the
 * expression-pipeline form got its lambda re-inlined 64x) and paid a full
 * (id, shingle-hash) shuffle. The aggregation formulation is kept as the
 * cross-checked specification; the DuckDB oracle is unchanged.
 */
case class MinhashSig(child: Expression, k: Int, shingleN: Int)
    extends UnaryExpression with Serializable {

  // element nulls: the no-shingle edge yields an all-null signature
  override def dataType: DataType = ArrayType(LongType, containsNull = true)

  override def nullSafeEval(input: Any): Any =
    MinhashSigUtil.signature(input.asInstanceOf[UTF8String], k, shingleN)

  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.MinhashSigUtil.signature($c, $k, $shingleN)")

  override protected def withNewChildInternal(
      newChild: Expression): MinhashSig = copy(child = newChild)

  override def prettyName: String = "minhash_sig"
}

object MinhashSig {
  def apply(c: Column, k: Int, shingleN: Int): Column =
    org.apache.spark.sql.GraftColumnBridge.column(
      MinhashSig(org.apache.spark.sql.GraftColumnBridge.expression(c),
        k, shingleN))
}
