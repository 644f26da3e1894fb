package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Static kernel shared by interpreted eval and generated code. */
object ShingleHashUtil {
  private final val Mod = PolyHashUtil.Mod

  /** Distinct polynomial hashes of the n-word shingles of `s` — the fused
    * native equivalent of TextFunctions' expression pipeline
    * `array_distinct(transform(shingles(split(s," "), n), polyHash))`,
    * bit-identical by construction:
    *  - words = s.split(" ", -1) (trailing empties kept, same as Spark's
    *    split with default limit);
    *  - fewer than n words ⇒ empty array;
    *  - shingle hash composed from per-word (hash, 31^codepoints) pairs —
    *    extending a fold h by " "+w is ((h*31+32) mod p)*pow(w)+hash(w)
    *    mod p, identical to hashing the joined string, without EVER
    *    materializing the shingle string;
    *  - distinct keeps first-occurrence order (array_distinct semantics).
    * One pass over the text; the expression pipeline allocated every
    * shingle string and ran interpreted lambdas per element. */
  def hashes(s: UTF8String, n: Int): ArrayData = hashes(s, n, true)

  def hashes(s: UTF8String, n: Int, distinct: Boolean): ArrayData = {
    val str = s.toString
    val words = str.split(" ", -1)
    if (words.length < n) return new GenericArrayData(Array.empty[Long])

    val m = words.length
    val wHash = new Array[Long](m)
    val wPow = new Array[Long](m)
    var wi = 0
    while (wi < m) {
      val w = words(wi)
      var h = 0L
      var pow = 1L
      var i = 0
      val len = w.length
      while (i < len) {
        val cp = w.codePointAt(i)
        h = (h * 31L + cp) % Mod
        pow = (pow * 31L) % Mod
        i += Character.charCount(cp)
      }
      wHash(wi) = h
      wPow(wi) = pow
      wi += 1
    }

    if (!distinct && n == 1) return new GenericArrayData(wHash)

    val raw = new Array[Long](m - n + 1)
    var start = 0
    while (start <= m - n) {
      var h = wHash(start)
      var k = 1
      while (k < n) {
        val j = start + k
        h = (((h * 31L + 32L) % Mod) * wPow(j) + wHash(j)) % Mod
        k += 1
      }
      raw(start) = h
      start += 1
    }
    if (!distinct) return new GenericArrayData(raw)

    val out = new java.util.LinkedHashSet[java.lang.Long]()
    var i = 0
    while (i < raw.length) { out.add(raw(i)); i += 1 }
    val arr = new Array[Long](out.size)
    val it = out.iterator()
    var oi = 0
    while (it.hasNext) { arr(oi) = it.next(); oi += 1 }
    new GenericArrayData(arr)
  }
}

/**
 * Native Catalyst expression: distinct n-word-shingle polynomial hashes of
 * a text column in one codegen'd pass (no shingle-string materialization,
 * no interpreted higher-order lambdas). Feeds MinHash signatures and the
 * Jaccard inverted index; semantics (and the DuckDB oracle) are identical
 * to the expression-pipeline specification, which is kept in
 * [[TextFunctions.shingleHashesHof]] and cross-checked by tests.
 */
case class ShingleHashes(child: Expression, n: Int, distinct: Boolean = true)
    extends UnaryExpression with Serializable {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(input: Any): Any =
    ShingleHashUtil.hashes(input.asInstanceOf[UTF8String], n, distinct)

  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.ShingleHashUtil.hashes($c, $n, $distinct)")

  override protected def withNewChildInternal(
      newChild: Expression): ShingleHashes = copy(child = newChild)

  override def prettyName: String = "shingle_hashes"
}

object ShingleHashes {
  def apply(c: Column, n: Int): Column =
    org.apache.spark.sql.GraftColumnBridge.column(
      ShingleHashes(org.apache.spark.sql.GraftColumnBridge.expression(c), n))

  /** ALL n-word window hashes in POSITION order (duplicates kept) — the
    * sliding-window input of exact-span dedup, where index i is the hash
    * of the window starting at word i+1. */
  def sliding(c: Column, n: Int): Column =
    org.apache.spark.sql.GraftColumnBridge.column(
      ShingleHashes(org.apache.spark.sql.GraftColumnBridge.expression(c),
        n, distinct = false))

  /** ALL word hashes in order (n=1, duplicates kept) — the SimHash input,
    * where vote multiplicity matters. */
  def wordHashes(c: Column): Column =
    org.apache.spark.sql.GraftColumnBridge.column(
      ShingleHashes(org.apache.spark.sql.GraftColumnBridge.expression(c),
        1, distinct = false))
}
