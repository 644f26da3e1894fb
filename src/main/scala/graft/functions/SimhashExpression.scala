package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Static kernel shared by interpreted eval and generated code. */
object Simhash64Util {
  private final val Mod = PolyHashUtil.Mod

  /** 64-bit SimHash of a text as 4 x 16-bit bands (array<long>), one tight
    * pass: per word w, hash h = polynomial codepoint fold; bit j of w is
    * ((h·(2j+1) + j·1000003 + 12345) mod p) mod 2; votes[j] sums ±1 over
    * ALL word occurrences (multiplicity matters); band b packs the 16 sign
    * bits [16b, 16b+16). Identical arithmetic to the Dedup.simhash64
    * explode→groupBy formulation and the DuckDB oracle. */
  def bands(s: UTF8String, nBands: Int, bandBits: Int): ArrayData = {
    val bits = nBands * bandBits
    val votes = new Array[Long](bits)
    val str = s.toString
    val words = str.split(" ", -1)
    var wi = 0
    while (wi < words.length) {
      val w = words(wi)
      var h = 0L
      var i = 0
      val len = w.length
      while (i < len) {
        val cp = w.codePointAt(i)
        h = (h * 31L + cp) % Mod
        i += Character.charCount(cp)
      }
      vote(votes, h, bits)
      wi += 1
    }
    pack(votes, nBands, bandBits)
  }

  /** Banded SimHash over an array of PRE-COMPUTED feature hashes (e.g.
    * media frame fingerprints) — same bit family and vote arithmetic as
    * the word form, but the caller supplies the per-feature hashes.
    * Integer vote sums are order-free, so the result is invariant to the
    * array's element order (collect_list order never matters). */
  def bandsFromHashes(hs: ArrayData, nBands: Int, bandBits: Int): ArrayData = {
    val bits = nBands * bandBits
    val votes = new Array[Long](bits)
    val n = hs.numElements()
    var i = 0
    while (i < n) {
      vote(votes, hs.getLong(i), bits)
      i += 1
    }
    pack(votes, nBands, bandBits)
  }

  /** bit j of hash h is ((h·(2j+1) + j·1000003 + 12345) mod p) mod 2;
    * each feature votes ±1 on every bit. */
  private def vote(votes: Array[Long], h: Long, bits: Int): Unit = {
    var j = 0
    while (j < bits) {
      val bit = ((h * (2 * j + 1) + (j * 1000003L + 12345L)) % Mod) % 2L
      votes(j) += (if (bit == 1L) 1L else -1L)
      j += 1
    }
  }

  private def pack(votes: Array[Long], nBands: Int, bandBits: Int)
      : ArrayData = {
    val out = new Array[Long](nBands)
    var b = 0
    while (b < nBands) {
      var v = 0L
      var i = 0
      while (i < bandBits) {
        if (votes(bandBits * b + i) > 0) v += (1L << i)
        i += 1
      }
      out(b) = v
      b += 1
    }
    new GenericArrayData(out)
  }
}

/**
 * Native Catalyst expression: banded 64-bit SimHash of a text column in a
 * single projection pass — SimHash is a per-row function of the row's own
 * words, so the explode → groupBy(id) → 64-aggregate formulation paid a
 * full (id, word-hash) shuffle for nothing. Spec forms (the per-row
 * higher-order fold and the aggregation shape) are cross-checked in tests;
 * the DuckDB oracle is unchanged.
 */
case class Simhash64Bands(child: Expression, nBands: Int, bandBits: Int)
    extends UnaryExpression with Serializable {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(input: Any): Any =
    Simhash64Util.bands(input.asInstanceOf[UTF8String], nBands, bandBits)

  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.Simhash64Util.bands($c, $nBands, $bandBits)")

  override protected def withNewChildInternal(
      newChild: Expression): Simhash64Bands = copy(child = newChild)

  override def prettyName: String = "simhash64_bands"
}

object Simhash64Bands {
  def apply(c: Column, nBands: Int, bandBits: Int): Column =
    org.apache.spark.sql.GraftColumnBridge.column(
      Simhash64Bands(org.apache.spark.sql.GraftColumnBridge.expression(c),
        nBands, bandBits))
}

/**
 * Banded SimHash over an `array<long>` of pre-computed feature hashes —
 * the media perceptual-hash kernel ([[graft.operators.Multimodal.phash64]]
 * feeds it frame fingerprints). Same codegen'd single-pass shape as
 * [[Simhash64Bands]]; order-invariant by construction (integer vote sums).
 */
case class SimhashFromHashes(child: Expression, nBands: Int, bandBits: Int)
    extends UnaryExpression with Serializable {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(input: Any): Any =
    Simhash64Util.bandsFromHashes(
      input.asInstanceOf[ArrayData], nBands, bandBits)

  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.Simhash64Util.bandsFromHashes($c, $nBands, " +
        s"$bandBits)")

  override protected def withNewChildInternal(
      newChild: Expression): SimhashFromHashes = copy(child = newChild)

  override def prettyName: String = "simhash_from_hashes"
}

object SimhashFromHashes {
  def apply(c: Column, nBands: Int, bandBits: Int): Column =
    org.apache.spark.sql.GraftColumnBridge.column(
      SimhashFromHashes(org.apache.spark.sql.GraftColumnBridge.expression(c),
        nBands, bandBits))
}
