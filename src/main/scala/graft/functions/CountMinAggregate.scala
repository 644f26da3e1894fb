package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.sql.GraftColumnBridge

/**
 * Count-min sketch (Cormode & Muthukrishnan 2005, public algorithm) over a
 * PRE-HASHED key column: `depth` rows of `width` counters; each update
 * increments one counter per row at an affine rehash of the key, and a
 * point estimate is the MIN over rows — an overestimate, never an under.
 *
 * Why it exists next to the exact `groupBy(key).count()`: the exact form
 * shuffles one partial per DISTINCT key, which is fine for a bounded
 * vocabulary but unbounded for open n-gram domains at the 10^12-row
 * shape. The sketch's state is a fixed depth×width array — the global
 * aggregation partial-merges (cell-wise sum, order-free) with ZERO
 * exchanges of key space, and heavy-hitter estimates come off the
 * collected 32 KB array driver-side (the repo's trained-literal pattern).
 *
 * Determinism contract: keys arrive as the portable polynomial hash
 * ([[PolyHash]], < 1e9+7), bucket = ((h * A_r + B_r) mod P) mod width
 * with fixed odd constants — every product < 2^63 and the whole chain is
 * integer arithmetic a DuckDB oracle replays bit-for-bit.
 */
case class CountMinAggregate(
    hashChild: Expression,
    weightChild: Expression,
    depth: Int,
    width: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]] {

  import CountMinAggregate._
  require(depth > 0 && depth <= RowA.length, s"depth 1..${RowA.length}")
  require(width > 0, "width > 0")

  override def children: Seq[Expression] = Seq(hashChild, weightChild)

  override def createAggregationBuffer(): Array[Long] =
    new Array[Long](depth * width)

  override def update(buf: Array[Long], row: InternalRow): Array[Long] = {
    val h = hashChild.eval(row)
    if (h != null) {
      val w = weightChild.eval(row)
      val wt = if (w == null) 0L else w.asInstanceOf[Long]
      val hv = h.asInstanceOf[Long]
      var r = 0
      while (r < depth) {
        buf(r * width + bucket(hv, r, width)) += wt
        r += 1
      }
    }
    buf
  }

  override def merge(b: Array[Long], o: Array[Long]): Array[Long] = {
    var i = 0
    while (i < b.length) { b(i) += o(i); i += 1 }
    b
  }

  override def eval(buf: Array[Long]): Any =
    new GenericArrayData(buf.map(Long.box))

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(8 * buf.length)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    Array.fill(bytes.length / 8)(bb.getLong)
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false

  override def withNewMutableAggBufferOffset(o: Int): CountMinAggregate =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): CountMinAggregate =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      c: IndexedSeq[Expression]): CountMinAggregate =
    copy(hashChild = c(0), weightChild = c(1))
  override def prettyName: String = "count_min"
}

object CountMinAggregate {

  /** Pairwise-independent-style affine rehash constants (fixed odd
    * multipliers; the oracle mirrors them as literals). */
  val RowA: Array[Long] = Array(31L, 131L, 1031L, 8191L, 524287L)
  val RowB: Array[Long] = Array(7L, 101L, 997L, 7919L, 104729L)
  val P: Long = 1000000007L

  /** Bucket of pre-hashed key `h` (0 <= h < P) in sketch row `r`. */
  def bucket(h: Long, r: Int, width: Int): Int =
    (((h * RowA(r) + RowB(r)) % P) % width).toInt

  /** Point estimate from a collected sketch: min over rows. */
  def estimate(sketch: Array[Long], h: Long, depth: Int, width: Int): Long = {
    var best = Long.MaxValue
    var r = 0
    while (r < depth) {
      val c = sketch(r * width + bucket(h, r, width))
      if (c < best) best = c
      r += 1
    }
    best
  }

  def agg(hash: Column, weight: Column, depth: Int, width: Int): Column =
    GraftColumnBridge.column(
      CountMinAggregate(
        GraftColumnBridge.expression(hash),
        GraftColumnBridge.expression(weight),
        depth, width).toAggregateExpression())
}
