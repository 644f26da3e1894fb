package graft.drift

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.sql.GraftColumnBridge

/**
 * Zero-copy histogram aggregates (custom Catalyst
 * `TypedImperativeAggregate`): the Aggregator/udaf formulation decodes
 * every `tokens` array into a JVM `Array[Int]` per row via the encoder —
 * gigabytes of allocation churn per scan at bench scale, and the
 * allocation rate (not CPU) caps multi-core scaling. These aggregates read
 * the columnar `ArrayData` in place.
 *
 * TokenHistAggregate: per-source histogram of token ids over an
 * array<int> column, `bins` buckets over [0, vocab).
 * NtokHistAggregate: histogram of an int column, bucket width `binWidth`,
 * clamped to `bins`.
 */
trait HistAggregateBase extends TypedImperativeAggregate[Array[Long]] {

  def bins: Int

  override def createAggregationBuffer(): Array[Long] = new Array[Long](bins)

  override def merge(b: Array[Long], o: Array[Long]): Array[Long] = {
    var i = 0
    while (i < bins) { b(i) += o(i); i += 1 }
    b
  }

  override def eval(b: Array[Long]): Any =
    new GenericArrayData(b.map(Long.box))

  override def serialize(b: Array[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(bins * 8)
    bb.asLongBuffer().put(b)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val out = new Array[Long](bins)
    java.nio.ByteBuffer.wrap(bytes).asLongBuffer().get(out)
    out
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
}

case class TokenHistAggregate(
    child: Expression,
    bins: Int,
    vocab: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends HistAggregateBase {

  override def children: Seq[Expression] = Seq(child)

  override def update(b: Array[Long], row: InternalRow): Array[Long] = {
    val arr = child.eval(row)
    if (arr != null) {
      val a = arr.asInstanceOf[ArrayData]
      val n = a.numElements()
      var i = 0
      while (i < n) {
        val t = a.getInt(i)
        if (t >= 0 && t < vocab) b((t.toLong * bins / vocab).toInt) += 1L
        i += 1
      }
    }
    b
  }

  override def withNewMutableAggBufferOffset(o: Int): TokenHistAggregate =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): TokenHistAggregate =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      c: IndexedSeq[Expression]): TokenHistAggregate = copy(child = c.head)
  override def prettyName: String = "token_hist"
}

case class NtokHistAggregate(
    child: Expression,
    bins: Int,
    binWidth: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends HistAggregateBase {

  override def children: Seq[Expression] = Seq(child)

  override def update(b: Array[Long], row: InternalRow): Array[Long] = {
    val v = child.eval(row)
    if (v != null) {
      // floorDiv + drop-negatives, IDENTICAL to Drift.ntokHist's
      // floor()/filter(bin >= 0): Java truncation would bin -63 into bin 0
      // on this side while the baseline side floors it to -1 (ADVICE r01).
      val bin = math.min(Math.floorDiv(v.asInstanceOf[Int], binWidth), bins - 1)
      if (bin >= 0) b(bin) += 1L
    }
    b
  }

  override def withNewMutableAggBufferOffset(o: Int): NtokHistAggregate =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): NtokHistAggregate =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      c: IndexedSeq[Expression]): NtokHistAggregate = copy(child = c.head)
  override def prettyName: String = "ntok_hist"
}

object HistAggregate {
  def tokenHist(c: Column, bins: Int, vocab: Int): Column =
    GraftColumnBridge.column(
      TokenHistAggregate(GraftColumnBridge.expression(c), bins, vocab)
        .toAggregateExpression())

  def ntokHist(c: Column, bins: Int, binWidth: Int): Column =
    GraftColumnBridge.column(
      NtokHistAggregate(GraftColumnBridge.expression(c), bins, binWidth)
        .toAggregateExpression())
}
