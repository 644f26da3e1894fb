package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.unsafe.types.UTF8String

/**
 * Bounded per-group top-k TERMS by (int64 score desc, word asc) with two
 * carried int64 attributes — the scale form of tfidf_terms' ranking
 * (r06). The `row_number() over (partition by source order by score,
 * word)` window shape sorts EVERY (source, word) score row on one task
 * per source: fine at bench vocab sizes, a straggler at an open 100 TB
 * vocabulary. This aggregate keeps at most k candidates per (group,
 * task) map-side, so the shuffle carries ≤ k×tasks rows per group and no
 * reducer holds more than k entries.
 *
 * Ordering contract (identical to the window form, tie-break included):
 * score descending, then word ascending by binary UTF8 comparison —
 * exactly Spark's string ordering. Null score/word candidates are
 * excluded (the tfidf pipeline produces none).
 */
case class TermTopKAggregate(
    scoreChild: Expression,
    wordChild: Expression,
    aChild: Expression,
    bChild: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[TermTopKAggregate.Buffer] {

  import TermTopKAggregate.Buffer

  override def children: Seq[Expression] =
    Seq(scoreChild, wordChild, aChild, bChild)

  override def createAggregationBuffer(): Buffer = new Buffer(k)

  override def update(buf: Buffer, row: InternalRow): Buffer = {
    val s = scoreChild.eval(row)
    val w = wordChild.eval(row)
    if (s != null && w != null) {
      val a = aChild.eval(row)
      val b = bChild.eval(row)
      // clone: the input UTF8String may point into a reused row buffer
      buf.insert(s.asInstanceOf[Long],
        w.asInstanceOf[UTF8String].clone(),
        if (a == null) 0L else a.asInstanceOf[Long],
        if (b == null) 0L else b.asInstanceOf[Long])
    }
    buf
  }

  override def merge(buf: Buffer, o: Buffer): Buffer = {
    var i = 0
    while (i < o.size) {
      buf.insert(o.scores(i), o.words(i), o.as(i), o.bs(i)); i += 1
    }
    buf
  }

  override def eval(buf: Buffer): Any =
    new GenericArrayData((0 until buf.size).map { i =>
      val vals = new Array[Any](4)
      vals(0) = buf.words(i)
      vals(1) = buf.as(i)
      vals(2) = buf.bs(i)
      vals(3) = buf.scores(i)
      new GenericInternalRow(vals)
    }.toArray[Any])

  override def serialize(buf: Buffer): Array[Byte] = {
    var bytes = 8
    var i = 0
    while (i < buf.size) { bytes += 28 + buf.words(i).numBytes(); i += 1 }
    val bb = java.nio.ByteBuffer.allocate(bytes)
    bb.putInt(buf.k)
    bb.putInt(buf.size)
    i = 0
    while (i < buf.size) {
      bb.putLong(buf.scores(i))
      bb.putLong(buf.as(i))
      bb.putLong(buf.bs(i))
      val wb = buf.words(i).getBytes
      bb.putInt(wb.length)
      bb.put(wb)
      i += 1
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Buffer = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val buf = new Buffer(bb.getInt)
    val n = bb.getInt
    var i = 0
    while (i < n) {
      val s = bb.getLong
      val a = bb.getLong
      val b = bb.getLong
      val wb = new Array[Byte](bb.getInt)
      bb.get(wb)
      buf.insert(s, UTF8String.fromBytes(wb), a, b)
      i += 1
    }
    buf
  }

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("word", StringType, nullable = false),
    StructField("a", LongType, nullable = false),
    StructField("b", LongType, nullable = false),
    StructField("score_q", LongType, nullable = false))),
    containsNull = false)
  override def nullable: Boolean = false

  override def withNewMutableAggBufferOffset(o: Int): TermTopKAggregate =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): TermTopKAggregate =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      c: IndexedSeq[Expression]): TermTopKAggregate =
    copy(scoreChild = c(0), wordChild = c(1), aChild = c(2), bChild = c(3))
  override def prettyName: String = "term_topk"
}

object TermTopKAggregate {

  /** Sorted-insert bounded buffer, order (score desc, word asc). */
  final class Buffer(val k: Int) {
    val scores: Array[Long] = new Array[Long](k)
    val words: Array[UTF8String] = new Array[UTF8String](k)
    val as: Array[Long] = new Array[Long](k)
    val bs: Array[Long] = new Array[Long](k)
    var size: Int = 0

    private def better(s1: Long, w1: UTF8String,
        s2: Long, w2: UTF8String): Boolean =
      s1 > s2 || (s1 == s2 && w1.compareTo(w2) < 0)

    def insert(s: Long, w: UTF8String, a: Long, b: Long): Unit = {
      if (size == k && !better(s, w, scores(k - 1), words(k - 1))) return
      var i = math.min(size, k - 1)
      while (i > 0 && better(s, w, scores(i - 1), words(i - 1))) {
        scores(i) = scores(i - 1); words(i) = words(i - 1)
        as(i) = as(i - 1); bs(i) = bs(i - 1)
        i -= 1
      }
      scores(i) = s; words(i) = w; as(i) = a; bs(i) = b
      if (size < k) size += 1
    }
  }

  def topK(score: Column, word: Column, a: Column, b: Column,
      k: Int): Column =
    GraftColumnBridge.column(
      TermTopKAggregate(
        GraftColumnBridge.expression(score),
        GraftColumnBridge.expression(word),
        GraftColumnBridge.expression(a),
        GraftColumnBridge.expression(b), k)
        .toAggregateExpression())
}
