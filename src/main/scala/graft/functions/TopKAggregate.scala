package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.sql.GraftColumnBridge

/**
 * Bounded top-k (by score desc, id asc) as a Catalyst
 * `TypedImperativeAggregate` — the scale form of per-probe neighbor
 * ranking (VERDICT r02 #7). The `row_number() over (partition by probe)`
 * window shape shuffles EVERY scored candidate to one reducer per probe
 * and sorts there: fine at bench probe counts, a bottleneck at 10^6
 * probes. This aggregate keeps at most k candidates per (probe, task) in
 * the map-side partial, so the shuffle carries ≤ k×tasks rows per probe
 * and no reducer ever holds more than k elements per group.
 *
 * Ordering contract (identical to the window form, tie-break included):
 * score descending, then id ascending; double comparison via
 * java.lang.Double.compare, matching Spark's NaN-greatest ordering.
 * NULL-score or null-id candidates are EXCLUDED (update skips them) —
 * unlike a row_number window, which ranks null scores last. For the ANN
 * callers a null cosine means an unscorable candidate (null/zero vector),
 * which must not occupy a top-k slot; callers needing nulls-last window
 * semantics should coalesce the score to -Infinity first.
 */
case class TopKByScoreAggregate(
    scoreChild: Expression,
    idChild: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[TopKByScoreAggregate.Buffer] {

  import TopKByScoreAggregate.Buffer

  override def children: Seq[Expression] = Seq(scoreChild, idChild)

  override def createAggregationBuffer(): Buffer = new Buffer(k)

  override def update(b: Buffer, row: InternalRow): Buffer = {
    val s = scoreChild.eval(row)
    val i = idChild.eval(row)
    if (s != null && i != null)
      b.insert(s.asInstanceOf[Double], i.asInstanceOf[Long])
    b
  }

  override def merge(b: Buffer, o: Buffer): Buffer = {
    var i = 0
    while (i < o.size) { b.insert(o.scores(i), o.ids(i)); i += 1 }
    b
  }

  override def eval(b: Buffer): Any = {
    // the buffer maintains (score desc, id asc) order on every insert —
    // emit as-is (re-sorting by -score would invert NaN ordering)
    new GenericArrayData((0 until b.size).map { i =>
      val vals = new Array[Any](2)
      vals(0) = b.ids(i)
      vals(1) = b.scores(i)
      new GenericInternalRow(vals)
    }.toArray[Any])
  }

  override def serialize(b: Buffer): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(8 + 16 * b.size)
    bb.putInt(b.k)
    bb.putInt(b.size)
    var i = 0
    while (i < b.size) { bb.putDouble(b.scores(i)); bb.putLong(b.ids(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Buffer = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val buf = new Buffer(bb.getInt)
    val n = bb.getInt
    var i = 0
    while (i < n) { buf.insert(bb.getDouble, bb.getLong); i += 1 }
    buf
  }

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("neighbor_id", LongType, nullable = false),
    StructField("cos", DoubleType, nullable = false))),
    containsNull = false)
  override def nullable: Boolean = false

  override def withNewMutableAggBufferOffset(o: Int): TopKByScoreAggregate =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): TopKByScoreAggregate =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      c: IndexedSeq[Expression]): TopKByScoreAggregate =
    copy(scoreChild = c(0), idChild = c(1))
  override def prettyName: String = "topk_by_score"
}

object TopKByScoreAggregate {

  /** Bounded buffer: a simple sorted-insert array (k is small — 10s, not
    * 10^6; insertion keeps (score desc, id asc) order so the LAST slot is
    * always the eviction candidate). */
  final class Buffer(val k: Int) {
    val scores: Array[Double] = new Array[Double](k)
    val ids: Array[Long] = new Array[Long](k)
    var size: Int = 0

    /** true if (s1,i1) ranks strictly better than (s2,i2). */
    private def better(s1: Double, i1: Long, s2: Double, i2: Long): Boolean = {
      val c = java.lang.Double.compare(s1, s2)
      c > 0 || (c == 0 && i1 < i2)
    }

    def insert(s: Double, id: Long): Unit = {
      if (size == k && !better(s, id, scores(k - 1), ids(k - 1))) return
      // find insertion point from the back, shifting worse entries down
      var i = math.min(size, k - 1)
      while (i > 0 && better(s, id, scores(i - 1), ids(i - 1))) {
        scores(i) = scores(i - 1)
        ids(i) = ids(i - 1)
        i -= 1
      }
      scores(i) = s
      ids(i) = id
      if (size < k) size += 1
    }
  }

  def topK(score: Column, id: Column, k: Int): Column =
    GraftColumnBridge.column(
      TopKByScoreAggregate(
        GraftColumnBridge.expression(score),
        GraftColumnBridge.expression(id), k)
        .toAggregateExpression())
}
