package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Trained linear quality classifier + the new sampling/join queries:
  * bit-determinism across partitionings, learning actually separating the
  * classes, and the plan shapes the 100 TB path relies on. */
class LinearModelSpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  private def synthFeats(parts: Int) = {
    // y correlates with x1; x2 is noise — the model must find that
    (0 until 400).map { i =>
      val x1 = (i % 20) / 20.0
      val x2 = ((i * 7919) % 13) / 13.0
      val y = if (x1 >= 0.5) 1.0 else 0.0
      (x1, x2, y)
    }.toDF("x1", "x2", "y").repartition(parts)
  }

  test("lmsTrain is bit-identical across partitionings") {
    val w1 = LinearModel.lmsTrain(synthFeats(1), Seq("x1", "x2"), "y",
      iters = 3, lr = 0.5)
    val w7 = LinearModel.lmsTrain(synthFeats(7), Seq("x1", "x2"), "y",
      iters = 3, lr = 0.5)
    assert(w1.length == 3)
    w1.zip(w7).foreach { case (a, b) =>
      assert(java.lang.Double.doubleToLongBits(a) ==
        java.lang.Double.doubleToLongBits(b), s"$a != $b")
    }
  }

  test("training separates the labeled classes on real documents") {
    val out = graft.SparkEntry.queries("quality_lr_score")(spark, sf)
      .groupBy("label_good").agg(avg("score").as("m"))
      .collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
    assert(out(1) > out(0) + 0.1,
      s"good-class mean score ${out(1)} not above low-class ${out(0)}")
  }

  test("weighted sample matches a window-function reference") {
    val agg = graft.SparkEntry.queries("sample_weighted")(spark, sf)
      .select("source", "rank", "doc_id").collect()
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2))).toSet
    // same keys ranked by a plain window — the aggregate must agree
    import graft.functions.TextFunctions._
    import org.apache.spark.sql.expressions.Window
    val wgt = size(words(col("text"))).cast("long")
    val uNum = pmod(fingerprint(col("text")), lit(999983L)) + lit(1L)
    val qlnDen = math.floor(math.log(999984.0) * 1e6).toLong
    val key = (floor(log(uNum.cast("double")) * lit(1e6)).cast("long") -
      lit(qlnDen)).cast("double") / wgt.cast("double")
    val ref = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("source"), col("doc_id"), key.as("k"))
      .withColumn("rank", row_number().over(Window.partitionBy("source")
        .orderBy(col("k").desc, col("doc_id").asc)))
      .filter(col("rank") <= 25)
      .select("source", "rank", "doc_id").collect()
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2))).toSet
    assert(agg == ref)
  }

  test("interval join plans as a bucket equi-join, not a nested loop") {
    val df = graft.SparkEntry.queries("j13_interval_join")(spark, sf)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan.take(2000))
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan.take(2000))
  }

  test("interval join matches the naive range join") {
    val got = graft.SparkEntry.queries("j13_interval_join")(spark, sf)
      .select("user_id", "session_id", "n_in_window").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // naive reference: windows × events filtered by the range predicate
    val e = spark.read.parquet(s"$sf/events.parquet")
      .select(unix_timestamp(col("ts")).as("t"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy("ts", "event_id")
    val sess = spark.read.parquet(s"$sf/events.parquet")
      .select(col("user_id"), col("ts"), col("event_id"),
        when(lag(col("ts"), 1).over(w).isNull ||
          unix_timestamp(col("ts")) -
            unix_timestamp(lag(col("ts"), 1).over(w)) > 1800, 1L)
          .otherwise(0L).as("ns"))
      .select(col("user_id"), col("ts"),
        sum(col("ns")).over(w.rowsBetween(Long.MinValue, 0))
          .as("session_id"))
      .groupBy("user_id", "session_id")
      .agg(unix_timestamp(min(col("ts"))).as("s_start"),
        unix_timestamp(max(col("ts"))).as("s_end"))
      .filter(col("user_id") < 40)
    val ref = sess.crossJoin(e)
      .filter(col("t") >= col("s_start") && col("t") <= col("s_end"))
      .groupBy("user_id", "session_id")
      .agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == ref)
  }
}
