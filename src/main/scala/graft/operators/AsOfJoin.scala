package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * As-of join: match each left row to the LATEST right row with
 * `right.ts` strictly before `left.ts` on the same key — the temporal
 * point-lookup a training-data pipeline needs to attribute an outcome
 * event to its most recent preceding cause (beyond-reference operator;
 * the reference's closest analog is the latest-prior-generation lookup
 * its result recorder performs per key).
 *
 * Spark-first shape: NOT an inequality join. Catalyst plans
 * `l.key = r.key AND r.ts < l.ts` + a per-key max as a shuffled range
 * join (or worse, a broadcast-nested-loop) and the per-key candidate
 * set is O(|L_key| x |R_key|). Instead both sides are tagged and
 * UNIONed, and one window over (key / order ts, side, tie) carries the
 * last-seen right payload forward: a single hash exchange on the key,
 * one sort, zero joins — the merge-as-you-scan plan a native engine
 * would pick, expressed declaratively.
 *
 * Semantics (deterministic):
 *  - strict: left rows sort BEFORE right rows at equal ts (`side` 0<1),
 *    and the frame ends at -1 preceding, so an equal-ts right row never
 *    matches.
 *  - ties among right rows at the same ts resolve to the LARGEST `tie`
 *    value (last in frame order).
 *  - no preceding right row -> null payload columns (left outer).
 */
object AsOfJoin {

  /** Left-outer as-of join. Returns every left row's columns plus each
    * `payload` column from the matched right row as `matched_<name>`. */
  def asOf(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      ts: String,
      tie: String,
      payload: Seq[String]): DataFrame = {
    val pStruct = struct(payload.map(col): _*)
    val pType = right.select(pStruct.as("_p")).schema("_p").dataType
    val lStruct = struct(left.columns.toSeq.map(col): _*)
    val lType = left.select(lStruct.as("_row")).schema("_row").dataType
    val l = left.select(
      keys.map(col) ++ Seq(
        col(ts).as("_ts"), col(tie).as("_tie"), lit(0).as("_side"),
        lStruct.as("_row"), lit(null).cast(pType).as("_p")): _*)
    val r = right.select(
      keys.map(col) ++ Seq(
        col(ts).as("_ts"), col(tie).as("_tie"), lit(1).as("_side"),
        lit(null).cast(lType).as("_row"), pStruct.as("_p")): _*)
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("_ts"), col("_side"), col("_tie"))
      .rowsBetween(Window.unboundedPreceding, -1)
    l.unionByName(r)
      .withColumn("_m", last(col("_p"), ignoreNulls = true).over(w))
      .where(col("_side") === 0)
      .select(col("_row.*") +:
        payload.map(p => col(s"_m.$p").as(s"matched_$p")): _*)
  }
}
