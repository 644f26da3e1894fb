package graft.operators

import graft.SparkSpec
import java.sql.Timestamp

class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: Long) = new Timestamp(s * 1000L)

  // left: (id, key, ts); right: (key, ts, id)
  private lazy val left = Seq(
    (100L, 1L, ts(50)), // matches r3 (latest prior at t=30)
    (101L, 1L, ts(10)), // no prior right row -> null
    (102L, 1L, ts(30)), // equal-ts right rows must NOT match (strict)
    (103L, 2L, ts(99)), // other key: only r9 is visible
    (104L, 3L, ts(5))   // key with no right rows at all
  ).toDF("event_id", "user_id", "ts")

  private lazy val right = Seq(
    (1L, ts(20), 7L),
    (1L, ts(30), 8L),  // same ts as left 102 -> excluded for 102
    (1L, ts(30), 9L),  // tie with id 8 at t=30: larger tie wins for 100
    (2L, ts(98), 10L),
    (2L, ts(100), 11L) // after left 103 -> never matches
  ).toDF("user_id", "ts", "event_id")

  private lazy val result = AsOfJoin.asOf(
    left, right, keys = Seq("user_id"), ts = "ts", tie = "event_id",
    payload = Seq("event_id", "ts"))
    .select("event_id", "matched_event_id")
    .as[(Long, Option[Long])].collect().toMap

  test("matches the latest strictly-prior right row per key") {
    assert(result(100L) === Some(9L)) // t=30 rows precede t=50; tie -> 9
    assert(result(103L) === Some(10L))
  }

  test("strict: an equal-ts right row does not match") {
    assert(result(102L) === Some(7L)) // only t=20 is strictly prior
  }

  test("left outer: no prior right row yields null payload") {
    assert(result(101L) === None)
    assert(result(104L) === None)
  }

  test("left row count is preserved (exactly one output row per left row)") {
    val out = AsOfJoin.asOf(left, right, Seq("user_id"), "ts", "event_id",
      Seq("event_id"))
    assert(out.count() === left.count())
  }
}
