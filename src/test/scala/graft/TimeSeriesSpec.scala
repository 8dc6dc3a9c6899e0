package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.TimeSeries

class TimeSeriesSpec extends AnyFunSuite {
  lazy val spark = GraftSpark.spark

  def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("asOfJoin: latest right at-or-before, ties by max order, null when no prior") {
    import spark.implicits._
    val left = Seq(
      (100L, 1L, ts("2024-01-01 00:10:00")),
      (101L, 1L, ts("2024-01-01 00:00:00")), // before every right row
      (102L, 2L, ts("2024-01-01 00:05:00"))
    ).toDF("event_id", "user_id", "ts")
    val right = Seq(
      (10L, 1L, ts("2024-01-01 00:05:00")),
      (11L, 1L, ts("2024-01-01 00:10:00")), // equal ts as left 100 -> inclusive match
      (12L, 1L, ts("2024-01-01 00:10:00")), // same ts, higher id wins the tie
      (20L, 2L, ts("2024-01-01 00:04:00"))
    ).toDF("event_id", "user_id", "ts")
    val out = TimeSeries.asOfJoin(left, right, "user_id", "ts", "event_id", Seq("event_id"))
      .select($"event_id", $"_asof.event_id".as("matched"))
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) -1L else r.getLong(1))).toMap
    assert(out(100L) == 12L) // inclusive <=, tie -> max order col
    assert(out(101L) == -1L) // nothing at or before
    assert(out(102L) == 20L)
  }

  test("sessionize: gap boundary is inclusive (exactly gap stays in session)") {
    import spark.implicits._
    val ev = Seq(
      (1L, 1L, ts("2024-01-01 00:00:00")),
      (2L, 1L, ts("2024-01-01 00:30:00")), // exactly 1800s later -> same session
      (3L, 1L, ts("2024-01-01 01:00:01"))  // 1801s later -> new session
    ).toDF("event_id", "user_id", "ts")
    val s = TimeSeries.sessionize(ev, "user_id", "ts", "event_id", 1800)
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(4)))
    assert(s.toSet == Set((1L, 2L, 1800L), (2L, 1L, 0L)))
  }
}
