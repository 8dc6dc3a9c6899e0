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

  test("asOfJoin rejects inputs whose columns collide with reserved helper names") {
    import spark.implicits._
    val left = Seq((1L, ts("2024-01-01 00:00:00"), "oops"))
      .toDF("user_id", "ts", "_tag") // would be silently replaced by withColumn
    val right = Seq((1L, ts("2024-01-01 00:00:00"), 1L))
      .toDF("user_id", "ts", "event_id")
    val ex = intercept[IllegalArgumentException] {
      TimeSeries.asOfJoin(left, right, "user_id", "ts", "event_id", Seq("event_id"))
    }
    assert(ex.getMessage.contains("_tag"))
    val ex2 = intercept[IllegalArgumentException] {
      TimeSeries.asOfJoinBucketed(left, right, "user_id", "ts", "event_id", Seq("event_id"), 60L)
    }
    assert(ex2.getMessage.contains("_tag"))
  }

  test("asOfJoinBucketed: carry-in spans empty buckets; in-bucket ties unchanged") {
    import spark.implicits._
    // 60s buckets; the right rows for user 1 sit 3+ buckets before the
    // later left rows, with empty buckets in between — only the carry-in
    // path can match them.
    val left = Seq(
      (100L, 1L, ts("2024-01-01 00:10:05")), // buckets after both right rows
      (101L, 1L, ts("2024-01-01 00:00:30")), // same bucket as right 10/11, after them
      (102L, 1L, ts("2024-01-01 00:00:10")), // same bucket, before every right row
      (103L, 2L, ts("2024-01-01 05:00:00"))  // right row far in the past
    ).toDF("event_id", "user_id", "ts")
    val right = Seq(
      (10L, 1L, ts("2024-01-01 00:00:20")),
      (11L, 1L, ts("2024-01-01 00:00:20")), // same ts, higher id wins the tie
      (12L, 1L, ts("2024-01-01 00:02:00")), // latest before left 100
      (20L, 2L, ts("2024-01-01 00:00:00"))
    ).toDF("event_id", "user_id", "ts")
    val out = TimeSeries.asOfJoinBucketed(
        left, right, "user_id", "ts", "event_id", Seq("event_id"), bucketSeconds = 60)
      .select($"event_id", $"_asof.event_id".as("matched"))
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) -1L else r.getLong(1))).toMap
    assert(out == Map(100L -> 12L, 101L -> 11L, 102L -> -1L, 103L -> 20L))
  }

  test("asOfJoinBucketed matches asOfJoin row-for-row on events data") {
    import org.apache.spark.sql.functions._
    val ev = graft.sources.Tables.events(spark, "/root/testdata/sf0.001")
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"))
    val views = ev.filter(col("event_type") === "view")
      .select(col("event_id"), col("user_id"), col("ts"))
    def shape(df: org.apache.spark.sql.DataFrame) = df
      .select(col("event_id"), col("user_id"), col("_asof.event_id").as("m"))
      .collect().map(r => (r.getLong(0), r.getLong(1), if (r.isNullAt(2)) -1L else r.getLong(2)))
      .toSet
    val base = shape(TimeSeries.asOfJoin(
      purchases, views, "user_id", "ts", "event_id", Seq("event_id")))
    // bucket narrow enough that real matches cross bucket boundaries
    val bucketed = shape(TimeSeries.asOfJoinBucketed(
      purchases, views, "user_id", "ts", "event_id", Seq("event_id"), bucketSeconds = 3600))
    assert(bucketed == base)
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

  test("mergeIntervals: touching closes, long interval bridges, gap splits") {
    import spark.implicits._
    // pad=10: [0,10) [10,20) touch-at-boundary -> s == prev_max merges;
    // [30,40) then 35 inside -> bridged; 55 starts after 45 -> new island
    val rows = Seq(
      (1L, 0L), (2L, 10L),  // island 1 (s=10 == prev_max 10 -> merge)
      (3L, 30L), (4L, 35L), // island 2 ([30,40) bridges 35)
      (5L, 55L),            // island 3 (55 > 45)
      (6L, 1000L)           // other key, own island
    ).map { case (id, s) => (if (id == 6L) 9L else 7L, id, s) }
      .toDF("k", "event_id", "s")
    val out = TimeSeries.mergeIntervals(rows, "k", "s", "event_id", 10L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toSet
    assert(out == Set(
      (7L, 1L, 0L, 20L, 2L),
      (7L, 2L, 30L, 45L, 2L),
      (7L, 3L, 55L, 65L, 1L),
      (9L, 1L, 1000L, 1010L, 1L)), out)
  }

  test("mergeIntervals islands are invariant to input partitioning") {
    import spark.implicits._
    val rows = (1L to 200L).map(i => (i % 5, i, (i * 37) % 900)).toDF("k", "event_id", "s")
    def shape(parts: Int) =
      TimeSeries.mergeIntervals(rows.repartition(parts), "k", "s", "event_id", 25L)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
        .toSet
    assert(shape(1) == shape(13))
  }
}
