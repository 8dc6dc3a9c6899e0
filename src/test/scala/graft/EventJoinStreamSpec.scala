package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.EventJoinStream

/** Stream-stream interval join semantics: same-user purchases within
  * the gap window match, outside-gap and cross-user purchases do not,
  * and the physical plan is the symmetric stateful join (bounded state),
  * not a static join.
  */
class EventJoinStreamSpec extends AnyFunSuite {
  lazy val spark = GraftSpark.spark

  private def t(sec: Long) = new Timestamp(sec * 1000L)

  test("views match same-user purchases inside the gap; outside-gap and cross-user do not") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val views = MemoryStream[(Long, Timestamp)]
    val buys = MemoryStream[(Long, Timestamp, Double)]
    val joined = EventJoinStream.viewToPurchase(
      views.toDF().toDF("user_id", "ts"),
      buys.toDF().toDF("user_id", "ts", "value"),
      maxGapSec = 600)
    val q = joined.writeStream.format("memory").queryName("ej").outputMode("append").start()
    try {
      views.addData((1L, t(1000)), (2L, t(1000)))
      buys.addData(
        (1L, t(1100), 9.5),   // inside gap, same user -> match
        (1L, t(2000), 3.0),   // 1000s after the view -> outside gap
        (3L, t(1100), 7.0))   // no view for user 3
      q.processAllAvailable()
      val rows = spark.sql("SELECT user_id, value FROM ej ORDER BY user_id")
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
      assert(rows == Seq((1L, 9.5)), rows)
      // second round: the other stream side arrives later, still matches
      buys.addData((2L, t(1500), 4.25))
      q.processAllAvailable()
      val rows2 = spark.sql("SELECT user_id, value FROM ej ORDER BY user_id")
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
      assert(rows2 == Seq((1L, 9.5), (2L, 4.25)), rows2)
    } finally q.stop()
  }

  test("the plan is a symmetric stateful stream-stream join, state bounded by watermarks") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val views = MemoryStream[(Long, Timestamp)]
    val buys = MemoryStream[(Long, Timestamp, Double)]
    val joined = EventJoinStream.viewToPurchase(
      views.toDF().toDF("user_id", "ts"),
      buys.toDF().toDF("user_id", "ts", "value"))
    val q = joined.writeStream.format("memory").queryName("ejplan").outputMode("append").start()
    try {
      views.addData((1L, t(100)))
      buys.addData((1L, t(150), 1.0))
      q.processAllAvailable()
      // public progress API: the stateful operator is the symmetric
      // stream-stream join, and its buffered state is row-bounded
      val ops = q.lastProgress.stateOperators
      assert(ops.nonEmpty, q.lastProgress.prettyJson)
      assert(ops.exists(_.operatorName.toLowerCase.contains("symmetrichashjoin")),
        ops.map(_.operatorName).mkString(","))
      assert(ops.map(_.numRowsTotal).sum <= 4, q.lastProgress.prettyJson)
    } finally q.stop()
  }
}
