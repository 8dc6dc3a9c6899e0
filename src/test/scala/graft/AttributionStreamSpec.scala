package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.AttributionStream

/** Stateful last-touch attribution: 8-bytes-per-user state, purchases
  * emitted with their attributed click across micro-batches, in-batch
  * disorder healed by the per-user event-time sort.
  */
class AttributionStreamSpec extends AnyFunSuite {
  lazy val spark = GraftSpark.spark

  test("attributes across batches, keeps one-long state, heals in-batch disorder") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Long, String, Long)]
    val q = AttributionStream.lastTouch(
        mem.toDF().toDF("user_id", "event_id", "event_type", "us"))
      .writeStream.outputMode("append").format("memory").queryName("attr").start()
    try {
      // batch 1: organic purchase first, then click -> purchase;
      // user 2 arrives OUT OF ORDER inside the batch
      mem.addData(
        (1L, 1L, "purchase", 5L), (1L, 2L, "click", 10L), (1L, 3L, "purchase", 20L),
        (2L, 5L, "purchase", 20L), (2L, 4L, "click", 15L))
      q.processAllAvailable()
      // batch 2: user 1's state (click@10) attributes a later purchase
      mem.addData((1L, 6L, "purchase", 30L), (1L, 7L, "click", 40L),
        (1L, 8L, "purchase", 50L))
      q.processAllAvailable()
      val got = spark.table("attr")
        .select("event_id", "click_us", "lag_us")
        .collect().map(r => (r.getLong(0),
          if (r.isNullAt(1)) None else Some(r.getLong(1)),
          if (r.isNullAt(2)) None else Some(r.getLong(2)))).toSet
      assert(got == Set(
        (1L, None, None),                 // organic
        (3L, Some(10L), Some(10L)),       // in-batch click
        (5L, Some(15L), Some(5L)),        // disorder healed by sort
        (6L, Some(10L), Some(20L)),       // state across batches
        (8L, Some(40L), Some(10L))),      // newer click supersedes
        got)
    } finally q.stop()
  }
}
