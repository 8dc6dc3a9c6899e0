package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.SessionTimers

/** Event-time timer semantics (state API v2): sessions finalize exactly
  * once, when the watermark passes last_event + gap; state re-opens for
  * later events of the same key.
  */
class SessionTimersSpec extends AnyFunSuite {
  lazy val spark = GraftSpark.spark

  private def ts(min: Long) =
    new java.sql.Timestamp(1704103200000L + min * 60000L) // 2024-01-01 10:00 UTC + min

  test("sessions emit on watermark passing the gap timer, exactly once, then re-open") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    // multiple state variables + timers require the RocksDB provider
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try { runScenario(mem = MemoryStream[(Long, java.sql.Timestamp)]) }
    finally prev match {
      case Some(p) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
      case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    }
  }

  private def runScenario(mem: MemoryStream[(Long, java.sql.Timestamp)]): Unit = {
    val out = SessionTimers.finalizedSessions(
      mem.toDF().toDF("user_id", "ts"), gap = "30 minutes", watermarkDelay = "10 seconds")
    val q = out.toDF().toDF("user_id", "n_events", "duration_ms")
      .writeStream.outputMode("append").format("memory").queryName("sess_t").start()
    try {
      // open sessions: u1 two events 5 min apart, u2 one event
      mem.addData((1L, ts(0)), (1L, ts(5)), (2L, ts(0)))
      q.processAllAvailable()
      assert(spark.table("sess_t").count() == 0) // nothing closed yet

      // sentinel event far in the future advances the watermark past
      // both timers (u1 @ +35min, u2 @ +30min) -> both sessions emit
      mem.addData((9L, ts(120)))
      q.processAllAvailable()
      val round1 = spark.table("sess_t").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(round1.contains((1L, 2L, 300000L)), round1)
      assert(round1.contains((2L, 1L, 0L)), round1)

      // u1 re-opens a NEW session; advancing again emits it (1 event)
      // and the sentinel's own session, and must NOT re-emit round 1
      mem.addData((1L, ts(125)))
      q.processAllAvailable()
      mem.addData((8L, ts(300)))
      q.processAllAvailable()
      val all = spark.table("sess_t").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
      assert(all.count(r => r._1 == 1L && r._2 == 2L) == 1, all) // round-1 session once
      assert(all.contains((1L, 1L, 0L)), all)                    // re-opened session closed
      assert(all.contains((9L, 1L, 0L)), all)                    // sentinel's session closed
    } finally q.stop()
  }
}
