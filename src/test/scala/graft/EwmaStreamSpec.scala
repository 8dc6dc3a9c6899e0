package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

/** Streaming EWMA == the batch fixed-point fold over the same
  * per-batch series — the batch/stream parity the integral recurrence
  * buys.
  */
class EwmaStreamSpec extends AnyFunSuite {
  lazy val spark = GraftSpark.spark

  test("per-key streaming EWMA advances exactly like the batch recurrence") {
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      import spark.implicits._
      implicit val sqlCtx = spark.sqlContext
      val mem = MemoryStream[String]
      val q = graft.streaming.EwmaStream(mem.toDF().toDF("event_type"))
        .toDF("event_type", "x", "ewma_e6", "resid_e6")
        .writeStream.outputMode("update")
        .format("memory").queryName("ewma_out").start()
      try {
        // batch series per key: view -> 3, 5, 2 ; click -> 1, 4
        mem.addData("view", "view", "view", "click")
        q.processAllAvailable()
        mem.addData("view", "view", "view", "view", "view",
          "click", "click", "click", "click")
        q.processAllAvailable()
        mem.addData("view", "view")
        q.processAllAvailable()
        val rows = spark.table("ewma_out")
          .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
        // replay the recurrence by hand (truncating div, e6 scale)
        def step(prev: Long, x: Long): Long = prev + (x * 1000000L - prev) / 8L
        val v1 = 3L * 1000000L
        val v2 = step(v1, 5)
        val v3 = step(v2, 2)
        assert(rows(("view", 3L)) == v1)
        assert(rows(("view", 5L)) == v2)
        assert(rows(("view", 2L)) == v3)
        val c1 = 1L * 1000000L
        val c2 = step(c1, 4)
        assert(rows(("click", 1L)) == c1)
        assert(rows(("click", 4L)) == c2)
      } finally q.stop()
    } finally prev match {
      case Some(p) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
      case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    }
  }
}
