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

  test("EWMA state recovers across stop/restart from checkpoint (no level reset)") {
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val ckptDir = java.nio.file.Files.createTempDirectory("graft_ewma_ckpt")
    try {
      import spark.implicits._
      implicit val sqlCtx = spark.sqlContext
      val mem = MemoryStream[String]
      val seen = new java.util.concurrent.ConcurrentHashMap[(String, Long), Long]()
      def startQuery() = graft.streaming.EwmaStream(mem.toDF().toDF("event_type"))
        .toDF("event_type", "x", "ewma_e6", "resid_e6")
        .writeStream.outputMode("update")
        .option("checkpointLocation", ckptDir.toString)
        .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
          df.collect().foreach(r =>
            seen.put((r.getString(0), r.getLong(1)), r.getLong(2)))
        }.start()
      // run 1: view count 3 -> level 3e6
      val q1 = startQuery()
      try { mem.addData("view", "view", "view"); q1.processAllAvailable() }
      finally q1.stop()
      assert(seen.get(("view", 3L)) == 3000000L)
      // run 2, SAME checkpoint: count 5 must CONTINUE the recurrence
      // (3e6 + (5e6-3e6) div 8), not restart at 5e6
      val q2 = startQuery()
      try { mem.addData("view", "view", "view", "view", "view"); q2.processAllAvailable() }
      finally q2.stop()
      assert(seen.get(("view", 5L)) == 3000000L + (5000000L - 3000000L) / 8L,
        seen.toString)
    } finally {
      prev match {
        case Some(p) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
      try {
        val walk = java.nio.file.Files.walk(ckptDir)
        try {
          import scala.jdk.CollectionConverters._
          walk.iterator().asScala.toSeq.reverse.foreach { p =>
            try java.nio.file.Files.deleteIfExists(p) catch { case _: java.io.IOException => () }
          }
        } finally walk.close()
      } catch { case _: java.io.IOException => () }
    }
  }
}
