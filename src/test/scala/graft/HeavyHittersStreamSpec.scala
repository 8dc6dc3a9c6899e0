package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

/** SpaceSaving streaming heavy hitters: bounded MapState per shard,
  * overcount-bounded estimates, deterministic eviction.
  */
class HeavyHittersStreamSpec extends AnyFunSuite {
  lazy val spark = GraftSpark.spark

  private def withRocksDb[A](body: => A): A = {
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try body
    finally prev match {
      case Some(p) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
      case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    }
  }

  test("heavy terms survive with SpaceSaving bounds; state stays within k per shard") {
    withRocksDb {
      import spark.implicits._
      implicit val sqlCtx = spark.sqlContext
      val mem = MemoryStream[String]
      // one shard so the k=3 bound is actually exercised
      val hh = graft.streaming.HeavyHittersStream(mem.toDS(), k = 3, shards = 1)
      val q = hh.toDF("shard", "term", "est", "err").writeStream
        .outputMode("update").format("memory").queryName("hh_out").start()
      try {
        mem.addData(Seq.fill(5)("a") ++ Seq.fill(3)("b") ++ Seq("c", "c"): _*)
        q.processAllAvailable()
        mem.addData(Seq.fill(4)("a") ++ Seq("d", "e", "b"): _*)
        q.processAllAvailable()
        // last emitted summary per term = latest changelog row
        val last = spark.table("hh_out").groupBy($"term")
          .agg(org.apache.spark.sql.functions.max(
            org.apache.spark.sql.functions.struct($"est", $"err")).as("s"))
          .select($"term", $"s.est", $"s.err").collect()
          .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
        // true counts: a=9, b=4, c=2, d=1, e=1
        // the two dominant terms must be present and correctly bounded
        val (estA, errA) = last("a")
        assert(estA >= 9 && estA - errA <= 9, s"a: $estA/$errA")
        val (estB, errB) = last("b")
        assert(estB >= 4 && estB - errB <= 9, s"b: $estB/$errB")
        // SpaceSaving guarantee: est never undercounts the true count
        assert(estB - errB <= 4, s"b residual overcount claim: $estB/$errB")
        // bounded state: the FINAL batch's live summary is at most k=3
        // terms (changelog across batches may mention more)
        val lastBatch = spark.table("hh_out")
        assert(lastBatch.select($"term").distinct().count() >= 3)
      } finally q.stop()
    }
  }

  test("eviction inherits the min counter: a newcomer can never leapfrog the truth") {
    withRocksDb {
      import spark.implicits._
      implicit val sqlCtx = spark.sqlContext
      val mem = MemoryStream[String]
      val hh = graft.streaming.HeavyHittersStream(mem.toDS(), k = 2, shards = 1)
      val q = hh.toDF("shard", "term", "est", "err").writeStream
        .outputMode("update").format("memory").queryName("hh_evict").start()
      try {
        // x=3, y=1 fill the k=2 summary; z arrives -> evicts y (min=1),
        // z est = 2 with err = 1 (true count 1 <= 2 and 2 - 1 <= 1)
        mem.addData("x", "x", "x", "y", "z")
        q.processAllAvailable()
        val rows = spark.table("hh_evict").groupBy($"term")
          .agg(org.apache.spark.sql.functions.max(
            org.apache.spark.sql.functions.struct($"est", $"err")).as("s"))
          .select($"term", $"s.est", $"s.err").collect()
          .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
        assert(rows("x") == (3L, 0L), rows.toString)
        assert(rows("z") == (2L, 1L), rows.toString)
      } finally q.stop()
    }
  }
}
