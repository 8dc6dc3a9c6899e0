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
        val rowsAfterBatch1 = spark.table("hh_out").count()
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
        // SpaceSaving guarantee: est >= true >= est - err
        assert(estB >= 4 && estB - errB <= 4, s"b: $estB/$errB")
        // bounded state: every batch emits its FULL live summary, so
        // each batch's emitted rows ARE the summary — assert both
        // batches stayed within k=3 rows for the single shard (the
        // changelog across batches may mention more distinct terms)
        assert(rowsAfterBatch1 <= 3, s"batch 1 summary: $rowsAfterBatch1 rows")
        val batch2Rows = spark.table("hh_out").count() - rowsAfterBatch1
        assert(batch2Rows <= 3, s"batch 2 summary: $batch2Rows rows")
        // and the full summary was live both times: batch 1's 3
        // distinct terms (a, b, c) exactly fill k=3; batch 2 lifts the
        // cumulative distinct count to 5, so ITS summary proves
        // eviction pressure kept the state at capacity
        assert(rowsAfterBatch1 == 3 && batch2Rows == 3)
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
