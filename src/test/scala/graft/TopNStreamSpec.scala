package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

/** Incremental streaming Top-N: every micro-batch's emitted refresh
  * must equal the batch-replay oracle (top-k of all counts so far,
  * count desc / item asc), including displacement out of the buffer,
  * re-entry via a new delta, tie-breaks, and per-context independence
  * — the insert/retract parity the reference's continuous
  * `ORDER BY cnt DESC LIMIT 10` provides (LogAnalysis.java:184-185).
  */
class TopNStreamSpec extends AnyFunSuite {
  lazy val spark = GraftSpark.spark

  test("per-batch top-3 parity with batch replay across 4 micro-batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val mem = MemoryStream[(String, String, Long)]
    val q = graft.streaming.TopNStream(
        mem.toDF().toDF("ctx", "item", "delta"), k = 3)
      .toDF("ctx", "rank", "item", "cnt")
      .writeStream.outputMode("update")
      .format("memory").queryName("topn").start()

    val batches = Seq(
      Seq(("s", "a", 5L), ("s", "b", 3L), ("s", "c", 1L)),
      // d enters, c grows but is displaced from the top-3; a second
      // context proves keyed independence
      Seq(("s", "d", 4L), ("s", "c", 1L), ("t", "x", 2L)),
      // re-entry: c's own delta brings it back over everyone
      Seq(("s", "c", 10L)),
      // tie at 4: item asc puts b ahead of d
      Seq(("s", "b", 1L), ("s", "e", 2L)))

    val totals = scala.collection.mutable.Map.empty[(String, String), Long]
    var seen = 0
    try {
      batches.zipWithIndex.foreach { case (b, bi) =>
        mem.addData(b: _*); q.processAllAvailable()
        b.foreach { case (ctx, item, d) =>
          totals((ctx, item)) = totals.getOrElse((ctx, item), 0L) + d
        }
        val rows = spark.table("topn").collect()
        val fresh = rows.drop(seen); seen = rows.length
        val byCtx = fresh.groupBy(_.getString(0))
        val updatedCtxs = b.map(_._1).toSet
        assert(byCtx.keySet == updatedCtxs,
          s"batch $bi: only updated contexts emit (got ${byCtx.keySet})")
        updatedCtxs.foreach { ctx =>
          val got = byCtx(ctx).sortBy(_.getInt(1))
            .map(r => (r.getString(2), r.getLong(3))).toSeq
          val expect = totals.collect { case ((c, i), n) if c == ctx => (i, n) }
            .toSeq.sortBy { case (i, n) => (-n, i) }.take(3)
          assert(got == expect, s"batch $bi ctx $ctx: $got vs replay $expect")
          // the refresh is a FULL top-k with contiguous ranks
          assert(byCtx(ctx).map(_.getInt(1)).sorted.toSeq ==
            (1 to math.min(3, expect.size)).toSeq)
        }
      }
    } finally {
      q.stop()
      prev.foreach(
        spark.conf.set("spark.sql.streaming.stateStore.providerClass", _))
    }
  }

  test("retractions: floor-dropping decrements rebuild the top-k, across a checkpoint restart") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val ckpt = java.nio.file.Files.createTempDirectory("graft-topn-ret").toString
    val mem = MemoryStream[(String, String, Long)]
    // the memory sink refuses checkpoint recovery, so collect each
    // batch's refresh through foreachBatch (latest refresh per restart)
    val refreshes = new java.util.concurrent.ConcurrentLinkedQueue[Seq[(Int, String, Long)]]()
    def start() = graft.streaming.TopNStream(
        mem.toDF().toDF("ctx", "item", "delta"), k = 3)
      .toDF("ctx", "rank", "item", "cnt")
      .writeStream.outputMode("update")
      .option("checkpointLocation", ckpt)
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        val rows = df.collect()
          .map(r => (r.getInt(1), r.getString(2), r.getLong(3))).toSeq
        if (rows.nonEmpty) refreshes.add(rows)
        ()
      }.start()

    val totals = scala.collection.mutable.Map.empty[String, Long]
    def replayTop3: Seq[(String, Long)] =
      totals.toSeq.filter(_._2 > 0L).sortBy { case (i, n) => (-n, i) }.take(3)
    def lastRefresh: Seq[(String, Long)] = {
      var last: Seq[(Int, String, Long)] = Nil
      refreshes.forEach(r => last = r)
      last.sortBy(_._1).map { case (_, i, c) => (i, c) }
    }
    def feed(q: org.apache.spark.sql.streaming.StreamingQuery,
        batch: Seq[(String, Long)], label: String): Unit = {
      mem.addData(batch.map { case (i, d) => ("s", i, d) }: _*)
      q.processAllAvailable()
      batch.foreach { case (i, d) => totals(i) = totals.getOrElse(i, 0L) + d }
      assert(lastRefresh == replayTop3, s"$label: $lastRefresh vs $replayTop3")
    }

    val q1 = start()
    try {
      // seed with outsiders d, e below the buffer
      feed(q1, Seq(("a", 5L), ("b", 4L), ("c", 3L), ("d", 2L), ("e", 1L)), "seed")
      // the ADVICE/VERDICT case: a's decrement LOWERS the buffer floor —
      // candidates {b,c,a1} alone would rank a third; the rescan must
      // pull untouched outsider d=2 into rank 3
      feed(q1, Seq(("a", -4L)), "floor drop")
      assert(lastRefresh.map(_._1) == Seq("b", "c", "d"))
    } finally q1.stop()

    // restart from the checkpoint: the count map (incl. outsiders) and
    // buffer must be restored, and retractions must keep working
    val q2 = start()
    try {
      // b retracted to ZERO: removed from state; candidates shrink below
      // k → rescan fills from {c3,d2,a1,e1}; a beats e on the item tie
      feed(q2, Seq(("b", -4L)), "retract to zero after restart")
      assert(lastRefresh == Seq(("c", 3L), ("d", 2L), ("a", 1L)))
      // and the fast path still works post-restart
      feed(q2, Seq(("e", 3L)), "insert after restart")
      assert(lastRefresh.map(_._1) == Seq("e", "c", "d"))
    } finally {
      q2.stop()
      prev.foreach(
        spark.conf.set("spark.sql.streaming.stateStore.providerClass", _))
    }
  }
}
