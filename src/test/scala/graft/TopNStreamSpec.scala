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
}
