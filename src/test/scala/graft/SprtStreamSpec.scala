package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

/** Streaming SPRT: crosses the right boundary, freezes at the
  * crossing, and ignores post-decision evidence (the sequential-test
  * contract). Constants match the batch q_sprt exactly. Rows carry a
  * seq and the processor folds each batch in seq order, so the frozen
  * state is replay-stable even when the shuffle delivers a mixed batch
  * out of order (the r10 ADVICE.md determinism gap).
  */
class SprtStreamSpec extends AnyFunSuite {
  lazy val spark = GraftSpark.spark

  private val La = 200670695L
  private val Lb = -50010421L
  private val Bound = 2944438979L

  private def run(batches: Seq[Seq[(String, Long, Boolean)]], name: String): Map[String, (Long, Long, Long, String, Long)] = {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val mem = MemoryStream[(String, Long, Boolean)]
    val q = graft.streaming.SprtStream(mem.toDF().toDF("key", "seq", "success"))
      .toDF("key", "n", "k", "llr_e9", "decision", "decided_at_n")
      .writeStream.outputMode("update")
      .format("memory").queryName(name).start()
    try {
      batches.foreach { b => mem.addData(b: _*); q.processAllAvailable() }
      spark.table(name).collect()
        .groupBy(_.getString(0))
        .map { case (key, rs) =>
          val last = rs.maxBy(_.getLong(1))
          key -> (last.getLong(1), last.getLong(2), last.getLong(3),
            last.getString(4), last.getLong(5))
        }
    } finally {
      q.stop()
      prev.foreach(
        spark.conf.set("spark.sql.streaming.stateStore.providerClass", _))
    }
  }

  test("a hot key crosses h1 exactly when the replayed LLR does, then freezes") {
    // all successes: each adds La; h1 needs ceil(Bound/La) = 15 trials
    val need = (Bound / La + 1).toInt
    assert(need == 15)
    val out = run(Seq(
      (1 to 10).map(i => ("hot", i.toLong, true)),
      (11 to 20).map(i => ("hot", i.toLong, true)),
      // post-decision evidence (failures) must be ignored
      (21 to 25).map(i => ("hot", i.toLong, false))), "sprt_hot")
    val (n, k, llr, dec, at) = out("hot")
    assert(dec == "h1")
    assert(at == 15L && n == 15L && k == 15L)
    assert(llr == 15L * La)
  }

  test("a cold key crosses h0; an ambiguous key keeps running") {
    // all failures: each adds Lb; h0 needs ceil(Bound/|Lb|) = 59 trials
    val needH0 = (Bound / -Lb + 1).toInt
    assert(needH0 == 59)
    val out = run(Seq(
      (1 to 40).map(i => ("cold", i.toLong, false)) ++
        Seq(("mid", 1L, true), ("mid", 2L, false)),
      (41 to 80).map(i => ("cold", i.toLong, false)) ++
        Seq(("mid", 3L, true), ("mid", 4L, false))),
      "sprt_cold")
    val (nc, _, llrC, decC, atC) = out("cold")
    assert(decC == "h0" && atC == 59L && nc == 59L)
    assert(llrC == 59L * Lb)
    val (nm, km, llrM, decM, atM) = out("mid")
    assert(decM == "continue" && atM == -1L && nm == 4L && km == 2L)
    assert(llrM == 2L * La + 2L * Lb)
  }

  test("mixed batch crossing mid-batch freezes by seq order, not arrival order") {
    // 14 successes then (seq order) 1 success at seq 15 followed by 5
    // failures: the boundary fires exactly at seq 15 regardless of the
    // shuffled order the batch is DELIVERED in. Frozen state must be
    // n=15, k=15, llr=15·La — arrival-order folding would stop at a
    // different (n, k) depending on where the failures land.
    val ordered = (1 to 15).map(i => ("mix", i.toLong, true)) ++
      (16 to 20).map(i => ("mix", i.toLong, false))
    val shuffled = new scala.util.Random(7).shuffle(ordered)
    val out = run(Seq(shuffled), "sprt_mix")
    val (n, k, llr, dec, at) = out("mix")
    assert(dec == "h1")
    assert(at == 15L && n == 15L && k == 15L)
    assert(llr == 15L * La)
  }
}
