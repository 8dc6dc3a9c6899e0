package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

/** P² streaming quantile: exact below 5 points, close to the true
  * median on scrambled input, constant state across batches.
  */
class QuantileStreamSpec extends AnyFunSuite {
  lazy val spark = GraftSpark.spark

  private def run(batches: Seq[Seq[(String, Double)]], name: String): Map[String, (Long, Double)] = {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(String, Double)]
    val q = graft.streaming.QuantileStream(
        mem.toDF().toDF("event_type", "value"))
      .toDF("event_type", "n", "est")
      .writeStream.outputMode("update")
      .format("memory").queryName(name).start()
    try {
      batches.foreach { b => mem.addData(b: _*); q.processAllAvailable() }
      // last emission per key (highest count wins)
      spark.table(name).collect()
        .groupBy(_.getString(0))
        .map { case (k, rs) =>
          val last = rs.maxBy(_.getLong(1))
          k -> (last.getLong(1), last.getDouble(2))
        }
    } finally q.stop()
  }

  test("below 5 points the estimate is the exact median of what arrived") {
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val out = run(Seq(Seq(("a", 7.0), ("a", 1.0), ("a", 9.0))), "p2_small")
      assert(out("a")._1 == 3L)
      assert(out("a")._2 == 7.0) // median of {1, 7, 9}
    } finally prev.foreach(
      spark.conf.set("spark.sql.streaming.stateStore.providerClass", _))
  }

  test("P² tracks the median within 5% of range on scrambled input, state constant") {
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      // deterministic scramble of 0..999 via a multiplicative hash, two
      // keys interleaved across three batches
      val vals = (0 until 1000).map(i => ((i * 2654435761L) % 1000).toDouble)
      val batches = vals.grouped(340).toSeq.map(_.flatMap(v =>
        Seq(("lat", v), ("size", v * 3 + 10))))
      val out = run(batches, "p2_big")
      val (nLat, estLat) = out("lat")
      assert(nLat == 1000L)
      // true median of the scrambled 0..999 permutation values ≈ 499.5
      assert(math.abs(estLat - 499.5) < 50.0, s"lat estimate $estLat")
      val (nSize, estSize) = out("size")
      assert(nSize == 1000L)
      assert(math.abs(estSize - (499.5 * 3 + 10)) < 150.0, s"size estimate $estSize")
    } finally prev.foreach(
      spark.conf.set("spark.sql.streaming.stateStore.providerClass", _))
  }
}
