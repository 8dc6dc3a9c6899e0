package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.DriftStream

/** Per-micro-batch KS drift monitoring: the streaming path must
  * produce the EXACT statistic the batch computation gives on the same
  * rows, and the monitor must separate an in-distribution batch from a
  * shifted one by a wide integer margin.
  */
class DriftStreamSpec extends AnyFunSuite {
  lazy val spark = GraftSpark.spark

  // reference: 100 observations uniform on 0..99
  private def refDF = {
    import spark.implicits._
    (0L until 100L).toDF("v")
  }

  private def ks(sample: Seq[Long]): (Long, Long, Long, Option[Long]) = {
    import spark.implicits._
    val r = DriftStream.ksStatistic(sample.toDF("v"), refDF).head()
    (r.getLong(0), r.getLong(1), r.getLong(2),
      if (r.isNullAt(3)) None else Some(r.getLong(3)))
  }

  test("batch statistic: identical distribution scores 0, disjoint shift scores 1e6") {
    val same = ks((0L until 100L))
    assert(same == ((100L, 100L, 0L, Some(0L))), same)
    val shifted = ks((1000L until 1100L))
    assert(shifted._4.contains(1000000L), shifted) // sup|F| = 1 at full shift
  }

  test("batch statistic: an empty sample is reported null, not a division error") {
    val empty = ks(Seq.empty)
    assert(empty._1 == 0L && empty._4.isEmpty, empty)
  }

  test("streaming monitor: per-batch KS equals the batch computation, drift flags the shifted batch") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Long]
    val seen = scala.collection.mutable.Map[Long, Long]()
    val q = DriftStream.ksMonitor(mem.toDF().toDF("v"), refDF) { (id, res) =>
      res.collect().foreach(r => seen(id) = r.getLong(3))
    }
    try {
      mem.addData(0L until 100L: _*) // in-distribution
      q.processAllAvailable()
      mem.addData(500L until 600L: _*) // fully shifted
      q.processAllAvailable()
      assert(seen(0L) == 0L, seen)
      assert(seen(1L) == 1000000L, seen)
    } finally q.stop()
  }
}
