package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.AnomalyStream

/** Per-micro-batch robust-z volume monitoring: the streaming path must
  * produce the EXACT integer statistic the batch arithmetic gives, and
  * the monitor must flag a surge batch while passing a normal one.
  */
class AnomalyStreamSpec extends AnyFunSuite {
  lazy val spark = GraftSpark.spark

  // reference history: daily volumes 90..110 (21 periods)
  // med2 = 200, dev2 support = {0, 2, ..., 20} x2 => mad4 = 2*10 = 20
  private def refDF = {
    import spark.implicits._
    (90L to 110L).toDF("x")
  }

  private def z(x: Long): (Option[Long], Boolean) = {
    import spark.implicits._
    val r = AnomalyStream.robustZStatistic(Seq(x).toDF("x"), refDF).head()
    (if (r.isNullAt(1)) None else Some(r.getLong(1)), r.getBoolean(2))
  }

  test("batch statistic: exact z at e6, gate at 3.5 in integers") {
    // x = 100 (the median): dev2 = 0, z = 0, not an outlier
    assert(z(100L) == ((Some(0L), false)))
    // x = 105: dev2 = 10, z = 1349*10*1000/20 = 674500 (0.6745), pass
    assert(z(105L) == ((Some(674500L), false)))
    // x = 130: dev2 = 60, z = 1349*60*1000/20 = 4047000 (4.047) > 3.5
    assert(z(130L) == ((Some(4047000L), true)))
  }

  test("constant history: z is null (zero MAD), deviation still flags") {
    import spark.implicits._
    val const = Seq.fill(10)(100L).toDF("x")
    val same = AnomalyStream.robustZStatistic(Seq(100L).toDF("x"), const).head()
    assert(same.isNullAt(1) && !same.getBoolean(2), same)
    val off = AnomalyStream.robustZStatistic(Seq(101L).toDF("x"), const).head()
    assert(off.isNullAt(1) && off.getBoolean(2), off)
  }

  test("streaming monitor: per-batch z equals the batch computation, surge flags") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Long]
    val seen = scala.collection.mutable.Map[Long, (Long, Boolean)]()
    val q = AnomalyStream.volumeMonitor(mem.toDF(), refDF) { (id, res) =>
      res.collect().foreach(r => seen(id) = (r.getLong(1), r.getBoolean(2)))
    }
    try {
      mem.addData(1L to 100L: _*) // batch 0: volume 100 == median
      q.processAllAvailable()
      mem.addData(1L to 130L: _*) // batch 1: volume 130 — surge
      q.processAllAvailable()
      assert(seen(0L) == ((0L, false)), seen)
      assert(seen(1L) == ((4047000L, true)), seen)
    } finally q.stop()
  }
}
