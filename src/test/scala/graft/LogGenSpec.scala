package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.logs.LogGen

class LogGenSpec extends AnyFunSuite {
  lazy val spark = GraftSpark.spark

  test("native renderer is byte-identical to the composed expression tree") {
    val sf = "/root/testdata/sf0.001"
    val fast = LogGen.logLines(spark, sf).select("event_id", "line")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val slow = LogGen.logLinesComposed(spark, sf).select("event_id", "line")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(fast.size == slow.size)
    slow.foreach { case (id, line) =>
      assert(fast(id) == line, s"event $id:\n fast=${fast(id)}\n slow=$line")
    }
  }
}
