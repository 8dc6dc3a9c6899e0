package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Cdc

/** Contracts for the CDC MERGE apply: every op, supersession
  * (latest-wins), delete-of-absent no-op, and determinism under
  * repartition.
  */
class CdcSpec extends AnyFunSuite {
  private lazy val spark = GraftSpark.spark
  import spark.implicits._

  private val snapshot = Seq(
    (1L, "a", 10.0), // untouched
    (2L, "b", 20.0), // updated
    (3L, "c", 30.0), // deleted
    (4L, "d", 40.0)  // updated then deleted (delete wins)
  ).toDF("k", "name", "bal")

  private val changes = Seq(
    (2L, 1L, "U", "b2", 21.0),
    (3L, 1L, "D", "c", 30.0),
    (4L, 1L, "U", "d2", 41.0),
    (4L, 2L, "D", "d2", 41.0),   // supersedes the update
    (5L, 1L, "I", "e", 50.0),    // insert
    (5L, 2L, "U", "e2", 51.0),   // then update the insert
    (9L, 1L, "D", "x", 0.0)      // delete of absent key: no-op
  ).toDF("k", "seq", "op", "name", "bal")

  test("merge applies inserts, updates, deletes with latest-wins per key") {
    val got = Cdc.applyChanges(snapshot, changes, "k")
      .orderBy("k").as[(Long, String, Double)].collect().toSeq
    assert(got == Seq((1L, "a", 10.0), (2L, "b2", 21.0), (5L, "e2", 51.0)))
  }

  test("result is invariant under repartition of both sides") {
    val a = Cdc.applyChanges(snapshot, changes, "k").orderBy("k").collect().toSeq
    val b = Cdc.applyChanges(snapshot.repartition(7), changes.repartition(5), "k")
      .orderBy("k").collect().toSeq
    assert(a == b)
  }

  test("empty change feed returns the snapshot unchanged") {
    val got = Cdc.applyChanges(snapshot, changes.filter(col("k") < 0), "k")
      .orderBy("k").as[(Long, String, Double)].collect().toSeq
    assert(got == Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0), (4L, "d", 40.0)))
  }

  test("latest-change pick plans as one aggregate, no sort window") {
    val plan = Cdc.applyChanges(snapshot, changes, "k")
      .queryExecution.optimizedPlan.toString
    assert(!plan.contains("Window"), plan)
  }
}
