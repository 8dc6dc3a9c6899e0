package graft

import org.scalatest.funsuite.AnyFunSuite

/** Smoke: every harness query runs at sf0.001 and yields rows (t1-style
  * guard — catches runtime regressions long before the driver's gate).
  */
class QueriesSmokeSpec extends AnyFunSuite {
  lazy val spark = GraftSpark.spark
  val sf = "/root/testdata/sf0.001"

  SparkEntry.queries.foreach { case (name, fn) =>
    test(s"$name runs and returns rows at sf0.001") {
      assert(fn(spark, sf).count() > 0)
    }
  }

  test("entry flagship returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every query has either an oracle or a documented rows-only check") {
    val noOracle = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    // q_kmeans alone stays rows-only: iterative distributed avg+round
    // per centroid dim is too rounding-boundary-fragile for a SQL oracle
    // (KMeansSpec asserts monotone inertia + stability instead).
    assert(noOracle == Set("q_kmeans"), noOracle)
  }
}
