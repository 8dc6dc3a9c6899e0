package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the Mahalanobis distance scale on known configurations —
  * regression for the r10 n⁴ inflation (ADVICE.md round 10): with
  * Ax=n·dx and C=n²·SS the n⁴ factors cancel, so the quadratic form
  * needs only the (n−1) sample-covariance factor.
  */
class MahalanobisSpec extends AnyFunSuite {
  lazy val spark = GraftSpark.spark

  test("4 corners of a square all have d2 = 1.5 exactly") {
    // Points (0,0),(0,2),(2,0),(2,2): mean (1,1), SS = 4·I, n=4 so
    // Σ = SS/3 and d² = (1+1)·3/4 = 1.5 for every corner. The r10 bug
    // returned 384 (= 1.5 · n⁴) here.
    import spark.implicits._
    val u = Seq((1L, 0L, 0L), (2L, 0L, 2L), (3L, 2L, 0L), (4L, 2L, 2L))
      .toDF("user_id", "x", "y")
    val rows = Queries.mahalanobisCore(u).collect()
    assert(rows.length == 4)
    rows.foreach { r =>
      assert(r.getAs[Long]("d2_e6") == 1500000L,
        s"user ${r.getAs[Long]("user_id")}: ${r.getAs[Long]("d2_e6")}")
      assert(!r.getAs[Boolean]("is_outlier"))
    }
    assert(rows.head.getAs[Long]("n_outliers") == 0L)
  }

  test("a genuine outlier crosses the chi2_2 99% threshold, inliers do not") {
    // Tight cluster near the diagonal plus one point far OFF the
    // correlation axis — the case per-axis z-scores miss.
    import spark.implicits._
    val cluster = (1L to 20L).map(i => (i, i % 5 + 10L, (i % 5) * 2 + 20L))
    val u = (cluster :+ ((21L, 24L, 0L))).toDF("user_id", "x", "y")
    val rows = Queries.mahalanobisCore(u).collect()
    val byUser = rows.map(r =>
      r.getAs[Long]("user_id") -> r.getAs[Boolean]("is_outlier")).toMap
    assert(byUser(21L), "off-axis point must be flagged")
    assert(rows.head.getAs[Long]("n_outliers") == 1L)
  }
}
