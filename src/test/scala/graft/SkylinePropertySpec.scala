package graft

import org.scalacheck.{Gen, Prop, Properties, Test}
import org.scalacheck.Prop.propBoolean

import graft.ops.Skyline

/** Property: the sharded local-then-merge skyline equals the brute
  * force dominance filter (keep x iff no y has y.p > x.p AND
  * y.dt > x.dt) — on random point sets drawn from SMALL integer grids,
  * so ties on either axis (the subtle cases for the level-window
  * formulation) occur constantly. The merge is exercised on BOTH gate
  * paths: the default single bucket, and the range-bucketed pass
  * forced via -Dgraft.skyline.mergeLocalMax (including the
  * anti-correlated adversarial shape where the skyline is O(n) and
  * every bucket boundary carries cross-bucket dominance state).
  */
object SkylinePropertySpec extends Properties("Skyline") {
  lazy val spark = GraftSpark.spark

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(10)

  val pointsGen: Gen[List[(Long, Long, Long)]] = for {
    n <- Gen.choose(1, 120)
    pts <- Gen.listOfN(n, for {
      p <- Gen.choose(0, 12)
      d <- Gen.choose(0, 12)
    } yield (p.toLong, d.toLong))
  } yield pts.zipWithIndex.map { case ((p, d), i) => (i.toLong, p, d) }

  /** Anti-correlated worst case: a full p+dt=C diagonal (EVERY point is
    * on the skyline — local passes prune nothing) plus random points
    * under it (dominated across bucket boundaries).
    */
  val antiGen: Gen[List[(Long, Long, Long)]] = for {
    n <- Gen.choose(20, 80)
    extra <- Gen.listOfN(n / 2, for {
      p <- Gen.choose(0, n - 1)
      d <- Gen.choose(0, n - 1)
    } yield (p.toLong, d.toLong))
  } yield {
    val diag = (0 until n).map(i => (i.toLong, (n - 1 - i).toLong))
    (diag ++ extra).zipWithIndex.map { case ((p, d), i) => (i.toLong, p, d) }.toList
  }

  private def brute(pts: List[(Long, Long, Long)]): Set[Long] =
    pts.filter { case (_, p, d) =>
      !pts.exists { case (_, p2, d2) => p2 > p && d2 > d }
    }.map(_._1).toSet

  private def run(pts: List[(Long, Long, Long)]): Boolean = {
    import spark.implicits._
    val df = pts.toDF("id", "p", "dt").withColumn(
      "shard", org.apache.spark.sql.functions.col("id") % 5)
    val got = Skyline.skyline(df, "shard")
      .select("id").collect().map(_.getLong(0)).toSet
    val want = brute(pts)
    if (got != want) println(s"pts=$pts\ngot=$got\nwant=$want")
    got == want
  }

  /** Forked tests run suites sequentially, so the sys.props mutation is
    * race-free (the PlanSpec triangle-gate pattern); restored in finally.
    */
  private def forcingBuckets[T](body: => T): T = {
    sys.props("graft.skyline.mergeLocalMax") = "4"
    sys.props("graft.skyline.mergeBuckets") = "4"
    try body
    finally {
      sys.props -= "graft.skyline.mergeLocalMax"
      sys.props -= "graft.skyline.mergeBuckets"
    }
  }

  property("sharded local-then-merge == brute-force dominance, ties included") =
    Prop.forAll(pointsGen) { pts => pts.nonEmpty ==> run(pts) }

  property("range-bucketed merge (gate forced) == brute force on tied grids") =
    Prop.forAll(pointsGen) { pts => pts.nonEmpty ==> forcingBuckets(run(pts)) }

  property("range-bucketed merge survives the anti-correlated O(n)-skyline shape") =
    Prop.forAll(antiGen) { pts => pts.nonEmpty ==> forcingBuckets(run(pts)) }
}
