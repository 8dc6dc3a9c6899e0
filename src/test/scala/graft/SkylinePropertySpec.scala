package graft

import org.scalacheck.{Gen, Prop, Properties, Test}
import org.scalacheck.Prop.propBoolean

import graft.ops.Skyline

/** Property: the sharded local-then-merge skyline equals the brute
  * force dominance filter (keep x iff no y has y.p > x.p AND
  * y.dt > x.dt) — on random point sets drawn from SMALL integer grids,
  * so ties on either axis (the subtle cases for the level-window
  * formulation) occur constantly.
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

  private def brute(pts: List[(Long, Long, Long)]): Set[Long] =
    pts.filter { case (_, p, d) =>
      !pts.exists { case (_, p2, d2) => p2 > p && d2 > d }
    }.map(_._1).toSet

  property("sharded local-then-merge == brute-force dominance, ties included") =
    Prop.forAll(pointsGen) { pts =>
      pts.nonEmpty ==> {
        import spark.implicits._
        val df = pts.toDF("id", "p", "dt").withColumn(
          "shard", org.apache.spark.sql.functions.col("id") % 5)
        val got = Skyline.skyline(df, "shard")
          .select("id").collect().map(_.getLong(0)).toSet
        val want = brute(pts)
        if (got != want) println(s"pts=$pts\ngot=$got\nwant=$want")
        got == want
      }
    }
}
