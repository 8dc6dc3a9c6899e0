package graft

import org.scalacheck.{Gen, Prop, Properties, Test}

import graft.ops.TimeSeries

/** Property: TimeSeries.asOfJoin equals a brute-force in-memory as-of
  * (latest right with ts <= left ts per key, ties by max order col),
  * across random small datasets with heavy timestamp collisions.
  */
object AsOfPropertySpec extends Properties("AsOfJoin") {
  lazy val spark = GraftSpark.spark

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(10)

  // few keys + coarse timestamps -> lots of equal-ts ties
  val rowGen = for {
    key <- Gen.choose(0L, 3L)
    sec <- Gen.choose(0L, 20L)
  } yield (key, new java.sql.Timestamp(1700000000000L + sec * 1000))

  val dataGen = for {
    left <- Gen.listOfN(15, rowGen)
    right <- Gen.listOfN(15, rowGen)
  } yield (left.zipWithIndex.map { case ((k, t), i) => (i.toLong, k, t) },
    right.zipWithIndex.map { case ((k, t), i) => (100L + i, k, t) })

  property("matchesBruteForce") = Prop.forAll(dataGen) { case (l, r) =>
    import spark.implicits._
    val left = l.toDF("event_id", "user_id", "ts")
    val right = r.toDF("event_id", "user_id", "ts")
    val got = TimeSeries.asOfJoin(left, right, "user_id", "ts", "event_id", Seq("event_id"))
      .selectExpr("event_id", "_asof.event_id AS m")
      .collect().map(x => x.getLong(0) -> (if (x.isNullAt(1)) None else Some(x.getLong(1)))).toMap
    val expected = l.map { case (id, k, t) =>
      val cands = r.filter { case (_, rk, rt) => rk == k && !rt.after(t) }
      id -> (if (cands.isEmpty) None
             else Some(cands.maxBy { case (rid, _, rt) => (rt.getTime, rid) }._1))
    }.toMap
    got == expected
  }

  /** The skew-resistant bucketed form must agree with the brute force
    * for ANY bucket width — including widths of 1-3s that force nearly
    * every match through the carry-in path, and widths larger than the
    * whole time range (degenerating to one bucket per key).
    */
  property("bucketedMatchesBruteForce") = Prop.forAll(
    dataGen, Gen.oneOf(1L, 2L, 3L, 7L, 1000L)) { case ((l, r), width) =>
    import spark.implicits._
    val left = l.toDF("event_id", "user_id", "ts")
    val right = r.toDF("event_id", "user_id", "ts")
    val got = TimeSeries.asOfJoinBucketed(
        left, right, "user_id", "ts", "event_id", Seq("event_id"), width)
      .selectExpr("event_id", "_asof.event_id AS m")
      .collect().map(x => x.getLong(0) -> (if (x.isNullAt(1)) None else Some(x.getLong(1)))).toMap
    val expected = l.map { case (id, k, t) =>
      val cands = r.filter { case (_, rk, rt) => rk == k && !rt.after(t) }
      id -> (if (cands.isEmpty) None
             else Some(cands.maxBy { case (rid, _, rt) => (rt.getTime, rid) }._1))
    }.toMap
    got == expected
  }

  /** The custom planner operator (AsOfJoinExec sorted merge) must agree
    * with the brute force — and therefore with the composed union/window
    * form — on the same tie-heavy random inputs.
    */
  property("nativeMatchesBruteForce") = Prop.forAll(dataGen) { case (l, r) =>
    import spark.implicits._
    val left = l.toDF("event_id", "user_id", "ts")
    val right = r.toDF("r_id", "r_user", "r_ts")
    val got = TimeSeries.asOfJoinNative(left, right,
        "user_id", "r_user", "ts", "r_ts", "r_id")
      .selectExpr("event_id", "r_id AS m")
      .collect().map(x => x.getLong(0) -> (if (x.isNullAt(1)) None else Some(x.getLong(1)))).toMap
    val expected = l.map { case (id, k, t) =>
      val cands = r.filter { case (_, rk, rt) => rk == k && !rt.after(t) }
      id -> (if (cands.isEmpty) None
             else Some(cands.maxBy { case (rid, _, rt) => (rt.getTime, rid) }._1))
    }.toMap
    got == expected
  }
}
