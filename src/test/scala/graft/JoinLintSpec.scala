package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.Tables

/** Proves the JoinLint detector itself works: a deliberate data×data
  * cartesian is flagged, the certified bounded shapes (global
  * aggregate, limit shortlist, literal model) pass, and every
  * allowlist entry names a query that still exists. (Live-site
  * staleness over all queries is asserted at the end of
  * [[QueriesSmokeSpec]], which already constructs every plan.)
  */
class JoinLintSpec extends AnyFunSuite {
  lazy val spark = GraftSpark.spark
  val sf = "/root/testdata/sf0.001"

  test("a data-sized crossJoin build side is flagged") {
    val li = Tables.lineitem(spark, sf).select(col("l_orderkey"))
    val broken = li.crossJoin(broadcast(
      Tables.orders(spark, sf).select(col("o_orderkey"))))
    val sites = JoinLint.unboundedCrossSites(broken)
    assert(sites.nonEmpty, "orders-sized build side must be flagged")
    assert(sites.head.contains("unbounded build side"))
  }

  test("a two-sided unbounded cartesian is flagged") {
    val a = Tables.lineitem(spark, sf).select(col("l_orderkey"))
    val b = Tables.orders(spark, sf).select(col("o_orderkey"))
    spark.conf.set("spark.sql.crossJoin.enabled", "true")
    val broken = a.as("a").join(b.as("b"),
      expr("a.l_orderkey + b.o_orderkey > 0"))
    assert(JoinLint.unboundedCrossSites(broken).nonEmpty)
  }

  test("global-aggregate, limit, and literal-model build sides are certified") {
    import spark.implicits._
    val li = Tables.lineitem(spark, sf)
    val scalar = li.groupBy().agg(sum(col("l_quantity")).as("tot"))
    assert(JoinLint.unboundedCrossSites(li.crossJoin(broadcast(scalar))).isEmpty,
      "grouping-free aggregate = 1 row")
    val shortlist = li.orderBy(col("l_extendedprice").desc).limit(20)
      .select(col("l_partkey").as("top_part"))
    assert(JoinLint.unboundedCrossSites(li.crossJoin(broadcast(shortlist))).isEmpty,
      "TakeOrdered shortlist is bounded")
    val model = Seq((1, 0.5), (2, 0.7)).toDF("k", "w")
    assert(JoinLint.unboundedCrossSites(li.crossJoin(broadcast(model))).isEmpty,
      "driver-held literal model is bounded")
    // and a projection over a certified child stays certified
    val projected = scalar.select((col("tot") * 2).as("tot2"))
    assert(JoinLint.unboundedCrossSites(li.crossJoin(broadcast(projected))).isEmpty)
  }

  test("an explode over a global aggregate is NOT certified bounded") {
    // the r11 ADVICE case: collect_list over a grouping-free aggregate
    // is 1 row, but exploding it back out re-admits |data| rows — a
    // row-EXPANDING node must void the child's bound
    val li = Tables.lineitem(spark, sf)
    val blown = li.groupBy().agg(collect_list(col("l_orderkey")).as("ks"))
      .select(explode(col("ks")).as("k"))
    val sites = JoinLint.unboundedCrossSites(li.crossJoin(broadcast(blown)))
    assert(sites.nonEmpty,
      "explode(collect_list) over a global agg must NOT be certified bounded")
  }

  test("equi-joins are never flagged (only BNLJ/cartesian are in scope)") {
    val li = Tables.lineitem(spark, sf)
    val o = Tables.orders(spark, sf)
    val joined = li.join(o, li("l_orderkey") === o("o_orderkey"))
    assert(JoinLint.unboundedCrossSites(joined).isEmpty)
  }

  test("allowlist entries reference existing queries") {
    val orphans = JoinLint.allowedCross.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty, s"allowlist names unknown queries: $orphans")
    // and every entry actually states a bound, not a placeholder
    JoinLint.allowedCross.foreach { case (k, v) =>
      assert(v.length > 10, s"$k: bound statement too short to be meaningful")
    }
  }
}
