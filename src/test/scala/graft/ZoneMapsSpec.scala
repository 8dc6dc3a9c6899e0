package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.ZoneMaps

/** The zone-map safety contract: pruning is conservative — a skipped
  * shard provably contains no matching row; every matching row lives in
  * a kept shard.
  */
class ZoneMapsSpec extends AnyFunSuite {
  private lazy val spark = GraftSpark.spark

  test("skipped shards contain no matching rows; kept shards hold them all") {
    val li = graft.sources.Tables.lineitem(spark, "/root/testdata/sf0.001")
      .select((year(col("l_shipdate")) * 12 + month(col("l_shipdate")) - 1)
          .cast("long").as("shard"),
        expr("unix_micros(cast(l_shipdate as timestamp))").as("v"))
    val (lo, hi) = (828316800000000L, 836179199999999L)
    val zones = ZoneMaps.pruneRange(
      ZoneMaps.build(li, col("shard"), col("v")), lo, hi)
    val skipped = zones.filter(!col("kept")).select("shard")
    val kept = zones.filter(col("kept")).select("shard")
    val matches = li.filter(col("v") >= lo && col("v") <= hi)
    assert(matches.join(skipped, "shard").count() == 0,
      "a skipped shard contained a matching row")
    assert(matches.join(kept, "shard").count() == matches.count(),
      "a matching row fell outside every kept shard")
    assert(matches.count() > 0 && skipped.count() > 0,
      "test must exercise both sides")
  }
}
