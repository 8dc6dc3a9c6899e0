package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.Tables

/** The portable moment-sum formulas in q_stats_agg must agree with
  * Spark's native statistical aggregates (keeps stddev/var/corr/covar
  * API coverage while the oracle uses the portable form).
  */
class StatsSpec extends AnyFunSuite {
  lazy val spark = GraftSpark.spark
  val sf = "/root/testdata/sf0.001"

  test("portable moments match native stddev/var/corr/covar within rounding") {
    val portable = Queries.statsAgg(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))).toMap
    val native = Tables.lineitem(spark, sf)
      .groupBy(col("l_returnflag"))
      .agg(
        stddev_samp(col("l_quantity")).as("sd"),
        var_samp(col("l_extendedprice")).as("vp"),
        corr(col("l_quantity"), col("l_extendedprice")).as("c"),
        covar_samp(col("l_quantity"), col("l_discount")).as("cv"))
      .collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))).toMap
    native.foreach { case (k, (sd, vp, c, cv)) =>
      val (psd, pvp, pc, pcv) = portable(k)
      assert(math.abs(psd - sd) < 1e-4, s"sd $k: $psd vs $sd")
      assert(math.abs(pvp - vp) / vp < 1e-6, s"var $k: $pvp vs $vp")
      assert(math.abs(pc - c) < 1e-4, s"corr $k: $pc vs $c")
      assert(math.abs(pcv - cv) < 1e-4, s"covar $k: $pcv vs $cv")
    }
  }
}
