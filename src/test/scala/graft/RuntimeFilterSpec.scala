package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.ExplainMode
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.RuntimeFilter

/** Contracts for the manual runtime-filter join: row-identical to the
  * plain join, the Bloom probe actually prunes, and the filter sits on
  * the probe side BELOW the join even when the join shuffles.
  */
class RuntimeFilterSpec extends AnyFunSuite {
  private lazy val spark = GraftSpark.spark
  private val sf = "/root/testdata/sf0.001"

  private def formatted(df: DataFrame): String =
    df.queryExecution.explainString(ExplainMode.fromString("formatted"))

  test("bloom-pruned join is row-identical to the plain join") {
    val li = graft.sources.Tables.lineitem(spark, sf)
    val sel = graft.sources.Tables.orders(spark, sf)
      .filter(col("o_orderpriority") === "1-URGENT" && col("o_totalprice") > 400000.0)
    val pruned = RuntimeFilter.bloomPrunedJoin(li, sel, "l_orderkey", "o_orderkey", 4096)
      .select("l_orderkey", "l_linenumber", "l_partkey", "o_orderkey")
    val plain = li.join(sel, col("l_orderkey") === col("o_orderkey"))
      .select("l_orderkey", "l_linenumber", "l_partkey", "o_orderkey")
    assert(pruned.orderBy("l_orderkey", "l_linenumber", "l_partkey").collect().toSeq
      == plain.orderBy("l_orderkey", "l_linenumber", "l_partkey").collect().toSeq)
  }

  test("the bloom probe prunes the probe side to hits plus the fpp sliver") {
    val li = graft.sources.Tables.lineitem(spark, sf)
    val sel = graft.sources.Tables.orders(spark, sf)
      .filter(col("o_orderpriority") === "1-URGENT" && col("o_totalprice") > 400000.0)
    val bloom = sel.select(col("o_orderkey").as("k")).stat.bloomFilter("k", 4096, 0.01)
    val bc = spark.sparkContext.broadcast(bloom)
    val total = li.count()
    val kept = li.filter(graft.functions.GraftFunctions
      .bloom_might_contain_long(bc, col("l_orderkey"))).count()
    val trueHits = li.join(sel, col("l_orderkey") === col("o_orderkey")).count()
    assert(kept >= trueHits, "bloom can never drop a true match")
    // selective slice: survivors must be a small fraction of the scan
    // (true hits + ~1% fp of the rest)
    assert(kept <= trueHits + (total * 0.05).toLong,
      s"kept=$kept trueHits=$trueHits total=$total — bloom isn't pruning")
  }

  test("filter plans on the probe side below the shuffle join") {
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val li = graft.sources.Tables.lineitem(spark, sf)
      val sel = graft.sources.Tables.orders(spark, sf)
        .filter(col("o_orderpriority") === "1-URGENT" && col("o_totalprice") > 400000.0)
      val plan = formatted(
        RuntimeFilter.bloomPrunedJoin(li, sel, "l_orderkey", "o_orderkey", 4096))
      assert(plan.contains("bloom_might_contain_long"), plan)
      assert("SortMergeJoin|ShuffledHashJoin".r.findFirstIn(plan).isDefined, plan)
      // the probe filter must be fused into the scan stage, BEFORE the
      // join: in formatted explain the Filter node carrying the bloom
      // probe appears with a smaller node id than the join node
      val filtId = """\((\d+)\) Filter""".r.findAllMatchIn(plan)
        .filter(m => plan.substring(m.start, math.min(plan.length, m.start + 400))
          .contains("bloom_might_contain_long"))
        .map(_.group(1).toInt).toSeq
      assert(filtId.nonEmpty, plan)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }
}
