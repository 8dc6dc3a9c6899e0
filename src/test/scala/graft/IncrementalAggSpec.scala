package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.IncrementalAgg

/** The mergeability contract: merge(partial(A), partial(B)) ==
  * partial(A ∪ B) exactly, for any split of the input.
  */
class IncrementalAggSpec extends AnyFunSuite {
  private lazy val spark = GraftSpark.spark

  test("merged partials equal the single-pass aggregate, any split") {
    val o = graft.sources.Tables.orders(spark, "/root/testdata/sf0.001")
      .withColumn("c", round(col("o_totalprice") * 100, 0).cast("long"))
    val keys = Seq("o_orderpriority")
    val direct = IncrementalAgg.partial(o, keys, "c")
      .orderBy("o_orderpriority").collect().toSeq
    for (k <- Seq(2, 3, 7)) {
      val parts = (0 until k).map(i =>
        IncrementalAgg.partial(o.filter(col("o_orderkey") % k === i), keys, "c"))
      val merged = IncrementalAgg.merge(parts, keys)
        .orderBy("o_orderpriority").collect().toSeq
      assert(merged == direct, s"split k=$k diverged")
    }
  }

  test("folding a delta into an existing state equals recomputation") {
    val o = graft.sources.Tables.orders(spark, "/root/testdata/sf0.001")
      .withColumn("c", round(col("o_totalprice") * 100, 0).cast("long"))
    val keys = Seq("o_orderstatus")
    val history = o.filter(col("o_orderkey") % 10 =!= 0)
    val delta = o.filter(col("o_orderkey") % 10 === 0)
    val state = IncrementalAgg.partial(history, keys, "c")
    val updated = IncrementalAgg.merge(
      Seq(state, IncrementalAgg.partial(delta, keys, "c")), keys)
    assert(updated.orderBy("o_orderstatus").collect().toSeq
      == IncrementalAgg.partial(o, keys, "c").orderBy("o_orderstatus").collect().toSeq)
  }
}
