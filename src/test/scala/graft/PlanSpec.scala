package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.ExplainMode
import org.scalatest.funsuite.AnyFunSuite

/** Physical-plan shape guards: these are the properties that decide
  * whether the operators survive a 100 TB scale-up — filters/pruning
  * reaching the parquet scan, small dims broadcast (no shuffle of the
  * fact side), top-k as TakeOrderedAndProject (no global sort), partial
  * (map-side) aggregation before the exchange.
  */
class PlanSpec extends AnyFunSuite {
  lazy val spark = GraftSpark.spark
  val sf = "/root/testdata/sf0.001"

  def formatted(df: DataFrame): String =
    df.queryExecution.explainString(ExplainMode.fromString("formatted"))

  test("filter+projection are pushed into the parquet scan") {
    val plan = formatted(Queries.filterProject(spark, sf))
    assert(plan.contains("PushedFilters:") &&
      plan.contains("GreaterThan(l_quantity,45.0)"), plan)
    // pruned read schema — none of the untouched wide columns
    assert(!plan.contains("l_comment") && !plan.contains("l_returnflag"), plan)
  }

  test("star join broadcasts all three dims (no shuffle join)") {
    val plan = formatted(Queries.joinBroadcast(spark, sf))
    assert("BroadcastHashJoin".r.findAllIn(plan).size >= 3, plan)
    assert(!plan.contains("SortMergeJoin"), plan)
  }

  test("top-k compiles to TakeOrderedAndProject, not a global sort") {
    val plan = formatted(Queries.topK(spark, sf))
    assert(plan.contains("TakeOrderedAndProject"), plan)
  }

  test("hot-section: broadcast dim join + partial aggregation") {
    val plan = formatted(Queries.hotSection(spark, sf))
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert("HashAggregate".r.findAllIn(plan).size >= 2, plan) // partial + final
    assert(plan.contains("TakeOrderedAndProject"), plan)
  }

  test("minhash signatures aggregate partially before the exchange") {
    val sigs = graft.ops.Dedup.minhashSignatures(
      graft.ops.Dedup.shingleSets(graft.sources.Tables.documents(spark, sf)))
    val plan = formatted(sigs)
    assert(plan.contains("partial_min") || plan.contains("Partial"), plan)
  }

  test("knn broadcasts the small query side") {
    val plan = formatted(Queries.knnCosine(spark, sf))
    assert(plan.contains("BroadcastNestedLoopJoin") || plan.contains("BroadcastHashJoin"), plan)
  }

  test("banded range join is an equi-join, not a cartesian/range product") {
    val plan = formatted(Queries.rangeJoin(spark, sf))
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"), plan)
  }

  test("correlated EXISTS/NOT EXISTS decorrelate to broadcast semi/anti joins") {
    val plan = formatted(Queries.existsSubquery(spark, sf))
    assert(plan.contains("LeftSemi") && plan.contains("LeftAnti"), plan)
    assert(plan.contains("BroadcastHashJoin") && !plan.contains("CartesianProduct"), plan)
    // the EXISTS predicates reach the orders scan
    assert(plan.contains("GreaterThan(o_totalprice,450000.0)"), plan)
  }

  test("lateral ORDER BY/LIMIT decorrelates to a partial rank pushdown") {
    val plan = formatted(Queries.lateralJoin(spark, sf))
    // WindowGroupLimit(Partial) trims each map partition to k rows BEFORE
    // the exchange — the property that makes per-group top-k scale.
    assert(plan.contains("WindowGroupLimit"), plan)
    assert(plan.contains("Partial"), plan)
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"), plan)
  }

  test("events scan under the log generator prunes to the used columns") {
    val plan = formatted(Queries.clientIp(spark, sf))
    // props/value are never touched by the log pipeline
    assert(!plan.contains("props") && !plan.contains("value"), plan)
  }
}
