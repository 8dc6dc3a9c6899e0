package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.GraftFunctions.freq_items

/** Misra-Gries frequent-items aggregate: exact regime (k >= distinct)
  * equals GROUP BY; approximate regime obeys the mergeable-summaries
  * bound under forced partial merges.
  */
class FrequentItemsSpec extends AnyFunSuite {
  lazy val spark = GraftSpark.spark
  import spark.implicits._

  test("exact regime (k >= distinct) reproduces GROUP BY counts") {
    val df = Seq.tabulate(300)(i => s"v${i % 7}").toDF("x").repartition(8)
    val got = df.agg(freq_items($"x", 16).as("fi"))
      .select(explode($"fi").as("f")).select($"f.item", $"f.cnt")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = df.groupBy($"x").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == exact)
  }

  test("approximate regime: heavy hitters survive with bounded undercount") {
    // 40% one item, 30% another, tail of 100 singleton-ish items; k=8
    val n = 1000
    val data = Seq.fill(400)("heavy") ++ Seq.fill(300)("second") ++
      Seq.tabulate(300)(i => s"tail${i % 100}")
    val df = data.toDF("x").repartition(16) // force cross-partition merges
    val got = df.agg(freq_items($"x", 8).as("fi"))
      .select(explode($"fi").as("f")).select($"f.item", $"f.cnt")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val err = n / (8 + 1) // n/(k+1)
    // any item with true freq > n/(k+1) MUST be present
    assert(got.contains("heavy") && got.contains("second"), got)
    // counts never overcount and undercount at most n/(k+1)
    assert(got("heavy") <= 400 && got("heavy") >= 400 - err, got("heavy"))
    assert(got("second") <= 300 && got("second") >= 300 - err, got("second"))
    assert(got.size <= 8)
  }

  test("SQL registration: freq_items callable from spark.sql") {
    Seq("a", "a", "b").toDF("x").createOrReplaceTempView("fi_t")
    val got = spark.sql(
      "SELECT explode(freq_items(x, 4)) AS f FROM fi_t")
      .selectExpr("f.item", "f.cnt")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == Map("a" -> 2L, "b" -> 1L))
  }
}
