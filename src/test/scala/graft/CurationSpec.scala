package graft

import org.scalatest.funsuite.AnyFunSuite

/** Stage-level behavior of the curation flagship (q_curation's DuckDB
  * oracle checks exact values; this checks each stage actually removes
  * what it claims on the seeded copies).
  */
class CurationSpec extends AnyFunSuite {
  lazy val spark = GraftSpark.spark
  val sf = "/root/testdata/sf0.001"

  test("curation drops all exact copies, some near copies, and splits deterministically") {
    val out = Queries.curationQ(spark, sf).collect()
    assert(out.nonEmpty)
    val ids = out.map(_.getLong(0)).toSet
    // exact copies (planted at +10000) can never survive: identical text
    // means identical gate outcome, and the min-id rule keeps the original
    assert(!ids.exists(id => id >= 10000 && id < 20000), ids.filter(_ >= 10000))
    // at least one planted near copy (+20000) of a kept original was
    // removed by the LSH stage
    val keptOrig5 = ids.filter(id => id < 10000 && id % 5 == 0)
    assert(keptOrig5.nonEmpty)
    assert(keptOrig5.exists(id => !ids.contains(id + 20000)),
      s"no near copy removed among ${keptOrig5.take(5)}")
    // deterministic: a second run yields byte-identical rows
    val again = Queries.curationQ(spark, sf).collect()
    assert(out.toSeq == again.toSeq)
  }
}
