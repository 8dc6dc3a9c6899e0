package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.TextOps

/** Pins the non-degeneracy of [[Queries.permutationTestQ]]'s
  * pseudo-permutation. The round-9 advice finding: a power-of-2-modulus
  * LCG's LOW BIT with odd multipliers collapses to (user_id + r) % 2, so
  * every "permutation" was the observed even/odd split or its exact
  * mirror — |d| == obs in all 200 rounds, p ≡ 1. The fix derives the
  * round label from the full-width portable md5 hash of "user_id:r".
  * These tests fail on the LCG shape and pass on the hash shape, so the
  * degeneracy cannot silently return (the DuckDB oracle replays the same
  * expression and cannot catch it).
  */
class PermutationSpec extends AnyFunSuite {
  lazy val spark = GraftSpark.spark
  val sf = "/root/testdata/sf0.001"

  test("round labels actually re-partition users (not user parity ± mirror)") {
    // For each round r, count users whose hash label matches their parity
    // label. Degenerate labelling ⇒ every round is all-match or all-miss.
    val u = graft.sources.Tables.events(spark, sf)
      .select(col("user_id")).distinct()
    val spine = spark.range(1, 201).select(col("id").as("r"))
    val agree = u.crossJoin(broadcast(spine))
      .select(col("r"),
        when((TextOps.portableHash64(concat(col("user_id").cast("string"),
          lit(":"), col("r").cast("string"))) % 2) === (col("user_id") % 2), 1L)
          .otherwise(0L).as("m"))
      .groupBy(col("r"))
      .agg(sum(col("m")).as("agree"), count(lit(1)).as("n"))
      .filter(col("agree") === 0L || col("agree") === col("n"))
      .count()
    assert(agree === 0L,
      s"$agree of 200 rounds reproduce the observed split or its mirror")
  }

  test("the 200 round gaps are not all equal to the observed gap") {
    val row = Queries.permutationTestQ(spark, sf).collect().head
    val nGe = row.getAs[Long]("n_ge")
    val nPerm = row.getAs[Long]("n_perm")
    assert(nGe < nPerm,
      s"n_ge == n_perm ($nGe): every pseudo-permutation reached the " +
        "observed gap — the permutation test is vacuous again")
  }

  test("the degenerate LCG low-bit shape WOULD be caught by these checks") {
    // The exact round-9 expression: low bit of an odd-multiplier LCG mod
    // 2^31 — provably (user_id + r) % 2. Every round must all-match or
    // all-miss parity, which is what the first test forbids for the fix.
    val u = graft.sources.Tables.events(spark, sf)
      .select(col("user_id")).distinct()
    val spine = spark.range(1, 201).select(col("id").as("r"))
    val degen = u.crossJoin(broadcast(spine))
      .select(col("r"),
        when(expr("((user_id * 1103515245 + r * 12345) % 2147483648) % 2")
          === (col("user_id") % 2), 1L).otherwise(0L).as("m"))
      .groupBy(col("r"))
      .agg(sum(col("m")).as("agree"), count(lit(1)).as("n"))
      .filter(col("agree") === 0L || col("agree") === col("n"))
      .count()
    assert(degen === 200L,
      "expected the LCG low bit to degenerate to parity in all 200 rounds")
  }
}
