package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental aggregate maintenance: keep a keyed table of MERGEABLE
  * partial-aggregate states (count / integer sum / min / max) and fold
  * delta batches into it — the materialized-view pattern every
  * lakehouse metrics table runs: yesterday's aggregate plus today's
  * partition equals the full-history aggregate without rescanning
  * history.
  *
  * Algebra, not implementation, is the contract: `merge(partial(A),
  * partial(B)) == partial(A ∪ B)` exactly. That holds here because
  * every state is an exact integer or an order-free extremum — sums run
  * over integer MICRO/cent units, never doubles (double partial sums
  * re-associate under merge and drift from a direct aggregation; the
  * cents discipline is the same one the TPC-H money queries use).
  * Derived values (avg) are computed from the merged states at read
  * time, never stored.
  *
  * Scale shape: `partial` is one map-side-combined aggregate of the
  * delta (delta-sized shuffle); `merge` shuffles only the two
  * STATE tables (one row per key) — at 100 TB the history is never
  * read again, which is the entire point. With both state tables
  * bucketed by key on disk the merge is exchange-free.
  */
object IncrementalAgg {

  /** Partial-aggregate state of `df` per `keys`: (cnt, sum_c, min_c,
    * max_c) over the INTEGER measure column `centsCol` (pre-scaled by
    * the caller — exactness is the caller's contract).
    */
  def partial(df: DataFrame, keys: Seq[String], centsCol: String): DataFrame =
    df.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("cnt"), sum(col(centsCol)).as("sum_c"),
        min(col(centsCol)).as("min_c"), max(col(centsCol)).as("max_c"))

  /** Fold any number of partial-state tables into one. */
  def merge(parts: Seq[DataFrame], keys: Seq[String]): DataFrame =
    parts.reduce(_.unionByName(_))
      .groupBy(keys.map(col): _*)
      .agg(sum(col("cnt")).as("cnt"), sum(col("sum_c")).as("sum_c"),
        min(col("min_c")).as("min_c"), max(col("max_c")).as("max_c"))
}
