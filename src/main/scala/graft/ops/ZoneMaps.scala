package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Zone maps — the per-shard min/max statistics table behind every
  * file-skipping index (parquet row-group stats, Iceberg manifests,
  * Delta file stats), built and queried as data: `build` reduces each
  * shard to one stats row per tracked column; `pruneRange` marks which
  * shards a range predicate can skip WITHOUT reading them.
  *
  * The planning story at 100 TB: the zone table is shard-count-sized
  * (thousands of rows for petabytes of data), so scan planning — "which
  * files does this predicate touch" — becomes a broadcast-sized lookup
  * instead of a data scan. Pruning is conservative by construction:
  * a shard is kept whenever its [min, max] INTERSECTS the predicate
  * range, so skipped shards provably contain no matching row (false
  * keeps cost I/O; false skips would cost correctness and cannot
  * happen).
  *
  * `build` is one map-side-combined aggregate over the data (the same
  * pass a lake write already makes); stats rows are exact integers —
  * the caller maps whatever it tracks (timestamps → unix micros) into
  * longs first.
  */
object ZoneMaps {

  /** Per-shard stats: (shard, n_rows, min_v, max_v) over long column
    * `v` under the given shard assignment expression.
    */
  def build(df: DataFrame, shard: Column, v: Column): DataFrame =
    df.select(shard.as("shard"), v.as("v"))
      .groupBy(col("shard"))
      .agg(count(lit(1)).as("n_rows"), min(col("v")).as("min_v"), max(col("v")).as("max_v"))

  /** Mark zones for a closed-range predicate `lo <= v <= hi`:
    * kept = [min_v, max_v] ∩ [lo, hi] ≠ ∅.
    */
  def pruneRange(zones: DataFrame, lo: Long, hi: Long): DataFrame =
    zones.withColumn("kept", col("max_v") >= lit(lo) && col("min_v") <= lit(hi))
}
