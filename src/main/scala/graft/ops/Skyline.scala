package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Pareto-front (skyline) operator over two maximize-both dimensions
  * `p` and `dt`: a row survives iff NO other row strictly beats it on
  * BOTH. Dominance is evaluated at distinct p levels — max(dt) per
  * level, running max over strictly higher levels via lag — so equal-p
  * rows never dominate each other and every comparison is exact.
  *
  * Skylines are distributive: the skyline of a union is contained in
  * the union of skylines, so [[skyline]] runs a shard-local pass first
  * (windows partitioned by the shard — fact-sized data never sees a
  * global window) and the merge pass only over the survivor set. The
  * merge itself is SIZE-GATED (the triangle-probe pattern): a cheap
  * `limit(N+1).count()` on the persisted survivors picks between one
  * merge bucket (small — the common case, skylines are tiny) and a
  * RANGE-BUCKETED merge (adversarial inputs, e.g. anti-correlated
  * p/dt where the skyline is O(n)): survivors are bucketed by
  * approx-quantile boundaries of `p`, each bucket runs the exact
  * level-window pass locally, and cross-bucket dominance arrives as a
  * per-bucket SEED — the max dt over all strictly-higher buckets,
  * computed on the ≤|buckets|-row bucket-max table. No code path plans
  * an unpartitioned window (Spark's "No Partition Defined" hazard).
  *
  * Bucket-boundary correctness: bucket(x) counts boundaries STRICTLY
  * below cast(x as double); cast is monotone, so bucket(x') > bucket(x)
  * implies p' > p exactly — rows in a higher bucket always have
  * strictly greater p (equal p always lands in one bucket), which is
  * precisely what the seed's "dominators only" contract needs. Ties
  * and within-bucket dominance stay with the exact level windows.
  */
object Skyline {

  /** Survivor-count gate for the single-bucket merge; above it the
    * merge range-buckets. Read per call so tests can force either path
    * (`-Dgraft.skyline.mergeLocalMax=N`; default 1M survivors ≈ one
    * comfortable executor partition).
    */
  def MergeLocalMaxSurvivors: Long =
    sys.props.get("graft.skyline.mergeLocalMax").map(_.toLong).getOrElse(1L << 20)

  /** Merge fan-out when the gate routes large (`-Dgraft.skyline.mergeBuckets`). */
  def MergeBuckets: Int =
    sys.props.get("graft.skyline.mergeBuckets").map(_.toInt).getOrElse(32)

  /** One exact dominance pass; `shardCol` partitions the level windows.
    * `seed` (optional, broadcast — ≤|shards| rows) carries per-shard
    * max dt over rows OUTSIDE the shard that are known to have strictly
    * greater p than every row inside it; null seed_dt = no such rows.
    */
  private def passSeeded(df: DataFrame, shardCol: String,
      seed: Option[DataFrame]): DataFrame = {
    val lvl = df.groupBy(col(shardCol), col("p")).agg(max(col("dt")).as("lvl_max"))
    val ordered = Window.partitionBy(col(shardCol)).orderBy(col("p").desc)
    val local = lvl
      .withColumn("cum", max(col("lvl_max"))
        .over(ordered.rowsBetween(Window.unboundedPreceding, 0)))
      .withColumn("dom_dt", lag(col("cum"), 1).over(ordered))
      .select(col(shardCol), col("p"), col("dom_dt"))
    val dom = seed.fold(local) { s =>
      // greatest() skips nulls: dominator = max(within-shard, seed),
      // null only when neither side has a strictly-higher-p row
      local.join(broadcast(s), Seq(shardCol), "left")
        .select(col(shardCol), col("p"),
          greatest(col("dom_dt"), col("seed_dt")).as("dom_dt"))
    }
    df.join(dom, Seq(shardCol, "p"))
      .filter(col("dom_dt").isNull || col("dt") >= col("dom_dt"))
      .select(df.columns.map(col): _*)
  }

  /** One dominance pass partitioned by `shardCol` (shard-local only —
    * cross-shard dominance is the merge's job).
    */
  def pass(df: DataFrame, shardCol: String): DataFrame =
    passSeeded(df, shardCol, None)

  /** Local-then-merge skyline on (`p`, `dt`), sharded by `shardCol`.
    *
    * LIFECYCLE: the local-survivor set is persisted (the gate probe,
    * quantile/bucket-max jobs and the returned plan all read it);
    * the persist backs the lazy result, so it is released with the
    * session cache (`spark.catalog.clearCache()`), not here — same
    * contract as the triangle edge memo.
    */
  def skyline(df: DataFrame, shardCol: String): DataFrame = {
    val maxLocal = MergeLocalMaxSurvivors
    val surv = pass(df, shardCol)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val small =
      surv.limit(((maxLocal + 1) min Int.MaxValue.toLong).toInt).count() <= maxLocal
    val (bucketed, seed) =
      if (small) (surv.withColumn("sky_bucket", bucketOf(Array.empty)), None)
      else {
        // quantile boundaries of p: one pass over the (persisted)
        // survivors; the Array collected is MergeBuckets-sized — model
        // state, not data (the kmeans-centroid justification)
        val probs = (1 until MergeBuckets).map(_.toDouble / MergeBuckets).toArray
        val bounds = surv.select(col("p").cast("double").as("sky_pd"))
          .stat.approxQuantile("sky_pd", probs, 0.001).distinct.sorted
        val b = surv.withColumn("sky_bucket", bucketOf(bounds))
        // per-bucket seed = max dt over strictly higher buckets: a
        // ≤|buckets|-row aggregate; its suffix-max window partitions on
        // singleton_key (never an empty partition spec)
        val bmax = b.groupBy(col("sky_bucket")).agg(max(col("dt")).as("b_max"))
          .withColumn("sky_g",
            graft.functions.GraftFunctions.singleton_key(col("sky_bucket")))
        val wd = Window.partitionBy(col("sky_g")).orderBy(col("sky_bucket").desc)
          .rowsBetween(Window.unboundedPreceding, -1)
        val s = bmax.withColumn("seed_dt", max(col("b_max")).over(wd))
          .select(col("sky_bucket"), col("seed_dt"))
        (b, Some(s))
      }
    passSeeded(bucketed, "sky_bucket", seed).drop("sky_bucket")
  }

  /** #boundaries strictly below cast(p as double) — 0 when `bounds` is
    * empty, seeded with singleton_key(p) so the optimizer cannot fold
    * the single-bucket key out of the window partition spec (an
    * arithmetic zero like `p * 0.0` folds when `p` is non-nullable).
    */
  private def bucketOf(bounds: Array[Double]): Column =
    bounds.foldLeft(graft.functions.GraftFunctions.singleton_key(col("p"))) {
      (acc, q) => acc + when(col("p").cast("double") > lit(q), 1).otherwise(0)
    }
}
