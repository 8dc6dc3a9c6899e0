package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic corpus-sampling operators.
  *
  * Every training-data pipeline rebalances its corpus: downsample
  * overrepresented languages/domains by rate, cap runaway groups at a
  * document budget. Both are implemented as pure hash decisions — no
  * RNG state, no seeds to ship — so a sample is reproducible across
  * runs, engines (the DuckDB oracle replays the same hash), cluster
  * sizes, and partitionings. That reproducibility is the property that
  * matters at 100 TB: a resampled pipeline must not churn the kept set.
  *
  * Scale shape: `weightedByRate` is a narrow codegen'd filter (no
  * shuffle, no state); `capPerGroup` is one window exchange on the
  * group key — the same shape as any per-group top-k, with the hash
  * order making the kept subset stable instead of arrival-ordered.
  */
object Sampling {

  /** Uniform in [0, 1) per id, derived from the portable 48-bit hash
    * with a salt — decouples sampling decisions from any other hash
    * use of the same ids (e.g. the split bucketing).
    */
  private def unitHash(idCol: String, salt: String) =
    (TextOps.portableHash64(concat(lit(salt), col(idCol).cast("string")))
      % 1000000L).cast("double") / 1000000.0

  /** Keep each row with probability rates(key) (default rate for keys
    * not in the map), decided by hash — deterministic Bernoulli
    * sampling stratified by `keyCol`.
    */
  def weightedByRate(df: DataFrame, rates: Map[String, Double],
      defaultRate: Double, keyCol: String, idCol: String): DataFrame = {
    val rate = rates.foldLeft(lit(defaultRate)) { case (acc, (k, r)) =>
      when(col(keyCol) === k, lit(r)).otherwise(acc)
    }
    df.filter(unitHash(idCol, "samp:") < rate)
  }

  /** Downsample every stratum to (approximately) the SMALLEST
    * stratum's size — corpus balancing with rates derived from the
    * DATA, not constants: rate(key) = min_n / n_key. The keep decision
    * is EXACT-INTEGER (hash_bucket · n_key < min_n · buckets), so no
    * float rate can straddle an engine boundary. The stratum-count
    * table and the 1-row minimum broadcast; the keep itself is a
    * narrow filter — same no-shuffle scan shape as [[weightedByRate]].
    */
  def balanceToSmallest(df: DataFrame, keyCol: String, idCol: String): DataFrame = {
    val counts = df.groupBy(col(keyCol))
      .agg(org.apache.spark.sql.functions.count(lit(1)).as("_n_key"))
    val minN = counts.agg(org.apache.spark.sql.functions.min(col("_n_key")).as("_min_n"))
    val bucket = pmod(
      TextOps.portableHash64(concat(lit("bal:"), col(idCol).cast("string"))),
      lit(1000000L))
    df.join(broadcast(counts), keyCol)
      .crossJoin(broadcast(minN)) // 1-row scalar
      .filter(bucket * col("_n_key") < col("_min_n") * 1000000L)
      .drop("_n_key", "_min_n")
  }

  /** Upsample every stratum to (approximately) the LARGEST stratum's
    * size by REPLICATION — the materialize step of a sampling-weight
    * table (how an epoch of a weighted mixture is actually laid down,
    * e.g. low-resource languages repeated to parity). Each row gains a
    * `copy` column (0-based): whole copies = max_n div n_key (exact
    * integer division), plus one fractional copy decided by the same
    * exact-integer hash rule as [[balanceToSmallest]]
    * (bucket · n_key < (max_n mod n_key) · buckets) — no float
    * repetition factor anywhere, so both engines emit the identical
    * multiset. Every row keeps at least copy 0 (max_n ≥ n_key).
    *
    * Scale shape: the stratum-count table and 1-row maximum broadcast;
    * the replication is a narrow generate (explode of a per-row
    * sequence) — output-sized work, no shuffle. The explode fan-out is
    * bounded by max_n/min_n; a degenerate stratum ratio is a data
    * problem the count table makes visible before the explode runs.
    */
  def upsampleToLargest(df: DataFrame, keyCol: String, idCol: String): DataFrame = {
    val counts = df.groupBy(col(keyCol))
      .agg(org.apache.spark.sql.functions.count(lit(1)).as("_n_key"))
    val maxN = counts.agg(org.apache.spark.sql.functions.max(col("_n_key")).as("_max_n"))
    val bucket = pmod(
      TextOps.portableHash64(concat(lit("ups:"), col(idCol).cast("string"))),
      lit(1000000L))
    val copies = expr("_max_n div _n_key") +
      when(bucket * col("_n_key") < (col("_max_n") % col("_n_key")) * 1000000L, 1L)
        .otherwise(0L)
    df.join(broadcast(counts), keyCol)
      .crossJoin(broadcast(maxN)) // 1-row scalar
      .withColumn("copy", explode(sequence(lit(0L), copies - 1L)))
      .drop("_n_key", "_max_n")
  }

  /** Temperature-flattened stratified sampling at α = 1/2 (T = 2, the
    * canonical multilingual-rebalance temperature): keep rate
    * r_k = (min_n / n_k)^(1−α) = √(min_n / n_k) — partial flattening
    * sitting between [[balanceToSmallest]] (α = 0, full flattening)
    * and the identity (α = 1, natural distribution). The keep decision
    * is EXACT-INTEGER: bucket < B·√(min_n/n_k) ⟺
    * bucket²·n_k < min_n·B² — both sides are BIGINT products
    * (B = 10⁵ ⇒ each side ≤ 10¹⁰·n, Long-safe to n ≈ 9·10⁸ rows per
    * stratum), so neither engine ever evaluates a float root and no
    * boundary row can straddle engines.
    *
    * Scale shape: identical to [[balanceToSmallest]] — stratum counts
    * and the 1-row minimum broadcast, the keep is a narrow no-shuffle
    * filter over the scan.
    */
  def temperatureSample(df: DataFrame, keyCol: String, idCol: String): DataFrame = {
    val B = 100000L
    val counts = df.groupBy(col(keyCol))
      .agg(org.apache.spark.sql.functions.count(lit(1)).as("_n_key"))
    val minN = counts.agg(org.apache.spark.sql.functions.min(col("_n_key")).as("_min_n"))
    val bucket = pmod(
      TextOps.portableHash64(concat(lit("temp:"), col(idCol).cast("string"))),
      lit(B))
    df.join(broadcast(counts), keyCol)
      .crossJoin(broadcast(minN)) // 1-row scalar
      .filter(bucket * bucket * col("_n_key") < col("_min_n") * B * B)
      .drop("_n_key", "_min_n")
  }

  /** Greedy token-budget prefix per stratum: rows rank by the sampling
    * hash (uniform and deterministic — NOT arrival order, so the kept
    * prefix is a stable uniform subsample, not "whatever loaded
    * first") and survive while the stratum's running token total stays
    * within `budget`. The running sum is an exact BIGINT window with a
    * total order (hash, id), so the cut row is identical on every
    * engine and partitioning; the row that would cross the budget, and
    * everything after it in hash order, is dropped.
    *
    * Scale shape: one window exchange on the group key — the same
    * per-group top-k shape as [[capPerGroup]], bounding a SUM instead
    * of a row count.
    */
  def tokenBudgetPerGroup(df: DataFrame, groupCol: String, idCol: String,
      tokenCol: String, budget: Long): DataFrame = {
    val w = Window.partitionBy(col(groupCol))
      .orderBy(unitHash(idCol, "tok:"), col(idCol))
    df.withColumn("_cum", sum(col(tokenCol)).over(w))
      .filter(col("_cum") <= budget)
      .drop("_cum")
  }

  /** Cap each group at `cap` rows, keeping the hash-minimal ones
    * (id tie-break) — a deterministic uniform subsample per group, not
    * a prefix of arrival order. One window exchange on `groupCol`.
    */
  def capPerGroup(df: DataFrame, groupCol: String, idCol: String, cap: Int): DataFrame = {
    val w = Window.partitionBy(col(groupCol))
      .orderBy(unitHash(idCol, "cap:"), col(idCol))
    df.withColumn("_rk", row_number().over(w))
      .filter(col("_rk") <= cap)
      .drop("_rk")
  }

  /** Deterministic training-shard assignment: `shard = h(salt‖id) % n`
    * — the export-layout step of a training pipeline. A narrow
    * projection (no shuffle, no RNG): a doc's shard is a pure function
    * of its id, so re-runs, retries, and late fixups land in the same
    * shard, and the expected shard sizes are uniform regardless of how
    * the input was partitioned. Write with `.partitionBy("shard")` for
    * one directory per shard; the global hash-shuffle a naive
    * `repartition(n)` would pay never happens.
    */
  def shardAssign(df: DataFrame, idCol: String, shards: Int,
      salt: String = "shard:"): DataFrame =
    df.withColumn("shard", pmod(
      TextOps.portableHash64(concat(lit(salt), col(idCol).cast("string"))),
      lit(shards.toLong)))
}
