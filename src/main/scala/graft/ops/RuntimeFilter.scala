package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Manual runtime-filter (Bloom-pruned) equi-join for BIG⋈BIG joins
  * where the build side is too large (or too unpredictable at plan
  * time) to broadcast-JOIN, but its distinct key set still fits a Bloom
  * sketch: build a Bloom over the build side's join keys, broadcast the
  * BITS (MBs, not rows), filter the probe side BEFORE its shuffle, then
  * run the exact shuffle equi-join.
  *
  * Why this exists next to Spark's own `InjectRuntimeFilter`: the
  * built-in rule only fires under heuristics the caller can't see
  * (creation-side size thresholds, no shuffle-reuse conflicts, one
  * filter per side, plan-time statistics) — when the build side is a
  * filtered intermediate with a hopeless size estimate, the optimizer
  * declines and the full probe table shuffles. This operator is the
  * deterministic form: the caller KNOWS the build side is selective and
  * pays one extra scan of it (the bloom aggregate) to cut the probe
  * shuffle to matching-key rows + the fpp sliver.
  *
  * Correctness is unconditional: Bloom filters have false positives
  * only, and every survivor still passes the exact join — the result is
  * row-identical to the plain join, which keeps the operator fully
  * oracle-checkable.
  *
  * Scale posture: the bloom build is an executor-side aggregate (each
  * partition sketches locally, sketches OR-merge — `stat.bloomFilter`);
  * only the merged bits reach the driver (model-sized, ~1.2 MB per 10⁶
  * keys at 1% fpp). The probe-side filter is a codegen'd native
  * expression ([[graft.functions.BloomMightContainLong]]) fused into
  * the scan stage, so pruned rows never leave their input partition —
  * the shuffle that remains is hit-sized on the probe side and
  * build-sized on the build side.
  */
object RuntimeFilter {

  /** Inner equi-join `probe ⋈ build` on long keys with a Bloom
    * pre-filter on the probe side. `expectedBuildKeys` sizes the sketch
    * (overestimates only lower the realized fpp; use
    * [[Dedup.estimatedRows]]-style plan statistics, never an exact
    * count action, when the build side is expensive).
    */
  def bloomPrunedJoin(probe: DataFrame, build: DataFrame,
      probeKey: String, buildKey: String,
      expectedBuildKeys: Long, fpp: Double = 0.01): DataFrame = {
    require(expectedBuildKeys > 0, "expectedBuildKeys must be positive")
    val spark = probe.sparkSession
    val bloom = build.select(col(buildKey).cast("long").as("k"))
      .stat.bloomFilter("k", expectedBuildKeys, fpp)
    val bc = spark.sparkContext.broadcast(bloom)
    // null keys never match an inner equi-join; the native probe's null
    // propagates and filter() drops the row — same rows either way
    probe.filter(graft.functions.GraftFunctions.bloom_might_contain_long(
        bc, col(probeKey).cast("long")))
      .join(build, col(probeKey) === col(buildKey))
  }
}
