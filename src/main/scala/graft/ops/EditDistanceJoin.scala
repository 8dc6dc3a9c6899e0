package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Edit-distance (Levenshtein ≤ k) similarity self-join via a
  * deletion-neighborhood prefilter — the FastSS / SymSpell family
  * (Bocek et al., "Fast Similarity Search in Large Dictionaries",
  * 2007): if ed(a, b) ≤ k then their longest common subsequence has
  * length ≥ max(|a|,|b|) − k, i.e. some string is reachable from BOTH
  * a and b by at most k character deletions. So the ≤k-deletion
  * neighborhoods intersect, and an equi-join of the variant tables on
  * (block, variant) finds every qualifying pair — structural recall.
  * Every candidate is then VERIFIED with the true Levenshtein, so the
  * output is identical to the brute-force quadratic join (the DuckDB
  * oracle runs brute force).
  *
  * Why this beats segment (PassJoin) filtering here: template-style
  * short names collide massively on 3-char segments (measured 18M
  * candidate rows, 7.8s at sf0.1), while deletion variants are
  * near-full-length strings — measured 6.8M joined rows → 252k
  * distinct candidates against 220k true pairs (87% precision), with
  * the quadratic block pair set (8M, 11.3s brute force) never built.
  *
  * Scale posture: a string of length L emits 1 + L + C(L,2) variants
  * (56 for L=10) — a constant factor, not a quadratic one. The only
  * shuffles are the variant equi-join and the candidate DISTINCT on
  * integer key pairs; both hash-partition on high-cardinality keys, so
  * no task ever sees more than one variant bucket. The variant join's
  * build side and the verify step's name fetches broadcast only below
  * [[EditDistanceJoin.BroadcastMaxRows]] input rows — past the gate
  * they are pinned SHUFFLE_HASH, because the static size estimate
  * under the variant Generate is rows-of-the-SCAN-sized and would
  * auto-broadcast a corpus-scaled table (the x100-soak failure mode).
  */
object EditDistanceJoin {

  /** Input-row gate above which the variant and name-fetch joins are
    * pinned to SHUFFLE_HASH instead of being left to the static
    * planner. Below it Catalyst's auto-broadcast is correct and fast;
    * above it the ESTIMATE is the trap: the variant table inherits the
    * pruned parquet scan's few-MB sizeInBytes through the Generate, so
    * the planner happily broadcasts a table that is really rows×~C(L,2)
    * — at 100× sf0.1 that was a 1.4 GB driver collect, killed by
    * spark.driver.maxResultSize (found by the x100 soak). Read per call
    * (`-Dgraft.fuzzy.broadcastMaxRows=N`, 0 forces the shuffle path);
    * default keeps x10-scale inputs (~200k rows ≈ 140 MB of variants)
    * on the broadcast plan and routes anything larger to shuffle-hash,
    * where the per-partition build is collect-free and AQE still
    * handles skew.
    */
  def BroadcastMaxRows: Long =
    sys.props.get("graft.fuzzy.broadcastMaxRows").map(_.toLong).getOrElse(1L << 18)

  /** All strings reachable by deleting up to `k` characters, k ≤ 2.
    * Encoding: i ∈ [0, L]; j ∈ [0, max(i-1, 0)]; i = 0 → the string
    * itself, j = 0 → delete position i only, else delete positions j
    * and i (j < i, so deleting i first leaves j's index stable).
    * Duplicate variants (repeated characters) are tolerated — the
    * candidate DISTINCT absorbs them.
    */
  private def withDeletionVariants(df: DataFrame, name: String, k: Int): DataFrame = {
    require(k == 2, s"deletion-neighborhood join implemented for k=2, got $k")
    val nm = col(name)
    val big = lit(Int.MaxValue) // substr len: "to end of string"
    df.withColumn("i", explode(sequence(lit(0), length(nm))))
      .withColumn("j", explode(sequence(lit(0), greatest(col("i") - 1, lit(0)))))
      .withColumn("var",
        when(col("i") === 0, nm)
          .when(col("j") === 0,
            concat(nm.substr(lit(1), col("i") - 1), nm.substr(col("i") + 1, big)))
          .otherwise(concat(
            nm.substr(lit(1), col("j") - 1),
            nm.substr(col("j") + 1, col("i") - col("j") - 1),
            nm.substr(col("i") + 1, big))))
  }

  /** [[selfJoin]] with the variant strings collapsed to 64-bit hashes
    * before the equi-join: the shuffled key shrinks from a ~full-length
    * string to 8 bytes and the join compares longs. xxhash64 collisions
    * can only ADD candidates — never lose one — and every candidate is
    * levenshtein-verified, so the output is identical (the property
    * spec runs both forms against brute force). Same maxLen/prefilter
    * behavior as [[selfJoin]].
    */
  def selfJoinHashed(rows: DataFrame, key: String, name: String, block: String,
      k: Int = 2, maxLen: Int = 64): DataFrame =
    selfJoinImpl(rows, key, name, block, k, maxLen, hashVariants = true)

  /** Self-join `rows` (columns: key, name, block) returning pairs with
    * ed(name_a, name_b) ≤ k within the same block. Output columns:
    * key_a, key_b, name_a, name_b, dist (BIGINT), key_a < key_b.
    *
    * `maxLen` caps input string length AT RUNTIME (raise_error in the
    * variant generator, no extra pass): variant count grows C(L,2) per
    * string — fine for part names (L≈30 → ~500), hostile for documents
    * (L=1000 → ~500k variants per row). Long-string inputs should be
    * fingerprinted (MinHash/SimHash in [[Dedup]]) instead; raise the
    * cap only for genuinely short-string domains.
    */
  def selfJoin(rows: DataFrame, key: String, name: String, block: String,
               k: Int = 2, maxLen: Int = 64): DataFrame =
    selfJoinImpl(rows, key, name, block, k, maxLen, hashVariants = false)

  private def selfJoinImpl(rows: DataFrame, key: String, name: String, block: String,
      k: Int, maxLen: Int, hashVariants: Boolean): DataFrame = {
    val capped = rows.select(col(block), col(key),
      when(length(col(name)) > maxLen, raise_error(concat(
          lit(s"EditDistanceJoin.selfJoin: input exceeds maxLen=$maxLen " +
            "(variant count is C(L,2) per string; use MinHash/SimHash for " +
            "long text): "), col(name).substr(1, 80))))
        .otherwise(col(name)).as(name))
    val variantsRaw = withDeletionVariants(capped, name, k)
    val variants =
      if (hashVariants) variantsRaw.withColumn("var", xxhash64(col("var")))
      else variantsRaw
    // the cheap scale probe behind BroadcastMaxRows (one narrow scan)
    val gate = BroadcastMaxRows
    val big = rows.limit(((gate + 1) min Int.MaxValue.toLong).toInt).count() > gate
    def pin(df: DataFrame): DataFrame = if (big) df.hint("SHUFFLE_HASH") else df
    // ed(a,b) <= k forces abs(|a|-|b|) <= k: carrying the source length
    // through the variant join lets that necessary condition drop
    // candidates BEFORE the DISTINCT shuffle (cuts same-variant
    // collisions between strings of very different lengths).
    val a = variants.select(col(block), col("var"), col(key).as("key_a"),
      length(col(name)).as("len_a"))
    val b = variants.select(col(block), col("var"), col(key).as("key_b"),
      length(col(name)).as("len_b"))
    val candidates = a.join(pin(b), Seq(block, "var"))
      .filter(col("key_a") < col("key_b") &&
        abs(col("len_a") - col("len_b")) <= k)
      .select(col("key_a"), col("key_b"))
      .distinct()
    val names = rows.select(col(key), col(name))
    candidates
      .join(pin(names.select(col(key).as("key_a"), col(name).as("name_a"))), "key_a")
      .join(pin(names.select(col(key).as("key_b"), col(name).as("name_b"))), "key_b")
      // banded levenshtein: the 3-arg form early-exits past k (returns
      // -1), so the verify DP fills a 2k+1 band instead of the full
      // matrix — same value as the unbounded form whenever dist <= k
      .withColumn("dist", levenshtein(col("name_a"), col("name_b"), k).cast("long"))
      .filter(col("dist") >= 0 && col("dist") <= k)
      .select(col("key_a"), col("key_b"), col("name_a"), col("name_b"), col("dist"))
  }
}
