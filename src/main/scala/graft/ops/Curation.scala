package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** End-to-end training-data curation: the composition every LLM data
  * pipeline runs over its raw corpus, as one declarative plan —
  *
  *   language gate → quality gate → exact dedup → near-dup removal
  *   (MinHash-LSH) → deterministic stratified split
  *
  * Scale shape (the reason each stage is written the way it is):
  * gates are narrow codegen'd column expressions (no shuffle); exact
  * dedup shuffles 16-byte md5 keys, not documents; near-dup candidates
  * come from the LSH band equi-join (never an all-pairs product) and
  * only candidate pairs fetch shingle sets for verification; the split
  * is a pure hash of doc_id — reproducible across runs, engines, and
  * cluster sizes, with no RNG state.
  *
  * Thresholds are part of the oracle contract (SparkEntry mirrors them
  * verbatim in the DuckDB SQL).
  */
object Curation {

  /** Minimum composite quality score (TextOps.qualityScore, 6dp). */
  val QualityMin = 0.55

  /** Near-dup verification threshold (shingle Jaccard, 6dp). */
  val JaccardMin = 0.5

  /** docs(doc_id, text) → kept rows (doc_id, quality, split).
    *
    * Near-dup policy: for every verified pair (a, b) with a < b, the
    * larger id is dropped — deterministic, order-free, and safe under
    * chains (b~c with no a: c drops, b survives).
    */
  def curate(docs: DataFrame): DataFrame = {
    val scored = docs.select(
      col("doc_id"), col("text"),
      TextOps.langId(col("text")).as("lang_pred"),
      TextOps.qualityScore(col("text")).as("quality"))
    val gated = scored
      .filter(col("lang_pred") === "en" && col("quality") >= QualityMin)
    // exact dedup: keep the min doc_id of each identical-text group
    val keepIds = gated
      .groupBy(md5(col("text")).as("k"))
      .agg(min(col("doc_id")).as("doc_id"))
      .select(col("doc_id"))
    val exactKept = gated.join(keepIds, Seq("doc_id"), "left_semi")
    // near-dup removal: LSH candidates, Jaccard-verified; drop doc_b
    val nearDrop = Dedup
      .minhashLsh(exactKept.select(col("doc_id"), col("text")), JaccardMin)
      .select(col("doc_b").as("doc_id")).distinct()
    val kept = exactKept.join(nearDrop, Seq("doc_id"), "left_anti")
    val bucket = TextOps.portableHash64(concat(lit("split:"), col("doc_id"))) % 100
    kept.select(
      col("doc_id"), col("quality"),
      when(bucket < 80, "train").when(bucket < 90, "val").otherwise("test").as("split"))
  }
}
