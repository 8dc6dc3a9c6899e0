package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic training-order assembly — the last pipeline stage
  * before the trainer reads data: given a curated/deduped/packable
  * sequence table, emit for each epoch a REPRODUCIBLE global order
  * (epoch-salted hash permutation), a shard assignment (the unit a
  * data-parallel rank reads), and per-source mixture resampling
  * (up-/down-weighting sources, the GPT-3/DoReMi mixture device).
  *
  * Determinism is the whole point: two runs with the same salt must be
  * bit-identical (training is resumable and auditable), while different
  * epochs must be decorrelated (no fixed neighbor pairs across epochs).
  * Both properties come from keying EVERYTHING on a portable 64-bit
  * hash of (salt, epoch, doc, replica) — never on partition order,
  * `rand()`, or driver-side state.
  *
  * Scale shape (100 TB): one scan of the sequence table, a broadcast
  * epoch grid, a bounded per-row replica explode (≤ ⌈max weight⌉), and
  * ONE hash exchange on (epoch, shard) where each shard sorts locally
  * by the order key — shard count scales with the cluster, the global
  * sort never exists. The op is unit-agnostic: feed it documents (as
  * the harness queries do) or the packed-window table of
  * [[graft.Queries.packFfdQ]] — anything with (id, source, token
  * count) columns.
  */
object TrainOrder {

  /** Per-source mixture weights in ppm (1e6 = keep once per epoch):
    * src0 is upsampled ×2 exactly, src1 ×1.5 in expectation (hash
    * Bernoulli on the fractional part), src2 is downsampled to 0.25,
    * every other source rides at 1.0. Integer ppm so both engines
    * compute copies with exact `div`/`%` arithmetic.
    */
  val MixWeightsPpm: Seq[(String, Long)] =
    Seq("src0" -> 2000000L, "src1" -> 1500000L, "src2" -> 250000L)

  val DefaultWeightPpm: Long = 1000000L

  /** The weight lookup as a portable CASE chain (identical text on the
    * DuckDB side — no map element_at, which throws under ANSI on a
    * missing key).
    */
  def weightPpm(source: Column): Column =
    MixWeightsPpm.foldRight(lit(DefaultWeightPpm): Column) {
      case ((src, w), elsec) => when(source === src, lit(w)).otherwise(elsec)
    }

  /** Epoch-salted deterministic training order over `docs`
    * (doc_id, source, text): one row per (epoch, replica) of each
    * kept sequence, with its shard and in-shard position.
    *
    * copies(doc, epoch) = ⌊w⌋ + [hash(salt:mix:epoch:doc) mod 1e6 <
    * frac(w)] — exact integer replication for whole weights, hash
    * Bernoulli for fractional parts, independent across epochs.
    * okey = hash(salt:ord:epoch:doc:rep) is the permutation key;
    * shard = okey mod nShards; pos = row_number within (epoch, shard)
    * by (okey, doc_id, rep) — the tiebreak makes the order TOTAL even
    * under 48-bit hash collisions.
    */
  def epochOrder(docs: DataFrame, epochs: Int, nShards: Int,
      salt: String): DataFrame = {
    val d = docs.select(col("doc_id"), col("source"),
      TextOps.bpeTokenCount(col("text")).as("n_tokens"))
    val grid = broadcast(docs.sparkSession.range(0, epochs.toLong)
      .select(col("id").as("epoch")))
    val kept = d.crossJoin(grid)
      .withColumn("w_ppm", weightPpm(col("source")))
      .withColumn("n_copies", expr("w_ppm div 1000000") +
        when(pmod(TextOps.portableHash64(concat(lit(salt), lit(":mix:"),
            col("epoch"), lit(":"), col("doc_id"))), lit(1000000L))
            < col("w_ppm") % 1000000L, 1L).otherwise(0L))
      .filter(col("n_copies") >= 1L)
      // bounded generator: ≤ ⌈max mixture weight⌉ replicas per row
      .withColumn("rep", explode(expr("sequence(1L, n_copies)")))
    val keyed = kept
      .withColumn("okey", TextOps.portableHash64(concat(
        lit(salt), lit(":ord:"), col("epoch"), lit(":"), col("doc_id"),
        lit(":"), col("rep"))))
      .withColumn("shard", pmod(col("okey"), lit(nShards.toLong)))
    keyed
      .withColumn("pos", row_number().over(
        Window.partitionBy(col("epoch"), col("shard"))
          .orderBy(col("okey"), col("doc_id"), col("rep"))).cast("long"))
      .select(col("epoch"), col("shard"), col("pos"), col("doc_id"),
        col("rep"), col("source"), col("n_tokens"), col("okey"))
  }

  /** Shard manifest off [[epochOrder]]: per (epoch, shard) the counts
    * a trainer checks before launch — sequences, distinct docs, token
    * totals, the mixture realized per reweighted source, and the
    * (min, max) order-key witnesses that make two manifests comparable
    * without reading the order table.
    */
  def shardManifest(order: DataFrame): DataFrame =
    order.groupBy(col("epoch"), col("shard"))
      .agg(count(lit(1)).as("n_seqs"),
        countDistinct(col("doc_id")).as("n_docs"),
        sum(col("n_tokens")).as("total_tokens"),
        sum(when(col("source") === "src0", 1L).otherwise(0L)).as("n_src0"),
        sum(when(col("source") === "src1", 1L).otherwise(0L)).as("n_src1"),
        sum(when(col("source") === "src2", 1L).otherwise(0L)).as("n_src2"),
        min(col("okey")).as("min_okey"), max(col("okey")).as("max_okey"))
      .select(col("epoch"), col("shard"), col("n_seqs"), col("n_docs"),
        col("total_tokens"), col("n_src0"), col("n_src1"), col("n_src2"),
        expr("(n_src0 + n_src1 + n_src2) * 1000000 div n_seqs")
          .as("reweighted_share_e6"),
        col("min_okey"), col("max_okey"))
}
