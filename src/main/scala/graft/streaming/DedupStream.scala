package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.ops.Dedup

/** Streaming near-duplicate detection over a document stream.
  *
  * Batch MinHash-LSH (graft.ops.Dedup) made incremental: each arriving
  * doc's 4 LSH band keys are checked against per-band state
  * (`mapGroupsWithState` keyed by band key, storing the first doc seen
  * per band). A doc colliding with an earlier doc on ANY band is emitted
  * as a duplicate-candidate pair — classic LSH recall semantics, now
  * with O(1) state lookups per band instead of a batch self-join.
  *
  * Scale shape: state is hash-partitioned by band key across executors
  * (the same exchange the batch band-join does, but amortized per
  * micro-batch); state size = one (band → doc_id) entry per distinct
  * band. Exact-dup streaming is just `dropDuplicates` on md5(text) with
  * a watermark (see LakeLayoutSpec).
  */
object DedupStream {

  case class BandHit(band: String, doc_id: Long, first_doc: Long)

  /** Max occupants remembered per band — bounds state for hot bands
    * (a pathological band that attracts everything must not grow state
    * unboundedly; beyond the cap, new docs still pair with the retained
    * occupants, which is LSH-recall-degrading but safe).
    */
  val MaxOccupants = 32

  /** Bounded-state streaming EXACT dedup: drop texts already seen within
    * the watermark horizon. Plain `dropDuplicates` (Curation.curateStream)
    * keeps every md5 ever seen — exact forever, but state grows with the
    * corpus; at 100 TB the sustainable posture is this one, where a key's
    * state is dropped once the watermark passes it (crawl/ingest dups
    * overwhelmingly arrive close together, so the horizon trades a
    * bounded recall loss for bounded state).
    */
  def exactDedupBounded(docs: DataFrame, tsCol: String, horizon: String): DataFrame = {
    // Null-text keying (md5(null) is null and the dedup operator treats
    // null keys as EQUAL, so they need their own key): when the stream
    // carries doc_id, key null-text rows by it — distinct docs stay
    // distinct AND an at-least-once redelivery of the same doc still
    // dedups. Without doc_id (only text+ts required), fall back to a
    // per-row uuid(): null-text rows simply pass through.
    val nullTextKey =
      if (docs.columns.contains("doc_id"))
        coalesce(concat(lit("null:"), col("doc_id").cast("string")), expr("uuid()"))
      else expr("uuid()")
    // internal key name so a caller's own text_md5 column survives
    docs.withColumn("_dedup_key", coalesce(md5(col("text")), nullTextKey))
      .withWatermark(tsCol, horizon)
      .dropDuplicatesWithinWatermark("_dedup_key")
      .drop("_dedup_key")
  }

  /** Streaming incremental dedup against a STATIC corpus: each arriving
    * doc's shingles/signature/bands are computed statelessly per row
    * (minhashSignaturesNarrow — no aggregation state, append-safe), band
    * keys stream-static-joined against the corpus band table, and LSH
    * hits Jaccard-verified against the corpus shingle sets. The batch
    * analog is Dedup.newVersusCorpus; here the 'new batch' is every
    * micro-batch of the stream.
    *
    * Scale shape: the corpus side is computed ONCE per micro-batch plan
    * from static data (persist `corpus`-derived inputs or point them at
    * a materialized band/shingle table for big corpora); the stream side
    * is micro-batch-sized. Append mode, no streaming state at all —
    * dedup-against-corpus needs none, which is what makes it the
    * sustainable 100 TB ingest shape (vs self-dedup's per-band state).
    */
  def versusCorpus(docs: DataFrame, corpus: DataFrame, threshold: Double): DataFrame =
    // One equi-join does candidates AND verification; a pair sharing k
    // of 4 bands appears k times, deduped STATELESSLY by keeping only
    // the min-common-band row (streaming dropDuplicates would accrete
    // one state entry per pair forever — against a static corpus, no
    // state is needed at all). For big corpora pass a pre-written
    // band-bucketed table to Dedup.newVersusCorpusPrebuilt directly.
    Dedup.newVersusCorpusPrebuilt(docs, Dedup.corpusBandTable(corpus), threshold)

  /** docs(doc_id, text) stream → append-stream of candidate pairs: each
    * arriving doc against EVERY retained earlier occupant of the band
    * (pairing only against the first occupant would silently miss two
    * later-arriving near-dups that share a band with an earlier
    * unrelated doc). Downstream consumers dedupe multi-band hits.
    */
  def lshCandidates(docs: DataFrame): Dataset[BandHit] = {
    val spark = docs.sparkSession
    import spark.implicits._
    val sigs = Dedup.minhashSignaturesNarrow(Dedup.shingleSets(docs))
    val bandKeys = (0 until 4).map(j =>
      concat_ws(":", lit(j), col(s"s${2 * j}"), col(s"s${2 * j + 1}")))
    sigs.select(col("doc_id"), explode(array(bandKeys: _*)).as("band"))
      .as[(Long, String)]
      .groupByKey(_._2)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (band: String, rows: Iterator[(Long, String)], state: GroupState[List[Long]]) =>
          var occupants = state.getOption.getOrElse(Nil)
          val hits = Seq.newBuilder[BandHit]
          rows.map(_._1).toSeq.sorted.foreach { id =>
            if (!occupants.contains(id)) {
              occupants.foreach(prev => hits += BandHit(band, id, prev))
              if (occupants.size < MaxOccupants) occupants = occupants :+ id
            }
          }
          state.update(occupants)
          hits.result().iterator
      }
  }
}
