package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.StreamingQuery

import graft.ops.Similarity

/** Streaming similarity search against a STATIC corpus — the ANN analog
  * of [[DedupStream.versusCorpus]]: each arriving micro-batch of query
  * vectors is multi-table-coded STATELESSLY (per-row projection, no
  * aggregation state), bucket-joined against the corpus code table, and
  * exact-cosine reranked. Rerank (a per-query row_number) runs inside
  * foreachBatch because rank windows aren't defined on unbounded
  * streams — and per batch it is exactly the batch operator, so
  * streaming results equal the batch run on the same accumulated
  * queries (AnnStreamSpec proves it).
  *
  * Scale shape: the corpus side is materialized ONCE (pass
  * `corpusCodes` — persist it or point at a written code table); the
  * per-batch work is batch-sized codes + a broadcast of the batch's
  * codes into the bucket join. No streaming state at all, which is the
  * sustainable ingest-scoring shape (new vectors scored against a
  * trained/curated corpus as they arrive).
  */
object AnnStream {

  /** Wire the loop: `queries` is a STREAMING frame of
    * `(vec_id, embedding)` (already normalized, like `corpus`);
    * `onBatch` receives each micro-batch's top-k result
    * `(query_id, neighbor_id, rnk, cos_sim)`.
    */
  def topKVersusCorpus(
      queries: DataFrame, corpus: DataFrame, k: Int,
      corpusCodes: Option[DataFrame] = None)(
      onBatch: DataFrame => Unit): StreamingQuery =
    queries.writeStream.outputMode("append")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        onBatch(Similarity.lshMultiTableTopK(batch, corpus, k,
          corpusCodes = corpusCodes))
      }
      .start()

  /** PQ/ADC variant of the same stateless loop, with the corpus
    * reduced to its PQ CODES (built once, alongside the codebooks) —
    * the compressed-corpus ingest scorer: per micro-batch only the
    * batch's distance LUT is built and broadcast, the corpus side is
    * the narrow static code table, and raw corpus vectors never enter
    * the stream at all. Per batch it is exactly
    * [[graft.ops.Similarity.pqAdcTopK]], so streaming results equal
    * the batch run on the same accumulated queries.
    */
  def pqTopKVersusCorpus(
      queries: DataFrame, corpusCodes: DataFrame, books: DataFrame,
      k: Int, m: Int)(
      onBatch: DataFrame => Unit): StreamingQuery =
    queries.writeStream.outputMode("append")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        onBatch(Similarity.pqAdcTopK(batch, corpusCodes, books, k, m))
      }
      .start()

  /** IVFADC variant — the composed index served streaming: the static
    * side is the coarse centroid model plus the residual code table
    * (codes + ivf_cell, built once); per micro-batch only the batch's
    * probed cells and their residual LUTs are derived (batch-sized ×
    * nprobe·m·ksub — broadcast), and the probed equi-join reads
    * ~nprobe/ncells of the code table. Still zero streaming state. Per
    * batch it is exactly [[graft.ops.Similarity.ivfPqTopK]], so
    * streaming results equal the batch run on the same accumulated
    * queries (AnnStreamSpec proves it).
    */
  def ivfPqTopKVersusCorpus(
      queries: DataFrame, corpusCodes: DataFrame, cents: DataFrame,
      books: DataFrame, k: Int, m: Int, nprobe: Int)(
      onBatch: DataFrame => Unit): StreamingQuery =
    queries.writeStream.outputMode("append")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        onBatch(Similarity.ivfPqTopK(batch, corpusCodes, cents, books, k, m, nprobe))
      }
      .start()
}
