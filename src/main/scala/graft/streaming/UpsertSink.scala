package graft.streaming

import scala.collection.concurrent.TrieMap

import org.apache.spark.sql.{DataFrame, Row}

/** PK-upsert sink driven from `foreachBatch` — the Spark equivalent of
  * the reference's three `PRIMARY KEY ... NOT ENFORCED` JDBC sink tables
  * (`LogAnalysis.java:100-115,156-171,220-237`; MySQL DDL
  * `README.md:248-272`): each micro-batch's changelog rows overwrite by
  * key, so the external table always holds current aggregate state.
  *
  * This implementation keeps the table in memory (tests / local runs).
  * The `merge` seam is exactly where a production deployment issues
  * `INSERT ... ON DUPLICATE KEY UPDATE` over a JDBC connection per
  * partition — the batch → key → row flow is identical.
  */
class UpsertSink(keyCols: Seq[String]) extends Serializable {

  /** key values → latest row (upsert semantics). */
  val table: TrieMap[Seq[Any], Seq[Any]] = TrieMap.empty

  /** foreachBatch hook: upsert every row of the micro-batch output.
    * `collect` here mirrors the reference sink's per-record JDBC writes;
    * the batch is already the *aggregated* changelog (small: one row per
    * touched key), not raw events.
    */
  def merge(batch: DataFrame, batchId: Long): Unit = {
    val cols = batch.columns
    val keyIdx = keyCols.map(cols.indexOf(_))
    batch.collect().foreach { row =>
      val vals = row.toSeq
      table.put(keyIdx.map(vals(_)), vals)
    }
  }

  /** Complete-mode hook: the batch IS the whole table. Collects the new
    * rows first (a failure here leaves the previous good state intact),
    * then upserts them and deletes keys absent from the batch — a
    * concurrent snapshot reader never observes an empty or partial
    * table, only a mix of previous/current rows per key.
    */
  def replace(batch: DataFrame, batchId: Long): Unit = {
    val cols = batch.columns
    val keyIdx = keyCols.map(cols.indexOf(_))
    val rows = batch.collect().map { row =>
      val vals = row.toSeq
      keyIdx.map(vals(_)) -> vals
    }
    val keep = rows.map(_._1).toSet
    rows.foreach { case (k, v) => table.put(k, v) }
    table.keys.foreach { k => if (!keep.contains(k)) table.remove(k) }
  }

  def snapshot: Map[Seq[Any], Seq[Any]] = table.toMap
}
