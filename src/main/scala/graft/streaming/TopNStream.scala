package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{MapState, OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig, ValueState}

/** Top-N buffer: the current top-k (item, cnt) pairs in rank order,
  * k + k scalars per ranking context regardless of item cardinality.
  */
case class TopNBuffer(items: Seq[String], cnts: Seq[Long])

/** Incremental streaming Top-N — the rank-operator semantics behind
  * the reference's continuous `ORDER BY cnt DESC LIMIT 10`
  * (`LogAnalysis.java:184-185,255-256`), as a keyed stateful-v2
  * processor instead of a complete-mode sort or a foreachBatch
  * row_number replay (the library's 8th transformWithState pattern):
  * each ranking context keeps (a) the full item→count MapState —
  * point-reads/writes only, never scanned — and (b) a k-entry
  * ValueState buffer of the current top-k. A batch folds its deltas
  * per item (sum — commutative, so shuffle arrival order cannot
  * matter), point-updates the touched counts, and re-ranks ONLY
  * {old top-k} ∪ {touched items}: with non-negative deltas an
  * untouched item outside the buffer was displaced by counts that
  * never decrease, so it cannot re-enter without a delta of its own —
  * the update-fast rank argument. Emits the refreshed (rank, item,
  * cnt) rows per updated context per batch: an item leaving the top-k
  * simply stops appearing at its old rank in the next refresh, which
  * is the collapsed retract+insert changelog a keyed upsert sink
  * applies directly (same contract as the reference's MySQL sink).
  *
  * State: |items| counters in RocksDB (the same shape Blink's rank
  * keeps) + 2k scalars; per-batch work is O(touched + k log k).
  */
class TopNProcessor(k: Int)
    extends StatefulProcessor[String, (String, String, Long), (String, Int, String, Long)] {

  @transient private var counts: MapState[String, Long] = _
  @transient private var top: ValueState[TopNBuffer] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
    counts = getHandle.getMapState[String, Long]("cnt",
      Encoders.STRING, Encoders.scalaLong, TTLConfig.NONE)
    top = getHandle.getValueState[TopNBuffer]("top",
      Encoders.product[TopNBuffer], TTLConfig.NONE)
  }

  override def handleInputRows(ctx: String, rows: Iterator[(String, String, Long)],
      timerValues: TimerValues): Iterator[(String, Int, String, Long)] = {
    val delta = scala.collection.mutable.Map.empty[String, Long]
    rows.foreach { case (_, item, d) =>
      require(d >= 0L,
        "TopNProcessor requires non-negative deltas (monotone counts)")
      delta(item) = delta.getOrElse(item, 0L) + d
    }
    val touched = delta.iterator.map { case (item, d) =>
      val c = (if (counts.containsKey(item)) counts.getValue(item) else 0L) + d
      counts.updateValue(item, c)
      item -> c
    }.toMap
    val old = if (top.exists()) top.get() else TopNBuffer(Nil, Nil)
    val cand = old.items.zip(old.cnts)
      .filterNot { case (i, _) => touched.contains(i) } ++ touched.toSeq
    // deterministic rank order: count desc, item asc on ties
    val next = cand.sortBy { case (i, c) => (-c, i) }.take(k)
    top.update(TopNBuffer(next.map(_._1), next.map(_._2)))
    next.iterator.zipWithIndex.map { case ((i, c), r) => (ctx, r + 1, i, c) }
  }
}

object TopNStream {

  /** (ctx, item, delta) insert-only stream → per-context refreshed
    * top-k changelog (ctx, rank, item, cnt), one full top-k per
    * updated context per micro-batch, ranks deterministic under ties.
    */
  def apply(events: DataFrame, k: Int = 10): Dataset[(String, Int, String, Long)] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .select(col("ctx").cast("string"), col("item").cast("string"),
        col("delta").cast("long"))
      .as[(String, String, Long)]
      .groupByKey(_._1)
      .transformWithState(new TopNProcessor(k),
        TimeMode.None(), OutputMode.Update())
  }
}
