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
  * point-reads/writes on the hot path — and (b) a k-entry
  * ValueState buffer of the current top-k. A batch folds its deltas
  * per item (sum — commutative, so shuffle arrival order cannot
  * matter), point-updates the touched counts, and re-ranks ONLY
  * {old top-k} ∪ {touched items}: an untouched item outside the
  * buffer is bounded by the OLD buffer floor under the (−cnt, item)
  * total order, so the candidate top-k is exact whenever its new
  * floor is at least as good as the old one — always true for
  * non-negative deltas (counts never decrease: the update-fast rank
  * argument), and checked explicitly when a batch carries
  * RETRACTIONS (negative deltas, Blink's retract-stream rank
  * semantics): only when a retraction LOWERS the buffer floor can a
  * displaced outsider re-qualify, and only then does the processor
  * fall back to one bounded MapState rescan to rebuild the top-k.
  * A count retracted to zero is removed from state entirely. Emits
  * the refreshed (rank, item, cnt) rows per updated context per
  * batch: an item leaving the top-k simply stops appearing at its
  * old rank in the next refresh, which is the collapsed
  * retract+insert changelog a keyed upsert sink applies directly
  * (same contract as the reference's MySQL sink).
  *
  * State: |items| counters in RocksDB (the same shape Blink's rank
  * keeps) + 2k scalars; per-batch work is O(touched + k log k), plus
  * O(|items|) only on a floor-lowering retraction batch.
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
    var retraction = false
    rows.foreach { case (_, item, d) =>
      if (d < 0L) retraction = true
      delta(item) = delta.getOrElse(item, 0L) + d
    }
    val touched = delta.iterator.map { case (item, d) =>
      val c = (if (counts.containsKey(item)) counts.getValue(item) else 0L) + d
      // a changelog may retract, but never below zero — going negative
      // means the upstream emitted a retraction for rows it never
      // inserted, so fail loudly rather than rank garbage
      require(c >= 0L,
        s"TopNProcessor: count for '$item' retracted below zero ($c) — malformed changelog")
      if (c == 0L) counts.removeKey(item) else counts.updateValue(item, c)
      item -> c
    }.toMap
    val old = if (top.exists()) top.get() else TopNBuffer(Nil, Nil)
    val oldPairs = old.items.zip(old.cnts) // stored in rank order
    val cand = oldPairs.filterNot { case (i, _) => touched.contains(i) } ++
      touched.toSeq.filter(_._2 > 0L)
    // deterministic rank order: count desc, item asc on ties
    val fast = cand.sortBy { case (i, c) => (-c, i) }.take(k)
    // The candidate top-k is exact unless an untouched outsider could
    // re-qualify. Outsiders are bounded by the OLD buffer floor (they
    // were outside a correct top-k and received no delta), so the fast
    // path stands whenever the new floor is at least as good under
    // (−cnt, item); a retraction that lowers the floor — or shrinks
    // the candidate set below k while outsiders exist — forces one
    // bounded rescan of the count map.
    val floorDropped = retraction && oldPairs.size >= k && {
      if (fast.size < k) true
      else {
        val (oi, oc) = oldPairs.last
        val (ni, nc) = fast.last
        nc < oc || (nc == oc && ni > oi)
      }
    }
    val next =
      if (!floorDropped) fast
      else counts.iterator().map(p => (p._1, p._2)).toSeq
        .sortBy { case (i, c) => (-c, i) }.take(k)
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
