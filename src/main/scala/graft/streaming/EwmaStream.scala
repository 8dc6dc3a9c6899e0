package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig, ValueState}

/** Streaming EWMA monitor: the batch fixed-point recurrence
  * (Queries.ewmaQ — s ← s + (10⁶·x − s) div 8, exact integers) kept
  * incrementally per key on a ValueState. Each micro-batch's
  * per-key count advances the smoothed level ONE step and emits
  * (key, x, ewma_e6, resid_e6) — the drift/anomaly changelog a
  * monitoring sink consumes. Because the recurrence is integral and
  * the state is just one long, a replay from checkpoint reproduces
  * the trajectory bit-identically, and the streaming values equal the
  * batch fold over the same per-batch series (EwmaStreamSpec pins
  * that equality).
  *
  * Scale shape: state = one long per key; the batch's rows for a key
  * stream through the processor once and reduce to a single count
  * (no second stateful operator upstream — Structured Streaming
  * restricts stateful-on-stateful chaining anyway).
  */
class EwmaProcessor
    extends StatefulProcessor[String, (String, Long), (String, Long, Long, Long)] {

  @transient private var level: ValueState[Long] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    level = getHandle.getValueState[Long]("ewma", Encoders.scalaLong, TTLConfig.NONE)

  override def handleInputRows(key: String, rows: Iterator[(String, Long)],
      timerValues: TimerValues): Iterator[(String, Long, Long, Long)] = {
    var x = 0L
    rows.foreach(r => x += r._2)
    val s =
      if (!level.exists()) x * 1000000L
      else {
        val prev = level.get()
        prev + (x * 1000000L - prev) / 8L
      }
    level.update(s)
    Iterator.single((key, x, s, x * 1000000L - s))
  }
}

object EwmaStream {

  /** (event_type) stream → per-micro-batch counts → EWMA changelog:
    * (event_type, x, ewma_e6, resid_e6), one row per key per batch.
    */
  def apply(events: DataFrame): Dataset[(String, Long, Long, Long)] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .select(col("event_type").as[String])
      .flatMap(t => Iterator.single((t, 1L)))
      .groupByKey(_._1)
      .transformWithState(new EwmaProcessor,
        TimeMode.None(), OutputMode.Update())
  }
}
