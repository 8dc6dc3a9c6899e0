package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, ListState, OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig, ValueState}

/** Timer-driven session finalization on the state API v2 — the second
  * half of transformWithState coverage (TwsClientCounts covers
  * ValueState+TTL; this covers ListState + event-time TIMERS).
  *
  * Each user's event timestamps accumulate in a ListState; every batch
  * re-arms ONE event-time timer at last_event + gap. When the watermark
  * passes the timer, the session is finalized and emitted exactly once:
  * (user_id, n_events, duration_ms), state cleared. This is how closed
  * sessions are emitted in APPEND semantics without a windowed
  * aggregation — the session boundary is decided by the timer, not by
  * a fixed window, and state is dropped eagerly on emission.
  *
  * Scale shape: state per key = its open session's timestamps + one
  * timer entry; both are freed the moment the watermark closes the
  * session. Timers are stored in the state backend (RocksDB-capable),
  * not on the heap.
  */
class SessionFinalizeProcessor(gapMs: Long)
    extends StatefulProcessor[Long, (Long, Long), (Long, Long, Long)] {

  @transient private var events: ListState[Long] = _
  @transient private var armed: ValueState[Long] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
    events = getHandle.getListState[Long]("events", Encoders.scalaLong, TTLConfig.NONE)
    armed = getHandle.getValueState[Long]("armed", Encoders.scalaLong, TTLConfig.NONE)
  }

  override def handleInputRows(key: Long, rows: Iterator[(Long, Long)],
      timerValues: TimerValues): Iterator[(Long, Long, Long)] = {
    var maxTs = if (armed.exists()) armed.get() - gapMs else Long.MinValue
    rows.foreach { r =>
      events.appendValue(r._2)
      if (r._2 > maxTs) maxTs = r._2
    }
    // one armed timer per key: re-arm at the new session horizon
    if (armed.exists()) getHandle.deleteTimer(armed.get())
    getHandle.registerTimer(maxTs + gapMs)
    armed.update(maxTs + gapMs)
    Iterator.empty
  }

  override def handleExpiredTimer(key: Long, timerValues: TimerValues,
      expiredTimerInfo: ExpiredTimerInfo): Iterator[(Long, Long, Long)] = {
    val ts = events.get().toSeq
    events.clear()
    armed.clear()
    if (ts.isEmpty) Iterator.empty
    else Iterator.single((key, ts.size.toLong, ts.max - ts.min))
  }
}

object SessionTimers {

  /** events(user_id, ts) stream → append-stream of FINALIZED sessions
    * (user_id, n_events, duration_ms), emitted when the event-time
    * watermark passes last_event + gap. Input must carry a `ts`
    * timestamp column; the watermark delay bounds how late events may
    * arrive and still join their session.
    */
  def finalizedSessions(events: DataFrame, gap: String = "30 minutes",
      watermarkDelay: String = "10 seconds"): Dataset[(Long, Long, Long)] = {
    val spark = events.sparkSession
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val gapMs = org.apache.spark.sql.catalyst.util.IntervalUtils
      .stringToInterval(org.apache.spark.unsafe.types.UTF8String.fromString(gap))
    val ms = org.apache.spark.sql.catalyst.util.IntervalUtils.getDuration(
      gapMs, java.util.concurrent.TimeUnit.MILLISECONDS)
    events
      .withWatermark("ts", watermarkDelay)
      .select(col("user_id").cast("long").as[Long],
        expr("unix_micros(ts) div 1000").as[Long])
      .groupByKey(_._1)
      .transformWithState(new SessionFinalizeProcessor(ms),
        TimeMode.EventTime(), OutputMode.Append())
  }
}
