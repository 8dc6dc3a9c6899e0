package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Custom stateful streaming: gap-based session windows via
  * `flatMapGroupsWithState` — the KeyValueGroupedDataset state API the
  * built-in windowed aggregates can't express (a session closes when the
  * key goes quiet, not on a fixed grid).
  *
  * State per key = the open session; event-time timeout fires when the
  * watermark passes last_event + gap, emitting the closed session. This
  * is exactly how per-key state scales on a cluster: state lives in the
  * executor's StateStore hash-partitioned by key, and the timeout sweep
  * is incremental per micro-batch.
  */
object SessionStream {

  case class Click(user_id: Long, ts: Timestamp)
  case class OpenSession(start: Long, last: Long, n: Long)
  case class ClosedSession(user_id: Long, session_start: Timestamp, n_events: Long, duration_sec: Long)

  def sessionize(events: DataFrame, gapSeconds: Long, watermark: String): Dataset[ClosedSession] = {
    val spark = events.sparkSession
    import spark.implicits._

    def close(userId: Long, s: OpenSession): ClosedSession =
      ClosedSession(userId, new Timestamp(s.start * 1000L), s.n, s.last - s.start)

    events
      .withWatermark("ts", watermark)
      .select(col("user_id"), col("ts"))
      .as[Click]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (userId: Long, batch: Iterator[Click], state: GroupState[OpenSession]) =>
          if (batch.isEmpty && state.hasTimedOut) {
            // watermark passed last+gap: the open session is final
            val out = state.getOption.map(close(userId, _)).toSeq
            state.remove()
            out.iterator
          } else {
            val closed = Seq.newBuilder[ClosedSession]
            var open = state.getOption
            batch.toSeq.sortBy(_.ts.getTime).foreach { c =>
              val sec = c.ts.getTime / 1000L
              open match {
                case Some(s) if sec - s.last <= gapSeconds =>
                  open = Some(OpenSession(s.start, math.max(s.last, sec), s.n + 1))
                case Some(s) =>
                  closed += close(userId, s)
                  open = Some(OpenSession(sec, sec, 1))
                case None =>
                  open = Some(OpenSession(sec, sec, 1))
              }
            }
            open.foreach { s =>
              state.update(s)
              state.setTimeoutTimestamp((s.last + gapSeconds) * 1000L)
            }
            closed.result().iterator
          }
      }
  }
}
