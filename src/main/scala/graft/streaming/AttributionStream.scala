package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming last-touch attribution — the stateful twin of
  * `Queries.attributionQ`: per user the state is ONE long (the latest
  * click's event time); every purchase is emitted immediately with
  * its attributed click and lag. This is the minimal-state shape the
  * batch window can't give in a stream (the window would need the
  * whole user history; the state needs 8 bytes per user).
  *
  * Events may arrive out of order WITHIN a micro-batch — the batch is
  * sorted per user in event-time order before the fold, so replaying
  * a log through the stream matches the batch query whenever
  * cross-batch arrival respects event time (the monitor's deployment
  * contract; pair with a watermark sized by q_disorder).
  */
object AttributionStream {

  case class Ev(user_id: Long, event_id: Long, event_type: String, us: Long)
  case class Attr(user_id: Long, event_id: Long, purchase_us: Long,
      click_us: Option[Long], lag_us: Option[Long])

  /** `events` must have (user_id, event_id, event_type, us) columns. */
  def lastTouch(events: DataFrame): Dataset[Attr] = {
    val spark = events.sparkSession
    import spark.implicits._
    events.select(col("user_id"), col("event_id"), col("event_type"), col("us"))
      .as[Ev]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (user: Long, batch: Iterator[Ev], state: GroupState[Long]) => {
          var lastClick = state.getOption
          val out = scala.collection.mutable.ArrayBuffer[Attr]()
          batch.toSeq.sortBy(e => (e.us, e.event_id)).foreach { e =>
            e.event_type match {
              case "click" =>
                if (lastClick.forall(_ <= e.us)) lastClick = Some(e.us)
              case "purchase" =>
                // any click folded before this purchase in (us,
                // event_id) order IS a preceding row of the batch
                // window — no extra time filter (equal-us clicks with
                // smaller event_id attribute there too)
                out += Attr(user, e.event_id, e.us,
                  lastClick, lastClick.map(e.us - _))
              case _ => ()
            }
          }
          lastClick.foreach(state.update)
          out.iterator
        })
  }
}
