package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig, ValueState}

/** The continuous per-client access counter (reference Q2,
  * `LogAnalysis.java:117-130`) on the arbitrary-state v2 API
  * (`transformWithState`, Spark 4) — the modern replacement for
  * `mapGroupsWithState`: typed per-key state handles, optional TTL, and
  * a state backend contract (RocksDB provider required) that scales to
  * state far beyond executor heap.
  *
  * State: one ValueState[Long] per client_ip. Emits the updated total
  * for every key touched by the micro-batch (update-mode changelog —
  * exactly what the PK-upsert sink consumes).
  */
class ClientCountsProcessor(ttl: TTLConfig)
    extends StatefulProcessor[String, (String, Long), (String, Long)] {

  @transient private var count: ValueState[Long] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    count = getHandle.getValueState[Long]("count", Encoders.scalaLong, ttl)

  override def handleInputRows(key: String, rows: Iterator[(String, Long)],
      timerValues: TimerValues): Iterator[(String, Long)] = {
    var add = 0L
    rows.foreach(r => add += r._2)
    val total = (if (count.exists()) count.get() else 0L) + add
    count.update(total)
    Iterator.single((key, total))
  }
}

object TwsClientCounts {

  /** parsed log tuples (as from LogStream.parsedTuples) → continuous
    * (client_ip, client_access_cnt) changelog via transformWithState.
    */
  def apply(parsed: Dataset[org.apache.spark.sql.Row],
      ttl: TTLConfig = TTLConfig.NONE): Dataset[(String, Long)] = {
    val spark = parsed.sparkSession
    import spark.implicits._
    import org.apache.spark.sql.functions._
    parsed
      .filter(col("article_id") =!= 0 || col("section_id") =!= 0)
      .select(col("client_ip").as[String])
      .map(ip => (ip, 1L))
      .groupByKey(_._1)
      .transformWithState(new ClientCountsProcessor(ttl),
        TimeMode.None(), OutputMode.Update())
  }
}
