package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.logs.LogParser

/** Structured-Streaming form of the reference pipeline
  * (`LogAnalysis.java:34-94`): unbounded lines → parse → filter →
  * continuously-updating aggregates → upsert sink.
  *
  * Reference ⇄ Spark mapping (SURVEY.md §1.3):
  *   - Kafka `DataStream<String>`      → `readStream` lines (kafka/file/
  *     MemoryStream — the transforms below are source-agnostic)
  *   - proctime temp view               → `current_timestamp()` per batch
  *   - continuous `count(1) GROUP BY`   → update-mode streaming aggregate
  *     (state in Spark's StateStore, keyed exchange on the group key)
  *   - `PRIMARY KEY ... NOT ENFORCED` JDBC upsert sink (`LogAnalysis
  *     .java:100-115`) → `foreachBatch` + key-wise MERGE (here an
  *     in-memory PK table; swap the merge lambda for `INSERT ... ON
  *     DUPLICATE KEY UPDATE` against a real JDBC pool at deploy time)
  *   - streaming Top-N (`ORDER BY cnt DESC LIMIT 10`,
  *     `LogAnalysis.java:184-185`) → per-batch `row_number() <= n` inside
  *     foreachBatch (Blink's rank-operator rewrite, done by hand)
  *
  * The reference is processing-time only (no watermarks — SURVEY.md §2.3);
  * [[windowedEventCounts]] adds the event-time+watermark variant Spark
  * gives for free, as the extension surface.
  */
object LogStream {

  /** Parse an unbounded `line` column into the analytics 4-tuple; narrow
    * (stateless) — chains into the source micro-batch with no shuffle.
    */
  def parsedTuples(lines: DataFrame): DataFrame =
    LogParser.accessTuples(lines).withColumn("proctime", current_timestamp())

  /** Continuous per-section PV counts against a static dim snapshot
    * (stream-static broadcast join — Spark's semantic for the reference's
    * `FOR SYSTEM_TIME AS OF proctime` lookup join, `LogAnalysis.java:251`).
    */
  def sectionCounts(parsed: DataFrame, sectionDim: DataFrame): DataFrame =
    parsed.filter(col("section_id") =!= 0)
      .join(broadcast(sectionDim), col("section_id") === col("fid"))
      .groupBy(col("section_id"), col("name"))
      .agg(count(lit(1)).as("section_pv"))

  /** Continuous per-article PV counts (`LogAnalysis.java:173-185`). */
  def articleCounts(parsed: DataFrame, articleDim: DataFrame): DataFrame =
    parsed.filter(col("article_id") =!= 0)
      .join(broadcast(articleDim), col("article_id") === col("tid"))
      .groupBy(col("article_id"), col("subject"))
      .agg(count(lit(1)).as("article_pv"))

  /** Continuous per-client totals (`LogAnalysis.java:117-130`). */
  def clientCounts(parsed: DataFrame): DataFrame =
    parsed.filter(col("article_id") =!= 0 || col("section_id") =!= 0)
      .groupBy(col("client_ip"))
      .agg(count(lit(1)).as("client_access_cnt"))

  /** Stream-stream interval join (attribution): each purchase matched to
    * the SAME user's views within the trailing `windowSeconds` —
    * view.ts ∈ [purchase.ts - window, purchase.ts]. Both sides carry
    * watermarks, so the join state is BOUNDED: a buffered view row is
    * evicted once the purchase watermark passes view.ts + window (Spark
    * derives the eviction bound from the range condition), which is what
    * lets this run forever on a 1000-executor cluster. The state exchange
    * hashes on user_id — at scale the same hot-key note as the batch
    * as-of applies (pre-filter bot traffic, or bucket the attribution
    * window upstream).
    *
    * Inner join: purchases with no prior view in-window are dropped
    * (funnel semantics). Append output mode.
    */
  def attributionJoin(
      views: DataFrame, purchases: DataFrame,
      watermarkDelay: String, windowSeconds: Long): DataFrame = {
    val v = views
      .select(col("event_id").as("view_id"), col("user_id").as("v_user"), col("ts").as("v_ts"))
      .withWatermark("v_ts", watermarkDelay)
    val p = purchases
      .select(col("event_id").as("purchase_id"), col("user_id"), col("ts").as("p_ts"))
      .withWatermark("p_ts", watermarkDelay)
    p.join(v, expr(
      s"""user_id = v_user AND
         |v_ts <= p_ts AND
         |v_ts >= p_ts - INTERVAL $windowSeconds SECONDS""".stripMargin))
      .select(col("purchase_id"), col("user_id"), col("p_ts"), col("view_id"), col("v_ts"))
  }

  /** LEFT OUTER variant of [[attributionJoin]]: unattributed purchases
    * still emit (null view columns) — but only once the watermark
    * passes the purchase's join window, because until then a matching
    * view could still arrive. Both watermarks bound the join state;
    * the outer row's emission latency IS the watermark delay — the
    * price of "every purchase appears exactly once".
    */
  def attributionJoinOuter(
      views: DataFrame, purchases: DataFrame,
      watermarkDelay: String, windowSeconds: Long): DataFrame = {
    val v = views
      .select(col("event_id").as("view_id"), col("user_id").as("v_user"), col("ts").as("v_ts"))
      .withWatermark("v_ts", watermarkDelay)
    val p = purchases
      .select(col("event_id").as("purchase_id"), col("user_id"), col("ts").as("p_ts"))
      .withWatermark("p_ts", watermarkDelay)
    p.join(v, expr(
      s"""user_id = v_user AND
         |v_ts <= p_ts AND
         |v_ts >= p_ts - INTERVAL $windowSeconds SECONDS""".stripMargin), "left_outer")
      .select(col("purchase_id"), col("user_id"), col("p_ts"), col("view_id"), col("v_ts"))
  }

  /** Event-time tumbling window with watermark (extension beyond the
    * reference's processing-time-only surface).
    */
  def windowedEventCounts(events: DataFrame, watermarkDelay: String, windowLen: String): DataFrame =
    events
      .withWatermark("ts", watermarkDelay)
      .groupBy(window(col("ts"), windowLen), col("event_type"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("window.start").as("win_start"), col("event_type"), col("n_events"))
}
