package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** Streaming volume-anomaly monitoring: the exact modified-z
  * (robust-z) statistic of each micro-batch's row volume against a
  * static reference distribution of historical per-period volumes —
  * the q_robust_z arithmetic (two nested 2×-median tricks, the
  * 1349·dev₂ vs 3500·mad₄ integer gate, no sqrt and no float) applied
  * at ingest. This is the pager alarm that catches "this batch is
  * 6 MADs above any day we've ever seen" BEFORE downstream jobs
  * inherit the surge — the volume sibling of [[DriftStream]]'s
  * distribution check.
  *
  * Scale shape: the reference collapses ONCE to two integers
  * (med₂, mad₄ — computed here per call because the reference is
  * domain-bounded: one row per historical period); each micro-batch
  * contributes a single count aggregate. Nothing is re-scanned.
  */
object AnomalyStream {

  /** Exact robust z of the observation `x` (a one-row `x: long`
    * frame — typically a batch's row count) against the reference
    * periods `ref` (an `x: long` column of historical volumes): one
    * row (x, z_e6, is_outlier) with z = 1.349·|2x−med₂|/mad₄ at e6 by
    * integral division and the 3.5 gate compared in integers. A
    * zero-MAD reference (constant history) yields z_e6 = null rather
    * than a division error, with the outlier flag still exact (any
    * deviation from a constant history is an outlier).
    */
  def robustZStatistic(value: DataFrame, ref: DataFrame): DataFrame = {
    val med = ref.groupBy()
      .agg(expr("cast(2 * percentile(x, 0.5) as bigint)").as("m2"))
    val mad = ref.crossJoin(broadcast(med))
      .select(abs(expr("2 * x - m2")).as("dev2"))
      .groupBy().agg(expr("cast(2 * percentile(dev2, 0.5) as bigint)").as("mad4"))
    value.crossJoin(broadcast(med)).crossJoin(broadcast(mad))
      .select(col("x"),
        expr("1349 * abs(2 * x - m2) * 1000 div nullif(mad4, 0)").as("z_e6"),
        when(col("mad4") === 0, expr("2 * x <> m2"))
          .otherwise(expr("1349 * abs(2 * x - m2) > 3500 * mad4"))
          .as("is_outlier"))
  }

  /** Per micro-batch monitor: for each batch of the streaming frame
    * `stream`, hand `onResult` the batch id and the one-row robust-z
    * frame of the batch's ROW COUNT vs the static per-period
    * reference volumes.
    */
  def volumeMonitor(stream: DataFrame, ref: DataFrame,
      checkpoint: Option[String] = None)(
      onResult: (Long, DataFrame) => Unit): StreamingQuery = {
    val w = stream.writeStream.outputMode("append")
      .foreachBatch { (batch: DataFrame, id: Long) =>
        val spark = batch.sparkSession
        import spark.implicits._
        onResult(id, robustZStatistic(Seq(batch.count()).toDF("x"), ref))
      }
    checkpoint.fold(w)(c => w.option("checkpointLocation", c)).start()
  }
}
