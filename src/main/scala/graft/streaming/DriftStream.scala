package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** Streaming distribution-drift monitoring: the exact two-sample KS
  * statistic (the q_ks_drift arithmetic — integer cross-multiplied
  * CDF steps, no float ever) computed per micro-batch against a static
  * reference distribution. This is the ingest guard that catches "the
  * new crawl's length distribution looks nothing like the corpus"
  * BEFORE the batch is admitted — the drift sibling of
  * [[graft.ops.Curation.reconcileStream]]'s dedup loop.
  *
  * Scale shape: the reference collapses to its (value, count) support
  * once (domain-bounded — document lengths); each micro-batch adds one
  * batch-sized count aggregate plus a support-sized window. Nothing
  * about the corpus is re-scanned per batch.
  */
object DriftStream {

  /** Exact two-sample KS between `sample` and `ref` (each a single
    * `v: long` column of observations): one row
    * (n_sample, n_ref, d_num, d_e6, at_value) where
    * d_e6 = sup|F_s − F_r|·10⁶ computed as
    * max|cumS·nR − cumR·nS|·10⁶ div (nS·nR) — all exact integers.
    * Degenerate inputs (either side empty) yield d_e6 = null rather
    * than a division error. The cumulative window runs over the
    * distinct-value support only, keyed by singleton_key (by-design
    * single partition over a domain-bounded row set).
    */
  def ksStatistic(sample: DataFrame, ref: DataFrame): DataFrame = {
    val tagged = sample.select(col("v"), lit(1L).as("s"), lit(0L).as("r"))
      .unionAll(ref.select(col("v"), lit(0L).as("s"), lit(1L).as("r")))
    val pv = tagged.groupBy(col("v"))
      .agg(sum(col("s")).as("cs"), sum(col("r")).as("cr"))
    val w = Window
      .partitionBy(graft.functions.GraftFunctions.singleton_key(col("v")))
      .orderBy(col("v"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val tot = pv.groupBy().agg(sum(col("cs")).as("ns"), sum(col("cr")).as("nr"))
    pv.withColumn("fs", sum(col("cs")).over(w))
      .withColumn("fr", sum(col("cr")).over(w))
      .crossJoin(broadcast(tot))
      .withColumn("diff", abs(col("fs") * col("nr") - col("fr") * col("ns")))
      .groupBy(col("ns"), col("nr"))
      .agg(min(struct((-col("diff")).as("nd"), col("v"))).as("best"))
      .select(col("ns").as("n_sample"), col("nr").as("n_ref"),
        (-col("best.nd")).as("d_num"),
        when(col("ns") * col("nr") > 0,
          expr("(-best.nd) * 1000000 div (ns * nr)")).as("d_e6"),
        col("best.v").as("at_value"))
  }

  /** Per micro-batch monitor: for each batch of the streaming frame
    * `stream` (a `v: long` column), hand `onResult` the batch id and
    * the one-row KS frame vs the static `ref`.
    */
  def ksMonitor(stream: DataFrame, ref: DataFrame)(
      onResult: (Long, DataFrame) => Unit): StreamingQuery =
    stream.writeStream.outputMode("append")
      .foreachBatch { (batch: DataFrame, id: Long) =>
        onResult(id, ksStatistic(batch, ref))
      }
      .start()
}
