package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig, ValueState}

/** SPRT monitor state: trial/success counts, the cumulative
  * log-likelihood ratio at e9, and the sticky verdict (empty until a
  * boundary crossing; then frozen with the trial count it fired at).
  * Four numbers + a tag per key, regardless of stream length.
  */
case class SprtState(n: Long, k: Long, llrE9: Long, decision: String, decidedAtN: Long)

/** Streaming Wald SPRT — the always-on sequential A/B monitor as a
  * per-key stateful operator (the streaming twin of the batch
  * [[graft.Queries.sprtQ]]): each key accumulates the Bernoulli
  * log-likelihood ratio for H₀ p=0.18 vs H₁ p=0.22 with the SAME
  * shared e9 integer log constants, emits its trajectory point every
  * micro-batch, and FREEZES the moment a ±ln(19) boundary (α=β=0.05)
  * is crossed — evidence after the stop is ignored, which is the
  * sequential-test contract (peeking past the boundary is what the
  * SPRT exists to forbid). State is 4 integers + a tag per key; each
  * batch's rows stream through once — the exact shape that holds at
  * any event volume.
  */
class SprtProcessor
    extends StatefulProcessor[String, (String, Long, Boolean), (String, Long, Long, Long, String, Long)] {

  private val La = 200670695L // floor(ln(0.22/0.18)*1e9+0.5)
  private val Lb = -50010421L // floor(ln(0.78/0.82)*1e9+0.5)
  private val Bound = 2944438979L // floor(ln(19)*1e9+0.5)

  @transient private var st: ValueState[SprtState] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    st = getHandle.getValueState[SprtState]("sprt", Encoders.product[SprtState], TTLConfig.NONE)

  override def handleInputRows(key: String, rows: Iterator[(String, Long, Boolean)],
      timerValues: TimerValues): Iterator[(String, Long, Long, Long, String, Long)] = {
    var s = if (st.exists()) st.get() else SprtState(0L, 0L, 0L, "continue", -1L)
    // Iterator order after the groupByKey shuffle is not deterministic;
    // a mixed batch that crosses the boundary mid-batch would freeze a
    // different (n, k, llr) per replay. Sort on the caller-supplied
    // event seq so the frozen state is a pure function of the data
    // (batch-sized buffer — bounded by the micro-batch, not the stream).
    rows.toSeq.sortBy(_._2).foreach { r =>
      if (s.decision == "continue") {
        val k2 = s.k + (if (r._3) 1L else 0L)
        val llr = s.llrE9 + (if (r._3) La else Lb)
        val n2 = s.n + 1
        val dec =
          if (llr >= Bound) "h1"
          else if (llr <= -Bound) "h0"
          else "continue"
        s = SprtState(n2, k2, llr, dec, if (dec == "continue") -1L else n2)
      }
      // decided keys ignore further rows: the test has stopped
    }
    st.update(s)
    Iterator.single((key, s.n, s.k, s.llrE9, s.decision, s.decidedAtN))
  }
}

object SprtStream {

  /** (key, seq, success) stream → per-key SPRT changelog:
    * (key, trials, successes, llr_e9, decision, decided_at_n), one row
    * per key per micro-batch; `decision` freezes at the first boundary
    * crossing. `seq` is the deterministic within-key order (event id /
    * timestamp) — the frozen state is replay-stable because each batch
    * folds its rows in seq order, not shuffle-arrival order.
    */
  def apply(events: DataFrame): Dataset[(String, Long, Long, Long, String, Long)] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .select(col("key").cast("string"), col("seq").cast("long"),
        col("success").cast("boolean"))
      .as[(String, Long, Boolean)]
      .groupByKey(_._1)
      .transformWithState(new SprtProcessor,
        TimeMode.None(), OutputMode.Update())
  }
}
