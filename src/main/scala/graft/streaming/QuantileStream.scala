package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig, ValueState}

/** P² (Jain–Chlamtac 1985) marker state: five marker heights `q`,
  * their current integer positions `n`, and desired positions `np`.
  * Constant size regardless of stream length — THE property that makes
  * a per-key streaming quantile possible (an exact quantile needs the
  * whole history; a per-key sorted buffer is O(arrivals)).
  */
case class P2State(count: Long, q: Array[Double], n: Array[Double], np: Array[Double])

/** Streaming quantile monitor: the P² online estimator kept per key on
  * a ValueState — 5 doubles of marker height + 10 of position per key,
  * never the data. Each micro-batch's values for a key advance the
  * markers in arrival order and emit (key, count, estimate) — the
  * latency/size percentile a serving dashboard reads without ever
  * sorting history. First 4 observations return the exact median of
  * what's been seen (the estimator needs 5 points to initialize).
  *
  * Scale shape: state is 16 numbers per key (vs O(history) for exact);
  * the processor streams each batch's rows once. Accuracy is the
  * documented P² trade — typically within a fraction of a percent of
  * exact on unimodal data (QuantileStreamSpec pins a 5%-of-range bound
  * on scrambled input and exactness below 5 points). For an exact
  * batch quantile the library's `q_percentiles`/`q_approx_quantile`
  * remain the offline path.
  */
class P2Processor(p: Double)
    extends StatefulProcessor[String, (String, Double), (String, Long, Double)] {

  @transient private var st: ValueState[P2State] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    st = getHandle.getValueState[P2State]("p2", Encoders.product[P2State], TTLConfig.NONE)

  private def insert(s: P2State, x: Double): P2State = {
    if (s.count < 5) {
      // collecting phase: park raw values in q, sort at the 5th
      val q = s.q :+ x
      if (s.count + 1 == 5)
        P2State(5, q.sorted, Array(1d, 2d, 3d, 4d, 5d),
          Array(1d, 1 + 2 * p, 1 + 4 * p, 3 + 2 * p, 5d))
      else P2State(s.count + 1, q, s.n, s.np)
    } else {
      val q = s.q.clone(); val n = s.n.clone(); val np = s.np.clone()
      var k =
        if (x < q(0)) { q(0) = x; 0 }
        else if (x >= q(4)) { q(4) = x; 3 }
        else (0 to 3).indexWhere(i => q(i) <= x && x < q(i + 1))
      var i = k + 1
      while (i <= 4) { n(i) += 1; i += 1 }
      val dnp = Array(0d, p / 2, p, (1 + p) / 2, 1d)
      i = 0
      while (i <= 4) { np(i) += dnp(i); i += 1 }
      i = 1
      while (i <= 3) {
        val d = np(i) - n(i)
        if ((d >= 1 && n(i + 1) - n(i) > 1) || (d <= -1 && n(i - 1) - n(i) < -1)) {
          val di = math.signum(d)
          val qs = q(i) + di / (n(i + 1) - n(i - 1)) *
            ((n(i) - n(i - 1) + di) * (q(i + 1) - q(i)) / (n(i + 1) - n(i))
              + (n(i + 1) - n(i) - di) * (q(i) - q(i - 1)) / (n(i) - n(i - 1)))
          q(i) =
            if (q(i - 1) < qs && qs < q(i + 1)) qs
            else { // parabolic broke monotonicity: linear step toward the gap
              val j = i + di.toInt
              q(i) + di * (q(j) - q(i)) / (n(j) - n(i))
            }
          n(i) += di
        }
        i += 1
      }
      P2State(s.count + 1, q, n, np)
    }
  }

  private def estimate(s: P2State): Double =
    if (s.count == 0) Double.NaN
    else if (s.count < 5) { // exact quantile of the parked values
      val sorted = s.q.sorted
      sorted(math.min(((s.count - 1) * p).round.toInt, sorted.length - 1))
    } else s.q(2)

  override def handleInputRows(key: String, rows: Iterator[(String, Double)],
      timerValues: TimerValues): Iterator[(String, Long, Double)] = {
    var s = if (st.exists()) st.get() else P2State(0, Array.empty, Array.empty, Array.empty)
    rows.foreach(r => s = insert(s, r._2))
    st.update(s)
    Iterator.single((key, s.count, estimate(s)))
  }
}

object QuantileStream {

  /** (event_type, value) stream → per-key P² quantile changelog:
    * (event_type, count, estimate), one row per key per micro-batch.
    */
  def apply(events: DataFrame, p: Double = 0.5): Dataset[(String, Long, Double)] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .select(col("event_type").cast("string"), col("value").cast("double"))
      .as[(String, Double)]
      .groupByKey(_._1)
      .transformWithState(new P2Processor(p),
        TimeMode.None(), OutputMode.Update())
  }
}
