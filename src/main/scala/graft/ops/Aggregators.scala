package graft.ops

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed custom aggregates (`Aggregator[IN, BUF, OUT]`) — the UDAF
  * surface (SURVEY.md §2.3 reserves it for extension ops).
  */
object Aggregators {

  /** Bounded top-k by score (desc), id tiebreak (asc) — per-group top-k
    * without sorting the group: the buffer never exceeds k entries, and
    * partial buffers merge associatively, so map-side combine ships at
    * most k rows per group per partition. The per-group KNN / leaderboard
    * primitive at scale (contrast: a window row_number sorts every
    * group's full contents).
    */
  /** IN = (id, score). */
  class TopK(k: Int) extends Aggregator[(Long, Double), List[(Double, Long)], List[(Double, Long)]] {

    private def trim(xs: List[(Double, Long)]): List[(Double, Long)] =
      xs.sortBy { case (score, id) => (-score, id) }.take(k)

    override def zero: List[(Double, Long)] = Nil

    // amortize: let the buffer grow to 2k between trims instead of
    // sorting k+1 elements on every input row of the map-side combine
    override def reduce(buf: List[(Double, Long)], in: (Long, Double)): List[(Double, Long)] = {
      val grown = (in._2, in._1) :: buf
      if (grown.lengthCompare(2 * k) > 0) trim(grown) else grown
    }

    override def merge(a: List[(Double, Long)], b: List[(Double, Long)]): List[(Double, Long)] =
      trim(a ++ b)

    override def finish(buf: List[(Double, Long)]): List[(Double, Long)] = trim(buf)

    override def bufferEncoder: Encoder[List[(Double, Long)]] =
      org.apache.spark.sql.Encoders.kryo[List[(Double, Long)]]

    override def outputEncoder: Encoder[List[(Double, Long)]] =
      Encoders.kryo[List[(Double, Long)]]
  }

  /** Bounded bottom-k by integer score (asc), id tiebreak (asc) — the
    * ascending-DISTANCE twin of [[TopK]] for KNN selection over exact
    * integer metrics (ADC sums, quantized L2): the buffer never exceeds
    * 2k entries and partial buffers merge associatively, so each
    * query's selection ships at most k rows per partition instead of
    * sorting its full corpus-length candidate list on one task.
    */
  /** IN = (id, score); OUT entries = (score, id) ascending. */
  class BottomKLong(k: Int) extends Aggregator[(Long, Long), List[(Long, Long)], List[(Long, Long)]] {

    private def trim(xs: List[(Long, Long)]): List[(Long, Long)] = xs.sorted.take(k)

    override def zero: List[(Long, Long)] = Nil

    // amortize: let the buffer grow to 2k between trims instead of
    // sorting k+1 elements on every input row of the map-side combine
    override def reduce(buf: List[(Long, Long)], in: (Long, Long)): List[(Long, Long)] = {
      val grown = (in._2, in._1) :: buf
      if (grown.lengthCompare(2 * k) > 0) trim(grown) else grown
    }

    override def merge(a: List[(Long, Long)], b: List[(Long, Long)]): List[(Long, Long)] =
      trim(a ++ b)

    override def finish(buf: List[(Long, Long)]): List[(Long, Long)] = trim(buf)

    override def bufferEncoder: Encoder[List[(Long, Long)]] =
      Encoders.kryo[List[(Long, Long)]]

    override def outputEncoder: Encoder[List[(Long, Long)]] =
      Encoders.kryo[List[(Long, Long)]]
  }
}
