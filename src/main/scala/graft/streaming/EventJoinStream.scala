package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Stream-stream interval join — the attribution primitive the
  * stream-static lookups (LogStream) cannot express: BOTH sides arrive
  * continuously, and a purchase must match a view by the same user
  * within a bounded gap after it.
  *
  * Scale contract: the time-bound predicate plus watermarks on both
  * sides is what keeps the symmetric join state finite — Spark's
  * StreamingSymmetricHashJoin buffers each side only until the other
  * side's watermark passes `view_ts + maxGapSec`, so state is
  * O(arrival rate × window), never O(history). Without the interval
  * condition the same join would accumulate both streams forever; the
  * spec asserts both the match semantics and the physical operator.
  */
object EventJoinStream {

  /** Join views to same-user purchases within (0, maxGapSec] after the
    * view. Inner join: matches emit as soon as both rows arrived;
    * watermarks bound the buffered state, delayed rows past them drop.
    */
  def viewToPurchase(views: DataFrame, purchases: DataFrame,
      maxGapSec: Int = 600, watermarkSec: Int = 300): DataFrame = {
    val v = views
      .select(col("user_id"), col("ts").as("view_ts"))
      .withWatermark("view_ts", s"$watermarkSec seconds")
    val p = purchases
      .select(col("user_id").as("p_user_id"), col("ts").as("purchase_ts"),
        col("value"))
      .withWatermark("purchase_ts", s"$watermarkSec seconds")
    v.join(p,
      expr(s"""user_id = p_user_id
               AND purchase_ts > view_ts
               AND purchase_ts <= view_ts + interval $maxGapSec seconds"""))
      .select(col("user_id"), col("view_ts"), col("purchase_ts"), col("value"))
  }
}
