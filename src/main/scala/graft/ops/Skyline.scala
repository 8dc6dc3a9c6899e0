package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Pareto-front (skyline) operator over two maximize-both dimensions
  * `p` and `dt`: a row survives iff NO other row strictly beats it on
  * BOTH. Dominance is evaluated at distinct p levels — max(dt) per
  * level, running max over strictly higher levels via lag — so equal-p
  * rows never dominate each other and every comparison is exact.
  *
  * Skylines are distributive: the skyline of a union is contained in
  * the union of skylines, so [[skyline]] runs a shard-local pass first
  * (windows partitioned by the shard — fact-sized data never sees a
  * global window) and the global pass only over the small survivor set.
  */
object Skyline {

  /** One dominance pass; `shardCol` partitions the level windows. */
  def pass(df: DataFrame, shardCol: Option[String]): DataFrame = {
    val part = shardCol.map(col).toSeq
    val lvl = df.groupBy((part :+ col("p")): _*).agg(max(col("dt")).as("lvl_max"))
    val ordered = Window.partitionBy(part: _*).orderBy(col("p").desc)
    val dom = lvl
      .withColumn("cum", max(col("lvl_max"))
        .over(ordered.rowsBetween(Window.unboundedPreceding, 0)))
      .withColumn("dom_dt", lag(col("cum"), 1).over(ordered))
      .select((part :+ col("p") :+ col("dom_dt")): _*)
    df.join(dom, shardCol.toSeq :+ "p")
      .filter(col("dom_dt").isNull || col("dt") >= col("dom_dt"))
      .select(df.columns.map(col): _*)
  }

  /** Local-then-merge skyline on (`p`, `dt`), sharded by `shardCol`. */
  def skyline(df: DataFrame, shardCol: String): DataFrame =
    pass(pass(df, Some(shardCol)), None)
}
