package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.analytics.ForumAnalytics
import graft.logs.{LogGen, LogParser}
import graft.sources.Tables

/** Named harness queries — each is one operator/capability from
  * SURVEY.md §2, exercised over the driver testdata, paired with a DuckDB
  * oracle in [[SparkEntry.oracleSql]].
  *
  * Conventions for oracle hash-parity:
  *   - every computed column is aliased identically in Spark and SQL;
  *   - ids surfaced as BIGINT on both sides;
  *   - double aggregates rounded (2-6 dp) so accumulation-order noise
  *     can't flip the driver's hash compare;
  *   - every query has a total deterministic ORDER BY (ties broken by id).
  */
object Queries {

  // ---------------------------------------------------------------- logs

  /** P1-P8: full parser field extraction, verified field-by-field against
    * the generating expressions (garbage lines must yield all-null).
    */
  def parseFields(spark: SparkSession, sfDir: String): DataFrame = {
    val parsed = LogParser.parseFull(LogGen.logLines(spark, sfDir))
    parsed.select(
      col("event_id"),
      col("client_ip"),
      col("client_identity"),
      col("remote_user"),
      date_format(col("access_ts"), "yyyy-MM-dd HH:mm:ss").as("access_date"),
      col("method"), col("uri"), col("proto"),
      col("http_status"),
      nullif(col("bytes_sent"), lit("-")).cast("long").as("bytes"),
      col("referer"),
      col("user_agent"),
      col("section_id").cast("long").as("section_id"),
      col("article_id").cast("long").as("article_id"))
      .orderBy("event_id")
  }

  def hotSection(spark: SparkSession, sfDir: String): DataFrame =
    ForumAnalytics.hotSections(
      ForumAnalytics.parsedLogs(spark, sfDir),
      ForumAnalytics.sections(spark, sfDir))

  def hotArticle(spark: SparkSession, sfDir: String): DataFrame =
    ForumAnalytics.hotArticles(
      ForumAnalytics.parsedLogs(spark, sfDir),
      ForumAnalytics.articles(spark, sfDir))

  def clientIp(spark: SparkSession, sfDir: String): DataFrame =
    ForumAnalytics.clientIpAccess(ForumAnalytics.parsedLogs(spark, sfDir))

  // ---------------------------------------------------- relational breadth

  /** Q2/Q5: multi-aggregate hash group-by (TPC-H Q1 shape) — partial+final
    * agg, one shuffle on the 2-column key.
    */
  def q1Agg(spark: SparkSession, sfDir: String): DataFrame =
    Tables.lineitem(spark, sfDir)
      .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp_ntz"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        round(sum(col("l_quantity")), 2).as("sum_qty"),
        round(sum(col("l_extendedprice")), 2).as("sum_base_price"),
        round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("sum_disc_price"),
        round(sum(col("l_extendedprice") * (lit(1) - col("l_discount")) * (lit(1) + col("l_tax"))), 2).as("sum_charge"),
        round(avg(col("l_quantity")), 4).as("avg_qty"),
        round(avg(col("l_extendedprice")), 4).as("avg_price"),
        round(avg(col("l_discount")), 4).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))
}
