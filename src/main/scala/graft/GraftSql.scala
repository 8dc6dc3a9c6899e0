package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.sources.Tables

/** The SQL surface (reference Q8/Q9: temp-view registration + SQL on
  * dynamic tables, `LogAnalysis.java:77-83` and the three INSERT…SELECT
  * bodies). Registers the testdata tables plus the parsed-log view, so
  * every analytics query can also be issued as ANSI SQL via
  * `spark.sql(...)` — same Catalyst plans as the DataFrame forms.
  */
object GraftSql {

  val TableNames: Seq[String] = Seq("region", "nation", "customer", "supplier",
    "part", "orders", "lineitem", "events", "documents", "embeddings")

  /** Register the base parquet tables as temp views. */
  def registerBaseViews(spark: SparkSession, sfDir: String): Unit =
    TableNames.foreach(t => Tables.table(spark, sfDir, t).createOrReplaceTempView(t))

  /** Base tables plus the `logs` view (the reference's
    * `createTemporaryView("logs", ...)` analog) and the dims.
    */
  def registerViews(spark: SparkSession, sfDir: String): Unit = {
    registerBaseViews(spark, sfDir)
    analytics.ForumAnalytics.parsedLogs(spark, sfDir).createOrReplaceTempView("logs")
    analytics.ForumAnalytics.sections(spark, sfDir).createOrReplaceTempView("forum_sections")
    analytics.ForumAnalytics.articles(spark, sfDir).createOrReplaceTempView("forum_articles")
  }

  /** The hot-section analytics as literal SQL (reference
    * `LogAnalysis.java:242-256` reshaped to batch + deterministic ties).
    */
  def hotSectionSql(spark: SparkSession, sfDir: String): DataFrame = {
    registerViews(spark, sfDir)
    spark.sql(
      """SELECT CAST(l.section_id AS BIGINT) AS section_id, s.name, COUNT(1) AS section_pv
        |FROM logs l JOIN forum_sections s ON l.section_id = s.fid
        |WHERE l.section_id <> 0
        |GROUP BY l.section_id, s.name
        |ORDER BY section_pv DESC, section_id
        |LIMIT 10""".stripMargin)
  }
}
