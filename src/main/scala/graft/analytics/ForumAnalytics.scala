package graft.analytics

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.logs.{LogGen, LogParser}
import graft.sources.Tables

/** The reference's three product analytics (`README.md:13-15`,
  * `LogAnalysis.java:85-90`), Spark-first:
  *
  *   1. hot sections — top-10 forum sections by PV (`LogAnalysis.java:242-256`)
  *   2. hot articles — top-10 threads by PV (`LogAnalysis.java:173-185`)
  *   3. per-client traffic — hits per client IP (`LogAnalysis.java:117-130`)
  *
  * Plan shape (batch): parse (narrow, codegen) → filter → **broadcast**
  * hash join against the small dimension (the reference does a per-record
  * JDBC lookup join, `LogAnalysis.java:181,251`; broadcasting the dim
  * snapshot is the idiomatic Spark equivalent and removes the shuffle on
  * the fact side entirely) → partial+final hash aggregate (one shuffle on
  * the group key) → `TakeOrderedAndProject` for the top-10 (no global
  * sort — each partition keeps 10 rows, driver merges).
  *
  * At 100 TB: the only shuffle is the aggregate's, over at most
  * |distinct keys| × partitions rows after map-side combine; dims stay
  * broadcast. Ties are broken by id so results are deterministic under
  * any partitioning.
  */
object ForumAnalytics {

  /** Section dimension — `pre_forum_forum(fid, name)`
    * (`LogAnalysis.java:199-215`); played by `nation` on the testdata.
    */
  def sections(spark: SparkSession, sfDir: String): DataFrame =
    Tables.nation(spark, sfDir)
      .select(col("n_nationkey").cast("long").as("fid"), col("n_name").as("name"))

  /** Article dimension — `pre_forum_post(tid, subject)`
    * (`LogAnalysis.java:138-152`); played by `part` on the testdata.
    */
  def articles(spark: SparkSession, sfDir: String): DataFrame =
    Tables.part(spark, sfDir)
      .select(col("p_partkey").as("tid"), col("p_name").as("subject"))

  /** Parsed 4-tuples from the synthetic log lines (full parser path). */
  def parsedLogs(spark: SparkSession, sfDir: String): DataFrame =
    LogParser.accessTuples(LogGen.logLines(spark, sfDir))

  /** Hot sections: `SELECT sectionId, name, count(1) ... WHERE sectionId<>0
    * GROUP BY ... ORDER BY count(1) DESC LIMIT 10` (`LogAnalysis.java:242-256`),
    * with section id as tiebreak for determinism.
    */
  def hotSections(logs: DataFrame, dim: DataFrame, n: Int = 10): DataFrame =
    logs.filter(col("section_id") =!= 0)
      .select(col("section_id").cast("long").as("section_id"))
      .join(broadcast(dim), col("section_id") === col("fid"))
      .groupBy(col("section_id"), col("name"))
      .agg(count(lit(1)).as("section_pv"))
      .orderBy(col("section_pv").desc, col("section_id"))
      .limit(n)

  /** Hot articles: same shape over the article dim (`LogAnalysis.java:173-185`). */
  def hotArticles(logs: DataFrame, dim: DataFrame, n: Int = 10): DataFrame =
    logs.filter(col("article_id") =!= 0)
      .select(col("article_id").cast("long").as("article_id"))
      .join(broadcast(dim), col("article_id") === col("tid"))
      .groupBy(col("article_id"), col("subject"))
      .agg(count(lit(1)).as("article_pv"))
      .orderBy(col("article_pv").desc, col("article_id"))
      .limit(n)

  /** Per-client traffic: `WHERE articleId<>0 OR sectionId<>0 GROUP BY
    * clientIP` (`LogAnalysis.java:117-130`). No limit in the reference;
    * ordered for deterministic output.
    */
  def clientIpAccess(logs: DataFrame): DataFrame =
    logs.filter(col("article_id") =!= 0 || col("section_id") =!= 0)
      .groupBy(col("client_ip"))
      .agg(count(lit(1)).as("client_access_cnt"))
      .orderBy(col("client_access_cnt").desc, col("client_ip"))
}
