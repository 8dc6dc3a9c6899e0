package graft.logs

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Deterministic synthetic Discuz/Apache *combined* log lines derived
  * from the driver's `events` table.
  *
  * Every field is a pure SQL-expressible function of `events` columns, so
  * a DuckDB oracle can compute the expected analytics results *directly*
  * from `events` — which independently cross-checks the regex parser (the
  * Spark side must recover the same values by parsing the rendered line).
  *
  * Line grammar follows the fixture corpus
  * (`/root/reference/src/main/resources/access_log.txt`, format doc at
  * `:38`): `%h %l %u %t "%r" %>s %b "%{Referer}i" "%{User-Agent}i"`.
  *
  * Deterministic event mapping (mirrored in SparkEntry oracle SQL):
  *   - garbage line          when event_id % 97 == 0  (parser must reject)
  *   - request "-" / 408 / - when event_id % 89 == 0  (access_log.txt:5)
  *   - status: 404 when event_id % 10 == 0, else 500 when event_id % 7 == 3,
  *     else 200
  *   - bytes: "-" when event_id % 13 == 0 else 200 + event_id % 9000
  *   - client ip octets from user_id; tid = 1 + event_id % 40 (view,
  *     purchase); fid = 1 + event_id % 15 (click); `error` events render an
  *     ajax URL carrying fid with the wrong mod= (must extract NO section,
  *     `access_log.txt:19` edge case); `signup` has no ids.
  */
object LogGen {

  private def s(c: Column): Column = c.cast("string")

  /** IPv4 from user_id — mod-only arithmetic so DuckDB matches exactly. */
  def clientIp(userId: Column): Column = concat(
    lit("10."), s(userId % 250),
    lit("."), s((userId * 7) % 250),
    lit("."), s(lit(1) + (userId * 13) % 250))

  def sectionIdOf(eventId: Column): Column = lit(1) + eventId % 15
  def articleIdOf(eventId: Column): Column = lit(1) + eventId % 40

  def uriOf(eventId: Column, eventType: Column): Column = {
    val tid = s(articleIdOf(eventId))
    val fid = s(sectionIdOf(eventId))
    when(eventType === "view",
        concat(lit("/forum.php?mod=viewthread&tid="), tid, lit("&extra=page%3D1")))
      .when(eventType === "purchase",
        concat(lit("/forum.php?mod=viewthread&tid="), tid, lit("&from=fav")))
      .when(eventType === "click",
        concat(lit("/forum.php?mod=forumdisplay&fid="), fid))
      .when(eventType === "signup", lit("/member.php?mod=register"))
      .otherwise(concat(lit("/forum.php?mod=ajax&action=checknew&fid="), fid))
  }

  /** (event_id, user_id, event_type, ts, line) — one combined-format line
    * per event, rendered by the native one-pass
    * [[graft.functions.RenderLogLine]] (byte-identical to
    * [[logLinesComposed]]; LogGenSpec asserts equality). The composed
    * column-expression tree costs ~10µs/row and dominated the analytics
    * queries' runtime.
    */
  def logLines(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables.events(spark, sfDir)
    ev.select(col("event_id"), col("user_id"), col("event_type"), col("ts"),
      graft.functions.GraftFunctions.render_log_line(
        struct(col("event_id"), col("user_id"), col("event_type"), col("ts"))).as("line"))
  }

  /** Reference implementation as pure SQL-expressible column expressions
    * (documents the deterministic mapping the oracles recompute).
    */
  def logLinesComposed(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables.events(spark, sfDir)
    val id = col("event_id")
    val emptyReq = id % 89 === 0

    val method = when(col("event_type") === "purchase", lit("POST")).otherwise(lit("GET"))
    val request = when(emptyReq, lit("-"))
      .otherwise(concat(method, lit(" "), uriOf(id, col("event_type")), lit(" HTTP/1.1")))
    val status = when(emptyReq, lit("408"))
      .when(id % 10 === 0, lit("404"))
      .when(id % 7 === 3, lit("500"))
      .otherwise(lit("200"))
    val bytes = when(emptyReq || id % 13 === 0, lit("-"))
      .otherwise(s(lit(200) + id % 9000))
    val referer = when(id % 3 === 0, lit("-"))
      .otherwise(concat(lit("http://kms-4/forum.php?mod=forumdisplay&fid="), s(sectionIdOf(id))))
    val userAgent = concat(lit("Mozilla/5.0 (compatible; GraftBot/"), s(col("user_id") % 5), lit(".0)"))

    val line = when(id % 97 === 0,
        concat(lit("### malformed #"), s(id), lit(" ###")))
      .otherwise(concat(
        clientIp(col("user_id")), lit(" - - ["),
        date_format(col("ts"), LogParser.DateFormat), lit(" +0000] \""),
        request, lit("\" "), status, lit(" "), bytes,
        lit(" \""), referer, lit("\" \""), userAgent, lit("\"")))

    ev.select(id, col("user_id"), col("event_type"), col("ts"), line.as("line"))
  }
}
