package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries`: one entry per implemented operator (SURVEY.md §2);
  * `oracleSql`: DuckDB-equivalent SQL over the same parquet tables.
  * Column names/aliases match pairwise (the driver sorts columns by name
  * before hashing values).
  */
object SparkEntry {

  /** Flagship: the reference's hot-sections analytics end-to-end (synthetic
    * combined log lines → regex parse → keep-200 → broadcast dim join →
    * agg → top-10) on sf0.001; driver smoke-checks rows>0.
    */
  def entry(spark: SparkSession): DataFrame =
    Queries.hotSection(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_parse_fields" -> (Queries.parseFields _),
    "q_hot_section" -> (Queries.hotSection _),
    "q_hot_article" -> (Queries.hotArticle _),
    "q_client_ip" -> (Queries.clientIp _),
    "q1_agg" -> (Queries.q1Agg _),
  )

  /** Shared oracle fragment: the parsed-and-filtered log view, computed
    * directly from `events` (mirrors graft.logs.LogGen's deterministic
    * mapping — this is what independently checks the regex parser).
    */
  private val logsCte: String =
    """WITH logs AS (
      |  SELECT
      |    concat('10.', user_id % 250, '.', (user_id * 7) % 250, '.', 1 + (user_id * 13) % 250) AS client_ip,
      |    CASE WHEN event_type = 'click' THEN 1 + event_id % 15 ELSE 0 END AS section_id,
      |    CASE WHEN event_type IN ('view', 'purchase') THEN 1 + event_id % 40 ELSE 0 END AS article_id
      |  FROM events
      |  WHERE event_id % 97 <> 0 AND event_id % 89 <> 0
      |    AND event_id % 10 <> 0 AND event_id % 7 <> 3
      |)""".stripMargin

  def oracleSql: Map[String, String] = Map(
    "q_parse_fields" ->
      """SELECT
        |  event_id,
        |  CASE WHEN event_id % 97 = 0 THEN NULL ELSE concat('10.', user_id % 250, '.', (user_id * 7) % 250, '.', 1 + (user_id * 13) % 250) END AS client_ip,
        |  CASE WHEN event_id % 97 = 0 THEN NULL ELSE '-' END AS client_identity,
        |  CASE WHEN event_id % 97 = 0 THEN NULL ELSE '-' END AS remote_user,
        |  CASE WHEN event_id % 97 = 0 THEN NULL ELSE strftime(CAST(ts AS TIMESTAMP), '%Y-%m-%d %H:%M:%S') END AS access_date,
        |  CASE WHEN event_id % 97 = 0 OR event_id % 89 = 0 THEN NULL WHEN event_type = 'purchase' THEN 'POST' ELSE 'GET' END AS method,
        |  CASE WHEN event_id % 97 = 0 OR event_id % 89 = 0 THEN NULL
        |       WHEN event_type = 'view' THEN concat('/forum.php?mod=viewthread&tid=', 1 + event_id % 40, '&extra=page%3D1')
        |       WHEN event_type = 'purchase' THEN concat('/forum.php?mod=viewthread&tid=', 1 + event_id % 40, '&from=fav')
        |       WHEN event_type = 'click' THEN concat('/forum.php?mod=forumdisplay&fid=', 1 + event_id % 15)
        |       WHEN event_type = 'signup' THEN '/member.php?mod=register'
        |       ELSE concat('/forum.php?mod=ajax&action=checknew&fid=', 1 + event_id % 15) END AS uri,
        |  CASE WHEN event_id % 97 = 0 OR event_id % 89 = 0 THEN NULL ELSE 'HTTP/1.1' END AS proto,
        |  CASE WHEN event_id % 97 = 0 THEN NULL WHEN event_id % 89 = 0 THEN '408' WHEN event_id % 10 = 0 THEN '404' WHEN event_id % 7 = 3 THEN '500' ELSE '200' END AS http_status,
        |  CASE WHEN event_id % 97 = 0 OR event_id % 89 = 0 OR event_id % 13 = 0 THEN NULL ELSE 200 + event_id % 9000 END AS bytes,
        |  CASE WHEN event_id % 97 = 0 THEN NULL WHEN event_id % 3 = 0 THEN '-' ELSE concat('http://kms-4/forum.php?mod=forumdisplay&fid=', 1 + event_id % 15) END AS referer,
        |  CASE WHEN event_id % 97 = 0 THEN NULL ELSE concat('Mozilla/5.0 (compatible; GraftBot/', user_id % 5, '.0)') END AS user_agent,
        |  CASE WHEN event_id % 97 = 0 THEN NULL WHEN event_id % 89 = 0 THEN 0 WHEN event_type = 'click' THEN 1 + event_id % 15 ELSE 0 END AS section_id,
        |  CASE WHEN event_id % 97 = 0 THEN NULL WHEN event_id % 89 = 0 THEN 0 WHEN event_type IN ('view', 'purchase') THEN 1 + event_id % 40 ELSE 0 END AS article_id
        |FROM events
        |ORDER BY event_id""".stripMargin,

    "q_hot_section" -> (logsCte +
      """
        |SELECT l.section_id AS section_id, n.n_name AS name, count(*) AS section_pv
        |FROM logs l JOIN nation n ON l.section_id = n.n_nationkey
        |WHERE l.section_id <> 0
        |GROUP BY 1, 2
        |ORDER BY section_pv DESC, section_id
        |LIMIT 10""".stripMargin),

    "q_hot_article" -> (logsCte +
      """
        |SELECT l.article_id AS article_id, p.p_name AS subject, count(*) AS article_pv
        |FROM logs l JOIN part p ON l.article_id = p.p_partkey
        |WHERE l.article_id <> 0
        |GROUP BY 1, 2
        |ORDER BY article_pv DESC, article_id
        |LIMIT 10""".stripMargin),

    "q_client_ip" -> (logsCte +
      """
        |SELECT client_ip, count(*) AS client_access_cnt
        |FROM logs
        |WHERE article_id <> 0 OR section_id <> 0
        |GROUP BY 1
        |ORDER BY client_access_cnt DESC, client_ip""".stripMargin),

    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus,
        |  round(sum(l_quantity), 2) AS sum_qty,
        |  round(sum(l_extendedprice), 2) AS sum_base_price,
        |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
        |  round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
        |  round(avg(l_quantity), 4) AS avg_qty,
        |  round(avg(l_extendedprice), 4) AS avg_price,
        |  round(avg(l_discount), 4) AS avg_disc,
        |  count(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
  )
}
