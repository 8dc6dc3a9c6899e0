package graft

import java.sql.DriverManager

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.JdbcUpsert

/** Live JDBC round-trip over embedded Derby (ships with Spark): the
  * reference's S3 upsert sink writes through a real connection with PK
  * merge semantics, and the S2 dim-scan path reads the table back via
  * `spark.read.format("jdbc")` — upgrading both from SQL-form tests to
  * an actual database round-trip.
  */
object JdbcRoundTripSpec {
  val Url = "jdbc:derby:memory:graftdb;create=true"
}

class JdbcRoundTripSpec extends AnyFunSuite {
  lazy val spark = GraftSpark.spark

  test("upsert sink merges by PK over a real connection; jdbc scan reads it back") {
    import spark.implicits._
    // local copy: the connect closure must not capture the spec instance
    // (scalatest internals are not serializable)
    val url = JdbcRoundTripSpec.Url
    val setup = DriverManager.getConnection(url)
    try {
      val st = setup.createStatement()
      try st.execute("DROP TABLE hot_section") catch { case _: Throwable => () }
      st.execute(
        "CREATE TABLE hot_section (section_id BIGINT PRIMARY KEY, name VARCHAR(64), section_pv BIGINT)")
    } finally setup.close()

    val cols = Seq("section_id", "name", "section_pv")
    // Derby's MERGE rejects a VALUES table source, so exercise the
    // portable update-then-insert strategy over the live connection.
    val sink = new JdbcUpsert("hot_section", cols, Seq("section_id"),
      () => DriverManager.getConnection(url), batchSize = 2,
      updateThenInsert = true)

    sink.write(Seq((1L, "tech", 10L), (2L, "life", 5L), (3L, "news", 7L))
      .toDF("section_id", "name", "section_pv"), 0L)
    // second batch: update 1 and 3, insert 4 — PK merge, not append
    sink.write(Seq((1L, "tech", 25L), (3L, "news", 9L), (4L, "misc", 1L))
      .toDF("section_id", "name", "section_pv"), 1L)

    val dim = spark.read.format("jdbc")
      .option("url", url).option("dbtable", "hot_section").load()
    val got = dim.collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap
    assert(got == Map(
      1L -> ("tech", 25L), 2L -> ("life", 5L),
      3L -> ("news", 9L), 4L -> ("misc", 1L)))
    // the jdbc scan pushes column pruning to the database: the physical
    // scan must request only section_id, never the other columns
    val prunedDf = spark.read.format("jdbc")
      .option("url", url).option("dbtable", "hot_section").load()
      .select("section_id")
    val scanStr = prunedDf.queryExecution.executedPlan.toString.toLowerCase
    assert(scanStr.contains("section_id") && !scanStr.contains("section_pv"), scanStr)
    assert(prunedDf.collect().map(_.getLong(0)).toSet == Set(1L, 2L, 3L, 4L))
  }
}
