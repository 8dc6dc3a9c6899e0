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

  /** One-shot trigger: the next UPDATE executeUpdate() lies "0 rows"
    * without executing — simulates the concurrent-attempt race where the
    * key appears between the two-step sink's UPDATE and INSERT.
    */
  val lieNextUpdate = new java.util.concurrent.atomic.AtomicBoolean(false)

  private def proxy[T <: AnyRef](iface: Class[T], handler: java.lang.reflect.InvocationHandler): T =
    java.lang.reflect.Proxy.newProxyInstance(iface.getClassLoader, Array(iface), handler)
      .asInstanceOf[T]

  /** Real Derby connection that simulates PostgreSQL TRANSACTION-ABORT
    * semantics on top of the `lieNextUpdate` race trigger: after any
    * statement error, every further execute on the connection fails
    * with SQLSTATE 25P02 until `rollback(Savepoint)`/`rollback()`. On
    * such engines the two-step sink's duplicate-key recovery only works
    * because it scopes the INSERT with a savepoint and rolls back to it
    * before re-running the UPDATE.
    */
  def pgStrictRacingConnection(url: String): java.sql.Connection = {
    val real = java.sql.DriverManager.getConnection(url)
    val aborted = new java.util.concurrent.atomic.AtomicBoolean(false)
    proxy(classOf[java.sql.Connection], (_, m, a) => {
      val args = if (a == null) Array.empty[AnyRef] else a
      if (m.getName == "rollback") aborted.set(false)
      val out =
        try m.invoke(real, args: _*)
        catch { case e: java.lang.reflect.InvocationTargetException => throw e.getCause }
      if (m.getName == "prepareStatement") {
        val sql = args.head.toString.trim.toUpperCase
        val ps = out.asInstanceOf[java.sql.PreparedStatement]
        proxy(classOf[java.sql.PreparedStatement], (_, pm, pa) => {
          val pargs = if (pa == null) Array.empty[AnyRef] else pa
          if (pm.getName.startsWith("execute") && aborted.get)
            throw new java.sql.SQLException(
              "current transaction is aborted, commands ignored until end of transaction block",
              "25P02")
          if (pm.getName == "executeUpdate" && sql.startsWith("UPDATE") &&
              lieNextUpdate.compareAndSet(true, false))
            Integer.valueOf(0)
          else
            try pm.invoke(ps, pargs: _*)
            catch {
              case e: java.lang.reflect.InvocationTargetException =>
                e.getCause match {
                  case sqlE: java.sql.SQLException
                      if pm.getName.startsWith("execute") =>
                    aborted.set(true); throw sqlE
                  case other => throw other
                }
            }
        })
      } else out
    })
  }

  /** Real Derby connection whose prepared UPDATE statements honor
    * `lieNextUpdate`; everything else delegates untouched.
    */
  def racingConnection(url: String): java.sql.Connection = {
    val real = java.sql.DriverManager.getConnection(url)
    proxy(classOf[java.sql.Connection], (_, m, a) => {
      val args = if (a == null) Array.empty[AnyRef] else a
      val out = m.invoke(real, args: _*)
      if (m.getName == "prepareStatement" &&
          args.headOption.exists(_.toString.trim.toUpperCase.startsWith("UPDATE"))) {
        val ps = out.asInstanceOf[java.sql.PreparedStatement]
        proxy(classOf[java.sql.PreparedStatement], (_, pm, pa) => {
          val pargs = if (pa == null) Array.empty[AnyRef] else pa
          if (pm.getName == "executeUpdate" && lieNextUpdate.compareAndSet(true, false))
            Integer.valueOf(0)
          else pm.invoke(ps, pargs: _*)
        })
      } else out
    })
  }
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

  test("two-step upsert converges when INSERT loses a duplicate-key race") {
    import spark.implicits._
    val url = JdbcRoundTripSpec.Url
    val setup = DriverManager.getConnection(url)
    try {
      val st = setup.createStatement()
      try st.execute("DROP TABLE race_t") catch { case _: Throwable => () }
      st.execute(
        "CREATE TABLE race_t (k BIGINT PRIMARY KEY, v VARCHAR(64))")
      st.execute("INSERT INTO race_t VALUES (10, 'old')")
    } finally setup.close()

    // The proxied connection makes the sink's first UPDATE report 0 rows
    // even though key 10 exists — exactly what a zombie attempt's
    // interleaved commit looks like. The INSERT then takes a REAL Derby
    // PK violation, and the sink must fall back to a second UPDATE
    // rather than failing the task.
    JdbcRoundTripSpec.lieNextUpdate.set(true)
    val sink = new JdbcUpsert("race_t", Seq("k", "v"), Seq("k"),
      () => JdbcRoundTripSpec.racingConnection(url), updateThenInsert = true)
    sink.write(Seq((10L, "new")).toDF("k", "v"), 0L)

    val check = DriverManager.getConnection(url)
    try {
      val rs = check.createStatement().executeQuery("SELECT v FROM race_t WHERE k = 10")
      assert(rs.next() && rs.getString(1) == "new")
    } finally check.close()
    assert(!JdbcRoundTripSpec.lieNextUpdate.get)
  }

  test("duplicate-key recovery survives PostgreSQL-style transaction abort (savepoint scoped)") {
    import spark.implicits._
    val url = JdbcRoundTripSpec.Url
    val setup = DriverManager.getConnection(url)
    try {
      val st = setup.createStatement()
      try st.execute("DROP TABLE pg_t") catch { case _: Throwable => () }
      st.execute("CREATE TABLE pg_t (k BIGINT PRIMARY KEY, v VARCHAR(64))")
      st.execute("INSERT INTO pg_t VALUES (10, 'old')")
    } finally setup.close()

    // Same race as above, but the proxy additionally enforces
    // PostgreSQL's abort rule: after the INSERT's PK violation, EVERY
    // statement on the connection fails with 25P02 until a rollback.
    // The sink must roll back to its pre-INSERT savepoint before the
    // recovery UPDATE, or the task dies here.
    JdbcRoundTripSpec.lieNextUpdate.set(true)
    val sink = new JdbcUpsert("pg_t", Seq("k", "v"), Seq("k"),
      () => JdbcRoundTripSpec.pgStrictRacingConnection(url), updateThenInsert = true)
    sink.write(Seq((10L, "new")).toDF("k", "v"), 0L)

    val check = DriverManager.getConnection(url)
    try {
      val rs = check.createStatement().executeQuery("SELECT v FROM pg_t WHERE k = 10")
      assert(rs.next() && rs.getString(1) == "new")
    } finally check.close()
    assert(!JdbcRoundTripSpec.lieNextUpdate.get)
  }
}
