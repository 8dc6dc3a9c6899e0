package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{GraftFunctions, ShingleHashes}
import graft.ops.{TextOps, TimeSeries}

/** GraftExtensions integration: SQL-registered native functions, the
  * NativePortableHash optimizer rewrite, and the AsOfJoin planner
  * strategy (logical node → AsOfJoinExec merge).
  */
class ExtensionsSpec extends AnyFunSuite {
  lazy val spark = GraftSpark.spark
  import spark.implicits._

  test("SQL-registered functions match the Column API and the static hash") {
    val df = Seq("the quick brown fox jumps over the lazy dog").toDF("text")
    df.createOrReplaceTempView("ext_t")
    val viaSql = spark.sql(
      """SELECT shingle_hashes(text, 3) AS sh, portable_hash48(text) AS ph,
        |       rolling_hash_min(text, 16) AS rh FROM ext_t""".stripMargin).collect()(0)
    val viaCol = df.select(
      GraftFunctions.shingle_hashes($"text", 3).as("sh"),
      GraftFunctions.portable_hash48($"text").as("ph"),
      GraftFunctions.rolling_hash_min($"text", 16).as("rh")).collect()(0)
    assert(viaSql.getSeq[Long](0) == viaCol.getSeq[Long](0))
    assert(viaSql.getLong(1) == viaCol.getLong(1))
    assert(viaSql.getLong(1) == ShingleHashes.hash48("the quick brown fox jumps over the lazy dog"))
    assert(viaSql.getLong(2) == viaCol.getLong(2))
  }

  test("NativePortableHash rewrites the composed md5/conv pattern") {
    // range-backed so ConvertToLocalRelation can't constant-fold the plan away
    val df = spark.range(2)
      .select($"id", TextOps.portableHash64(concat(lit("abc"), $"id".cast("string"))).as("h"))
    assert(df.queryExecution.optimizedPlan.toString.contains("portable_hash48"),
      df.queryExecution.optimizedPlan.toString)
    assert(df.orderBy($"id").collect().map(_.getLong(1)).toSeq ==
      Seq("abc0", "abc1").map(ShingleHashes.hash48))
  }

  test("SQL users' hand-written md5/conv hash is rewritten too") {
    val q = spark.sql(
      """SELECT CAST(conv(substring(md5(concat('x', CAST(id AS STRING))), 1, 12), 16, 10) AS BIGINT) AS h
        |FROM range(2) ORDER BY id""".stripMargin)
    assert(q.queryExecution.optimizedPlan.toString.contains("portable_hash48"),
      q.queryExecution.optimizedPlan.toString)
    assert(q.collect().map(_.getLong(0)).toSeq == Seq("x0", "x1").map(ShingleHashes.hash48))
  }

  test("native expressions compile under codegen with fallback disabled") {
    // A companion method that fails to get a static forwarder (e.g. a
    // name colliding with Expression.eval) makes Janino compilation fail
    // and the stage silently run interpreted. Forcing fallback off turns
    // that silent regression into a test failure.
    val prevFactory = spark.conf.getOption("spark.sql.codegen.factoryMode")
    val prevFallback = spark.conf.getOption("spark.sql.codegen.fallback")
    spark.conf.set("spark.sql.codegen.factoryMode", "CODEGEN_ONLY")
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try {
      val out = spark.range(4)
        .select(concat(lit("doc "), $"id".cast("string")).as("text"))
        .select(
          GraftFunctions.portable_hash48($"text").as("p"),
          GraftFunctions.shingle_hashes($"text", 1).as("sh"),
          GraftFunctions.rolling_hash_min(concat($"text", lit(" padding to reach sixteen chars")), 16).as("r"))
        .collect()
      assert(out.length == 4)
      assert(out(0).getLong(0) == graft.functions.ShingleHashes.hash48("doc 0"))
    } finally {
      def restore(key: String, v: Option[String]): Unit = v match {
        case Some(x) => spark.conf.set(key, x)
        case None => spark.conf.unset(key)
      }
      restore("spark.sql.codegen.factoryMode", prevFactory)
      restore("spark.sql.codegen.fallback", prevFallback)
    }
  }

  test("eval_once is SQL-callable and transparent to results") {
    spark.range(5).createOrReplaceTempView("ext_eo_t")
    val rows = spark.sql(
      "SELECT eval_once(id * 2 + 1) AS v FROM ext_eo_t ORDER BY v").collect().map(_.getLong(0))
    assert(rows.toSeq == Seq(1L, 3L, 5L, 7L, 9L))
  }

  test("wrong-typed calls fail at analysis time, not execution") {
    // ADVICE r2: without ExpectsInputTypes a call like
    // portable_hash48(bigint) surfaced as a runtime ClassCastException
    // (or a Janino failure silently forcing interpreted execution).
    spark.range(3).createOrReplaceTempView("ext_types_t")
    val badCalls = Seq(
      "SELECT portable_hash48(id) FROM ext_types_t",
      "SELECT shingle_hashes(id, 2) FROM ext_types_t",
      "SELECT rolling_hash_min(id, 4) FROM ext_types_t",
      "SELECT parse_log(id) FROM ext_types_t",
      "SELECT dot_product(array(id), array(1.0)) FROM ext_types_t",
      "SELECT normalize_vector(array(id)) FROM ext_types_t",
      "SELECT freq_items(id, 4) FROM ext_types_t",
      "SELECT render_log_line(struct(id, id)) FROM ext_types_t")
    badCalls.foreach { sql =>
      val e = intercept[org.apache.spark.sql.AnalysisException](spark.sql(sql))
      assert(e.getMessage != null, sql)
    }
    // and the correctly-typed forms still analyze
    spark.sql("SELECT portable_hash48(CAST(id AS STRING)) FROM ext_types_t").collect()
    spark.sql(
      "SELECT render_log_line(struct(id, id, CAST(id AS STRING), timestamp_micros(id))) " +
        "FROM ext_types_t").collect()
  }

  // -- native as-of join ----------------------------------------------------

  private lazy val purchases = Seq(
    (100L, 1L, 1000L), (101L, 1L, 2000L), (102L, 2L, 1500L),
    (103L, 3L, 500L),  (104L, 1L, 2000L)
  ).toDF("event_id", "user_id", "sec")
    .select($"event_id", $"user_id", timestamp_seconds($"sec").as("ts"))

  private lazy val views = Seq(
    (200L, 1L, 900L), (201L, 1L, 1000L),  // tie at purchase t=1000 -> <= keeps 201
    (202L, 1L, 1999L), (203L, 1L, 2000L), (204L, 1L, 2000L), // ties at 2000 -> max id 204
    (205L, 2L, 1501L), // after user 2's purchase -> no match
    (206L, 9L, 100L)   // other key only
  ).toDF("event_id", "user_id", "sec")
    .select($"event_id".as("view_id"), $"user_id".as("v_user"), timestamp_seconds($"sec").as("v_ts"))

  test("asOfJoinNative: latest right <= left per key, ties by max order, null when none") {
    val out = TimeSeries.asOfJoinNative(purchases, views,
        "user_id", "v_user", "ts", "v_ts", "view_id")
      .select($"event_id", $"view_id").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) -1L else r.getLong(1))).toMap
    assert(out == Map(
      100L -> 201L, // <= includes equal ts
      101L -> 204L, // tie at 2000 broken by max view_id
      104L -> 204L, // equal left ts rows see the same candidate
      102L -> -1L,  // user 2: only later view -> null
      103L -> -1L)) // user 3: no views -> null
  }

  test("asOfJoinNative plans as AsOfJoinExec with one exchange per side") {
    val out = TimeSeries.asOfJoinNative(purchases, views,
      "user_id", "v_user", "ts", "v_ts", "view_id")
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("AsOfJoin "), plan) // AsOfJoinExec (nodeName strips Exec)
    assert("Exchange hashpartitioning".r.findAllIn(plan).size == 2, plan)
  }

  test("asOfJoinNative matches the union/window asOfJoin on events data") {
    val ev = graft.sources.Tables.events(spark, "/root/testdata/sf0.001")
    val composed = Queries.asofJoin(spark, "/root/testdata/sf0.001").collect()
    val native = Queries.asofJoinNative(spark, "/root/testdata/sf0.001").collect()
    assert(native.length == composed.length)
    native.zip(composed).foreach { case (n, c) => assert(n == c) }
  }

  test("AsOfJoin handles composite keys (logical node is Seq-keyed)") {
    import graft.plans.AsOfJoin
    import org.apache.spark.sql.graft.ColumnBridge
    val l = Seq((1L, "a", 1L, 10L), (2L, "b", 1L, 10L), (3L, "a", 2L, 10L))
      .toDF("id", "k1", "k2", "t")
    val r = Seq((7L, "a", 1L, 5L), (8L, "a", 2L, 6L), (9L, "b", 9L, 1L))
      .toDF("rid", "rk1", "rk2", "rt")
    val lp = l.queryExecution.analyzed
    val rp = r.queryExecution.analyzed
    def a(p: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan, n: String) =
      p.output.find(_.name == n).get
    val out = ColumnBridge.ofRows(spark, AsOfJoin(lp, rp,
        Seq(a(lp, "k1"), a(lp, "k2")), Seq(a(rp, "rk1"), a(rp, "rk2")),
        a(lp, "t"), a(rp, "rt"), a(rp, "rid")))
      .select($"id", $"rid").collect()
      .map(x => x.getLong(0) -> (if (x.isNullAt(1)) -1L else x.getLong(1))).toMap
    // (a,1)->7, (a,2)->8, (b,1) has no right (b,9 doesn't match) -> null
    assert(out == Map(1L -> 7L, 2L -> -1L, 3L -> 8L))
  }

  test("asOfJoinNative survives a self-join (duplicate upstream ExprIds)") {
    val base = Seq((1L, 10L, 5L), (2L, 10L, 8L)).toDF("id", "k", "sec")
      .select($"id", $"k", timestamp_seconds($"sec").as("t"))
    val r = base.select($"id".as("rid"), $"k".as("rk"), $"t".as("rt"))
    val out = TimeSeries.asOfJoinNative(base, r, "k", "rk", "t", "rt", "rid")
      .select($"id", $"rid").collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(out == Map(1L -> 1L, 2L -> 2L))
  }
}
