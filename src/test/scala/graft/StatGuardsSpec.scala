package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Regression specs for the r11 ADVICE statistical guards: the
  * binomialTestQ long-recurrence overflow must fail LOUDLY past the
  * n = 60 calendar bound (not return silently-wrong tails), and the
  * eventStudyQ pre-period mean must divide by the pre cells that
  * actually exist (a calendar gap must not bias pre_e6). Both specs
  * synthesize their own events parquet so the failure modes — a
  * 61-day calendar, a gapped pre-period — are actually exercised
  * (the driver testdata spans ~31 gap-free days and can't reach them).
  */
class StatGuardsSpec extends AnyFunSuite {
  lazy val spark = GraftSpark.spark

  /** Writes (user_id, ts) events — one event per (user, day) — into a
    * fresh temp dir shaped like a testdata SF dir.
    */
  private def writeEvents(tag: String, userIds: Seq[Long], days: Seq[Int]): String = {
    val sess = spark
    import sess.implicits._
    val dir = java.nio.file.Files.createTempDirectory(s"graft-$tag").toString
    val rows = for (u <- userIds; d <- days)
      yield (u, new Timestamp(d.toLong * 86400000L))
    rows.toDF("user_id", "ts")
      .withColumn("ts", col("ts").cast("timestamp"))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  test("binomialTestQ fails loudly past the 60-day long-recurrence bound") {
    // 61 days: C(61, 30)·61 overflows the long accumulator — the
    // assert_true guard must fire with a diagnosable message instead
    // of letting ANSI arithmetic (or silent wraparound) decide
    val dir = writeEvents("binom61", Seq(1L), 0 until 61)
    val e = intercept[Exception] {
      Queries.binomialTestQ(spark, dir).collect()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => x.getMessage +: messages(x.getCause))
    assert(messages(e).exists(m => m != null && m.contains("binomialTestQ")),
      s"expected the binomialTestQ n<=60 guard, got: ${e.getMessage}")
    // and the guard stays quiet inside the bound
    val ok = writeEvents("binom60", Seq(1L), 0 until 60)
    assert(Queries.binomialTestQ(spark, ok).collect().length == 1)
  }

  test("chowTestQ degenerate half yields NULL SSE/F, not DIVIDE_BY_ZERO") {
    // days {0, 100, 101}: mid = 50, so the first half holds a SINGLE
    // day → den = n·Σt² − (Σt)² = 0. The NULLIF guard (r12 ADVICE)
    // must surface NULL sse_first_e3 / chow_f_e6 — matching DuckDB's
    // `// nullif(...)` — instead of throwing under Spark 4 ANSI.
    val dir = writeEvents("chowdegen", Seq(1L, 2L), Seq(0, 100, 101))
    val rows = Queries.chowTestQ(spark, dir).collect()
    assert(rows.length == 1)
    val r = rows.head
    assert(r.isNullAt(r.fieldIndex("sse_first_e3")),
      s"degenerate first half must give NULL SSE: $r")
    assert(r.isNullAt(r.fieldIndex("chow_f_e6")),
      s"NULL SSE must propagate to a NULL F: $r")
    assert(!r.isNullAt(r.fieldIndex("sse_second_e3")),
      s"the healthy half must still produce its SSE: $r")
  }

  test("MatOracles materialization actually fired in every pinned oracle") {
    // mat() now REQUIRES ≥1 whitespace-tolerant CTE-head rewrite per
    // MatOracles entry (r12 ADVICE: a reformat like "AS (\nSELECT"
    // silently dropped materialization before). oracleSql itself
    // throws if any pinned oracle stops matching; this spec pins the
    // visible contract on the 8 known entries.
    val matted = Seq("q_dbscan", "q_curation_spancov", "q_curation_spans",
      "q_ann_pq_recall", "q_bpe_merges", "q_bpe_encode", "q_curation_lm",
      "q_curation_strip")
    val sqls = SparkEntry.oracleSql // would throw if a rewrite failed to fire
    matted.foreach { k =>
      assert(sqls(k).contains("AS MATERIALIZED (SELECT"),
        s"$k lost its MATERIALIZED CTE pin")
    }
  }

  test("eventStudyQ pre-mean uses existing pre cells, not a literal 5") {
    // 21-day span (mid = day 10) with pre-period days rel −4 and −2
    // MISSING; every user emits exactly one event on every present
    // day, so each arm's per-cell y_e6 is constant = 1e6. A correct
    // pre-mean (sum over 3 existing cells / 3) equals 1e6 → every
    // deviation and ATT is exactly 0; the old literal-5 denominator
    // gave pre = 600000 and dev = +400000 across the board.
    val days = (0 to 20).filterNot(d => d == 6 || d == 8)
    val dir = writeEvents("evstudy", Seq(1L, 2L, 3L, 4L), days)
    val out = Queries.eventStudyQ(spark, dir).collect()
    assert(out.length == 9, s"9 present rel days expected, got ${out.length}")
    out.foreach { r =>
      assert(r.getAs[Long]("t_dev_e6") == 0L
          && r.getAs[Long]("c_dev_e6") == 0L
          && r.getAs[Long]("att_e6") == 0L,
        s"flat panel must have zero deviations at rel=${r.getAs[Long]("rel_day")}: $r")
    }
  }
}
