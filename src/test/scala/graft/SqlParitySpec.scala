package graft

import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{GraftFunctions, RenderLogLine, RollingHashMin, ShingleHashes}
import graft.ops.TextOps

/** Edge-case parity between the native expressions and the SQL semantics
  * their oracles assume (ADVICE round-1 items): whitespace that Java's
  * String.trim strips but SQL trim does not, supplementary-plane
  * codepoints, and null-field ordering in the log renderer.
  */
class SqlParitySpec extends AnyFunSuite {
  lazy val spark = GraftSpark.spark
  import spark.implicits._

  test("shingle_hashes tokenizes like split(trim(c)) on tab/newline-padded text") {
    // Composed built-ins ARE the SQL semantics (space-only trim; split
    // keeps leading/trailing empty tokens). The native fn must agree.
    val docs = Seq(
      "\tthe quick brown fox jumps\n",      // edge tabs/newlines -> empty edge tokens
      "  plain spaced sentence here  ",     // edge spaces -> trimmed, no empty tokens
      "one\ttwo\nthree four five",          // internal whitespace mix
      "short\u0001 control char text here", // U+0001: Java trim strips, SQL keeps
      " ", "", "a b"
    ).toDF("text")
    val composed = TextOps.shingles3(TextOps.words($"text"))
    val out = docs.select(
      GraftFunctions.shingle_hashes($"text", 3).as("native"),
      array_distinct(transform(composed, TextOps.portableHash64(_))).as("built"))
    out.collect().foreach { r =>
      assert(r.getSeq[Long](0) == r.getSeq[Long](1), r.toString)
    }
  }

  test("sqlTokens keeps edge empty tokens and non-space controls") {
    assert(ShingleHashes.sqlTokens("\tfoo bar\n").toSeq == Seq("", "foo", "bar", ""))
    assert(ShingleHashes.sqlTokens("  foo bar  ").toSeq == Seq("foo", "bar"))
    assert(ShingleHashes.sqlTokens("foo").toSeq == Seq("foo"))
    assert(ShingleHashes.sqlTokens("").toSeq == Seq(""))
    assert(ShingleHashes.sqlTokens(" ").toSeq == Seq(""))
  }

  test("rolling_hash_min folds codepoints, not UTF-16 units") {
    // Reference: recompute every window over the codepoint array.
    def reference(s: String, w: Int): Option[Long] = {
      val cps = s.codePoints().toArray
      if (cps.length < w) None
      else Some(cps.sliding(w).map(win =>
        win.foldLeft(0L)((a, c) => (a * 257 + c) % 1000000007L)).min)
    }
    val samples = Seq(
      "plain ascii text that is long enough for windows",
      "emoji 😀 inside a long enough string of text", // U+1F600
      "😀😁😂 three emoji lead this long enough text",
      "short😀" // 6 codepoints < 16 -> null
    )
    samples.foreach { s =>
      val got = Option(RollingHashMin.compute(UTF8String.fromString(s), 16)).map(_.longValue)
      assert(got == reference(s, 16), s)
    }
  }

  test("render_log_line: malformed branch reads only event_id (null user_id/ts ok)") {
    import org.apache.spark.sql.catalyst.InternalRow
    // id % 97 == 0 with null user_id/ts -> still renders the malformed line
    val malformed = InternalRow(97L, null, null, null)
    assert(RenderLogLine.render(malformed).toString == "### malformed #97 ###")
    // non-malformed id with null user_id -> null line (concat semantics)
    val nullUser = InternalRow(98L, null, UTF8String.fromString("view"), 0L)
    assert(RenderLogLine.render(nullUser) == null)
    // and the composed-tree equivalence on a DataFrame with null fields
    val df = Seq(
      (97L * 3, Option.empty[Long], Option("view"), Option.empty[Long]),
      (101L, Option(7L), Option("view"), Option(1700000000000000L))
    ).toDF("event_id", "user_id", "event_type", "ts_us")
      .select(GraftFunctions.render_log_line(
        struct($"event_id", $"user_id", $"event_type",
          timestamp_micros($"ts_us").as("ts"))).as("line"))
    val lines = df.collect().map(r => Option(r.getString(0)))
    assert(lines(0).contains(s"### malformed #${97L * 3} ###"))
    assert(lines(1).exists(_.startsWith("10.")))
  }

  test("UpsertSink.replace never exposes an empty table and survives bad batches") {
    val sink = new graft.streaming.UpsertSink(Seq("k"))
    sink.replace(Seq((1, "a"), (2, "b")).toDF("k", "v"), 0L)
    assert(sink.snapshot.size == 2)
    // a failing batch (bad column) must leave previous state intact
    intercept[Throwable] {
      sink.replace(Seq((3, "c")).toDF("k", "v").select(expr("raise_error('boom')").as("k"), $"v"), 1L)
    }
    assert(sink.snapshot.size == 2)
    // replacement drops stale keys, keeps the new set
    sink.replace(Seq((2, "b2"), (5, "e")).toDF("k", "v"), 2L)
    assert(sink.snapshot.keySet == Set(Seq(2), Seq(5)))
    assert(sink.snapshot(Seq(2)) == Seq(2, "b2"))
  }
}
