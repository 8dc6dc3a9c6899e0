package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The deletion-neighborhood (FastSS) prefilter must have PERFECT
  * recall — the verified output equals brute force exactly. Random
  * strings over a 3-letter alphabet maximize accidental near-misses
  * (far harsher than the part-name vocabulary the oracle checks).
  */
class EditDistanceJoinSpec extends AnyFunSuite {
  lazy val spark = GraftSpark.spark

  private def lev(a: String, b: String): Int = {
    val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
      if (i == 0) j else if (j == 0) i else 0
    }
    for (i <- 1 to a.length; j <- 1 to b.length)
      d(i)(j) = math.min(
        math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    d(a.length)(b.length)
  }

  test("FastSS join == brute force on random 3-letter-alphabet strings") {
    val rnd = new scala.util.Random(42)
    val rows = (0 until 120).map { i =>
      val len = 4 + rnd.nextInt(9)
      val s = (0 until len).map(_ => ('a' + rnd.nextInt(3)).toChar).mkString
      (i.toLong, s, s"blk${i % 2}")
    }
    val expected = (for {
      a <- rows; b <- rows
      if a._3 == b._3 && a._1 < b._1 && lev(a._2, b._2) <= 2
    } yield (a._1, b._1, lev(a._2, b._2).toLong)).sortBy(p => (p._1, p._2))

    import spark.implicits._
    val df = rows.toDF("key", "name", "block")
    def run(hashed: Boolean) = {
      val join =
        if (hashed) graft.ops.EditDistanceJoin.selfJoinHashed(df, "key", "name", "block", k = 2)
        else graft.ops.EditDistanceJoin.selfJoin(df, "key", "name", "block", k = 2)
      join.select(col("key_a"), col("key_b"), col("dist"))
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
        .sortBy(p => (p._1, p._2))
    }
    val got = run(hashed = false)
    assert(got.toSeq == expected, s"got ${got.length}, expected ${expected.length}")
    assert(expected.nonEmpty) // the comparison must actually exercise pairs
    // hashed-variant form: identical output (collisions only add
    // candidates; the verify step is exact)
    assert(run(hashed = true).toSeq == expected)
  }

  test("identical strings and cross-block pairs behave at the boundaries") {
    import spark.implicits._
    val df = Seq(
      (1L, "abcdef", "x"), (2L, "abcdef", "x"),   // d=0 same block
      (3L, "abcdzz", "x"),                         // d=2 vs 1/2
      (4L, "abcdef", "y"),                         // same name, other block
      (5L, "zzzzzz", "x")                          // far from everything
    ).toDF("key", "name", "block")
    val got = graft.ops.EditDistanceJoin.selfJoin(df, "key", "name", "block")
      .select("key_a", "key_b", "dist").as[(Long, Long, Long)].collect().toSet
    assert(got == Set((1L, 2L, 0L), (1L, 3L, 2L), (2L, 3L, 2L)))
  }

  test("inputs past maxLen fail fast instead of exploding the variant table") {
    import spark.implicits._
    val df = Seq((1L, "a" * 80, "x"), (2L, "a" * 79, "x")).toDF("key", "name", "block")
    val ex = intercept[Exception] {
      graft.ops.EditDistanceJoin.selfJoin(df, "key", "name", "block", maxLen = 64).count()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e => Option(e.getMessage).toSeq ++ messages(e.getCause))
    assert(messages(ex).exists(_.contains("maxLen")), ex.toString)
    // and raising the cap admits the same rows
    val ok = graft.ops.EditDistanceJoin
      .selfJoin(df, "key", "name", "block", maxLen = 128).count()
    assert(ok == 1L) // d=1
  }
}
