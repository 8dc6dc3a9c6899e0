package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.TextOps

/** Unit contract of TextOps.repetitionStats (q_repetition's oracle
  * checks exact values at corpus scale; this pins the signal semantics
  * on hand-built docs).
  */
class TextOpsSpec extends AnyFunSuite {
  lazy val spark = GraftSpark.spark

  test("repetition stats: a looping doc flags on both signals, varied text on neither") {
    import spark.implicits._
    val loop = ("data model scales well today " * 20).trim         // 100 tokens, 5 distinct
    val varied = (0 until 100).map(i => s"tok$i").mkString(" ")    // all-distinct grams
    val twoTok = "hello world"                                      // 1 bigram, 0 trigrams
    val oneTok = "solo"                                             // absent from output
    val docs = Seq((1L, loop), (2L, varied), (3L, twoTok), (4L, oneTok))
      .toDF("doc_id", "text")
    val rows = graft.ops.TextOps.repetitionStats(docs).collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getBoolean(4))).toMap
    assert(!rows.contains(4L), "single-token doc must be absent (no bigrams)")
    val (n2Loop, topLoop, dupLoop, flagLoop) = rows(1L)
    assert(n2Loop == 99L)
    // the phrase-boundary bigram appears 20x ("today data" 19x, others 20x)
    assert(topLoop == math.rint(20.0 / 99 * 1e6) / 1e6, s"top=$topLoop")
    assert(dupLoop == 1.0, s"every trigram of a loop repeats: $dupLoop")
    assert(flagLoop)
    val (n2Var, topVar, dupVar, flagVar) = rows(2L)
    assert(n2Var == 99L && !flagVar)
    assert(topVar == math.rint(1.0 / 99 * 1e6) / 1e6 && dupVar == 0.0)
    val (n2Two, _, dupTwo, flagTwo) = rows(3L)
    assert(n2Two == 1L && dupTwo == 0.0)
    // a doc whose ONLY bigram occurs once is top_frac 1.0 -> flagged:
    // the declared edge of a token-count signal on degenerate-length
    // docs (production gates pair it with a min-length gate)
    assert(flagTwo)
  }

  test("collocations: exact-integer PMI ranks the tight pair first") {
    import spark.implicits._
    // 5 docs of exactly "new york" (pair always together) + one filler
    // doc alternating aa/bb (pairs split across two orders). By hand:
    // pairs = 5·(new,york) + 2·(aa,bb) + 2·(bb,aa) → N = 9, slots = 18;
    // cw(new) = cw(york) = 5, cw(aa) = cw(bb) = 4.
    //   pmi(new,york) = 5·18·10⁶ div 25 = 3 600 000
    //   pmi(aa,bb) = pmi(bb,aa) = 2·18·10⁶ div 16 = 2 250 000
    val docs = ((1L to 5L).map(i => (i, "new york")) :+ (6L, "aa bb aa bb aa"))
      .toDF("doc_id", "text")
    val out = TextOps.collocations(docs, minCount = 2L, topK = 5)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(out.toSeq == Seq(
      ("new", "york", 5L, 3600000L),
      ("aa", "bb", 2L, 2250000L),
      ("bb", "aa", 2L, 2250000L)))
  }
}
