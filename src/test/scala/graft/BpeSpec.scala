package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Bpe

/** Contracts for the BPE merge trainer: textbook merges on a toy
  * corpus, lexicographic tie-breaks, the left-to-right non-overlap
  * rule on a self-overlapping run, and determinism under repartition.
  */
class BpeSpec extends AnyFunSuite {
  private lazy val spark = GraftSpark.spark
  import spark.implicits._

  private def merges(corpus: Seq[String], n: Int): Seq[(Int, String, String, Long)] =
    Bpe.train(corpus.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text"), "text", n)
      .orderBy("merge_rank")
      .as[(Int, String, String, Long)].collect().toSeq

  test("learns the textbook merges on low/lower") {
    // types: low(2) lower(1); pair counts: (l,o)=3 (o,w)=3 (w,</w>)=2 …
    // tie (l,o)/(o,w) at 3 → lexicographic → (l,o); then (lo,w)=3 → low
    val got = merges(Seq("low low lower"), 3)
    assert(got(0) == ((1, "l", "o", 3L)))
    assert(got(1) == ((2, "lo", "w", 3L)))
    assert(got(2) == ((3, "low", "</w>", 2L)))
  }

  test("overlapping runs merge left-to-right non-overlapping") {
    // "aaaa": (a,a) counts positions 0,1,2 → 3; apply merges at 0 and 2
    // → [aa, aa, </w>]. Within the same iteration the fresh (aa,aa)
    // pair is NOT re-merged; it becomes the next iteration's candidate
    // set {(aa,aa)=1, (aa,</w>)=1} → tie → '</w>' < 'aa' → (aa,</w>).
    val got = merges(Seq("aaaa"), 2)
    assert(got(0) == ((1, "a", "a", 3L)))
    assert(got(1) == ((2, "aa", "</w>", 1L)))
  }

  test("pair counts are weighted by word frequency, not type count") {
    // 'ab' appears 5 times, 'cd' once: (a,b) must win with count 5
    val got = merges(Seq("ab ab ab ab ab cd"), 1)
    assert(got(0) == ((1, "a", "b", 5L)))
  }

  test("encode applies learned merges in rank order to the type dict") {
    val corpus = Seq((0L, "low low lower")).toDF("doc_id", "text")
    val merges = Seq(("l", "o"), ("lo", "w"), ("low", "</w>"))
    val got = Bpe.encodeTypes(Bpe.wordTypes(corpus, "text"), merges)
      .orderBy("word").as[(String, Long, Long)].collect().toSeq
    // low → [low</w>] (all three merges chain); lower → [low,e,r,</w>]
    // (the (low,</w>) merge can't fire: low is followed by e)
    assert(got == Seq(("low", 2L, 1L), ("lower", 1L, 4L)))
  }

  test("encodeTypesWithCurve: same final dict as encodeTypes, same points as encodeCurve") {
    val corpus = Seq((0L, "low low lower newest widest")).toDF("doc_id", "text")
    val types = Bpe.wordTypes(corpus, "text")
    val ms = Seq(("l", "o"), ("lo", "w"), ("low", "</w>"), ("e", "s"))
    val checks = Seq(0, 2, 4)
    val (dict, pts) = Bpe.encodeTypesWithCurve(types, ms, checks)
    val dictGot = dict.orderBy("word").as[(String, Long, Long)].collect().toSeq
    val dictExp = Bpe.encodeTypes(types, ms)
      .orderBy("word").as[(String, Long, Long)].collect().toSeq
    assert(dictGot == dictExp, dictGot)
    val ptsExp = Bpe.encodeCurve(types, ms, checks)
    assert(pts == ptsExp, pts)
  }

  test("merges are invariant under repartition") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val a = Bpe.train(docs, "text", 4).orderBy("merge_rank").collect().toSeq
    val b = Bpe.train(docs.repartition(13), "text", 4).orderBy("merge_rank").collect().toSeq
    assert(a == b)
  }
}
