package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Classify

/** Contracts for the model-based selection ops (DSIR importance
  * weighting + Naive Bayes): hand-built corpora with known answers,
  * determinism under repartition, and the meaningfulness floor on the
  * synthetic testdata (NB beats chance on the held-out split).
  */
class ClassifySpec extends AnyFunSuite {
  private lazy val spark = GraftSpark.spark
  import spark.implicits._

  private val B = 1024

  test("dsir: a pool doc made of target vocabulary outscores a disjoint-vocab doc") {
    val docs = Seq(
      // target corpus: "alpha beta gamma" language
      (1L, "alpha beta gamma alpha beta", true),
      (2L, "beta gamma alpha gamma", true),
      // pool: one target-like doc, one alien doc
      (10L, "alpha beta gamma beta", false),
      (11L, "zulu yankee xray whiskey", false)
    ).toDF("doc_id", "text", "is_t")
    val w = Classify.dsirWeightTable(docs, col("is_t"), "text", "t:", B)
    val scored = Classify.dsirScore(
      docs.filter(!col("is_t")), w, "doc_id", "text", "t:", B)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(scored(10L) > scored(11L),
      s"target-like doc must outscore alien doc: $scored")
    // alien tokens never occur in the target: every one of its features
    // has ct=0 => negative log-ratio => strictly negative score
    assert(scored(11L) < 0L)
    assert(scored(10L) > 0L)
  }

  test("dsir: scores are exact integers, invariant under repartition") {
    val docs = GraftSpark.spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
    val w = Classify.dsirWeightTable(docs, col("lang") === "en", "text", "dsir:", B)
    def run(d: org.apache.spark.sql.DataFrame) =
      Classify.dsirScore(d.filter(col("lang") =!= "en"), w, "doc_id", "text", "dsir:", B)
        .orderBy("doc_id").collect().toSeq
    assert(run(docs) == run(docs.repartition(13)))
  }

  test("nb: learns a two-label toy language and tie-breaks label-ascending") {
    val train = Seq(
      (1L, "cat", "cat cat dog cat"),
      (2L, "cat", "cat whiskers cat"),
      (3L, "bird", "tweet tweet wing"),
      (4L, "bird", "wing tweet feather")
    ).toDF("doc_id", "label", "text")
    val (model, ls) = Classify.nbTrain(train, "label", "text", "t:", B)
    val test = Seq(
      (10L, "cat cat whiskers"),   // clearly cat
      (11L, "tweet wing feather"), // clearly bird
      (12L, "neverseen tokens")    // all-unseen: ties on likelihood, equal priors -> label asc
    ).toDF("doc_id", "text")
    val pred = Classify.nbPredict(test, model, ls, "doc_id", "text", "t:", B)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(pred(10L) == "cat")
    assert(pred(11L) == "bird")
    // both labels have 2 docs (equal prior) and 2 tokens of all-unseen
    // text scores n_tokens*default_l; n_l differs (7 vs 6 tokens) so
    // bird's default is LESS negative -> bird wins (not a tie here) —
    // assert the exact integer argmax instead of hand-waving:
    assert(pred(12L) == "bird")
  }

  test("nb: unseen-label-bucket mass is carried by the default term (score parity with dense compute)") {
    // one doc whose tokens are partly unseen under one label: the
    // factored score (prior + n*default + matched deltas) must equal
    // the dense add-1 NB log-likelihood, micro-rounded per value.
    val train = Seq(
      (1L, "a1", "foo foo bar"),
      (2L, "a2", "baz qux qux quux")
    ).toDF("doc_id", "label", "text")
    val (model, ls) = Classify.nbTrain(train, "label", "text", "t:", B)
    val test = Seq((9L, "foo baz nope")).toDF("doc_id", "text")
    val pred = Classify.nbPredict(test, model, ls, "doc_id", "text", "t:", B)
      .collect().head.getString(1)
    // dense replay: label a1 has tokens {foo:2, bar:1} N=3; a2 {baz:1,qux:2,quux:1} N=4
    def micro(x: Double) = math.floor(x * 1e6 + 0.5).toLong
    def score(counts: Map[String, Long], n: Long): Long =
      micro(math.log(1.0 / 2.0)) +
        Seq("foo", "baz", "nope").map(t =>
          micro(math.log((counts.getOrElse(t, 0L) + 1).toDouble / (n + B))) -
            micro(math.log(1.0 / (n + B)))).sum +
        3L * micro(math.log(1.0 / (n + B)))
    val s1 = score(Map("foo" -> 2L, "bar" -> 1L), 3L)
    val s2 = score(Map("baz" -> 1L, "qux" -> 2L, "quux" -> 1L), 4L)
    val expected = if (s1 >= s2) "a1" else "a2"
    assert(pred == expected, s"dense replay says $expected (s1=$s1 s2=$s2), got $pred")
  }

  test("nb on testdata: beats chance on the held-out split (5 labels)") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val (model, ls) = Classify.nbTrain(
      docs.filter(col("doc_id") % 5 =!= 0), "lang", "text", "nb:", B)
    val pred = Classify.nbPredict(
      docs.filter(col("doc_id") % 5 === 0), model, ls, "doc_id", "text", "nb:", B,
      carry = Seq("lang"))
    val (hits, n) = {
      val rows = pred.select((col("lang") === col("pred_label")).cast("int")).collect()
      (rows.map(_.getInt(0)).sum, rows.length)
    }
    assert(n > 0 && hits.toDouble / n >= 0.3,
      s"NB should beat 5-way chance (0.2) with margin: $hits/$n")
  }

  test("perceptron: hand-replayable integer training on separable docs") {
    import spark.implicits._
    // Tokens aa/bb land in distinct buckets (asserted below). Pass 1
    // updates on EVERY doc (all-zero scores tie → mistake), so
    // w(aa) = +2+1+1 = 4, w(bb) = −2−1+1 = −2, bias = +3−2 = +1.
    // Pass 2 scores: 9, 5, −3, −1, 3 — all correct (y·s > 0), so
    // passes 2-3 change nothing and the final scores ARE those.
    val docs = Seq(
      (1L, "aa aa", 1L), (2L, "aa", 1L),
      (3L, "bb bb", -1L), (4L, "bb", -1L),
      (5L, "aa bb", 1L)
    ).toDF("doc_id", "text", "y")
    val bAa = Seq("aa").toDF("t")
      .select(Classify.featureBucket(col("t"), "t:", 1024)).collect()(0).getLong(0)
    val bBb = Seq("bb").toDF("t")
      .select(Classify.featureBucket(col("t"), "t:", 1024)).collect()(0).getLong(0)
    assert(bAa != bBb, "hand replay assumes no bucket collision")
    val (w, bias) = Classify.perceptronTrain(docs, "y", "text", "t:", 1024, 3)
    val wm = w.collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(wm == Map(bAa -> 4L, bBb -> -2L))
    assert(bias.collect()(0).getLong(0) == 1L)
    val out = Classify.perceptronScore(docs, w, bias, "doc_id", "text", "t:", 1024,
        carry = Seq("y"))
      .orderBy(col("doc_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.toSeq == Seq(
      (1L, 1L, 9L, 1L), (2L, 1L, 5L, 1L),
      (3L, -1L, -3L, -1L), (4L, -1L, -1L, -1L),
      (5L, 1L, 3L, 1L)))
    // averaged: passes 2-3 leave w unchanged, so the weight SUM is
    // exactly 3× the final vector — scores scale, signs don't move
    val (wa, ba) = Classify.perceptronTrain(docs, "y", "text", "t:", 1024, 3,
      averaged = true)
    assert(wa.collect().map(r => (r.getLong(0), r.getLong(1))).toMap ==
      Map(bAa -> 12L, bBb -> -6L))
    assert(ba.collect()(0).getLong(0) == 3L)
    val outA = Classify.perceptronScore(docs, wa, ba, "doc_id", "text", "t:", 1024,
        carry = Seq("y"))
      .orderBy(col("doc_id"))
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getLong(3)))
    assert(outA.toSeq == Seq(
      (1L, 27L, 1L), (2L, 15L, 1L), (3L, -9L, -1L), (4L, -3L, -1L), (5L, 9L, 1L)))
  }

  test("perceptron OVR: separable 3-class toy solved; unseen doc falls to best bias") {
    import spark.implicits._
    val docs = Seq(
      (1L, "aa aa", "A"), (2L, "aa", "A"),
      (3L, "bb bb", "B"), (4L, "bb", "B"),
      (5L, "cc cc", "C"), (6L, "cc", "C")
    ).toDF("doc_id", "text", "label")
    val (w, b) = Classify.perceptronTrainOvr(docs, "label", "text", "t:", 1024, 2)
    // model shape: one weight set per label, all rows integer
    assert(w.select("label").distinct().collect().map(_.getString(0)).sorted
      .toSeq == Seq("A", "B", "C"))
    val pred = Classify.perceptronPredictOvr(
        docs, w, b, "doc_id", "text", "t:", 1024, carry = Seq("label"))
      .orderBy(col("doc_id"))
      .collect().map(r => (r.getString(1), r.getString(2)))
    assert(pred.forall { case (truth, p) => truth == p },
      s"separable classes must be learned: ${pred.toSeq}")
    // a doc with only unseen vocabulary scores b_l for every label —
    // prediction = argmax bias, tie label-ascending (computed here from
    // the collected biases, not assumed)
    val biases = b.collect().map(r => (r.getString(0), r.getLong(1)))
    val expected = biases.minBy { case (l, bv) => (-bv, l) }._1
    val unseen = Classify.perceptronPredictOvr(
        Seq((9L, "zz zz")).toDF("doc_id", "text"), w, b,
        "doc_id", "text", "t:", 1024)
      .collect()(0).getString(1)
    assert(unseen == expected)
  }
}
