package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{Classify, Graph}

/** Parity pins for the round-13 cross-query sharing optimizations: the
  * shared/memoized forms must be BIT-IDENTICAL to the per-query forms
  * they replaced, or the oracle hashes would drift. Each test compares
  * the optimized construction against the original one on a corpus
  * small enough to enumerate.
  */
class OptSharingSpec extends AnyFunSuite {
  lazy val spark = GraftSpark.spark
  import spark.implicits._

  private lazy val docs = Seq(
    (1L, "en", "s1", "the cat sat on the mat"),
    (2L, "de", "s1", "der hund und der ball"),
    (3L, "en", "s2", "the dog ate the cat food"),
    (4L, "fr", "s2", "le chat et le chien"),
    (5L, "en", "s1", "cat and dog and mat"),
    (6L, "de", "s2", "der ball und der hund spielt")
  ).toDF("doc_id", "lang", "source", "text")

  private def wmap(df: org.apache.spark.sql.DataFrame): Map[Long, Long] =
    df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("perceptron trajectory pass p equals a fresh p-pass training; pass 0 the Collins sum") {
    val d = docs.select(col("doc_id"), col("text"),
      when(col("lang") === "en", 1L).otherwise(-1L).as("y"))
    val counts = Classify.tokenBucketCounts(d, "doc_id", "text", "t:", 16,
      carry = Seq("y"))
    val traj = Classify.perceptronTrainTrajectoryOnCounts(counts, 3).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
    def trajModel(p: Int): (Map[Long, Long], Long) = {
      val rows = traj.filter(_._1 == p)
      (rows.filter(_._2 >= 0).map(t => t._2 -> t._3).toMap,
        rows.find(_._2 == -1L).get._3)
    }
    (1 to 3).foreach { p =>
      val (w, b) = Classify.perceptronTrain(d, "y", "text", "t:", 16, p)
      val exp = (wmap(w), b.collect()(0).getLong(0))
      assert(trajModel(p) == exp, s"pass $p drifted")
    }
    val (wAvg, bAvg) = Classify.perceptronTrain(d, "y", "text", "t:", 16, 3,
      averaged = true)
    assert(trajModel(0) == (wmap(wAvg), bAvg.collect()(0).getLong(0)),
      "averaged (pass 0) drifted")
  }

  test("scoring over a superset-carry count table matches perceptronScore") {
    val d = docs.select(col("doc_id"), col("text"),
      when(col("lang") === "en", 1L).otherwise(-1L).as("y"))
    val (w, b) = Classify.perceptronTrain(d, "y", "text", "t:", 16, 2)
    val orig = Classify.perceptronScore(d, w, b, "doc_id", "text", "t:", 16,
        carry = Seq("y"))
      .orderBy(col("doc_id")).collect().map(_.toSeq).toSeq
    val wide = Classify.tokenBucketCounts(
      docs.select(col("doc_id"), col("lang"), col("text"),
        when(col("lang") === "en", 1L).otherwise(-1L).as("y")),
      "doc_id", "text", "t:", 16, carry = Seq("lang", "y"))
    val shared = Classify.perceptronScoreOnCounts(wide, w, b, "doc_id",
        Seq("lang", "y"), Seq("y"))
      .orderBy(col("doc_id")).collect().map(_.toSeq).toSeq
    assert(shared == orig)
  }

  test("OvR training and scoring over a shared count table match the featurizing forms") {
    val d = docs.select(col("doc_id"), col("lang"), col("text"))
    val (w0, b0) = Classify.perceptronTrainOvr(d, "lang", "text", "o:", 16, 2)
    val wide = Classify.tokenBucketCounts(docs, "doc_id", "text", "o:", 16,
      carry = Seq("lang", "source"))
    val (w1, b1) = Classify.perceptronTrainOvrOnCounts(
      wide.withColumnRenamed("lang", "label"), 2)
    assert(w1.collect().map(_.toSeq).toSet == w0.collect().map(_.toSeq).toSet)
    assert(b1.collect().map(_.toSeq).toSet == b0.collect().map(_.toSeq).toSet)
    val orig = Classify.perceptronScoresOvr(d, w0, b0, "doc_id", "text", "o:",
        16, carry = Seq("lang"))
      .orderBy(col("doc_id"), col("_m_label")).collect().map(_.toSeq).toSeq
    val shared = Classify.perceptronScoresOvrOnCounts(wide, w0, b0, "doc_id",
        Seq("lang", "source"), Seq("lang"))
      .orderBy(col("doc_id"), col("_m_label")).collect().map(_.toSeq).toSeq
    assert(shared == orig)
  }

  test("kCore with a caller-owned round-0 table equals the self-built form") {
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L), (4L, 5L),
      (5L, 6L), (4L, 6L), (5L, 7L)).toDF("src", "dst")
    val self = Graph.kCore(edges, 2).orderBy("node")
      .collect().map(_.toSeq).toSeq
    val e = edges.filter(col("src") =!= col("dst"))
    val und0 = e.union(e.select(col("dst").as("src"), col("src").as("dst")))
      .distinct().repartition(col("src")).persist()
    val shared = Graph.kCore(edges, 2, und0 = Some(und0)).orderBy("node")
      .collect().map(_.toSeq).toSeq
    und0.unpersist()
    assert(shared == self)
  }

  test("BFS distances with a caller-owned edge table equal the self-built form") {
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (5L, 6L)).toDF("src", "dst")
    val seed = Seq(1L).toDF("node")
    val self = Graph.bfsDistances(edges, seed).orderBy("node")
      .collect().map(_.toSeq).toSeq
    val e = edges.filter(col("src") =!= col("dst"))
    val und0 = e.union(e.select(col("dst").as("src"), col("src").as("dst")))
      .distinct().repartition(col("src")).persist()
    val shared = Graph.bfsDistances(edges, seed, und0 = Some(und0))
      .orderBy("node").collect().map(_.toSeq).toSeq
    und0.unpersist()
    assert(shared == self)
  }
}
