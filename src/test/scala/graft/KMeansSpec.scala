package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Similarity
import graft.sources.Tables

class KMeansSpec extends AnyFunSuite {
  lazy val spark = GraftSpark.spark
  val sf = "/root/testdata/sf0.001"

  test("Lloyd iterations never increase inertia and stay deterministic") {
    val e = Similarity.asDouble(Tables.embeddings(spark, sf))
    val seed = Similarity.centroids(e)
    val a0 = Similarity.assignCells(e, seed)
    val i0 = Similarity.inertia(e, a0, seed)
    val (a2, c2) = Similarity.kmeans(e, 2)
    val i2 = Similarity.inertia(e, a2, c2)
    assert(i2 <= i0 + 1e-6, s"inertia rose: $i0 -> $i2")

    // determinism across runs
    val (a2b, _) = Similarity.kmeans(e, 2)
    assert(a2.collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1).toSeq ==
      a2b.collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1).toSeq)

    // every vector assigned exactly once
    assert(a2.count() == e.count())
  }
}
