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

  test("pcaPowerProjection finds the dominant axis and is bit-deterministic") {
    import spark.implicits._
    // variance concentrated on axis 0; axis 1 is noise an order smaller
    val e = Seq(
      (1L, Array(10.0f, 0.1f)), (2L, Array(-10.0f, -0.1f)),
      (3L, Array(8.0f, 0.0f)), (4L, Array(-8.0f, 0.05f)),
      (5L, Array(0.5f, 1.0f))
    ).toDF("vec_id", "embedding")
    val p = Similarity.pcaPowerProjection(e, iterations = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // projections order by the x-coordinate (dominant direction ~ +x
    // since power iteration starts from the all-ones vector... sign is
    // whatever the iteration converges to; assert up to a global sign)
    val s = if (p(1L) > 0) 1L else -1L
    val q = p.view.mapValues(_ * s).toMap
    assert(q(1L) > q(3L) && q(3L) > q(5L) && q(5L) > q(4L) && q(4L) > q(2L), q)
    // bit-exact reproducibility (integer pipeline)
    val p2 = Similarity.pcaPowerProjection(e, iterations = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(p == p2)
  }

  test("semanticDedup: planted near-copies drop, originals survive") {
    import org.apache.spark.sql.functions._
    val e = Similarity.asDouble(Tables.embeddings(spark, sf))
      .select(col("vec_id"), col("label"), col("embedding"))
    val planted = e.union(
      e.filter(col("vec_id") % 5 === 0).select(
        (col("vec_id") + 10000).as("vec_id"), col("label"),
        transform(col("embedding"), (x, i) =>
          when(i === 0, x + 0.01).otherwise(x)).as("embedding")))
    val dropped = Similarity.semanticDedup(planted, 3, 0.95)
      .collect().map(_.getAs[Long]("vec_id")).toSet
    val plantedIds = e.filter(col("vec_id") % 5 === 0)
      .collect().map(_.getLong(0) + 10000).toSet
    // every planted copy shares a cell with its ~identical original and
    // carries the larger id -> must be dropped
    assert(plantedIds.subsetOf(dropped),
      s"missing: ${plantedIds -- dropped}")
    // no original may drop on account of its planted copy (copy has the
    // larger id); originals can only drop against other organic vectors
    // at cos >= 0.95, which the near-uniform synthetic space doesn't have
    assert(dropped == plantedIds, s"unexpected drops: ${dropped -- plantedIds}")
  }
}
