package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Similarity

/** Product quantization: codebook shape, nearest-cell encoding, and the
  * ADC identity — when corpus vectors sit exactly at their codebook
  * centroids, quantization error is zero and ADC must reproduce the
  * EXACT squared L2 ranking.
  */
class PqSpec extends AnyFunSuite {
  lazy val spark = GraftSpark.spark

  // label 0 lives at [1,1,1,1 | 0,0,0,0], label 1 at [0,0,0,0 | 2,2,2,2]
  private def corpus = {
    import spark.implicits._
    Seq(
      (1L, Array(1.0, 1.0, 1.0, 1.0, 0.0, 0.0, 0.0, 0.0), 0L),
      (2L, Array(1.0, 1.0, 1.0, 1.0, 0.0, 0.0, 0.0, 0.0), 0L),
      (3L, Array(1.0, 1.0, 1.0, 1.0, 0.0, 0.0, 0.0, 0.0), 0L),
      (4L, Array(0.0, 0.0, 0.0, 0.0, 2.0, 2.0, 2.0, 2.0), 1L),
      (5L, Array(0.0, 0.0, 0.0, 0.0, 2.0, 2.0, 2.0, 2.0), 1L),
      (6L, Array(0.0, 0.0, 0.0, 0.0, 2.0, 2.0, 2.0, 2.0), 1L)
    ).toDF("vec_id", "embedding", "label")
  }

  test("codebooks: one centroid per (subspace, label), exact means") {
    val books = Similarity.pqCodebooks(corpus, m = 2).collect()
      .map(r => (r.getInt(0), r.getLong(1)) -> r.getSeq[Double](2)).toMap
    assert(books.size == 4)
    assert(books((0, 0L)) == Seq(1.0, 1.0, 1.0, 1.0))
    assert(books((0, 1L)) == Seq(0.0, 0.0, 0.0, 0.0))
    assert(books((1, 0L)) == Seq(0.0, 0.0, 0.0, 0.0))
    assert(books((1, 1L)) == Seq(2.0, 2.0, 2.0, 2.0))
  }

  test("encode: every vector gets m codes, each its own label's cell") {
    val books = Similarity.pqCodebooks(corpus, m = 2)
    val codes = Similarity.pqEncode(corpus, books, m = 2).collect()
      .map(r => (r.getLong(0), r.getInt(1)) -> r.getLong(2)).toMap
    assert(codes.size == 12) // 6 vectors x 2 subspaces
    for (v <- 1L to 3L; s <- 0 to 1) assert(codes((v, s)) == 0L, s"vec $v s $s")
    for (v <- 4L to 6L; s <- 0 to 1) assert(codes((v, s)) == 1L, s"vec $v s $s")
  }

  test("ADC with zero quantization error == exact squared L2 ranking") {
    import spark.implicits._
    val books = Similarity.pqCodebooks(corpus, m = 2)
    val codes = Similarity.pqEncode(corpus, books, m = 2)
    // query halfway: |q - v0|^2 = 0 + 4 = 4; |q - v1|^2 = 4 + 4 = 8
    val q = Seq((100L, Array(1.0, 1.0, 1.0, 1.0, 1.0, 1.0, 1.0, 1.0)))
      .toDF("vec_id", "embedding")
    val top = Similarity.pqAdcTopK(q, codes, books, k = 6, m = 2).collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(top.length == 6)
    // ranks 1-3: the label-0 copies at adc 4e6, id tie-break; 4-6 at 8e6
    assert(top.toSeq == Seq(
      (1L, 1L, 4000000L), (2L, 2L, 4000000L), (3L, 3L, 4000000L),
      (4L, 4L, 8000000L), (5L, 5L, 8000000L), (6L, 6L, 8000000L)))
  }

  test("lloyd refinement: a cluster-mixing seed converges to the true per-subspace cells in one round") {
    import org.apache.spark.sql.functions.{col, lit, pmod}
    // vec_id % 2 mixes the two planted clusters in both seed cells;
    // one assign/recompute round must separate them exactly
    val books = Similarity.pqCodebooks(corpus, m = 2, lloydRounds = 1,
        seed = pmod(col("vec_id"), lit(2))).collect()
      .map(r => (r.getInt(0), r.getLong(1)) -> r.getSeq[Double](2)).toMap
    assert(books.size == 4) // 2 subspaces x 2 cells, no empties
    assert(books.collect { case ((0, _), v) => v }.toSet ==
      Set(Seq(1.0, 1.0, 1.0, 1.0), Seq(0.0, 0.0, 0.0, 0.0)))
    assert(books.collect { case ((1, _), v) => v }.toSet ==
      Set(Seq(2.0, 2.0, 2.0, 2.0), Seq(0.0, 0.0, 0.0, 0.0)))
  }

  test("ivfpq: the probed-cell join IS the pruning — nprobe=1 scans only the query's cell") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, lit, pmod}
    val cents = Similarity.centroids(corpus)
    val res = Similarity.ivfResiduals(corpus, cents)
    // residuals are exactly zero here: both seed cells collapse and the
    // surviving codebook is the single zero centroid per subspace
    val books = Similarity.pqCodebooks(res, m = 2, lloydRounds = 2,
      seed = pmod(col("vec_id"), lit(2)))
    val codes = Similarity.pqEncode(res, books, m = 2)
      .join(res.select(col("vec_id"), col("ivf_cell")), "vec_id")
    val q = corpus.filter($"vec_id" === 1L).select($"vec_id", $"embedding")
    val near = Similarity.ivfPqTopK(q, codes, cents, books, k = 5, m = 2, nprobe = 1)
      .collect()
    // k=5 asked, but nprobe=1 restricts the scan to cell 0's residents
    assert(near.map(_.getLong(1)).toSet == Set(2L, 3L))
    val all = Similarity.ivfPqTopK(q, codes, cents, books, k = 5, m = 2, nprobe = 2)
      .collect().map(r => (r.getLong(1), r.getLong(3)))
    // nprobe=2 reaches the far cell: residual-ADC distance vs cell 1 is
    // |qres|^2 = 4 + 16 = 20 exactly (zero quantization error)
    assert(all.toMap == Map(2L -> 0L, 3L -> 0L,
      4L -> 20000000L, 5L -> 20000000L, 6L -> 20000000L))
  }

  test("self-match is excluded; k truncates") {
    import spark.implicits._
    val books = Similarity.pqCodebooks(corpus, m = 2)
    val codes = Similarity.pqEncode(corpus, books, m = 2)
    val q = corpus.filter($"vec_id" === 1L).select($"vec_id", $"embedding")
    val top = Similarity.pqAdcTopK(q, codes, books, k = 2, m = 2).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // vec 1's nearest codes are its exact twins 2 and 3 at adc 0, never itself
    assert(top.toSeq == Seq((1L, 2L, 1L, 0L), (1L, 3L, 2L, 0L)))
  }
}
