package graft

import org.scalacheck.{Gen, Prop, Properties, Test}
import org.scalacheck.Prop.propBoolean

import graft.ops.Graph

/** Property: the distributed PageRank equals a driver-side reference
  * implementation that replays the identical arithmetic (same damped
  * update, same round-6 per-iteration quantization) on random weighted
  * digraphs — the distribution of the computation cannot change the
  * result.
  */
object PageRankPropertySpec extends Properties("PageRank") {
  lazy val spark = GraftSpark.spark

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(8)

  val edgesGen: Gen[List[(Long, Long, Double)]] = for {
    n <- Gen.choose(4, 40)
    m <- Gen.choose(3, 120)
    edges <- Gen.listOfN(m, for {
      a <- Gen.choose(0, n - 1)
      b <- Gen.choose(0, n - 1)
      w <- Gen.choose(1, 5)
    } yield (a.toLong, b.toLong, w.toDouble))
  } yield edges.filter { case (a, b, _) => a != b }
    .groupBy { case (a, b, _) => (a, b) }
    .map { case ((a, b), ws) => (a, b, ws.map(_._3).sum) }.toList

  private def round6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  /** Reference: plain Scala maps, same formula and quantization. */
  private def reference(edges: List[(Long, Long, Double)], iters: Int,
      damping: Double = 0.85, mass: Double = 1000.0): Map[Long, Double] = {
    val nodes = (edges.map(_._1) ++ edges.map(_._2)).distinct
    val n = nodes.size.toDouble
    val outW = edges.groupBy(_._1).map { case (s, es) => s -> es.map(_._3).sum }
    var pr = nodes.map(v => v -> round6(mass / n)).toMap
    for (_ <- 1 to iters) {
      val pushed = edges
        .groupBy(_._2)
        .map { case (dst, es) =>
          dst -> es.map { case (src, _, w) => pr(src) * (w / outW(src)) }.sum
        }
      pr = nodes.map(v =>
        v -> round6((1.0 - damping) * mass / n + damping * pushed.getOrElse(v, 0.0))).toMap
    }
    pr
  }

  property("distributed == driver reference (same rounding) on random digraphs") =
    Prop.forAll(edgesGen) { edges =>
      edges.nonEmpty ==> {
        import spark.implicits._
        val got = Graph.pagerank(edges.toDF("src", "dst", "w"), iters = 3)
          .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
        val want = reference(edges, iters = 3)
        // identical modulo the last quantization step: the reference sums
        // contributions in list order, the cluster in partition order — the
        // round-6 grid absorbs that (this is exactly the oracle's contract)
        val close = got.keySet == want.keySet &&
          got.forall { case (k, v) => math.abs(v - want(k)) <= 1e-6 + 1e-12 }
        if (!close) println(s"edges=$edges\ngot=$got\nwant=$want")
        close
      }
    }
}
