package graft

import org.scalacheck.{Gen, Prop, Properties, Test}
import org.scalacheck.Prop.propBoolean

import graft.ops.Dedup

/** Property: the driver union-find (hybrid small-graph path) and the
  * distributed min-label + pointer-jumping loop produce identical
  * cluster labels, and those labels equal a brute-force reachability
  * closure — across random graphs mixing chains, cliques-ish fan-ins,
  * and isolated pairs.
  */
object CcPropertySpec extends Properties("ConnectedComponents") {
  lazy val spark = GraftSpark.spark

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(8)

  val edgesGen: Gen[List[(Long, Long)]] = for {
    n <- Gen.choose(8, 60)
    m <- Gen.choose(4, 80)
    edges <- Gen.listOfN(m, for {
      a <- Gen.choose(0, n - 1)
      b <- Gen.choose(0, n - 1)
    } yield (math.min(a, b).toLong, math.max(a, b).toLong))
  } yield edges.filter { case (a, b) => a != b }.distinct

  /** Brute-force closure: repeatedly relabel to the min neighbor label. */
  private def bruteForce(edges: List[(Long, Long)]): Map[Long, Long] = {
    val nodes = edges.flatMap { case (a, b) => Seq(a, b) }.distinct
    var lbl = nodes.map(n => n -> n).toMap
    var changed = true
    while (changed) {
      changed = false
      edges.foreach { case (a, b) =>
        val m = math.min(lbl(a), lbl(b))
        if (lbl(a) != m) { lbl += a -> m; changed = true }
        if (lbl(b) != m) { lbl += b -> m; changed = true }
      }
    }
    lbl
  }

  property("hybridEqualsDistributedEqualsBruteForce") = Prop.forAll(edgesGen) { edges =>
    (edges.nonEmpty) ==> {
      import spark.implicits._
      val pairs = edges.toDF("doc_a", "doc_b")
      val expect = bruteForce(edges)
      val viaHybrid = Dedup.connectedComponents(pairs).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      val viaLoop = Dedup.connectedComponentsDistributed(pairs).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      (viaHybrid == expect) :| s"hybrid $viaHybrid != $expect" &&
        (viaLoop == expect) :| s"loop $viaLoop != $expect"
    }
  }
}
