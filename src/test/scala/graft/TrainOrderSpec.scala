package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.TrainOrder
import graft.sources.Tables

/** The two properties that make [[TrainOrder.epochOrder]] a training
  * artifact rather than a shuffle: REPRODUCIBILITY (same salt → the
  * bit-identical order, across independent plan executions) and
  * EPOCH DECORRELATION (different epochs → independent shard
  * assignment / order), plus the exact mixture semantics (whole
  * weights replicate exactly, fractional weights hash-Bernoulli).
  */
class TrainOrderSpec extends AnyFunSuite {
  lazy val spark = GraftSpark.spark
  val sf = "/root/testdata/sf0.001"

  private def order() =
    TrainOrder.epochOrder(Tables.documents(spark, sf),
      epochs = 2, nShards = 8, salt = "to")

  private def rows() = order()
    .orderBy("epoch", "shard", "pos").collect().map(_.toSeq).toSeq

  test("same salt is bit-identical across two independent runs") {
    assert(rows() == rows())
  }

  test("a different salt is a different permutation") {
    val a = rows()
    val b = TrainOrder.epochOrder(Tables.documents(spark, sf),
        epochs = 2, nShards = 8, salt = "other")
      .orderBy("epoch", "shard", "pos").collect().map(_.toSeq).toSeq
    assert(a != b)
  }

  test("epochs are decorrelated: shard agreement is near 1/nShards") {
    val o = order().filter(col("rep") === 1L)
      .select(col("epoch"), col("doc_id"), col("shard")).collect()
      .groupBy(_.getLong(1))
    val both = o.values.filter(_.length == 2).toSeq
    assert(both.length > 300, s"expected most docs in both epochs: ${both.length}")
    val same = both.count(g => g.map(_.getLong(2)).distinct.length == 1)
    val frac = same.toDouble / both.length
    // expected 0.125 under independence (binomial sd ~0.015 at n~500);
    // identical epochs would read 1.0
    assert(frac < 0.25, s"shard agreement $frac — epochs not decorrelated")
  }

  test("mixture: whole weights exact, fractional hash-Bernoulli, default 1") {
    val perSrc = order().groupBy("epoch", "source")
      .agg(countDistinct(col("doc_id")).as("docs"),
        count(lit(1)).as("rows_")).collect()
    perSrc.foreach { r =>
      val (src, docs, n) =
        (r.getString(1), r.getLong(2), r.getLong(3))
      src match {
        case "src0" => assert(n == 2 * docs, s"src0 must ride exactly twice: $r")
        case "src1" => assert(n > docs && n < 2 * docs, s"src1 ~1.5x: $r")
        case "src2" => assert(n == docs, s"src2 kept docs appear once: $r")
        case _      => assert(n == docs, s"default weight is exactly 1: $r")
      }
    }
    // src2 is DOWNSAMPLED to ~1/4 of its 25 docs per epoch
    val src2 = perSrc.filter(_.getString(1) == "src2")
    assert(src2.length == 2)
    src2.foreach(r => assert(r.getLong(2) > 0 && r.getLong(2) < 15,
      s"src2 ~25% keep of 25 docs: $r"))
  }

  test("positions are contiguous 1..n within every (epoch, shard)") {
    val bad = order().groupBy("epoch", "shard")
      .agg(count(lit(1)).as("n"), min("pos").as("lo"), max("pos").as("hi"))
      .filter(col("lo") =!= 1L || col("hi") =!= col("n"))
      .count()
    assert(bad == 0L)
  }

  test("manifest totals reconcile with the order table") {
    val o = order().localCheckpoint(true)
    val m = TrainOrder.shardManifest(o)
    val lhs = m.agg(sum("n_seqs"), sum("total_tokens")).collect().head
    val rhs = o.agg(count(lit(1)), sum("n_tokens")).collect().head
    assert(lhs.getLong(0) == rhs.getLong(0) && lhs.getLong(1) == rhs.getLong(1))
  }
}
