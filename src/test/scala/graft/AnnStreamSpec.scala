package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Similarity

/** Stream-vs-corpus ANN: per-micro-batch scoring must equal the batch
  * operator on the same accumulated queries — the streaming path is the
  * SAME generic operator run incrementally, with the corpus code table
  * materialized once.
  */
class AnnStreamSpec extends AnyFunSuite {
  lazy val spark = GraftSpark.spark
  val sf = "/root/testdata/sf0.001"

  test("streaming top-k vs static corpus == batch top-k on the same queries") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val corpus = Similarity.normalized(
      Similarity.asDouble(graft.sources.Tables.embeddings(spark, sf)))
      .select(col("vec_id"), col("embedding"))
    val corpusCodes = Similarity.lshMultiTableCodes(corpus)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    corpusCodes.count() // materialize the static side once

    val queryRows = corpus.filter(col("vec_id") < 10)
      .as[(Long, Seq[Double])].collect().toSeq
    val mem = MemoryStream[(Long, Seq[Double])]
    val got = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long, Double)]
    val q = graft.streaming.AnnStream.topKVersusCorpus(
      mem.toDF().toDF("vec_id", "embedding"), corpus, 3,
      corpusCodes = Some(corpusCodes)) { batch =>
      got ++= batch.collect().map(r =>
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    }
    try {
      mem.addData(queryRows.take(5): _*)
      q.processAllAvailable()
      mem.addData(queryRows.drop(5): _*)
      q.processAllAvailable()
    } finally q.stop()

    val batchResult = Similarity.lshMultiTableTopK(
        corpus.filter(col("vec_id") < 10), corpus, 3,
        corpusCodes = Some(corpusCodes))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    corpusCodes.unpersist(blocking = false)
    assert(got.toSet == batchResult.toSet, s"got=${got.size} batch=${batchResult.length}")
    assert(got.nonEmpty && got.map(_._1).distinct.size == 10)
  }

  test("streaming PQ/ADC vs static code table == batch ADC on the same queries") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val m = 4
    val raw = Similarity.asDouble(graft.sources.Tables.embeddings(spark, sf))
    val books = Similarity.pqCodebooks(raw, m).localCheckpoint(true)
    val corpusCodes = Similarity.pqEncode(raw, books, m)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    corpusCodes.count() // the compressed corpus, materialized once

    val queryRows = raw.filter(col("vec_id") < 10)
      .select(col("vec_id"), col("embedding"))
      .as[(Long, Seq[Double])].collect().toSeq
    val mem = MemoryStream[(Long, Seq[Double])]
    val got = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long, Long)]
    val q = graft.streaming.AnnStream.pqTopKVersusCorpus(
      mem.toDF().toDF("vec_id", "embedding"), corpusCodes, books, 3, m) { batch =>
      got ++= batch.collect().map(r =>
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    }
    try {
      mem.addData(queryRows.take(5): _*)
      q.processAllAvailable()
      mem.addData(queryRows.drop(5): _*)
      q.processAllAvailable()
    } finally q.stop()

    val batchResult = Similarity.pqAdcTopK(
        raw.filter(col("vec_id") < 10), corpusCodes, books, 3, m)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    corpusCodes.unpersist(blocking = false)
    assert(got.toSet == batchResult.toSet, s"got=${got.size} batch=${batchResult.length}")
    assert(got.nonEmpty && got.map(_._1).distinct.size == 10)
  }

  test("streaming IVFADC vs static residual-code table == batch IVFADC on the same queries") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val m = 8
    val raw = Similarity.asDouble(graft.sources.Tables.embeddings(spark, sf))
    val cents = Similarity.centroids(raw).localCheckpoint(true)
    val res = Similarity.ivfResiduals(raw, cents)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val books = Similarity.pqCodebooks(res, m, lloydRounds = 2,
      seed = pmod(col("vec_id"), lit(32)))
    val corpusCodes = Similarity.pqEncode(res, books, m)
      .join(res.select(col("vec_id"), col("ivf_cell")), "vec_id")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    corpusCodes.count() // the static compressed+celled corpus, once

    val queryRows = raw.filter(col("vec_id") < 10)
      .select(col("vec_id"), col("embedding"))
      .as[(Long, Seq[Double])].collect().toSeq
    val mem = MemoryStream[(Long, Seq[Double])]
    val got = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long, Long)]
    val q = graft.streaming.AnnStream.ivfPqTopKVersusCorpus(
      mem.toDF().toDF("vec_id", "embedding"), corpusCodes, cents, books,
      3, m, 3) { batch =>
      got ++= batch.collect().map(r =>
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    }
    try {
      mem.addData(queryRows.take(5): _*)
      q.processAllAvailable()
      mem.addData(queryRows.drop(5): _*)
      q.processAllAvailable()
    } finally q.stop()

    val batchResult = Similarity.ivfPqTopK(
        raw.filter(col("vec_id") < 10), corpusCodes, cents, books, 3, m, 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    res.unpersist(blocking = false)
    corpusCodes.unpersist(blocking = false)
    assert(got.toSet == batchResult.toSet, s"got=${got.size} batch=${batchResult.length}")
    assert(got.nonEmpty && got.map(_._1).distinct.size == 10)
  }
}
