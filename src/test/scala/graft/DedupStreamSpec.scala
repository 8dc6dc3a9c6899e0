package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.DedupStream

class DedupStreamSpec extends AnyFunSuite {
  lazy val spark = GraftSpark.spark

  val original = "the quick brown fox jumps over the lazy dog near the river bank " +
    "while the sun sets slowly behind the old wooden bridge in the quiet village"
  val nearDup = original.replace("dog", "cat")
  val unrelated = "completely different content about spark catalyst optimizer rules " +
    "and whole stage code generation for vectorized parquet scans in modern engines"

  test("bounded exact dedup: drops dups within the horizon, re-admits after state expiry") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val mem = MemoryStream[(Long, String, java.sql.Timestamp)]
    val out = DedupStream.exactDedupBounded(
      mem.toDF().toDF("doc_id", "text", "ts"), "ts", "10 minutes")
    val q = out.writeStream.outputMode("append")
      .format("memory").queryName("bounded_dedup").start()
    try {
      // batch 1: original + in-horizon dup -> dup dropped
      mem.addData(
        (1L, original, ts("2024-01-01 10:00:00")),
        (2L, original, ts("2024-01-01 10:05:00")),
        (3L, unrelated, ts("2024-01-01 10:06:00")))
      q.processAllAvailable()
      // batch 2: advance the watermark far past 10:00 + 10min...
      mem.addData((4L, nearDup, ts("2024-01-01 12:00:00")))
      q.processAllAvailable()
      // batch 3: ...so the SAME text is re-admitted (its state expired)
      mem.addData((5L, original, ts("2024-01-01 12:01:00")))
      q.processAllAvailable()
      val ids = spark.table("bounded_dedup").select("doc_id")
        .collect().map(_.getLong(0)).toSet
      assert(ids == Set(1L, 3L, 4L, 5L), ids)
    } finally q.stop()
  }

  test("streaming LSH flags near-dups across micro-batches, not unrelated docs") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, String)]
    val q = DedupStream.lshCandidates(mem.toDF().toDF("doc_id", "text"))
      .writeStream.outputMode("append").format("memory").queryName("lsh_hits").start()
    try {
      mem.addData((1L, original), (2L, unrelated))
      q.processAllAvailable()
      assert(spark.table("lsh_hits").count() == 0) // nothing similar yet

      mem.addData((3L, nearDup), (4L, original)) // near-dup + exact dup arrive later
      q.processAllAvailable()
      val hits = spark.table("lsh_hits").as[DedupStream.BandHit].collect()
      val pairs = hits.map(h => (h.first_doc, h.doc_id)).distinct.toSet
      assert(pairs.contains((1L, 4L))) // exact dup: every band collides
      assert(pairs.contains((1L, 3L))) // near dup: >=1 band collides
      assert(!pairs.exists(p => p._1 == 2L || p._2 == 2L))
    } finally q.stop()
  }

  test("streaming paragraph dedup: foreachBatch against an accumulating hash index") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import graft.ops.Dedup
    // ingested corpus → distinct-hash paragraph index; each micro-batch
    // probes the index (delta-sized work) and appends its own hashes —
    // the batch-incremental shape that keeps paragraph state in the
    // lake, not the state store
    val corpus = Seq((1L, "alpha beta gamma delta")).toDF("doc_id", "text")
    var idx = Dedup.paragraphHashTable(Dedup.segmentsByBlock(corpus, block = 4))
      .localCheckpoint(true)
    val results = scala.collection.mutable.Map[Long, Long]()
    val mem = MemoryStream[(Long, String)]
    val q = mem.toDF().toDF("doc_id", "text").writeStream.outputMode("append")
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        val segs = Dedup.segmentsByBlock(batch, block = 4)
        Dedup.paragraphDedupVersusCorpus(segs, idx).collect()
          .foreach(r => results(r.getLong(0)) = r.getLong(2))
        idx = idx.union(Dedup.paragraphHashTable(segs)).distinct().localCheckpoint(true)
        ()
      }.start()
    try {
      mem.addData(
        (10L, "alpha beta gamma delta nine ten eleven twelve"), // para 1 in corpus
        (11L, "fresh words right here"))
      q.processAllAvailable()
      mem.addData((20L, "fresh words right here plus more novel stuff")) // para 1 from batch 1
      q.processAllAvailable()
      assert(results.toMap == Map(10L -> 1L, 11L -> 1L, 20L -> 1L), results)
    } finally q.stop()
  }

  test("streaming ExactSubstr: batch-incremental strip equals the whole-corpus strip") {
    // The r12 VERDICT decision spec: gram state in the state store
    // would pin O(corpus grams) rows, so the honest scale shape is
    // batch-incremental foreachBatch against a lake-resident gram-first
    // index. This test turns that argument into parity: the same doc
    // stream (ascending ids across micro-batches = ingest order) strips
    // IDENTICALLY to one whole-corpus Dedup.stripDuplicateSpans run.
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import graft.ops.Dedup
    def toks(p: String, r: Range) = r.map(i => s"$p$i").mkString(" ")
    val aRun = toks("a", 5 to 16) // 12-token run planted across batches
    val bRun = toks("b", 3 to 14)
    val sRun = toks("s", 1 to 10)
    val batches = Seq(
      Seq(1L -> toks("a", 1 to 20), 2L -> toks("b", 1 to 20)),
      Seq(10L -> s"${toks("c", 1 to 6)} $aRun ${toks("c", 7 to 12)}",
        11L -> toks("d", 1 to 15)),
      // within-batch pair: 20 keeps the shared run (lower key), 21 cut;
      // 22 re-quotes batch-2's corpus-resident a-run
      Seq(20L -> s"${toks("f", 1 to 10)} $sRun",
        21L -> s"${toks("g", 1 to 5)} $sRun ${toks("g", 6 to 8)}",
        22L -> s"$bRun ${toks("h", 1 to 9)}"))
    val allDocs = batches.flatten.toDF("doc_id", "text")
    val expected = Dedup.stripDuplicateSpans(allDocs, k = 8).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3))))
      .toMap
    var idx = Seq.empty[(Long, Long)].toDF("h", "first_key")
    val got = scala.collection.mutable.Map[Long, (Long, Long, String)]()
    val mem = MemoryStream[(Long, String)]
    val q = mem.toDF().toDF("doc_id", "text").writeStream.outputMode("append")
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        val b = batch.localCheckpoint(true)
        Dedup.stripVersusCorpus(b, idx, k = 8).collect().foreach(r =>
          got(r.getLong(0)) = ((r.getLong(1), r.getLong(2), r.getString(3))))
        // index accumulation: min-merge this batch's gram-first table
        // (ascending ingest keys make the min the global first)
        idx = idx.union(Dedup.gramFirstTable(b, k = 8)).groupBy("h")
          .agg(org.apache.spark.sql.functions.min("first_key").as("first_key"))
          .localCheckpoint(true)
        ()
      }.start()
    try {
      batches.foreach { bt => mem.addData(bt: _*); q.processAllAvailable() }
    } finally q.stop()
    assert(got.toMap == expected,
      s"incremental strip diverged from batch:\n got=${got.toMap}\n exp=$expected")
    // and the plants actually exercised every path: cross-batch cut,
    // within-batch keep-first, corpus re-quote cut
    assert(expected(10L)._2 == expected(10L)._1 - 12) // a-run cut from host
    assert(expected(20L)._2 == expected(20L)._1)      // first occurrence kept
    assert(expected(21L)._2 < expected(21L)._1)       // later occurrence cut
    assert(expected(22L)._2 < expected(22L)._1)       // corpus-resident run cut
  }

  test("streaming versusCorpus: stateless stream-static dedup against a static corpus") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val corpus = Seq((10L, original), (20L, unrelated)).toDF("doc_id", "text")
    val mem = MemoryStream[(Long, String)]
    val stream = DedupStream.versusCorpus(
      mem.toDF().toDF("doc_id", "text"), corpus, 0.5)
    // truly stateless: the physical plan must contain NO stateful operator
    val q = stream.writeStream.outputMode("append")
      .format("memory").queryName("vs_corpus").start()
    try {
      mem.addData((100L, original), (200L, "nothing in common with anything at all here truly"))
      q.processAllAvailable()
      mem.addData((300L, original)) // later batch matches independently (no cross-batch state)
      q.processAllAvailable()
      val rows = spark.table("vs_corpus").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      // exact copies: exactly ONE row per (new, corpus) pair despite all
      // 4 bands colliding (min-common-band dedup), jaccard 1.0
      assert(rows.count(r => r._1 == 100L && r._2 == 10L) == 1, rows.toSeq)
      assert(rows.count(r => r._1 == 300L && r._2 == 10L) == 1, rows.toSeq)
      assert(rows.filter(r => r._1 == 100L || r._1 == 300L).forall(_._3 == 1.0))
      assert(!rows.exists(_._1 == 200L), rows.toSeq)
      // and the streaming plan holds no state store
      val statefulOps = q.lastProgress.stateOperators
      assert(statefulOps == null || statefulOps.isEmpty,
        s"expected stateless plan, got ${statefulOps.mkString(",")}")
    } finally q.stop()
    // batch agreement: the same operator over a batch frame reproduces
    // Dedup.newVersusCorpus
    val batchDocs = Seq((100L, original), (300L, nearDup)).toDF("doc_id", "text")
    val viaStreamOp = DedupStream.versusCorpus(batchDocs, corpus, 0.5).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val viaBatch = graft.ops.Dedup.newVersusCorpus(batchDocs, corpus, 0.5).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(viaStreamOp == viaBatch)
  }
}
