package graft

import org.scalatest.funsuite.AnyFunSuite

/** Stage-level behavior of the curation flagship (q_curation's DuckDB
  * oracle checks exact values; this checks each stage actually removes
  * what it claims on the seeded copies).
  */
class CurationSpec extends AnyFunSuite {
  lazy val spark = GraftSpark.spark
  val sf = "/root/testdata/sf0.001"

  test("curation drops all exact copies, some near copies, and splits deterministically") {
    val out = Queries.curationQ(spark, sf).collect()
    assert(out.nonEmpty)
    val ids = out.map(_.getLong(0)).toSet
    // exact copies (planted at +10000) can never survive: identical text
    // means identical gate outcome, and the min-id rule keeps the original
    assert(!ids.exists(id => id >= 10000 && id < 20000), ids.filter(_ >= 10000))
    // at least one planted near copy (+20000) of a kept original was
    // removed by the LSH stage
    val keptOrig5 = ids.filter(id => id < 10000 && id % 5 == 0)
    assert(keptOrig5.nonEmpty)
    assert(keptOrig5.exists(id => !ids.contains(id + 20000)),
      s"no near copy removed among ${keptOrig5.take(5)}")
    // deterministic: a second run yields byte-identical rows
    val again = Queries.curationQ(spark, sf).collect()
    assert(out.toSeq == again.toSeq)
  }

  test("span stage drops quote docs that every earlier stage keeps") {
    import org.apache.spark.sql.functions._
    val d = graft.sources.Tables.documents(spark, sf)
      .select(col("doc_id"), col("text"))
    def slice30(c: org.apache.spark.sql.Column) =
      array_join(slice(split(trim(lower(c)), "\\s+"), 11, 30), " ")
    val quotes = d.as("a")
      .join(d.as("b"), col("b.doc_id") === col("a.doc_id") + 3)
      .filter(col("a.doc_id") % 11 === 0 &&
        size(split(trim(lower(col("a.text"))), "\\s+")) >= 40 &&
        size(split(trim(lower(col("b.text"))), "\\s+")) >= 40)
      .select((col("a.doc_id") + 70000).as("doc_id"),
        concat(slice30(col("a.text")), lit(" "), slice30(col("b.text"))).as("text"))
    val base = d.union(quotes)
    val without = graft.ops.Curation.curateScoped(base)(
      _.collect().map(_.getLong(0)).toSet)
    val withSpans = graft.ops.Curation.curateScoped(base, spanStage = true)(
      _.collect().map(_.getLong(0)).toSet)
    // gates + exact + LSH keep at least one quote doc (whole-doc
    // jaccard vs either source is ~30/|union| — below JaccardMin) ...
    val keptQuotes = without.filter(_ >= 70000)
    assert(keptQuotes.nonEmpty, "no quote doc survived the pre-span stages")
    // ... that ONLY the span stage removes, and the span stage never
    // invents other drops' survivors (subset relation)
    assert(withSpans.subsetOf(without))
    val spanOnlyDrops = keptQuotes -- withSpans
    assert(spanOnlyDrops.nonEmpty, s"span stage dropped no quote doc of $keptQuotes")
  }

  test("covered span policy keeps the citing host, drops the mostly-quote doc") {
    import org.apache.spark.sql.functions._
    val d = graft.sources.Tables.documents(spark, sf)
      .select(col("doc_id"), col("text"))
    def slice30(c: org.apache.spark.sql.Column) =
      array_join(slice(split(trim(lower(c)), "\\s+"), 11, 30), " ")
    val eligible = d.as("a")
      .join(d.as("b"), col("b.doc_id") === col("a.doc_id") + 3)
      .filter(col("a.doc_id") % 11 === 0 &&
        size(split(trim(lower(col("a.text"))), "\\s+")) >= 40 &&
        size(split(trim(lower(col("b.text"))), "\\s+")) >= 60)
    // host: vowel-rotated neighbor text (novel to the LSH stage) + a
    // 30-token quote — the quote is a sliver of the host's fingerprints
    val hosts = eligible.select((col("a.doc_id") + 70000).as("doc_id"),
      concat(translate(lower(col("b.text")), "aeiou", "eioua"),
        lit(" "), slice30(col("a.text"))).as("text"))
    // pure quote: the slice alone — its fingerprints are a subset of
    // the source's, coverage ~1
    val quotes = eligible.select((col("a.doc_id") + 80000).as("doc_id"),
      slice30(col("a.text")).as("text"))
    val base = d.union(hosts).union(quotes)
    val unconditional = graft.ops.Curation.curateScoped(base, spanStage = true)(
      _.collect().map(_.getLong(0)).toSet)
    val covered = graft.ops.Curation.curateScoped(base, spanStage = true,
      spanPolicy = "covered")(_.collect().map(_.getLong(0)).toSet)
    val hostIds = hosts.select(col("doc_id")).collect().map(_.getLong(0)).toSet
    val quoteIds = quotes.select(col("doc_id")).collect().map(_.getLong(0)).toSet
    // the covered policy must drop every pure-quote doc that paired
    assert((covered & quoteIds).isEmpty,
      s"mostly-quote docs survived covered policy: ${covered & quoteIds}")
    // and must keep hosts the unconditional policy throws away
    val savedHosts = (covered & hostIds) -- unconditional
    assert(savedHosts.nonEmpty,
      s"covered saved no host (covered kept ${(covered & hostIds).size}, " +
        s"unconditional kept ${(unconditional & hostIds).size})")
    // both policies are span-stage-only refinements: neither invents
    // survivors outside the span-off result
    val spanOff = graft.ops.Curation.curateScoped(base)(
      _.collect().map(_.getLong(0)).toSet)
    assert(covered.subsetOf(spanOff) && unconditional.subsetOf(spanOff))
  }

  test("strip mode cuts quotes to nothing but keeps hosts by content volume") {
    val out = Queries.curationStripQ(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(3), r.getLong(4), r.getBoolean(5))).toMap
    val ids = out.keySet
    // pure-quote plants (+80000) whose SOURCE survived curation are a
    // structural token-subset of it: every gram is a later occurrence,
    // so the rebuild cuts them to nothing and the volume floor drops them
    val cutQuotes = ids.filter(id => id >= 80000 && id < 90000 &&
      ids.contains(id - 80000))
    assert(cutQuotes.nonEmpty, "no pure-quote plant with surviving source")
    cutQuotes.foreach { id =>
      val (_, nKept, keep) = out(id)
      assert(nKept == 0L && !keep, s"quote $id survived the strip: $nKept")
    }
    // at least one host (+70000) keeps its unique rotated half: the doc
    // survives with MOST of its tokens — dedup that preserves volume
    val keptHosts = ids.filter(id => id >= 70000 && id < 80000)
      .filter(id => { val (n, k, keep) = out(id); keep && k * 2 > n })
    assert(keptHosts.nonEmpty, "no host kept a majority of its tokens")
  }

  test("LM stage drops stopword-laced gibberish that every earlier stage keeps") {
    import org.apache.spark.sql.functions._
    val docs = graft.sources.Tables.documents(spark, sf)
      .select(col("doc_id"), col("text"))
    def chunks(m: org.apache.spark.sql.Column) = concat_ws(" ",
      (0 until 8).map(j => substring(m, 1 + 4 * j, 4)): _*)
    val idStr = col("doc_id").cast("string")
    val plants = docs.filter(col("doc_id") % 17 === 0)
      .select((col("doc_id") + 90000).as("doc_id"),
        concat_ws(" ", lit("the"), chunks(md5(idStr)),
          lit("and"), chunks(md5(concat(idStr, lit("x")))),
          lit("of"), chunks(md5(concat(idStr, lit("y")))),
          lit("to a")).as("text"))
    val base = docs.union(plants)
    val ref = Some(graft.sources.Tables.documents(spark, sf)
      .filter(col("lang") === "en").select(col("doc_id"), col("text")))
    val without = graft.ops.Curation.curate(base)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val withLm = graft.ops.Curation.curate(base, lmRef = ref)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val plantIds = plants.select("doc_id").collect().map(_.getLong(0)).toSet
    // gates + exact + LSH all keep the gibberish (it is stopword-laced,
    // punctuation-free, high-distinct, and textually unique)…
    assert((plantIds -- without).isEmpty,
      s"plants must survive the non-LM pipeline: missing ${(plantIds -- without).take(5)}")
    // …only the LM stage catches it, and it catches ALL of it
    assert((withLm & plantIds).isEmpty,
      s"LM stage must drop every plant: kept ${(withLm & plantIds).take(5)}")
    // fluent documents are untouched by the stage
    assert((without -- plantIds) == withLm)
  }

  test("curateScoped releases its cache; curate matches it") {
    import graft.ops.Curation
    val docs = graft.sources.Tables.documents(spark, sf)
      .select(org.apache.spark.sql.functions.col("doc_id"),
        org.apache.spark.sql.functions.col("text"))
    val before = spark.sparkContext.getPersistentRDDs.keySet
    val scopedRows = Curation.curateScoped(docs)(_.collect().toSeq.sortBy(_.getLong(0)))
    // every RDD the scoped run pinned has been released again
    val after = spark.sparkContext.getPersistentRDDs.keySet
    assert((after -- before).isEmpty, s"leaked cache entries: ${after -- before}")
    // and the scoped result is the same rows the session-cached form gives
    val (result, handle) = Curation.curateWithHandle(docs)
    try assert(result.collect().toSeq.sortBy(_.getLong(0)) == scopedRows)
    finally handle.unpersist(blocking = false)
  }

  test("streaming curation gates, dedups across batches, and surfaces near-dup candidates") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val good = "the quick brown fox jumps over the lazy dog and runs to the river " +
      "bank where a second dog waits for the data of the day to arrive with more words"
    val near = good.replace("data", "info")
    val spanish = "el perro corre por la calle y la casa de la ciudad es grande y " +
      "que bonita es la vida de el que corre y que salta por la manana"
    val mem = MemoryStream[(Long, String)]
    val (kept, cands) = graft.ops.Curation.curateStream(mem.toDF().toDF("doc_id", "text"))
    val qk = kept.writeStream.outputMode("append")
      .format("memory").queryName("cur_kept").start()
    val qc = cands.toDF().writeStream.outputMode("append")
      .format("memory").queryName("cur_cands").start()
    try {
      mem.addData((1L, good), (2L, spanish), (3L, "tiny"))
      qk.processAllAvailable(); qc.processAllAvailable()
      mem.addData((4L, good), (5L, near)) // exact dup of 1; near dup of 1
      qk.processAllAvailable(); qc.processAllAvailable()
      val keptIds = spark.table("cur_kept").select($"doc_id").collect().map(_.getLong(0)).toSet
      // 2 fails the language gate, 3 the quality gate, 4 the exact-dedup
      // state across batches; 5 survives kept (near-dups are candidates)
      assert(keptIds == Set(1L, 5L), keptIds)
      val pairs = spark.table("cur_cands").select($"doc_id", $"first_doc")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(pairs.contains((5L, 1L)), pairs) // cross-batch band collision
    } finally { qk.stop(); qc.stop() }
  }

  test("containment-mode reconciliation drops an aggregator arriving after its parts") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.ops.Curation
    val part1 = "the quick brown fox jumps over the lazy dog and runs to the river " +
      "bank where a second dog waits for the data of the day to arrive with more words"
    val part2 = "a completely different english document about query engines that " +
      "the optimizer rewrites with rules for the plans and the costs of the work done"
    // the aggregator doc: both parts verbatim — jaccard to each part is
    // ~1/2 (below no near-dup bar discriminates at 0.9), containment of
    // the part's shingles is ~1.0
    val agg = part1 + " " + part2
    val batch1 = Seq((1L, part1), (2L, part2))
    val batch2 = Seq((3L, agg))
    val allDocs = (batch1 ++ batch2).toDF("doc_id", "text")

    val mem = MemoryStream[(Long, String)]
    val (kept, cands) = Curation.curateStream(mem.toDF().toDF("doc_id", "text"))
    val jacLedger = new Curation.DropLedger
    val conLedger = new Curation.DropLedger
    val qk = kept.writeStream.outputMode("append")
      .format("memory").queryName("con_kept").start()
    // two reconcilers over the SAME candidate stream: jaccard at 0.9
    // must keep the aggregator, containment at 0.9 must drop it
    val qj = Curation.reconcileStream(cands, () => allDocs, 0.9, "jaccard")(jacLedger.add)
    val qc2 = Curation.reconcileStream(cands, () => allDocs, 0.9, "containment")(conLedger.add)
    try {
      mem.addData(batch1: _*)
      Seq(qk, qj, qc2).foreach(_.processAllAvailable())
      mem.addData(batch2: _*)
      Seq(qk, qj, qc2).foreach(_.processAllAvailable())
      assert(conLedger.snapshot.contains(3L),
        s"containment mode kept the aggregator: ${conLedger.snapshot}")
      assert(!jacLedger.snapshot.contains(3L),
        s"jaccard@0.9 should not drop the aggregator: ${jacLedger.snapshot}")
      // the parts themselves stay kept under containment reconciliation
      val keptIds = Curation.applyDrops(
        spark.table("con_kept"), conLedger.snapshot.toSeq.toDF("doc_id"))
        .select($"doc_id").collect().map(_.getLong(0)).toSet
      assert(keptIds == Set(1L, 2L), keptIds)
    } finally { qk.stop(); qj.stop(); qc2.stop() }
  }

  test("reconciled streaming curation converges to the batch result across micro-batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.ops.Curation
    val base = "the quick brown fox jumps over the lazy dog and runs to the river " +
      "bank where a second dog waits for the data of the day to arrive with more words"
    val near = base.replace("data", "info")
    val other = "a completely different english document about query engines that " +
      "the optimizer rewrites with rules for the plans and the costs of the work done"
    // ordered ingest (later arrival = larger id), so the streaming
    // drop-later policy must land exactly on batch drop-larger-id
    val batch1 = Seq((1L, base), (2L, other), (3L, "tiny"))
    val batch2 = Seq((4L, base), (5L, near), (6L, other.replace("costs", "cost")))
    val allDocs = (batch1 ++ batch2).toDF("doc_id", "text")

    val mem = MemoryStream[(Long, String)]
    val (kept, cands) = Curation.curateStream(mem.toDF().toDF("doc_id", "text"))
    val ledger = new Curation.DropLedger
    val qk = kept.writeStream.outputMode("append")
      .format("memory").queryName("rec_kept").start()
    // docTexts: the corpus store the pipeline has been sinking — here
    // the (static) union of all arrived batches; pair ids only ever
    // reference arrived docs, so the wider view is harmless
    val qc = Curation.reconcileStream(cands, () => allDocs)(ledger.add)
    try {
      mem.addData(batch1: _*)
      qk.processAllAvailable(); qc.processAllAvailable()
      mem.addData(batch2: _*)
      qk.processAllAvailable(); qc.processAllAvailable()

      val streamed = ledger.filterKept(spark.table("rec_kept"))
        .select($"doc_id", $"quality", $"split")
        .collect().map(r => (r.getLong(0), r.getDouble(1), r.getString(2))).toSet
      val batch = Curation.curateScoped(allDocs)(
        _.collect().map(r => (r.getLong(0), r.getDouble(1), r.getString(2))).toSet)
      assert(streamed == batch, s"streamed=$streamed batch=$batch")
      // and the reconciliation actually dropped a near-dup (5 vs 1):
      assert(ledger.snapshot.contains(5L), ledger.snapshot)
    } finally { qk.stop(); qc.stop() }
  }
}
