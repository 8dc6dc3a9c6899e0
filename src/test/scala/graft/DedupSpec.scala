package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{Dedup, Similarity, TextOps}

class DedupSpec extends AnyFunSuite {
  lazy val spark = GraftSpark.spark
  import spark.implicits._

  test("unpersistCheckpoint releases localCheckpoint blocks immediately") {
    val df = spark.range(100).toDF("n").localCheckpoint(true)
    val persisted = spark.sparkContext.getPersistentRDDs
    // the checkpoint's backing RDD is registered as a persisted RDD
    val rddId = df.queryExecution.analyzed match {
      case l: org.apache.spark.sql.execution.LogicalRDD => l.rdd.id
      case p => fail(s"expected bare LogicalRDD, got ${p.getClass}")
    }
    assert(persisted.contains(rddId), s"checkpoint RDD $rddId not in $persisted")
    org.apache.spark.sql.graft.ColumnBridge.unpersistCheckpoint(df)
    assert(!spark.sparkContext.getPersistentRDDs.contains(rddId))
  }

  val base = Seq(
    (1L, "the quick brown fox jumps over the lazy dog near the river bank today"),
    (2L, "a completely different sentence with other words about spark engines and parquet files"),
    (3L, "the quick brown fox jumps over the lazy dog near the river bank today"), // exact dup of 1
    (4L, "the quick brown fox jumps over the lazy cat near the river bank today"), // near dup of 1
    (5L, "unrelated short text")
  ).toDF("doc_id", "text")

  test("exact dedup keeps min id and counts copies") {
    val out = Dedup.exact(base).orderBy($"keep_id").collect()
    assert(out.map(r => (r.getLong(0), r.getLong(1))).toSeq ==
      Seq((1L, 2L), (2L, 1L), (4L, 1L), (5L, 1L)))
  }

  test("paragraph dedup: first occurrence survives, later copies and internal repeats drop") {
    // segments of 4 tokens; doc 2 repeats doc 1's first paragraph, doc 3
    // repeats its OWN first paragraph internally
    val docs = Seq(
      (1L, "alpha beta gamma delta one two three four"),
      (2L, "alpha beta gamma delta five six seven eight"),
      (3L, "ix x xi xii ix x xi xii")
    ).toDF("doc_id", "text")
    val out = Dedup.paragraphDedup(Dedup.segmentsByBlock(docs, block = 4))
      .orderBy($"doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    assert(out(0) == ((1L, 2L, 2L, "alpha beta gamma delta one two three four")), out(0))
    // doc 2 loses the shared opener, keeps its unique tail
    assert(out(1) == ((2L, 2L, 1L, "five six seven eight")), out(1))
    // doc 3's internal repeat collapses to the first copy
    assert(out(2) == ((3L, 2L, 1L, "ix x xi xii")), out(2))
  }

  test("incremental paragraph dedup: corpus hits drop, batch-internal rule holds, novel survives") {
    val corpus = Seq((1L, "alpha beta gamma delta")).toDF("doc_id", "text")
    val batch = Seq(
      (10L, "alpha beta gamma delta nine ten eleven twelve"), // first para in corpus
      (11L, "nine ten eleven twelve"),                        // dup of 10's second para (batch-internal)
      (12L, "fresh words only here")
    ).toDF("doc_id", "text")
    val idx = Dedup.paragraphHashTable(Dedup.segmentsByBlock(corpus, block = 4))
    val out = Dedup.paragraphDedupVersusCorpus(Dedup.segmentsByBlock(batch, block = 4), idx)
      .orderBy($"doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getString(3)))
    assert(out.toSeq == Seq(
      (10L, 1L, "nine ten eleven twelve"),
      (11L, 0L, ""),
      (12L, 1L, "fresh words only here")), out.toSeq)
  }

  test("paragraph dedup: a fully-duplicated doc returns n_kept=0 and empty text") {
    val docs = Seq(
      (1L, "alpha beta gamma delta"),
      (9L, "alpha beta gamma delta")
    ).toDF("doc_id", "text")
    val out = Dedup.paragraphDedup(Dedup.segmentsByBlock(docs, block = 4))
      .orderBy($"doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getString(3)))
    assert(out.toSeq == Seq((1L, 1L, "alpha beta gamma delta"), (9L, 0L, "")), out.toSeq)
  }

  test("allPairsExact == brute force at several rational thresholds (exact recall)") {
    // widen the corpus with overlapping variants so non-trivial pairs
    // exist at different similarity levels
    val docs = base.union(Seq(
      (6L, "the quick brown fox jumps over the lazy dog near the river bank yesterday"),
      (7L, "a completely different sentence with other words about flink engines and parquet files"),
      (8L, "the quick brown fox jumps over a sleepy dog near the river bank today")
    ).toDF("doc_id", "text"))
    for ((num, den) <- Seq((1, 2), (3, 4), (1, 4))) {
      val t = num.toDouble / den
      val exact = Dedup.allPairsExact(docs, num, den)
        .select($"doc_a", $"doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val brute = Dedup.ngramJaccardPairs(docs, t)
        .select($"doc_a", $"doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(exact == brute, s"prefix-filter join diverged from brute force at $num/$den")
    }
  }

  test("allPairsExact: boundary pair exactly AT the threshold is kept (integer verify)") {
    // two 5-shingle docs sharing exactly 2 shingles: J = 2/8 = 1/4
    val a = "w1 w2 w3 w4 w5 w6 w7" // shingles: w1w2w3..w5w6w7 (5)
    val b = "w1 w2 w3 w4 x5 x6 x7 x8" // shares w1w2w3, w2w3w4 (2 of its 6)
    val docs = Seq((1L, a), (2L, b)).toDF("doc_id", "text")
    // |A|=5, |B|=6, inter=2, union=9 -> J=2/9; at 2/9 kept, at 1/4 dropped
    val kept = Dedup.allPairsExact(docs, 2, 9).collect()
    assert(kept.length == 1 && kept(0).getDouble(2) == math.rint(2.0 / 9 * 1e6) / 1e6)
    assert(Dedup.allPairsExact(docs, 1, 4).isEmpty)
  }

  test("ngram jaccard finds the near-dup pair and not unrelated ones") {
    val pairs = Dedup.ngramJaccardPairs(base, 0.5)
      .select($"doc_a", $"doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 3L))) // exact dup: jaccard 1.0
    assert(pairs.contains((1L, 4L)) && pairs.contains((3L, 4L))) // near dup
    assert(!pairs.exists(p => p._1 == 2L || p._2 == 2L))
  }

  test("connected components collapse chains onto the min id (both paths)") {
    // 1-2, 2-3 (chain, no 1-3 edge); 7-9; singleton 5 not in any pair
    val pairs = Seq((1L, 2L), (2L, 3L), (7L, 9L)).toDF("doc_a", "doc_b")
    val expect = Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 7L -> 7L, 9L -> 7L)
    // hybrid entry routes this small graph to the driver union-find
    val cc = Dedup.connectedComponents(pairs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(cc == expect)
    // and the distributed loop must agree
    val dist = Dedup.connectedComponentsDistributed(pairs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(dist == expect)
  }

  test("connected components handle non-long ids (hybrid routes them distributed)") {
    // the driver union-find is primitive-long only — int and string doc
    // ids must route to the type-generic distributed loop instead of
    // throwing ClassCastException (ADVICE r3)
    val intPairs = Seq((1, 2), (2, 3), (7, 9)).toDF("doc_a", "doc_b")
    val intCc = Dedup.connectedComponents(intPairs).collect()
      .map(r => r.getInt(0) -> r.getInt(1)).toMap
    assert(intCc == Map(1 -> 1, 2 -> 1, 3 -> 1, 7 -> 7, 9 -> 7))

    val strPairs = Seq(("b", "a"), ("b", "c"), ("x", "y")).toDF("doc_a", "doc_b")
    val strCc = Dedup.connectedComponents(strPairs).collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(strCc == Map("a" -> "a", "b" -> "a", "c" -> "a", "x" -> "x", "y" -> "x"))
  }

  test("estimatedRows: positive, stats-derived, no job") {
    val docs = graft.sources.Tables.documents(spark, "/root/testdata/sf0.001")
    val est = Dedup.estimatedRows(docs)
    assert(est > 0)
    // bloom dedup built on the estimate gives the same exact output as
    // one sized with the true count (fpp only changes WORK, not output)
    val base = docs.select($"doc_id", $"text").limit(50)
    val batch = base.select(($"doc_id" + 1000).as("doc_id"), $"text")
    val viaStats = Dedup.exactVersusCorpusBloom(batch, base, 0.01)
      .collect().map(r => (r.getLong(0), r.get(1))).toSet
    val viaCount = Dedup.exactVersusCorpusBloom(batch, base, 50L, 0.01)
      .collect().map(r => (r.getLong(0), r.get(1))).toSet
    assert(viaStats == viaCount && viaStats.nonEmpty)
  }

  test("distributed CC converges on a long path graph") {
    // path 0-1-...-120: diameter 120 >> maxIter 25, so plain neighbor-min
    // propagation could NOT converge — only the pointer-jumping hop
    // (O(log diameter) rounds) gets there. Pinned to the distributed
    // path: the hybrid entry would solve this size on the driver.
    val pairs = (0L until 120L).map(i => (i, i + 1)).toDF("doc_a", "doc_b")
    val cc = Dedup.connectedComponentsDistributed(pairs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(cc == (0L to 120L).map(_ -> 0L).toMap)
  }

  test("newVersusCorpus matches near copies, not novel docs") {
    val corpus = Seq(
      (1L, "the quick brown fox jumps over the lazy dog near the river bank"),
      (2L, "completely different content about spark catalyst optimizer rules engine")
    ).toDF("doc_id", "text")
    val batch = Seq(
      // exact copy of 1: all 8 minhashes equal -> banding MUST collide
      // (a mere near copy colliding is probabilistic per band at this
      // tiny size; the sf0.001 query below covers that regime)
      (100L, "the quick brown fox jumps over the lazy dog near the river bank"),
      (200L, "unrelated novel text with no overlap whatsoever in any shingle here at all")
    ).toDF("doc_id", "text")
    val m = Dedup.newVersusCorpus(batch, corpus, 0.5).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(m.contains((100L, 1L)), m)
    assert(!m.exists(_._1 == 200L), m)
    // summary query shape: every batch doc gets exactly one row
    val q = Queries.dedupIncremental(spark, "/root/testdata/sf0.001").collect()
    assert(q.nonEmpty)
    val byId = q.map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(byId.size == q.length) // one row per new doc
    // near copies (+30000) overwhelmingly match; mangled (+40000) docs don't
    val nearMatched = q.filter(r => r.getLong(0) < 40000).count(_.getLong(1) > 0)
    val novelMatched = q.filter(r => r.getLong(0) >= 40000).count(_.getLong(1) > 0)
    assert(nearMatched > 0)
    assert(novelMatched == 0, s"mangled docs matched corpus: $novelMatched")
  }

  test("driver union-find and distributed loop agree on a random graph") {
    val rnd = new scala.util.Random(42)
    val n = 400
    val edges = Seq.fill(300)((rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
      .filter { case (a, b) => a != b }
      .map { case (a, b) => (math.min(a, b), math.max(a, b)) }
      .distinct
    val pairs = edges.toDF("doc_a", "doc_b")
    val local = Dedup.connectedComponents(pairs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val dist = Dedup.connectedComponentsDistributed(pairs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(local == dist)
  }

  test("blocked simhash pairs == brute force (pigeonhole recall, no distinct)") {
    val d0 = graft.sources.Tables.documents(spark, "/root/testdata/sf0.001")
      .select($"doc_id", $"text").filter($"doc_id" < 100)
    val docs = d0.union(d0.filter($"doc_id" % 5 === 0)
      .select(($"doc_id" + 10000).as("doc_id"),
        replace($"text", lit("data"), lit("info")).as("text")))
    val brute = Dedup.simhashPairs(docs, 3).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq.sorted
    val blocked = Dedup.simhashPairsBlocked(docs, 3).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq.sorted
    assert(blocked == brute)
    // exactly once per pair (the min-band filter dedups multi-band hits)
    assert(blocked.map(p => (p._1, p._2)).distinct.size == blocked.size)
    assert(blocked.nonEmpty)
  }

  test("minhash-lsh surfaces the same near-dup pairs as brute force here") {
    val lsh = Dedup.minhashLsh(base, 0.5)
      .select($"doc_a", $"doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(lsh.contains((1L, 3L)))
    // identical docs share all bands; near-dup almost surely shares >=1 of 4
    assert(lsh.contains((1L, 4L)))
  }

  test("winnowing: a shared quote run yields shared fingerprints; disjoint docs share none") {
    // distinctive vocabularies so chance gram collisions are impossible
    val wordsA = (1 to 60).map(i => s"alpha$i").mkString(" ")
    val quote = (20 to 40).map(i => s"alpha$i").mkString(" ") // 21-token run of A
    val wordsB = (1 to 60).map(i => s"beta$i").mkString(" ")
    val docs = Seq(
      (1L, wordsA),
      (2L, wordsB),
      (3L, quote + " " + (1 to 30).map(i => s"gamma$i").mkString(" "))
    ).toDF("doc_id", "text")
    val pairs = Dedup.winnowPairs(docs, k = 3, w = 4, minShared = 1, maxDocFreq = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    // guarantee: a shared token run of length >= w + k - 1 = 6 cannot
    // escape winnowing — the 21-token quote must share fingerprints
    assert(pairs.contains((1L, 3L)), pairs)
    assert(pairs((1L, 3L)) >= 3) // ~(21-2) grams / w windows, several mins survive
    assert(!pairs.contains((1L, 2L)) && !pairs.contains((2L, 3L)), pairs)
  }

  test("winnow coverage: a pure-quote doc is fully covered, a big host is not") {
    import spark.implicits._
    val src = (0 until 70).map(i => s"alpha$i").mkString(" ")     // 70-token source
    val quote = (10 until 40).map(i => s"alpha$i").mkString(" ")  // tokens 11..40
    val host = quote + " " + (0 until 80).map(i => s"beta$i").mkString(" ")
    val docs = Seq((1L, src), (2L, quote), (3L, host)).toDF("doc_id", "text")
    val rows = Dedup.winnowPairsCoverage(docs, k = 3, w = 4, minShared = 5, maxDocFreq = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getDouble(3), r.getDouble(4))).toMap
    // the quote's full windows are a subset of the source's windows, so
    // fps(quote) ⊆ fps(src) exactly: coverage of the quote doc is 1.0
    val (_, _, covQuote) = rows((1L, 2L))
    assert(covQuote == 1.0, s"quote coverage $covQuote")
    // the host shares the same span but it is a sliver of the host's
    // own fingerprint mass
    val (_, covSrc, covHost) = rows((1L, 3L))
    assert(covHost < 0.5, s"host coverage $covHost")
    // and the source is never mostly-covered by a 30-token span
    assert(covSrc < 0.5, s"source coverage $covSrc")
  }

  test("containment flags the part->whole relation that jaccard scores below threshold") {
    val partText = "the quick brown fox jumps over the lazy dog near the river bank today"
    val tailText = "and later a storm arrived over the hills beyond"
    val docs = Seq(
      (1L, partText),
      (2L, partText + " " + tailText), // aggregator: contains ALL of 1's shingles
      (3L, "a completely different sentence with other words about spark engines")
    ).toDF("doc_id", "text")
    val rows = Dedup.containmentPairs(docs, 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    val hit = rows.find(r => r._1 == 1L && r._2 == 2L)
    assert(hit.isDefined, rows.mkString(","))
    assert(hit.get._3 == 1.0)      // every shingle of 1 appears in 2
    assert(hit.get._4 < 0.9)       // but 2 is NOT contained in 1
    // the resemblance is below the usual 0.5 dedup bar — jaccard alone
    // would have kept the aggregator as "novel"
    val j = Dedup.ngramJaccardPairs(docs, 0.0)
      .filter($"doc_a" === 1L && $"doc_b" === 2L)
      .select($"jaccard").head.getDouble(0)
    assert(j < 0.9, s"jaccard=$j")
    assert(!rows.exists(r => r._1 == 3L || r._2 == 3L))
  }

  test("one-sided containment recalls small-in-huge pairs the symmetric bands miss") {
    // 16 parts with pairwise-disjoint vocab, one huge doc = all parts
    // concatenated: containment(part in huge) = 1.0, resemblance ~1/16
    val smalls = (0 until 16).map(i =>
      (i.toLong, (0 until 12).map(j => s"w${i}x$j").mkString(" ")))
    val tiny = (20L, "w0x0 w0x1 w0x2") // 3 tokens -> ONE shingle; floor = 1 hit
    val huge = (100L, smalls.map(_._2).mkString(" "))
    val probe = (smalls :+ tiny).toDF("doc_id", "text")
    val corpus = Seq(huge).toDF("doc_id", "text")
    // the symmetric sketch (containmentPairs) candidates by RESEMBLANCE:
    // at ~1/16 a MinHash band agrees only by luck — on this data most
    // (part, huge) pairs escape the bands entirely. Assert the concrete
    // misses (deterministic for fixed data), then that the one-sided
    // path recalls exactly those pairs too.
    val symHits = Dedup.containmentPairs(probe.unionAll(corpus), 0.9)
      .collect().filter(_.getLong(1) == 100L).map(_.getLong(0)).toSet
    val symMissed = (smalls.map(_._1) :+ 20L).toSet -- symHits
    assert(symMissed.nonEmpty, s"bands recalled everything: $symHits")
    // one-sided bottom-k sampling: every part recalled at containment
    // 1.0 — structural for true subsets, |huge|/|part| notwithstanding —
    // and nothing else emitted (parts are pairwise disjoint)
    val got = Dedup.containmentVersusCorpus(probe, corpus, 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val want = (smalls.map(_._1) :+ 20L).map(id => (id, 100L, 1.0)).toSet
    assert(got == want, s"got=$got want=$want")
  }

  test("one-sided containment: df cap drops boilerplate-only probes (declared cost)") {
    // 6 corpus docs all containing the SAME boilerplate sentence; the
    // probe doc is nothing but that sentence. With maxDocFreq < 6 every
    // posting of the probe's shingles is capped away -> no candidates
    // (the declared recall trade); raising the cap recalls all 6.
    val boiler = "all rights reserved contact the webmaster for more information today"
    val corpus = (1 to 6).map(i =>
      (i.toLong, s"unique${i}a unique${i}b unique${i}c $boiler unique${i}d"))
      .toDF("doc_id", "text")
    val probe = Seq((100L, boiler)).toDF("doc_id", "text")
    val capped = Dedup.containmentVersusCorpus(probe, corpus, 0.9, maxDocFreq = 5)
    assert(capped.isEmpty, capped.collect().mkString(","))
    val uncapped = Dedup.containmentVersusCorpus(probe, corpus, 0.9, maxDocFreq = 6)
      .collect().map(_.getLong(1)).toSet
    assert(uncapped == (1L to 6L).toSet, uncapped)
  }

  test("simhash: identical text -> identical hash; near text -> small hamming") {
    val sh = Dedup.simhash16(base).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sh(1L) == sh(3L))
    val hamming = java.lang.Long.bitCount(sh(1L) ^ sh(4L))
    assert(hamming <= 4, s"hamming=$hamming")
  }

  test("cosine: identical vectors similarity 1, orthogonal 0") {
    val df = Seq(
      (1L, Array(1.0, 0.0, 2.0)),
      (2L, Array(1.0, 0.0, 2.0)),
      (3L, Array(0.0, 5.0, 0.0))
    ).toDF("vec_id", "embedding")
    val sims = df.as("a").crossJoin(df.as("b"))
      .filter($"a.vec_id" < $"b.vec_id")
      .select($"a.vec_id", $"b.vec_id",
        round(Similarity.cosine($"a.embedding", $"b.embedding"), 9).as("c"))
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    assert(sims((1L, 2L)) == 1.0)
    assert(sims((1L, 3L)) == 0.0)
  }

  test("portable hash matches int(md5_prefix, 16)") {
    val h = Seq("hello").toDF("s").select(TextOps.portableHash64($"s")).collect()(0).getLong(0)
    assert(h == java.lang.Long.parseLong("5d41402abc4b", 16))
  }

  // Hand-built corpus for the ExactSubstr span family (k = 4).
  //  d1: 10 unique tokens — the first-occurrence source.
  //  d2: d1's run t1..t6 embedded mid-doc → one interior span.
  //  d3: exact copy of d1 → whole-doc span.
  //  d4: 4 unique tokens, one gram, first occurrence → no span.
  //  d5: two d1-runs separated by unique z1..z5 → two islands.
  //  d6: intra-doc repeat (w1..w4 twice) → the LATER copy spans.
  //  d8: d1-gram then d5-gram, marks at pos 0 and 4 only — intervals
  //      [0,3] and [4,7] touch without overlapping, pinning the
  //      adjacent-merge rule.
  private val spanDocs = Seq(
    (1L, "t1 t2 t3 t4 t5 t6 t7 t8 u1 u2"),
    (2L, "x1 x2 t1 t2 t3 t4 t5 t6 v1 v2"),
    (3L, "t1 t2 t3 t4 t5 t6 t7 t8 u1 u2"),
    (4L, "p q r s"),
    (5L, "t1 t2 t3 t4 z1 z2 z3 z4 z5 t5 t6 t7 t8 u1 u2"),
    (6L, "w1 w2 w3 w4 m n w1 w2 w3 w4"),
    (8L, "t1 t2 t3 t4 z1 z2 z3 z4")
  ).toDF("doc_id", "text")

  test("duplicateSpans: first-occurrence rule, island merge, adjacency") {
    val spans = Dedup.duplicateSpans(spanDocs, k = 4)
      .orderBy($"doc_id", $"span_start")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(spans.toSeq == Seq(
      (2L, 2L, 7L, 6L),   // embedded run only — flanks survive
      (3L, 0L, 9L, 10L),  // exact copy — whole doc
      (5L, 0L, 3L, 4L), (5L, 9L, 14L, 6L), // two islands, z-gap kept
      (6L, 6L, 9L, 4L),   // intra-doc: later copy spans, first kept
      (8L, 0L, 7L, 8L)))  // [0,3] + [4,7] adjacent → merged
  }

  test("duplicateSpansVersusCorpus: corpus grams and batch-internal firsts both mark") {
    val corpus = Seq((1L, "t1 t2 t3 t4 t5 t6 t7 t8 u1 u2")).toDF("doc_id", "text")
    val batch = Seq(
      (10L, "t1 t2 t3 t4 q1 q2 q3 q4"), // corpus-quote head, novel tail
      (11L, "n1 n2 n3 n4 x"),           // novel — the batch first
      (12L, "n1 n2 n3 n4 x")            // exact copy of 11 → whole-doc span
    ).toDF("doc_id", "text")
    val spans = Dedup.duplicateSpansVersusCorpus(
        batch, Dedup.gramFirstTable(corpus, k = 4), k = 4)
      .orderBy($"doc_id", $"span_start")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // corpus doc never appears; 11 keeps (its grams are the batch firsts)
    assert(spans.toSeq == Seq((10L, 0L, 3L, 4L), (12L, 0L, 4L, 5L)))
  }

  test("stripDuplicateSpans rebuilds the kept remainder exactly") {
    val out = Dedup.stripDuplicateSpans(spanDocs, k = 4)
      .orderBy($"doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    assert(out.toSeq == Seq(
      (1L, 10L, 10L, "t1 t2 t3 t4 t5 t6 t7 t8 u1 u2"),
      (2L, 10L, 4L, "x1 x2 v1 v2"),
      (3L, 10L, 0L, ""),
      (4L, 4L, 4L, "p q r s"),
      (5L, 15L, 5L, "z1 z2 z3 z4 z5"),
      (6L, 10L, 6L, "w1 w2 w3 w4 m n"),
      (8L, 8L, 0L, "")))
  }
}
