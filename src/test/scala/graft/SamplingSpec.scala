package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Sampling

/** Deterministic sampling: the property that matters is that the KEPT
  * SET is a pure function of ids — stable across runs, partitionings,
  * and cluster widths.
  */
class SamplingSpec extends AnyFunSuite {
  lazy val spark = GraftSpark.spark
  import spark.implicits._

  private lazy val docs = graft.sources.Tables.documents(spark, "/root/testdata/sf0.001")

  test("weightedByRate: rate-proportional, partitioning-invariant keep set") {
    val kept = Sampling.weightedByRate(docs, Map("en" -> 0.2), 0.8, "lang", "doc_id")
      .select("doc_id").as[Long].collect().toSet
    val total = docs.count()
    assert(kept.nonEmpty && kept.size < total)
    // repartitioned input keeps the EXACT same set
    val kept2 = Sampling.weightedByRate(docs.repartition(7), Map("en" -> 0.2), 0.8, "lang", "doc_id")
      .select("doc_id").as[Long].collect().toSet
    assert(kept2 == kept)
    // en is downweighted relative to the rest
    val byLang = docs.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val keptByLang = Sampling.weightedByRate(docs, Map("en" -> 0.2), 0.8, "lang", "doc_id")
      .groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val enRate = keptByLang.getOrElse("en", 0L).toDouble / byLang("en")
    val restKept = (keptByLang - "en").values.sum.toDouble
    val restTotal = (byLang - "en").values.sum.toDouble
    assert(enRate < restKept / restTotal,
      s"en rate $enRate not below rest ${restKept / restTotal}")
  }

  test("capPerGroup: at most N per group, stable under repartition") {
    val capped = Sampling.capPerGroup(docs, "lang", "doc_id", 7)
    val sizes = capped.groupBy("lang").count().collect().map(_.getLong(1))
    assert(sizes.forall(_ <= 7), sizes.toSeq)
    // groups bigger than the cap land exactly ON the cap
    assert(sizes.exists(_ == 7))
    val ids = capped.select("doc_id").as[Long].collect().toSet
    val ids2 = Sampling.capPerGroup(docs.repartition(5), "lang", "doc_id", 7)
      .select("doc_id").as[Long].collect().toSet
    assert(ids2 == ids)
  }

  test("chunkWords: stride boundaries, full coverage, no pure-overlap tail") {
    import graft.ops.TextOps
    val doc = Seq((1L, (1 to 10).map(i => s"w$i").mkString(" "))).toDF("doc_id", "text")
    val chunks = TextOps.chunkWords(doc, "text", maxWords = 4, overlap = 1).collect()
    // starts 0,3,6 -> (w1..w4)(w4..w7)(w7..w10); start 9 is pure overlap -> dropped
    assert(chunks.length == 3, chunks.toSeq)
    assert(chunks.map(_.getAs[Long]("n_words")).toSeq == Seq(4L, 4L, 4L))
    assert(chunks.map(_.getAs[Long]("chunk_idx")).toSeq == Seq(0L, 1L, 2L))
    val md5s = chunks.map(_.getAs[String]("chunk_md5"))
    assert(md5s.distinct.length == 3)
    // boundary doc: exactly maxWords -> one chunk
    val one = TextOps.chunkWords(
      Seq((2L, "a b c d")).toDF("doc_id", "text"), "text", 4, 1).collect()
    assert(one.length == 1 && one(0).getAs[Long]("n_words") == 4L)
  }

  test("redactPii replaces emails, IPv4s, and long digit runs with typed tokens") {
    import graft.ops.TextOps
    val in = Seq((1L,
      "mail a.user+x@sub.example.org or 192.168.001.2, order 1234567890, keep 12345 and v1.2.3.4x"
    )).toDF("doc_id", "text")
    val out = in.select(TextOps.redactPii($"text")).collect()(0).getString(0)
    assert(out.contains("<EMAIL>") && !out.contains("example.org"), out)
    assert(out.contains("<IP>") && !out.contains("192.168"), out)
    assert(out.contains("<NUM>") && !out.contains("1234567890"), out)
    assert(out.contains("keep 12345"), out)       // short digit runs survive
    assert(out.contains("v1.2.3.4x"), out)        // \b guards: not a bare IP
  }

  test("balanceToSmallest: smallest stratum intact, others near its size, stable keep set") {
    val balanced = graft.ops.Sampling
      .balanceToSmallest(docs.select(col("doc_id"), col("lang")), "lang", "doc_id")
    val kept = balanced.select(col("doc_id")).collect().map(r => r.getLong(0)).toSet
    val per = balanced.groupBy(col("lang")).count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val orig = docs.groupBy(col("lang")).count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val minN = orig.values.min
    // rate 1 stratum: the smallest keeps EVERYTHING (bucket < 1e6 always)
    val smallest = orig.minBy(_._2)._1
    assert(per(smallest) == minN)
    // every stratum lands within Bernoulli range of min_n and never grows
    orig.foreach { case (lang, n) =>
      assert(per.getOrElse(lang, 0L) <= n)
      val expect = minN.toDouble
      assert(math.abs(per.getOrElse(lang, 0L) - expect) <= 4 * math.sqrt(expect) + 1,
        s"$lang kept ${per.getOrElse(lang, 0L)} vs expected ~$expect of $n")
    }
    // pure hash decision: a repartitioned rerun keeps the identical set
    val again = graft.ops.Sampling
      .balanceToSmallest(docs.select(col("doc_id"), col("lang")).repartition(13),
        "lang", "doc_id")
      .select(col("doc_id")).collect().map(r => r.getLong(0)).toSet
    assert(again == kept)
  }

  test("upsampleToLargest: largest stratum untouched, others replicate to parity, exact copies") {
    val up = graft.ops.Sampling
      .upsampleToLargest(docs.select(col("doc_id"), col("lang")), "lang", "doc_id")
    val per = up.groupBy(col("lang")).count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val orig = docs.groupBy(col("lang")).count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val maxN = orig.values.max
    // the largest stratum replicates exactly once (factor 1, frac 0)
    val largest = orig.maxBy(_._2)._1
    assert(per(largest) == maxN)
    orig.foreach { case (lang, n) =>
      // never shrinks, and lands within Bernoulli range of max_n
      assert(per(lang) >= n)
      assert(math.abs(per(lang) - maxN.toDouble) <= 4 * math.sqrt(maxN.toDouble) + 1,
        s"$lang emitted ${per(lang)} vs target $maxN from $n")
    }
    // copy indices are dense 0..k per doc: count == max(copy)+1 everywhere
    val ragged = up.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("c"), max(col("copy")).as("m"))
      .filter(col("c") =!= col("m") + 1).count()
    assert(ragged == 0L)
    // pure hash decision: repartitioned rerun emits the identical multiset
    val a = up.groupBy(col("doc_id")).count()
    val b = graft.ops.Sampling
      .upsampleToLargest(docs.select(col("doc_id"), col("lang")).repartition(13),
        "lang", "doc_id")
      .groupBy(col("doc_id")).count()
    assert(a.except(b).count() == 0L && b.except(a).count() == 0L)
  }

  test("cluster split: no near-dup pair straddles splits; a doc_id hash split would leak") {
    val sf = "/root/testdata/sf0.001"
    val split = Queries.clusterSplitQ(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getString(2))).toMap
    // every doc present exactly once, reps are cluster minima (<= id)
    assert(split.forall { case (id, (rep, _)) => rep <= id })
    // THE leakage property: every verified LSH pair shares a split
    val pairs = graft.ops.Dedup.minhashLsh(
        docs.select(col("doc_id"), col("text"))
          .union(docs.filter(col("doc_id") % 5 === 0)
            .select((col("doc_id") + 10000).as("doc_id"),
              replace(col("text"), lit("data"), lit("info")).as("text"))), 0.5)
      .select(col("doc_a"), col("doc_b")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.nonEmpty)
    assert(pairs.forall { case (a, b) => split(a)._2 == split(b)._2 },
      pairs.filterNot { case (a, b) => split(a)._2 == split(b)._2 }.take(5).mkString(","))
    // and the op is NOT vacuous: the same hash convention on RAW doc
    // ids separates at least one of those pairs — the leakage this
    // operator exists to stop
    val naive = split.keySet.toSeq.toDF("doc_id")
      .select(col("doc_id"),
        when(graft.ops.TextOps.portableHash64(
            concat(lit("split:"), col("doc_id"))) % 100 < 80, "train")
          .when(graft.ops.TextOps.portableHash64(
            concat(lit("split:"), col("doc_id"))) % 100 < 90, "val")
          .otherwise("test").as("split"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(pairs.exists { case (a, b) => naive(a) != naive(b) },
      "doc_id-hash split never leaked on this data — test data too weak")
  }

  test("shardAssign: deterministic, partition-invariant, and writable as one dir per shard") {
    import org.apache.spark.sql.functions._
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val a = graft.ops.Sampling.shardAssign(docs, "doc_id", 16)
      .select("doc_id", "shard").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val b = graft.ops.Sampling.shardAssign(docs.repartition(7), "doc_id", 16)
      .select("doc_id", "shard").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(a == b, "shard of a doc must be a pure function of its id")
    assert(a.values.toSet.subsetOf((0L until 16L).toSet))
    // balance: hash sharding keeps every shard within a loose Bernoulli
    // envelope of n/16 (no empty and no runaway shard)
    val sizes = a.values.groupBy(identity).map(_._2.size)
    assert(sizes.size == 16 && sizes.min > 0, s"empty shard: $sizes")
    // the export layout: partitionBy writes one directory per shard
    val out = java.nio.file.Files.createTempDirectory("shards").toString
    graft.ops.Sampling.shardAssign(docs, "doc_id", 16)
      .write.mode("overwrite").partitionBy("shard").parquet(out)
    val dirs = new java.io.File(out).listFiles().filter(_.isDirectory)
      .map(_.getName).filter(_.startsWith("shard=")).sorted
    assert(dirs.length == 16, dirs.mkString(","))
    val back = spark.read.parquet(out)
    assert(back.count() == docs.count())
  }

  test("bloom dedup: every exact copy resolves, suffixed docs come out clean") {
    val out = Queries.dedupBloom(spark, "/root/testdata/sf0.001").collect()
    val (copies, novel) = out.partition(_.getLong(0) < 60000)
    assert(copies.nonEmpty && novel.nonEmpty)
    // exact copies: corpus_id == original id (min-id text owner)
    copies.foreach { r =>
      assert(!r.isNullAt(1), s"copy ${r.getLong(0)} unmatched")
      assert(r.getLong(1) == r.getLong(0) - 50000 ||
        // identical text can exist under a smaller corpus id
        r.getLong(1) < r.getLong(0) - 50000, r.toString)
    }
    novel.foreach { r => assert(r.isNullAt(1), s"suffixed doc matched: $r") }
  }
}
