package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis primitives for large-scale training-data pipelines:
  * tokenization, shingling, portable hashing, quality stats, language ID,
  * fingerprinting. Everything is a pure column expression (codegen'd,
  * narrow, shuffle-free) so it composes with dedup/aggregation stages and
  * scales linearly with input.
  *
  * PORTABILITY CONTRACT: every function here has an exact DuckDB
  * equivalent used by the oracle SQL (see SparkEntry.oracleSql). The
  * portable 64-bit hash is fold(hex) over the first 12 hex chars of
  * md5 — identical in any engine with md5 + string ops.
  */
object TextOps {

  /** Whitespace tokenization; trim so both engines agree on edge tokens. */
  def words(text: Column): Column = split(trim(text), "\\s+")

  /** Portable 48-bit-range hash: first 12 hex chars of md5 as a long.
    * (DuckDB: list_reduce over strpos of each hex char.)
    */
  def portableHash64(c: Column): Column =
    conv(substring(md5(c), 1, 12), 16, 10).cast("long")

  /** Word 3-gram shingles (the classic MinHash/near-dup unit). Empty
    * array when the doc has fewer than 3 words.
    *
    * slice + zip_with, NOT transform + element_at: element_at inside a
    * lambda re-evaluates the array CHILD per element, so a caller that
    * passes split(...) inline (after CollapseProject re-inlines any
    * projection boundary) pays O(len) regex splits per gram — measured
    * 19 s → ~1 s at sf0.1 on q_good_turing. slice evaluates its child
    * once per call, so the whole shingle build costs a bounded handful
    * of child evaluations per row no matter what expression feeds it.
    */
  def shingles3(ws: Column): Column =
    when(size(ws) >= 3,
      zip_with(
        zip_with(slice(ws, lit(1), size(ws) - 2), slice(ws, lit(2), size(ws) - 2),
          (x, y) => concat(x, lit(" "), y)),
        slice(ws, lit(3), size(ws) - 2),
        (xy, z) => concat(xy, lit(" "), z)))
      .otherwise(array().cast("array<string>"))

  /** BPE-ish token count: letter runs | digit runs | single non-space
    * symbol (a cheap stand-in for a real tokenizer's token count).
    */
  val BpeTokenRegex = "[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\s]"
  def bpeTokenCount(text: Column): Column =
    size(regexp_extract_all(text, lit(BpeTokenRegex), lit(0))).cast("long")

  /** Punctuation/symbol ratio over character length. */
  def punctRatio(text: Column): Column =
    size(regexp_extract_all(text, lit("[^a-zA-Z0-9\\s]"), lit(0)))
      .cast("double") / length(text)

  /** Distinct-word ratio — degenerate/repetitive text scores low. */
  def uniqueWordRatio(ws: Column): Column =
    size(array_distinct(ws)).cast("double") / size(ws)

  /** Composite quality score in [0,1]: length prior + cleanliness +
    * lexical diversity (deterministic; weights are part of the contract).
    */
  def qualityScore(text: Column): Column = {
    val ws = words(text)
    round(
      least(size(ws).cast("double") / 100.0, lit(1.0)) * 0.5 +
        (lit(1.0) - punctRatio(text)) * 0.3 +
        uniqueWordRatio(ws) * 0.2,
      6)
  }

  /** Non-overlapping occurrence count of `needle` in space-padded text —
    * `replace`-based so any SQL engine reproduces it exactly.
    */
  def occurrences(text: Column, needle: String): Column =
    ((length(text) - length(replace(text, lit(needle), lit("")))) / needle.length).cast("long")

  /** Stopword tables for the n-gram-heuristic language ID. */
  val LangStopwords: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq(" the ", " a ", " and ", " of ", " to "),
    "es" -> Seq(" el ", " la ", " de ", " que ", " y "),
    "de" -> Seq(" der ", " die ", " und ", " ein ", " zu "),
    "zh" -> Seq("的", "了", "是"))

  /** Per-language stopword score over space-padded lowered text. */
  def langScore(text: Column, lang: String): Column = {
    val padded = concat(lit(" "), lower(text), lit(" "))
    LangStopwords.toMap.apply(lang).map(occurrences(padded, _)).reduce(_ + _)
  }

  /** Heuristic language ID with a fixed precedence chain (en>es>de>zh),
    * 'und' when no stopword hits at all.
    */
  def langId(text: Column): Column = {
    val en = langScore(text, "en"); val es = langScore(text, "es")
    val de = langScore(text, "de"); val zh = langScore(text, "zh")
    when(en >= es && en >= de && en >= zh && en > 0, "en")
      .when(es >= de && es >= zh && es > 0, "es")
      .when(de >= zh && de > 0, "de")
      .when(zh > 0, "zh")
      .otherwise("und")
  }

  /** Content fingerprints: full md5 of normalized text, its portable
    * 64-bit form, and the min-shingle-hash (a 1-hash MinHash — robust to
    * local edits, the unit of near-dup fingerprinting).
    */
  def fingerprintMd5(text: Column): Column = md5(lower(trim(text)))
  def fingerprint64(text: Column): Column = portableHash64(lower(trim(text)))
  def minShingleHash(text: Column): Column =
    array_min(graft.functions.GraftFunctions.shingle_hashes(lower(text), 3))

  /** Rabin-Karp min rolling hash over 16-char windows of normalized text. */
  def rollingFingerprint(text: Column): Column =
    graft.functions.GraftFunctions.rolling_hash_min(lower(trim(text)), 16)

  /** PII redaction patterns — deliberately RE2-safe (no backrefs, no
    * lookarounds) so Java regex (Spark) and RE2 (DuckDB oracle) agree
    * byte-for-byte. Order matters: emails first (an email contains
    * digit runs), then IPv4, then bare long digit runs.
    */
  val EmailRx = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val Ipv4Rx = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"
  val LongNumRx = "\\b\\d{9,}\\b"

  /** Redact emails / IPv4s / long digit runs with typed placeholder
    * tokens — the standard pre-training scrub stage. Pure codegen'd
    * regexp_replace chain: narrow, no shuffle, and the pattern set is a
    * named constant so the oracle replays it verbatim.
    */
  def redactPii(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, EmailRx, "<EMAIL>"),
        Ipv4Rx, "<IP>"),
      LongNumRx, "<NUM>")

  /** Word-window document chunking — the context-length splitter of a
    * training-data pipeline: chunks of `maxWords`, each sharing
    * `overlap` words with its predecessor (stride = maxWords - overlap).
    * Emits (all input columns, chunk_idx, n_words, chunk_md5); chunk
    * TEXT itself is reconstructable (single-space joined) but the
    * md5 keeps harness outputs compact.
    *
    * Narrow shape: tokenize → explode the stride starts → slice — a
    * fully pipelined per-row map, no shuffle, trivially parallel over
    * 100 TB. Deterministic: chunk boundaries are pure word-offset math.
    */
  def chunkWords(docs: org.apache.spark.sql.DataFrame, textCol: String,
      maxWords: Int, overlap: Int): org.apache.spark.sql.DataFrame = {
    require(overlap >= 0 && overlap < maxWords, "need 0 <= overlap < maxWords")
    val stride = maxWords - overlap
    val toks = words(col(textCol))
    docs
      .withColumn("_toks", toks)
      .filter(size(col("_toks")) > 0)
      .withColumn("_start",
        explode(sequence(lit(0), size(col("_toks")) - 1, lit(stride))))
      // a trailing start that only re-covers overlap words adds no new
      // content: keep starts at 0 or exposing at least one NEW word
      .filter(col("_start") === 0 || col("_start") + overlap < size(col("_toks")))
      .withColumn("chunk_idx", expr(s"_start div $stride"))
      .withColumn("_chunk", slice(col("_toks"), col("_start") + 1, lit(maxWords)))
      .withColumn("n_words", size(col("_chunk")).cast("long"))
      .withColumn("chunk_md5", md5(concat_ws(" ", col("_chunk"))))
      .drop("_toks", "_start", "_chunk")
  }

  /** Repetition-filter thresholds (Gopher-inspired, token-based): a doc
    * is `repetitive` when its most frequent word bigram accounts for
    * more than [[RepTopBigramMax]] of all bigram occurrences, or when
    * trigrams occurring ≥ 2× account for more than [[RepDupTrigramMax]]
    * of all trigram occurrences — the looping/boilerplate signal
    * quality scores built on length/punctuation ratios can't see.
    */
  val RepTopBigramMax = 0.18
  val RepDupTrigramMax = 0.30

  /** Intra-document repetition statistics over `docs(doc_id, text)`:
    * (doc_id, n_bigrams, top_bigram_frac, dup_trigram_frac, repetitive).
    * Docs with fewer than 2 tokens have no bigrams and are absent (no
    * denominator — same contract as the DuckDB replay).
    *
    * Plan shape: tokens explode once; both gram sizes come off ONE
    * lead() window pass (per-doc partitions — narrow at any corpus
    * size) and unpivot into (doc_id, k, gram) rows, so there is a
    * single gram-count shuffle with map-side partial aggregation, then
    * a doc_id-sized final aggregate. No per-doc collect, no UDF.
    */
  def repetitionStats(docs: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val toks = docs.select(col("doc_id"),
      posexplode(words(lower(col("text")))).as(Seq("pos", "tok")))
    val wo = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    val g = toks
      .withColumn("ng", count(lit(1)).over(Window.partitionBy(col("doc_id"))))
      .withColumn("t1", lead(col("tok"), 1).over(wo))
      .withColumn("t2", lead(col("tok"), 2).over(wo))
    val grams = g.select(col("doc_id"), explode(array(
        when(col("pos") <= col("ng") - 2,
          struct(lit(2).as("k"), concat_ws(" ", col("tok"), col("t1")).as("gram"))),
        when(col("pos") <= col("ng") - 3,
          struct(lit(3).as("k"),
            concat_ws(" ", col("tok"), col("t1"), col("t2")).as("gram"))))).as("kg"))
      .filter(col("kg").isNotNull)
      .select(col("doc_id"), col("kg.k").as("k"), col("kg.gram").as("gram"))
    grams.groupBy(col("doc_id"), col("k"), col("gram"))
      .agg(count(lit(1)).as("c"))
      .groupBy(col("doc_id")).agg(
        sum(when(col("k") === 2, col("c"))).as("n2"),
        max(when(col("k") === 2, col("c"))).as("top2"),
        sum(when(col("k") === 3, col("c"))).as("n3"),
        sum(when(col("k") === 3 && col("c") >= 2, col("c"))).as("dup3"))
      .select(col("doc_id"), col("n2").as("n_bigrams"),
        round(col("top2").cast("double") / col("n2"), 6).as("top_bigram_frac"),
        when(col("n3") > 0,
            round(coalesce(col("dup3"), lit(0L)).cast("double") / col("n3"), 6))
          .otherwise(lit(0.0)).as("dup_trigram_frac"))
      .withColumn("repetitive",
        col("top_bigram_frac") > RepTopBigramMax ||
          col("dup_trigram_frac") > RepDupTrigramMax)
  }

  /** Corpus collocations by pointwise mutual information over ADJACENT
    * word pairs — the phrase-mining signal tokenizer/vocab induction
    * uses to promote multi-word units ("new york", "machine learning")
    * above chance co-occurrence. PMI = log P(xy)/(P(x)P(y)); since log
    * is monotone the ranking needs only the RATIO, which is computed in
    * EXACT integers: score_micro = (c_xy · N · 10⁶) div (c_x · c_y)
    * with N = total bigram count — no float ever enters the ordering,
    * so ranks can't flip on an engine boundary. The multiply runs in
    * decimal(38,0) (DuckDB: HUGEINT) so corpus-scale counts can't
    * overflow a long.
    *
    * Scale shape: one token explode + the per-doc lead() window (the
    * repetitionStats exchange), then two map-side-combined counts
    * (unigrams ≈ vocab, bigrams ≈ distinct pairs). The unigram joins
    * are 1:1 on the count tables — no fan-out — and the support floor
    * (`minCount`, PMI's classic rare-pair guard) prunes the pair table
    * before them. Final top-k is a TakeOrdered, never a global sort.
    */
  def collocations(docs: org.apache.spark.sql.DataFrame, minCount: Long = 5L,
      topK: Int = 40): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val toks = docs.select(col("doc_id"),
      posexplode(words(lower(col("text")))).as(Seq("pos", "tok")))
    val wo = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    val pairs = toks
      .withColumn("ng", count(lit(1)).over(Window.partitionBy(col("doc_id"))))
      .withColumn("w2", lead(col("tok"), 1).over(wo))
      .filter(col("pos") <= col("ng") - 2)
      .select(col("tok").as("w1"), col("w2"))
    val uni = pairs.select(explode(array(col("w1"), col("w2"))).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("cw"))
    val big = pairs.groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("n_pair"))
      .filter(col("n_pair") >= minCount)
    val total = pairs.select((count(lit(1)) * 2).as("n_total"))
    val dec = "decimal(38,0)"
    big
      .join(uni.select(col("w").as("w1"), col("cw").as("c1")), "w1")
      .join(uni.select(col("w").as("w2"), col("cw").as("c2")), "w2")
      .crossJoin(broadcast(total))
      .withColumn("num",
        col("n_pair").cast(dec) * col("n_total").cast(dec) * lit(1000000L))
      .withColumn("den", col("c1").cast(dec) * col("c2").cast(dec))
      .select(col("w1"), col("w2"), col("n_pair"),
        expr("CAST((num div den) AS LONG)").as("pmi_micro"))
      .orderBy(col("pmi_micro").desc, col("w1"), col("w2"))
      .limit(topK)
  }
}
