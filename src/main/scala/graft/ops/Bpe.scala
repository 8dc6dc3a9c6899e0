package graft.ops

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Byte-Pair-Encoding merge training (Sennrich et al. 2016) — the
  * subword-vocabulary induction step of every tokenizer build, in its
  * canonical form: operate on the WORD-TYPE dictionary (distinct words
  * with corpus frequencies), split each type into character symbols
  * plus a `</w>` end marker, then repeatedly (1) count adjacent symbol
  * pairs weighted by word frequency, (2) take the most frequent pair
  * (ties broken lexicographically), (3) merge every non-overlapping
  * occurrence left-to-right.
  *
  * Scale shape: the only corpus-sized pass is the initial word count
  * (one map-side-combined aggregate). Everything after runs on the
  * TYPE dictionary — vocabulary-sized, not corpus-sized — partitioned
  * by word, so each merge iteration is one pair-count aggregate plus
  * windows over the same `(word, pos)` partitioning (one exchange,
  * reused). Per iteration exactly ONE row reaches the driver (the
  * argmax pair — model-sized, the kmeans-centroid pattern).
  *
  * The left-to-right non-overlap rule is made relational via run
  * parity: within a maximal run of consecutive match positions, the
  * 1st, 3rd, 5th… merge and the positions they consume drop — exactly
  * what the sequential greedy scan does, but computable as windows on
  * both engines (so the DuckDB oracle can replay it bit-for-bit).
  * Symbols produced by a merge do NOT re-match within the same
  * iteration (standard BPE: `a a a a` → `aa aa`, and `(aa,aa)` is a
  * fresh pair for a later iteration).
  */
object Bpe {

  /** Word-type dictionary of a corpus text column: (word, freq). */
  def wordTypes(corpus: DataFrame, textCol: String): DataFrame =
    corpus.select(explode(split(trim(lower(col(textCol))), "\\s+")).as("word"))
      .filter(length(col("word")) >= 1)
      .groupBy(col("word")).agg(count(lit(1)).as("freq"))

  /** Initial symbol table: one row per (word, pos, symbol) — the
    * word's characters then the `</w>` end marker. `substr`-built so
    * the DuckDB replay is expression-identical.
    */
  def charSymbols(words: DataFrame): DataFrame =
    words.select(col("word"), col("freq"),
      posexplode(expr(
        "concat(transform(sequence(1, length(word)), j -> substr(word, j, 1)), array('</w>'))"))
        .as(Seq("pos", "s")))

  /** Apply ONE merge (l, r) to a symbol table left-to-right
    * non-overlapping (run parity — see class doc). Shared by the
    * trainer and the encoder so their semantics cannot drift.
    */
  private def applyMerge(seq: DataFrame, l: String, r: String): DataFrame = {
    val wOrd = Window.partitionBy(col("word")).orderBy(col("pos"))
    seq
      .withColumn("m",
        col("s") === lit(l) && lead(col("s"), 1).over(wOrd) === lit(r))
      .withColumn("grp", when(col("m"), col("pos") -
        row_number().over(Window.partitionBy(col("word"), col("m")).orderBy(col("pos")))))
      .withColumn("ap", col("m") &&
        row_number().over(Window.partitionBy(col("word"), col("grp")).orderBy(col("pos"))) % 2 === 1)
      .withColumn("prev_ap", lag(col("ap"), 1).over(wOrd))
      .filter(!coalesce(col("prev_ap"), lit(false)))
      .select(col("word"), col("freq"),
        (row_number().over(wOrd) - 1).as("pos"),
        when(col("ap"), lit(l + r)).otherwise(col("s")).as("s"))
  }

  /** Encode the word-type dictionary with an ordered merge list
    * (lhs, rhs): the tokenizer-apply side of BPE. Merges come from a
    * trained model — 8..64k rows, driver-held by design (every real
    * tokenizer ships its merge list as a file; it is the model, not
    * data). Returns (word, freq, n_subwords). Per-DOCUMENT subword
    * counts are then a word-keyed join of the corpus against this
    * TYPE-sized table — no per-occurrence re-encoding ever happens.
    */
  def encodeTypes(words: DataFrame, merges: Seq[(String, String)]): DataFrame =
    encodeTypesWithCurve(words, merges, Nil)._1

  /** [[encodeTypes]] that ALSO returns the corpus-weighted subword
    * totals at the requested merge-prefix checkpoints — the
    * [[encodeCurve]] readout off the SAME single chain, for callers
    * (the bpe_enc_types session memo) that can serve both the encoded
    * dictionary and the compression curve with one 8-pass run. Each
    * checkpoint costs one scalar aggregate over the already-persisted
    * intermediate state.
    */
  def encodeTypesWithCurve(words: DataFrame, merges: Seq[(String, String)],
      checkpoints: Seq[Int]): (DataFrame, Seq[(Int, Long)]) = {
    val want = checkpoints.toSet
    def total(seq: DataFrame): Long =
      seq.agg(coalesce(sum(col("freq")), lit(0L))).collect()(0).getLong(0)
    var seq = charSymbols(words).persist()
    seq.count()
    val pts = ArrayBuffer.empty[(Int, Long)]
    if (want(0)) pts += ((0, total(seq)))
    merges.zipWithIndex.foreach { case ((l, r), i) =>
      val next = applyMerge(seq, l, r).persist()
      next.count()
      seq.unpersist()
      seq = next
      if (want(i + 1)) pts += ((i + 1, total(seq)))
    }
    val out = seq.groupBy(col("word"), col("freq"))
      .agg(count(lit(1)).as("n_subwords"))
    (out, pts.toSeq)
  }

  /** Corpus-weighted subword totals at every merge-prefix checkpoint,
    * off ONE merge chain: because merges apply in learned order, the
    * encoding under the first k merges is exactly the k-th
    * intermediate state — so the whole vocab-size frontier costs one
    * 8-pass chain with a scalar aggregate per checkpoint, not a fresh
    * encode per k. Returns (k, Σ freq·n_subwords) per requested
    * checkpoint; only those scalars reach the driver.
    */
  def encodeCurve(words: DataFrame, merges: Seq[(String, String)],
      checkpoints: Seq[Int]): Seq[(Int, Long)] = {
    val want = checkpoints.toSet
    def total(seq: DataFrame): Long =
      seq.agg(coalesce(sum(col("freq")), lit(0L))).collect()(0).getLong(0)
    var seq = charSymbols(words).persist()
    seq.count()
    val out = scala.collection.mutable.ArrayBuffer.empty[(Int, Long)]
    if (want(0)) out += ((0, total(seq)))
    merges.zipWithIndex.foreach { case ((l, r), i) =>
      val next = applyMerge(seq, l, r).persist()
      next.count()
      seq.unpersist()
      seq = next
      if (want(i + 1)) out += ((i + 1, total(seq)))
    }
    seq.unpersist()
    out.toSeq
  }

  /** Learn `nMerges` merges; returns (merge_rank, lhs, rhs, pair_count)
    * in learning order. Stops early if no adjacent pair remains.
    */
  def train(corpus: DataFrame, textCol: String, nMerges: Int): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val wOrd = Window.partitionBy(col("word")).orderBy(col("pos"))
    var seq = charSymbols(wordTypes(corpus, textCol)).persist()
    seq.count()
    val merges = ArrayBuffer.empty[(Int, String, String, Long)]
    var rank = 1
    var done = false
    while (rank <= nMerges && !done) {
      val best: Array[Row] = seq
        .withColumn("r", lead(col("s"), 1).over(wOrd))
        .filter(col("r").isNotNull)
        .groupBy(col("s").as("l"), col("r"))
        .agg(sum(col("freq")).as("c"))
        .orderBy(col("c").desc, col("l"), col("r"))
        .limit(1).collect()
      if (best.isEmpty) done = true
      else {
        val (l, r, c) = (best(0).getString(0), best(0).getString(1), best(0).getLong(2))
        merges += ((rank, l, r, c))
        val next = applyMerge(seq, l, r).persist()
        next.count()
        seq.unpersist()
        seq = next
        rank += 1
      }
    }
    seq.unpersist()
    merges.toSeq.toDF("merge_rank", "lhs", "rhs", "pair_count")
  }
}
