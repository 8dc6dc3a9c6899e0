package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Counting n-gram language model with Stupid Backoff scoring (Brants
  * et al. 2007, "Large Language Models in Machine Translation") — the
  * web-scale LM shape: no discounting, no normalization at backoff,
  * just counts and one fixed backoff penalty, which is exactly what a
  * distributed counting pass can build at any corpus size. The classic
  * use is CCNet-style perplexity filtering: train on a clean target
  * corpus, score every raw document, keep documents whose per-token
  * log-probability clears a threshold.
  *
  * Model = two count-derived tables keyed by 48-bit portable token
  * hashes (8/16-byte join keys, never strings):
  *   - unigram: `s_uni(w) = ln((c(w)+1) / (N+V))` (add-1 smoothed, so
  *     unseen tokens get the closed-form default `ln(1/(N+V))`),
  *   - bigram:  `s_bi(w1,w2) = ln(c(w1 w2) / c(w1))`.
  * Score of a position: `s_bi` if the bigram was seen, else
  * `ln(0.4) + s_uni(w2)`. A document's score is the sum over its
  * bigram positions — documents with < 2 tokens have no positions and
  * are structurally absent from the output (q_repetition convention).
  *
  * Determinism discipline (Classify contract): every log value is
  * computed once per MODEL ROW from exact integer counts, rounded
  * half-up to 6 decimals and stored as integer micro-units; document
  * scores are then exact integer sums, and the keep rule compares
  * integers (`score ≥ thr·n`), so filtering can never flip on a float
  * boundary.
  *
  * Scale shape: training is two map-side-combined count aggregates
  * (token-keyed, bigram-keyed); the model is corpus-vocabulary-sized,
  * so scoring joins it by SHUFFLE equi-join on hashed keys — the
  * posting-table shape that holds when the model itself outgrows a
  * broadcast (a web-scale bigram table does). Only the 2-value totals
  * row broadcasts.
  */
object LanguageModel {

  /** Backoff penalty ln(0.4) in micro-units (micro6 convention). */
  val AlphaMicro: Long = math.floor(math.log(0.4) * 1e6 + 0.5).toLong

  /** Default keep threshold: mean per-bigram log-prob ≥ −10.0. */
  val KeepPerBigramMicro: Long = -10000000L

  private def micro6(x: Column): Column =
    floor(x * 1000000.0 + lit(0.5)).cast("long")

  /** Position-indexed hashed tokens of `textCol` (winnowing tokenizer
    * contract: lower, trim, whitespace split, no length filter), salted
    * so the LM's hash space never aliases another hash use.
    */
  private def hashedTokens(docs: DataFrame, idCols: Seq[String],
      textCol: String): DataFrame =
    docs.select(idCols.map(col) :+
        posexplode(split(trim(lower(col(textCol))), "\\s+")).as(Seq("pos", "tok")): _*)
      .select(idCols.map(col) :+ col("pos") :+
        TextOps.portableHash64(concat(lit("lm:"), col("tok"))).as("h"): _*)

  /** Adjacent-pair table (…, pos, h1, h2) — one per bigram position. */
  private def bigramPairs(toks: DataFrame, idCols: Seq[String]): DataFrame = {
    val w = Window.partitionBy(idCols.map(col): _*).orderBy(col("pos"))
    toks.withColumn("h2", lead(col("h"), 1).over(w))
      .filter(col("h2").isNotNull)
      .withColumnRenamed("h", "h1")
  }

  /** Train on a corpus: returns `(uni, bi, totals)` where
    * `uni(h, s_uni_micro)` and `bi(h1, h2, s_bi_micro)` are the two
    * model tables and `totals` is one row
    * `(n_tokens, vocab, default_micro)` — the closed-form score of an
    * unseen unigram rides this broadcastable scalar row instead of a
    * dense table.
    */
  def train(corpus: DataFrame, textCol: String): (DataFrame, DataFrame, DataFrame) = {
    val toks = hashedTokens(corpus, Seq("doc_id"), textCol)
    val uniCounts = toks.groupBy(col("h")).agg(count(lit(1)).as("c1"))
    val totals = uniCounts
      .agg(sum(col("c1")).as("n_tokens"), count(lit(1)).as("vocab"))
      .select(col("n_tokens"), col("vocab"),
        micro6(log(lit(1.0) / (col("n_tokens") + col("vocab")).cast("double")))
          .as("default_micro"))
    val uni = uniCounts.crossJoin(broadcast(totals.select(col("n_tokens"), col("vocab"))))
      .select(col("h"), micro6(log(
        (col("c1") + 1).cast("double") / (col("n_tokens") + col("vocab")).cast("double")))
        .as("s_uni_micro"))
    val bi = bigramPairs(toks, Seq("doc_id"))
      .groupBy(col("h1"), col("h2")).agg(count(lit(1)).as("c2"))
      .join(uniCounts.select(col("h").as("h1"), col("c1")), "h1")
      .select(col("h1"), col("h2"),
        micro6(log(col("c2").cast("double") / col("c1").cast("double")))
          .as("s_bi_micro"))
    (uni, bi, totals)
  }

  /** Per-POSITION Stupid-Backoff scores — the loss-vs-position
    * diagnostic input ([[graft.Queries.surprisalCurveQ]]): one row per
    * bigram position (idCol, pos, n_pos, s_micro), where pos is the
    * first token's index and n_pos the doc's bigram count. Same model
    * joins and exact integer scores as [[score]]; the per-doc position
    * count rides a doc-partitioned window on the exchange the bigram
    * window already forced.
    */
  def positionScores(docs: DataFrame, uni: DataFrame, bi: DataFrame,
      totals: DataFrame, idCol: String, textCol: String): DataFrame = {
    val pairs = bigramPairs(hashedTokens(docs, Seq(idCol), textCol), Seq(idCol))
      .withColumn("n_pos", count(lit(1)).over(Window.partitionBy(col(idCol))))
    pairs
      .join(bi, Seq("h1", "h2"), "left")
      .join(uni.select(col("h").as("h2"), col("s_uni_micro")), Seq("h2"), "left")
      .crossJoin(broadcast(totals.select(col("default_micro"))))
      .select(col(idCol), col("pos"), col("n_pos"),
        coalesce(col("s_bi_micro"),
          lit(AlphaMicro) + coalesce(col("s_uni_micro"), col("default_micro")))
          .as("s_micro"))
  }

  /** Score documents against a trained model: per doc, the number of
    * bigram positions and the exact-integer Stupid-Backoff score sum,
    * plus the integer keep rule `score ≥ thrPerBigram·n`. Model joins
    * are hashed-key shuffle equi-joins (left, so unseen grams take the
    * backoff arm); only `totals` broadcasts.
    */
  def score(docs: DataFrame, uni: DataFrame, bi: DataFrame, totals: DataFrame,
      idCol: String, textCol: String, carry: Seq[String] = Nil,
      thrPerBigramMicro: Long = KeepPerBigramMicro): DataFrame = {
    val pairs = bigramPairs(
      hashedTokens(docs, idCol +: carry, textCol), idCol +: carry)
    pairs
      .join(bi, Seq("h1", "h2"), "left")
      .join(uni.select(col("h").as("h2"), col("s_uni_micro")), Seq("h2"), "left")
      .crossJoin(broadcast(totals.select(col("default_micro"))))
      .select(col(idCol) +: carry.map(col) :+
        coalesce(col("s_bi_micro"),
          lit(AlphaMicro) + coalesce(col("s_uni_micro"), col("default_micro")))
          .as("s"): _*)
      .groupBy(col(idCol) +: carry.map(col): _*)
      .agg(count(lit(1)).as("n_bigrams"), sum(col("s")).as("score_micro"))
      .withColumn("keep",
        col("score_micro") >= lit(thrPerBigramMicro) * col("n_bigrams"))
  }
}
