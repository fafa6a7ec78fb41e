package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Supervised text classification for corpus curation — the
  * quality-classifier stage of published LLM data pipelines (a small
  * labeled seed set scores the whole corpus; documents are then
  * filtered or importance-sampled by the score). A multinomial Naive
  * Bayes in log-likelihood-ratio form is the classical closed-form
  * instance: training is two aggregations (no iterative optimizer),
  * scoring is one broadcast join — both exactly replayable by a SQL
  * oracle, which gradient-trained models are not.
  *
  * Reference behavioral anchor: the reference engine profiles and
  * filters tabular scans (`whiteRRabbit.R:163-226`); classifier-based
  * corpus scoring is part of this repo's training-data extension
  * surface alongside [[TextMetrics.unigramLogprob]].
  */
object Classify {

  /** Train a multinomial NB model on `labeled` (`labelCol` boolean:
    * positive class = true) and score EVERY row of `docs` with
    * `prior + Σ_w k_w · llr(w)`, where
    * `llr(w) = ln((c_pos(w)+1)/(N_pos+V)) − ln((c_neg(w)+1)/(N_neg+V))`
    * (Laplace-smoothed class-conditional log ratio), `k_w` the token's
    * occurrence count in the document, and tokens never seen in
    * training take the smoothing floor
    * `llr_unseen = ln((N_neg+V)/(N_pos+V))`. Positive scores lean
    * positive-class; the magnitude orders documents for filtering or
    * deciling.
    *
    * Output: (id, n_tokens, nb_llr).
    *
    * Scale shape: training aggregates the LABELED set only (seed sets
    * are small by construction) and the resulting model is
    * vocabulary-sized — it BROADCASTS, like the unigram dictionary in
    * [[TextMetrics.unigramLogprob]]; swap for a shuffle join only if
    * the vocabulary outgrows broadcast. The corpus side collapses to
    * DISTINCT (doc, token) rows with an occurrence count before the
    * model join (map-side combine — repeated tokens add zero join
    * width), then one doc-keyed aggregation. Two shuffles total on
    * the corpus: the (doc, token) combine and the per-doc sum.
    *
    * Determinism (the [[TextMetrics.unigramLogprob]] convention): each
    * log term is a fixed-order double expression rounded at 9 decimals
    * into DECIMAL(20,9), occurrence counts multiply in exact decimal,
    * the per-doc sum is exact decimal, and the final score rounds at 6
    * — so a SQL oracle replays the score digit-for-digit.
    */
  def naiveBayesScore(docs: DataFrame, idCol: String, textCol: String,
      labeled: DataFrame, labelCol: String,
      tokenizer: Column => Column = TextFunctions.tokens): DataFrame = {
    // a one-class (or empty) seed set makes prior = log(dp/dn)
    // ±Infinity/null and every score silently degenerate — fail fast
    // instead; the seed set is small by construction, so this check
    // is one bounded aggregation
    val seed = labeled.agg(
      sum(when(col(labelCol), 1L).otherwise(0L)).as("dp"),
      sum(when(col(labelCol), 0L).otherwise(1L)).as("dn")).head()
    val (dp, dn) = (if (seed.isNullAt(0)) 0L else seed.getLong(0),
      if (seed.isNullAt(1)) 0L else seed.getLong(1))
    require(dp > 0 && dn > 0, "naiveBayesScore needs both classes in " +
      s"the labeled seed set: positives=$dp, negatives=$dn")
    val trainToks = labeled.select(col(labelCol).as("__pos"),
      explode(tokenizer(col(textCol))).as("t"))
    val counts = trainToks.groupBy(col("t"))
      .agg(sum(when(col("__pos"), 1L).otherwise(0L)).as("cp"),
        sum(when(col("__pos"), 0L).otherwise(1L)).as("cn"))
    val totals = counts.agg(sum(col("cp")).as("np"),
      sum(col("cn")).as("nn"), count(lit(1)).as("v"))
    // fixed-order double expression, rounded at 9 — replayed verbatim
    // by the oracle (log((cp+1)/(np+v)) - log((cn+1)/(nn+v)))
    def llrExpr(cPos: Column, cNeg: Column): Column =
      round(log((cPos + lit(1L)).cast("double") / (col("np") + col("v"))) -
        log((cNeg + lit(1L)).cast("double") / (col("nn") + col("v"))), 9)
        .cast("decimal(20,9)")
    val model = counts.crossJoin(broadcast(totals))
      .select(col("t"), llrExpr(col("cp"), col("cn")).as("llr"))
    val priors = labeled
      .agg(sum(when(col(labelCol), 1L).otherwise(0L)).as("dp"),
        sum(when(col(labelCol), 0L).otherwise(1L)).as("dn"))
      .crossJoin(totals)
      .select(
        round(log(col("dp").cast("double") / col("dn")), 9)
          .cast("decimal(20,9)").as("prior"),
        llrExpr(lit(0L), lit(0L)).as("llr_unseen"))
    val docToks = docs.select(col(idCol).as("id"),
        explode(tokenizer(col(textCol))).as("t"))
      .groupBy(col("id"), col("t"))
      .agg(count(lit(1)).as("k"))
    docToks
      .join(broadcast(model), Seq("t"), "left")
      .crossJoin(broadcast(priors))
      .groupBy(col("id"))
      .agg(sum(col("k")).as("n_tokens"),
        // round IN DECIMAL, then cast to double; and cast the sum to
        // DECIMAL(28,9) BEFORE adding the prior — the unboxed sum is
        // decimal(38,9) and decimal(38,9)+decimal(20,9) overflows
        // precision 38, which makes Spark silently drop to scale 8:
        // a double-rounding that flips exact half-boundary scores
        round(first(col("prior")) +
          sum(col("k").cast("decimal(10,0)") *
            coalesce(col("llr"), col("llr_unseen")))
            .cast("decimal(28,9)"), 6)
          .cast("double").as("nb_llr"))
  }
}
