package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Corpus-hygiene metrics for training-data pipelines beyond the
  * per-document quality score: benchmark decontamination and
  * within-document repetition (the Gopher-style duplicate-text
  * filters).
  */
object TextMetrics {

  /** Benchmark decontamination: for every corpus document, the number
    * of distinct token n-grams it shares with ANY document of the
    * benchmark set — the standard "does a test-set n-gram appear in
    * the training doc" contamination test. Output: (id, n_hits) for
    * contaminated documents only; callers anti-join or threshold.
    *
    * Scale shape: both sides explode to DISTINCT n-gram strings and
    * meet in one equality join on the n-gram — never a doc×doc
    * comparison. The benchmark side is typically tiny (test sets) and
    * broadcasts; the corpus side streams. N-grams stay strings here
    * (not hashes) so the operator is exactly replayable by a SQL
    * oracle — at 100 TB swap the join key for xxhash64(ngram), which
    * halves the shuffle width without changing the plan shape.
    */
  def decontaminate(corpus: DataFrame, idCol: String, textCol: String,
      bench: DataFrame, benchTextCol: String, ngram: Int): DataFrame = {
    def ngrams(df: DataFrame, outCols: Seq[org.apache.spark.sql.Column],
        text: String) = {
      val toks = TextFunctions.tokens(col(text))
      df.select(outCols :+ toks.as("__toks"): _*)
        .where(size(col("__toks")) >= ngram)
        .select(outCols :+ explode(transform(
          sequence(lit(0), size(col("__toks")) - ngram),
          i => concat_ws(" ",
            slice(col("__toks"), i + 1, lit(ngram))))).as("__ng"): _*)
        .distinct()
    }
    val benchNgrams = ngrams(bench, Seq.empty, benchTextCol)
      .select(col("__ng"))
      .distinct()
    ngrams(corpus, Seq(col(idCol)), textCol)
      .join(broadcast(benchNgrams), Seq("__ng"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_hits"))
  }

  /** Within-document repetition profile (Gopher-style duplicate-text
    * signals): per document, the fraction of tokens belonging to
    * repeated token TYPES (a type occurring k>1 times contributes all
    * k tokens) and the share of the most frequent bigram among all
    * bigrams. Pure per-document computation — explode + per-id
    * aggregation whose groups are document-sized, so the shuffle is
    * keyed by id and no group outgrows a document.
    */
  def repetitionStats(df: DataFrame, idCol: String,
      textCol: String): DataFrame = {
    val toks = df.select(col(idCol).as("id"),
        TextFunctions.tokens(col(textCol)).as("toks"))
      .where(size(col("toks")) > 0)
    val tokCounts = toks
      .select(col("id"), explode(col("toks")).as("t"))
      .groupBy("id", "t").agg(count(lit(1)).as("c"))
      .groupBy("id").agg(
        sum(col("c")).as("n_tokens"),
        sum(when(col("c") > 1, col("c")).otherwise(lit(0)))
          .as("dup_tokens"))
    val bigrams = toks
      .where(size(col("toks")) >= 2)
      .select(col("id"), explode(transform(
        sequence(lit(0), size(col("toks")) - 2),
        i => concat_ws(" ", slice(col("toks"), i + 1, lit(2))))).as("bg"))
      .groupBy("id", "bg").agg(count(lit(1)).as("c"))
      .groupBy("id").agg(max(col("c")).as("top_bigram"),
        sum(col("c")).as("n_bigrams"))
    tokCounts.join(bigrams, Seq("id"), "left")
      .select(col("id"), col("n_tokens"),
        round(col("dup_tokens").cast("double") / col("n_tokens"), 6)
          .as("dup_token_frac"),
        round(col("top_bigram").cast("double") / col("n_bigrams"), 6)
          .as("top_bigram_frac"))
  }
}
