package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus-trained n-gram language-model scoring — the CCNet-style
  * quality signal: documents whose token transitions are unlike the
  * corpus (boilerplate, gibberish, wrong-language fragments) score a
  * high mean negative log-likelihood and can be filtered or bucketed.
  *
  * Everything is DataFrame-shaped for scale: bigram/context counts
  * are map-side-combined aggregates over exploded bigram rows (the
  * shuffle carries (w1, w2, count) partials, never documents), the
  * vocabulary size is one scalar aggregate, and scoring joins each
  * document's bigram instances against the count tables by key. No
  * UDFs; the per-row token work is native HOF expressions.
  */
object LanguageModel {

  /** Tokens per the library convention (lowercase, trim, whitespace
    * split; empty text → empty array). */
  private def toks(textCol: Column): Column =
    when(length(trim(textCol)) === 0, array().cast("array<string>"))
      .otherwise(split(trim(lower(textCol)), "\\s+"))

  /** Mean negative log-likelihood per document under an add-α bigram
    * model trained on the whole input:
    *
    *   P(w2|w1) = (c(w1,w2) + α) / (c(w1·) + α·V)
    *   nll(d)   = −(1/|bigrams(d)|) Σ ln P(w2|w1)
    *
    * c(w1·) counts BIGRAM STARTS (not raw unigrams — no off-by-one at
    * document ends), V is the distinct-token vocabulary. Documents
    * with < 2 tokens have no bigrams: n_bigrams = 0, nll = 0.0.
    * Output: (doc_id, n_bigrams, nll). */
  def bigramNll(docs: DataFrame, idCol: String, textCol: String,
                alpha: Double = 0.1): DataFrame = {
    val withToks = docs.select(col(idCol).as("doc_id"), toks(col(textCol)).as("t"))
    // bigram instance rows; the token array is a materialized column
    // BEFORE the explode (tokenize-once)
    val inst = withToks
      .select(col("doc_id"), explode(
          graft.functions.BpeFunctions.adjacentPairs(col("t"))).as("b"))
      .select(col("doc_id"), col("b.left").as("w1"), col("b.right").as("w2"))
    val bigramCounts = inst.groupBy(col("w1"), col("w2"))
      .agg(count(lit(1)).as("cb"))
    val startCounts = inst.groupBy(col("w1"))
      .agg(count(lit(1)).as("cs"))
    val vocab = withToks.select(explode(col("t")).as("w"))
      .agg(countDistinct(col("w")).as("v"))
    val scoredInst = inst
      .join(bigramCounts, Seq("w1", "w2"))
      .join(startCounts, Seq("w1"))
      .crossJoin(broadcast(vocab))
      .withColumn("lp", log((col("cb") + alpha) /
        (col("cs") + lit(alpha) * col("v"))))
    val perDoc = scoredInst.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bigrams"), (-avg(col("lp"))).as("nll"))
    // documents with no bigrams re-enter with (0, 0.0)
    docs.select(col(idCol).as("doc_id"))
      .join(perDoc, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        coalesce(col("nll"), lit(0.0)).as("nll"))
  }
}
