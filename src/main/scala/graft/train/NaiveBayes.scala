package graft.train

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed multinomial Naive-Bayes TRAINING for model-based quality
  * filtering — the trained counterpart of the hashing-trick scorer
  * (`Queries.qQualityClassifier`). This is the fastText-classifier role
  * in CCNet/GPT-3-style data pipelines (classify pages as
  * reference-like vs crawl-like, keep high scorers); cf. the reference
  * pipeline's lexicon training (lib/lexicon.py), which is the same
  * count→log-relative-frequency discipline over one class.
  *
  * Why Naive Bayes here: training is a pure COUNTING aggregation —
  * one token explode feeding one partial+final hash agg — so unlike
  * gradient methods the whole training pass is order-independent,
  * SQL-expressible and oracle-exact, and it scales exactly like every
  * other counting pass in the battery (no driver-side state; the
  * vocabulary-sized weight table stays distributed).
  *
  * Scoring folds the per-token log-likelihood-ratio weights in
  * FIXED-POINT (weights rounded to 6 decimals, then scaled to 1e6
  * BIGINTs) so the per-document sum is aggregation-order-independent
  * and bit-comparable across engines — the same determinism discipline
  * as qPagerank / the money folds in Analytics.
  */
object NaiveBayes {

  private val TokensExpr = "filter(split(text, ' '), t -> t <> '')"

  /** Per-term class counts and the smoothed log-likelihood-ratio weight
    * ln((c_pos+1)/(tp+V)) − ln((c_neg+1)/(tn+V)), Laplace-1 smoothing.
    * `docs` needs (text); `label` is a boolean Column (true = positive
    * class). Output: (term, c_pos, c_neg, weight) — vocabulary-sized,
    * left distributed.
    *
    * Scale shape: ONE explode → ONE (term) hash agg (partial+final);
    * the three totals (tp, tn, V) derive from that aggregate and stay
    * IN-PLAN as a broadcast 1-row cross join (no eager collect — the
    * builder-is-lazy invariant). */
  def trainWeights(docs: DataFrame, label: Column): DataFrame = {
    val toks = docs
      .select(label.as("good"), explode(expr(TokensExpr)).as("term"))
    val counts = toks.groupBy(col("term")).agg(
      sum(when(col("good"), 1L).otherwise(0L)).as("c_pos"),
      sum(when(!col("good"), 1L).otherwise(0L)).as("c_neg"))
    val totals = counts.agg(
      sum(col("c_pos")).as("tp"), sum(col("c_neg")).as("tn"),
      count(lit(1)).as("v"))
    counts.crossJoin(broadcast(totals))
      .select(col("term"), col("c_pos"), col("c_neg"),
        round(
          log((col("c_pos") + 1) / (col("tp") + col("v")).cast("double")) -
          log((col("c_neg") + 1) / (col("tn") + col("v")).cast("double")),
          6).as("weight"))
  }

  /** Score documents under trained weights: per-doc sum of fixed-point
    * term weights, keep = score > 0. OOV terms contribute 0 (left
    * join). The weights side is vocabulary-sized — NO broadcast hint,
    * AQE decides (the qTfidfTop df-join precedent). One shuffle on
    * term (join), one on doc_id (the per-doc fold); docs with no
    * tokens survive via the join-back. */
  def score(docs: DataFrame, weights: DataFrame): DataFrame = {
    val toks = docs
      .select(col("doc_id"), explode(expr(TokensExpr)).as("term"))
    val wfp = weights.select(col("term"),
      expr("CAST(round(weight * 1e6, 0) AS BIGINT)").as("wfp"))
    val scores = toks.join(wfp, Seq("term"), "left")
      .groupBy(col("doc_id"))
      .agg(sum(coalesce(col("wfp"), lit(0L))).as("score_fp"))
    docs.select(col("doc_id"))
      .join(scores, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("score_fp"), lit(0L)).as("score_fp"))
      .withColumn("keep", col("score_fp") > 0)
  }
}
