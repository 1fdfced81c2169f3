package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Multinomial Naive Bayes text classifier — the model-based quality
  * filter of the fastText-classifier shape (labels in, per-doc
  * keep/drop out) done as pure counting, so training is one distributed
  * aggregation, scoring is one broadcast join, and every number is
  * bit-reproducible against a SQL recompute (g17's oracle). Trained on
  * WEAK labels (the g01 Gopher gates) it distills the heuristic gates
  * into a smooth per-token score that generalizes to docs the heuristics
  * tie on — the standard bootstrap when no human labels exist.
  *
  * Scale shape: the token-class count table is vocabulary-sized (Zipf),
  * so it broadcasts; the scoring pass is a narrow map + one groupBy
  * (same shuffle budget as g09/g14). Priors and totals are one scalar
  * aggregation each. Nothing is per-pair or iterative.
  *
  * Add-one smoothing over a +1-OOV vocabulary, mirroring [[NgramLm]]:
  * unseen tokens contribute the uniform 1/(N_y+V) mass to class y via
  * the same coalesce-null-to-zero formula that handles seen tokens.
  */
object NaiveBayes {

  /** counts: (tok, c_pass, c_fail) token occurrences per class over
    * TRAIN; nPass/nFail their totals; vocab = train token types + 1
    * (OOV slot); logPriorRatio = ln(train pass docs / fail docs).
    */
  final case class Model(counts: DataFrame, nPass: Long, nFail: Long,
                         vocab: Long, logPriorRatio: Double)

  /** Train from (idCol, tok) tokens and (idCol, label∈{0,1}) weak
    * labels — two aggregations and two scalar actions, both bounded.
    */
  def train(tokens: DataFrame, labels: DataFrame, idCol: String): Model = {
    val tl = tokens.join(labels, idCol)
    val counts = tl.groupBy("tok").agg(
      sum(col("label")).as("c_pass"),
      sum(lit(1) - col("label")).as("c_fail"))
    val t = counts.agg(sum("c_pass"), sum("c_fail"), count(lit(1))).head()
    val pri = labels.agg(sum(col("label")), sum(lit(1) - col("label"))).head()
    Model(counts, t.getLong(0), t.getLong(1), t.getLong(2) + 1L,
      math.log(pri.getLong(0).toDouble / pri.getLong(1)))
  }

  /** Per-doc log-odds margin ln P(pass|doc) - ln P(fail|doc):
    * (idCol, n_tokens, margin); predict pass iff margin > 0.
    */
  def score(tokens: DataFrame, model: Model, idCol: String): DataFrame = {
    val dll =
      log((coalesce(col("c_pass"), lit(0L)) + lit(1.0)) /
        lit((model.nPass + model.vocab).toDouble)) -
      log((coalesce(col("c_fail"), lit(0L)) + lit(1.0)) /
        lit((model.nFail + model.vocab).toDouble))
    tokens.join(broadcast(model.counts), Seq("tok"), "left")
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_tokens"),
        (sum(dll) + lit(model.logPriorRatio)).as("margin"))
  }
}
