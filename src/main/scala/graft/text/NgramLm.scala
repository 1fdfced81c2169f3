package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Bigram language model for perplexity-based corpus filtering — the
  * CCNet/KenLM-shaped curation step (Wenzek et al. 2020, "CCNet:
  * Extracting high quality monolingual datasets from web crawl data"):
  * train an n-gram LM on a reference slice, score every candidate
  * document by its mean token log-probability, and gate on the score.
  * The reference pipeline has no model-based filter (its quality
  * controls are the exact-hash dedup in db_utils.py:103-117); this is
  * the standard next gate a training-data pipeline adds after the
  * heuristic ones (g01/g02/t10).
  *
  * Everything is counting, so the model "training" is two distributed
  * aggregations and scoring is two equi-joins — no solver, no iteration,
  * and bit-exact reproducible against a SQL recompute (g16's oracle).
  *
  * Scale shape: bigrams are produced per row with `zip_with` over the
  * token array (narrow — no positional self-join, the g08 discipline).
  * Pair counts shuffle once on (t1, t2); at 100 TB the bigram-type table
  * is Zipf-bounded (vocab², but observed types grow ~linearly in corpus
  * size), scoring is a plain shuffled equi-join that AQE handles, and
  * the prefix-count and vocab frames are vocabulary-sized broadcasts.
  *
  * Smoothing: add-one over a next-token vocabulary of size V+1 (train's
  * distinct successor tokens, plus one OOV slot), conditioning on the
  * bigram-PREFIX count (so the smoothed conditionals normalize:
  * sum over t2 of (c2+1)/(c1+V+1) = 1 exactly when t2 ranges over the
  * V+1 smoothed successors). Unseen prefix and unseen pair both fall out
  * of the same formula via null-as-zero left joins.
  */
object NgramLm {

  /** (idCol, t1, t2) — one row per adjacent token pair, built narrowly
    * from the token-array column (no shuffle until someone aggregates).
    */
  def bigrams(docs: DataFrame, idCol: String, toksCol: String): DataFrame =
    docs.select(col(idCol), explode(zip_with(
        slice(col(toksCol), lit(1), size(col(toksCol)) - 1),
        slice(col(toksCol), lit(2), size(col(toksCol)) - 1),
        (a, b) => struct(a.as("t1"), b.as("t2")))).as("bg"))
      .select(col(idCol), col("bg.t1").as("t1"), col("bg.t2").as("t2"))

  /** The trained model: pair counts (shuffled once), prefix counts and
    * the +1-OOV successor vocabulary (both vocabulary-sized).
    */
  final case class Model(pairCounts: DataFrame, prefixCounts: DataFrame,
                         vocab: Long)

  def train(trainBigrams: DataFrame): Model = {
    // One shuffle over the raw bigrams, materialized once; the prefix
    // counts and the vocab size both derive from the (much smaller)
    // pair-type table instead of re-scanning the raw bigrams per quantity
    // (c1 = Σ c2 over t2 is the same count the direct groupBy produced).
    val bi = graft.operators.ScaleOps.checkpointed(
      trainBigrams.groupBy("t1", "t2").agg(count(lit(1)).as("c2")))
    val uni = bi.groupBy("t1").agg(sum(col("c2")).as("c1"))
    val v = bi.select(countDistinct(col("t2"))).head().getLong(0) + 1L
    Model(bi, uni, v)
  }

  /** ln p(t2|t1) under add-one smoothing — `(c2+1)/(c1+V)` with nulls
    * (unseen pair / unseen prefix) coalesced to zero, so the single
    * expression covers in-vocab, unseen-pair, and OOV-prefix uniformly.
    */
  private def lnP(vocab: Long): Column =
    log((coalesce(col("c2"), lit(0L)) + lit(1.0)) /
      (coalesce(col("c1"), lit(0L)) + lit(vocab.toDouble)))

  /** Per-doc mean ln p over the doc's bigrams: (idCol, n_bigrams, lp).
    * Docs with no bigram (single-token) produce no row — the gate treats
    * them as unscorable, matching the SQL formulation exactly.
    */
  def score(bg: DataFrame, model: Model, idCol: String): DataFrame =
    bg.join(model.pairCounts, Seq("t1", "t2"), "left")
      .join(broadcast(model.prefixCounts), Seq("t1"), "left")
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_bigrams"), avg(lnP(model.vocab)).as("lp"))
}
