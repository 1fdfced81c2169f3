package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Curation-transform building blocks shared by the declared queries
  * (g14/g15/d13, fixed parameters for the DuckDB oracles — which splice
  * the SAME pattern/constant values) and the public facade. One definition
  * per formula; consumers cannot drift.
  */
object Curation {

  /** PII-style patterns — Java-regex / RE2 agreed character classes, used
    * verbatim on BOTH engines (the g15 oracle splices these constants into
    * its SQL). `[^\s]` rather than `[^ ]` for the URL tail: on raw
    * (non-whitespace-normalized) text a bare space class would swallow
    * newlines and the following word.
    */
  val EmailPattern = "[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-zA-Z][a-zA-Z]+"
  val UrlPattern = "https?://[^\\s]+"
  val IpPattern = "[0-9]+\\.[0-9]+\\.[0-9]+\\.[0-9]+"
  val LongTokenPattern = "[a-z]{8,}"

  /** Redaction chain: email → [EMAIL], URL → [URL], IPv4 → [IP], applied
    * in that order; optionally the long-token class → [LONG] (g15's demo
    * extension — the only class that fires on the synthetic fixtures).
    * A narrow map — compose freely.
    */
  def redactPii(c: Column, maskLongTokens: Boolean = false): Column = {
    val base =
      regexp_replace(
        regexp_replace(
          regexp_replace(c, EmailPattern, "[EMAIL]"),
          UrlPattern, "[URL]"),
        IpPattern, "[IP]")
    if (maskLongTokens) regexp_replace(base, LongTokenPattern, "[LONG]") else base
  }

  /** Strided overlapping token windows (id, win_id, n_win_tokens,
    * window_text) — the fixed-size training windows cut after curation.
    * Pure narrow map (sequence → explode, all codegen). Empty/whitespace
    * documents are excluded BEFORE the split (split("", " ") is [""], so a
    * post-split size guard would pass a phantom 1-token window).
    */
  def tokenWindows(docs: DataFrame, idCol: String, textCol: String,
                   size: Int, stride: Int): DataFrame = {
    require(size > 0 && stride > 0, "size and stride must be positive")
    val sz = org.apache.spark.sql.functions.size _
    docs
      .select(col(idCol).as("id"),
        lower(trim(regexp_replace(col(textCol), "\\s+", " "))).as("norm"))
      .filter(length(col("norm")) > 0)
      .select(col("id"), split(col("norm"), " ").as("toks"))
      .select(col("id"), sz(col("toks")).as("n"),
        explode(sequence(lit(0),
          floor((sz(col("toks")) - 1) / stride).cast("int"))).as("win_id"),
        col("toks"))
      .select(col("id"), col("win_id"),
        least(lit(size), col("n") - col("win_id") * stride).cast("int")
          .as("n_win_tokens"),
        concat_ws(" ", slice(col("toks"), col("win_id") * stride + 1, lit(size)))
          .as("window_text"))
  }

  /** DSIR-style importance scores (data selection via importance
    * resampling): per-doc mean log-likelihood ratio of the target-slice
    * unigram LM over the full-corpus LM, add-1 smoothed over the shared
    * vocabulary. `isTarget` marks target-domain rows. Returns
    * (id, n_tokens, dsir_weight) with the weight UNROUNDED — oracle-facing
    * callers round symmetrically themselves. One aggregation pass builds
    * both LMs (conditional sum); the vocabulary-sized LM broadcasts to the
    * scoring join. Empty documents contribute no tokens (and no row).
    * Tokenization is whitespace-split of the normalized text WITHOUT case
    * folding — the same token stream the other unigram-LM queries
    * (g09/g13/g14) score over.
    */
  def dsirScores(docs: DataFrame, idCol: String, textCol: String,
                 isTarget: Column): DataFrame = {
    // tk feeds BOTH the LM aggregation and the scoring join, and lm feeds
    // both the consts aggregate and the broadcast join — without the
    // checkpoints Catalyst re-runs the corpus scan + tokenize once per
    // consumer (three full passes; at 100 TB each is a full corpus read).
    // Materialized: the token stream once, the vocabulary-sized LM once.
    val tk = ScaleOps.checkpointed(docs
      .select(col(idCol).as("id"), isTarget.as("__tgt"),
        trim(regexp_replace(col(textCol), "\\s+", " ")).as("norm"))
      .filter(length(col("norm")) > 0)
      .select(col("id"), col("__tgt"),
        explode(split(col("norm"), " ")).as("tok")))
    val lm = ScaleOps.checkpointed(tk.groupBy("tok").agg(
      count(lit(1)).as("cs"),
      sum(when(col("__tgt"), 1L).otherwise(0L)).as("ct")))
    val consts = broadcast(lm.agg(
      sum("cs").as("ns"), sum("ct").as("nt"), count(lit(1)).as("v")))
    tk.join(broadcast(lm), "tok").crossJoin(consts)
      .groupBy("id")
      .agg(count(lit(1)).as("n_tokens"),
        avg(log((col("ct") + 1).cast("double") / (col("nt") + col("v")))
          - log((col("cs") + 1).cast("double") / (col("ns") + col("v"))))
          .as("dsir_weight"))
  }
}
