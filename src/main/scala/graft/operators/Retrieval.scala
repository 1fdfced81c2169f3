package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Ranked-retrieval building blocks shared by the declared queries
  * (KeywordQueries k01/k02, fixed parameters for the DuckDB oracle) and the
  * public facade (Graft.bm25TopK, caller parameters). ONE definition of the
  * scoring formula — a fix here reaches both consumers, so they cannot
  * drift (the same discipline as the spliced oracle constants).
  *
  * Scale posture (see k01's notes): postings are filtered to the query
  * terms BEFORE the tf shuffle, corpus stats and the df table are
  * broadcast, and the final top-k is always a TakeOrderedAndProject.
  */
object Retrieval {

  val DefaultK1 = 1.2
  val DefaultB = 0.75

  /** Per-modality candidate-list bound for rank fusion. RRF fuses top-N
    * retrieval LISTS, not corpus-wide rankings: each modality is cut to at
    * most this many candidates by a TakeOrderedAndProject (per-partition
    * top-N + driver merge) BEFORE any rank window runs, so the global
    * row_number sorts a constant-size frame — never the corpus. 100k is
    * ≥ 50× every test corpus (2k embeddings at sf0.1), so ranks over the
    * bounded list equal the unbounded ranks at every oracle SF, and is far
    * above any k a fusion consumer requests.
    *
    * Cost note: TakeOrderedAndProject merges numPartitions × limit rows at
    * the driver. At 100k × a few hundred partitions that is tens of MB of
    * (id, score) pairs — acceptable; if this limit is ever raised to
    * millions, switch [[topNRanks]] to a two-stage top-N (per-partition
    * sortWithinPartitions+limit, repartition(1), final limit) so the driver
    * never materializes the merge. The k02 verify path guards the OTHER
    * failure mode (corpus growing past the limit → silent oracle
    * divergence) with an explicit count check.
    */
  val RrfCandidateLimit = 100000

  /** (id, rank) for the top-`n` of a score frame: descending score, id
    * tie-break. The orderBy+limit runs FIRST (TakeOrderedAndProject), so the
    * unpartitioned rank window only ever sees ≤ n rows — the k02 scale fix.
    */
  def topNRanks(scored: DataFrame, scoreCol: String, idCol: String,
                n: Int, rankName: String): DataFrame = {
    val bounded = scored
      .select(col(idCol).as("id"), col(scoreCol).cast("double").as("__s"))
      .orderBy(desc("__s"), col("id")).limit(n)
    bounded
      .withColumn(rankName, row_number().over(Window.orderBy(desc("__s"), col("id"))))
      .select(col("id"), col(rankName))
  }

  /** Reciprocal-rank fusion of two score frames (each with an `id` column):
    * every modality is bounded to its top-`candidateLimit` list, ranked
    * within the list, and fused by 1/(rrfK + rank) per side; an id missing
    * from one list contributes EXACTLY 0.0 from that side (its rank column
    * stays null). Output: (id, rank_a, rank_b, rrf), top-k by fused score.
    */
  def rrfFuse(a: DataFrame, scoreColA: String,
              b: DataFrame, scoreColB: String,
              k: Int, rrfK: Int = 60,
              candidateLimit: Int = RrfCandidateLimit): DataFrame = {
    val ra = topNRanks(a, scoreColA, "id", candidateLimit, "rank_a")
    val rb = topNRanks(b, scoreColB, "id", candidateLimit, "rank_b")
    ra.join(rb, Seq("id"), "full")
      .withColumn("rrf",
        coalesce(lit(1.0) / (lit(rrfK) + col("rank_a")), lit(0.0)) +
          coalesce(lit(1.0) / (lit(rrfK) + col("rank_b")), lit(0.0)))
      .orderBy(desc("rrf"), col("id"))
      .limit(k)
  }

  /** Per-(doc, term) Okapi BM25 contribution `c` with Lucene's smoothed idf
    * ln(1 + (N-df+0.5)/(df+0.5)) (positive at any df). Tokenization:
    * whitespace split of the lowercased, whitespace-normalized text.
    * Returns (id, c).
    */
  def bm25Contrib(docs: DataFrame, idCol: String, textCol: String,
                  terms: Seq[String],
                  k1: Double = DefaultK1, b: Double = DefaultB): DataFrame = {
    require(terms.nonEmpty, "terms must be non-empty")
    val base = docs
      .select(col(idCol).as("id"),
        lower(trim(regexp_replace(col(textCol), "\\s+", " "))).as("norm"))
      .withColumn("dl", size(split(col("norm"), " ")))
    // corpus stats: single row, broadcast (exact: long sum / count)
    val stats = broadcast(base.agg(
      count(lit(1)).cast("double").as("n_docs"), avg(col("dl")).as("avgdl")))
    // postings restricted to the query terms BEFORE the tf shuffle
    val tf = base
      .select(col("id"), col("dl"), explode(split(col("norm"), " ")).as("tok"))
      .filter(col("tok").isin(terms: _*))
      .groupBy("id", "dl", "tok").agg(count(lit(1)).as("tf"))
    val df = tf.groupBy("tok").agg(count(lit(1)).as("df"))
    tf.join(broadcast(df), "tok").crossJoin(stats)
      .withColumn("idf", log(lit(1.0) +
        (col("n_docs") - col("df") + 0.5) / (col("df") + 0.5)))
      .select(col("id"), (col("idf") * (col("tf") * (k1 + 1)) /
        (col("tf") + lit(k1) * (lit(1 - b) + lit(b) * col("dl") / col("avgdl")))).as("c"))
  }

  /** Ranked BM25 top-k: (id, n_terms, score), descending score with id
    * tie-break.
    */
  def bm25TopK(docs: DataFrame, idCol: String, textCol: String,
               terms: Seq[String], k: Int,
               k1: Double = DefaultK1, b: Double = DefaultB): DataFrame =
    bm25Contrib(docs, idCol, textCol, terms, k1, b)
      .groupBy("id")
      .agg(count(lit(1)).cast("int").as("n_terms"), sum("c").as("score"))
      .orderBy(desc("score"), col("id"))
      .limit(k)
}
