package graft.operators

import org.apache.spark.sql.DataFrame
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
