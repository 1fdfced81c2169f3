package graft.text

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Hand-computed contract for the add-one multinomial NB (g17's engine
  * side). Train: doc1 (label 1) "a a b", doc2 (label 0) "a c" →
  * counts a(2,1) b(1,0) c(0,1), nPass=3, nFail=2, V=4, prior ln(1/1)=0.
  */
class NaiveBayesSpec extends SparkTestBase {

  import spark.implicits._

  private def toks(rows: (Long, String)*) =
    rows.toSeq.toDF("doc_id", "text")
      .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))

  private lazy val model = NaiveBayes.train(
    toks(1L -> "a a b", 2L -> "a c"),
    Seq((1L, 1), (2L, 0)).toDF("doc_id", "label"), "doc_id")

  test("train: per-class token counts, totals, +1-OOV vocab, prior") {
    assert((model.nPass, model.nFail, model.vocab) == ((3L, 2L, 4L)))
    assert(model.logPriorRatio == 0.0)
    val c = model.counts.as[(String, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(c == Map("a" -> ((2L, 1L)), "b" -> ((1L, 0L)), "c" -> ((0L, 1L))))
  }

  test("score matches the hand computation, unseen token included") {
    val row = NaiveBayes.score(toks(9L -> "a b z"), model, "doc_id").head
    assert(row.getAs[Long]("n_tokens") == 3L)
    val expected =
      (math.log(3.0 / 7) - math.log(2.0 / 6)) +
      (math.log(2.0 / 7) - math.log(1.0 / 6)) +
      (math.log(1.0 / 7) - math.log(1.0 / 6))
    assert(math.abs(row.getAs[Double]("margin") - expected) < 1e-12)
  }

  test("an all-OOV doc scores the pure smoothing-mass ratio") {
    val row = NaiveBayes.score(toks(8L -> "z z"), model, "doc_id").head
    val perTok = math.log(1.0 / 7) - math.log(1.0 / 6)
    assert(math.abs(row.getAs[Double]("margin") - 2 * perTok) < 1e-12)
  }

  test("unbalanced labels shift every margin by exactly the prior ratio") {
    val m2 = NaiveBayes.train(
      toks(1L -> "a a b", 2L -> "a c"),
      Seq((1L, 1), (2L, 0), (3L, 1)).toDF("doc_id", "label"), "doc_id")
    // doc 3 has no tokens, so counts are unchanged — only the prior moves
    assert(math.abs(m2.logPriorRatio - math.log(2.0)) < 1e-15)
    val base = NaiveBayes.score(toks(9L -> "a b"), model, "doc_id")
      .head.getAs[Double]("margin")
    val shifted = NaiveBayes.score(toks(9L -> "a b"), m2, "doc_id")
      .head.getAs[Double]("margin")
    assert(math.abs(shifted - (base + math.log(2.0))) < 1e-12)
  }
}
