package graft.text

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Hand-computed contract for the add-one bigram LM (g16's engine side):
  * exact smoothed probabilities on a tiny corpus, uniform OOV handling,
  * conditional normalization, and the no-bigram edge.
  *
  * Train doc "a b a c" → bigrams (a,b),(b,a),(a,c); prefix counts a→2,
  * b→1; V = |{b,a,c}| + 1 = 4.
  */
class NgramLmSpec extends SparkTestBase {

  import spark.implicits._

  private def toksDf(rows: (Long, String)*) =
    rows.toSeq.toDF("doc_id", "text")
      .select(col("doc_id"), split(col("text"), " ").as("toks"))

  private lazy val model =
    NgramLm.train(NgramLm.bigrams(toksDf(1L -> "a b a c"), "doc_id", "toks"))

  test("bigrams are the ordered adjacent pairs, built without a self-join") {
    val bg = NgramLm.bigrams(toksDf(1L -> "x y z"), "doc_id", "toks")
    assert(bg.select("t1", "t2").as[(String, String)].collect().toSeq ==
      Seq("x" -> "y", "y" -> "z"))
    assert(!bg.queryExecution.executedPlan.toString.contains("Join"))
  }

  test("train: pair counts, prefix counts, +1-OOV vocab") {
    assert(model.vocab == 4L)
    assert(model.pairCounts.count() == 3)
    val pfx = model.prefixCounts.as[(String, Long)].collect().toMap
    assert(pfx == Map("a" -> 2L, "b" -> 1L))
  }

  test("score matches the hand computation, including an unseen pair") {
    // "a b z": p(b|a) = (1+1)/(2+4), p(z|b) = (0+1)/(1+4)
    val bg = NgramLm.bigrams(toksDf(7L -> "a b z"), "doc_id", "toks")
    val row = NgramLm.score(bg, model, "doc_id").head
    assert(row.getAs[Long]("n_bigrams") == 2L)
    val expected = (math.log(2.0 / 6.0) + math.log(1.0 / 5.0)) / 2.0
    assert(math.abs(row.getAs[Double]("lp") - expected) < 1e-12)
  }

  test("OOV prefix gets the uniform 1/V mass from the same formula") {
    val bg = NgramLm.bigrams(toksDf(8L -> "z q"), "doc_id", "toks")
    val row = NgramLm.score(bg, model, "doc_id").head
    assert(math.abs(row.getAs[Double]("lp") - math.log(1.0 / 4.0)) < 1e-12)
  }

  test("smoothed conditionals normalize over the V-slot successor space") {
    // prefix "a": observed successors get (c2+1), the V-2 unobserved
    // slots get 1 each → total mass (c1 + V)/(c1 + V) = 1
    val observed = model.pairCounts.filter(col("t1") === "a")
      .agg(sum(col("c2") + 1), count(lit(1))).head
    val massNum = observed.getLong(0) + (model.vocab - observed.getLong(1))
    val c1 = 2L
    assert(massNum == c1 + model.vocab)
  }

  test("single-token docs are unscorable: no bigram, no row") {
    val bg = NgramLm.bigrams(toksDf(9L -> "a"), "doc_id", "toks")
    assert(NgramLm.score(bg, model, "doc_id").count() == 0)
  }
}
