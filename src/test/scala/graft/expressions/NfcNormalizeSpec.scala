package graft.expressions

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Unicode escapes throughout: composed vs decomposed forms are visually
  * identical, so literal glyphs in source would be ambiguous (and at the
  * mercy of editor normalization).
  */
class NfcNormalizeSpec extends SparkTestBase {

  private val composedE = "\u00e9"            // U+00E9, NFC e-acute
  private val decomposedE = "\u0065\u0301"     // e + combining acute
  private val composedS = "\u1e69"            // U+1E69 s with dot below+above
  private val decomposedS = "\u0073\u0323\u0307" // decomposed form of the same

  test("composes combining sequences, identity on already-NFC text") {
    import spark.implicits._
    GraftFunctions.register(spark)
    val rows = Seq(
      decomposedE + "clair",
      composedE + "clair",
      "\u0041\u030a",                        // A + combining ring -> U+00C5
      "plain ascii",
      composedS,
      decomposedS
    ).toDF("s")
    val out = rows.select(
        GraftFunctions.nfc_normalize(col("s")).as("n"),
        length(col("s")).as("raw_len"),
        length(GraftFunctions.nfc_normalize(col("s"))).as("n_len"))
      .collect()
    assert(out(0).getString(0) == composedE + "clair" && out(0).getInt(2) == 6)
    assert(out(1).getString(0) == composedE + "clair")
    assert(out(2).getString(0) == "\u00c5" && out(2).getInt(2) == 1)
    assert(out(3).getString(0) == "plain ascii")
    assert(out(4).getString(0) == composedS)
    assert(out(5).getString(0) == composedS, "decomposed s+dots must compose")
  }

  test("null-safe, SQL-registered, and equal under canonical equivalence hashing") {
    import spark.implicits._
    GraftFunctions.register(spark)
    val df = Seq(("a", composedE), ("b", decomposedE), ("c", null))
      .toDF("id", "s")
    df.createOrReplaceTempView("nfc_probe")
    val hashed = spark.sql(
      "SELECT id, md5(nfc_normalize(s)) AS h FROM nfc_probe ORDER BY id").collect()
    assert(hashed(0).getString(1) == hashed(1).getString(1),
      "canonically-equal strings must hash equal after NFC")
    assert(hashed(2).isNullAt(1))
  }
}
