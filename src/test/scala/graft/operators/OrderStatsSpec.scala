package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** OrderStats.exactPercentilesByGroup must be BIT-IDENTICAL to the built-in
  * `percentile(value, array(ps))` aggregate (and `median`) — not just close:
  * r38/r71 round their outputs to 4 digits and hash-compare against DuckDB,
  * so a 1-ulp drift at a rounding boundary would flip a hash. The test
  * sweeps randomized corpora (duplicates, tiny groups, integral and
  * fractional interpolation positions, negative values) and compares raw
  * doubles with ==.
  */
class OrderStatsSpec extends SparkTestBase {

  private val points = Seq(0.0, 0.25, 0.5, 0.9, 0.99, 1.0)

  test("exactPercentilesByGroup equals the percentile aggregate bit-for-bit") {
    import spark.implicits._
    val rnd = new java.util.Random(42)
    // groups of size 1, 2, 3, 5, 40, 1000; heavy duplication in some groups
    val rows = Seq.newBuilder[(String, Double)]
    val sizes = Seq("a" -> 1, "b" -> 2, "c" -> 3, "d" -> 5, "e" -> 40, "f" -> 1000)
    sizes.foreach { case (g, n) =>
      (1 to n).foreach { _ =>
        val v =
          if (g == "e") (rnd.nextInt(5) + 1).toDouble // many ties
          else rnd.nextDouble() * 2000 - 1000
        rows += ((g, v))
      }
    }
    val df = rows.result().toDF("g", "v")
    val arr = points.mkString("array(", ", ", ")")
    val expected = df.groupBy("g")
      .agg(expr(s"percentile(v, $arr)").as("ps"), expr("median(v)").as("med"))
      .collect().map(r => r.getString(0) ->
        (r.getSeq[Double](1), r.getDouble(2))).toMap
    val gotP = OrderStats.exactPercentilesByGroup(df, "g", "v", points, "ps")
      .collect().map(r => r.getString(0) ->
        points.indices.map(i => r.getDouble(i + 1))).toMap
    val gotM = OrderStats.exactPercentileByGroup(df, "g", "v", 0.5, "med")
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(gotP.keySet == expected.keySet && gotM.keySet == expected.keySet)
    expected.foreach { case (g, (ps, med)) =>
      points.indices.foreach { i =>
        assert(gotP(g)(i) == ps(i),
          s"group $g p=${points(i)}: got ${gotP(g)(i)}, aggregate says ${ps(i)}")
      }
      assert(gotM(g) == med, s"group $g median: got ${gotM(g)}, aggregate says $med")
    }
  }

  test("nulls are skipped exactly like the aggregate") {
    import spark.implicits._
    val df = Seq(("a", Some(1.0)), ("a", None), ("a", Some(3.0)), ("a", Some(2.0)),
      ("b", Some(7.5)), ("b", None)).toDF("g", "v")
    val expected = df.groupBy("g")
      .agg(expr("percentile(v, array(0.5, 0.75))").as("ps"))
      .collect().map(r => r.getString(0) -> r.getSeq[Double](1)).toMap
    val got = OrderStats.exactPercentilesByGroup(df, "g", "v", Seq(0.5, 0.75), "ps")
      .collect().map(r => r.getString(0) -> Seq(r.getDouble(1), r.getDouble(2))).toMap
    expected.foreach { case (g, ps) =>
      assert(got(g)(0) == ps(0) && got(g)(1) == ps(1), s"group $g: $got vs $expected")
    }
  }
}
