package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** OrderStats.exactPercentilesByGroup must be BIT-IDENTICAL to the built-in
  * `percentile(value, array(ps))` aggregate (and `median`) — not just close:
  * r38/r71 round their outputs to 4 digits and hash-compare against DuckDB,
  * so a 1-ulp drift at a rounding boundary would flip a hash. The tests
  * sweep randomized corpora (duplicates, tiny groups, integral and
  * fractional interpolation positions, negative values) and compare raw
  * doubles with == — in BOTH physical modes (`window`, the local default,
  * and `distributed`, the funnel-free 100 TB shape).
  */
class OrderStatsSpec extends SparkTestBase {

  private val points = Seq(0.0, 0.25, 0.5, 0.9, 0.99, 1.0)
  private val modes = Seq("window", "distributed")

  private def withMode[T](mode: String)(f: => T): T = {
    val old = spark.conf.getOption(OrderStats.PercentileModeConf)
    spark.conf.set(OrderStats.PercentileModeConf, mode)
    try f finally old match {
      case Some(v) => spark.conf.set(OrderStats.PercentileModeConf, v)
      case None => spark.conf.unset(OrderStats.PercentileModeConf)
    }
  }

  modes.foreach { mode =>
    test(s"[$mode] exactPercentilesByGroup equals the percentile aggregate bit-for-bit") {
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
      withMode(mode) {
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
    }

    test(s"[$mode] nulls are skipped exactly like the aggregate") {
      import spark.implicits._
      val df = Seq(("a", Some(1.0)), ("a", None), ("a", Some(3.0)), ("a", Some(2.0)),
        ("b", Some(7.5)), ("b", None)).toDF("g", "v")
      val expected = df.groupBy("g")
        .agg(expr("percentile(v, array(0.5, 0.75))").as("ps"))
        .collect().map(r => r.getString(0) -> r.getSeq[Double](1)).toMap
      withMode(mode) {
        val got = OrderStats.exactPercentilesByGroup(df, "g", "v", Seq(0.5, 0.75), "ps")
          .collect().map(r => r.getString(0) -> Seq(r.getDouble(1), r.getDouble(2))).toMap
        expected.foreach { case (g, ps) =>
          assert(got(g)(0) == ps(0) && got(g)(1) == ps(1), s"group $g: $got vs $expected")
        }
      }
    }

    test(s"[$mode] all-null groups and null group keys match the aggregate (round-19 fix)") {
      import spark.implicits._
      // group "n" has ONLY null values; the null group key carries values —
      // the aggregate keeps both rows (null percentile for "n"); the
      // round-18 form silently dropped them
      val df = Seq((Some("a"), Some(1.0)), (Some("a"), Some(3.0)),
        (Some("n"), None: Option[Double]), (Some("n"), None),
        (None: Option[String], Some(5.0)), (None, Some(7.0)))
        .toDF("g", "v")
      val expected = df.groupBy("g")
        .agg(expr("percentile(v, array(0.5))").as("ps"))
        .collect().map(r => Option(r.getString(0)) ->
          (if (r.isNullAt(1)) None else Some(r.getSeq[Double](1).head))).toMap
      withMode(mode) {
        val got = OrderStats.exactPercentilesByGroup(df, "g", "v", Seq(0.5), "ps")
          .collect().map(r => Option(r.getString(0)) ->
            (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
        assert(got.keySet == expected.keySet, s"$got vs $expected")
        assert(got == expected, s"$got vs $expected")
      }
    }
  }

  test("[distributed] rank-exact when one group spans many range partitions") {
    import spark.implicits._
    // one giant group forces the compressed rows across partitions, so the
    // two-level cumulative (fragment offsets + local running counts) is
    // actually exercised
    val rnd = new java.util.Random(7)
    val df = (1 to 50000).map(_ => ("g", rnd.nextInt(997).toDouble)).toDF("g", "v")
      .repartition(16)
    val pts = Seq(0.01, 0.5, 0.999)
    val arr = pts.mkString("array(", ", ", ")")
    val exp = df.groupBy("g").agg(expr(s"percentile(v, $arr)").as("ps"))
      .collect().head.getSeq[Double](1)
    withMode("distributed") {
      val got = OrderStats.exactPercentilesByGroup(df, "g", "v", pts, "ps")
        .collect().head
      pts.indices.foreach { i =>
        assert(got.getDouble(i + 1) == exp(i), s"p=${pts(i)}")
      }
    }
  }

  test("window and distributed modes agree row-for-row") {
    import spark.implicits._
    val rnd = new java.util.Random(11)
    val df = (1 to 20000).map { i =>
      (s"g${i % 7}", if (i % 13 == 0) None else Some(rnd.nextInt(200).toDouble))
    }.toDF("g", "v")
    val pts = Seq(0.1, 0.5, 0.95)
    def run(mode: String) = withMode(mode) {
      OrderStats.exactPercentilesByGroup(df, "g", "v", pts, "ps")
        .collect().map(r => r.getString(0) ->
          pts.indices.map(i => r.getDouble(i + 1))).toMap
    }
    assert(run("window") == run("distributed"))
  }
}
