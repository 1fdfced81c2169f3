package graft

import graft.sources.Tables
import org.apache.spark.sql.SparkSession

/** Perf gate (driver contract): run every declared query at the given SF and
  * print one JSON line of per-query seconds. A warmup pass first scans each
  * fixture table and runs one trivial query so JVM/codegen/page-cache warmup
  * isn't charged to whichever query happens to run first.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.expressions.GraftFunctions.register(spark)

    // optional focus filter for local iteration: comma-separated names
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
      .filter(_.nonEmpty)
    val selected = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(_.contains(n)) }
    if (selected.isEmpty) {
      // a typo'd filter must not masquerade as an empty-but-successful run
      System.err.println(
        s"[bench] SPARK_GRAFT_ONLY matched no queries: ${only.getOrElse(Set.empty).mkString(",")}")
      spark.stop()
      sys.exit(2)
    }

    // warmup: touch every table + exercise codegen once
    Tables.all.foreach(n => Tables.load(spark, sfDir, n).count())

    // Per-query MIN over `reps` timed runs (default 3). A single timing
    // charges whatever the OS page cache / JIT felt like that second to the
    // query — round-4 driver tails showed 2-9x phantom "regressions" in
    // families no commit touched, while warm re-runs measured the same
    // plans flat. Min-of-N measures the plan, not the cache.
    val reps = sys.env.get("SPARK_GRAFT_BENCH_REPS")
      .flatMap(_.toIntOption).getOrElse(3).max(1)
    val results = selected.map { case (name, fn) =>
      // A rep that throws must not contribute its wall time to min() — an
      // intermittently fast-failing query would otherwise report the
      // failure's elapsed time as its benchmark number with no error signal.
      val times = (1 to reps).flatMap { _ =>
        val t0 = System.nanoTime()
        val ok = try { fn(spark, sfDir).count(); true }
                 catch { case _: Throwable => false }
        if (ok) Some((System.nanoTime() - t0) / 1e9) else None
      }
      name -> times
    }
    val failed = results.collect { case (n, ts) if ts.isEmpty => n }
    // a query whose every rep failed reports -1 (never a plausible seconds
    // value) and is named in the errors array
    val qs = results.map { case (k, ts) =>
      s"\"" + k + "\":" + (if (ts.nonEmpty) ts.min else -1.0)
    }.mkString("{", ",", "}")
    val total = results.collect { case (_, ts) if ts.nonEmpty => ts.min }.sum
    val errs = failed.map("\"" + _ + "\"").mkString("[", ",", "]")
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"errors":$errs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
