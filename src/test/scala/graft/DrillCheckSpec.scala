package graft

import org.scalatest.funsuite.AnyFunSuite

/** The scaling drill's CI guard ([[DrillCheck]]), driven with the
  * project's own MEASURED drill rows: the round-11 run must pass every
  * budget, and the two scale regressions the round-10 drill caught by
  * diligent reading — the flat-IVF quadratic build and a hypothetical
  * quadratic probe — must FAIL a check, so the next one is a red run,
  * not a prose finding. (The third round-10 catch, the id-range
  * block-grid driver OOM, is covered by the drill crashing → nonzero
  * exit before the guard runs; the guard covers the quieter
  * completes-but-slope-broke mode.)
  */
class DrillCheckSpec extends AnyFunSuite {

  private def row(scale: Int, name: String, phase: String, secs: Double) =
    (scale, name, phase, secs, 0L, 0L)

  test("round-11 measured drill rows pass every budget") {
    // transcribed from SCALE_DRILL_r11.jsonl (the committed artifact)
    val measured = Seq(
      row(1, "build:ivf", "cold", 1.32), row(10, "build:ivf", "cold", 5.83),
      row(1, "build:shingle", "cold", 11.10), row(10, "build:shingle", "cold", 2.73),
      row(1, "build:minhash", "cold", 2.15), row(10, "build:minhash", "cold", 1.75),
      row(1, "build:substr", "cold", 4.36), row(10, "build:substr", "cold", 6.84),
      row(1, "retrain:pq", "cold", 2.59), row(10, "retrain:pq", "cold", 4.85),
      row(1, "probe:ivf_knn20", "probe", 0.27), row(10, "probe:ivf_knn20", "probe", 0.67),
      row(1, "x02_jaccard_stats", "probe", 1.57), row(10, "x02_jaccard_stats", "probe", 4.31),
      row(1, "x03_minhash_neardup", "probe", 0.94), row(10, "x03_minhash_neardup", "probe", 1.04),
      row(1, "x06_dup_clusters", "probe", 1.50), row(10, "x06_dup_clusters", "probe", 3.98),
      row(1, "x07_containment", "probe", 3.35), row(10, "x07_containment", "probe", 23.40),
      row(1, "x11_curation_funnel", "probe", 1.71), row(10, "x11_curation_funnel", "probe", 11.08),
      row(1, "x14_funnel_ivf_semantic", "probe", 4.85), row(10, "x14_funnel_ivf_semantic", "probe", 6.82),
      row(1, "x15_exact_substring_dedup", "probe", 0.65), row(10, "x15_exact_substring_dedup", "probe", 1.04),
      row(1, "v18_semdedup", "probe", 1.37), row(10, "v18_semdedup", "probe", 4.00))
    val checks = DrillCheck.evaluate(measured)
    assert(checks.nonEmpty && checks.forall(_.ok),
      s"failed: ${checks.filterNot(_.ok)}")
    // every budgeted pair present actually got checked (none skipped as noise)
    assert(checks.length == 14)
  }

  test("the round-10 flat-IVF quadratic build fails its budget") {
    // round-10 measured the flat O(n·k) assignment at 1.5 s -> 11.6 s for
    // 10x data under autoCells (SCALE.md round-10 final table) — ratio
    // 7.7 passed nothing then because no guard existed; the QUADRATIC
    // signature the guard must catch is the k ∝ n regime where the next
    // decade multiplies per-row cost too: 38x-class at 10x. Both the
    // historical 443-at-100x shape projected back to 10x and any future
    // quadratic reintroduction breach the 25x build budget.
    val quadratic = Seq(
      row(1, "build:ivf", "cold", 1.5), row(10, "build:ivf", "cold", 57.0))
    val checks = DrillCheck.evaluate(quadratic)
    assert(checks.exists(c => c.name == "build:ivf" && !c.ok))
  }

  test("a quadratic probe regression in a store-served family fails") {
    val quadratic = Seq(
      row(1, "x03_minhash_neardup", "probe", 0.9),
      row(10, "x03_minhash_neardup", "probe", 90.0))
    val checks = DrillCheck.evaluate(quadratic)
    assert(checks.exists(c => c.name == "x03_minhash_neardup" && !c.ok))
  }

  test("sub-noise pairs and unguarded names are skipped, never failed") {
    val rows = Seq(
      // both sides under 0.5 s: noise, no signal even at a huge ratio
      row(1, "x03_minhash_neardup", "probe", 0.01),
      row(10, "x03_minhash_neardup", "probe", 0.40),
      // report-only phase/name combinations never produce checks
      row(1, "x03_minhash_neardup", "first", 1.0),
      row(10, "x03_minhash_neardup", "first", 99.0),
      row(1, "some_future_query", "probe", 1.0),
      row(10, "some_future_query", "probe", 99.0))
    assert(DrillCheck.evaluate(rows).isEmpty)
  }

  test("a sub-noise 1x time cannot fabricate a breach (denominator clamp)") {
    // t1 = 0.1 s is below the host-noise floor; t10 = 0.6 s crosses the
    // signal threshold, so the pair IS checked — but the ratio must be
    // computed against the 0.3 s noise floor (0.6/0.3 = 2.0 <= 4), not
    // the raw noise denominator (0.6/0.1 = 6 > 4, a spurious red).
    val rows = Seq(
      row(1, "x03_minhash_neardup", "probe", 0.1),
      row(10, "x03_minhash_neardup", "probe", 0.6))
    val checks = DrillCheck.evaluate(rows)
    assert(checks.length == 1 && checks.head.ok,
      s"noise-floor 1x time produced a spurious breach: $checks")
    assert(math.abs(checks.head.ratio - 2.0) < 1e-9)
  }

  test("a pair missing either scale endpoint is not checked") {
    val rows = Seq(
      row(10, "build:ivf", "cold", 500.0),
      row(100, "build:ivf", "cold", 5000.0))
    assert(DrillCheck.evaluate(rows).isEmpty)
  }
}
