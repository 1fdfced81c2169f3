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

  private def full(scale: Int, name: String, phase: String, secs: Double,
                   in: Long, sh: Long) = (scale, name, phase, secs, in, sh)

  test("round-11 measured drill rows pass every budget (time + counters)") {
    // transcribed VERBATIM from SCALE_DRILL_r11.jsonl (the committed
    // artifact): times AND work counters, so this pins the whole policy —
    // time budgets, rows_in budget, per-name shuffle budgets, and the
    // MinCounterBase skip rule — against real measured data.
    val measured = Seq(
      full(1, "build:shingle", "cold", 7.759, 525776L, 98344L),
      full(10, "build:shingle", "cold", 3.036, 5257760L, 1152547L),
      full(1, "build:minhash", "cold", 1.720, 10000L, 0L),
      full(10, "build:minhash", "cold", 1.875, 100000L, 0L),
      full(1, "build:substr", "cold", 3.638, 486408L, 703323L),
      full(10, "build:substr", "cold", 7.625, 4864080L, 7056649L),
      full(1, "build:ivf", "cold", 1.465, 6000L, 18L),
      full(10, "build:ivf", "cold", 5.825, 60000L, 162L),
      full(1, "retrain:pq", "cold", 2.989, 28012L, 5912L),
      full(10, "retrain:pq", "cold", 10.491, 280024L, 86558L),
      full(1, "probe:ivf_knn20", "probe", 0.321, 2016L, 1160L),
      full(10, "probe:ivf_knn20", "probe", 0.751, 10293L, 1660L),
      full(1, "x02_jaccard_stats", "probe", 1.380, 1041552L, 1135544L),
      full(10, "x02_jaccard_stats", "probe", 4.531, 7811640L, 15041902L),
      full(1, "x03_minhash_neardup", "probe", 0.551, 165000L, 516L),
      full(10, "x03_minhash_neardup", "probe", 1.087, 1650000L, 57728L),
      full(1, "x06_dup_clusters", "probe", 1.428, 4978L, 5362L),
      full(10, "x06_dup_clusters", "probe", 1.075, 49771L, 53593L),
      full(1, "x07_containment", "probe", 3.332, 1083765L, 265900L),
      full(10, "x07_containment", "probe", 22.506, 10837650L, 15876130L),
      full(1, "x11_curation_funnel", "probe", 2.053, 41953L, 29125L),
      full(10, "x11_curation_funnel", "probe", 11.772, 260653L, 121431L),
      full(1, "x14_funnel_ivf_semantic", "probe", 3.897, 52536L, 29564L),
      full(10, "x14_funnel_ivf_semantic", "probe", 6.907, 306893L, 127972L),
      full(1, "x15_exact_substring_dedup", "probe", 0.565, 251237L, 59764L),
      full(10, "x15_exact_substring_dedup", "probe", 1.153, 2512370L, 597640L),
      full(1, "v18_semdedup", "probe", 1.629, 10354L, 256L),
      full(10, "v18_semdedup", "probe", 4.733, 113608L, 7435L))
    val checks = DrillCheck.evaluate(measured)
    assert(checks.nonEmpty && checks.forall(_.ok),
      s"failed: ${checks.filterNot(_.ok)}")
    // 14 time checks (every budgeted pair carries signal), 7 rows_in
    // checks (1x base >= MinCounterBase), 5 shuffle checks (named budget
    // AND base over the floor) — x03's 112x shuffle ratio on its 516-row
    // base is SKIPPED by the floor, not budgeted around (root-caused as
    // a broadcast->SMJ plan transition, SCALE.md round-11)
    assert(checks.count(!_.name.contains("#")) == 14)
    assert(checks.count(_.name.endsWith("#rows_in")) == 7)
    assert(checks.count(_.name.endsWith("#shuffle")) == 5)
    assert(!checks.exists(_.name == "x03_minhash_neardup#shuffle"))
  }

  test("round-14 measured rows (permutation generator + sharded IVF) pass every budget") {
    // transcribed from the round-14 drill under the PERMUTATION corpus
    // generator (SCALE_DRILL_r14.jsonl): the new sharded-IVF lifecycle
    // rows, and x02 whose shuffle slope is now exactly linear
    val measured = Seq(
      full(1, "build:ivf_sharded", "cold", 1.583, 10000L, 4072L),
      full(10, "build:ivf_sharded", "cold", 3.209, 100000L, 40167L),
      full(1, "probe:ivf_sharded", "probe", 0.802, 2064L, 2950L),
      full(10, "probe:ivf_sharded", "probe", 1.163, 17819L, 2630L),
      full(1, "x02_jaccard_stats", "probe", 1.356, 260388L, 1585089L),
      full(10, "x02_jaccard_stats", "probe", 6.323, 2603880L, 16495017L))
    val checks = DrillCheck.evaluate(measured)
    assert(checks.nonEmpty && checks.forall(_.ok), s"failed: ${checks.filterNot(_.ok)}")
    // x02's shuffle ratio under the permutation generator is exactly
    // linear (10.41 measured) — the tightened 21x budget (~2x measured,
    // the stated policy) keeps headroom for plan transitions while the
    // old rotation generator's quadratic collision class (df ∝ scale/10)
    // or a reintroduced inter-sizes join would still breach it at 100x
    val x02sh = checks.find(_.name == "x02_jaccard_stats#shuffle").get
    assert(math.abs(x02sh.ratio - 10.41) < 0.1 && x02sh.budget == 21.0)
  }

  test("round-14 calibration row is time-budgeted at the build class") {
    // transcribed from SCALE_DRILL_r14.jsonl: one exact panel pass
    // (Θ(panel·n)) + a broadcast rank join — linear; the counter checks
    // auto-skip on the 1x base (6,064 and 10,256 both < MinCounterBase)
    val measured = Seq(
      full(1, "calibrate:ivf_sharded", "cold", 3.020, 6064L, 10256L),
      full(10, "calibrate:ivf_sharded", "cold", 3.767, 60159L, 10274L))
    val checks = DrillCheck.evaluate(measured)
    assert(checks.nonEmpty && checks.forall(_.ok), s"failed: ${checks.filterNot(_.ok)}")
    val t = checks.find(_.name == "calibrate:ivf_sharded").get
    assert(t.budget == 25.0 && t.ratio < 2.0, s"measured 1.25x, got ${t.ratio}")
    assert(!checks.exists(_.name.contains("#")),
      "sub-floor 1x counters must auto-skip, not fabricate ratio checks")
  }

  test("round-15 reshard and PQ-calibration rows are budgeted at the build class") {
    // reshard = re-tag + S' pruned rebuilds (build:ivf_sharded work
    // class); calibrate:pq = one ADC pass + one exact panel pass. Both
    // linear, both guarded at the 25x build budget; a quadratic reshard
    // (a per-shard corpus rescan) would breach it loudly.
    val linear = Seq(
      full(1, "reshard:ivf_sharded", "cold", 2.0, 60000L, 60000L),
      full(10, "reshard:ivf_sharded", "cold", 8.0, 600000L, 620000L),
      full(1, "calibrate:pq", "cold", 3.0, 30000L, 10000L),
      full(10, "calibrate:pq", "cold", 9.0, 300000L, 10000L))
    val checks = DrillCheck.evaluate(linear)
    assert(checks.nonEmpty && checks.forall(_.ok), s"failed: ${checks.filterNot(_.ok)}")
    assert(checks.find(_.name == "reshard:ivf_sharded").get.budget == 25.0)
    assert(checks.find(_.name == "calibrate:pq").get.budget == 25.0)
    assert(checks.find(_.name == "reshard:ivf_sharded#shuffle").get.budget == 25.0)
    val quadratic = Seq(
      row(1, "reshard:ivf_sharded", "cold", 2.0),
      row(10, "reshard:ivf_sharded", "cold", 120.0))
    assert(DrillCheck.evaluate(quadratic).exists(c =>
      c.name == "reshard:ivf_sharded" && !c.ok))
  }

  test("counter check catches a superlinear regression the time clamp masks") {
    // t1 = 0.1 s sits under the noise-floor clamp, so a real ~50x slope
    // reads as time ratio 1.1/0.3 = 3.7, inside x02's 7x budget — the
    // exact masking window the round-12 ADVICE named. The shuffle counter
    // (noise-free, 50x on a 100k base) must catch it.
    val rows = Seq(
      full(1, "x02_jaccard_stats", "probe", 0.1, 1000000L, 100000L),
      full(10, "x02_jaccard_stats", "probe", 1.1, 10000000L, 5000000L))
    val checks = DrillCheck.evaluate(rows)
    val time = checks.find(_.name == "x02_jaccard_stats").get
    assert(time.ok, "premise: the clamped time ratio passes")
    val shuffle = checks.find(_.name == "x02_jaccard_stats#shuffle").get
    assert(!shuffle.ok && math.abs(shuffle.ratio - 50.0) < 1e-9)
  }

  test("a rescanned-corpus regression fails the rows_in budget") {
    val rows = Seq(
      full(1, "x15_exact_substring_dedup", "probe", 0.4, 250000L, 60000L),
      full(10, "x15_exact_substring_dedup", "probe", 1.2, 25000000L, 600000L))
    val checks = DrillCheck.evaluate(rows)
    val rowsIn = checks.find(_.name == "x15_exact_substring_dedup#rows_in").get
    assert(!rowsIn.ok && math.abs(rowsIn.ratio - 100.0) < 1e-9)
  }

  test("counter checks skip sub-floor bases (plan-transition regime)") {
    // a 516-row 1x shuffle base is a broadcast-dominated plan; its 10x
    // ratio measures a legitimate plan transition, so no shuffle check
    val rows = Seq(
      full(1, "x02_jaccard_stats", "probe", 1.0, 40000L, 516L),
      full(10, "x02_jaccard_stats", "probe", 3.0, 400000L, 57728L))
    val checks = DrillCheck.evaluate(rows)
    assert(checks.exists(_.name == "x02_jaccard_stats")) // time still checked
    assert(!checks.exists(_.name.contains("#")))
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

  test("the 100x catch-up absolute gate passes the measured journal path and fails the pre-journal anti-join") {
    // both sides transcribed VERBATIM from the committed artifacts:
    // SCALE_DRILL_r17_catchup100.jsonl (journal path, this HEAD) and
    // SCALE_DRILL_r16_100x_prejournal.jsonl (the corpus-shaped replay
    // the journal replaced) — the gate must separate the two regimes
    val journal = Seq(
      full(100, "reshard:ivf_catchup_build", "cold", 30.737, 1000008L, 401593L),
      full(100, "reshard:ivf_catchup_replay", "replay", 60.972, 1851589L, 1000165L))
    val ok = DrillCheck.catchupAbsolute(journal, 100)
    assert(ok.exists(c => c.ok && c.ratio < 2.0), s"journal path: $ok")
    val prejournal = Seq(
      full(100, "reshard:ivf_catchup_build", "cold", 36.418, 1000000L, 401585L),
      full(100, "reshard:ivf_catchup_replay", "replay", 128.462, 8251569L, 2850060L))
    val bad = DrillCheck.catchupAbsolute(prejournal, 100)
    assert(bad.exists(c => !c.ok && c.ratio > 8.0),
      s"the pre-journal corpus re-read must breach: $bad")
    // missing either row at the scale: no check, never a false pass
    assert(DrillCheck.catchupAbsolute(journal.take(1), 100).isEmpty)
    assert(DrillCheck.catchupAbsolute(journal, 10).isEmpty)
  }

  test("a pair missing either scale endpoint is not checked") {
    val rows = Seq(
      row(10, "build:ivf", "cold", 500.0),
      row(100, "build:ivf", "cold", 5000.0))
    assert(DrillCheck.evaluate(rows).isEmpty)
  }
}
