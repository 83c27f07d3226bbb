package graft

import org.scalatest.funsuite.AnyFunSuite

/** The bench tripwire the r10 artifact slipped past: a burst that hits
  * a timed entry but misses every memory probe leaves the sweep
  * "clean" while its kNN phase reads 5-19x slow. The steady
  * re-execution is the same-sweep control that catches it — these are
  * the committed r10 numbers fed back in, asserted REJECTED. */
class BenchConsistencySpec extends AnyFunSuite {

  test("the committed r10 contaminated sweep is rejected") {
    // cold numbers from the checked-in BENCH_r10.json (the sweep the
    // judge flagged: certified clean, 5-19x slow on the kNN phase)
    val wall = Map(
      "b5_knn_join_grid" -> 15.93,
      "b5_knn_join_zorder" -> 9.24,
      "b5_knn_join_pivot" -> 31.99,
      "b5s_knn_join_skew_grid" -> 16.43,
      "b5s_knn_join_skew_pivot" -> 8.01,
      "b6v_knn_join_vec_pivot" -> 7.43)
    val steady = Map(
      "b5_knn_join_grid" -> 1.717,
      "b5_knn_join_zorder" -> 1.781,
      "b5_knn_join_pivot" -> 3.161,
      "b5s_knn_join_skew_grid" -> 3.270,
      "b5s_knn_join_skew_pivot" -> 4.429,
      "b6v_knn_join_vec_pivot" -> 3.479)
    val v = Bench.coldSteadyViolations(wall, steady)
    assert(v.nonEmpty, "the r10 contaminated sweep must read dirty")
    assert(v.exists(_.contains("b5_knn_join_pivot")),
      s"the 10x pivot entry must be named: $v")
  }

  test("the committed r11 post-retry sweep is rejected at the tightened cap") {
    // the checked-in BENCH_r11.json's third attempt (after two
    // auto-rejected ones) shipped b5s_knn_join_skew_grid at 12.98 s
    // cold beside its own 3.42 s steady — 3.80x, sliding just under
    // the 4x first-attempt bar; the judge's clean re-run read 4.73 s.
    // After ANY rejected attempt the cap drops to 3x, so this exact
    // sweep must now read dirty.
    val wall = Map("b5s_knn_join_skew_grid" -> 12.98)
    val steady = Map("b5s_knn_join_skew_grid" -> 3.42)
    assert(Bench.coldSteadyViolations(wall, steady,
      Bench.firstColdSteadyCap).isEmpty,
      "3.80x is under the first-attempt bar by design — the defect was " +
        "applying that bar to a RETRY")
    val v = Bench.coldSteadyViolations(wall, steady, Bench.retryColdSteadyCap)
    assert(v.nonEmpty && v.exists(_.contains("b5s_knn_join_skew_grid")),
      s"the r11 post-retry sweep must be rejected at the 3x retry cap: $v")
  }

  test("a clean sweep at the historical cold/steady ratios passes") {
    // the judge's clean re-run band: ratios 0.93-1.64
    val wall = Map(
      "b5_knn_join_grid" -> 2.777,
      "b5_knn_join_zorder" -> 2.510,
      "b5_knn_join_pivot" -> 2.696,
      "b5s_knn_join_skew_grid" -> 3.474,
      "b5s_knn_join_skew_pivot" -> 4.937,
      "b6v_knn_join_vec_pivot" -> 3.703)
    val steady = Map(
      "b5_knn_join_grid" -> 1.723,
      "b5_knn_join_zorder" -> 1.529,
      "b5_knn_join_pivot" -> 2.354,
      "b5s_knn_join_skew_grid" -> 3.031,
      "b5s_knn_join_skew_pivot" -> 5.333,
      "b6v_knn_join_vec_pivot" -> 3.878)
    assert(Bench.coldSteadyViolations(wall, steady).isEmpty)
  }

  test("tiny steady denominators (small-sf smoke) are not flagged") {
    // at sf0.001 a 0.2 s steady under a 2 s cold is first-run JIT, not
    // contamination — the ratio rule must not self-dirty smoke runs
    val wall = Map("b5_knn_join_grid" -> 2.0)
    val steady = Map("b5_knn_join_grid" -> 0.2)
    assert(Bench.coldSteadyViolations(wall, steady).isEmpty)
  }

  test("a missing cold entry cannot trip the rule") {
    assert(Bench.coldSteadyViolations(
      Map.empty[String, Double], Map("b5_knn_join_grid" -> 2.0)).isEmpty)
  }

  test("the committed r12 persistently-contaminated sweep is rejected " +
    "by the steady-band rule") {
    // the checked-in BENCH_r12.json shipped b5s_knn_join_skew_grid at
    // 11.79 s cold / 11.91 s steady with `attempts: []`: contamination
    // uniform through one phase satisfies the cold/steady RATIO rule by
    // construction (11.79/11.91 = 0.99x) and the phase probes read
    // under the 0.7 bar. The steady reading against its own recorded
    // band is the control with no such blind spot.
    val steady = Map(
      "b5_knn_join_grid" -> 2.311,
      "b5_knn_join_zorder" -> 2.384,
      "b5_knn_join_pivot" -> 3.450,
      "b5s_knn_join_skew_grid" -> 11.910,
      "b5s_knn_join_skew_pivot" -> 6.343,
      "b6v_knn_join_vec_pivot" -> 4.336)
    // the ratio rule alone passes this sweep — the r12 hole
    val wall = Map(
      "b5_knn_join_grid" -> 3.21, "b5_knn_join_zorder" -> 2.92,
      "b5_knn_join_pivot" -> 5.12, "b5s_knn_join_skew_grid" -> 11.79,
      "b5s_knn_join_skew_pivot" -> 19.14, "b6v_knn_join_vec_pivot" -> 3.78)
    assert(Bench.coldSteadyViolations(wall, steady,
      Bench.firstColdSteadyCap).isEmpty,
      "the whole sweep passes the first-attempt ratio rule: skew_pivot " +
        "19.14/6.34 = 3.02x slid under the 4x bar and skew_grid " +
        "11.79/11.91 = 0.99x is invisible by construction — the r12 hole")
    val v = Bench.steadyBandViolations(steady, "/root/testdata/sf0.1")
    assert(v.nonEmpty && v.exists(_.contains("b5s_knn_join_skew_grid")),
      s"the steady-band rule must name the persistently dirty entry: $v")
  }

  test("steady-band rule: judge-clean steady readings pass; " +
    "only the banded scale factor is gated") {
    // r12 judge-clean steady set — every entry inside its band
    val clean = Map(
      "b5_knn_join_grid" -> 2.32, "b5_knn_join_zorder" -> 2.04,
      "b5_knn_join_pivot" -> 2.97, "b5s_knn_join_skew_grid" -> 4.20,
      "b5s_knn_join_skew_pivot" -> 6.10, "b6v_knn_join_vec_pivot" -> 3.92)
    assert(Bench.steadyBandViolations(clean, "/root/testdata/sf0.1").isEmpty)
    // a smoke run at another sf never trips the sf0.1 bands
    val big = Map("b5_knn_join_grid" -> 99.0)
    assert(Bench.steadyBandViolations(big, "/root/testdata/sf0.01").isEmpty)
    assert(Bench.steadyBandViolations(big, "/root/testdata/sf0.1").nonEmpty)
    // an entry without a recorded band cannot trip the rule
    assert(Bench.steadyBandViolations(
      Map("b_new_entry" -> 99.0), "/root/testdata/sf0.1").isEmpty)
  }

  test("cold-band rule: the r14 addenda bands gate the shape/high-d " +
    "joins; in-band colds and other scale factors pass") {
    // r14 driver colds all inside their recorded bands
    val clean = Map(
      "b4sh_shape_distance_join" -> 1.9, "b5sh_shape_knn_join" -> 4.24,
      "b5hd_knn_join_4d_auto" -> 6.46)
    assert(Bench.coldBandViolations(clean, "/root/testdata/sf0.1").isEmpty)
    // a 2x regression in a newest join now trips (1.5x the band's
    // upper edge) — the r14 verdict #2 hole (prose-only bands tripped
    // nothing)
    val dirty = clean.updated("b5sh_shape_knn_join", 8.5)
    val v = Bench.coldBandViolations(dirty, "/root/testdata/sf0.1")
    assert(v.nonEmpty && v.exists(_.contains("b5sh_shape_knn_join")),
      s"must name the regressed entry: $v")
    // only the banded scale factor is gated; unbanded entries never trip
    assert(Bench.coldBandViolations(dirty, "/root/testdata/sf0.01").isEmpty)
    assert(Bench.coldBandViolations(
      Map("b_new_entry" -> 99.0), "/root/testdata/sf0.1").isEmpty)
    // every banded entry exists in the bench registry (a renamed entry
    // would silently orphan its band)
    Bench.coldBandsSf01.keys.foreach(n => assert(Bench.entryFor(n) != null, n))
  }

  test("b10d is interpreted against the fs probe: over-band + in-band " +
    "probe = regression, over-band + dirty probe = host state") {
    // the recorded r12 pairs all read in-band (probe 0.25-0.55 beside
    // b10d <= 9.3, including the 9.13-beside-0.48 sweep that triggered
    // the mechanism hunt)
    assert(Bench.b10dVerdict(9.13, 0.48) === "in-band")
    assert(Bench.b10dVerdict(4.7, 0.33) === "in-band")
    assert(Bench.b10dVerdict(6.30, 0.43) === "in-band")
    // over band with a clean probe: the host was fine, the code wasn't
    assert(Bench.b10dVerdict(12.0, 0.43) === "regression")
    // over band with an out-of-band probe: host write-path state —
    // re-measure, don't re-band (in either direction)
    assert(Bench.b10dVerdict(12.0, 0.9) === "host-state")
    assert(Bench.b10dVerdict(12.0, 0.1) === "host-state")
    // the rule's first live firing (r13 addendum 5): probe 0.52 beside
    // b10d 9.80 was host state — the next sweep (probe 0.38) read 4.84
    // — so 0.52 sits OUTSIDE the clean band and must read host-state
    assert(Bench.b10dVerdict(9.80, 0.52) === "host-state")
    assert(Bench.b10dVerdict(4.84, 0.38) === "in-band")
  }
}
