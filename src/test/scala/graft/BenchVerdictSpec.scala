package graft

import org.scalatest.funsuite.AnyFunSuite

/** The re-measure verdict decision (Bench.remeasureVerdict) and its
  * A/A leg envelope (Bench.legEnvelope) — r15 verdict item 1. The r14
  * and r15 post-close artifacts both assigned "regression" to untouched
  * queries measured inside windows their own canaries labeled 1.4–1.8×
  * hot; the verdict is now a pure function gated on the bracketing
  * canary legs, so the cases below replay the r15 artifact's numbers
  * and pin the required outcomes.
  */
class BenchVerdictSpec extends AnyFunSuite {
  import Bench.{legEnvelope, remeasureVerdict}

  test("r15 false regressions become heat-invalid under a hot bracket") {
    // BENCH_r15.json remeasured block, measured while the pre-canary
    // read 76.0 s vs the 41.4 s floor (1.8× hot): all six must now read
    // heat-invalid, not regression, when the bracket leg is hot.
    val r15 = Seq( // (isolated, prev) from the artifact
      12.100 -> 0.729, // q289_robust_z_by
      11.695 -> 0.617, // q74f_ewm_segmented
      4.203 -> 0.523,  // q189_psi_drift
      2.640 -> 0.617,  // q59c_event_transitions
      1.755 -> 0.497,  // q59b_retention
      1.527 -> 0.454)  // q229_token_entropy_by
    for ((iso, prev) <- r15)
      assert(remeasureVerdict(Some(iso), prev, hotWindow = true) == "heat-invalid")
  }

  test("a genuine regression in a cool window still reads regression") {
    assert(remeasureVerdict(Some(12.1), 0.729, hotWindow = false) == "regression")
    assert(remeasureVerdict(Some(2.0), 1.0, hotWindow = false) == "regression")
  }

  test("noise envelope has priority over the heat gate") {
    // a clean child reading is exculpatory even in a hot window — heat
    // only inflates times, so a reading inside the noise envelope is
    // stronger evidence than the hot bracket is doubt
    assert(remeasureVerdict(Some(1.05), 1.0, hotWindow = true) == "noise")
    assert(remeasureVerdict(Some(1.05), 1.0, hotWindow = false) == "noise")
    // the +0.5 s absolute allowance for sub-second queries
    assert(remeasureVerdict(Some(0.9), 0.45, hotWindow = true) == "noise")
  }

  test("failed child re-measure reads remeasure_failed regardless of heat") {
    assert(remeasureVerdict(None, 1.0, hotWindow = true) == "remeasure_failed")
    assert(remeasureVerdict(None, 1.0, hotWindow = false) == "remeasure_failed")
  }

  test("envelope: 1.5x ratio with a +1s absolute floor for small sums") {
    assert(legEnvelope(4.0) == 6.0)    // ratio regime: 1.5 × 4.0
    assert(legEnvelope(0.8) == 1.8)    // absolute regime: 0.8 + 1.0 > 1.2
    // the r15 hot window: q209b's canary leg read 15.8 s vs its 5.3 s
    // normal — a 3x elevation lands far outside either regime
    assert(15.8 > legEnvelope(5.3))
  }

  test("BENCH_FULL.json is self-contained: canary/flag/verdict blocks present") {
    // r16 verdict item 2: a close artifact must be adjudicable WITHOUT
    // PLANS.md prose or the driver's 2000-char stdout tail — the canary
    // block, the flagged set, and per-child re-measure verdicts all
    // live in the file itself. This pins the contract structurally on
    // whatever full-protocol artifact is in the repo root (skipped only
    // if no artifact exists yet, e.g. a fresh clone pre-bench).
    val f = new java.io.File("BENCH_FULL.json")
    assume(f.isFile, "no BENCH_FULL.json in repo root — run a full bench")
    val om = new com.fasterxml.jackson.databind.ObjectMapper()
    val root = om.readTree(f)
    for (k <- Seq("metric", "value", "queries", "errors", "canary",
        "flagged", "remeasured", "bracket_ref", "bracket_envelope", "sf"))
      assert(root.has(k), s"BENCH_FULL.json missing key '$k'")
    val canary = root.get("canary")
    for (k <- Seq("pre", "post", "sweep_min", "prev", "heat",
        "pre_detail", "post_detail"))
      assert(canary.has(k), s"canary block missing '$k'")
    // every flagged query must carry a full re-measure record with a
    // verdict from the closed set (up to the remeasure cap)
    val okVerdicts = Set("noise", "heat-invalid", "regression",
      "remeasure_failed")
    val rm = root.get("remeasured")
    val it = rm.fields()
    while (it.hasNext) {
      val e = it.next()
      for (k <- Seq("sweep", "isolated", "prev", "leg_pre", "leg_post",
          "verdict"))
        assert(e.getValue.has(k), s"remeasured ${e.getKey} missing '$k'")
      assert(okVerdicts.contains(e.getValue.get("verdict").asText()))
    }
    // a doctored run can never pass as a real close: the self-test knob
    // stamps heat_sim, the prev-path override stamps prev_override
    assert(!root.has("heat_sim") || root.get("heat_sim").asBoolean(),
      "heat_sim key, when present, must be literal true")
    // the shared-kernel honesty field (r17): when the suffix memo
    // built at least one kernel this run, the artifact must say how
    // many and how long — per-query mins are marginal costs otherwise
    if (root.has("shared_kernel")) {
      val sk = root.get("shared_kernel")
      assert(sk.has("suffix_builds") && sk.get("suffix_builds").asLong() >= 1)
      assert(sk.has("suffix_sec") && sk.get("suffix_sec").asDouble() >= 0.0)
    }
  }
}
