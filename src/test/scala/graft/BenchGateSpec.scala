package graft

import org.scalatest.funsuite.AnyFunSuite

/** The bench-noise adjudicator's contract: a container slowdown (every
  * query AND the calibration probe scale together → norms unchanged)
  * reports nothing; a genuine per-query norm shift ≥ 1.5× its best
  * recent norm reports exactly that query; sub-floor queries and
  * queries with no history baseline never report.
  */
class BenchGateSpec extends AnyFunSuite {

  private def histLine(sf: String, norms: (String, Double)*): String = {
    val m = norms.map { case (k, v) => "\"" + k + "\":" + v }.mkString(",")
    s"""{"ts":1,"metric":"total","value":1.0,"unit":"sec","queries":{},""" +
      s""""min":{},"max":{},"calib_median":0.3,"norm":{$m},"sf":"$sf"}"""
  }

  /** Norm-only HistLine (no seconds evidence — the pre-round-13 shape). */
  private def h(norms: (String, Double)*): BenchGate.HistLine =
    BenchGate.HistLine("/d/sf0.1", norms.toMap, Map.empty)

  test("parseHistLine extracts sf, the norm map, and the seconds map; pre-norm lines parse to None") {
    val parsed = BenchGate.parseHistLine(
      histLine("/d/sf0.1", "q1_a" -> 2.5, "q2_b" -> 10.0))
    assert(parsed.contains(BenchGate.HistLine("/d/sf0.1",
      Map("q1_a" -> 2.5, "q2_b" -> 10.0), Map.empty)))
    // seconds map parsed when present (round 13: the veto's evidence)
    val withSecs = BenchGate.parseHistLine(
      s"""{"ts":1,"value":1.0,"queries":{"q1_a":1.045},"min":{},"max":{},""" +
        s""""norm":{"q1_a":2.115},"sf":"/d/sf0.1"}""")
    assert(withSecs.contains(BenchGate.HistLine("/d/sf0.1",
      Map("q1_a" -> 2.115), Map("q1_a" -> 1.045))))
    // round-8-era line without a norm map: tolerated, skipped
    assert(BenchGate.parseHistLine(
      """{"ts":1,"value":1.0,"queries":{"q1":0.5},"sf":"/d/sf0.1"}""").isEmpty)
    assert(BenchGate.parseHistLine("not json at all").isEmpty)
  }

  test("uniform container slowdown reports nothing; a real norm shift reports its query") {
    val history = Seq(h("q1" -> 4.0, "q2" -> 6.0), h("q1" -> 5.0, "q2" -> 7.0))
    // healthy run, norms at historical floor → empty
    assert(BenchGate.regressions(Map("q1" -> 4.2, "q2" -> 6.1), history).isEmpty)
    // q1 norm doubled vs its best (4.0) → reported with (current, best)
    val regs = BenchGate.regressions(Map("q1" -> 8.4, "q2" -> 6.1), history)
    assert(regs == Map("q1" -> (8.4, 4.0)))
  }

  test("best-of-window beats last-run: one noisy history line does not raise the bar") {
    // best is 4.0 even though the LAST line spiked to 9.0; current 5.0
    // is within 1.5× of best → not a regression (the exact r9 shape)
    val history = Seq(h("q1" -> 4.0), h("q1" -> 9.0))
    assert(BenchGate.regressions(Map("q1" -> 5.0), history).isEmpty)
    assert(BenchGate.regressions(Map("q1" -> 6.1), history) == Map("q1" -> (6.1, 4.0)))
  }

  test("sub-floor queries and queries without history never report") {
    val history = Seq(h("q_fast" -> 0.5))
    // 4× slower but below MinNorm=2.0 → scheduler-jitter territory, skip
    assert(BenchGate.regressions(Map("q_fast" -> 1.9), history).isEmpty)
    // brand-new query: no baseline, never reported
    assert(BenchGate.regressions(Map("q_new" -> 50.0), history).isEmpty)
  }

  test("seconds-confluence veto: a denominator-variance ghost is suppressed, a real regression is not") {
    // the live round-13 catch, verbatim: q244's best norm 2.115 came from
    // a slow-probe line (calib 0.494, sec 1.045); today's normal 1.313 s
    // on a 0.361 calib reads norm 3.636 → ratio 1.72, a pure-denominator
    // ghost the retime then "confirmed". Seconds ratio is only 1.26.
    val history = Seq(BenchGate.HistLine("/d/sf0.1",
      Map("q244" -> 2.115), Map("q244" -> 1.045)))
    assert(BenchGate.regressions(Map("q244" -> 3.636), history,
      currentSec = Map("q244" -> 1.313)).isEmpty,
      "normal seconds + deflated baseline norm must not flag")
    // ...but NOT silently: the vetoed complement carries the entry with
    // its seconds ratio so the artifact can list it (a real regression
    // masked by the narrow machine-got-faster regime stays visible)
    val (kept, vetoed) = BenchGate.regressionsSplit(Map("q244" -> 3.636),
      history, currentSec = Map("q244" -> 1.313))
    assert(kept.isEmpty && vetoed.keySet == Set("q244"))
    val (vn, vb, vsec) = vetoed("q244")
    assert(vn == 3.636 && vb == 2.115 && math.abs(vsec - 1.313 / 1.045) < 1e-9)
    // a REAL regression is slower in both currencies: same norms, but
    // seconds 3.1 (3x the best line's) → the flag survives the veto
    assert(BenchGate.regressions(Map("q244" -> 3.636), history,
      currentSec = Map("q244" -> 3.1)) == Map("q244" -> (3.636, 2.115)))
    // no seconds evidence (old history line / missing query): old behavior
    assert(BenchGate.regressions(Map("q244" -> 3.636),
      Seq(h("q244" -> 2.115)),
      currentSec = Map("q244" -> 1.313)) == Map("q244" -> (3.636, 2.115)))
    assert(BenchGate.regressions(Map("q244" -> 3.636), history)
      == Map("q244" -> (3.636, 2.115)))
  }

  test("adjudicate: uniform machine-wide slowdown raises the bar instead of flooding flags") {
    // the measured failure mode: a contended-but-quiet day runs the WHOLE
    // registry ~1.6x the golden window norms (probe is scan-shaped and
    // does not feel CPU contention proportionally)
    val history = Seq(h("q1" -> 4.0, "q2" -> 6.0, "q3" -> 8.0, "q4" -> 3.0, "q5" -> 5.0))
    val slowDay = Map("q1" -> 6.4, "q2" -> 9.6, "q3" -> 12.8, "q4" -> 4.8, "q5" -> 8.0)
    val (shift, flags, _) = BenchGate.adjudicate(slowDay, history)
    assert(math.abs(shift - 1.6) < 1e-9)
    assert(flags.isEmpty, s"uniform 1.6x shift must not flag: $flags")
    // same day, but q3 ALSO genuinely regressed 3x — it clears even the
    // shift-corrected bar (1.5 * 1.6 = 2.4) and is the only flag
    val (shift2, flags2, _) = BenchGate.adjudicate(slowDay + ("q3" -> 24.0), history)
    assert(flags2.keySet == Set("q3"), s"got $flags2 (shift $shift2)")
    // clean day: bar is the plain 1.5x (shift below 1 never lowers it)
    val (shift3, flags3, _) = BenchGate.adjudicate(
      Map("q1" -> 3.8, "q2" -> 5.9, "q3" -> 7.7, "q4" -> 2.9, "q5" -> 12.0), history)
    assert(shift3 <= 1.0 && flags3.keySet == Set("q5"))
  }

  test("calibStable: mid-run load drift is flagged, structural warm-up asymmetry is not") {
    // the observed ghost-flood runs: 0.431->0.155 (2.78x), r9's 3.11x
    assert(!BenchGate.calibStable(0.431, 0.155))
    assert(!BenchGate.calibStable(0.497, 0.160))
    // healthy runs sit at ~2x start/end (end probe runs fully warm):
    // round-10's adjudicated-healthy 0.362 -> 0.163 must NOT flag
    assert(BenchGate.calibStable(0.362, 0.163))
    assert(BenchGate.calibStable(0.30, 0.25))
    assert(BenchGate.calibStable(0.16, 0.36)) // symmetric
    assert(!BenchGate.calibStable(0.0, 0.3))  // degenerate probe: not stable
  }

  test("parseHistLine rejects calib-unstable lines; legacy lines without probes are kept") {
    // unstable run (2.8x probe drift): its norms are blended-calibration
    // artifacts and must never become a best-of-window baseline
    val unstable = s"""{"ts":1,"value":1.0,"calib_start":0.431,"calib_end":0.155,""" +
      s""""norm":{"q1":1.0},"sf":"/d/sf0.1"}"""
    assert(BenchGate.parseHistLine(unstable).isEmpty)
    val stable = s"""{"ts":1,"value":1.0,"calib_start":0.362,"calib_end":0.163,""" +
      s""""norm":{"q1":1.0},"sf":"/d/sf0.1"}"""
    assert(BenchGate.parseHistLine(stable).contains(
      BenchGate.HistLine("/d/sf0.1", Map("q1" -> 1.0), Map.empty)))
    // pre-calib-era line: cannot be judged, kept
    assert(BenchGate.parseHistLine(histLine("/d/sf0.1", "q1" -> 1.0)).isDefined)
  }

  test("parseHistLine rejects a line carrying exactly one calibration probe field") {
    // Bench always writes both probes; a half-probed line is malformed or
    // hand-edited and must not be admitted as judged-stable (ADVICE r11)
    val startOnly = s"""{"ts":1,"value":1.0,"calib_start":0.3,""" +
      s""""norm":{"q1":1.0},"sf":"/d/sf0.1"}"""
    val endOnly = s"""{"ts":1,"value":1.0,"calib_end":0.3,""" +
      s""""norm":{"q1":1.0},"sf":"/d/sf0.1"}"""
    assert(BenchGate.parseHistLine(startOnly).isEmpty)
    assert(BenchGate.parseHistLine(endOnly).isEmpty)
    // both present and stable: kept (the control for this test)
    val both = s"""{"ts":1,"value":1.0,"calib_start":0.30,"calib_end":0.25,""" +
      s""""norm":{"q1":1.0},"sf":"/d/sf0.1"}"""
    assert(BenchGate.parseHistLine(both).isDefined)
  }

  test("shiftSuspect warns on a calib-stable uniform slowdown past the drift band") {
    // observed machine drift tops out ~1.6x registry-wide: below bound
    assert(!BenchGate.shiftSuspect(1.6, calibStable = true))
    // a uniform 2x on a STABLE run is the absorbed-real-regression shape
    assert(BenchGate.shiftSuspect(2.0, calibStable = true))
    assert(BenchGate.shiftSuspect(BenchGate.ShiftSuspectBound, calibStable = true))
    // unstable runs already carry calib_stable=false — no double flag
    assert(!BenchGate.shiftSuspect(3.0, calibStable = false))
    assert(!BenchGate.shiftSuspect(0.9, calibStable = true))
  }

  test("confirm: a planted persistent regression re-times confirmed, a one-shot spike re-times ghost") {
    // flag raised at bar 1.5 against best: q_real's code is genuinely 3x
    // (re-times at the same high norm); q_ghost was a mid-run load spike
    // (re-times at its historical baseline)
    val flagged = Map("q_real" -> (12.0, 4.0), "q_ghost" -> (12.0, 4.0))
    val verdicts = BenchGate.confirm(flagged, bar = 1.5, {
      case "q_real"  => Some(11.8)
      case "q_ghost" => Some(4.1)
      case _         => None
    })
    assert(verdicts("q_real") == (Some(11.8), Some(true)))
    assert(verdicts("q_ghost") == (Some(4.1), Some(false)))
    // the MinNorm floor is part of the flag condition, so it is part of
    // the confirmation too: a sub-second query jitter-flagged just past
    // the floor that re-times BACK into the jitter band (0.9 < MinNorm,
    // a value regressions() would never flag) must be a ghost even
    // though 0.9 >= bar * best (1.5 * 0.4 = 0.6)
    val subFloor = BenchGate.confirm(Map("q_tiny" -> (2.05, 0.4)), 1.5,
      _ => Some(0.9))
    assert(subFloor("q_tiny") == (Some(0.9), Some(false)))
  }

  test("confirm: retime failure yields a null verdict; the flood cap stops at MaxRetimes worst-by-ratio") {
    val failed = BenchGate.confirm(Map("q1" -> (12.0, 4.0)), 1.5, _ => None)
    assert(failed("q1") == (None, None))
    // 10 flags, ratios 2..11 — only the 8 WORST are re-timed; the two
    // smallest ratios (q01 at 2x, q02 at 3x) stay explicitly unadjudicated
    val flood = (1 to 10).map(i => f"q$i%02d" -> (2.0 * (i + 1), 2.0)).toMap
    var timed = List.empty[String]
    val v = BenchGate.confirm(flood, 1.5, { q => timed ::= q; Some(2.0) })
    assert(timed.size == BenchGate.MaxRetimes)
    assert(v("q01") == (None, None) && v("q02") == (None, None))
    assert(v("q10") == (Some(2.0), Some(false))) // worst flag was re-timed
  }

  test("retimeNorm: the first-iteration effect is discarded, not measured (planted 5x warm-up)") {
    // the BENCH_r12 inflation shape: the query's FIRST re-execution after
    // ~250 other queries runs 5x cold (TimeQ q12: iter1 6.2s vs iter2
    // 1.06s); the old min-of-2 harness measured it. Planted here: run()
    // costs 5.0s once, then 1.0s warm; probe reads 0.5s.
    var calls = 0
    def run(): Double = { calls += 1; if (calls == 1) 5.0 else 1.0 }
    val rn = BenchGate.retimeNorm(() => run(), () => 0.5, basis = 0.5, warmRef = 0.5)
    assert(calls == 4, "1 discarded warm-up + 3 measured iterations")
    assert(rn.contains(2.0), s"warm norm 1.0/0.5, not the cold 10.0: $rn")
    // ...and through confirm(), the flag reads GHOST (norm 2.0 vs a flag
    // raised at 12.0 against best 4.0, bar 1.5): the round-13 done
    // criterion — a 5x iteration-1 cost must not confirm a ghost
    val v = BenchGate.confirm(Map("q12" -> (12.0, 4.0)), 1.5,
      _ => { calls = 0; BenchGate.retimeNorm(() => run(), () => 0.5, 0.5, 0.5) })
    assert(v("q12") == (Some(2.0), Some(false)))
  }

  test("retimeNorm: median of the measured iterations (symmetric with the flagging statistic)") {
    // ADVICE r12: min-of-2 was asymmetric vs the median-of-3 flag — a
    // marginal real regression (median past the bar, min under) read as
    // ghost. Post-warm-up samples 1.0, 3.0, 2.0 → median 2.0, not min 1.0.
    val samples = Iterator(9.9, 1.0, 3.0, 2.0) // 9.9 = discarded warm-up
    assert(BenchGate.retimeNorm(() => samples.next(), () => 1.0, 1.0, 1.0).contains(2.0))
    // degenerate probe / basis / warm reference → retime failed, None
    assert(BenchGate.retimeNorm(() => 1.0, () => 0.0, 1.0, 1.0).isEmpty)
    assert(BenchGate.retimeNorm(() => 1.0, () => 1.0, 0.0, 1.0).isEmpty)
    assert(BenchGate.retimeNorm(() => 1.0, () => 1.0, 1.0, 0.0).isEmpty)
  }

  test("retimeNorm: calibMedian basis kills the warm-probe inflation; degradation since run end is credited") {
    // the live round-13 catch, verbatim: q244's retime SECONDS equalled
    // its in-run seconds (~1.31 s), but dividing by the fully-warm
    // adjacent probe (0.17, vs the start-dominated calibMedian 0.361 the
    // flag norms use) reported 7.449 where the in-run norm was 3.636 —
    // the same arithmetic explains r12's q12 8.2-vs-4.55. With the
    // calibMedian basis the identical measurement reads ~3.64.
    val rn = BenchGate.retimeNorm(() => 1.313, () => 0.168,
      basis = 0.361, warmRef = 0.168)
    assert(rn.exists(v => math.abs(v - 1.313 / 0.361) < 1e-9), s"got $rn")
    // JVM degraded 2x since the run ended (probe reads 2x the run's own
    // warm end probe): the measurement is deflated by exactly that factor
    val degraded = BenchGate.retimeNorm(() => 2.0, () => 1.0,
      basis = 1.0, warmRef = 0.5)
    assert(degraded.contains(1.0), s"got $degraded")
    // the credit is SYMMETRIC: a machine that got FASTER since the run
    // ended (probe at half the warm reference — e.g. whole-run load
    // lifting before the retime pass) INFLATES the measurement, so a
    // real regression re-measured on the faster machine still confirms
    // instead of being under-read into a ghost (a dismissal bias)
    val faster = BenchGate.retimeNorm(() => 2.0, () => 0.25,
      basis = 1.0, warmRef = 0.5)
    assert(faster.contains(4.0), s"got $faster")
    // ...but the credit SATURATES at the same-shape probe-disagreement
    // band (CalibStableRatio): a single one-sided spike in either probe
    // (warmRef is measured once, before the retime pass's unpersist+GC)
    // must not scale every retime unboundedly in either direction
    val spikedWarmRef = BenchGate.retimeNorm(() => 2.0, () => 0.2,
      basis = 1.0, warmRef = 2.0) // ratio 0.1 -> clamped to 1/2.5
    assert(spikedWarmRef.contains(2.0 / (1.0 / BenchGate.CalibStableRatio)),
      s"got $spikedWarmRef")
    val spikedProbe = BenchGate.retimeNorm(() => 2.0, () => 2.0,
      basis = 1.0, warmRef = 0.5) // ratio 4 -> clamped to 2.5
    assert(spikedProbe.contains(2.0 / BenchGate.CalibStableRatio),
      s"got $spikedProbe")
  }

  test("flagVerdict: drift-day persistent flag demotes to drift_consistent; quiet-day planted regression confirms") {
    // the BENCH_r12 adjudication, mechanized: shift 1.255 (calib-stable
    // drift day), untouched-code flags at ratios 2.40/2.06/1.99 — all
    // retime-persistent because DRIFT persists. Adjusted ratios
    // 1.91/1.64/1.59 sit inside the documented per-query drift tail
    // (~2.1x the registry median) → drift_consistent, not confirmed.
    for (ratio <- Seq(2.40, 2.06, 1.99))
      assert(BenchGate.flagVerdict(Some(true), ratio, 1.255, calibStable = true)
        .contains("drift_consistent"), s"ratio $ratio")
    // quiet day (shift 1.0), planted 3x code regression, retime persists
    // → confirmed: no drift to attribute it to
    assert(BenchGate.flagVerdict(Some(true), 3.0, 1.0, calibStable = true)
      .contains("confirmed"))
    // drift day but BEYOND the tail (adjusted 4.0/1.3 = 3.1 >= 2.1):
    // machine drift does not explain it → confirmed
    assert(BenchGate.flagVerdict(Some(true), 4.0, 1.3, calibStable = true)
      .contains("confirmed"))
    // shift below the drift-day bound: the run did not measurably drift,
    // so nothing demotes even inside the tail band
    assert(BenchGate.flagVerdict(Some(true), 2.2, 1.1, calibStable = true)
      .contains("confirmed"))
    // calib-unstable run: the shift number itself is a blended artifact —
    // no demotion on its authority
    assert(BenchGate.flagVerdict(Some(true), 2.4, 1.255, calibStable = false)
      .contains("confirmed"))
    // retime refuted → ghost; retime failed/capped → unadjudicated null
    assert(BenchGate.flagVerdict(Some(false), 2.4, 1.255, calibStable = true)
      .contains("ghost"))
    assert(BenchGate.flagVerdict(None, 2.4, 1.255, calibStable = true).isEmpty)
  }

  test("parseHistLine: commit usable only with an explicit clean-tree attestation") {
    def line(extra: String) =
      s"""{"ts":1,"value":1.0,$extra"norm":{"q1":1.0},"sf":"/d/sf0.1"}"""
    // clean-tree line: the commit is the files_changed diff base
    assert(BenchGate.parseHistLine(
      line(""""commit":"abc1234","tree_dirty":false,"""))
      .flatMap(_.commit).contains("abc1234"))
    // dirty tree: the sha does not identify the measured code → None
    assert(BenchGate.parseHistLine(
      line(""""commit":"abc1234","tree_dirty":true,"""))
      .exists(_.commit.isEmpty))
    // commit without the attestation field (hand-edited): unusable
    assert(BenchGate.parseHistLine(line(""""commit":"abc1234","""))
      .exists(_.commit.isEmpty))
    // pre-round-14 line: parses fine, no commit
    assert(BenchGate.parseHistLine(line("")).exists(_.commit.isEmpty))
  }

  test("bestNormLine returns the window line whose norm is the flag's baseline") {
    val l1 = BenchGate.HistLine("/d/sf0.1", Map("q1" -> 4.0), Map.empty, Some("aaa1111"))
    val l2 = BenchGate.HistLine("/d/sf0.1", Map("q1" -> 2.0, "q2" -> 1.0), Map.empty, Some("bbb2222"))
    val l3 = BenchGate.HistLine("/d/sf0.1", Map("q1" -> 3.0), Map.empty, None)
    // q1's best (2.0) came from l2 → that line's commit is the diff base
    assert(BenchGate.bestNormLine("q1", Seq(l1, l2, l3)).contains(l2))
    assert(BenchGate.bestNormLine("q2", Seq(l1, l2, l3)).contains(l2))
    assert(BenchGate.bestNormLine("q_absent", Seq(l1, l2, l3)).isEmpty)
  }

  test("flagVerdict files_changed: touched file never demotes; untouched-on-drift-day still does") {
    // the r12 drift-day shape: shift 1.255, persistent flag at ratio 2.40
    // (adjusted 1.91, inside the drift tail). UNTOUCHED defining file →
    // machine by elimination, the demotion applies (and the artifact's
    // files_changed:false discharges the label without a judge TimeQ)
    assert(BenchGate.flagVerdict(Some(true), 2.40, 1.255, calibStable = true,
      filesChanged = Some(false)).contains("drift_consistent"))
    // TOUCHED defining file: a persistent flag on changed code is the
    // builder's to explain even inside the tail — no demotion
    assert(BenchGate.flagVerdict(Some(true), 2.40, 1.255, calibStable = true,
      filesChanged = Some(true)).contains("confirmed"))
    // unknown file state: pre-round-14 behavior (demote, needs TimeQ)
    assert(BenchGate.flagVerdict(Some(true), 2.40, 1.255, calibStable = true,
      filesChanged = None).contains("drift_consistent"))
    // files_changed never rescues a ghost or manufactures a demotion
    // outside the drift band
    assert(BenchGate.flagVerdict(Some(false), 2.40, 1.255, calibStable = true,
      filesChanged = Some(true)).contains("ghost"))
    assert(BenchGate.flagVerdict(Some(true), 3.0, 1.0, calibStable = true,
      filesChanged = Some(false)).contains("confirmed"))
  }

  test("flagVerdict main_changed: a touched shared helper kills the demotion even when the defining file is untouched") {
    // round-14 verdict item 1, the helper-regression scenario verbatim:
    // a regression lands in operators/Ops.scala; every flagged consumer's
    // DEFINING file is untouched (files_changed:false) but the
    // measured-code surface changed (main_changed:true). Drift-day shape
    // (shift 1.255, adjusted 1.91 inside the tail) — previously this
    // demoted to drift_consistent, mislabeling a real code regression as
    // machine. Now: NO demotion, the builder's to explain.
    assert(BenchGate.flagVerdict(Some(true), 2.40, 1.255, calibStable = true,
      filesChanged = Some(false), mainChanged = Some(true))
      .contains("confirmed"))
    // both bits false: the full dependency-closure elimination — the
    // demotion applies and is DISCHARGED (nothing on the measured-code
    // surface changed, drift measured, flag persistent → machine)
    assert(BenchGate.flagVerdict(Some(true), 2.40, 1.255, calibStable = true,
      filesChanged = Some(false), mainChanged = Some(false))
      .contains("drift_consistent"))
    // main_changed unknown (no baseline commit / git unavailable): the
    // demotion keeps its pre-round-14 "needs TimeQ" reading — the label
    // is the honest middle state, not a discharge
    assert(BenchGate.flagVerdict(Some(true), 2.40, 1.255, calibStable = true,
      filesChanged = Some(false), mainChanged = None)
      .contains("drift_consistent"))
    // main_changed never rescues: touched defining file stays confirmed
    // regardless of the surface bit
    assert(BenchGate.flagVerdict(Some(true), 2.40, 1.255, calibStable = true,
      filesChanged = Some(true), mainChanged = Some(false))
      .contains("confirmed"))
  }

  test("flagVerdict unstable_run: persistent flag on an attested-untouched tree under an unstable calibration") {
    // round-14 verdict item 2: a calib-unstable run invalidates the
    // shift number, so the drift demotion stays off (conservative
    // default kept) — but untouched code + fixed data + persistent flag
    // must not over-claim a CODE regression. Both bits explicitly false
    // → the distinct marker.
    assert(BenchGate.flagVerdict(Some(true), 2.40, 1.255, calibStable = false,
      filesChanged = Some(false), mainChanged = Some(false))
      .contains("unstable_run"))
    // any unknown bit: nothing attests the code untouched → confirmed
    // (the pre-round-15 conservative reading)
    assert(BenchGate.flagVerdict(Some(true), 2.40, 1.255, calibStable = false,
      filesChanged = Some(false), mainChanged = None)
      .contains("confirmed"))
    assert(BenchGate.flagVerdict(Some(true), 2.40, 1.255, calibStable = false,
      filesChanged = None, mainChanged = Some(false))
      .contains("confirmed"))
    // touched code on an unstable run is still the builder's to explain
    assert(BenchGate.flagVerdict(Some(true), 2.40, 1.255, calibStable = false,
      filesChanged = Some(true), mainChanged = Some(true))
      .contains("confirmed"))
    // a STABLE run never stamps unstable_run (the demotion machinery
    // owns that regime), and a ghost stays a ghost
    assert(BenchGate.flagVerdict(Some(true), 2.40, 1.255, calibStable = true,
      filesChanged = Some(false), mainChanged = Some(false))
      .contains("drift_consistent"))
    assert(BenchGate.flagVerdict(Some(false), 2.40, 1.255, calibStable = false,
      filesChanged = Some(false), mainChanged = Some(false))
      .contains("ghost"))
  }

  test("diffVerdict: empty diff is only 'unchanged' when the path exists somewhere the diff could see") {
    // round-14 ADVICE: `git diff --name-only <commit> -- <path>` exits 0
    // with empty output for a path that exists in NEITHER the commit NOR
    // the worktree (a manifest-override path from a different tree) —
    // trusting it would stamp files_changed:false, a wrong ANSWER.
    assert(BenchGate.diffVerdict(Some(Seq("src/A.scala")),
      existsAtCommit = false, trackedInTree = false) == Some(true))
    assert(BenchGate.diffVerdict(Some(Nil),
      existsAtCommit = true, trackedInTree = false) == Some(false))
    assert(BenchGate.diffVerdict(Some(Nil),
      existsAtCommit = false, trackedInTree = true) == Some(false))
    // exists nowhere the diff could see — INCLUDING the untracked-
    // worktree-file case (Files.exists true, git ls-files false): an
    // untracked file is invisible to git diff, so an empty diff says
    // nothing about it and "unchanged" would be a wrong answer
    assert(BenchGate.diffVerdict(Some(Nil),
      existsAtCommit = false, trackedInTree = false).isEmpty)
    // whitespace-only output is an empty diff, not a change
    assert(BenchGate.diffVerdict(Some(Seq("", "  ")),
      existsAtCommit = false, trackedInTree = false).isEmpty)
    // diff itself unavailable (git hung/absent): null without running
    // the existence checks
    assert(BenchGate.diffVerdict(None,
      existsAtCommit = sys.error("must not evaluate"),
      trackedInTree = sys.error("must not evaluate")).isEmpty)
    // non-empty diff short-circuits the existence checks too (they are
    // by-name so the subprocess only runs on the empty-diff path)
    assert(BenchGate.diffVerdict(Some(Seq("src/A.scala")),
      existsAtCommit = sys.error("must not evaluate"),
      trackedInTree = sys.error("must not evaluate")) == Some(true))
  }

  test("parseManifestLines parses git-show content identically to the file reader") {
    // round-14 ADVICE: the default manifest is read from the
    // HEAD-committed blob, so the line parser must accept `git show`
    // stdout (a Seq of lines) with the same tolerance as loadManifest
    val lines = Seq("q1_a\tsrc/main/scala/A.scala", "malformed line",
      "", "q2_b\tsrc/main/scala/B.scala")
    assert(BenchGate.parseManifestLines(lines) == Map(
      "q1_a" -> "src/main/scala/A.scala", "q2_b" -> "src/main/scala/B.scala"))
    assert(BenchGate.parseManifestLines(Nil).isEmpty)
  }

  test("sec-vetoed entries slower in seconds too (>= 1.2x) are re-timed instead of silently vetoed") {
    // round-13 verdict item 2, the planted shape verbatim: 2x norm ratio,
    // 1.4x seconds — under the 1.5 veto bar but NOT at its seconds floor,
    // exactly the masked class (real regression on a machine-got-faster
    // day). It must flow into the retime harness, not rest on the veto.
    val history = Seq(BenchGate.HistLine("/d/sf0.1",
      Map("q9" -> 3.0, "q8" -> 3.0), Map("q9" -> 1.0, "q8" -> 1.0)))
    val (kept, vetoed) = BenchGate.regressionsSplit(
      Map("q9" -> 6.0, "q8" -> 6.0), history,
      currentSec = Map("q9" -> 1.4, "q8" -> 1.05))
    assert(kept.isEmpty && vetoed.keySet == Set("q9", "q8"))
    val needing = BenchGate.vetoedNeedingRetime(vetoed)
    assert(needing == Map("q9" -> (6.0, 3.0)),
      "1.4x-seconds entry re-times; the 1.05x near-floor entry keeps the plain veto")
    // ...and through confirm() it gets the same verdict machinery as a
    // kept flag: persistent at its flagged norm → confirmable
    val v = BenchGate.confirm(needing, bar = 1.5, _ => Some(6.1))
    assert(v("q9") == (Some(6.1), Some(true)))
  }

  test("confirm: the cap parameter bounds the retime budget (0 = all explicitly unadjudicated)") {
    val flagged = Map("qa" -> (12.0, 4.0), "qb" -> (8.0, 4.0))
    val none = BenchGate.confirm(flagged, 1.5, _ => Some(4.0), cap = 0)
    assert(none("qa") == (None, None) && none("qb") == (None, None))
    val one = BenchGate.confirm(flagged, 1.5, _ => Some(4.0), cap = 1)
    assert(one("qa") == (Some(4.0), Some(false)), "worst-by-ratio spends the budget first")
    assert(one("qb") == (None, None))
  }

  /** Fake Process for [[BenchGate.boundedLines]]: every wedge mode the
    * harness exists to survive, drivable without real hung subprocesses.
    */
  private class FakeProc(stdout: String, exit: Int, exits: Boolean,
                         stdoutNeverCloses: Boolean = false,
                         stdoutThrows: Boolean = false)
      extends Process {
    @volatile var destroyedForcibly = false
    // latch-blocked, not sleep-blocked: destroyForcibly (or the test's
    // finally releaseStreams()) unblocks the daemon reader to a clean EOF
    // instead of leaking a minute-sleeping thread per hung-mode test
    private val closed = new java.util.concurrent.CountDownLatch(1)
    def releaseStreams(): Unit = closed.countDown()
    override def getInputStream: java.io.InputStream =
      if (stdoutThrows) new java.io.InputStream {
        override def read(): Int = throw new java.io.IOException("read died")
      }
      else if (stdoutNeverCloses) new java.io.InputStream {
        override def read(): Int = {
          try closed.await() catch { case _: InterruptedException => }
          -1
        }
      }
      else new java.io.ByteArrayInputStream(stdout.getBytes)
    override def getOutputStream: java.io.OutputStream =
      java.io.OutputStream.nullOutputStream()
    override def getErrorStream: java.io.InputStream =
      java.io.InputStream.nullInputStream()
    override def waitFor(): Int = exit
    override def waitFor(t: Long, u: java.util.concurrent.TimeUnit): Boolean = exits
    override def exitValue(): Int =
      if (exits) exit else throw new IllegalThreadStateException("running")
    override def destroy(): Unit = ()
    override def destroyForcibly(): Process =
      { destroyedForcibly = true; closed.countDown(); this }
  }

  test("boundedLines: clean exit yields the lines; nonzero exit is an answer (None, not hung)") {
    assert(BenchGate.boundedLines(() => new FakeProc("a\nb\n", 0, exits = true))
      == (Some(Seq("a", "b")), false))
    assert(BenchGate.boundedLines(() => new FakeProc("", 128, exits = true))
      == (None, false))
    // a throwing start (binary missing) is also an answer, not a hang
    assert(BenchGate.boundedLines(() => throw new java.io.IOException("no git"))
      == (None, false))
    // exit 0 but the READ throws and dies: a per-call answer loss, NOT a
    // hang — reporting hung here would let one transient IOException trip
    // the caller's breaker and null the whole run's attestation
    assert(BenchGate.boundedLines(() =>
      new FakeProc("", 0, exits = true, stdoutThrows = true)) == (None, false))
  }

  test("boundedLines: a process that never exits is destroyed forcibly and reported hung") {
    // the stale-lock/fsmonitor/dead-NFS class — and the stream never
    // closes either, so an INLINE read would block before any wait bound:
    // the daemon-reader design is what makes the timeout reachable at all
    val p = new FakeProc("", 0, exits = false, stdoutNeverCloses = true)
    try {
      assert(BenchGate.boundedLines(() => p, timeoutSec = 0) == (None, true))
      assert(p.destroyedForcibly, "a hung process must be destroyed forcibly")
    } finally p.releaseStreams()
  }

  test("boundedLines: exit 0 with stdout held open by a grandchild loses the answer as hung") {
    // git exits fine but an inherited pipe write-end (auto-started
    // fsmonitor daemon) keeps stdout from EOF: the answer is unreadable
    // either way, and reporting hung=true lets the caller's breaker stop
    // paying the join stall on every subsequent call
    val p = new FakeProc("", 0, exits = true, stdoutNeverCloses = true)
    try assert(BenchGate.boundedLines(() => p, joinMs = 50) == (None, true))
    finally p.releaseStreams()
    // joinMs = 0 must behave as a (tiny) bound, not Thread.join(0)'s
    // wait-forever: same wedge, zero budget, still returns
    val p0 = new FakeProc("", 0, exits = true, stdoutNeverCloses = true)
    try assert(BenchGate.boundedLines(() => p0, joinMs = 0) == (None, true))
    finally p0.releaseStreams()
  }

  test("loadManifest parses the tsv, skips malformed lines, and survives a missing file") {
    val dir = graft.core.TempDirs.scratch("benchgate-manifest-")
    val p = java.nio.file.Paths.get(dir, "m.tsv")
    java.nio.file.Files.write(p,
      "q1_a\tsrc/main/scala/A.scala\nmalformed line\nq2_b\tsrc/main/scala/B.scala\n".getBytes)
    assert(BenchGate.loadManifest(p.toString) == Map(
      "q1_a" -> "src/main/scala/A.scala", "q2_b" -> "src/main/scala/B.scala"))
    assert(BenchGate.loadManifest("/nonexistent/m.tsv").isEmpty)
  }

  test("historyIdentity counts lines with the parser's split (CR/CRLF files agree)") {
    // ADVICE r12: '\n'-byte counting disagrees with linesIterator on
    // CR-bearing files; hist_lines must equal the parsed-line count
    val crlf = Some("line1\r\nline2\r\n".getBytes)
    assert(BenchGate.historyIdentity(crlf)._1 == 2)
    val crOnly = Some("a\rb\rc".getBytes)
    assert(BenchGate.historyIdentity(crOnly)._1 == 3)
    assert(BenchGate.historyIdentity(Some(Array.empty[Byte]))._1 == 0)
  }

  test("historyIdentity reports line count and a stable hash; missing file is (0, empty)") {
    val dir = graft.core.TempDirs.scratch("benchgate-hist-id-")
    val p = java.nio.file.Paths.get(dir, "h.jsonl")
    java.nio.file.Files.write(p, "line1\nline2\n".getBytes)
    val (n, sha) = BenchGate.historyIdentity(p.toString)
    assert(n == 2 && sha.length == 16)
    // appending one line moves BOTH fields — tamper/truncation visible
    java.nio.file.Files.write(p, "line3".getBytes,
      java.nio.file.StandardOpenOption.APPEND)
    val (n2, sha2) = BenchGate.historyIdentity(p.toString)
    assert(n2 == 3 && sha2 != sha)
    assert(BenchGate.historyIdentity("/nonexistent/h.jsonl") == (0L, ""))
  }

  test("loadHistory's coverage floor keeps subset runs out of a full run's window") {
    val dir = graft.core.TempDirs.scratch("benchgate-spec3-")
    val p = java.nio.file.Paths.get(dir, "hist.jsonl")
    val full = histLine("/d/sf0.1", "q1" -> 2.0, "q2" -> 3.0, "q3" -> 4.0)
    // five builder-iteration subset lines AFTER the full line — without
    // the floor these would evict the only real baseline
    val subsets = (1 to 5).map(i => histLine("/d/sf0.1", "q1" -> i.toDouble))
    java.nio.file.Files.write(p, ((full +: subsets).mkString("\n")).getBytes)
    // a 3-query run demands >= 2-query coverage: only the full line serves
    val loaded = BenchGate.loadHistory(p.toString, "/d/sf0.1", minQueries = 2)
    assert(loaded == Seq(BenchGate.HistLine("/d/sf0.1",
      Map("q1" -> 2.0, "q2" -> 3.0, "q3" -> 4.0), Map.empty)))
    // a subset run (minQueries 0) still sees everything
    assert(BenchGate.loadHistory(p.toString, "/d/sf0.1").size == 5)
  }

  test("loadHistory filters by sf, keeps the window, survives a missing file") {
    val dir = graft.core.TempDirs.scratch("benchgate-spec-")
    val p = java.nio.file.Paths.get(dir, "hist.jsonl")
    val lines =
      (1 to 7).map(i => histLine("/d/sf0.1", "q1" -> i.toDouble)) ++
        Seq(histLine("/d/sf0.01", "q1" -> 99.0), "garbage line")
    java.nio.file.Files.write(p, String.join("\n", lines: _*).getBytes)
    val loaded = BenchGate.loadHistory(p.toString, "/d/sf0.1")
    // window = last 5 same-sf lines: norms 3..7; the sf0.01 and garbage
    // lines are excluded
    assert(loaded == (3 to 7).map(i =>
      BenchGate.HistLine("/d/sf0.1", Map("q1" -> i.toDouble), Map.empty)))
    assert(BenchGate.loadHistory("/nonexistent/h.jsonl", "/d/sf0.1").isEmpty)
  }
}
