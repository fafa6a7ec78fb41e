package graft

import org.scalatest.funsuite.AnyFunSuite

/** Unit pins on Bench's pure budgeting/planning math (VERDICT r17
  * #2's done-criterion: "a unit spec on the projection math using
  * injected calib values") — no SparkSession, pure arithmetic. The
  * scenarios encode the two real boxes the sweep has met: the
  * builder (probe ~1.25-1.81 s) and the r16/r17 driver (~2.5x
  * slower, whose sweeps were timeout-killed in r15 and r17).
  */
class BenchBudgetSpec extends AnyFunSuite {

  test("effectiveBudget: nominal-speed box keeps the raw budget") {
    // probe at exactly nominal -> full budget
    assert(Bench.effectiveBudget(2400.0, Bench.NominalCalibSec) == 2400.0)
    // builder's fast-day probe (1.25 < nominal) must NOT inflate the
    // budget past raw — the wall cap is what bounds the sweep
    assert(Bench.effectiveBudget(2400.0, 1.25) == 2400.0)
  }

  test("effectiveBudget: a 2.5x-slower box sheds ~60% of the work " +
      "budget (the r16-driver shape)") {
    val eff = Bench.effectiveBudget(2400.0, Bench.NominalCalibSec * 2.5)
    assert(math.abs(eff - 960.0) < 1e-6, eff)
    // the 2.5x driver box is slow by the probe arm alone: it sheds
    // all extra passes + targeted re-runs — exactly the early
    // shedding VERDICT r17 #2 asks for
    assert(Bench.isSlowBox(Bench.NominalCalibSec * 2.5,
      elapsedSec = 1500.0, rep0Total = 1450.0, fullReps = 2,
      budgetSec = 2400.0))
    // a probe under the 1.6x line but with rep totals projecting
    // past the calibrated budget (the r16-driver shape at its
    // mildest) is also slow
    assert(Bench.isSlowBox(2.2, elapsedSec = 700.0,
      rep0Total = 1200.0, fullReps = 2, budgetSec = 2400.0))
    // while a merely drifty builder day — probe 1.55x nominal with
    // NORMAL rep totals (the two r18 aborted sweeps: calib 1.98 and
    // 2.365, rep 1 ~570-620 s) — is NOT slow: it keeps its second
    // pass, because a 1-rep headline costs more evidence than the
    // spare wall buys (review r18)
    assert(!Bench.isSlowBox(1.984, elapsedSec = 650.0,
      rep0Total = 570.0, fullReps = 2, budgetSec = 2400.0))
    assert(!Bench.isSlowBox(2.365, elapsedSec = 650.0,
      rep0Total = 620.0, fullReps = 2, budgetSec = 2400.0))
    // and its second pass fits the wall-cap projection gate
    assert(1300.0 + 620.0 <= 2700.0 - 150.0)
  }

  test("effectiveBudget degrades continuously, never negative") {
    val b = Bench.effectiveBudget(2400.0, 100.0)
    assert(b > 0 && b < 40.0)
    assert(Bench.effectiveBudget(2400.0, 0.0) == 2400.0) // guard, capped
  }

  test("smokeEntryEstSec: projection covers pair count and sits " +
      "above the worst confirmed sf1 ratio") {
    // a 2 s rep-1 base with warm + 1 timed pair projects 22 s
    assert(Bench.smokeEntryEstSec(2.0, 2) == 22.0)
    // per-pair budget (base + sf1) must exceed 1 + 4.13, the worst
    // confirmed suite ratio (review r18: the cap-skip projection
    // cannot afford to underestimate superlinear entries)
    assert(Bench.smokeEntryEstSec(1.0, 1) > 1.0 + 4.13)
    // the projection is what the wall-cap skip uses: a 12 s heavy
    // entry late in a slow sweep (elapsed 2600 of 2700 cap) must skip
    val est = Bench.smokeEntryEstSec(12.0, 2)
    assert(2600.0 + est > 2700.0 - 90.0)
  }

  test("plannedPairs: slow box and very heavy entries drop to one " +
      "timed pair; approx-profile keeps 5; watch set keeps 2") {
    val ls = Set("dedup_minhash")
    assert(Bench.plannedPairs("tpch_q10", 2.0, slowBox = true, ls) == 1)
    assert(Bench.plannedPairs("scan_report_e2e", 26.0, slowBox = false, ls) == 1)
    assert(Bench.plannedPairs("summary_lineitem_approx", 8.0,
      slowBox = false, ls) == 5)
    assert(Bench.plannedPairs("dedup_minhash", 4.0, slowBox = false, ls) == 2)
    assert(Bench.plannedPairs("dedup_minhash", 11.0, slowBox = false, ls) == 1)
    assert(Bench.plannedPairs("tpch_q10", 2.0, slowBox = false, ls) == 1)
  }

  test("needsWarmPair: first-touch layouts keep the warm-up pair, " +
      "pure-read shapes may drop it on a slow box") {
    Seq("tpch_q12_bucketed", "table_upsert_mor", "stream_funnel",
      "knn_graph_incremental", "knn_graph_search_only", "cdc_diff",
      "scd2_history", "table_compact_zorder", "ivm_merge",
      "table_wap_publish", "knn_ivf_incremental")
      .foreach(n => assert(Bench.needsWarmPair(n), n))
    Seq("tpch_q10", "corr_matrix", "dedup_minhash", "text_novelty",
      "typeinfer_roundtrip", "scan_report_e2e")
      .foreach(n => assert(!Bench.needsWarmPair(n), n))
  }

  test("mostVariable: ranks by relative spread, skips timer-noise " +
      "spreads, deterministic tie order") {
    val runs = Seq(
      "stable" -> Seq(1.00, 1.01),        // 1% spread
      "noisy_small" -> Seq(0.05, 0.09),   // big relative, <0.1s abs
      "cold_heavy" -> Seq(9.0, 3.0),      // 2.0 rel spread
      "drifty" -> Seq(2.0, 3.0),          // 0.5 rel spread
      "single" -> Seq(4.0))               // one run: excluded
    val top = Bench.mostVariable(runs, 2)
    assert(top == Seq("cold_heavy", "drifty"))
    // k larger than candidates: only qualifying names, stable first
    // excluded by spread < 0.1s? (0.01 abs) — excluded
    assert(Bench.mostVariable(runs, 10) == Seq("cold_heavy", "drifty"))
    // ties break by name for determinism
    val tied = Seq("b" -> Seq(1.0, 2.0), "a" -> Seq(2.0, 4.0))
    assert(Bench.mostVariable(tied, 2) == Seq("a", "b"))
  }

  test("anchor constants match BASELINE.md's r17 anchor row") {
    assert(Bench.AnchorTotalSec == 582.8)
    assert(Bench.AnchorQueries == 251)
    assert(Bench.AnchorCalibSec == 1.53)
    assert(Bench.NominalCalibSec == 1.53)
  }
}
