package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: times every registered query at the configured
  * scale factor and prints one full per-query JSON line followed by a
  * compact (<500 char) summary JSON line — the LAST stdout line is
  * always a whole parseable object even under a 2,000-char tail
  * capture.
  *
  * Noise hardening (VERDICT r4 #1): single-run second-scale timings on
  * a shared box swing 3-19x run-to-run, which made BENCH_r04 tell a
  * false story. Each query is therefore run up to `reps` times
  * (default 3) and the MEDIAN is reported; the HEADLINE total is the
  * median of the whole-suite rep totals (VERDICT r14 #7 — the per-rep
  * totals ride the JSON as `rep_totals`, so the artifact carries its
  * own spread evidence); and the sf1 smoke section re-times the
  * sf0.1 base back-to-back with its sf1 twin — interleaved
  * (base, sf1, base, sf1, ...) — so each ratio compares two timings
  * that share warm-up/cache state instead of a cold base measured
  * minutes earlier. Ratios >= 10 are surfaced in a `flagged` array so
  * the <10 smoke criterion is machine-checkable from the artifact.
  *
  * Wall-clock discipline (VERDICT r15 #1 / r16 #1): the r15 driver
  * bench was timeout-killed (rc 124) before printing; the r16 driver
  * box then ran base reps ~2.5x slower than the builder box and the
  * old base-reps-first ordering burned the whole budget before ONE
  * smoke entry started (n_smoke 0 / 94 skipped). The sweep is now
  * ordered so a slow box sheds the LOW-value sections first:
  *
  *   calibration probe -> base rep 1 -> CORE sf1 smoke ->
  *   base reps 2..N (budget-gated) -> TAIL sf1 smoke (budget-gated)
  *   -> calibration probe
  *
  * The core smoke (worst ratios, watch items, new queries) runs every
  * round right after rep 1, so even an r16-driver-speed box produces
  * scale evidence; extra base reps degrade (reps_run in the JSON says
  * how many ran) and the tail rotates halves by round parity under
  * the hard budget (`SPARK_GRAFT_BENCH_BUDGET_SEC`, default 2400 s),
  * with every unstarted name recorded in `smoke_skipped` — the
  * artifact always completes and always says what it did not measure.
  *
  * Box-speed calibration (VERDICT r16 #2): raw sweep totals are not
  * comparable across days on a shared box (same-HEAD driver/builder
  * sweeps read 989.5 vs 396.2 s). A fixed deterministic probe — a
  * multiply-mix reduction plus a canonical 32-partition hash
  * aggregate + join, ~4 s nominal — is timed at sweep start AND end
  * and recorded as `calib_sec:[start,end]` in both JSON lines, so
  * any two artifacts can be normalized by their probe times before
  * totals are compared.
  */
object Bench {

  private def time(fn: => Unit): Double = {
    val t0 = System.nanoTime()
    fn
    (System.nanoTime() - t0) / 1e9
  }

  /** Standard median: middle element, or the mean of the two middles
    * for even counts — degraded sections can report 2-run medians
    * without an upper-value bias.
    */
  private def median(xs: Seq[Double]): Double = {
    val s = xs.sorted
    if (s.length % 2 == 1) s(s.length / 2)
    else (s(s.length / 2 - 1) + s(s.length / 2)) / 2.0
  }

  /** The box-speed probe: deterministic CPU (80M multiply-mix
    * reduction) + shuffle (8M-row hash aggregate joined to a 250k
    * dimension over 32 partitions). No data files, no randomness, no
    * query-suite code — its time moves ONLY with the box.
    */
  private def calibProbe(spark: SparkSession): Double = {
    val t = time {
      // modulo keeps the 80M-term sum inside a long under ANSI mode
      spark.range(0L, 80000000L)
        .selectExpr("sum((id * 2654435761) % 1000000007) as h")
        .collect()
      val agg = spark.range(0L, 8000000L)
        .selectExpr("id % 250000 as k", "id as v")
        .groupBy("k")
        .agg(org.apache.spark.sql.functions.sum("v").as("s"))
      val dim = spark.range(0L, 250000L)
        .selectExpr("id as k", "id % 97 as w")
      agg.join(dim, "k").selectExpr("sum(s * w)").collect()
      ()
    }
    math.round(t * 1000) / 1000.0
  }

  def main(args: Array[String]): Unit = {
    val tStart = System.nanoTime()
    def elapsedSec: Double = (System.nanoTime() - tStart) / 1e9
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "3").toInt
    // Wall-clock budget (VERDICT r15 #1): a complete artifact with an
    // honestly-recorded shortfall beats a perfect sweep that never
    // prints. 2400 s measured against the two r16 sweeps: at 2100 the
    // sweep completed in 35.6 min wall with 48 smoke skips, at 2400
    // in 40.1 min with 19 — +300 s bought 29 more smoke entries while
    // staying well under the driver clock (the r16 driver ran 3025 s
    // wall at rc 0; r15's kill fired somewhere past 49 min).
    val budgetSec = sys.env
      .getOrElse("SPARK_GRAFT_BENCH_BUDGET_SEC", "2400").toDouble
    val spark = SparkSession.builder()
      .withExtensions(new GraftExtensions)
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      // 16MB input splits: test-scale files are 10-60MB, the 128MB
      // default would hand a whole scan to 1-4 of the local cores
      .config("spark.sql.files.maxPartitionBytes", "16m")
      // don't PACK a many-small-files table into fewer partitions than
      // cores (sf1 documents = 10 sub-MB files — packed into ~2 splits
      // they ran the compute-bound quality projections near-serial)
      .config("spark.sql.files.minPartitionNum", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000L).selectExpr("sum(id)").collect() // warm-up
    // one untimed probe first: codegen/JVM warm-up must not read as
    // "the box was 2x slower at sweep start" — both recorded probes
    // are steady-state, so their spread IS box drift
    calibProbe(spark)
    val calibStart = calibProbe(spark)
    // optional comma-separated filter for focused timing runs
    val only = sys.env.get("SPARK_GRAFT_QUERIES")
      .map(_.split(',').map(_.trim).toSet)
    // bench times the oracle-gated queries PLUS the sketch-value
    // profile paths (no SQL oracle, so not in the correctness map —
    // see SparkEntry.benchOnlyQueries)
    val allQueries = SparkEntry.queries ++ SparkEntry.benchOnlyQueries
    val selected = allQueries
      .filter { case (n, _) => only.forall(_.contains(n)) }
      .toSeq.sortBy(_._1)

    // Rep-major base sweep (VERDICT r16 #1): one full pass per rep —
    // the ordering that lets the CORE smoke run between rep 1 and the
    // extra reps. A query that fails in ANY rep is recorded by name
    // and dropped from every total (a fast failure time must not pass
    // off as a result).
    val runsByQuery =
      scala.collection.mutable.LinkedHashMap[String,
        scala.collection.mutable.ArrayBuffer[Double]]()
    val failedSet = scala.collection.mutable.LinkedHashSet[String]()
    def runRep(): Unit = selected.foreach { case (name, fn) =>
      if (!failedSet.contains(name)) {
        try {
          runsByQuery.getOrElseUpdate(name,
            scala.collection.mutable.ArrayBuffer[Double]()) +=
            time(fn(spark, sfDir).count())
        } catch { case e: Throwable =>
          System.err.println(s"[bench] $name FAILED: $e")
          failedSet += name
          runsByQuery.remove(name)
          ()
        }
      }
    }
    runRep() // rep 1 — always full: the n_registered invariant needs
             // every query timed at least once
    val rep0Total = runsByQuery.values.map(_.head).sum
    // a box on which the REQUESTED base reps alone project past the
    // budget (the r16 driver shape) sheds cost everywhere it can:
    // extra base reps stop once the budget says so, and smoke entries
    // drop to 2 interleaved pairs
    val slowBox = elapsedSec + rep0Total * (reps - 1) > budgetSec

    // Scale smoke: when the GenScale-produced 10x directory exists,
    // re-time the heaviest scaling queries there and report the
    // per-query 10x-data ratio (superlinear cliffs would show as
    // ratios approaching 10; see SCALE_SMOKE.md for the methodology).
    // Base and scaled runs interleave so both sides of every ratio
    // are equally warm. CORE entries (worst ratios, watch items, new
    // queries) run right after base rep 1 — before the budget can be
    // spent — under a 1.4x-budget safety valve; TAIL entries rotate
    // halves by round parity behind the plain budget gate.
    val sf1Dir = "target/sf1"
    val sf1Core = Seq(
      // not yet bench-timed / changed this round
      "ann_recall_eval_graph", "knn_graph", "knn_graph_incremental",
      "table_optimize_where", "table_convert",
      // the r16 unadjudicated regression cluster (VERDICT r16 #3) —
      // every round until the drift story is pinned
      "sessionize_stream", "stream_drift", "stream_cdf_replicate",
      "stream_funnel", "scan_report_e2e", "split_leakage_safe",
      // broadcast-gated aggregates (VERDICT r15 #3)
      "tpch_q10", "tpch_q18",
      // r15/r16 worst ratios (>= 1.9)
      "table_merge", "tpch_q12_bucketed", "corr_matrix",
      "table_sql_merge", "table_upsert_mor", "cdc_diff",
      "drift_ks_matrix", "tpch_q12", "table_clone",
      "stream_table_ingest", "skew_salted_join", "tpch_q13",
      "table_pruned_scan", "table_compact_zorder", "tpch_q9",
      "table_changes", "bigram_logprob", "image_neardup",
      "decontaminate", "text_novelty", "table_sql_clone",
      "scd2_history", "dedup_substring", "dsir_select",
      // historical flags / structurally load-sensitive watch items
      "dedup_minhash", "minhash_eval", "typeinfer_roundtrip",
      "summary_lineitem_approx", "summary_lineitem_onepass",
      "dedup_substring_apply", "dedup_containment")
    val sf1Tail = Seq("asof_last_order", "col_entropy", "data_split",
      "dedup_chunks", "dedup_clusters", "dedup_exact",
      "dedup_incremental", "dedup_jaccard_block", "dedup_keep_best",
      "doc_length_hist", "drift_ks", "drift_psi",
      "hist_equidepth", "bpe_encode",
      "multimodal_features", "multimodal_resize",
      "chunk_documents",
      "nb_quality_score", "table_compaction",
      "epoch_shuffle", "table_profile_snapshot",
      "bm25_search",
      "hybrid_search", "knn_ivf_incremental", "image_dhash",
      "audio_fingerprint", "sessionize_native",
      "knn_filtered", "knn_sq8", "budget_select", "quarantine_route",
      "video_scenecut", "audio_neardup",
      "dedup_boilerplate", "dedup_intradoc", "dedup_soft_weights",
      "table_bloom_lookup", "table_schema_evolution",
      "table_schema_evolution2", "table_evolve_prune",
      "table_sql_read",
      "table_fast_count", "table_sql_dml",
      "table_sql_ddl", "table_sql_time_travel", "table_sql_maintenance",
      "table_sql_changes", "table_sql_history", "table_sql_restore",
      "table_sql_ctas", "table_sql_replace",
      "table_sql_vacuum_dry",
      "table_pruned_string", "table_vacuum", "table_ref_read",
      "table_wap_publish", "table_read_where", "table_mor_reinsert",
      "table_read_where_time",
      "decontaminate_semantic", "embed_variance",
      "embed_pca_contract", "embed_abtt_contract", "ann_recall_eval",
      "text_hash_embed", "knn_text_hash", "contamination_by_source",
      "seasonal_decompose", "changepoint_cusum", "event_pmi",
      "ivm_merge", "knn_pq", "knn_ivfpq",
      "multimodal_audio", "hard_negatives", "bpe_roundtrip",
      "freq_approx_topk", "group_quantiles", "group_topk",
      "keywords_tfidf", "quality_deciles", "tpch_q7", "tpch_q8",
      "tpch_q14", "tpch_q15",
      "tpch_q17", "tpch_q19", "tpch_q21", "tpch_q22",
      "event_transitions", "embed_outliers", "table_append_race",
      "stream_gdpr_erasure",
      "stream_erase_reingest", "stream_dedup_ingest",
      "stream_from_table", "stream_scd2",
      "table_mor_delete", "embed_group_stats",
      "sample_weighted_stratified",
      "unigram_logprob", "vocab_coverage",
      "freq_lineitem", "pack_sequences", "pipeline_clean",
      "range_join_sessions", "rolling_revenue", "sample_exactk",
      "sample_weighted", "sessionize_batch",
      "summary_lineitem", "text_repetition")
    // Deterministic per-round rotation: the committed BENCH_r*.json
    // count increments exactly once per round, so the tail alternates
    // halves without any manual per-round edit. Overridable for
    // focused runs; a listing failure degrades to half 0.
    val benchArtifacts = Option(new java.io.File(".").listFiles)
      .map(_.count(_.getName.matches("BENCH_r\\d+\\.json")))
      .getOrElse(0)
    // a cwd without the committed artifacts (a non-repo-root launch)
    // would silently PIN rotation to half 0 every round — surface it
    if (benchArtifacts == 0 &&
        sys.env.get("SPARK_GRAFT_SMOKE_ROTATION").isEmpty)
      System.err.println("[bench] no BENCH_r*.json in cwd — smoke " +
        "rotation pinned to half 0 (launch from the repo root or set " +
        "SPARK_GRAFT_SMOKE_ROTATION to a 0-3 cycle to alternate)")
    // one seed drives BOTH rotation bits so the env override covers
    // both (review r16): bit 0 picks the tail half, bit 1 the scan
    // direction. Budget skips always eat the END of the list, so a
    // fixed direction would starve the same late-tail queries every
    // round — alternating it means that over 4 rounds each half runs
    // once from each end, covering everything even at a ~50% skip
    // rate. Cycle SPARK_GRAFT_SMOKE_ROTATION through 0..3 to get the
    // same guarantee on non-repo-root launches.
    val rotSeed = sys.env.get("SPARK_GRAFT_SMOKE_ROTATION")
      .map(_.toInt).getOrElse(benchArtifacts)
    val rotation = rotSeed % 2
    val rotatedHalf = sf1Tail.zipWithIndex
      .collect { case (q, i) if i % 2 == rotation => q }
    val rotatedIn =
      if ((rotSeed / 2) % 2 == 1) rotatedHalf.reverse
      else rotatedHalf
    val rotatedOut = sf1Tail.filterNot(rotatedIn.contains)
    // dev-only focused smoke runs (driver runs unfiltered)
    val onlySmoke = sys.env.get("SPARK_GRAFT_SMOKE_QUERIES")
      .map(_.split(',').map(_.trim).toSet)
    val smokeSkipped = scala.collection.mutable.ArrayBuffer[String]()
    val smokeEnabled = new java.io.File(sf1Dir).isDirectory &&
      (only.isEmpty || onlySmoke.isDefined)
    def runSmoke(names: Seq[String],
        core: Boolean): Seq[(String, Double, Double, Int)] =
      if (!smokeEnabled) Seq.empty
      else names.filter(n => onlySmoke.forall(_.contains(n)))
        .flatMap { name =>
        // CORE entries run past the budget (they are the reason the
        // smoke was reordered) up to a 1.25x safety valve — tight
        // enough that even an r16-driver-speed box (3025 s wall, the
        // slowest survivor observed) finishes the last started
        // pair-set inside the driver clock (review r17: 1.4x put the
        // worst case past it); TAIL entries stop at the budget.
        // Every unstarted name lands in smoke_skipped — no silent
        // cap. A started pair-set always finishes (partial timings
        // would lie).
        val over = elapsedSec > (if (core) budgetSec * 1.25 else budgetSec)
        if (over) { smokeSkipped += name; None }
        else allQueries.get(name).flatMap { fn =>
          try {
            // the two approx-profile queries submit three concurrent
            // jobs each, which makes them the most load-sensitive
            // timings in the suite (driver r5 measured their x10
            // ratio at 7.89 vs 2.21 for the same build under
            // different box load) — more interleaved pairs tighten
            // exactly those medians at negligible suite cost.
            // Degradation under pressure: a slow box (or any entry
            // started past the budget) drops to ONE timed pair — a
            // single steady-state pair after the untimed warm-up is
            // still a valid like-for-like ratio, and on the r16
            // driver box it is what fits all core entries under the
            // valve. The pair count rides each JSON entry so a 1-pair
            // ratio can never read as a median (review r17).
            val wanted =
              if (name.startsWith("summary_lineitem_")) math.max(reps, 5)
              else reps
            // one UNTIMED warm-up pair: first-touch layout builds
            // (e.g. the bucketed tables' one-time write at their
            // first sf1 call) and codegen compilation must not leak
            // into any timed pair — every reported ratio is
            // steady-state by construction, not by median luck
            // (VERDICT r11: tpch_q12_bucketed charged its ingest to
            // the query). Its wall time also SIZES the entry: a pair
            // that already costs tens of seconds (the heavy
            // streaming/composition shapes) gets 1-2 timed pairs so
            // one expensive entry cannot starve the rest of the core
            // — the per-entry `pairs` field keeps the artifact honest
            // about it.
            val warmSec = time {
              fn(spark, sfDir).count()
              fn(spark, sf1Dir).count()
            }
            val smokeReps =
              if (slowBox || elapsedSec > budgetSec || warmSec > 25.0) 1
              else if (warmSec > 10.0) math.min(wanted, 2)
              else wanted
            val pairs = Seq.fill(smokeReps) {
              val b = time(fn(spark, sfDir).count())
              val s = time(fn(spark, sf1Dir).count())
              (b, s)
            }
            Some((name, median(pairs.map(_._1)), median(pairs.map(_._2)),
              smokeReps))
          } catch { case e: Throwable =>
            System.err.println(s"[bench] sf1 $name FAILED: $e"); None
          }
        }
      }

    // CORE smoke first (VERDICT r16 #1): the r16 driver spent its
    // whole budget on base reps and recorded zero scale evidence —
    // the high-value ratios now land before reps 2..N can spend it.
    // Ordered by the rep-1 base timing ASCENDING: a budget/valve cut
    // always eats the end, so cheap-first maximizes how many core
    // entries survive on a slow box (the expensive shapes are also
    // the most load-sensitive, i.e. the least informative under
    // exactly the conditions that force the cut).
    val coreOrdered = sf1Core.sortBy(n =>
      runsByQuery.get(n).map(_.head).getOrElse(Double.MaxValue))
    val coreSmoke = runSmoke(coreOrdered, core = true)
    // extra base reps, each gated on the budget actually having room
    // for a full pass — projected from the LATEST completed rep
    // total, not rep 1's: rep-major rep 1 carries all warm-up (this
    // box measured 596 s cold vs 364 s warm), and projecting the
    // warm reps at cold speed wrongly dropped rep 3
    var repsRun = 1
    var lastRepTotal = rep0Total
    while (repsRun < reps &&
        elapsedSec + lastRepTotal <= budgetSec * 1.25) {
      runRep(); repsRun += 1
      lastRepTotal = selected.flatMap { case (n, _) =>
        runsByQuery.get(n).filter(_.size == repsRun).map(_.last)
      }.sum
    }
    val tailSmoke = runSmoke(rotatedIn, core = false)
    val smoke = coreSmoke ++ tailSmoke

    val ok = selected.collect {
      case (name, _) if runsByQuery.get(name).exists(_.size == repsRun)
        => (name, runsByQuery(name).toSeq)
    }
    val qs = ok.map { case (k, runs) =>
      "\"" + k + "\":" + median(runs)
    }.mkString("{", ",", "}")
    val failed = failedSet.toSeq.map("\"" + _ + "\"")
      .mkString("[", ",", "]")
    // Median-of-N headline (VERDICT r14 #7): summing rep i's timing
    // across queries gives `reps_run` whole-suite totals, and the
    // MEDIAN of those is the headline — one slow rep of any query
    // (GC pause, box neighbor) moves one rep-total, not the artifact
    // of record. The per-rep totals ride the JSON so the artifact
    // carries its own spread evidence.
    val repTotals = (0 until repsRun).map { i =>
      ok.map { case (_, runs) => runs(i) }.sum
    }
    val total = median(repTotals)
    val repTotalsJson = repTotals
      .map(t => math.round(t * 1000) / 1000.0)
      .mkString("[", ",", "]")
    // ONE authoritative count: every registered query must carry a
    // timing in this artifact. n_registered is the registry size
    // (|queries| + |benchOnlyQueries|); on an unfiltered run any gap
    // between it and n_queries is exactly the failed list, and the
    // process exits nonzero so a partial artifact can't read as a
    // clean one.
    val nRegistered = allQueries.size
    val missing = allQueries.keySet -- ok.map(_._1)

    // Confirm-before-flag (VERDICT r13 #1): a >=10x first-pass ratio
    // can be pure box noise — the r13 artifact of record carried
    // dsir_select at 14.08 while three same-HEAD re-measurements said
    // 1.5-1.9. A flag is an artifact-of-record claim, so it must be
    // SELF-adjudicated before it is emitted: any candidate re-runs its
    // interleaved (base, sf1) pairs in ISOLATION at the end of the
    // sweep (no heavy neighbors sharing the JVM mid-measurement,
    // extra reps), and only a CONFIRMING second measurement flags.
    // Both ratios land in the JSON, so the artifact carries its own
    // adjudication evidence either way.
    val confirm: Map[String, Double] = smoke
      .collect { case (k, b, s, _) if s / b >= 10.0 => k }
      .flatMap { name =>
        allQueries.get(name).flatMap { fn =>
          try {
            fn(spark, sfDir).count() // untimed warm-up pair
            fn(spark, sf1Dir).count()
            val pairs = Seq.fill(math.max(reps, 5)) {
              val b = time(fn(spark, sfDir).count())
              val s = time(fn(spark, sf1Dir).count())
              (b, s)
            }
            Some(name ->
              (median(pairs.map(_._2)) / median(pairs.map(_._1))))
          } catch { case e: Throwable =>
            // an unmeasurable confirmation keeps the flag: a query
            // that crashes its re-run must not read as exonerated
            System.err.println(s"[bench] confirm $name FAILED: $e")
            Some(name -> Double.PositiveInfinity)
          }
        }
      }.toMap
    val flagged = smoke.collect {
      case (k, b, s, _) if s / b >= 10.0 &&
        confirm.getOrElse(k, Double.PositiveInfinity) >= 10.0 =>
      "\"" + k + "\""
    }.mkString("[", ",", "]")
    val calibEnd = calibProbe(spark)
    val calibJson = s"[$calibStart,$calibEnd]"
    val sf1Section =
      if (smoke.isEmpty && smokeSkipped.isEmpty) ""
      else {
        val entries = smoke.map { case (k, b, s, p) =>
          val r = math.round(s / b * 100) / 100.0
          val conf = confirm.get(k).map { c =>
            val cr =
              if (c.isInfinity) "\"unmeasurable\""
              else (math.round(c * 100) / 100.0).toString
            s""","confirm_ratio":$cr"""
          }.getOrElse("")
          "\"" + k + "\":{\"sec\":" + s + ",\"base_sec\":" + b +
            ",\"x10_ratio\":" + r + ",\"pairs\":" + p + conf + "}"
        }.mkString("{", ",", "}")
        val skippedJson = smokeSkipped.map("\"" + _ + "\"")
          .mkString("[", ",", "]")
        val rotatedOutJson = rotatedOut.map("\"" + _ + "\"")
          .mkString("[", ",", "]")
        s""","sf1_smoke":{"dir":"$sf1Dir","copies_of_sf0.1":10,"reps":$reps,"rotation":$rotation,"queries":$entries,"flagged":$flagged,"skipped":$skippedJson,"rotated_out":$rotatedOutJson}"""
      }

    println(s"""{"metric":"total","value":$total,"unit":"sec","reps":$reps,"reps_run":$repsRun,"rep_totals":$repTotalsJson,"calib_sec":$calibJson,"n_registered":$nRegistered,"queries":$qs,"failed":$failed,"sf":"$sfDir"$sf1Section}""")
    // The full line above carries per-query detail but runs far past
    // the ~2,000-char stdout tail the round driver records, so for
    // five rounds BENCH_r{N}.json held a truncated fragment. This
    // LAST line is the same headline numbers compacted well under 500
    // chars — any tail capture gets one whole parseable JSON object.
    val worst = smoke.map { case (k, b, s, _) => (k, s / b) }
      .sortBy(-_._2).take(3)
      .map { case (k, r) =>
        "\"" + k + "\":" + (math.round(r * 100) / 100.0)
      }.mkString("{", ",", "}")
    val totalR = math.round(total * 1000) / 1000.0
    val wallR = math.round(elapsedSec * 10) / 10.0
    println(s"""{"metric":"total","value":$totalR,"unit":"sec","reps":$reps,"reps_run":$repsRun,"rep_totals":$repTotalsJson,"calib_sec":$calibJson,"n_queries":${ok.size},"n_registered":$nRegistered,"failed":$failed,"flagged":$flagged,"worst_x10_ratios":$worst,"n_smoke":${smoke.size},"n_smoke_skipped":${smokeSkipped.size},"smoke_rotation":$rotation,"wall_sec":$wallR,"sf":"$sfDir"}""")
    spark.stop()
    if (only.isEmpty && missing.nonEmpty) {
      System.err.println(s"[bench] registered queries without a " +
        s"timing: ${missing.toSeq.sorted.mkString(", ")}")
      sys.exit(1)
    }
  }
}
