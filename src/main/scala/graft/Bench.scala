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
  * false story. Each query is therefore run `reps` times (default 3)
  * and the MEDIAN is reported; the HEADLINE total is the median of
  * the `reps` whole-suite rep totals (VERDICT r14 #7 — the per-rep
  * totals ride the JSON as `rep_totals`, so the artifact carries its
  * own spread evidence); and the sf1 smoke section re-times the
  * sf0.1 base back-to-back with its sf1 twin — interleaved
  * (base, sf1, base, sf1, ...) — so each ratio compares two timings
  * that share warm-up/cache state instead of a cold base measured
  * minutes earlier. Ratios >= 10 are surfaced in a `flagged` array so
  * the <10 smoke criterion is machine-checkable from the artifact.
  *
  * Wall-clock discipline (VERDICT r15 #1): the r15 driver bench was
  * timeout-killed (rc 124) before printing, leaving the round with no
  * perf artifact of record. Three changes keep the sweep inside the
  * driver's clock: (a) the sub-second extra-reps stabilizer is gone
  * (~400 executions/sweep the headline never read), (b) the sf1 smoke
  * is CORE (worst ratios, watch items, new queries — every round,
  * first) + a TAIL that alternates halves by round parity, and (c) a
  * hard wall-clock budget (`SPARK_GRAFT_BENCH_BUDGET_SEC`, default
  * 2100 s) stops new smoke entries, recording every unstarted name in
  * `smoke_skipped` — the artifact always completes and always says
  * what it did not measure.
  */
object Bench {

  private def time(fn: => Unit): Double = {
    val t0 = System.nanoTime()
    fn
    (System.nanoTime() - t0) / 1e9
  }

  private def median(xs: Seq[Double]): Double = {
    val s = xs.sorted
    s(s.length / 2)
  }

  def main(args: Array[String]): Unit = {
    val tStart = System.nanoTime()
    def elapsedSec: Double = (System.nanoTime() - tStart) / 1e9
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "3").toInt
    // Wall-clock budget (VERDICT r15 #1): the r15 driver bench was
    // killed at its timeout (rc 124) leaving NO artifact of record —
    // a complete artifact with an honestly-recorded smoke shortfall
    // beats a perfect sweep that never prints. The base suite always
    // runs in full (the n_registered invariant needs every query
    // timed); once `elapsedSec` passes the budget, no NEW smoke
    // query starts and every unstarted name is recorded in
    // `smoke_skipped` — nothing is dropped silently.
    // 2400 s measured against the two r16 sweeps: at 2100 the sweep
    // completed in 35.6 min wall with 48 smoke skips, at 2400 in
    // 40.1 min with 19 — +300 s bought 29 more smoke entries while
    // staying well under the driver clock that killed r15 (>49 min)
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
    // optional comma-separated filter for focused timing runs
    val only = sys.env.get("SPARK_GRAFT_QUERIES")
      .map(_.split(',').map(_.trim).toSet)
    // bench times the oracle-gated queries PLUS the sketch-value
    // profile paths (no SQL oracle, so not in the correctness map —
    // see SparkEntry.benchOnlyQueries)
    val allQueries = SparkEntry.queries ++ SparkEntry.benchOnlyQueries
    val selected = allQueries
      .filter { case (n, _) => only.forall(_.contains(n)) }

    // a failed query must not pass off its (fast) failure time as a
    // result — record it by name so the JSON line surfaces breakage
    // NOTE (VERDICT r15 #1): the former "+2 extra reps for sub-second
    // queries" stabilizer is gone — at ~200 sub-second queries it was
    // ~400 extra executions per sweep, a material slice of the wall
    // time that killed the r15 driver bench, and the HEADLINE never
    // read those runs anyway (rep totals use runs 0..reps-1).
    val results = selected.toSeq.sortBy(_._1).map { case (name, fn) =>
      val runs =
        try Seq.fill(reps)(time(fn(spark, sfDir).count()))
        catch { case e: Throwable =>
          System.err.println(s"[bench] $name FAILED: $e"); Seq.empty
        }
      (name, runs, runs.nonEmpty)
    }
    val qs = results.collect { case (k, runs, true) =>
      "\"" + k + "\":" + median(runs)
    }.mkString("{", ",", "}")
    val failed = results.collect { case (k, _, false) => "\"" + k + "\"" }
      .mkString("[", ",", "]")
    // Median-of-N headline (VERDICT r14 #7): the same-HEAD r14 driver
    // bench and closing sweep differed 300 vs 239 s because the TOTAL
    // was effectively single-run. Each query already runs `reps`
    // times; summing rep i's timing across queries gives `reps`
    // whole-suite totals, and the MEDIAN of those is the headline —
    // one slow rep of any query (GC pause, box neighbor) moves one
    // rep-total, not the artifact of record. The per-rep totals ride
    // the JSON so the artifact carries its own spread evidence.
    val repTotals = (0 until reps).map { i =>
      results.collect { case (_, runs, true) => runs(i) }.sum
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
    val missing = allQueries.keySet -- results.collect {
      case (k, _, true) => k
    }

    // Scale smoke: when the GenScale-produced 10x directory exists,
    // re-time the heaviest scaling queries there and report the
    // per-query 10x-data ratio (superlinear cliffs would show as
    // ratios approaching 10; see SCALE_SMOKE.md for the methodology).
    // Base and scaled runs interleave so both sides of every ratio are
    // equally warm.
    val sf1Dir = "target/sf1"
    // Sweep budget restructure (VERDICT r15 #1): an every-query-every-
    // round smoke grew past the driver's wall clock. The smoke is now
    // CORE + ROTATING TAIL: the core — every query whose r15 x10
    // ratio was >=1.9, every historical flag/watch item, anything not
    // yet bench-timed, and the freshly broadcast-gated q10/q18 — runs
    // every round and runs FIRST (so a budget stop never costs the
    // high-value ratios); the long tail of comfortable sub-1.9
    // scalers alternates halves by round parity, so every query is
    // still measured at least every OTHER round.
    val sf1Core = Seq(
      // not yet bench-timed / changed this round
      "table_convert", "table_optimize_where", "knn_graph",
      "knn_graph_incremental", "tpch_q10", "tpch_q18",
      // r15 worst ratios (>= 1.9)
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
      "chunk_documents", "split_leakage_safe",
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
      "stream_from_table", "stream_cdf_replicate", "stream_scd2",
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
    val sf1Queries = sf1Core ++ rotatedIn
    // dev-only focused smoke runs (driver runs unfiltered)
    val onlySmoke = sys.env.get("SPARK_GRAFT_SMOKE_QUERIES")
      .map(_.split(',').map(_.trim).toSet)
    val smokeSkipped = scala.collection.mutable.ArrayBuffer[String]()
    val smoke =
      if (!new java.io.File(sf1Dir).isDirectory ||
          (only.isDefined && onlySmoke.isEmpty))
        Seq.empty[(String, Double, Double)]
      else sf1Queries.filter(n => onlySmoke.forall(_.contains(n)))
        .flatMap { name =>
        // budget check happens BEFORE each query starts — a started
        // pair-set always finishes (partial timings would lie), and
        // every unstarted name lands in smoke_skipped (no silent cap)
        if (elapsedSec > budgetSec) { smokeSkipped += name; None }
        else allQueries.get(name).flatMap { fn =>
          try {
            // the two approx-profile queries submit three concurrent
            // jobs each, which makes them the most load-sensitive
            // timings in the suite (driver r5 measured their x10
            // ratio at 7.89 vs 2.21 for the same build under
            // different box load) — more interleaved pairs tighten
            // exactly those medians at negligible suite cost
            val smokeReps =
              if (name.startsWith("summary_lineitem_")) math.max(reps, 5)
              else reps
            // one UNTIMED warm-up pair: first-touch layout builds
            // (e.g. the bucketed tables' one-time write at their
            // first sf1 call) and codegen compilation must not leak
            // into any timed pair — every reported ratio is
            // steady-state by construction, not by median luck
            // (VERDICT r11: tpch_q12_bucketed charged its ingest to
            // the query)
            fn(spark, sfDir).count()
            fn(spark, sf1Dir).count()
            val pairs = Seq.fill(smokeReps) {
              val b = time(fn(spark, sfDir).count())
              val s = time(fn(spark, sf1Dir).count())
              (b, s)
            }
            Some((name, median(pairs.map(_._1)), median(pairs.map(_._2))))
          } catch { case e: Throwable =>
            System.err.println(s"[bench] sf1 $name FAILED: $e"); None
          }
        }
      }
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
      .collect { case (k, b, s) if s / b >= 10.0 => k }
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
      case (k, b, s) if s / b >= 10.0 &&
        confirm.getOrElse(k, Double.PositiveInfinity) >= 10.0 =>
      "\"" + k + "\""
    }.mkString("[", ",", "]")
    val sf1Section =
      if (smoke.isEmpty && smokeSkipped.isEmpty) ""
      else {
        val entries = smoke.map { case (k, b, s) =>
          val r = math.round(s / b * 100) / 100.0
          val conf = confirm.get(k).map { c =>
            val cr =
              if (c.isInfinity) "\"unmeasurable\""
              else (math.round(c * 100) / 100.0).toString
            s""","confirm_ratio":$cr"""
          }.getOrElse("")
          "\"" + k + "\":{\"sec\":" + s + ",\"base_sec\":" + b +
            ",\"x10_ratio\":" + r + conf + "}"
        }.mkString("{", ",", "}")
        val skippedJson = smokeSkipped.map("\"" + _ + "\"")
          .mkString("[", ",", "]")
        val rotatedOutJson = rotatedOut.map("\"" + _ + "\"")
          .mkString("[", ",", "]")
        s""","sf1_smoke":{"dir":"$sf1Dir","copies_of_sf0.1":10,"reps":$reps,"rotation":$rotation,"queries":$entries,"flagged":$flagged,"skipped":$skippedJson,"rotated_out":$rotatedOutJson}"""
      }

    println(s"""{"metric":"total","value":$total,"unit":"sec","reps":$reps,"rep_totals":$repTotalsJson,"n_registered":$nRegistered,"queries":$qs,"failed":$failed,"sf":"$sfDir"$sf1Section}""")
    // The full line above carries per-query detail but runs far past
    // the ~2,000-char stdout tail the round driver records, so for
    // five rounds BENCH_r{N}.json held a truncated fragment. This
    // LAST line is the same headline numbers compacted well under 500
    // chars — any tail capture gets one whole parseable JSON object.
    val worst = smoke.map { case (k, b, s) => (k, s / b) }
      .sortBy(-_._2).take(3)
      .map { case (k, r) =>
        "\"" + k + "\":" + (math.round(r * 100) / 100.0)
      }.mkString("{", ",", "}")
    val totalR = math.round(total * 1000) / 1000.0
    val wallR = math.round(elapsedSec * 10) / 10.0
    println(s"""{"metric":"total","value":$totalR,"unit":"sec","reps":$reps,"rep_totals":$repTotalsJson,"n_queries":${results.count(_._3)},"n_registered":$nRegistered,"failed":$failed,"flagged":$flagged,"worst_x10_ratios":$worst,"n_smoke":${smoke.size},"n_smoke_skipped":${smokeSkipped.size},"smoke_rotation":$rotation,"wall_sec":$wallR,"sf":"$sfDir"}""")
    spark.stop()
    if (only.isEmpty && missing.nonEmpty) {
      System.err.println(s"[bench] registered queries without a " +
        s"timing: ${missing.toSeq.sorted.mkString(", ")}")
      sys.exit(1)
    }
  }
}
