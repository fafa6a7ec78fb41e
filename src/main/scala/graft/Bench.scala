package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: times every registered query at the configured
  * scale factor and prints ONE JSON line (the driver's contract).
  * A throwaway job runs first so JVM/codegen warm-up isn't billed to
  * whichever query happens to run first; queries run in name order so
  * per-query numbers are comparable across rounds.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      // 16MB input splits: test-scale files are 10-60MB, the 128MB
      // default would hand a whole scan to 1-4 of the local cores
      .config("spark.sql.files.maxPartitionBytes", "16m")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000L).selectExpr("sum(id)").collect() // warm-up
    // optional comma-separated filter for focused timing runs
    val only = sys.env.get("SPARK_GRAFT_QUERIES")
      .map(_.split(',').map(_.trim).toSet)
    val selected = SparkEntry.queries
      .filter { case (n, _) => only.forall(_.contains(n)) }
    val results = selected.toSeq.sortBy(_._1).map {
      case (name, fn) =>
        val t0 = System.nanoTime()
        // a failed query must not pass off its (fast) failure time as a
        // result — record it by name so the JSON line surfaces breakage
        val ok =
          try { fn(spark, sfDir).count(); true }
          catch { case e: Throwable =>
            System.err.println(s"[bench] $name FAILED: $e"); false
          }
        (name, (System.nanoTime() - t0) / 1e9, ok)
    }
    val qs = results.map { case (k, v, _) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val failed = results.collect { case (k, _, false) => "\"" + k + "\"" }
      .mkString("[", ",", "]")
    val total = results.map(_._2).sum

    // Scale smoke: when the GenScale-produced 10x directory exists,
    // re-time the heaviest scaling queries there and report the
    // per-query 10x-data ratio (superlinear cliffs would show as
    // ratios approaching 10; see SCALE_SMOKE.md for the methodology).
    val sf1Dir = "target/sf1"
    val sf1Queries = Seq("asof_last_order", "decontaminate",
      "dedup_clusters", "dedup_exact", "dedup_incremental",
      "dedup_jaccard_block", "dedup_keep_best", "dedup_minhash",
      "freq_lineitem", "pipeline_clean", "range_join_sessions",
      "sample_weighted", "sessionize_batch", "skew_salted_join",
      "summary_lineitem", "summary_lineitem_approx",
      "summary_lineitem_onepass", "text_repetition",
      "typeinfer_roundtrip")
    val sf1Section =
      if (!new java.io.File(sf1Dir).isDirectory || only.isDefined) ""
      else {
        val base = results.collect {
          case (k, v, true) if sf1Queries.contains(k) => k -> v
        }.toMap
        val scaled = sf1Queries.flatMap { name =>
          SparkEntry.queries.get(name).flatMap { fn =>
            val t0 = System.nanoTime()
            try { fn(spark, sf1Dir).count()
              Some(name -> (System.nanoTime() - t0) / 1e9)
            } catch { case e: Throwable =>
              System.err.println(s"[bench] sf1 $name FAILED: $e"); None
            }
          }
        }
        val entries = scaled.map { case (k, v) =>
          val ratio = base.get(k).map(b => v / b)
          "\"" + k + "\":{\"sec\":" + v +
            ratio.map(r => ",\"x10_ratio\":" + math.round(r * 100) / 100.0)
              .getOrElse("") + "}"
        }.mkString("{", ",", "}")
        s""","sf1_smoke":{"dir":"$sf1Dir","copies_of_sf0.1":10,"queries":$entries}"""
      }

    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"failed":$failed,"sf":"$sfDir"$sf1Section}""")
    spark.stop()
  }
}
