package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Skew

/** Demonstrates and gates the scale techniques the engine relies on:
  * salted joins for hot keys and bucketed tables for co-located
  * (shuffle-free) joins.
  */
class ScaleTechniquesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("salted join equals plain join on skewed data") {
    // 90% of left rows share one hot key
    val left = (1 to 10000)
      .map(i => (if (i % 10 == 0) i % 7 else 1L, i))
      .toDF("k", "v")
    val right = (0L to 10L).map(k => (k, s"dim$k")).toDF("k", "name")
    val plain = left.join(right, "k").agg(count(lit(1)), sum("v")).head()
    // exact counts (sampleFraction = 1.0) keep the tiny fixture
    // deterministic; the hot key must be detected and salted
    val salted = Skew.saltedJoin(left, right, "k", saltFactor = 8,
      sampleFraction = 1.0)
    assert(plain == salted.agg(count(lit(1)), sum("v")).head())
    // two-path shape: exactly one explode (the hot branch) — the cold
    // branch must NOT replicate its build side
    val generates = "Generate explode".r
      .findAllMatchIn(salted.queryExecution.executedPlan.toString).length
    assert(generates == 1, s"expected 1 hot-path explode, got $generates")
  }

  test("salted join with no hot keys is a plain un-salted join") {
    val left = (1 to 2000).map(i => (i.toLong % 100, i)).toDF("k", "v")
    val right = (0L until 100L).map(k => (k, s"dim$k")).toDF("k", "name")
    val joined = Skew.saltedJoin(left, right, "k", saltFactor = 8,
      sampleFraction = 1.0)
    val plan = joined.queryExecution.executedPlan.toString
    // uniform keys (20 rows each, threshold = 2 partitions' worth):
    // nothing is hot, so nothing is replicated and no salt column exists
    assert(!plan.contains("Generate explode"), s"unexpected explode:\n$plan")
    assert(!plan.contains("__salt"), s"unexpected salt column:\n$plan")
    assert(joined.count() == 2000)
  }

  test("salted join honors an explicit hot-key threshold") {
    val left = ((1 to 900).map(_ => (7L, 1)) ++
      (1 to 100).map(i => (i.toLong % 5, 2))).toDF("k", "v")
    val right = (0L to 7L).map(k => (k, s"dim$k")).toDF("k", "name")
    val plain = left.join(right, "k").agg(count(lit(1)), sum("v")).head()
    val salted = Skew.saltedJoin(left, right, "k", saltFactor = 4,
      hotKeyThreshold = Some(500L), sampleFraction = 1.0)
    assert(plain == salted.agg(count(lit(1)), sum("v")).head())
  }

  test("bucketed tables join without a shuffle exchange") {
    // warehouse.dir is a static conf — use the default spark-warehouse
    // (gitignored); a fresh session isolates the dynamic join configs
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    import s2.implicits._
    val a = (1 to 1000).map(i => (i.toLong, i * 2)).toDF("ka", "va")
    val b = (1 to 1000).map(i => (i.toLong, i * 3)).toDF("kb", "vb")
    val base = graft.config.Scratch.dir + "/spec_bucketed"
    graft.sources.BucketedTable.write(a, "bucketed_a", s"$base/a", "ka", 8)
    graft.sources.BucketedTable.write(b, "bucketed_b", s"$base/b", "kb", 8)
    val joined = graft.sources.BucketedTable.colocatedJoin(
      s2, "bucketed_a", "ka", "bucketed_b", "kb")
    val plan = joined.queryExecution.executedPlan.toString
    // co-located bucketed join: sort-merge with NO shuffle exchange
    assert(!plan.contains("Exchange hashpartitioning"),
      s"unexpected shuffle in bucketed join plan:\n$plan")
    assert(joined.count() == 1000)
    // the negative: MISMATCHED bucket counts lose co-location — the
    // planner must shuffle again (why BucketedTable documents equal
    // bucket counts as part of the layout contract)
    s2.conf.set("spark.sql.bucketing.coalesceBucketsInJoin.enabled",
      "false")
    graft.sources.BucketedTable.write(b, "bucketed_b4", s"$base/b4",
      "kb", 4)
    val mismatched = graft.sources.BucketedTable.colocatedJoin(
      s2, "bucketed_a", "ka", "bucketed_b4", "kb")
    assert(mismatched.queryExecution.executedPlan.toString
      .contains("Exchange hashpartitioning"),
      "expected a shuffle for mismatched bucket counts")
    // restart survival: drop the catalog entries (the data and the
    // persisted layout specs stay on disk — exactly what a new JVM's
    // empty in-memory catalog sees), re-register from the specs, and
    // the join must still plan Exchange-free over the SAME files
    s2.sql("DROP TABLE IF EXISTS bucketed_a")
    s2.sql("DROP TABLE IF EXISTS bucketed_b")
    assert(graft.sources.BucketedTable.register(s2, "bucketed_a",
      s"$base/a"))
    assert(graft.sources.BucketedTable.register(s2, "bucketed_b",
      s"$base/b"))
    val revived = graft.sources.BucketedTable.colocatedJoin(
      s2, "bucketed_a", "ka", "bucketed_b", "kb")
    assert(!revived.queryExecution.executedPlan.toString
      .contains("Exchange hashpartitioning"),
      "re-registered bucketed join lost co-location")
    assert(revived.count() == 1000)
    // register on a path with no spec reports false (caller writes)
    assert(!graft.sources.BucketedTable.register(s2, "bucketed_nope",
      s"$base/nowhere"))
    s2.sql("DROP TABLE IF EXISTS bucketed_a")
    s2.sql("DROP TABLE IF EXISTS bucketed_b")
    s2.sql("DROP TABLE IF EXISTS bucketed_b4")
  }

  // ---------------------------------------------------------------
  // Plan-shape gates: the properties that make operators scale are
  // asserted on the physical plan, so a refactor that silently
  // de-broadcasts a dimension side or introduces an Expand fails here
  // rather than in a 100 TB run.
  // ---------------------------------------------------------------

  test("AQE splits the skewed side of a sort-merge join at runtime " +
      "(the complement of Skew.saltedJoin's static two-path salting)") {
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.adaptive.enabled", "true")
    s2.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    s2.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
    s2.conf.set(
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "1m")
    s2.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "512k")
    s2.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    s2.conf.set("spark.sql.shuffle.partitions", "8")
    import s2.implicits._
    // one hot key carrying 100k rows of INCOMPRESSIBLE ~128-byte
    // payload (shuffle sizes are post-compression — constant padding
    // would deflate to nothing) against ~0.9 MB median partitions:
    // the skew rule (> max(factor * median, threshold)) fires on
    // exactly that key's partition
    val payload = concat(md5(col("id").cast("string")),
      md5((col("id") + 1).cast("string")),
      md5((col("id") + 2).cast("string")),
      md5((col("id") + 3).cast("string")))
    val hot = s2.range(100000).select(lit(1L).as("k"), col("id"))
    val cold = s2.range(999L * 50)
      .select((col("id") % 999 + 2).as("k"), col("id"))
    val left = hot.union(cold).select(col("k"), payload.as("payload"))
    val right = (1L to 1000L).map(k => (k, k * 2)).toDF("k", "v")
    val joined = left.join(right, "k")
    // materialize through the SAME QueryExecution so the adaptive
    // plan is final, then check the skew-split marker
    assert(joined.collect().length == 100000 + 999 * 50)
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("skew=true"),
      s"expected AQE skew-split SortMergeJoin in final plan:\n$plan")
  }

  test("a selective dimension filter injects a runtime bloom filter " +
      "on the fact side of a shuffle join") {
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled",
      "true")
    // local test files are far under the 10 GB default application
    // threshold — drop it so the injection rule can fire at test scale
    s2.conf.set("spark.sql.optimizer.runtime.bloomFilter." +
      "applicationSideScanSizeThreshold", "0")
    s2.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    val fact = s2.read
      .parquet("/root/testdata/sf0.001/lineitem.parquet")
    val dim = s2.read.parquet("/root/testdata/sf0.001/orders.parquet")
      .where(col("o_orderpriority") === "1-URGENT")
    val j = fact.join(dim, col("l_orderkey") === col("o_orderkey"))
    val plan = j.queryExecution.executedPlan.toString
    assert(plan.contains("might_contain"),
      s"expected a runtime bloom filter on the fact scan:\n$plan")
    assert(j.count() > 0)
  }

  test("corrMatrix plans one aggregation pass with no Expand") {
    val df = (1 to 100).map(i =>
      (i.toDouble, i * 2.0, i * 3.0)).toDF("x", "y", "z")
    val plan = graft.operators.Profile.corrMatrix(df, Seq("x", "y", "z"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Expand"),
      s"corrMatrix must not multiply rows through Expand:\n$plan")
    // all sums fold into hash aggregation (codegen'd partials), and
    // the only window-free reshape is the explode over ONE row
    assert(plan.contains("HashAggregate"), plan)
    assert(!plan.contains("Window"), plan)
  }

  test("ngramNovelty joins gram-keyed with no cartesian or " +
      "data-sized window") {
    val docs = (1 to 50).map(i =>
      (i.toLong, s"w$i alpha beta gamma delta")).toDF("doc_id", "text")
    val plan = graft.operators.TextMetrics
      .ngramNovelty(docs, "doc_id", "text", 3)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"ngramNovelty must never go all-pairs:\n$plan")
    assert(!plan.contains("Window"), plan)
  }

  test("decontaminate broadcasts the benchmark n-gram side") {
    val corpus = (1 to 100)
      .map(i => (i.toLong, s"tok$i alpha beta gamma delta"))
      .toDF("doc_id", "text")
    val bench = Seq(Tuple1("alpha beta gamma")).toDF("text")
    val plan = graft.operators.TextMetrics
      .decontaminate(corpus, "doc_id", "text", bench, "text", 3)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"benchmark side not broadcast:\n$plan")
  }

  test("one-pass profile sketch plans one ObjectHashAggregate, no Expand") {
    val df = (1 to 100).map(i => (i.toLong, s"s$i")).toDF("a", "b")
    val agg = df.agg(
      graft.functions.ProfileSketchAgg.sketch(col("a"),
        col("a").cast("double"), isString = false).as("sa"),
      graft.functions.ProfileSketchAgg.sketch(col("b"),
        lit(null).cast("double"), isString = true).as("sb"))
    val plan = agg.queryExecution.executedPlan.toString
    assert(plan.contains("ObjectHashAggregate"), plan)
    assert(!plan.contains("Expand"),
      s"one-pass sketch must not multiply rows:\n$plan")
  }

  test("as-of join plans exactly one key shuffle") {
    val left = (1 to 50).map(i => (i.toLong % 5, i.toLong)).toDF("k", "t")
    val right = (1 to 20).map(i => (i.toLong % 5, i.toLong, i * 1.0))
      .toDF("k", "t", "v")
    val plan = graft.operators.AsofJoin
      .asofJoin(left, "k", "t", right, "k", "t", "v")
      .queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning".r
      .findAllMatchIn(plan).length
    assert(exchanges == 1,
      s"expected exactly 1 key shuffle, found $exchanges:\n$plan")
  }

  test("directional as-of plans exactly one key shuffle and one sort " +
      "for BOTH direction frames") {
    val left = (1 to 50).map(i => (i.toLong % 5, i.toLong)).toDF("k", "t")
    val right = (1 to 20).map(i => (i.toLong % 5, i.toLong, i * 1.0))
      .toDF("k", "t", "v")
    val plan = graft.operators.AsofJoin
      .asofJoinDirectional(left, "k", "t", right, "k", "t", "v",
        direction = "nearest")
      .queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning".r
      .findAllMatchIn(plan).length
    assert(exchanges == 1,
      s"expected exactly 1 key shuffle, found $exchanges:\n$plan")
    val sorts = "\\bSort \\[".r.findAllMatchIn(plan).length
    assert(sorts == 1,
      s"backward+forward frames must share one sort, found $sorts:\n$plan")
  }

  test("bigramLogprob joins the bigram dictionary shuffle-keyed while " +
      "the unigram sides stay broadcast") {
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    val docs = s2.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val plan = graft.operators.TextMetrics
      .bigramLogprob(docs, "doc_id", "text")
      .queryExecution.executedPlan.toString
    // the explicit broadcast hints survive a disabled auto-threshold:
    // two unigram joins + the 1-row total
    val bcasts = "BroadcastHashJoin".r.findAllMatchIn(plan).length +
      "BroadcastNestedLoopJoin".r.findAllMatchIn(plan).length
    assert(bcasts >= 3, s"unigram/total sides must broadcast:\n$plan")
    // the bigram dictionary join must NOT be broadcast — it outgrows
    // any driver at corpus scale
    assert(plan.contains("SortMergeJoin") ||
      plan.contains("ShuffledHashJoin"),
      s"bigram dictionary join must shuffle:\n$plan")
    assert(!plan.contains("CartesianProduct"), plan)
  }

  test("weighted stratified sampling plans the thin filter below the " +
      "rank window (survivors only reach the window)") {
    val df = spark.range(0, 2000).select(col("id"),
      (col("id") % 3).cast("string").as("g"),
      (pmod(col("id"), lit(7)) + 1).cast("double").as("w"))
    val plan = graft.operators.Sampling
      .weightedStratifiedExactK(df, "g", "w", 20, seed = 1L)
      .queryExecution.executedPlan.toString
    // Catalyst fuses the ladder test (the LOG(2.0, ...) level
    // expression vs the per-group cut) into the broadcast-join
    // condition — either way it must evaluate BELOW the rank window
    val winAt = plan.indexOf("Window")
    val ladderAt = plan.indexOf("LOG(2.0")
    assert(winAt >= 0 && ladderAt >= 0 && winAt < ladderAt,
      s"ladder cut must sit below the rank window:\n$plan")
  }

  test("hive-partitioned layout prunes partitions at the scan") {
    val dir = graft.config.Scratch.dir + "/prune_spec"
    val df = (1 to 300)
      .map(i => (i.toLong, Seq("en", "de", "fr")(i % 3), s"text $i"))
      .toDF("id", "lang", "text")
    df.write.mode("overwrite").partitionBy("lang").parquet(dir)
    val pruned = spark.read.parquet(dir).where(col("lang") === "en")
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") &&
      plan.contains("lang"), s"no partition filter in plan:\n$plan")
    assert(pruned.count() == 100)
    // the pruned scan must touch only the matching partition's files
    val files = pruned
      .select(org.apache.spark.sql.functions.input_file_name())
      .distinct().collect().map(_.getString(0))
    assert(files.nonEmpty && files.forall(_.contains("lang=en")),
      s"read beyond lang=en: ${files.mkString(", ")}")
  }

  test("Misra-Gries frequency plans one ObjectHashAggregate, no Expand") {
    val df = (1 to 100).map(i => s"v${i % 7}").toDF("v")
    val plan = graft.operators.Frequency.approxTopK(df, Seq("v"), k = 3)
      .queryExecution.executedPlan.toString
    assert(plan.contains("ObjectHashAggregate"), plan)
    assert(!plan.contains("Expand"), plan)
  }

  test("hash split is reproducible, partition-independent, and close " +
      "to its fractions") {
    val df = (0L until 10000L).toDF("id")
    def dist(d: org.apache.spark.sql.DataFrame): Map[String, Long] =
      graft.operators.Sampling.assignSplits(d, "id",
        Seq("train" -> 0.9, "valid" -> 0.05, "test" -> 0.05))
        .groupBy("split").count()
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val a = dist(df)
    val b = dist(df.repartition(13)) // layout must not change assignment
    assert(a == b)
    assert(math.abs(a("train") - 9000L) < 300 &&
      math.abs(a("valid") - 500L) < 150 && math.abs(a("test") - 500L) < 150,
      s"split distribution off: $a")
  }

  test("IVF centroid assignment broadcasts centroids, never a " +
      "cartesian product") {
    val vecs = (0 until 40)
      .map(i => (i.toLong, Array.fill(4)(i.toFloat + 1)))
      .toDF("vec_id", "embedding")
    val plan = graft.operators.Similarity
      .knnIvf(vecs, "vec_id", "embedding", numCentroids = 4, nprobe = 2,
        numQueries = 2, k = 2)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastNestedLoopJoin") ||
      plan.contains("BroadcastHashJoin"),
      s"centroids not broadcast:\n$plan")
    assert(!plan.contains("CartesianProduct"),
      s"cartesian product in IVF plan:\n$plan")
  }
}
