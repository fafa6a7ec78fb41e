package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Per-column profile statistics — the reference's core product.
  *
  * The reference iterates over columns in driver memory and computes each
  * column's counters/stats separately (whiteRRabbit.R:309-423). Here the
  * whole profile is ONE Spark aggregation: every column's counters and
  * moments are expressions inside a single `agg()`, so the input is
  * scanned once (columnar, whole-stage-codegen), partially aggregated
  * map-side, and reduced to a single row — no wide shuffle. The one-row
  * result is reshaped driver-side into one output row per column.
  *
  * Scale notes (100 TB):
  *   - `countDistinct` on N columns rewrites to an `expand` + hash
  *     aggregate; it is exact, matching the reference
  *     (whiteRRabbit.R:327). For columns where exactness is not needed,
  *     see [[summarizeApprox]] which uses HLL sketches and exact-median
  *     replaced by `percentile_approx` — single-pass, spill-free.
  *   - Exact `percentile` buffers per-group values; on one global group
  *     this means a per-partition buffer merge on the driver-side
  *     reducer. At 100 TB prefer the approx variant.
  */
object Profile {

  /** Typed summary schema. Numerics stay numeric and timestamps surface
    * as epoch microseconds, so results can be compared exactly against a
    * SQL oracle; [[referenceSummary]] maps this to the reference's
    * 18 string fields (whiteRRabbit.R:402-423).
    */
  val summarySchema: StructType = StructType(Seq(
    StructField("column_name", StringType, nullable = false),
    StructField("data_type", StringType, nullable = false),
    StructField("total_count", LongType, nullable = false),
    StructField("non_missing", LongType, nullable = false),
    StructField("missing_count", LongType, nullable = false),
    StructField("empty_count", LongType, nullable = false),
    StructField("distinct_count", LongType, nullable = false),
    StructField("min_val", DoubleType, nullable = true),
    StructField("max_val", DoubleType, nullable = true),
    StructField("mean_val", DoubleType, nullable = true),
    StructField("median_val", DoubleType, nullable = true),
    StructField("sd_val", DoubleType, nullable = true),
    StructField("q1_val", DoubleType, nullable = true),
    StructField("q3_val", DoubleType, nullable = true),
    StructField("iqr_val", DoubleType, nullable = true),
    StructField("earliest_us", LongType, nullable = true),
    StructField("latest_us", LongType, nullable = true),
    StructField("median_us", LongType, nullable = true)
  ))

  private def isNum(dt: DataType): Boolean = dt.isInstanceOf[NumericType]
  // Parquet written without isAdjustedToUTC surfaces as TIMESTAMP_NTZ in
  // Spark 4; with the session tz pinned to UTC it denotes the same
  // instant, so both flavors get the date-stat treatment.
  private def isTs(dt: DataType): Boolean =
    dt == TimestampType || dt == DateType || dt == TimestampNTZType

  /** R class name for the summary's DataType field, matching what the
    * reference records after type promotion (whiteRRabbit.R:311, :403).
    */
  private def rClassName(dt: DataType): String = dt match {
    case StringType                         => "character"
    case t if isNum(t)                      => "numeric"
    case TimestampType | TimestampNTZType   => "POSIXct, POSIXt"
    case DateType                           => "Date"
    case other                              => other.simpleString
  }

  /** Profile every column of `df`.
    * Semantics per column (whiteRRabbit.R:313-327):
    *   missing  = count of NULLs;
    *   empty    = count of "" (string columns only, 0 otherwise);
    *   nonMissing excludes NULL for all columns and also "" for strings;
    *   distinct is exact and excludes NULL (and "" for strings);
    *   numeric stats over non-NULL values: min/max/mean/sd(sample)/
    *     quartiles (type-7 linear interpolation = Spark exact percentile);
    *   date stats: earliest/latest/median epoch-microseconds (median may
    *     interpolate between two instants, whiteRRabbit.R:389-398).
    *
    * Plan shape: TWO jobs. Job A computes counters + moments for all
    * columns in one codegen'd `agg()` — and nothing with a heavy object
    * buffer rides in it (a mixed declarative/object aggregate forces
    * the whole plan onto ObjectHashAggregate, measured 2x slower than
    * the jobs run apart; N `countDistinct`s in one agg would plan an
    * `Expand` that multiplies every row N-fold, measured 10x). Job B
    * melts the columns to (colIdx, value) pairs and computes BOTH the
    * exact distinct counts AND the exact type-7 quantiles from the
    * per-column value histogram (see [[histogramStats]]) — fully
    * distributed hash aggregation, no per-group value buffering
    * anywhere in the exact path.
    */
  /** Widen a NARROW input to the session's parallelism before the
    * profile's compute-heavy passes (optimization r19, guide §2.5
    * "input skew — repartition immediately after the read"). A small
    * parquet table is one-to-three row groups = as many unsplittable
    * scan tasks however many cores the box has (the sf0.1 lineitem
    * profile ran its sketch and melt passes in 3 tasks at 32 cores).
    * The gate keeps this scale-neutral: a corpus-sized input already
    * scans wider than the cluster and passes through untouched.
    * Aggregation-only consumers make the round-robin order shift
    * semantically invisible.
    */
  private[graft] def widened(df: DataFrame): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < target) df.repartition(target) else df
  }

  // summarize (exact path) deliberately NOT widened: its heavy work
  // (histogram melt) redistributes at its own exchange already, and
  // the measured effect of a pre-repartition was a small REGRESSION
  // on small tables (summary_orders 2.53→2.87, customer 2.62→3.37 —
  // two extra full-row shuffles per profile) with lineitem flat.
  def summarize(
      df: DataFrame,
      exactQuantiles: Boolean = true,
      accuracy: Int = 10000): DataFrame = {
    val fields = df.schema.fields
    require(fields.nonEmpty, "cannot profile a zero-column DataFrame")

    val aggs = scala.collection.mutable.ArrayBuffer[Column]()
    aggs += count(lit(1)).as("total")
    fields.zipWithIndex.foreach { case (f, i) =>
      val c = col(f.name)
      aggs += count(when(c.isNull, lit(1))).as(s"m_$i")
      f.dataType match {
        case StringType =>
          aggs += count(when(c === lit(""), lit(1))).as(s"e_$i")
        case t if isNum(t) =>
          val cd = c.cast(DoubleType)
          aggs += min(cd).as(s"mn_$i")
          aggs += max(cd).as(s"mx_$i")
          aggs += avg(cd).as(s"av_$i")
          aggs += stddev_samp(cd).as(s"sd_$i")
          if (!exactQuantiles)
            aggs += percentile_approx(cd,
              array(lit(0.25), lit(0.5), lit(0.75)), lit(accuracy))
              .as(s"q_$i")
        case t if isTs(t) =>
          val us = unix_micros(
            if (f.dataType == TimestampType) c else c.cast(TimestampType))
          aggs += min(us).as(s"tn_$i")
          aggs += max(us).as(s"tx_$i")
          if (!exactQuantiles)
            aggs += percentile_approx(us, lit(0.5), lit(accuracy))
              .as(s"tm_$i")
        case _ => ()
      }
    }

    if (exactQuantiles) {
      val hist = histogramStats(df)
      reshapeLike(df, aggs.toSeq,
        Some(hist.view.mapValues(_.distinct).toMap), Some(hist))
    } else
      reshapeLike(df, aggs.toSeq, Some(exactDistinctCounts(df)))
  }

  /** Per-column stats derived from the value histogram in one job. */
  private final case class HistStats(
      distinct: Long,
      quartiles: Option[(Double, Double, Double)],
      tsMedianUs: Option[Double])

  /** Exact distinct counts AND exact type-7 quantiles from ONE melt +
    * histogram job: columns melt to (colIdx, value) pairs, a
    * distributed hash aggregation builds each column's value histogram
    * (value → multiplicity), a range-partitioned prefix sum
    * ([[Ranking.prefixSums]]) accumulates rank ranges, and the
    * quantile values are picked by rank and interpolated driver-side
    * with the same lower+(higher-lower)·frac formula Spark's exact
    * `percentile` uses — identical results with NO per-group value
    * buffering and NO per-column window partition: the heaviest
    * structure anywhere is one histogram row per distinct value,
    * map-side combined, and rank partitioning follows the range
    * sampler, so a single continuous column's histogram spreads over
    * the whole cluster instead of piling one executor. (Exactness
    * still costs a sorted pass over distinct values, which is why
    * [[summarizeApprox]] (sketches) stays the recommended 100 TB
    * default.)
    */
  private def histogramStats(df: DataFrame): Map[Int, HistStats] =
    histogramStatsOf(df, histogramRanked(df))

  /** The melt → histogram → rank-range frame feeding
    * [[histogramStats]], exposed (`private[graft]`) so the plan-shape
    * suite can pin its scale property: NO window partitioned by the
    * melt key — rank ranges come from the range-partitioned prefix
    * sum, never a per-column single-partition sort.
    */
  private[graft] def histogramRanked(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val fields = df.schema.fields
    val nullS = lit(null).cast(StringType)
    val nullD = lit(null).cast(DoubleType)
    val kvs = fields.zipWithIndex.map { case (f, i) =>
      val c = col(f.name)
      f.dataType match {
        case StringType =>
          struct(lit(i).as("i"), when(c =!= lit(""), c).as("vs"),
            nullD.as("vn"))
        case FloatType | DoubleType =>
          // +0.0 collapses -0.0/0.0 like numeric DISTINCT does
          struct(lit(i).as("i"), nullS.as("vs"),
            (c.cast(DoubleType) + lit(0.0)).as("vn"))
        case t if isNum(t) =>
          // integral/decimal: the string identity keeps DISTINCT exact
          // past 2^53 while ranks use the same double cast the old
          // percentile(cast double) applied; duplicate vn under
          // distinct vs only reorders equal rank values
          struct(lit(i).as("i"), c.cast(StringType).as("vs"),
            c.cast(DoubleType).as("vn"))
        case t if isTs(t) =>
          val us = unix_micros(
            if (f.dataType == TimestampType) c else c.cast(TimestampType))
          struct(lit(i).as("i"), nullS.as("vs"), us.cast(DoubleType).as("vn"))
        case _ =>
          struct(lit(i).as("i"), c.cast(StringType).as("vs"), nullD.as("vn"))
      }
    }
    val hist = df
      .select(explode(array(kvs.toSeq: _*)).as("kv"))
      .select(col("kv.i").as("i"), col("kv.vs").as("vs"),
        col("kv.vn").as("vn"))
      .where(col("vs").isNotNull || col("vn").isNotNull)
      .groupBy("i", "vs", "vn")
      .agg(count(lit(1)).as("cnt"))
    // rank range [lo, hi) of each histogram row within its column —
    // computed WITHOUT a per-column window partition. (The previous
    // Window.partitionBy("i").orderBy("vn") shape put one column's
    // ENTIRE histogram in one partition: parallelism capped at
    // #columns and partition size at the column's distinct count — the
    // one plan that wouldn't survive a continuous column at 100 TB.)
    // The distributed form is the engine's own range-partition prefix
    // sum (Ranking.prefixSums): a GLOBAL inclusive running count
    // ordered by (i, vn, vs) — columns are contiguous in that order,
    // and (i, vs, vn) is the histogram's grouping key so the order is
    // total — minus each column's starting offset, computed from ONE
    // row per column and broadcast. Partition sizes now follow the
    // range sampler, never a single column's distinct count. A vn tie
    // under distinct vs (integral identity past 2^53) only reorders
    // equal-rank values, exactly as before.
    val nPart = math.max(1,
      df.sparkSession.sessionState.conf.numShufflePartitions)
    val global = Ranking.prefixSums(hist,
      Seq(col("i"), col("vn"), col("vs")), Seq("cnt" -> "hig"), nPart)
    // one row per COLUMN: its total count and its starting offset in
    // the global (i, vn, vs) order; the offset window runs over
    // #columns rows, bounded by the schema, never by data
    val colTotals = hist.groupBy("i")
      .agg(sum("cnt").as("n"))
      .withColumn("base", coalesce(
        sum(col("n")).over(Window.orderBy("i")
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
    global.join(broadcast(colTotals), Seq("i"))
      .withColumn("hi", col("hig") - col("base"))
      .withColumn("lo", col("hi") - col("cnt"))
  }

  private def histogramStatsOf(df: DataFrame,
      ranked: DataFrame): Map[Int, HistStats] = {
    val fields = df.schema.fields
    val aggs = Seq(count(lit(1)).as("dist"), first(col("n")).as("n")) ++
      Seq(0.25 -> "25", 0.5 -> "50", 0.75 -> "75").flatMap { case (p, s) =>
        val h = (col("n") - lit(1L)).cast(DoubleType) * lit(p)
        val r0 = floor(h).cast(LongType)
        val r1 = ceil(h).cast(LongType)
        Seq(
          max(when(col("lo") <= r0 && r0 < col("hi"), col("vn")))
            .as(s"x0_$s"),
          max(when(col("lo") <= r1 && r1 < col("hi"), col("vn")))
            .as(s"x1_$s"))
      }
    val isNumIdx = fields.zipWithIndex.collect {
      case (f, i) if isNum(f.dataType) => i
    }.toSet
    val isTsIdx = fields.zipWithIndex.collect {
      case (f, i) if isTs(f.dataType) => i
    }.toSet
    ranked.groupBy("i").agg(aggs.head, aggs.tail: _*).collect().map { r =>
      val i = r.getAs[Int]("i")
      def interp(s: String, p: Double): Option[Double] =
        if (r.isNullAt(r.fieldIndex(s"x0_$s"))) None
        else {
          val h = (r.getAs[Long]("n") - 1L) * p
          val x0 = r.getAs[Double](s"x0_$s")
          val x1 = r.getAs[Double](s"x1_$s")
          Some(x0 + (x1 - x0) * (h - math.floor(h)))
        }
      val quartiles =
        if (isNumIdx(i))
          for (a <- interp("25", 0.25); b <- interp("50", 0.5);
               c <- interp("75", 0.75)) yield (a, b, c)
        else None
      val tsMed = if (isTsIdx(i)) interp("50", 0.5) else None
      i -> HistStats(r.getAs[Long]("dist"), quartiles, tsMed)
    }.toMap
  }

  /** Exact per-column distinct counts in one melt + two hash aggs.
    * Values are carried as strings (injective for every profiled type;
    * floating columns are +0.0-normalized so -0.0 and 0.0 collapse the
    * way numeric DISTINCT does). NULLs — and "" for string columns —
    * are excluded per the reference (whiteRRabbit.R:320-327).
    */
  private def exactDistinctCounts(df: DataFrame): Map[Int, Long] = {
    val fields = df.schema.fields
    val kvs = fields.zipWithIndex.map { case (f, i) =>
      val c = col(f.name)
      val v = f.dataType match {
        case StringType => when(c =!= lit(""), c)
        case FloatType | DoubleType =>
          (c.cast(DoubleType) + lit(0.0)).cast(StringType)
        case _ => c.cast(StringType)
      }
      struct(lit(i).as("i"), v.as("v"))
    }
    df.select(explode(array(kvs.toSeq: _*)).as("kv"))
      .select(col("kv.i").as("i"), col("kv.v").as("v"))
      .where(col("v").isNotNull)
      .distinct()
      .groupBy("i").agg(count(lit(1)).as("d"))
      .collect()
      .map(r => r.getAs[Int]("i") -> r.getAs[Long]("d"))
      .toMap
  }

  /** Sketch-based profile for the 100 TB path: `approx_count_distinct`
    * (HLL++, mergeable, constant memory) instead of exact distinct, and
    * sketch quantiles instead of exact sort-based percentiles.
    * Semantics diverge from the reference (documented per SURVEY.md §2
    * op 10).
    *
    * Delegates to [[summarizeOnePass]]: the historical three-
    * concurrent-jobs design (codegen counters + HLL agg + percentile
    * agg as separate overlapping scans) only won while the input sat
    * in the page cache, and at 32 cores the three jobs contend with
    * each other — r9 measured it 2.2x SLOWER than the one-pass custom
    * aggregate warm (4.26 s vs 1.92 s at 10x lineitem) on top of
    * scanning the input three times where one pass suffices. One
    * implementation, one scan; `accuracy` maps to the sketch's
    * relative error exactly as percentile_approx defines it
    * (rank error <= 1/accuracy).
    *
    * Defaults: rsd 0.05 = Spark's own approx_count_distinct default
    * (0.01 measured 16x slower HLL updates for precision a profile
    * report does not need); accuracy 100 = 1% rank error, well inside
    * report-grade quantile needs.
    */
  def summarizeApprox(df: DataFrame, rsd: Double = 0.05,
      accuracy: Int = 100): DataFrame = {
    require(accuracy > 0, s"accuracy must be positive: $accuracy")
    summarizeOnePass(df, rsd, relativeError = 1.0 / accuracy)
  }

  /** ONE-pass, ONE-scan approx profile: every column's counters,
    * moments, min/max, HLL distinct, and sketch quantiles fold inside
    * a single custom [[graft.functions.ProfileSketchAgg]] aggregate —
    * the input is read exactly once. [[summarizeApprox]]'s three
    * concurrent jobs scan it three times, which only wins while the
    * input sits in the page cache; at 100 TB the scan IS the cost and
    * this path does a third of it. Quantile values buffer unboxed and
    * flush in sorted batches (see ProfileSketch), which made this the
    * fastest profile path warm as well: 1.4 s vs 2.2 s (approx) on
    * lineitem at sf0.1 and 1.4-1.8 s vs 4.0-4.3 s at 10x, median-of-3.
    * Same sketch implementations underneath
    * (HyperLogLogPlusPlusHelper, QuantileSummaries), so accuracy
    * contracts are identical to the stock approx_count_distinct /
    * percentile_approx.
    */
  def summarizeOnePass(df0: DataFrame, rsd: Double = 0.05,
      relativeError: Double = 0.01): DataFrame = {
    import graft.functions.ProfileSketchAgg
    val df = widened(df0)
    val fields = df.schema.fields
    require(fields.nonEmpty, "cannot profile a zero-column DataFrame")
    val nullNum = lit(null).cast(DoubleType)
    val aggs = fields.zipWithIndex.map { case (f, i) =>
      val c = col(f.name)
      val (value, num) = f.dataType match {
        case StringType => (c, nullNum)
        case t if isNum(t) => (c, c.cast(DoubleType))
        case t if isTs(t) =>
          val ts = if (f.dataType == TimestampType) c
            else c.cast(TimestampType)
          (c, unix_micros(ts).cast(DoubleType))
        case _ => (c, nullNum)
      }
      ProfileSketchAgg.sketch(value, num,
        isString = f.dataType == StringType, rsd, relativeError).as(s"s_$i")
    }
    val r = df.agg(aggs.head, aggs.tail.toSeq: _*).head()
    val rows: Seq[Row] = fields.zipWithIndex.toSeq.map { case (f, i) =>
      val s = r.getStruct(r.fieldIndex(s"s_$i"))
      val total = s.getAs[Long]("n")
      val missing = s.getAs[Long]("nulls")
      val empty = s.getAs[Long]("empties")
      def d(name: String): java.lang.Double =
        if (s.isNullAt(s.fieldIndex(name))) null
        else Double.box(s.getAs[Double](name))
      def us(name: String): java.lang.Long =
        if (s.isNullAt(s.fieldIndex(name))) null
        else Long.box(math.floor(s.getAs[Double](name)).toLong)
      val numeric = isNum(f.dataType)
      val ts = isTs(f.dataType)
      val (q1, med, q3) =
        if (numeric) (d("q1"), d("med"), d("q3"))
        else (null: java.lang.Double, null: java.lang.Double,
          null: java.lang.Double)
      val iqr: java.lang.Double =
        if (q1 != null && q3 != null) Double.box(q3 - q1) else null
      Row(f.name, rClassName(f.dataType), total, total - missing - empty,
        missing, empty, s.getAs[Long]("dist"),
        if (numeric) d("mn") else null, if (numeric) d("mx") else null,
        if (numeric) d("av") else null, med,
        if (numeric) d("sd") else null, q1, q3, iqr,
        if (ts) us("mn") else null, if (ts) us("mx") else null,
        if (ts) us("med") else null)
    }
    df.sparkSession.createDataFrame(
      java.util.Arrays.asList(rows: _*), summarySchema)
  }

  /** Runs the single counters/moments agg job then reshapes (exact
    * path).
    */
  private def reshapeLike(df: DataFrame, aggs: Seq[Column],
      distinctCounts: Option[Map[Int, Long]],
      hist: Option[Map[Int, HistStats]] = None): DataFrame =
    reshapeRows(df, Seq(df.agg(aggs.head, aggs.tail: _*).head()),
      distinctCounts, hist)

  /** Shared driver-side reshape used by summarize/summarizeApprox.
    * Distinct counts come either from `distinctCounts` (exact melt job)
    * or from `d_<i>` fields of the aggregation rows (approx path);
    * quantiles come from `hist` (exact histogram job) when present,
    * else from `q_<i>`/`tm_<i>` fields of the aggregation rows.
    */
  private def reshapeRows(df: DataFrame, allRows: Seq[Row],
      distinctCounts: Option[Map[Int, Long]],
      hist: Option[Map[Int, HistStats]]): DataFrame = {
    val spark = df.sparkSession
    val fields = df.schema.fields
    def find(n: String): Option[(Row, Int)] = allRows.collectFirst {
      case rr if rr.schema.fieldNames.contains(n) => (rr, rr.fieldIndex(n))
    }
    def nn(n: String): Boolean =
      find(n).exists { case (rr, ix) => !rr.isNullAt(ix) }
    def gl(n: String): Long =
      find(n).map { case (rr, ix) => rr.getLong(ix) }.get
    def gd(n: String): java.lang.Double =
      if (nn(n)) Double.box(find(n).map {
        case (rr, ix) => rr.getDouble(ix) }.get)
      else null
    def glo(n: String): java.lang.Long =
      if (nn(n)) Long.box(find(n).map {
        case (rr, ix) => rr.getLong(ix) }.get)
      else null
    val total = gl("total")
    val rows: Seq[Row] = fields.zipWithIndex.toSeq.map { case (f, i) =>
      val missing = gl(s"m_$i")
      val empty = if (f.dataType == StringType) gl(s"e_$i") else 0L
      val nonMissing = total - missing - empty
      var (mn, mx, av, med, sd, q1, q3, iqr) =
        (null: java.lang.Double, null: java.lang.Double,
         null: java.lang.Double, null: java.lang.Double,
         null: java.lang.Double, null: java.lang.Double,
         null: java.lang.Double, null: java.lang.Double)
      if (isNum(f.dataType)) {
        mn = gd(s"mn_$i"); mx = gd(s"mx_$i")
        av = gd(s"av_$i"); sd = gd(s"sd_$i")
        hist.flatMap(_.get(i)).flatMap(_.quartiles) match {
          case Some((a, b, c)) =>
            q1 = Double.box(a); med = Double.box(b); q3 = Double.box(c)
            iqr = Double.box(c - a)
          case None if nn(s"q_$i") =>
            val q = find(s"q_$i").map { case (rr, ix) =>
              rr.getAs[scala.collection.Seq[Double]](ix) }.get
            q1 = Double.box(q(0)); med = Double.box(q(1))
            q3 = Double.box(q(2)); iqr = Double.box(q(2) - q(0))
          case None => ()
        }
      }
      var (tn, tx, tm) =
        (null: java.lang.Long, null: java.lang.Long, null: java.lang.Long)
      if (isTs(f.dataType)) {
        tn = glo(s"tn_$i"); tx = glo(s"tx_$i")
        hist.flatMap(_.get(i)).flatMap(_.tsMedianUs) match {
          case Some(us) => tm = Long.box(math.floor(us).toLong)
          case None if nn(s"tm_$i") =>
            val (rr, ix) = find(s"tm_$i").get
            tm = rr.schema(ix).dataType match {
              case DoubleType => Long.box(math.floor(rr.getDouble(ix)).toLong)
              case _          => Long.box(rr.getLong(ix))
            }
          case None => ()
        }
      }
      val distinct = distinctCounts match {
        case Some(m) => m.getOrElse(i, 0L)
        case None    => gl(s"d_$i")
      }
      Row(f.name, rClassName(f.dataType), total, nonMissing, missing, empty,
        distinct, mn, mx, av, med, sd, q1, q3, iqr, tn, tx, tm)
    }
    spark.createDataFrame(java.util.Arrays.asList(rows: _*), summarySchema)
  }

  /** Map the typed summary to the reference's 18-field all-as-written
    * summary sheet schema (whiteRRabbit.R:402-423): Column, DataType,
    * TotalCount, NonMissingCount, MissingCount, EmptyCount,
    * DistinctCount, MinVal..IQRVal, EarliestVal/LatestVal/MedianDateVal
    * rendered as ISO strings.
    */
  def referenceSummary(typed: DataFrame): DataFrame = {
    def tsStr(c: Column): Column =
      date_format(timestamp_micros(c), "yyyy-MM-dd HH:mm:ss")
    typed.select(
      col("column_name").as("Column"),
      col("data_type").as("DataType"),
      col("total_count").as("TotalCount"),
      col("non_missing").as("NonMissingCount"),
      col("missing_count").as("MissingCount"),
      col("empty_count").as("EmptyCount"),
      col("distinct_count").as("DistinctCount"),
      col("min_val").as("MinVal"),
      col("max_val").as("MaxVal"),
      col("median_val").as("MedianVal"),
      col("mean_val").as("MeanVal"),
      col("sd_val").as("SDVal"),
      col("q1_val").as("Q1Val"),
      col("q3_val").as("Q3Val"),
      col("iqr_val").as("IQRVal"),
      tsStr(col("earliest_us")).as("EarliestVal"),
      tsStr(col("latest_us")).as("LatestVal"),
      tsStr(col("median_us")).as("MedianDateVal"))
  }

  /** Equi-width histogram of a numeric column — the distribution view
    * the reference's flat min/max/quantile summary
    * (`whiteRRabbit.R:306-329`) cannot show. Two passes, both fully
    * parallel: a tiny min/max aggregate broadcasts back, then one
    * map-side-combined groupBy on the bucket id — no sort, no window,
    * so the plan is a pair of scans at any scale (equi-DEPTH buckets
    * would need a global sort or quantile boundaries; use
    * [[approxSummary]]'s sketch path for those).
    *
    * Bucket assignment is `least(b-1, floor((x-lo)*b/(hi-lo)))` with
    * the arithmetic in exactly that order so a SQL oracle replays the
    * same IEEE doubles bit-for-bit. Empty buckets are absent from the
    * output (no row), which keeps the aggregate one-pass. For
    * equi-DEPTH buckets see [[equiDepthHistogram]].
    */
  def numericHistogram(df: DataFrame, valueCol: String,
      buckets: Int = 12): DataFrame = {
    require(buckets > 0, s"buckets must be positive: $buckets")
    val mm = df.agg(min(col(valueCol)).cast("double").as("__lo"),
      max(col(valueCol)).cast("double").as("__hi"))
    df.select(col(valueCol).cast("double").as("__v"))
      .where(col("__v").isNotNull)
      .crossJoin(broadcast(mm))
      .select(when(col("__hi") === col("__lo"), lit(0))
        .otherwise(least(lit(buckets - 1),
          floor((col("__v") - col("__lo")) * buckets /
            (col("__hi") - col("__lo")))))
        .cast("int").as("bucket"), col("__v"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_rows"),
        round(min(col("__v")), 6).as("b_min"),
        round(max(col("__v")), 6).as("b_max"))
      .orderBy("bucket")
  }

  /** EXACT equi-depth histogram — `numBuckets` buckets of (as near as
    * the discrete data allows) equal row counts — without the global
    * sort it naively needs: distinct-value counts (one value-keyed
    * shuffle with map-side combine), a DISTRIBUTED prefix sum over
    * them ([[graft.operators.Ranking.prefixSums]]: range-partitioned,
    * never a single-partition window), then integral bucket
    * assignment `floor(rows_before * k / n)` per distinct value and a
    * tiny per-bucket aggregate. All rows of one distinct value land
    * in one bucket (the standard discrete-domain rule), so a value
    * holding more than n/k rows overflows its bucket and may leave
    * later buckets empty-and-absent — counts stay exact either way.
    *
    * The integral cut arithmetic is the same engine-portable
    * `DIV`-on-BIGINTs the quality-decile query uses, so a SQL oracle
    * replays it exactly; the companion [[numericHistogram]] covers
    * the equi-width view.
    */
  def equiDepthHistogram(df: DataFrame, valueCol: String,
      numBuckets: Int, numPartitions: Int = 32): DataFrame = {
    require(numBuckets > 0, s"numBuckets must be positive: $numBuckets")
    val counts = df.select(col(valueCol).cast("double").as("v"))
      .where(col("v").isNotNull)
      .groupBy(col("v")).agg(count(lit(1)).as("c"))
    val cum = Ranking.prefixSums(counts, Seq(col("v")),
      Seq("c" -> "cum"), numPartitions)
    val total = counts.agg(sum(col("c")).as("__n"))
    cum.crossJoin(broadcast(total))
      .withColumn("bucket",
        expr(s"CAST((cum - c) * $numBuckets DIV __n AS INT)"))
      .groupBy(col("bucket"))
      .agg(round(min(col("v")), 6).as("lo"),
        round(max(col("v")), 6).as("hi"),
        sum(col("c")).as("n_rows"),
        count(lit(1)).as("n_distinct"))
      .orderBy("bucket")
  }

  /** Tukey-fence outlier report for a numeric column: exact quartiles,
    * the 1.5×IQR fences, and how many rows fall outside them. The
    * fences are rounded to 6 decimals BEFORE the comparison on both
    * engine sides, so the in/out decision never hinges on the last ulp
    * of a quartile interpolation.
    *
    * The quartiles here use Spark's exact `percentile` aggregate
    * (value-map based — fine while the column's distinct-value count
    * is bounded, as money-like data is). At open-ended 100 TB scale
    * swap in `approx_percentile`, which changes only the fence
    * estimate, not the counting pass: the count is a broadcast of one
    * 2-value row back over the scan, never a sort.
    */
  def outlierFences(df: DataFrame, valueCol: String): DataFrame = {
    val q = df.agg(expr(
        s"percentile($valueCol, array(0.25D, 0.75D))").as("__q"))
      .select(col("__q").getItem(0).as("__q1"),
        col("__q").getItem(1).as("__q3"))
    df.select(col(valueCol).cast("double").as("__v"))
      .where(col("__v").isNotNull)
      .crossJoin(broadcast(q))
      .select(col("__v"), col("__q1"), col("__q3"),
        round(col("__q1") - lit(1.5) * (col("__q3") - col("__q1")), 6)
          .as("__lo"),
        round(col("__q3") + lit(1.5) * (col("__q3") - col("__q1")), 6)
          .as("__hi"))
      .groupBy(col("__q1"), col("__q3"), col("__lo"), col("__hi"))
      .agg(
        sum(when(col("__v") < col("__lo"), 1L).otherwise(0L)).as("n_below"),
        sum(when(col("__v") > col("__hi"), 1L).otherwise(0L)).as("n_above"),
        count(lit(1)).as("n_rows"))
      .select(round(col("__q1"), 6).as("q1"), round(col("__q3"), 6).as("q3"),
        round(col("__q3") - col("__q1"), 6).as("iqr"),
        col("__lo").as("lo_fence"), col("__hi").as("hi_fence"),
        col("n_below"), col("n_above"), col("n_rows"))
  }

  /** Rank-correctness contract for the approx profile path — the
    * oracle-facing gate the sketch outputs admit. A quantile estimate
    * m for fraction p is rank-correct iff the exact CDF brackets it:
    * count(x ≤ m)/n ≥ p − eps AND count(x < m)/n ≤ p + eps (the
    * guarantee percentile_approx's accuracy parameter makes); the HLL
    * distinct must land within `distinctTol` of exact — default 0.15,
    * i.e. 3σ of the profile's rsd = 0.05 (a 1σ gate flipped on a
    * borderline column at sf0.001 even though the sketch met its
    * contract; a genuinely broken sketch path is off by far more
    * than 3σ). Both checks are
    * DETERMINISTIC for a fixed dataset (sketches are hash-based, not
    * random), so the emitted 0/1 flags are stable and a SQL oracle
    * pins them at 1 — a regression in the sketch path flips rows red
    * instead of hiding behind "no oracle".
    *
    * Cost: the approx profile itself + one exact-distinct pass + ONE
    * aggregation computing every CDF probe. Per-column collect is the
    * same report-bounded reshape the profile family already uses.
    */
  def approxContract(df0: DataFrame, eps: Double = 0.02,
      distinctTol: Double = 0.15,
      profile: DataFrame => DataFrame = summarizeApprox(_)): DataFrame = {
    // widened ONCE here: the contract's three passes (profile, exact
    // distinct, rank probes) all read the same narrow scan
    val df = widened(df0)
    val spark = df.sparkSession
    import spark.implicits._
    val fields = df.schema.fields
    // The sketch profile and the exact distinct counts are independent
    // full passes; submit them from driver threads so their jobs share
    // the cluster instead of queueing (optimization r18, guide §2.6 —
    // the probe aggregation below is the only pass that must wait,
    // since its rank probes need the profile's quantile values).
    import scala.concurrent.{Await, ExecutionContext, Future}
    import scala.concurrent.duration.Duration
    implicit val ec: ExecutionContext = ExecutionContext.global
    val apF = Future(profile(df).collect()
      .map(r => r.getAs[String]("column_name") -> r).toMap)
    val exactDF = Future(exactDistinctCounts(df))
    val ap = Await.result(apF, Duration.Inf)
    val exactD = Await.result(exactDF, Duration.Inf)
    val probes = scala.collection.mutable.ArrayBuffer[Column]()
    fields.zipWithIndex.foreach { case (f, i) =>
      val r = ap(f.name)
      if (isNum(f.dataType)) {
        val cd = col(f.name).cast(DoubleType)
        probes += count(cd).as(s"n_$i")
        Seq("q1_val" -> "q1", "median_val" -> "md", "q3_val" -> "q3")
          .foreach { case (field, tag) =>
            val m = r.getAs[Double](field)
            probes += count(when(cd <= m, 1)).as(s"le_${tag}_$i")
            probes += count(when(cd < m, 1)).as(s"lt_${tag}_$i")
          }
      } else if (isTs(f.dataType)) {
        val us = unix_micros(col(f.name).cast(TimestampType))
        probes += count(us).as(s"n_$i")
        val m = r.getAs[Long]("median_us")
        probes += count(when(us <= m, 1)).as(s"le_md_$i")
        probes += count(when(us < m, 1)).as(s"lt_md_$i")
      }
    }
    val pr =
      if (probes.isEmpty) null
      else df.agg(probes.head, probes.tail.toSeq: _*).head()
    def rankOk(i: Int, tag: String, p: Double): Int = {
      if (pr == null || !pr.schema.fieldNames.contains(s"le_${tag}_$i")) 1
      else {
        val n = pr.getAs[Long](s"n_$i").toDouble
        val le = pr.getAs[Long](s"le_${tag}_$i") / n
        val lt = pr.getAs[Long](s"lt_${tag}_$i") / n
        if (le >= p - eps && lt <= p + eps) 1 else 0
      }
    }
    val rows = fields.zipWithIndex.map { case (f, i) =>
      val dAp = ap(f.name).getAs[Long]("distinct_count")
      val dEx = exactD(i)
      // absolute floor of 5: at tiny cardinalities (tens) HLL register
      // quantization dominates the relative rsd bound
      val dOk =
        if (math.abs(dAp - dEx) <= math.max(distinctTol * dEx, 5.0)) 1
        else 0
      (f.name, dOk, rankOk(i, "q1", 0.25), rankOk(i, "md", 0.5),
        rankOk(i, "q3", 0.75))
    }
    rows.toSeq
      .toDF("column_name", "distinct_ok", "q1_ok", "median_ok", "q3_ok")
      .orderBy("column_name")
  }

  /** Decimal-exact Pearson correlation matrix over numeric columns —
    * the numeric dependence view beside [[mutualInfo]]'s categorical
    * one (selectivity hints, redundant-feature discovery). ONE
    * single-pass aggregate computes every Σx and Σxy with each value
    * quantized to DECIMAL(18,6) first, so the sums are EXACT and
    * order-free where raw double sums would drift with partition
    * order; the closed-form correlation then runs in double
    * arithmetic from those exact sums — the identical expression a
    * SQL oracle evaluates, so the rounded result is engine-portable.
    * Output is the upper triangle (col_a < col_b by the given
    * order). Rows with a NULL in any requested column are dropped
    * (listwise completeness — per-pair masks would need per-pair
    * counts), and pairs whose correlation is undefined — fewer than
    * two rows, or a zero-variance column — are ABSENT from the
    * output rather than NaN rows.
    *
    * Scale shape: one codegen'd scan with map-side partial
    * aggregation producing a single k(k+3)/2-value row; the pair
    * reshape happens on that one row inside the plan. No shuffle
    * carries more than the aggregate state.
    */
  def corrMatrix(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.size >= 2, "corrMatrix needs at least two columns")
    val k = cols.size
    val d = df.na.drop(cols)
      .select(cols.map(c => col(c).cast("decimal(18,6)").as(c)): _*)
    val aggs = scala.collection.mutable.ArrayBuffer[Column](
      count(lit(1)).as("n"))
    for (i <- 0 until k) aggs += sum(col(cols(i))).as(s"s_$i")
    for (i <- 0 until k; j <- i until k)
      aggs += sum(col(cols(i)) * col(cols(j))).as(s"p_${i}_$j")
    val one = d.agg(aggs.head, aggs.tail.toSeq: _*)
    def dbl(name: String) = col(name).cast("double")
    def varTerm(i: Int) =
      dbl("n") * dbl(s"p_${i}_$i") - dbl(s"s_$i") * dbl(s"s_$i")
    val pairs = for (i <- 0 until k; j <- i + 1 until k) yield {
      // the when() guard keeps the division unevaluated when the
      // denominator is 0 (zero-variance column) or NULL (no rows) —
      // ANSI mode would otherwise raise DIVIDE_BY_ZERO; such pairs
      // surface as NULL and are filtered below
      val den = sqrt(varTerm(i)) * sqrt(varTerm(j))
      struct(lit(cols(i)).as("col_a"), lit(cols(j)).as("col_b"),
        round(when(den > 0, (dbl("n") * dbl(s"p_${i}_$j") -
          dbl(s"s_$i") * dbl(s"s_$j")) / den), 6).as("corr"))
    }
    one.select(explode(array(pairs: _*)).as("c"))
      .select(col("c.col_a"), col("c.col_b"), col("c.corr"))
      .where(col("corr").isNotNull && !isnan(col("corr")))
      .orderBy("col_a", "col_b")
  }

  /** Shannon entropy (nats) of each column's value distribution — the
    * profiling signal that separates near-constant columns (entropy→0)
    * from identifier-like ones (entropy→ln n): a selectivity hint and
    * a quick anomaly flag (an entropy collapse between ingests means a
    * feed went constant). One melt + one (column, value)-keyed count —
    * the frequency-table shape, so ONE shuffle for all columns; the
    * per-column normalization window partitions over distinct values
    * (vocabulary-sized, never row-sized). The p·ln p terms are rounded
    * at 9 decimals and DECIMAL-summed per column, so the sum is
    * order-free and engine-portable.
    */
  def valueEntropy(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "valueEntropy: no columns requested")
    import org.apache.spark.sql.expressions.Window
    val pairs = df
      .select(explode(array(cols.map(c =>
        struct(lit(c).as("c"), col(c).cast(StringType).as("v"))): _*))
        .as("e"))
      .select(col("e.c").as("c"), col("e.v").as("v"))
      .where(col("v").isNotNull)
    val w = Window.partitionBy("c")
    val p = col("n").cast(DoubleType) / sum(col("n")).over(w)
    pairs.groupBy(col("c"), col("v"))
      .agg(count(lit(1)).as("n"))
      .withColumn("term", round(-p * log(p), 9).cast("decimal(20,9)"))
      .groupBy(col("c").as("column_name"))
      .agg(round(sum(col("term")).cast(DoubleType), 6).as("entropy_nats"),
        count(lit(1)).as("n_distinct"))
      .orderBy("column_name")
  }

  /** Inclusion coefficient of column A in column B — the
    * foreign-key-discovery profile: |distinct(A) ∩ distinct(B)| /
    * |distinct(A)|. 1.0 means every A value exists in B (an FK
    * candidate, the relationship an ETL designer maps first); the
    * coefficient degrades gracefully under dirty data where a strict
    * subset check would flip to false on one orphan row. Scale shape:
    * both sides reduce to their distinct value sets (key-shuffled,
    * map-side combined) and meet in one equality join — never a
    * row-level comparison.
    */
  def inclusionCoefficient(dfA: DataFrame, colA: String,
      dfB: DataFrame, colB: String): DataFrame = {
    val a = dfA.select(col(colA).cast(StringType).as("v"))
      .where(col("v").isNotNull).distinct()
    val b = dfB.select(col(colB).cast(StringType).as("v"))
      .where(col("v").isNotNull).distinct()
    a.join(b.withColumn("__in_b", lit(1)), Seq("v"), "left")
      .agg(count(lit(1)).as("n_a"),
        sum(when(col("__in_b").isNotNull, 1L).otherwise(0L))
          .as("n_in_b"))
      .select(col("n_a"), col("n_in_b"),
        round(col("n_in_b").cast(DoubleType) /
          greatest(col("n_a"), lit(1L)), 6).as("inclusion"))
  }

  /** Mutual information (nats) between two discrete columns — the
    * dependency-discovery signal of a profiler (MI ≈ 0: independent
    * columns; MI ≈ min(H_x, H_y): one column determines the other,
    * a functional-dependency candidate). One (x, y)-keyed count —
    * joint-cardinality-sized — with the marginals derived from the
    * joint by two more tiny aggregations; every p·ln term is rounded
    * at 9 decimals and DECIMAL-summed (the engine-portable scheme the
    * entropy profiler uses). Output also carries both marginal
    * entropies so callers can normalize.
    */
  def mutualInfo(df: DataFrame, xCol: String, yCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val joint = df
      .select(col(xCol).cast(StringType).as("x"),
        col(yCol).cast(StringType).as("y"))
      .where(col("x").isNotNull && col("y").isNotNull)
      .groupBy(col("x"), col("y"))
      .agg(count(lit(1)).as("n"))
    val all = Window.partitionBy(lit(1))
    val wx = Window.partitionBy(col("x"))
    val wy = Window.partitionBy(col("y"))
    val tot = sum(col("n")).over(all)
    val pxy = col("n").cast(DoubleType) / tot
    val px = sum(col("n")).over(wx).cast(DoubleType) / tot
    val py = sum(col("n")).over(wy).cast(DoubleType) / tot
    def decSum9(c: Column): Column =
      round(sum(round(c, 9).cast("decimal(20,9)")).cast(DoubleType), 6)
    joint
      .withColumn("mi_term", pxy * log(pxy / (px * py)))
      // entropy terms weighted inside the joint table: summing
      // -pxy*ln(px) over y reproduces -px*ln(px) exactly in decimal
      .withColumn("hx_term", -pxy * log(px))
      .withColumn("hy_term", -pxy * log(py))
      .agg(decSum9(col("mi_term")).as("mi_nats"),
        decSum9(col("hx_term")).as("h_x"),
        decSum9(col("hy_term")).as("h_y"),
        count(lit(1)).as("n_joint"))
  }

  /** EXACT per-group quantiles over a DISCRETE domain, with no value
    * buffering anywhere: counts per (group, value), a cumulative-count
    * window whose partitions are value-cardinality-sized (distinct
    * values per group — token counts, lengths, ratings — never row
    * counts), and the type-1 inverse-CDF pick `min v where
    * cum ≥ ⌈total·p/100⌉`, kept integral as `cum·100 ≥ total·p` so
    * both engines decide identically. This is the scale-safe exact
    * counterpart of `percentile()` (which buffers every value per
    * group); for continuous domains where distinct values ≈ rows, use
    * the sketch path ([[summarizeApprox]]) instead.
    *
    * `percents` are integer percentages (25, 50, 75); output has one
    * `p<pct>` column per entry plus the group size.
    */
  def groupedCountQuantiles(df: DataFrame, groupCol: String,
      valueCol: String, percents: Seq[Int]): DataFrame = {
    require(percents.nonEmpty && percents.forall(p => p > 0 && p <= 100),
      s"percents must be integer percentages in (0, 100]: $percents")
    import org.apache.spark.sql.expressions.Window
    val counts = df
      .groupBy(col(groupCol).as("__g"), col(valueCol).cast("long").as("__v"))
      .agg(count(lit(1)).as("__c"))
    val cumW = Window.partitionBy("__g").orderBy("__v")
      .rowsBetween(Window.unboundedPreceding, 0)
    val cum = counts
      .withColumn("__cum", sum(col("__c")).over(cumW))
      .withColumn("__total",
        sum(col("__c")).over(Window.partitionBy("__g")))
    val aggs = percents.map { p =>
      min(when(col("__cum") * 100 >= col("__total") * p, col("__v")))
        .as(s"p$p")
    } :+ max(col("__total")).as("n_rows")
    cum.groupBy(col("__g").as(groupCol))
      .agg(aggs.head, aggs.tail: _*)
      .orderBy(groupCol)
  }
}
