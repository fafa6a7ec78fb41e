package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-up generator for bench smoke tests: replicates the sf0.1
  * tables `copies`× into an sf1-equivalent directory, shifting every
  * join/group key per copy so per-key group sizes and join fan-outs
  * stay CONSTANT while row counts scale — the shape a 10× bigger
  * corpus actually has, and the one that makes "no superlinear
  * regression" a meaningful assertion.
  *
  * documents get a per-copy CHARACTER ROTATION (letters rotated by i,
  * digits by i mod 10; space and punctuation fixed): injective on the
  * vocabulary, so Jaccard/containment are invariant and every copy
  * reproduces the sf0.1 near-dup pair structure exactly, while
  * cross-copy similarity drops to zero (a nonzero rotation has no
  * fixed tokens) — 10 independent instances of the dedup problem, no
  * quadratic candidate blow-up from cloned text. Unlike suffix
  * renaming (`tok` → `tok_c<i>`, the r4 scheme), rotation is
  * LENGTH-PRESERVING: per-document text bytes are identical across
  * copies, so a compute-bound text query at 10× rows does exactly 10×
  * work and the smoke ratio criterion measures the engine, not the
  * generator (r4's +25% longer sf1 texts pushed linear text queries
  * to ~12×). Copy 0 stays verbatim.
  *
  * Dimension tables (nation/region/supplier/part/embeddings) copy
  * verbatim — they are dims or fixed-size surfaces whose scale story
  * is separate (and documented on their operators).
  */
object GenScale {
  def main(args: Array[String]): Unit = {
    val src = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val dst = args.lift(1).getOrElse("target/sf1")
    val copies = args.lift(2).map(_.toInt).getOrElse(10)
    val K = 10000000L // key shift per copy, beyond any base key range

    val spark = graft.hadoop.FastLocalFileSystem.config(
      SparkSession.builder()
      .appName("genscale").master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def out(name: String, df: DataFrame): Unit = {
      df.write.mode("overwrite").parquet(s"$dst/$name.parquet")
      println(s"wrote $name")
    }
    def rep(name: String)(shift: (DataFrame, Int) => DataFrame): Unit = {
      val base = spark.read.parquet(s"$src/$name.parquet")
      out(name, (0 until copies).map(i => shift(base, i))
        .reduce(_ unionByName _))
    }
    def shifted(df: DataFrame, i: Int, keys: String*): DataFrame =
      keys.foldLeft(df)((d, k) => d.withColumn(k, col(k) + lit(i * K)))

    rep("lineitem")((d, i) =>
      shifted(d, i, "l_orderkey", "l_partkey", "l_suppkey"))
    rep("orders")((d, i) => shifted(d, i, "o_orderkey", "o_custkey"))
    rep("customer")((d, i) => shifted(d, i, "c_custkey"))
    // events.ts passes through untouched (nanos-long or TIMESTAMP_NTZ
    // depending on the testdata generation); SparkEntry.tbl's
    // schema-adaptive reader handles either physical type on read
    rep("events")((d, i) => shifted(d, i, "event_id", "user_id"))
    val lower = "abcdefghijklmnopqrstuvwxyz"
    val upper = lower.toUpperCase
    val digits = "0123456789"
    def rot(s: String, i: Int): String =
      s.drop(i % s.length) + s.take(i % s.length)
    rep("documents") { (d, i) =>
      val base = shifted(d, i, "doc_id")
        .withColumn("source", concat(col("source"), lit(s"_c$i")))
      if (i == 0) base
      else base.withColumn("text", translate(col("text"),
        lower + upper + digits,
        rot(lower, i) + rot(upper, i) + rot(digits, i)))
    }
    Seq("nation", "region", "supplier", "part", "embeddings")
      .foreach(t => out(t,
        spark.read.parquet(s"$src/$t.parquet")))

    // Skewed twin of the scaled events table: every user_id ≡ 0 mod 10
    // is remapped to ONE hot user (~10% of all events), picked from
    // orders so the hot key survives the fact-dim join. Written as a
    // separate table so only the skew-aware operators see skew — the
    // uniform smoke queries (sessionize, as-of, range join) keep their
    // constant-group-size scaling story.
    val hotUser = spark.read.parquet(s"$dst/orders.parquet")
      .where(col("o_custkey") % 10 === 0)
      .agg(min("o_custkey")).head().getLong(0)
    out("events_skew",
      spark.read.parquet(s"$dst/events.parquet")
        .withColumn("user_id",
          when(col("user_id") % 10 === 0, lit(hotUser))
            .otherwise(col("user_id"))))
    println(s"hot user: $hotUser")
    spark.stop()
  }
}
