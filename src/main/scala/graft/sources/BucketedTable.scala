package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

/** Bucketed parquet table layout — shuffle paid ONCE at write time so
  * every later co-keyed join or aggregation plans with zero runtime
  * Exchange on that key. This is the storage-side half of the 100 TB
  * join strategy: a fact table bucketed on its join key meets an
  * equally-bucketed dimension in a SortMergeJoin whose both sides read
  * straight from disk — no shuffle of the big side, ever, across every
  * query that joins on the bucket key. Bucket counts must match
  * between tables meant to be co-located (Spark joins bucketed tables
  * shuffle-free only when the bucket counts are equal or multiples).
  *
  * `saveAsTable` with an explicit `path` keeps the data external (the
  * catalog entry is just metadata over the parquet files); bucketing
  * requires the catalog because bucket layout is a table property,
  * not something a bare `parquet(path)` write can record.
  *
  * The catalog is per-JVM (in-memory implementation), so [[write]]
  * ALSO persists the layout contract as a spec file next to the data
  * — the Delta/Iceberg split of data files from table metadata, at
  * minimum viable scale. A fresh session (new JVM, empty catalog)
  * calls [[register]] to re-create the catalog entry from the spec
  * and gets the same zero-Exchange plans without rewriting a byte of
  * data. The underscore-prefixed file name keeps it invisible to
  * parquet scans (the same convention that hides _SUCCESS markers).
  */
object BucketedTable {

  val SpecFile = "_graft_table_spec.json"

  /** Cheap identity stamp of a source dataset: file count, total
    * bytes, and newest modification time under `path`. Stored in the
    * layout spec at [[write]] time and checked by [[register]] — a
    * regenerated source (different rows, same path) then fails the
    * match and the caller rewrites instead of silently serving the
    * stale bucketed copy.
    */
  def sourceFingerprint(spark: SparkSession, path: String): String = {
    val hPath = new org.apache.hadoop.fs.Path(path)
    val fs = hPath.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(hPath)) return "absent"
    val it = fs.listFiles(hPath, true)
    var n = 0L; var bytes = 0L; var mtime = 0L
    while (it.hasNext) {
      val f = it.next()
      if (!f.getPath.getName.startsWith("_")) {
        n += 1; bytes += f.getLen; mtime = math.max(mtime, f.getModificationTime)
      }
    }
    s"$n-$bytes-$mtime"
  }

  /** Write `df` as a parquet-backed bucketed table (bucketed AND
    * sorted by `key`) registered as `table` with files at `path`,
    * and persist the layout spec beside the data for [[register]].
    * `sourceFp` (from [[sourceFingerprint]]) stamps which source
    * snapshot this layout was derived from.
    */
  def write(df: DataFrame, table: String, path: String, key: String,
      numBuckets: Int, sourceFp: String = ""): Unit = {
    val spark = df.sparkSession
    spark.sql(s"DROP TABLE IF EXISTS `$table`")
    df.write.format("parquet")
      .option("path", path)
      .bucketBy(numBuckets, key)
      .sortBy(key)
      .mode("overwrite")
      .saveAsTable(table)
    def js(s: String): String = s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    }
    val spec =
      s"""{"version":1,"format":"parquet","schema_ddl":"${js(
        df.schema.toDDL)}","bucket_key":"${js(key)}","num_buckets":$numBuckets,"sort_key":"${js(key)}","source_fp":"${js(
        sourceFp)}"}"""
    val hPath = new org.apache.hadoop.fs.Path(path, SpecFile)
    val fs = hPath.getFileSystem(spark.sessionState.newHadoopConf())
    val out = fs.create(hPath, true)
    try out.write(spec.getBytes("UTF-8")) finally out.close()
  }

  /** Re-create the catalog entry for a bucketed table from the spec
    * file persisted next to its data. Returns false when no spec
    * exists at `path` OR when `expectSourceFp` is non-empty and
    * differs from the spec's stamp — the source was regenerated since
    * the layout was written, so the caller falls back to [[write]]
    * instead of serving stale data. True when the table was
    * (re-)registered — after which co-located joins plan exactly as
    * they did in the writing session, Exchange-free.
    */
  def register(spark: SparkSession, table: String,
      path: String, expectSourceFp: String = ""): Boolean = {
    val hPath = new org.apache.hadoop.fs.Path(path, SpecFile)
    val fs = hPath.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(hPath)) return false
    val in = fs.open(hPath)
    val raw =
      try {
        val buf = new java.io.ByteArrayOutputStream()
        val tmp = new Array[Byte](8192)
        var n = in.read(tmp)
        while (n >= 0) { buf.write(tmp, 0, n); n = in.read(tmp) }
        buf.toString("UTF-8")
      } finally in.close()
    // fixed-shape single-object JSON written by `write` above: field
    // extraction by anchored regex keeps this dependency-free (the
    // values are a schema DDL and identifiers — no nested objects)
    def str(field: String): String = {
      val m = s""""$field":"((?:[^"\\\\]|\\\\.)*)"""".r
        .findFirstMatchIn(raw)
        .getOrElse(sys.error(s"$SpecFile at $path lacks '$field'"))
      m.group(1).replace("\\\"", "\"").replace("\\\\", "\\")
    }
    val num = s""""num_buckets":(\\d+)""".r.findFirstMatchIn(raw)
      .getOrElse(sys.error(s"$SpecFile at $path lacks 'num_buckets'"))
      .group(1).toInt
    if (expectSourceFp.nonEmpty) {
      // pre-fingerprint specs have no source_fp field — treat as a
      // mismatch so the layout is rewritten once and stamped
      val recorded = s""""source_fp":"((?:[^"\\\\]|\\\\.)*)"""".r
        .findFirstMatchIn(raw).map(_.group(1)).getOrElse("")
      if (recorded != expectSourceFp) return false
    }
    spark.sql(s"DROP TABLE IF EXISTS `$table`")
    spark.sql(
      s"""CREATE TABLE `$table` (${str("schema_ddl")})
         |USING ${str("format")}
         |CLUSTERED BY (`${str("bucket_key")}`)
         |SORTED BY (`${str("sort_key")}`)
         |INTO $num BUCKETS
         |LOCATION '$path'""".stripMargin)
    true
  }

  /** Write `df` as a bucketed layout committed as the next snapshot
    * of the [[VersionedTable]] at `root`: the bucketed files land in
    * the version's data directory (with their layout spec), and the
    * manifest publishes them — so re-bucketing (new data, new key,
    * new bucket count) is a VERSION, a crashed rewrite never corrupts
    * the serving layout, and old layouts stay registerable for time
    * travel. Returns the committed version id.
    */
  def writeVersioned(df: DataFrame, table: String, root: String,
      key: String, numBuckets: Int, sourceFp: String = ""): Long = {
    val spark = df.sparkSession
    val (v, dir) = VersionedTable.nextVersionDir(spark, root)
    write(df, table, dir, key, numBuckets, sourceFp)
    VersionedTable.publish(spark, root, v)
    v
  }

  /** [[register]] against a snapshot of the versioned bucketed table
    * at `root` — the latest version by default, or any older one for
    * time travel. False when nothing is committed yet or the latest
    * layout's source fingerprint mismatches (caller falls back to
    * [[writeVersioned]]).
    */
  def registerVersioned(spark: SparkSession, table: String,
      root: String, expectSourceFp: String = "",
      version: Option[Long] = None): Boolean =
    version.orElse(VersionedTable.latestVersion(spark, root)) match {
      case Some(v) =>
        register(spark, table, s"$root/v$v", expectSourceFp)
      case None => false
    }

  /** Join two co-bucketed tables on their bucket keys. The plan is a
    * SortMergeJoin with NO Exchange on either side (gated in
    * ScaleTechniquesSpec) — the join cost is the two scans.
    */
  def colocatedJoin(spark: org.apache.spark.sql.SparkSession,
      leftTable: String, leftKey: String,
      rightTable: String, rightKey: String): DataFrame =
    spark.table(leftTable)
      .join(spark.table(rightTable), col(leftKey) === col(rightKey))
}
