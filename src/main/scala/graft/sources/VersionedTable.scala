package graft.sources

import org.apache.hadoop.fs.Path

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Snapshot-versioned parquet table — the manifest-last commit
  * protocol that Delta/Iceberg build on, at minimum viable scale,
  * generalizing the cur/next atomic-swap idiom StreamingIvm carried
  * privately in rounds 5-6.
  *
  * Layout under one table root:
  * {{{
  *   root/v0/...parquet          <- immutable data snapshots
  *   root/v1/...parquet
  *   root/_graft_manifest_v0.json   <- one immutable manifest per commit
  *   root/_graft_manifest_v1.json
  * }}}
  *
  * A commit writes the DATA first and its manifest LAST: readers
  * resolve versions only through manifests, so a crash mid-commit
  * leaves an orphan data directory that no reader ever sees (the
  * manifest-last ordering is the atomicity — no rename-over is
  * needed, which object stores don't give you anyway). Old snapshots
  * stay readable by version id: time travel is just "read the data
  * dir the old manifest names". The underscore prefix keeps manifests
  * invisible to parquet scans (the _SUCCESS convention).
  *
  * Each manifest can carry a caller `tag`; [[latestTag]] lets an
  * at-least-once writer (Structured Streaming `foreachBatch`) make
  * its commits IDEMPOTENT by tagging each version with the batch id
  * and skipping batches at or below the last committed tag — the
  * standard exactly-once-sink recipe.
  *
  * At 100 TB: commits cost one metadata file beyond the data write;
  * reads cost one file listing of the root (manifests only) plus the
  * normal parquet scan of ONE version dir. Nothing here is
  * data-sized.
  */
object VersionedTable {

  private val ManifestPrefix = "_graft_manifest_v"

  private def fs(spark: SparkSession, root: String) =
    new Path(root).getFileSystem(spark.sessionState.newHadoopConf())

  private def manifestVersions(spark: SparkSession,
      root: String): Seq[Long] = {
    val f = fs(spark, root)
    val rootPath = new Path(root)
    if (!f.exists(rootPath)) return Nil
    f.listStatus(rootPath).toSeq
      .map(_.getPath.getName)
      .filter(n => n.startsWith(ManifestPrefix) && n.endsWith(".json"))
      .flatMap(n => n.stripPrefix(ManifestPrefix).stripSuffix(".json")
        .toLongOption)
      .sorted
  }

  /** All committed version ids, oldest first. */
  def versions(spark: SparkSession, root: String): Seq[Long] =
    manifestVersions(spark, root)

  /** The newest committed version id, if any commit has published. */
  def latestVersion(spark: SparkSession, root: String): Option[Long] =
    manifestVersions(spark, root).lastOption

  private def readManifest(spark: SparkSession, root: String,
      version: Long): String = {
    val p = new Path(root, s"$ManifestPrefix$version.json")
    val f = fs(spark, root)
    require(f.exists(p), s"no committed version $version at $root")
    val in = f.open(p)
    try {
      val buf = new java.io.ByteArrayOutputStream()
      val tmp = new Array[Byte](8192)
      var n = in.read(tmp)
      while (n >= 0) { buf.write(tmp, 0, n); n = in.read(tmp) }
      buf.toString("UTF-8")
    } finally in.close()
  }

  /** The caller tag recorded with the newest commit (idempotence
    * handle for at-least-once writers).
    */
  def latestTag(spark: SparkSession, root: String): Option[String] =
    latestVersion(spark, root).map { v =>
      val raw = readManifest(spark, root, v)
      """"tag":"((?:[^"\\]|\\.)*)"""".r.findFirstMatchIn(raw)
        .map(_.group(1).replace("\\\"", "\"").replace("\\\\", "\\"))
        .getOrElse("")
    }

  /** Commit `df` as the next snapshot of the table at `root` and
    * return its version id. Data directory first, manifest last —
    * the publish point is the manifest file's creation.
    */
  def commit(df: DataFrame, root: String, tag: String = ""): Long = {
    val spark = df.sparkSession
    val next = latestVersion(spark, root).map(_ + 1).getOrElse(0L)
    val dataDir = s"$root/v$next"
    df.write.mode("overwrite").parquet(dataDir)
    def js(s: String): String = s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    }
    val manifest =
      s"""{"version":$next,"path":"v$next","tag":"${js(tag)}"}"""
    val f = fs(spark, root)
    val p = new Path(root, s"$ManifestPrefix$next.json")
    val out = f.create(p, false) // no overwrite: a version is immutable
    try out.write(manifest.getBytes("UTF-8")) finally out.close()
    next
  }

  /** Read the newest committed snapshot. */
  def read(spark: SparkSession, root: String): DataFrame = {
    val v = latestVersion(spark, root).getOrElse(
      sys.error(s"no committed version at $root"))
    readVersion(spark, root, v)
  }

  /** Time travel: read snapshot `version` exactly as committed. */
  def readVersion(spark: SparkSession, root: String,
      version: Long): DataFrame = {
    val raw = readManifest(spark, root, version)
    val rel = """"path":"((?:[^"\\]|\\.)*)"""".r.findFirstMatchIn(raw)
      .map(_.group(1)).getOrElse(s"v$version")
    spark.read.parquet(s"$root/$rel")
  }

  /** Drop everything under `root` — test/scratch hygiene helper. */
  def destroy(spark: SparkSession, root: String): Unit = {
    val f = fs(spark, root)
    val p = new Path(root)
    if (f.exists(p)) { f.delete(p, true); () }
  }
}
