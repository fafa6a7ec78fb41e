package graft.hadoop

import java.net.URI
import java.nio.file.{Files, Paths}
import java.nio.file.attribute.PosixFilePermission
import java.util.{EnumSet => JEnumSet}

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{ChecksumFs, DelegateToFileSystem, FileStatus, LocalFileSystem, Path, RawLocalFileSystem}
import org.apache.hadoop.fs.permission.FsPermission

/** Local filesystem whose permission operations run in-process.
  *
  * Why this exists (optimization r18, guide §1/§7.3): without the
  * Hadoop native library (libhadoop.so — not shipped with plain Spark
  * distributions), `RawLocalFileSystem.setPermission` falls back to
  * `Shell.execCommand("chmod", ...)` — a FORK+EXEC of the whole JVM
  * per created file. A JFR profile of one streaming query
  * (stream_funnel) recorded **16,247 `jdk.ProcessStart` events in
  * 48 s**, one per checkpoint/state/CRC file: offsets, commits, state
  * deltas for 4 join state stores × 32 shuffle partitions × every
  * micro-batch, plus every scratch parquet/CSV part file the suite
  * writes. Forking a multi-GB JVM serializes on the kernel's mmap
  * lock, so 32 concurrent state-store tasks each measured ~3 s of
  * "executor run time" on ~640 rows — the contention was fork, not
  * state (verified: 32 partitions on 4 cores cut total task time 8×;
  * heap size and checkpoint-on-tmpfs changed nothing).
  *
  * The override sets permissions with `java.nio.file.Files
  * .setPosixFilePermissions` — the exact semantic of `chmod <octal>`
  * for the user/group/other bits (sticky/setuid bits never appear in
  * FsPermission values Spark passes here, and `applyUMask` has
  * already run by the time setPermission is called). Everything else
  * inherits the stock implementation, including CRC checksums (this
  * wraps the overridden raw FS in the standard [[LocalFileSystem]]
  * checksum layer).
  *
  * Registered via `spark.hadoop.fs.file.impl` in the engine's own
  * sessions (Bench/Verify/ScanMain/Prof). On a real cluster the
  * checkpoint/scratch scheme is HDFS/S3 and this class is simply
  * never instantiated — the fix removes LOCAL-mode fork overhead; it
  * does not change what any query computes (same files, same bits,
  * same permissions).
  */
class FastLocalFileSystem
    extends LocalFileSystem(new FastRawLocalFileSystem)

object FastLocalFileSystem {
  /** The two Hadoop keys routing BOTH file APIs (FileSystem and
    * FileContext) through the fork-free local FS — applied by every
    * engine main (Bench/Verify/ScanMain/Explain/GenScale/Prof) via
    * [[config]]. Measured effect at sf0.1 (guide §1): stream_funnel
    * 8.45 s → 2.68 s steady-state; every query that writes scratch,
    * checkpoint or table files sheds its per-file fork cost.
    */
  val confs: Seq[(String, String)] = Seq(
    "spark.hadoop.fs.file.impl" ->
      classOf[FastLocalFileSystem].getName,
    "spark.hadoop.fs.AbstractFileSystem.file.impl" ->
      classOf[FastLocalFs].getName)

  def config(b: org.apache.spark.sql.SparkSession.Builder)
      : org.apache.spark.sql.SparkSession.Builder =
    confs.foldLeft(b) { case (x, (k, v)) => x.config(k, v) }
}

/** The FileContext-API twin (`fs.AbstractFileSystem.file.impl`):
  * Structured Streaming's default CheckpointFileManager goes through
  * `FileContext`, which resolves `file:` via `AbstractFileSystem` and
  * NEVER consults `fs.file.impl` — the profiled fork storm was 12,576
  * `readlink` (two per checkpoint-file RENAME, from
  * `AbstractFileSystem.renameInternal` → `getFileLinkStatus` →
  * `FileUtil.readLink` → Shell) plus 3,660 `chmod` (one per created
  * file). Mirrors Hadoop's own `LocalFs = ChecksumFs(RawLocalFs)`
  * structure with the fork-free raw FS underneath.
  */
class FastLocalFs(uri: URI, conf: Configuration)
    extends ChecksumFs(new FastRawLocalFs(uri, conf))

class FastRawLocalFs(uri: URI, conf: Configuration)
    extends DelegateToFileSystem(uri, new FastRawLocalFileSystem,
      conf, "file", false)

class FastRawLocalFileSystem extends RawLocalFileSystem {

  /** Fork-free `getFileLinkStatus` for the overwhelmingly common
    * not-a-symlink case (checkpoint temp files): one NIO attribute
    * read instead of a forked `readlink`. True symlinks (never
    * created by this engine) fall back to the stock implementation.
    */
  override def getFileLinkStatus(f: Path): FileStatus = {
    val p = Paths.get(pathToFile(f).getAbsolutePath)
    if (Files.isSymbolicLink(p)) super.getFileLinkStatus(f)
    else getFileStatus(f)
  }

  override def setPermission(p: Path, permission: FsPermission): Unit = {
    val bits = permission.toShort
    // sticky/setuid/setgid bits have no PosixFilePermission mapping —
    // delegate to the stock chmod path so parity with RawLocalFileSystem
    // is unconditional (Spark never passes them; callers might)
    if ((bits & ~0x1ff) != 0) { super.setPermission(p, permission); return }
    val perms = JEnumSet.noneOf(classOf[PosixFilePermission])
    def add(bit: Int, perm: PosixFilePermission): Unit =
      if ((bits & bit) != 0) { perms.add(perm); () }
    add(0x100, PosixFilePermission.OWNER_READ)
    add(0x080, PosixFilePermission.OWNER_WRITE)
    add(0x040, PosixFilePermission.OWNER_EXECUTE)
    add(0x020, PosixFilePermission.GROUP_READ)
    add(0x010, PosixFilePermission.GROUP_WRITE)
    add(0x008, PosixFilePermission.GROUP_EXECUTE)
    add(0x004, PosixFilePermission.OTHERS_READ)
    add(0x002, PosixFilePermission.OTHERS_WRITE)
    add(0x001, PosixFilePermission.OTHERS_EXECUTE)
    Files.setPosixFilePermissions(
      Paths.get(pathToFile(p).getAbsolutePath), perms)
    ()
  }
}
