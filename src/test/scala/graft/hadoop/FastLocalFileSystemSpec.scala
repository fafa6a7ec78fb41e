package graft.hadoop

import java.nio.file.{Files, Paths}

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.hadoop.fs.permission.FsPermission
import org.scalatest.funsuite.AnyFunSuite

/** Pins the fork-free local FS (optimization r18) to the stock
  * semantics it replaces: identical permission bits for every mode the
  * engine writes, and link-status parity on regular files, dirs and
  * symlinks. The CLASS is what Bench/Verify register under
  * `fs.file.impl` / `fs.AbstractFileSystem.file.impl`; these checks
  * are what "same files, same bits" rests on.
  */
class FastLocalFileSystemSpec extends AnyFunSuite {

  private def newFs(): FastRawLocalFileSystem = {
    val fs = new FastRawLocalFileSystem
    fs.initialize(java.net.URI.create("file:///"), new Configuration())
    fs
  }

  test("setPermission writes the same bits as chmod for common modes") {
    val fs = newFs()
    val dir = Files.createTempDirectory("fastfs")
    val f = dir.resolve("probe.txt")
    Files.write(f, "x".getBytes)
    val p = new Path(f.toUri)
    Seq("644", "600", "755", "700", "640", "444").foreach { mode =>
      fs.setPermission(p, new FsPermission(
        Integer.parseInt(mode, 8).toShort))
      val got = fs.getFileStatus(p).getPermission.toShort
      assert(got == Integer.parseInt(mode, 8).toShort,
        s"mode $mode round-trips")
      // cross-check against the kernel's own view
      val posix = org.apache.hadoop.fs.permission.FsPermission
        .valueOf("-" + posixString(f))
      assert(posix.toShort == Integer.parseInt(mode, 8).toShort,
        s"mode $mode visible to NIO")
    }
    Files.deleteIfExists(f); Files.deleteIfExists(dir)
  }

  private def posixString(p: java.nio.file.Path): String =
    java.nio.file.attribute.PosixFilePermissions.toString(
      Files.getPosixFilePermissions(p))

  test("getFileLinkStatus: regular file, dir, symlink, missing") {
    val fs = newFs()
    val dir = Files.createTempDirectory("fastfs2")
    val f = dir.resolve("data.bin")
    Files.write(f, Array[Byte](1, 2, 3))
    val reg = fs.getFileLinkStatus(new Path(f.toUri))
    assert(!reg.isSymlink && reg.getLen == 3)
    val d = fs.getFileLinkStatus(new Path(dir.toUri))
    assert(d.isDirectory)
    // symlink case: PARITY with the stock implementation is the
    // contract (Hadoop ships with FileSystem symlink support disabled,
    // so both report a dereferenced status — what matters is that the
    // fast path never diverges from stock)
    val link = dir.resolve("ln")
    Files.createSymbolicLink(link, f)
    val stock = new org.apache.hadoop.fs.RawLocalFileSystem
    stock.initialize(java.net.URI.create("file:///"), new Configuration())
    val fast = fs.getFileLinkStatus(new Path(link.toUri))
    val ref = stock.getFileLinkStatus(new Path(link.toUri))
    assert(fast.isSymlink == ref.isSymlink &&
      fast.isDirectory == ref.isDirectory && fast.getLen == ref.getLen)
    intercept[java.io.FileNotFoundException] {
      fs.getFileLinkStatus(new Path(dir.resolve("absent").toUri))
    }
    Seq(link, f, dir).foreach(Files.deleteIfExists(_))
  }

  test("rename through the FileContext twin moves content (the hot path)") {
    // the checkpoint manager's close() → rename is where the forked
    // readlink lived; drive the same FileContext API end to end
    val conf = new Configuration()
    conf.set("fs.AbstractFileSystem.file.impl",
      classOf[FastLocalFs].getName)
    val fc = org.apache.hadoop.fs.FileContext.getFileContext(
      java.net.URI.create("file:///"), conf)
    val dir = Files.createTempDirectory("fastfs3")
    val src = new Path(dir.resolve("a").toUri)
    val dst = new Path(dir.resolve("b").toUri)
    val out = fc.create(src,
      java.util.EnumSet.of(org.apache.hadoop.fs.CreateFlag.CREATE))
    out.write("payload".getBytes); out.close()
    fc.rename(src, dst, org.apache.hadoop.fs.Options.Rename.OVERWRITE)
    assert(new String(Files.readAllBytes(
      Paths.get(dir.resolve("b").toUri))) == "payload")
    assert(!Files.exists(Paths.get(dir.resolve("a").toUri)))
    // ChecksumFs leaves .crc siblings — clean recursively
    import scala.jdk.CollectionConverters._
    Files.walk(dir).iterator().asScala.toSeq.reverse
      .foreach(Files.deleteIfExists(_))
  }
}
