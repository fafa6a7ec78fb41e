package graft

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.functions._

import graft.operators.Ivm
import graft.sources.VersionedTable
import graft.streaming.StreamingIvm

class VersionedTableSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def freshRoot(name: String): String = {
    val root = s"${graft.config.Scratch.dir}/vtspec_$name"
    VersionedTable.destroy(spark, root)
    root
  }

  test("commit/read/time-travel: every committed snapshot stays " +
      "readable by version id, latest wins the plain read") {
    val root = freshRoot("basic")
    val d0 = Seq((1L, "a"), (2L, "b")).toDF("k", "v")
    val d1 = Seq((1L, "a2"), (3L, "c")).toDF("k", "v")
    assert(VersionedTable.commit(d0, root, tag = "base") == 0L)
    assert(VersionedTable.commit(d1, root) == 1L)
    assert(VersionedTable.versions(spark, root) == Seq(0L, 1L))
    assert(VersionedTable.latestVersion(spark, root).contains(1L))
    val got0 = VersionedTable.readVersion(spark, root, 0L)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    val got1 = VersionedTable.read(spark, root)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(got0 == Set((1L, "a"), (2L, "b")))
    assert(got1 == Set((1L, "a2"), (3L, "c")))
  }

  test("manifest-last protocol: an orphan data dir (crash before " +
      "manifest) is invisible; uncommitted versions refuse to read") {
    val root = freshRoot("orphan")
    VersionedTable.commit(Seq((1L, "a")).toDF("k", "v"), root)
    // simulate a crash mid-commit: data landed, manifest never did
    Seq((9L, "ghost")).toDF("k", "v")
      .write.parquet(s"$root/v99")
    assert(VersionedTable.versions(spark, root) == Seq(0L))
    assert(VersionedTable.read(spark, root).collect().map(_.getLong(0))
      .toSeq == Seq(1L))
    intercept[Exception] {
      VersionedTable.readVersion(spark, root, 99L)
    }
  }

  test("tags record the writer's idempotence handle per version") {
    val root = freshRoot("tags")
    VersionedTable.commit(Seq((1L, "a")).toDF("k", "v"), root, tag = "0")
    assert(VersionedTable.latestTag(spark, root).contains("0"))
    VersionedTable.commit(Seq((2L, "b")).toDF("k", "v"), root, tag = "7")
    assert(VersionedTable.latestTag(spark, root).contains("7"))
  }

  test("streaming IVM survives a forced mid-stream crash-restart from " +
      "checkpoint: resumed state equals the batch recompute and a " +
      "replayed batch is skipped") {
    val base = freshRoot("crash")
    val src = s"$base/src"
    val ckpt = s"$base/ckpt"
    val stateRoot = s"$base/state"
    val keys = Seq("g")
    val b0 = Seq(("a", 1.0, 1L), ("a", 3.0, 2L), ("b", 2.0, 2L))
      .toDF("g", "v", "d")
    val b1 = Seq(("a", 5.0, 1L), ("b", 4.0, 3L), ("c", 7.0, 4L))
      .toDF("g", "v", "d")
    val schema = b0.schema
    def runOnce(): Unit = {
      val q = spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
        .writeStream
        .option("checkpointLocation", ckpt)
        .foreachBatch(
          StreamingIvm.foldBatch(spark, stateRoot, keys, "v", "d") _)
        .start()
      try q.processAllAvailable() finally q.stop()
    }
    // batch 0 arrives, the job "crashes" (stops) after committing it
    b0.coalesce(1).write.mode("overwrite").parquet(src)
    runOnce()
    assert(VersionedTable.latestTag(spark, stateRoot).contains("0"))
    // batch 1 arrives while the job is down; a NEW query resumes from
    // the SAME checkpoint and must fold exactly the unseen file
    b1.coalesce(1).write.mode("append").parquet(src)
    runOnce()
    val fin = Ivm.finalizeState(
      VersionedTable.read(spark, stateRoot), keys)
      .select("g", "n", "sum_v", "min_v", "max_v", "avg_v").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4), r.getDouble(5))).toSet
    val direct = Ivm.finalizeState(
      Ivm.aggState(b0.unionByName(b1), keys, "v", "d"), keys)
      .select("g", "n", "sum_v", "min_v", "max_v", "avg_v").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4), r.getDouble(5))).toSet
    assert(fin == direct,
      s"resumed streaming state diverged: $fin vs $direct")
    // exactly one state version per batch — the resume did NOT refold
    // batch 0
    assert(VersionedTable.versions(spark, stateRoot) == Seq(0L, 1L))
    // at-least-once delivery: force a replay of batch 0 — the tag
    // check must skip it, leaving the state untouched
    StreamingIvm.foldBatch(spark, stateRoot, keys, "v", "d")(b0, 0L)
    assert(VersionedTable.versions(spark, stateRoot) == Seq(0L, 1L))
  }
}
