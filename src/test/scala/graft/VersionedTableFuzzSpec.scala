package graft

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.functions._

import graft.sources.VersionedTable

/** Model-based fuzz of the snapshot store: a seeded random sequence of
  * commit / append (single-writer AND optimistic) / deleteWhere /
  * deleteWhereMor / compactDeletes / upsert / compact / rollback /
  * vacuum ops runs against both the real table and an in-memory
  * multiset model; after every op the latest snapshot must equal the
  * model, and every still-retained historical version must equal the
  * model's memory of it. This is the test shape that catches protocol
  * interactions no single-op spec enumerates (append-after-rollback,
  * vacuum liveness under shared directories, compaction of an append
  * chain mid-history).
  */
class VersionedTableFuzzSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private type Rows = Seq[(Long, Long)] // multiset of (k, v)

  private def df(rows: Rows) = rows.toDF("k", "v").coalesce(1)

  private def readRows(root: String, version: Long): Rows =
    VersionedTable.readVersion(spark, root, version)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq

  test("30-op random sequences against the in-memory model, 3 seeds") {
    for (seed <- Seq(11L, 22L, 33L)) {
      val rnd = new scala.util.Random(seed)
      val root = s"${graft.config.Scratch.dir}/vtfuzz_$seed"
      VersionedTable.destroy(spark, root)
      var nextKey = 0L
      def fresh(n: Int): Rows = {
        val rows = (0 until n).map(i =>
          (nextKey + i, rnd.nextInt(100).toLong))
        nextKey += n
        rows
      }
      // model: content of every committed version, by version id
      val model = scala.collection.mutable.Map[Long, Rows]()
      var live = Set.empty[Long]
      // first op is always a base commit
      val base = fresh(20)
      val v0 = VersionedTable.commit(df(base), root)
      model(v0) = base; live += v0
      def latest = live.max

      for (step <- 1 to 30) {
        rnd.nextInt(13) match {
          case 0 => // rewrite commit
            val rows = fresh(rnd.nextInt(15) + 1)
            val v = VersionedTable.commit(df(rows), root)
            model(v) = rows; live += v
          case 1 => // fast append — alternating the single-writer and
            // the optimistic protocol so the manifest-carried delete
            // reference is fuzzed under both
            val delta = fresh(rnd.nextInt(10) + 1)
            val v =
              if (rnd.nextBoolean())
                VersionedTable.commitAppend(df(delta), root)
              else VersionedTable.commitAppendRetry(df(delta), root)
            // the version preceding v is always the live max at call
            // time: nextVersionDir allocates latestVersion + 1
            model(v) = model(v - 1) ++ delta
            live += v
          case 2 => // copy-on-write delete of a random key residue
            val m = rnd.nextInt(5) + 2
            val v = VersionedTable.deleteWhere(spark, root,
              col("k") % m === 0)
            model(v) = model(v - 1).filterNot(_._1 % m == 0)
            live += v
          case 3 => // upsert: update some existing keys + new ones
            val cur = model(latest)
            val updKeys = rnd.shuffle(cur.map(_._1).distinct)
              .take(rnd.nextInt(5))
            val upd = updKeys.map(k => (k, 999L)) ++ fresh(2)
            val v = VersionedTable.upsert(spark, root, df(upd),
              Seq("k"))
            model(v) = model(v - 1).filterNot(r =>
              upd.map(_._1).contains(r._1)) ++ upd
            live += v
          case 4 => // compact (content-identical new version)
            val v = VersionedTable.compact(spark, root,
              targetBytes = 1L << 30)
            model(v) = model(v - 1); live += v
          case 5 => // rollback to a random LIVE version
            val target = rnd.shuffle(live.toSeq).head
            val v = VersionedTable.rollback(spark, root, target)
            model(v) = model(target); live += v
          case 6 => // vacuum to a random retention window
            val keep = rnd.nextInt(3) + 1
            VersionedTable.vacuum(spark, root, keepLast = keep)
            live = live.toSeq.sorted.takeRight(keep).toSet
          case 7 => // merge-on-read delete of a key residue (keys are
            // globally unique, so key-level == row-level in the model)
            val m = rnd.nextInt(5) + 2
            val v = VersionedTable.deleteWhereMor(spark, root,
              col("k") % m === 0, Seq("k"))
            model(v) = model(v - 1).filterNot(_._1 % m == 0)
            live += v
          case 8 => // fold MoR deletes back to copy-on-write
            val v = VersionedTable.compactDeletes(spark, root)
            model(v) = model(v - 1); live += v
          case 9 => // RE-INSERT: append a delta re-using keys that are
            // no longer visible (commonly MoR-erased ones) — sequence
            // scoping must surface them again exactly like fresh keys,
            // not anti-join them against a delete that precedes them
            val curKeys = model(latest).map(_._1).toSet
            val gone = (0L until nextKey).filterNot(curKeys)
            val reKeys = rnd.shuffle(gone).take(math.min(3, gone.size))
            val delta = reKeys.map(k => (k, 777L)) ++ fresh(1)
            val v =
              if (rnd.nextBoolean())
                VersionedTable.commitAppend(df(delta), root)
              else VersionedTable.commitAppendRetry(df(delta), root)
            model(v) = model(v - 1) ++ delta
            live += v
          case 10 => // MERGE-ON-READ upsert: one atomic commit of
            // delta dir + blind delete sidecar — model identical to
            // the CoW upsert's
            val cur = model(latest)
            val updKeys = rnd.shuffle(cur.map(_._1).distinct)
              .take(rnd.nextInt(4))
            val upd = updKeys.map(k => (k, 888L)) ++ fresh(2)
            val v = VersionedTable.upsertMor(spark, root, df(upd),
              Seq("k"))
            model(v) = model(v - 1).filterNot(r =>
              upd.map(_._1).contains(r._1)) ++ upd
            live += v
          case 11 => // full MERGE (CoW, optimistic retry): delete /
            // update / insert branches from one source batch
            val cur = model(latest).map(_._1).distinct
            val shuffled = rnd.shuffle(cur)
            val delKeys = shuffled.take(rnd.nextInt(3))
            val updKeys = shuffled.drop(delKeys.size)
              .take(rnd.nextInt(3))
            val ins = fresh(1)
            val src = delKeys.map(k => (k, 0L, "d")) ++
              updKeys.map(k => (k, 555L, "u")) ++
              ins.map { case (k, x) => (k, x, "i") }
            val v = VersionedTable.merge(spark, root,
              src.toDF("k", "v", "op"), Seq("k"),
              deleteIf = Some(col("op") === "d"))
            model(v) = model(v - 1)
              .filterNot(r => delKeys.contains(r._1))
              .filterNot(r => updKeys.contains(r._1)) ++
              updKeys.map(k => (k, 555L)) ++ ins
            live += v
          case 12 => // SQL-shaped UPDATE: assignment over a residue
            val m = rnd.nextInt(5) + 2
            val v = VersionedTable.updateWhere(spark, root,
              Seq("v" -> lit(444L)), Some(col("k") % m === 0))
            model(v) = model(v - 1).map(r =>
              if (r._1 % m == 0) (r._1, 444L) else r)
            live += v
        }
        // footer-metadata COUNT(*) (or its MoR fallback) always
        // equals the model's cardinality
        assert(VersionedTable.fastCount(spark, root, latest) ==
          model(latest).size,
          s"seed $seed step $step: fastCount diverged")
        // latest snapshot always equals the model
        val got = readRows(root, latest).sorted
        assert(got == model(latest).sorted,
          s"seed $seed step $step: latest diverged " +
            s"(${got.size} vs ${model(latest).size} rows)")
        // the predicate-pushdown read agrees with the model filter on
        // a random key range, whatever mix of appends/deletes/
        // compactions produced the snapshot (stats sidecars may or may
        // not exist — pruning must never change the answer)
        val lo = rnd.nextLong(math.max(1L, nextKey))
        val hi = lo + rnd.nextLong(20L)
        val gotW = VersionedTable.readWhere(spark, root,
            col("k") >= lo && col("k") <= hi)
          .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted
        assert(gotW == model(latest)
            .filter(r => r._1 >= lo && r._1 <= hi).sorted,
          s"seed $seed step $step: readWhere [$lo,$hi] diverged")
        // one random retained historical version equals its memory
        val probe = rnd.shuffle(live.toSeq).head
        assert(readRows(root, probe).sorted == model(probe).sorted,
          s"seed $seed step $step: version $probe diverged")
        // version ids the store reports are exactly the live set
        assert(VersionedTable.versions(spark, root).toSet == live,
          s"seed $seed step $step: live set diverged")
      }
      VersionedTable.destroy(spark, root)
    }
  }

  /** Round-14 concurrency fuzz (VERDICT r13 #5): N threads race a
    * random mix of the write verbs {append, merge, upsertMor+deleteIf,
    * deleteKeysMor, compactDeletes, vacuum} on one table; every verb
    * payload is a pure function of (schedule seed, thread, index), so
    * the winning COMMIT ORDER (the tags in manifest order) can be
    * replayed SEQUENTIALLY on a twin table. Invariants per schedule:
    * no thread throws, fsck is clean (before and after an aggressive
    * post-join vacuum), and the racing table's final logical content
    * equals the twin's — i.e. the outcome is serializable: it IS some
    * sequential order, namely the commit order the optimistic
    * protocols produced. Maintenance verbs are content-neutral and
    * drop out of the replay by construction.
    */
  test("50 seeded N-thread interleavings of append / merge / " +
      "upsertMor / deleteKeysMor / compactDeletes / vacuum: " +
      "fsck-clean and serializable (replay of the commit order)") {
    import org.apache.spark.sql.functions.col
    for (seed <- 1 to 50) {
      val root = s"${graft.config.Scratch.dir}/vtrace_$seed"
      val twin = s"${graft.config.Scratch.dir}/vtrace_twin_$seed"
      VersionedTable.destroy(spark, root)
      VersionedTable.destroy(spark, twin)
      val rnd = new scala.util.Random(seed * 7919L)
      val baseRows: Rows = (0L until 24L).map(k => (k, k % 7))
      VersionedTable.commit(df(baseRows), root, tag = "base")

      val nThreads = 2 + rnd.nextInt(2)
      val opsPerThread = 2 + rnd.nextInt(2)
      // every payload precomputed on the test thread from its own
      // Random — thread scheduling can never change WHAT an op does,
      // only WHEN it commits
      sealed trait Verb
      case class Append(rows: Rows) extends Verb
      case class Merge(rows: Rows) extends Verb
      case class UpsertDel(rows: Seq[(Long, Long, String)]) extends Verb
      case class DelKeys(keys: Seq[Long]) extends Verb
      case object Compact extends Verb
      case object Vacuum extends Verb
      val plan: Map[(Int, Int), Verb] =
        (for (t <- 0 until nThreads; i <- 0 until opsPerThread) yield {
          val r = new scala.util.Random(seed * 100003L + t * 101L + i)
          def keys(n: Int): Seq[Long] =
            r.shuffle((0L until 50L).toList).take(n)
          val verb = r.nextInt(6) match {
            case 0 => Append((0 until 4).map(j =>
              (1000L + (t * 10 + i) * 10 + j, r.nextInt(100).toLong)))
            case 1 => Merge(keys(5).map(k => (k, r.nextInt(100).toLong)))
            case 2 => UpsertDel(keys(6).map(k =>
              (k, r.nextInt(100).toLong,
                if (r.nextInt(3) == 0) "d" else "u")))
            case 3 => DelKeys(keys(4))
            case 4 => Compact
            case 5 => Vacuum
          }
          (t, i) -> verb
        }).toMap

      def applyOp(target: String, t: Int, i: Int): Unit = {
        val tag = s"op-$t-$i"
        plan((t, i)) match {
          case Append(rows) =>
            VersionedTable.commitAppendRetry(df(rows), target, tag)
          case Merge(rows) =>
            VersionedTable.merge(spark, target, df(rows), Seq("k"),
              updateMatched = true, insertUnmatched = true, tag = tag)
          case UpsertDel(rows) =>
            VersionedTable.upsertMor(spark, target,
              rows.toDF("k", "v", "op"), Seq("k"), tag = tag,
              deleteIf = Some(col("op") === "d"))
          case DelKeys(ks) =>
            VersionedTable.deleteKeysMor(spark, target, ks.toDF("k"),
              tag = tag)
          case Compact =>
            VersionedTable.compactDeletes(spark, target,
              tag = s"maint-$t-$i")
            ()
          case Vacuum =>
            // keepLast above any schedule's version count: concurrent
            // vacuum exercises the listing/orphan sweep, never expiry
            // (expiry racing an in-flight rewrite is the documented
            // retention-vs-reader-duration contract, tested separately)
            VersionedTable.vacuum(spark, target, keepLast = 16)
        }
      }

      val errors = new java.util.concurrent.ConcurrentLinkedQueue[String]
      val start = new java.util.concurrent.CountDownLatch(1)
      val threads = (0 until nThreads).map { t =>
        new Thread(() => {
          start.await()
          for (i <- 0 until opsPerThread) {
            try applyOp(root, t, i)
            catch { case e: Throwable =>
              errors.add(s"seed $seed op-$t-$i: $e")
            }
          }
        })
      }
      threads.foreach(_.start())
      start.countDown()
      threads.foreach(_.join(300000))
      assert(errors.isEmpty, s"seed $seed: $errors")
      assert(VersionedTable.fsck(spark, root).isEmpty,
        s"seed $seed: fsck after race")

      // the serial order the race RESOLVED TO is the tag sequence in
      // manifest order — capture before vacuum expires old manifests
      val commitOrder = VersionedTable.history(spark, root)
        .sortBy(_._1).map(_._2).filter(_.startsWith("op-"))
      assert(commitOrder.size ==
        plan.count(p => p._2 != Compact && p._2 != Vacuum),
        s"seed $seed: a data op committed zero or twice: $commitOrder")
      VersionedTable.commit(df(baseRows), twin, tag = "base")
      commitOrder.foreach { tag =>
        val Array(_, t, i) = tag.split("-")
        applyOp(twin, t.toInt, i.toInt)
      }
      def content(r: String): Seq[(Long, Long)] =
        VersionedTable.read(spark, r).collect()
          .map(x => (x.getLong(0), x.getLong(1))).toSeq.sorted
      assert(content(root) == content(twin),
        s"seed $seed: racing outcome is not the commit-order replay")

      // aggressive retention after the dust settles: live dirs must
      // survive, content must not move, fsck must stay clean
      VersionedTable.vacuum(spark, root, keepLast = 2,
        orphanGraceMs = 0L)
      assert(VersionedTable.fsck(spark, root).isEmpty,
        s"seed $seed: fsck after aggressive vacuum")
      assert(content(root) == content(twin),
        s"seed $seed: vacuum moved logical content")
      VersionedTable.destroy(spark, root)
      VersionedTable.destroy(spark, twin)
    }
  }
}
