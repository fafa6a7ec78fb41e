package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Cdc

class CdcSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("snapshot diff classifies insert/update/delete, drops unchanged") {
    val old = Seq(
      (1L, Some("A"), Some(10.0)),
      (2L, Some("B"), Some(20.0)),
      (3L, Some("C"), None: Option[Double])
    ).toDF("k", "s", "v")
    val nw = Seq(
      (2L, Some("B"), Some(25.0)),               // v changed
      (3L, Some("C"), None: Option[Double]),     // unchanged (null-safe)
      (4L, Some("D"), Some(5.0))                 // new key
    ).toDF("k", "s", "v")
    val out = Cdc.snapshotDiff(old, nw, Seq("k"), Seq("s", "v"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2)))
    assert(out.toSet == Set(
      (1L, "delete", 0), (2L, "update", 1), (4L, "insert", 0)))
  }

  test("snapshot diff counts every differing column") {
    val old = Seq((1L, "A", 1.0)).toDF("k", "s", "v")
    val nw = Seq((1L, "B", 2.0)).toDF("k", "s", "v")
    val out = Cdc.snapshotDiff(old, nw, Seq("k"), Seq("s", "v"))
      .collect().head
    assert(out.getString(1) == "update" && out.getInt(2) == 2)
  }

  test("scd2 opens a version per change, null-safely") {
    val events = Seq(
      (7L, 1L, Some("free")),
      (7L, 2L, Some("free")),     // no change
      (7L, 3L, Some("pro")),      // change
      (7L, 4L, Some("pro")),
      (7L, 5L, None: Option[String]), // change to null
      (7L, 6L, Some("pro")),      // change back
      (9L, 1L, Some("solo"))      // single-version key
    ).toDF("user_id", "seq", "plan")
      .selectExpr("user_id", "timestamp_micros(seq) AS ts", "seq", "plan")
    val out = Cdc.scd2(events, "user_id", "ts", "plan",
        tieCols = Seq("seq"))
      .selectExpr("user_id", "version", "plan",
        "unix_micros(valid_from)", "unix_micros(valid_to)", "is_current")
      .collect().map(r => (r.getLong(0), r.getInt(1),
        Option(r.getString(2)),
        r.getLong(3), if (r.isNullAt(4)) -1L else r.getLong(4),
        r.getInt(5))).toSet
    assert(out == Set(
      (7L, 1, Some("free"), 1L, 3L, 0),
      (7L, 2, Some("pro"), 3L, 5L, 0),
      (7L, 3, None, 5L, 6L, 0),
      (7L, 4, Some("pro"), 6L, -1L, 1),
      (9L, 1, Some("solo"), 1L, -1L, 1)))
  }

  test("scd2Merge equals the full rebuild, including late deltas and " +
      "untouched keys") {
    def ev(rows: Seq[(Long, Long, String)]) =
      rows.toDF("user_id", "seq", "plan")
        .selectExpr("user_id", "timestamp_micros(seq) AS ts", "seq",
          "plan")
    val baseRows = Seq((1L, 10L, "a"), (1L, 20L, "b"),
      (2L, 10L, "x"), (3L, 15L, "q"))
    // user 1 gets new changes INCLUDING one before its last version
    // (late data); user 2 gets a no-op repeat; user 3 untouched
    val deltaRows = Seq((1L, 15L, "c"), (1L, 30L, "d"), (2L, 40L, "x"))
    val merged = Cdc.scd2Merge(
      Cdc.scd2(ev(baseRows), "user_id", "ts", "plan", Seq("seq")),
      ev(deltaRows), "user_id", "ts", "plan", Seq("seq"))
    val full = Cdc.scd2(ev(baseRows ++ deltaRows),
      "user_id", "ts", "plan", Seq("seq"))
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.selectExpr("user_id", "version", "plan",
        "unix_micros(valid_from) AS f", "unix_micros(valid_to) AS t",
        "is_current")
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2),
          r.getLong(3), if (r.isNullAt(4)) -1L else r.getLong(4),
          r.getInt(5))).toSet
    assert(canon(merged) == canon(full))
    // late delta split user 1's history: a[10,15) c[15,20) b[20,30) d
    assert(canon(merged).count(_._1 == 1L) == 4)
    // user 2's repeat opened no version
    assert(canon(merged).count(_._1 == 2L) == 1)
  }

  test("fuzz: scd2 agrees with an independent in-memory reference " +
      "over random logs (ties, nulls, single-event keys)") {
    val rnd = new scala.util.Random(20260813L)
    for (round <- 1 to 25) {
      val n = 1 + rnd.nextInt(30)
      val rows = (0 until n).map { i =>
        (rnd.nextInt(4).toLong,            // user
          (1 + rnd.nextInt(10)).toLong,    // ts with collisions
          i.toLong,                        // unique tie
          if (rnd.nextInt(5) == 0) null
          else s"v${rnd.nextInt(3)}")      // attr incl. nulls
      }
      val df = rows.toDF("u", "seq", "tie", "a")
        .selectExpr("u", "timestamp_micros(seq) AS ts", "tie", "a")
      val got = Cdc.scd2(df, "u", "ts", "a", Seq("tie"))
        .selectExpr("u", "version", "a", "unix_micros(valid_from)",
          "unix_micros(valid_to)", "is_current")
        .collect().map(r => (r.getLong(0), r.getInt(1),
          Option(r.getString(2)), r.getLong(3),
          if (r.isNullAt(4)) -1L else r.getLong(4), r.getInt(5))).toSet
      // reference: per key sort by (ts, tie), keep change points,
      // then valid_to = next change point's ts
      val want = rows.groupBy(_._1).flatMap { case (u, rs) =>
        val sorted = rs.sortBy(r => (r._2, r._3))
        val changes = sorted.foldLeft(
          Vector.empty[(Long, Option[String])]) { (acc, r) =>
          val a = Option(r._4)
          if (acc.isEmpty || acc.last._2 != a) acc :+ ((r._2, a))
          else acc
        }
        changes.zipWithIndex.map { case ((ts, a), i) =>
          val to = if (i + 1 < changes.length) changes(i + 1)._1
                   else -1L
          (u, i + 1, a, ts, to, if (to == -1L) 1 else 0)
        }
      }.toSet
      assert(got == want, s"round $round: log = $rows")
    }
  }

  test("fuzz: time-cut scd2Merge equals the full rebuild") {
    val rnd = new scala.util.Random(42424242L)
    for (round <- 1 to 15) {
      val n = 2 + rnd.nextInt(25)
      val rows = (0 until n).map { i =>
        (rnd.nextInt(3).toLong, (1 + rnd.nextInt(12)).toLong,
          i.toLong, s"v${rnd.nextInt(3)}")
      }
      def df(rs: Seq[(Long, Long, Long, String)]) =
        rs.toDF("u", "seq", "tie", "a")
          .selectExpr("u", "timestamp_micros(seq) AS ts", "tie", "a")
      val cut = 1 + rnd.nextInt(12)
      val (baseR, deltaR) = rows.partition(_._2 < cut)
      if (baseR.nonEmpty) {
        def canon(x: org.apache.spark.sql.DataFrame) =
          x.selectExpr("u", "version", "a", "unix_micros(valid_from)",
            "unix_micros(valid_to)", "is_current")
            .collect().map(r => (r.getLong(0), r.getInt(1),
              r.getString(2), r.getLong(3),
              if (r.isNullAt(4)) -1L else r.getLong(4),
              r.getInt(5))).toSet
        val merged = Cdc.scd2Merge(
          Cdc.scd2(df(baseR), "u", "ts", "a", Seq("tie")),
          df(deltaR), "u", "ts", "a", Seq("tie"))
        val full = Cdc.scd2(df(rows), "u", "ts", "a", Seq("tie"))
        assert(canon(merged) == canon(full),
          s"round $round cut $cut: log = $rows")
      }
    }
  }

  test("scd2 plans ONE exchange for both windows") {
    val events = Seq((1L, 1L, "a")).toDF("user_id", "seq", "plan")
      .selectExpr("user_id", "timestamp_micros(seq) AS ts", "seq", "plan")
    val plan = Cdc.scd2(events, "user_id", "ts", "plan", Seq("seq"))
      .queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(exchanges == 1, s"expected 1 exchange, got $exchanges:\n$plan")
  }
}
