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

  test("scd2 plans ONE exchange for both windows") {
    val events = Seq((1L, 1L, "a")).toDF("user_id", "seq", "plan")
      .selectExpr("user_id", "timestamp_micros(seq) AS ts", "seq", "plan")
    val plan = Cdc.scd2(events, "user_id", "ts", "plan", Seq("seq"))
      .queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(exchanges == 1, s"expected 1 exchange, got $exchanges:\n$plan")
  }
}
