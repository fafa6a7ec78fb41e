package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.QualityChecks
import graft.operators.QualityChecks._

class QualityChecksSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // 5 rows: one null name, one duplicate id, one out-of-pattern name
  private lazy val df = Seq(
    (Some(1L), Some("u_001"), Some(10.0)),
    (Some(2L), Some("u_002"), Some(-5.0)),
    (Some(2L), Some("u_003"), Some(99.5)),
    (Some(3L), None: Option[String], Some(0.0)),
    (Some(4L), Some("x_bad"), None: Option[Double])
  ).toDF("id", "name", "bal")

  test("battery evaluates hand-computed metrics and pass flags") {
    val out = QualityChecks.evaluate(df, Seq(
      completeness("name", 0.9),        // 4/5 = 0.8 → fail
      completeness("bal", 0.8),         // 4/5 = 0.8 → pass
      uniqueness("id", 1.0),            // 4 distinct / 5 → fail
      minValue("bal", -10.0),           // min -5 ≥ -10 → pass
      maxValue("bal", 50.0),            // max 99.5 → fail
      matchFraction("name", "^u_[0-9]{3}$", 0.75), // 3/4 → pass
      inSet("name", Seq("u_001", "u_002"), 0.6)    // 2/4 → fail
    )).collect().map(r => r.getString(0) ->
      ((r.getDouble(2), r.getInt(4)))).toMap

    assert(out("completeness_name") == ((0.8, 0)))
    assert(out("completeness_bal") == ((0.8, 1)))
    assert(out("uniqueness_id") == ((0.8, 0)))
    assert(out("min_bal") == ((-5.0, 1)))
    assert(out("max_bal") == ((99.5, 0)))
    assert(out("match_name") == ((0.75, 1)))
    assert(out("in_set_name") == ((0.5, 0)))
  }

  test("the whole battery is one scan of the input") {
    val plan = QualityChecks.evaluate(df, Seq(
      completeness("name", 1.0), uniqueness("id", 1.0),
      minValue("bal", 0.0), matchFraction("name", "^u", 0.5)
    )).queryExecution.executedPlan.toString
    val scans = "LocalTableScan".r.findAllIn(plan).size
    assert(scans == 1, s"expected 1 scan, got $scans:\n$plan")
  }

  test("approx uniqueness avoids Expand and stays within HLL error") {
    val big = spark.range(0, 2000).selectExpr("id", "id % 7 AS g")
    val out = QualityChecks.evaluate(big, Seq(
      approxUniqueness("id", 0.9))).collect().head
    assert(out.getInt(4) == 1, s"approx uniqueness failed: $out")
    assert(math.abs(out.getDouble(2) - 1.0) < 0.05)
    val plan = QualityChecks.evaluate(big,
      Seq(approxUniqueness("id", 0.9)))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Expand"), s"approx path must not Expand")
  }

  test("nulls: completeness sees them, value checks ignore them") {
    val allNull = Seq((None: Option[Double], 1),
      (None: Option[Double], 2)).toDF("v", "k")
    val out = QualityChecks.evaluate(allNull, Seq(
      completeness("v", 0.5))).collect().head
    assert(out.getDouble(2) == 0.0 && out.getInt(4) == 0)
  }

  test("quarantine tags each row with its violated rules in " +
      "declaration order; the clean/quarantine split is a partition") {
    import org.apache.spark.sql.functions.col
    val df = Seq((1L, 10.0, "A"), (2L, -5.0, "A"), (3L, 10.0, "B"),
      (4L, -1.0, "B"), (5L, 0.0, "A")).toDF("k", "price", "status")
    val tagged = QualityChecks.quarantine(df, Seq(
      "pos_price" -> (col("price") > 0.0),
      "status_a" -> (col("status") === "A")))
    val rows = tagged.collect().map(r => (r.getLong(0),
      r.getAs[String]("reasons"), r.getAs[Int]("n_reasons"))).toSet
    assert(rows == Set(
      (1L, "", 0),
      (2L, "pos_price", 1),
      (3L, "status_a", 1),
      (4L, "pos_price,status_a", 2),
      (5L, "pos_price", 1)))
    // clean + quarantined partition the input exactly
    assert(tagged.where(col("n_reasons") === 0).count() +
      tagged.where(col("n_reasons") > 0).count() == 5L)
  }

  test("quarantine routes NULL-evaluating rules to the quarantine " +
      "path, not the clean path") {
    import org.apache.spark.sql.functions.col
    // a NULL price makes `price > 0` evaluate to NULL: the row is NOT
    // provably conformant, so it must be tagged (the safe direction
    // for a dead-letter split, and SQL CASE semantics)
    val df = Seq((1L, Some(10.0), "A"), (2L, None: Option[Double], "A"),
      (3L, None: Option[Double], "B")).toDF("k", "price", "status")
    val rows = QualityChecks.quarantine(df, Seq(
        "pos_price" -> (col("price") > 0.0),
        "status_a" -> (col("status") === "A")))
      .collect().map(r => (r.getLong(0),
        r.getAs[String]("reasons"), r.getAs[Int]("n_reasons"))).toSet
    assert(rows == Set(
      (1L, "", 0),
      (2L, "pos_price", 1),
      (3L, "pos_price,status_a", 2)))
  }
}
