package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Resample

class ResampleSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("resample plan: all exchanges are keyed by the entity key " +
      "(no global shuffle)") {
    val events = Seq((1L, "2024-03-01 08:00:00", 10.0))
      .toDF("user_id", "t", "value")
      .selectExpr("user_id", "CAST(t AS TIMESTAMP) AS ts", "value")
    val plan = Resample.dailyForwardFill(events, "user_id", "ts",
      "value").queryExecution.executedPlan.toString
    val n = "Exchange hashpartitioning".r.findAllIn(plan).size
    info(s"exchanges: $n")
    // every hash exchange must partition on user_id (alone or with
    // day) — never a keyless/global repartition
    "Exchange hashpartitioning\\(([^)]*)\\)".r
      .findAllMatchIn(plan).foreach { m =>
        assert(m.group(1).contains("user_id"), s"non-key exchange: $m")
      }
    assert(!plan.contains("Exchange SinglePartition"),
      s"global single-partition exchange in plan:\n$plan")
  }

  test("daily forward fill bridges gaps, flags observations, and " +
      "picks the LAST value of multi-event days") {
    val events = Seq(
      (1L, "2024-03-01 08:00:00", 10.0),
      (1L, "2024-03-01 17:00:00", 12.0), // same day, later → wins
      (1L, "2024-03-04 09:00:00", 20.0), // 2-day gap before
      (2L, "2024-03-02 10:00:00", 5.0)
    ).toDF("user_id", "t", "value")
      .selectExpr("user_id", "CAST(t AS TIMESTAMP) AS ts", "value")
    val out = Resample.dailyForwardFill(events, "user_id", "ts", "value")
      .collect()
      .map(r => (r.getLong(0), r.getDate(1).toString, r.getDouble(2),
        r.getInt(3)))
    assert(out.toSeq == Seq(
      (1L, "2024-03-01", 12.0, 1),
      (1L, "2024-03-02", 12.0, 0),   // filled from day 1's last value
      (1L, "2024-03-03", 12.0, 0),
      (1L, "2024-03-04", 20.0, 1),
      (2L, "2024-03-02", 5.0, 1)))
  }
}
