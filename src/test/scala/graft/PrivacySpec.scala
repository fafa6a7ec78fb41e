package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Privacy

class PrivacySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("k-anonymity audit: hand-computed groups, risk, suppression") {
    // QI groups: (a,1)x3, (a,2)x1, (b,1)x2 — with k=3 two groups
    // violate, 3 of 6 rows at risk
    val df = Seq(("a", 1), ("a", 1), ("a", 1), ("a", 2), ("b", 1),
      ("b", 1)).toDF("q1", "q2")
    val r = Privacy.kAnonymity(df, Seq("q1", "q2"), k = 3)
      .collect().head
    assert(r.getLong(0) == 3)            // n_groups
    assert(r.getLong(1) == 2)            // n_violating
    assert(r.getLong(2) == 3)            // rows at risk (1 + 2)
    assert(r.getLong(3) == 1)            // min group
    assert(r.getDouble(4) == 0.5)        // suppression rate
  }

  test("seeded Laplace noise is deterministic, signed both ways, and " +
      "centered") {
    val keys = (1 to 400).map(i => s"key_$i").toDF("k")
    val noise = keys.select(Privacy.seededLaplace(col("k"), 1.0)
      .as("e")).collect().map(_.getDouble(0))
    val again = keys.select(Privacy.seededLaplace(col("k"), 1.0)
      .as("e")).collect().map(_.getDouble(0))
    assert(noise.sameElements(again), "noise must be replayable")
    assert(noise.count(_ > 0) > 100 && noise.count(_ < 0) > 100,
      "both signs expected")
    val mean = noise.sum / noise.length
    assert(math.abs(mean) < 0.2, f"mean $mean%.3f far from 0")
    // Laplace(1): mean |x| = 1
    val meanAbs = noise.map(math.abs).sum / noise.length
    assert(meanAbs > 0.6 && meanAbs < 1.5,
      f"mean |noise| $meanAbs%.3f far from the Laplace(1) scale")
  }

  test("dp counts perturb but stay near the truth at eps=1") {
    val df = (1 to 300).map(i => (s"g${i % 3}", i)).toDF("g", "x")
    val out = Privacy.dpCounts(df, "g", eps = 1.0).collect()
      .map(r => (r.getString(0), r.getDouble(1))).toMap
    assert(out.size == 3)
    out.values.foreach(n =>
      assert(math.abs(n - 100.0) < 10, s"noisy count $n too far"))
  }
}
