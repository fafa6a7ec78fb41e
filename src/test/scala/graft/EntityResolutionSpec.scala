package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.EntityResolution

class EntityResolutionSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("blocked linkage: edit bound, numeric tolerance, and blocking " +
      "all gate matches") {
    val a = Seq(
      (1L, 10, "alice smith", 100.0),
      (2L, 10, "bob jones", 50.0),
      (3L, 20, "carol khan", 75.0)
    ).toDF("id_a", "blk", "s_a", "v_a")
    val b = Seq(
      (11L, 10, "alice smyth", 100.002), // 1 edit, close value → match
      (12L, 10, "robert jones", 50.0),   // 4 edits → no match
      (13L, 10, "bob jones", 58.0),      // 0 edits, value off → no match
      (14L, 30, "carol khan", 75.0)      // exact but different block
    ).toDF("id_b", "blk", "s_b", "v_b")
    val out = EntityResolution.scoredCandidates(a, b,
      maxEdit = 2, numTol = 0.01)
    val matched = out.where($"matched" === 1)
      .select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(matched == Set((1L, 11L)))
    // candidates never cross blocks: carol (blk 20) vs blk 30 absent
    val cand = out.select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(!cand.exists(_._1 == 3L))
  }
}
