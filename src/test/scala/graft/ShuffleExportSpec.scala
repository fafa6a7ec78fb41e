package graft

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.functions._

import graft.operators.ShuffleExport

class ShuffleExportSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val ids = (0L until 1000L).toDF("id")

  test("epoch shuffle is a permutation: every id exactly once, " +
      "positions contiguous from 1 per shard") {
    val out = ShuffleExport.epochShuffle(ids, "id", seed = 7L,
      nShards = 4).cache()
    assert(out.count() == 1000L)
    assert(out.select("id").distinct().count() == 1000L)
    val perShard = out.groupBy("shard")
      .agg(count(lit(1)).as("n"), min("pos").as("lo"), max("pos").as("hi"))
      .collect()
    assert(perShard.length == 4)
    perShard.foreach { r =>
      assert(r.getLong(2) == 1L, s"positions must start at 1: $r")
      assert(r.getLong(3) == r.getLong(1), s"positions must be dense: $r")
    }
    out.unpersist()
  }

  test("same seed reproduces the byte-identical order; a different " +
      "seed produces a different one") {
    def run(seed: Long) = ShuffleExport.epochShuffle(ids, "id", seed, 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sortBy(t => (t._1, t._2)).toSeq
    val a = run(7L)
    assert(a == run(7L), "identical seed must replay identically")
    assert(a != run(8L), "different seed must reorder")
  }

  test("shard sizes balance and the within-shard order decorrelates " +
      "from id order") {
    val out = ShuffleExport.epochShuffle(ids, "id", seed = 7L,
      nShards = 8)
    val sizes = out.groupBy("shard").count()
      .collect().map(_.getLong(1))
    assert(sizes.length == 8)
    assert(sizes.min > 100 && sizes.max < 150,
      s"uniform chain should balance 1000/8: ${sizes.mkString(",")}")
    // within a shard, ids adjacent in position should not be adjacent
    // in id (a sorted export would have ~all deltas tiny)
    val monotone = out.where(col("shard") === 0)
      .orderBy("pos").collect().map(_.getLong(2))
      .sliding(2).count(p => (p(1) - p(0)).abs <= 2)
    assert(monotone < 20, s"order must look shuffled: $monotone")
  }
}
