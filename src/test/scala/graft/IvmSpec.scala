package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Ivm

class IvmSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def fin(df: org.apache.spark.sql.DataFrame) =
    df.select("g", "n", "sum_v", "min_v", "max_v", "avg_v")
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4), r.getDouble(5))).toSet

  // 60 rows, 3 keys, values with two decimal places
  private lazy val rows = (1 to 60).map(i =>
    (s"k${i % 3}", i * 1.25, i.toLong))
  private lazy val full = rows.toDF("g", "v", "d")

  test("merged batch states equal the full recompute exactly") {
    val keys = Seq("g")
    val parts = Seq(
      rows.filter(_._3 % 3 == 0), rows.filter(_._3 % 3 == 1),
      rows.filter(_._3 % 3 == 2)).map(_.toDF("g", "v", "d"))
    val merged = Ivm.finalizeState(
      Ivm.merge(parts.map(p => Ivm.aggState(p, keys, "v", "d")), keys),
      keys)
    val direct = Ivm.finalizeState(
      Ivm.aggState(full, keys, "v", "d"), keys)
    assert(fin(merged) == fin(direct))
  }

  test("merge is associative: (a+b)+c == a+(b+c)") {
    val keys = Seq("g")
    val Seq(a, b, c) = Seq(0, 1, 2).map(m =>
      Ivm.aggState(rows.filter(_._3 % 3 == m).toDF("g", "v", "d"),
        keys, "v", "d"))
    val left = Ivm.merge(Seq(Ivm.merge(Seq(a, b), keys), c), keys)
    val right = Ivm.merge(Seq(a, Ivm.merge(Seq(b, c), keys)), keys)
    assert(fin(Ivm.finalizeState(left, keys)) ==
      fin(Ivm.finalizeState(right, keys)))
  }

  test("keys present in only one batch survive the merge") {
    val keys = Seq("g")
    val a = Ivm.aggState(Seq(("only_a", 2.0, 1L), ("both", 1.0, 2L))
      .toDF("g", "v", "d"), keys, "v", "d")
    val b = Ivm.aggState(Seq(("only_b", 7.5, 3L), ("both", 3.0, 4L))
      .toDF("g", "v", "d"), keys, "v", "d")
    val out = fin(Ivm.finalizeState(Ivm.merge(Seq(a, b), keys), keys))
    assert(out == Set(
      ("only_a", 1L, 2.0, 2.0, 2.0, 2.0),
      ("only_b", 1L, 7.5, 7.5, 7.5, 7.5),
      ("both", 2L, 4.0, 1.0, 3.0, 2.0)))
  }

  test("fuzz: any random partitioning into 2..5 batches merges to " +
      "the direct aggregation") {
    val rnd = new scala.util.Random(777L)
    val keys = Seq("g")
    val direct = fin(Ivm.finalizeState(
      Ivm.aggState(full, keys, "v", "d"), keys))
    for (round <- 1 to 8) {
      val nParts = 2 + rnd.nextInt(4)
      val tagged = rows.map(r => (rnd.nextInt(nParts), r))
      val parts = (0 until nParts).map(p =>
        tagged.filter(_._1 == p).map(_._2))
        .filter(_.nonEmpty)
        .map(_.toDF("g", "v", "d"))
      val merged = fin(Ivm.finalizeState(
        Ivm.merge(parts.map(p => Ivm.aggState(p, keys, "v", "d")),
          keys), keys))
      assert(merged == direct, s"round $round with ${parts.size} parts")
    }
  }

  test("hll distinct estimate survives merging within its error bound") {
    val keys = Seq("g")
    val big = spark.range(0, 5000)
      .selectExpr("'x' AS g", "CAST(id AS DOUBLE) AS v", "id % 2000 AS d")
    val parts = Seq("id % 3 = 0", "id % 3 = 1", "id % 3 = 2")
      .map(p => Ivm.aggState(
        big.where(p.replace("id", "CAST(v AS BIGINT)")), keys, "v", "d"))
    val est = Ivm.finalizeState(Ivm.merge(parts, keys), keys)
      .select("n_distinct_est").collect().head.getLong(0)
    assert(math.abs(est - 2000L) <= 100,
      s"merged HLL estimate $est too far from 2000")
  }
}
