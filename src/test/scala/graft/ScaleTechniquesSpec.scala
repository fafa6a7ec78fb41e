package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Skew

/** Demonstrates and gates the scale techniques the engine relies on:
  * salted joins for hot keys and bucketed tables for co-located
  * (shuffle-free) joins.
  */
class ScaleTechniquesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("salted join equals plain join on skewed data") {
    // 90% of left rows share one hot key
    val left = (1 to 10000)
      .map(i => (if (i % 10 == 0) i % 7 else 1L, i))
      .toDF("k", "v")
    val right = (0L to 10L).map(k => (k, s"dim$k")).toDF("k", "name")
    val plain = left.join(right, "k").agg(count(lit(1)), sum("v")).head()
    val salted = Skew.saltedJoin(left, right, "k", saltFactor = 8)
      .agg(count(lit(1)), sum("v")).head()
    assert(plain == salted)
  }

  test("bucketed tables join without a shuffle exchange") {
    // warehouse.dir is a static conf — use the default spark-warehouse
    // (gitignored); a fresh session isolates the dynamic join configs
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    import s2.implicits._
    val a = (1 to 1000).map(i => (i.toLong, i * 2)).toDF("k", "va")
    val b = (1 to 1000).map(i => (i.toLong, i * 3)).toDF("k", "vb")
    a.write.mode("overwrite").bucketBy(8, "k").sortBy("k")
      .saveAsTable("bucketed_a")
    b.write.mode("overwrite").bucketBy(8, "k").sortBy("k")
      .saveAsTable("bucketed_b")
    val joined = s2.table("bucketed_a").join(s2.table("bucketed_b"), "k")
    val plan = joined.queryExecution.executedPlan.toString
    // co-located bucketed join: sort-merge with NO shuffle exchange
    assert(!plan.contains("Exchange hashpartitioning"),
      s"unexpected shuffle in bucketed join plan:\n$plan")
    assert(joined.count() == 1000)
    s2.sql("DROP TABLE IF EXISTS bucketed_a")
    s2.sql("DROP TABLE IF EXISTS bucketed_b")
  }
}
