package graft

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.functions._

import graft.operators.Classify

class ClassifySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("naive Bayes fixture arithmetic matches the hand computation") {
    // train: pos {good good fun, fun}, neg {bad sad}
    //   V=4, N_pos=4, N_neg=2
    //   llr(good)=llr(fun)=ln(3/8)-ln(1/6)=ln(2.25)  -> 0.810930216
    //   llr(bad)=llr(sad)=ln(1/8)-ln(2/6)            -> -0.980829253
    //   prior=ln(2/1)                                 -> 0.693147181
    //   unseen=ln(1/8)-ln(1/6)=ln(0.75)              -> -0.287682072
    val labeled = Seq(("good good fun", true), ("fun", true),
      ("bad sad", false)).toDF("text", "lab")
    // score "good bad unknown":
    //   0.693147181 + 0.810930216 - 0.980829253 - 0.287682072
    //   = 0.235566072 -> 0.235566
    val docs = Seq((1L, "good bad unknown")).toDF("id", "text")
    val got = Classify.naiveBayesScore(docs, "id", "text",
      labeled, "lab").collect()
    assert(got.length == 1)
    assert(got.head.getLong(0) == 1L)
    assert(got.head.getLong(1) == 3L)
    assert(got.head.getDouble(2) == 0.235566,
      s"hand-computed fixture diverged: ${got.head.getDouble(2)}")
  }

  test("classifier separates held-out documents when the classes " +
      "genuinely differ (seeded two-dialect corpus)") {
    // two dialects over a shared core vocabulary: dialect A salts in
    // {crisp, clean}, dialect B {noisy, spam} — deterministic word
    // choice via a hash of (doc, position), no RNG
    val core = Seq("data", "table", "row", "scan", "merge", "group")
    val mkText = (id: Long, posClass: Boolean) => {
      val extra = if (posClass) Seq("crisp", "clean")
        else Seq("noisy", "spam")
      (0 until 20).map { i =>
        val h = math.abs((id * 31 + i * 17).toInt)
        if (h % 3 == 0) extra(h % extra.length)
        else core(h % core.length)
      }.mkString(" ")
    }
    val docs = (0L until 200L).map(i =>
      (i, i % 2 == 0, mkText(i, i % 2 == 0)))
      .toSeq.toDF("id", "pos", "text")
    val scored = Classify.naiveBayesScore(docs, "id", "text",
        docs.where(col("id") < 100), "pos")
      .join(docs.select(col("id"), col("pos")), "id")
    // held-out half only (ids >= 100): every positive doc must
    // outscore every negative doc given a real signal
    val held = scored.where(col("id") >= 100)
      .agg(min(when(col("pos"), col("nb_llr"))).as("min_pos"),
        max(when(!col("pos"), col("nb_llr"))).as("max_neg"))
      .collect().head
    assert(held.getDouble(0) > held.getDouble(1),
      s"held-out dialects must separate: min_pos=${held.getDouble(0)} " +
        s"max_neg=${held.getDouble(1)}")
  }

  test("every scored doc carries its full token count; empty-vocab " +
      "overlap still scores via the unseen floor") {
    val labeled = Seq(("alpha beta", true), ("gamma", false))
      .toDF("text", "lab")
    val docs = Seq((1L, "zeta zeta eta")).toDF("id", "text")
    val r = Classify.naiveBayesScore(docs, "id", "text",
      labeled, "lab").collect().head
    // V=3, N_pos=2, N_neg=1: unseen=ln(1/5)-ln(1/4) -> -0.223143551
    // prior=ln(1/1)=0; score=3*unseen -> -0.669430653 -> -0.669431
    assert(r.getLong(1) == 3L)
    assert(r.getDouble(2) == -0.669431)
  }

  test("a one-class or empty labeled seed set fails fast instead of " +
      "scoring everything Infinity/null") {
    val docs = Seq((1L, "zeta eta")).toDF("id", "text")
    val onlyPos = Seq(("alpha beta", true)).toDF("text", "lab")
    val e = intercept[IllegalArgumentException] {
      Classify.naiveBayesScore(docs, "id", "text", onlyPos, "lab")
    }
    assert(e.getMessage.contains("both classes"))
    val empty = Seq.empty[(String, Boolean)].toDF("text", "lab")
    intercept[IllegalArgumentException] {
      Classify.naiveBayesScore(docs, "id", "text", empty, "lab")
    }
  }
}
