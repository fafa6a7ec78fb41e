package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.TextMetrics

/** Pins the corpus-hygiene operators: benchmark decontamination
  * (distinct shared n-grams per contaminated doc, none for clean
  * docs) and the within-doc repetition profile (duplicate-token
  * fraction, top-bigram share).
  */
class TextMetricsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("decontaminate counts distinct shared n-grams per doc and " +
      "skips clean docs") {
    val corpus = Seq(
      (1L, "the quick brown fox jumps"),     // shares 3-grams with bench
      (2L, "totally unrelated text here ok"), // clean
      (3L, "the quick brown fox jumps the quick brown fox jumps"))
      .toDF("doc_id", "text")
    val bench = Seq(Tuple1("the quick brown fox ran")).toDF("text")
    val got = TextMetrics.decontaminate(corpus, "doc_id", "text",
        bench, "text", 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // bench 3-grams: {the quick brown, quick brown fox, brown fox ran}
    // doc 1 shares the first two; doc 3 shares the same two (distinct
    // per doc — repeats do not double-count); doc 2 is absent
    assert(got == Map(1L -> 2L, 3L -> 2L))
  }

  test("PII redaction replaces emails, phones, and IPs with category " +
      "tokens and leaves clean text alone") {
    import graft.functions.TextFunctions.{piiCount, piiPatterns, redactPii}
    import org.apache.spark.sql.functions.col
    val rows = Seq(
      ("write to jane.doe+x@sub.example.org today",
        "write to [EMAIL] today"),
      ("call +4915123456789 or 202-555-0123 now",
        "call [PHONE] or [PHONE] now"),
      ("server at 192.168.0.1 responded", "server at [IPV4] responded"),
      ("no pii here at all", "no pii here at all"),
      ("mixed a@b.co 10.0.0.255 +1234567890",
        "mixed [EMAIL] [IPV4] [PHONE]"))
    val df = rows.toDF("text", "expected")
    val got = df.select(redactPii(col("text")).as("red"), col("expected"))
      .collect()
    got.foreach(r => assert(r.getString(0) == r.getString(1)))
    // nothing detectable survives redaction
    val Seq(email, phone, ipv4) = piiPatterns.map(_._2)
    val leftovers = df.select(
      (piiCount(redactPii(col("text")), email) +
        piiCount(redactPii(col("text")), phone) +
        piiCount(redactPii(col("text")), ipv4)).as("n"))
      .collect().map(_.getInt(0)).sum
    assert(leftovers == 0)
  }

  test("repetition stats: duplicate-token fraction and top-bigram share") {
    val docs = Seq(
      (1L, "a a a b"),     // dup types: 'a'x3 of 4 tokens; bigrams:
                           // "a a"x2, "a b"x1 -> top 2/3
      (2L, "x y z"),       // no repeats: dup 0, top bigram 1/2
      (3L, "w"))           // single token: no bigrams -> null share
      .toDF("doc_id", "text")
    val got = TextMetrics.repetitionStats(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(got(1L).getAs[Long]("n_tokens") == 4L)
    assert(math.abs(got(1L).getAs[Double]("dup_token_frac") - 0.75) < 1e-9)
    assert(math.abs(got(1L).getAs[Double]("top_bigram_frac") -
      2.0 / 3) < 1e-6)
    assert(got(2L).getAs[Double]("dup_token_frac") == 0.0)
    assert(math.abs(got(2L).getAs[Double]("top_bigram_frac") - 0.5) < 1e-9)
    assert(got(3L).isNullAt(got(3L).fieldIndex("top_bigram_frac")))
  }
}
