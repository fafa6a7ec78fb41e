package graft

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

import graft.operators.TextMetrics

/** Pins the corpus-hygiene operators: benchmark decontamination
  * (distinct shared n-grams per contaminated doc, none for clean
  * docs) and the within-doc repetition profile (duplicate-token
  * fraction, top-bigram share).
  */
class TextMetricsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("chunkDocs: sliding windows overlap, cover the tail, and " +
      "handle short docs") {
    // 10 tokens, chunk 4, overlap 2 → starts 0,2,4,6: the last window
    // already reaches the end, so no redundant tail chunk is emitted
    val docs = Seq(
      (1L, "a b c d e f g h i j"),
      (2L, "x y")                      // shorter than one chunk
    ).toDF("doc_id", "text")
    val out = operators.TextMetrics.chunkDocs(docs, "doc_id", "text",
        chunkTokens = 4, overlap = 2).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getString(3)))
    val d1 = out.filter(_._1 == 1L)
    assert(d1.map(_._4).toSeq == Seq("a b c d", "c d e f", "e f g h",
      "g h i j"))
    // every adjacent pair shares the 2-token overlap
    d1.sliding(2).collect { case Array(p, n) => (p, n) }.foreach {
      case (p, n) =>
        assert(p._4.split(" ").takeRight(2).sameElements(
          n._4.split(" ").take(2)))
    }
    assert(out.filter(_._1 == 2L).map(_._4).toSeq == Seq("x y"))
    // reconstruction: de-overlapped concat yields the original tokens
    val rebuilt = d1.head._4.split(" ") ++
      d1.tail.flatMap(_._4.split(" ").drop(2))
    assert(rebuilt.mkString(" ") == "a b c d e f g h i j")
  }

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

  test("tfidfKeywords ranks by tf desc then df asc then term, and " +
      "scores tf * ln(N/df)") {
    val docs = Seq(
      (1L, "apple apple apple banana cherry"),
      (2L, "banana banana cherry cherry date"),
      (3L, "apple banana cherry date date date"),
      (4L, "fig fig fig fig grape"))
      .toDF("doc_id", "text")
    val got = TextMetrics.tfidfKeywords(docs, "doc_id", "text", k = 2)
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getDouble(4)))
      .groupBy(_._1)
    // doc 1: apple tf=3 wins; banana/cherry tie tf=1 -> df breaks it
    //        (banana df=3 == cherry df=3 -> term asc: banana)
    val d1 = got(1L).sortBy(-_._3).map(t => (t._2, t._3)).toSeq
    assert(d1 == Seq(("apple", 3L), ("banana", 1L)))
    // doc 4: fig tf=4 (df=1 -> idf=ln(4) largest possible), grape tf=1
    val d4 = got(4L).map(t => (t._2, t._3, t._4, t._5)).sortBy(-_._2)
    assert(d4.map(t => (t._1, t._2, t._3)).toSeq ==
      Seq(("fig", 4L, 1L), ("grape", 1L, 1L)))
    assert(math.abs(d4.head._4 - 4.0 * math.log(4.0)) < 1e-6)
    // every doc contributes exactly k rows when it has >= k terms
    assert(got.values.forall(_.length == 2))
  }

  test("chunkDedup keeps the globally-first occurrence of each chunk " +
      "and reassembles survivors in order") {
    import graft.operators.Dedup
    // chunkSize=2 -> doc 1 chunks: "a b","c d","e"; doc 2: "c d","a b"
    // (both seen in doc 1 -> doc 2 fully removed); doc 3: "a b","x y"
    // (first chunk removed, second kept)
    val docs = Seq(
      (1L, "a b c d e"),
      (2L, "c d a b"),
      (3L, "a b x y"))
      .toDF("doc_id", "text")
    val got = Dedup.chunkDedup(docs, "doc_id", "text", chunkSize = 2)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
        r.getString(3)))).toMap
    assert(got(1L) == ((3L, 3L, "a b c d e")))
    assert(got(2L) == ((2L, 0L, "")))
    assert(got(3L) == ((2L, 1L, "x y")))
    // first occurrence is ordered by (id, position): a duplicate
    // WITHIN one doc keeps only its earliest position
    val rep = Seq((7L, "p q p q")).toDF("doc_id", "text")
    val r7 = Dedup.chunkDedup(rep, "doc_id", "text", chunkSize = 2)
      .collect().head
    assert(r7.getLong(2) == 1L && r7.getString(3) == "p q")
  }

  test("vocabCoverage reports per-source OOV volume against the " +
      "deterministic top-K vocabulary") {
    val docs = Seq(
      ("web", "the the the cat"),
      ("web", "the dog"),
      ("book", "the cat zebra"))
      .toDF("source", "text")
    // counts: the=5, cat=2, dog=1, zebra=1 → vocab(2) = {the, cat}
    // (dog/zebra tie at 1 is cut; cat beats them at 2)
    val got = TextMetrics.vocabCoverage(docs, "text", "source", 2)
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getDouble(5)))).toMap
    // book: 3 tokens {the, cat, zebra}; zebra OOV → 1/3
    assert(got("book") == ((3L, 3L, 1L, 1L, 0.333333)))
    // web: 6 tokens, 3 types {the, cat, dog}; dog OOV → 1/6
    assert(got("web") == ((6L, 3L, 1L, 1L, 0.166667)))
    // ties at the vocab boundary break by token text: with vocab
    // size 3, "dog" (alphabetically first of the tied pair) enters
    val got3 = TextMetrics.vocabCoverage(docs, "text", "source", 3)
      .collect().map(r => r.getString(0) -> r.getLong(3)).toMap
    assert(got3("web") == 0L && got3("book") == 1L)
  }

  test("unigramLogprob scores rare-token docs more negative and " +
      "computes the exact unigram mean") {
    val docs = Seq(
      (1L, "a a a a"),
      (2L, "a a a b"))
      .toDF("doc_id", "text")
    // corpus: a=7, b=1, total=8 → ln(7/8) = -0.133531..., ln(1/8) =
    // -2.079442 (each rounded at 9 decimals before the exact mean)
    val got = TextMetrics.unigramLogprob(docs, "doc_id", "text")
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    val lnA = BigDecimal(math.log(7.0 / 8.0))
      .setScale(9, BigDecimal.RoundingMode.HALF_UP)
    val lnB = BigDecimal(math.log(1.0 / 8.0))
      .setScale(9, BigDecimal.RoundingMode.HALF_UP)
    def m6(x: BigDecimal) =
      x.setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got(1L) == ((4L, m6(lnA))))
    assert(got(2L) == ((4L, m6((lnA * 3 + lnB) / 4))))
    assert(got(2L)._2 < got(1L)._2) // rare token drags the score down
  }

  test("bigramLogprob interpolates bigram and unigram probabilities " +
      "exactly; short docs are absent") {
    val docs = Seq(
      (1L, "a b a"),
      (2L, "a b"),
      (3L, "x")) // < 2 tokens → no bigrams → absent
      .toDF("doc_id", "text")
    // corpus unigrams: a=3, b=2, x=1, N=6; bigrams: (a,b)=2, (b,a)=1
    // p(a,b) = .75*(2/3) + .25*(2/6); p(b,a) = .75*(1/2) + .25*(3/6)
    val got = TextMetrics.bigramLogprob(docs, "doc_id", "text")
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    def r9(x: Double) = BigDecimal(x)
      .setScale(9, BigDecimal.RoundingMode.HALF_UP)
    def m6(x: BigDecimal) =
      x.setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val lnAB = r9(math.log(0.75 * (2.0 / 3.0) + 0.25 * (2.0 / 6.0)))
    val lnBA = r9(math.log(0.75 * (1.0 / 2.0) + 0.25 * (3.0 / 6.0)))
    assert(got.keySet == Set(1L, 2L))
    assert(got(1L) == ((2L, m6((lnAB + lnBA) / 2))))
    assert(got(2L) == ((1L, m6(lnAB))))
    // the frequent-order doc outscores a reversed-order one built
    // from the same vocabulary (what the bigram layer adds over
    // unigram, which scores both identically)
    val docs2 = Seq(
      (1L, "the cat sat"), (2L, "the cat sat"), (3L, "the cat sat"),
      (4L, "sat cat the"))
      .toDF("doc_id", "text")
    val s2 = TextMetrics.bigramLogprob(docs2, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(s2(1L) > s2(4L),
      s"frequent order ${s2(1L)} must beat reversed ${s2(4L)}")
  }

  test("zipfFit recovers the exponent of a synthetic power-law corpus") {
    // token w_r appears round(1000 / r^1) times: slope must fit ~ -1
    val text = (1 to 20).flatMap(r =>
      Seq.fill(math.max(1, math.round(1000.0 / r).toInt))(s"w$r"))
      .mkString(" ")
    val got = TextMetrics.zipfFit(Seq(Tuple1(text)).toDF("text"),
      "text", topN = 20).head()
    assert(got.getLong(0) == 20L)
    val slope = got.getDouble(1)
    assert(slope < -0.95 && slope > -1.05, s"slope $slope not ~ -1")
  }

  test("mixWeights: alpha=1 is proportional, alpha=0 is uniform, " +
      "alpha<1 upsamples the small source; weights sum to 1") {
    val docs = Seq(("big", "a b c d e f g h"), ("small", "a b"))
      .toDF("source", "text")
    def weights(alpha: Double) =
      TextMetrics.mixWeights(docs, "text", "source", alpha)
        .collect().map(r => r.getString(0) -> r.getDouble(4)).toMap
    val w1 = weights(1.0)
    assert(w1 == Map("big" -> 0.8, "small" -> 0.2))
    val w0 = weights(0.0)
    assert(w0 == Map("big" -> 0.5, "small" -> 0.5))
    val w = weights(0.5)
    assert(w("small") > 0.2 && w("small") < 0.5)
    assert(math.abs(w.values.sum - 1.0) < 1e-9)
  }

  test("valueEntropy: constant column scores 0, uniform column " +
      "scores ln(n)") {
    import graft.operators.Profile
    val df = (1 to 8).map(i => ("const", i % 4)).toDF("c1", "c2")
    val got = Profile.valueEntropy(df, Seq("c1", "c2"))
      .collect().map(r => r.getString(0) ->
        ((r.getDouble(1), r.getLong(2)))).toMap
    assert(got("c1") == ((0.0, 1L)))
    assert(math.abs(got("c2")._1 - math.log(4.0)) < 1e-5)
    assert(got("c2")._2 == 4L)
  }

  test("bpeEncodePieces: greedy longest match, single-char fallback, " +
      "word boundaries, empty-word skipping") {
    import graft.functions.BpeExpressions.bpeEncodePieces
    val pieces = Seq("the", "sort", "cus", "tom", "er", "win", "dow",
      "slo", "ag", "tch", "ba", "st", "eam")
    def enc(s: String): Seq[String] =
      Seq(Tuple1(s)).toDF("text")
        .select(bpeEncodePieces(lower(col("text")), pieces).as("p"))
        .head().getSeq[String](0)
    // multi-piece segmentation and fallback chars
    assert(enc("customer") == Seq("cus", "tom", "er"))
    assert(enc("slow agg") == Seq("slo", "w", "ag", "g"))
    // longest match wins over a shorter prefix piece ("sort" > "st"
    // would never collide, but "sort" must beat nothing-at-'s' +
    // fallback; "st" must apply where "sort" cannot)
    assert(enc("sort") == Seq("sort"))
    assert(enc("stream") == Seq("st", "r", "eam"))
    // pieces never match across a word boundary
    assert(enc("ba tch") == Seq("ba", "tch"))
    assert(enc("batch") == Seq("ba", "tch"))
    // empty words from repeated/leading/trailing spaces are skipped
    assert(enc("  the   sort ") == Seq("the", "sort"))
    // uppercase input is folded by the lower() the caller applies
    assert(enc("THE Sort") == Seq("the", "sort"))
  }

  test("ngramNovelty: unique doc scores 1, verbatim duplicate scores " +
      "0, short docs are absent") {
    val docs = Seq(
      (1L, "one two three four"),         // trigrams unique → 1.0
      (2L, "aa bb cc dd"), (3L, "aa bb cc dd"), // shared → 0.0
      (4L, "too short")).toDF("doc_id", "text") // < 3 tokens → absent
    val got = TextMetrics.ngramNovelty(docs, "doc_id", "text", 3)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(got == Map(1L -> ((2L, 2L, 1.0)),
      2L -> ((2L, 0L, 0.0)), 3L -> ((2L, 0L, 0.0))))
  }

  test("trainBpeMerges learns the hand-computed merge sequence and " +
      "its pieces drive the encoder") {
    // the classic BPE teaching corpus: low x5, lower x2, newest x6,
    // widest x3. Weighted pair counts put (e,s)=9 and (s,t)=9 first —
    // lexicographic tie-break picks (e,s) — then (es,t)=9; after
    // that merge "newest" is n,e,w,est so (w,e) has fallen to 2 and
    // the 7-7 tie between (l,o) and (o,w) resolves to (l,o)
    val docs = Seq(
      ((1 to 5).map(_ => "low") ++ (1 to 2).map(_ => "lower") ++
        (1 to 6).map(_ => "newest") ++ (1 to 3).map(_ => "widest"))
        .mkString(" ")).map(Tuple1(_)).toDF("text")
    val merges = TextMetrics.trainBpeMerges(docs, "text", 3)
    assert(merges == Seq(("e", "s"), ("es", "t"), ("l", "o")))
    // deeper training folds whole words: "low" must become one piece
    val more = TextMetrics.trainBpeMerges(docs, "text", 10)
    val pieces = more.map { case (a, b) => a + b }
    assert(pieces.contains("low"))
    // trained pieces feed the longest-match encoder: "lowest" (an
    // UNSEEN word) segments into learned subwords, not characters
    import graft.functions.BpeExpressions.bpeEncodePieces
    val enc = Seq(Tuple1("lowest")).toDF("text")
      .select(bpeEncodePieces(lower(col("text")),
        pieces.filter(_.length >= 2)).as("p"))
      .head().getSeq[String](0)
    assert(enc.contains("low") && enc.contains("est"), enc.toString)
    // determinism: same corpus, same merges
    assert(TextMetrics.trainBpeMerges(docs, "text", 10) == more)
  }

  test("bpeEncodePieces feeds the token-id pipeline: broadcast vocab " +
      "join assigns ids, vocabCoverage/unigramLogprob run on pieces") {
    import graft.functions.BpeExpressions.bpeEncodePieces
    val pieces = Seq("the", "cus", "tom", "er")
    val docs = Seq((1L, "a", "the customer"), (2L, "b", "the the"))
      .toDF("doc_id", "source", "text")
    val tok: Column => Column = c => bpeEncodePieces(lower(c), pieces)
    // vocabCoverage over BPE pieces: 2+4 pieces in doc 1 ("the" +
    // cus/tom/er), 2 in doc 2; vocab of size 4 covers every piece
    val cov = TextMetrics.vocabCoverage(docs, "text", "source", 4, tok)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(3)))).toMap
    assert(cov == Map("a" -> ((4L, 0L)), "b" -> ((2L, 0L))))
    // unigramLogprob over pieces: doc 2 is two copies of the most
    // frequent piece, so it must score strictly higher than doc 1
    val lp = TextMetrics.unigramLogprob(docs, "doc_id", "text", tok)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(lp(2L) > lp(1L))
    // token-id assignment via the broadcast vocab join (the
    // bpe_encode contract query's shape): every piece resolves
    val vocab = pieces.zipWithIndex.map { case (p, i) => (i, p) }
      .toDF("token_id", "piece")
    val ids = docs
      .select(explode(tok(col("text"))).as("piece"))
      .join(broadcast(vocab), Seq("piece"), "left")
    assert(ids.where(col("token_id").isNull).count() == 0)
  }

  test("bm25Search matches an independent scalar computation of the " +
      "Okapi formula, term filter included") {
    // corpus: d1 "cat cat dog" (dl 3), d2 "dog bird" (dl 2),
    // d3 "fish" (dl 1) -> N=3, avgdl=2; terms {cat, dog}
    val docs = Seq((1L, "cat cat dog"), (2L, "dog bird"),
      (3L, "fish")).toDF("id", "text")
    val got = TextMetrics.bm25Search(docs, "id", "text",
        terms = Seq("cat", "dog"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .sortBy(_._1)
    // scalar replica with the operator's exact expression order
    def r9(x: Double) = BigDecimal(x)
      .setScale(9, BigDecimal.RoundingMode.HALF_UP)
    val avgdl = 6.0 / 3L
    def idf(df: Long) =
      r9(math.log(((3L - df).toDouble + 0.5) / (df.toDouble + 0.5) + 1.0))
    def w(i: BigDecimal, tf: Long, dl: Long) =
      r9(i.toDouble * (tf.toDouble * 2.2) /
        (tf.toDouble + 1.2 * (0.25 + 0.75 * dl.toDouble / avgdl)))
    def r6(x: BigDecimal) =
      x.setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val d1 = r6(w(idf(1L), 2L, 3L) + w(idf(2L), 1L, 3L))
    val d2 = r6(w(idf(2L), 1L, 2L))
    assert(got.toSeq == Seq((1L, 2L, d1), (2L, 1L, d2)),
      s"scalar replica diverged: ${got.toSeq} vs ($d1, $d2)")
    // d3 matches no term and must be absent; d1 (two terms, one
    // repeated) must outrank d2
    assert(!got.exists(_._1 == 3L))
    assert(d1 > d2)
  }

  test("dsirWeights ranks target-like raw docs above target-unlike " +
      "ones; target rows and short docs are absent; NULL pred = raw") {
    val spark2 = TestSpark.spark
    import spark2.implicits._
    val df = Seq(
      // target distribution: bigrams of "good clean data"
      (0L, "good clean data good clean data", "tgt"),
      (1L, "good clean data here", "tgt"),
      // raw pool: 10 shares the target's bigrams, 11 shares none
      (10L, "good clean data again", "raw"),
      (11L, "junk noise junk noise spam", "raw"),
      // one token -> no bigrams -> absent
      (12L, "solo", "raw"),
      (13L, "good clean words", null)).toDF("doc_id", "text", "pool")
    val got = TextMetrics.dsirWeights(df, "doc_id", "text",
        col("pool") === "tgt")
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    // target docs are the reference distribution, not candidates;
    // the NULL-pool row routes to raw (coalesce-to-false), both
    // score; the 1-token row has no features
    assert(got.keySet == Set(10L, 11L, 13L))
    assert(got(10L) > got(11L),
      s"target-like ${got(10L)} must beat target-unlike ${got(11L)}")
    assert(got(13L) > got(11L)) // shares 'good clean' with the target
  }

  test("hashEmbedding: unit vectors, identical texts collide " +
      "exactly, shared-token texts beat disjoint ones on cosine") {
    val docs = Seq(
      (0L, "alpha beta gamma delta"),
      (1L, "alpha beta gamma delta"),        // exact duplicate of 0
      (2L, "alpha beta gamma epsilon"),      // 3/4 token overlap
      (3L, "zeta eta theta iota"),           // disjoint
      (4L, "solo"),                          // single token
      (5L, "")).toDF("doc_id", "text")       // one EMPTY token
    val vecs = TextMetrics.hashEmbedding(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toArray)
      .toMap
    // split semantics: empty text is one empty token, embedding to a
    // fixed one-hot (same convention as every n-gram oracle)
    assert(vecs(5L).count(_ != 0.0) == 1)
    assert(cosArr(vecs(5L), vecs(4L)) == 0.0)
    // every emitted vector is unit-norm
    vecs.values.foreach { v =>
      assert(math.abs(math.sqrt(v.map(x => x * x).sum) - 1.0) < 1e-12)
    }
    assert(vecs(0L).toSeq == vecs(1L).toSeq)
    // single token: exactly one +-1 entry
    assert(vecs(4L).count(_ != 0.0) == 1)
    assert(math.abs(vecs(4L).map(math.abs).max - 1.0) < 1e-12)
    assert(cosArr(vecs(0L), vecs(2L)) > cosArr(vecs(0L), vecs(3L)) + 0.3,
      s"overlap=${cosArr(vecs(0L), vecs(2L))} " +
        s"disjoint=${cosArr(vecs(0L), vecs(3L))}")
  }

  private def cosArr(a: Array[Double], b: Array[Double]): Double =
    a.zip(b).map { case (x, y) => x * y }.sum
}
