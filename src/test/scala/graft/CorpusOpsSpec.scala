package graft

import org.apache.spark.sql.functions._

import graft.functions.text
import graft.operators.{Corpus, Dedup, Temporal, Transformators}

/** Round-4 corpus-analysis operators: sessionization, repetition
  * signals, vocabulary top-k, length stats, PII redaction, chunk dedup.
  * Semantics pinned on literal rows; the sf0.01 parquet behavior is
  * covered by the DuckDB oracle harness (q_sessionize & co).
  */
class CorpusOpsSpec extends SparkTestBase {
  import spark.implicits._

  // ---- sessionize ------------------------------------------------------

  test("sessionize splits on gaps and rolls up per session") {
    // user 1: events at 0,10,20 then 1000 (gap>100) then 1010
    // user 2: a single event
    val ev = Seq((1L, 0L, 1L), (1L, 10L, 2L), (1L, 20L, 3L),
      (1L, 1000L, 4L), (1L, 1010L, 5L), (2L, 5L, 6L))
      .toDF("user_id", "ts", "event_id")
    val out = Temporal.sessionize(ev, "user_id", "ts", gap = 100L,
      tieCol = "event_id")
      .orderBy("user_id", "session_idx")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    assert(out === Seq(
      (1L, 0L, 3L, 0L, 20L),
      (1L, 1L, 2L, 1000L, 1010L),
      (2L, 0L, 1L, 5L, 5L)))
  }

  test("sessionize: boundary gap == gap stays in one session") {
    val ev = Seq((1L, 0L, 1L), (1L, 100L, 2L)).toDF("user_id", "ts", "event_id")
    val out = Temporal.sessionize(ev, "user_id", "ts", gap = 100L,
      tieCol = "event_id").collect()
    assert(out.length === 1 && out.head.getLong(2) === 2L)
  }

  test("sessionize plans ONE exchange (groupBy reuses the window's key partitioning)") {
    val ev = SparkEntry.queries("q_sessionize")(spark, sf("sf0.001"))
    val plan = ev.queryExecution.executedPlan.toString
    val n = plan.linesIterator.count(_.contains("Exchange hashpartitioning"))
    assert(n === 1, s"expected 1 hash exchange, got $n:\n$plan")
  }

  test("sourceReport plan: partial aggregation; exactly the 2 exchanges the doc states") {
    val plan = SparkEntry.queries("q_source_report")(spark, sf("sf0.001"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("partial_count") || plan.contains("partial_sum"),
      s"no map-side combine:\n$plan")
    // exact count-distinct = two-round distinct aggregate: exchange on
    // (source, fingerprint) then on (source) — the documented cost
    val n = plan.linesIterator.count(_.contains("Exchange hashpartitioning"))
    assert(n === 2, s"expected the 2 distinct-agg exchanges, got $n:\n$plan")
    assert(!plan.contains("ScalaUDF"), plan)
  }

  test("mixByTokenBudget plan: sampling filter is a scan-level projection, no shuffle") {
    val plan = SparkEntry.queries("q_mix_token_budget")(spark, sf("sf0.001"))
      .queryExecution.executedPlan.toString
    val n = plan.linesIterator.count(_.contains("Exchange hashpartitioning"))
    assert(n === 0, s"the mix union must not shuffle:\n$plan")
  }

  // ---- repetition stats ------------------------------------------------

  test("repetitionStats: counts and ratios on crafted docs") {
    val docs = Seq(
      (1L, "a a a a"),          // 4 tok, 1 distinct, bigram "a a" x3
      (2L, "w x y z"),          // all distinct, 3 distinct bigrams
      (3L, "solo"),             // 1 token, no bigrams
      (4L, ""),                 // empty
      (5L, "go go stop go go")  // "go go" 2 of 4 bigrams
    ).toDF("doc_id", "text")
    val out = docs.select(col("doc_id"),
        text.repetitionStats(col("text")).as("st"),
        text.dupWordRatio(col("text")).as("dwr"),
        text.topBigramRatio(col("text")).as("tbr"))
      .orderBy("doc_id")
      .collect()
      .map(r => (r.getSeq[Int](1), r.getDouble(2), r.getDouble(3)))
    assert(out(0) === (Seq(4, 1, 3, 3), 0.75, 1.0))
    assert(out(1) === (Seq(4, 4, 3, 1), 0.0, 0.333333))
    assert(out(2) === (Seq(1, 1, 0, 0), 0.0, 0.0))
    assert(out(3) === (Seq(0, 0, 0, 0), 0.0, 0.0))
    assert(out(4) === (Seq(5, 2, 4, 2), 0.6, 0.5))
  }

  // ---- vocab top-k -----------------------------------------------------

  test("vocabTopK counts tokens and breaks ties by token asc") {
    val docs = Seq((1L, "b a b"), (2L, "A c a"), (3L, "  ")).toDF("doc_id", "text")
    val out = Corpus.vocabTopK(docs, "text", 2).as[(String, Long)].collect()
    // a: 3 (case-folded), b: 2, c: 1 -> top2 = a,b
    assert(out === Array(("a", 3L), ("b", 2L)))
    // tie between b and c at k boundary resolves by token asc
    val out3 = Corpus.vocabTopK(docs, "text", 3).as[(String, Long)].collect()
    assert(out3 === Array(("a", 3L), ("b", 2L), ("c", 1L)))
  }

  test("vocabTopK plan: partial count before the exchange, TakeOrdered not Sort") {
    val plan = Corpus.vocabTopK(
      spark.read.parquet(sf("sf0.001") + "/documents.parquet"), "text", 50)
      .queryExecution.executedPlan.toString
    assert(plan.contains("partial_count"), s"no map-side combine:\n$plan")
    assert(plan.contains("TakeOrderedAndProject"), s"global sort for top-k:\n$plan")
  }

  // ---- unigram LM scoring ----------------------------------------------

  test("unigramScore: exact scaled log-probs on a tiny corpus, OOV floor applied") {
    // corpus tokens: a x3, b x2, c x1 -> total 6
    val docs = Seq((1L, "a a b"), (2L, "a b c"), (3L, "")).toDF("doc_id", "text")
    def lp(p: Double): Long = math.floor(1e6 * math.log(p) + 0.5).toLong
    // vocabSize 2 -> vocab {a: ln(3/6), b: ln(2/6)}; c is OOV: ln(0.5/6)
    val out = graft.operators.Corpus.unigramScore(docs, "doc_id", "text", 2)
      .orderBy("doc_id").collect()
    assert(out(0).getInt(1) === 3)
    assert(out(0).getLong(2) === 2 * lp(3.0 / 6) + lp(2.0 / 6))
    assert(out(1).getLong(2) === lp(3.0 / 6) + lp(2.0 / 6) + lp(0.5 / 6))
    assert(out(2).getInt(1) === 0 && out(2).getLong(2) === 0L
      && out(2).getDouble(3) === 0.0)
    // perplexity of doc 1: exp(-mean logprob)
    val expected = BigDecimal(math.exp(-(2 * lp(3.0 / 6) + lp(2.0 / 6)) / (3 * 1e6)))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(out(0).getDouble(3) === expected)
  }

  test("diversityStats: entropy/ttr on crafted docs, order-free scaling") {
    import graft.functions.text
    val docs = Seq(
      (1L, "a b c d"),            // uniform over 4: entropy = ln 4
      (2L, "spam spam spam spam"),// single type: entropy 0, ttr 1/4
      (3L, "a a b"),              // H = -(2/3 ln 2/3 + 1/3 ln 1/3)
      (4L, ""),                   // empty: all zeros
      (5L, "  \t \n ")            // whitespace-only: all zeros
    ).toDF("doc_id", "text")
    val st = text.diversityStats(col("text"))
    val out = docs.select(col("doc_id"), element_at(st, 1), element_at(st, 2),
        element_at(st, 3)).orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    def term(p: Double): Long = math.floor(1e6 * (p * math.log(p)) + 0.5).toLong
    assert(out(0) == ((1L, 4L, 4L, -4 * term(0.25))))
    assert(out(1) == ((2L, 4L, 1L, 0L)))
    assert(out(2) == ((3L, 3L, 2L, -(term(2.0 / 3) + term(1.0 / 3)))))
    assert(out(3) == ((4L, 0L, 0L, 0L)) && out(4) == ((5L, 0L, 0L, 0L)))
    // codegen path: the projection stays inside WholeStageCodegen
    val plan = docs.select(st).queryExecution.executedPlan.toString
    assert(!plan.contains("ScalaUDF"), plan)
  }

  // ---- source report ---------------------------------------------------

  test("sourceReport: counts, dup rate, token volume per source") {
    val docs = Seq(
      (1L, "s1", "alpha beta gamma"),
      (2L, "s1", "alpha beta gamma"),   // exact dup of 1
      (3L, "s1", "delta epsilon"),
      (4L, "s2", "zeta")
    ).toDF("doc_id", "source", "text")
    val rep = Corpus.sourceReport(docs, "source", "text")
      .orderBy("source").collect()
    assert(rep(0).getLong(1) === 3L)      // s1 n_docs
    assert(rep(0).getLong(2) === 2L)      // s1 distinct
    assert(rep(0).getDouble(3) === 1.0 - 2.0 / 3.0) // unrounded exact-int ratio
    assert(rep(0).getLong(4) === 8L)      // 3+3+2 tokens
    assert(rep(1).getLong(1) === 1L && rep(1).getDouble(3) === 0.0)
  }

  test("sourceReportInts pins sourceReport's ratios row by row") {
    // the oracle-checked projection is integer-only; this is the spec
    // that keeps the ratio-emitting API honest against it: each ratio
    // must equal the single IEEE division of the integer facts
    val docs = spark.read.parquet(sf("sf0.01") + "/documents.parquet")
    val ratios = Corpus.sourceReport(docs, "source", "text")
      .collect().map(r => r.getString(0) -> r).toMap
    val ints = Corpus.sourceReportInts(docs, "source", "text").collect()
    assert(ints.nonEmpty && ints.length === ratios.size)
    ints.foreach { r =>
      val e = ratios(r.getString(0))
      val (nDocs, nDistinct) = (r.getLong(1), r.getLong(2))
      assert(nDocs === e.getLong(1))
      assert(nDistinct === e.getLong(2))
      assert(r.getLong(3) === nDocs - nDistinct)           // n_dups
      assert(r.getLong(4) === e.getLong(4))                 // total_tokens
      // bit-exact recovery of both ratios from the integer facts
      assert(e.getDouble(3) === 1.0 - nDistinct.toDouble / nDocs)
      assert(e.getDouble(5) === r.getLong(5).toDouble / (nDocs * 1e6))
    }
  }

  test("sourceReport approx tier: within HLL tolerance of exact; ONE exchange") {
    val docs = spark.read.parquet(sf("sf0.01") + "/documents.parquet")
    val exact = Corpus.sourceReport(docs, "source", "text")
      .select("source", "n_docs", "n_distinct", "total_tokens", "avg_quality")
      .collect().map(r => r.getString(0) -> r).toMap
    val approx = Corpus.sourceReport(docs, "source", "text", approx = true)
    approx
      .select("source", "n_docs", "n_distinct", "total_tokens", "avg_quality")
      .collect().foreach { r =>
      val e = exact(r.getString(0))
      // the non-sketched aggregates are identical
      assert(r.getLong(1) === e.getLong(1))
      assert(r.getLong(3) === e.getLong(3))
      assert(r.getDouble(4) === e.getDouble(4))
      // HLL++ at rsd=0.02: allow 3 sigma => 6%
      val (ad, ed) = (r.getLong(2).toDouble, e.getLong(2).toDouble)
      assert(math.abs(ad - ed) <= math.max(3.0, 0.06 * ed),
        s"approx n_distinct $ad vs exact $ed for ${r.getString(0)}")
    }
    // the point of the tier: one exchange, not the exact form's two
    // (truncate the AQE "Initial Plan" echo before counting)
    val plan = approx.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
    val n = plan.linesIterator.count(_.contains("Exchange hashpartitioning"))
    assert(n === 1, s"approx sourceReport must plan ONE exchange, got $n:\n$plan")
  }

  // ---- length stats ----------------------------------------------------

  test("lengthStats: exact interpolated percentiles") {
    val df = Seq(("a", 10L), ("a", 20L), ("a", 30L), ("a", 40L), ("b", 7L))
      .toDF("g", "len")
    val row = Corpus.lengthStats(df, "g", "len").filter($"g" === "a").collect().head
    assert(row.getLong(1) === 4L)            // n_docs
    assert(row.getDouble(2) === 25.0)        // avg
    assert(row.getDouble(3) === 17.5)        // p25 = 10 + 0.75*10
    assert(row.getDouble(4) === 25.0)        // p50
    assert(row.getDouble(5) === 37.0)        // p90 = 30 + 0.7*10
    assert(row.getDouble(6) === 39.7)        // p99
  }

  test("lengthStats approx tier: within rank tolerance of exact; one exchange") {
    val docs = spark.read.parquet(sf("sf0.01") + "/documents.parquet")
    // approx_percentile is rank-exact at accuracy 10000 but reports a
    // nearest-rank VALUE (no interpolation), so the right tolerance is
    // a rank bracket: approx p must land between the exact quantiles at
    // p +- 0.05 (wide enough to cover one order statistic on the 25-row
    // sf0.01 groups).
    val brackets = docs.groupBy(col("source"))
      .agg(expr("percentile(n_chars, array(0.20D,0.30D, 0.45D,0.55D, " +
        "0.85D,0.95D, 0.94D,1.0D))").as("b"))
      .collect().map(r => r.getString(0) -> r.getSeq[Double](1)).toMap
    val exact = Corpus.lengthStats(docs, "source", "n_chars")
      .collect().map(r => r.getString(0) -> r).toMap
    val approx = Corpus.lengthStats(docs, "source", "n_chars", approx = true)
    approx.collect().foreach { r =>
      val e = exact(r.getString(0))
      assert(r.getLong(1) === e.getLong(1))
      assert(r.getDouble(2) === e.getDouble(2)) // avg is not sketched
      val b = brackets(r.getString(0))
      (3 to 6).foreach { i =>
        val (lo, hi) = (b(2 * (i - 3)), b(2 * (i - 3) + 1))
        assert(r.getDouble(i) >= lo && r.getDouble(i) <= hi,
          s"p-col $i: approx ${r.getDouble(i)} outside exact rank bracket [$lo, $hi]")
      }
    }
    // executed AQE plans append an "== Initial Plan ==" section that
    // repeats the exchange — count only the final plan
    val plan = approx.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
    val n = plan.linesIterator.count(_.contains("Exchange hashpartitioning"))
    assert(n === 1, s"approx lengthStats must plan ONE exchange, got $n:\n$plan")
  }

  // ---- composed quality filter ----------------------------------------

  test("qualityFilter: each gate independently rejects") {
    val prose = ("the data is good and it was found that the value " +
      "of the table is what we know about it ").trim          // passes all
    val docs = Seq(
      (1L, prose),
      (2L, "too short"),                                      // minTokens
      (3L, Seq.fill(40)("spam").mkString(" ")),               // dup words
      (4L, Seq.fill(20)("buy now").mkString(" ")),            // top bigram
      (5L, ".,;: !? .,;: " * 8 + "x y z w v u t s r q p o n") // quality
    ).toDF("doc_id", "text")
    val kept = Corpus.qualityFilter(docs, "text",
      Corpus.QualityGates(minTokens = 10, maxTokens = 1000, minQuality = 0.5,
        maxDupWordRatio = 0.6, maxTopBigramRatio = 0.3))
      .select("doc_id").as[Long].collect().toSet
    assert(kept === Set(1L))
  }

  // ---- PII redaction ---------------------------------------------------

  test("redactPii masks emails, IPs, and digit runs — in that order") {
    val df = Seq(
      (1L, "mail bob.smith+x@ex-ample.co.uk now"),
      (2L, "host 192.168.0.255 port"),
      (3L, "card 4111222233334444 pin 123"),   // short runs survive
      (4L, "id9999 and ann@b.io at 10.0.0.1")
    ).toDF("id", "note")
    val out = Transformators.redactPii(df, Seq("note"))
      .orderBy("id").as[(Long, String)].collect().map(_._2)
    assert(out(0) === "mail <EMAIL> now")
    assert(out(1) === "host <IP> port")
    assert(out(2) === "card <NUM> pin 123")
    assert(out(3) === "id<NUM> and <EMAIL> at <IP>")
  }

  test("bigramScore: modeled bigrams score exactly; backoff = ln(0.4) + unigram") {
    // corpus tokens: a:4 b:3 (total 7); bigrams "a b":2 "b a":1;
    // bigramSize=1 keeps only "a b", so d3's "b a" takes backoff
    val docs = Seq((1L, "a b"), (2L, "a b"), (3L, "b a"),
      (4L, "a"), (5L, "")).toDF("doc_id", "text")
    val out = graft.operators.Corpus
      .bigramScore(docs, "doc_id", "text", vocabSize = 10, bigramSize = 1)
      .orderBy("doc_id").as[(Long, Int, Long, Double)].collect()
    def scaled(p: Double) = math.floor(1e6 * math.log(p) + 0.5).toLong
    // d1/d2: one modeled bigram, ln(c("a b")/c(a)) = ln(2/4)
    assert(out(0) == ((1L, 1, scaled(2.0 / 4), out(0)._4)))
    // d3: backoff ln(0.4) + unigram ln(4/7) for w2 = "a"
    assert(out(2)._3 == scaled(0.4) + scaled(4.0 / 7))
    assert(out(0)._4 < out(2)._4, "modeled order must score better (lower ppl)")
    // < 2 tokens: zero bigrams, ppl 0
    assert(out(3) == ((4L, 0, 0L, 0.0)) && out(4) == ((5L, 0, 0L, 0.0)))
  }

  test("tfidfSimilarPairs: df bounds prune vocab; exact cosine ordering on crafted docs") {
    // N=4; df: apple=3, dog=2 in vocab; banana/cherry/emu df=1 dropped
    val docs = Seq((1L, "apple banana"), (2L, "apple cherry"),
      (3L, "dog emu"), (4L, "apple dog")).toDF("doc_id", "text")
    val got = graft.operators.Corpus
      .tfidfSimilarPairs(docs, "doc_id", "text", minDf = 2, maxDf = 50,
        topK = 10)
      .as[(Long, Long, Double)].collect().toSeq
    def idf(df: Int) = math.floor(1e3 * math.log(4.0 / df) + 0.5).toLong
    val (ia, id) = (idf(3), idf(2)) // apple, dog
    def cos(d: Long, n2a: Long, n2b: Long) =
      BigDecimal(d.toDouble / (math.sqrt(n2a.toDouble) * math.sqrt(n2b.toDouble)))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val mixedNorm = ia * ia + id * id
    val expected = Seq(
      (1L, 2L, cos(ia * ia, ia * ia, ia * ia)),        // 1.0: same vector
      (3L, 4L, cos(id * id, id * id, mixedNorm)),
      (1L, 4L, cos(ia * ia, ia * ia, mixedNorm)),
      (2L, 4L, cos(ia * ia, ia * ia, mixedNorm))
    ).sortBy { case (a, b, c) => (-c, a, b) }
    assert(got == expected, s"got $got\nexpected $expected")
  }

  test("piiReport counts per rule under sequential semantics (no double-reporting)") {
    val df = Seq(
      ("a", "mail bob1234567@x.com or 12345"), // email's digits must NOT also count as NUM
      ("a", "host 10.0.0.1 port 80"),          // IP's octets must NOT count; 80 too short
      ("b", "no pii at all")
    ).toDF("source", "text")
    val rpt = Transformators.piiReport(df, Seq("source"), "text")
    assert(rpt.columns.toSeq == Seq("source", "docs", "n_email", "n_ip", "n_num"))
    val rows = rpt.collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(rows("a") == ((2L, 1L, 1L, 1L)), s"a: ${rows("a")}")
    assert(rows("b") == ((1L, 0L, 0L, 0L)), s"b: ${rows("b")}")
  }

  test("redactPii rejects unknown columns") {
    val df = Seq((1L, "x")).toDF("id", "note")
    val e = intercept[IllegalArgumentException] {
      Transformators.redactPii(df, Seq("nope"))
    }
    assert(e.getMessage.contains("nope"))
  }

  // ---- chunk dedup -----------------------------------------------------

  test("dedupChunks keeps first occurrence globally and reassembles in order") {
    // chunkWords=2: doc 1 = [a b][c d], doc 2 = [c d][e f] (loses "c d"),
    // doc 3 duplicates doc 1 entirely -> drops out
    val docs = Seq(
      (1L, "a b c d"),
      (2L, "c d e f"),
      (3L, "a b c d")
    ).toDF("doc_id", "text")
    val out = Dedup.dedupChunks(docs, "doc_id", "text", chunkWords = 2)
      .orderBy("doc_id").as[(Long, String)].collect()
    assert(out === Array((1L, "a b c d"), (2L, "e f")))
  }

  test("dedupChunks: within-doc repeats collapse to the first index") {
    val docs = Seq((7L, "x y x y x y")).toDF("doc_id", "text")
    val out = Dedup.dedupChunks(docs, "doc_id", "text", chunkWords = 2)
      .as[(Long, String)].collect()
    assert(out === Array((7L, "x y")))
  }

  test("dedupChunks plan: map-side combine on the chunk aggregate") {
    val plan = SparkEntry.queries("q_dedup_chunks")(spark, sf("sf0.001"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("partial_min"), s"no partial min(struct) combine:\n$plan")
  }

  test("bm25: term-frequency ordering, absent terms, rarity reward") {
    val docs = Seq(
      (1L, "spark spark spark runs fast"),   // tf(spark)=3
      (2L, "spark runs on a cluster today"), // tf(spark)=1
      (3L, "ducks swim on the pond"),        // no query terms
      (4L, "ducks and spark and ducks")      // common term + rare term
    ).toDF("doc_id", "text")
    val got = graft.operators.Corpus
      .bm25(docs, "doc_id", "text", terms = Seq("spark", "pond", "absent"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // more occurrences of the same term => strictly higher score
    assert(got(1L) > got(2L), s"tf ordering violated: $got")
    // no query terms => exactly 0 (absent term contributes nothing)
    assert(got(3L) > 0L, "doc 3 matches 'pond' and must score")
    // rare term (df=1) outscores the common term (df=3) at equal tf:
    // doc 3's single 'pond' beats doc 2's single 'spark' despite
    // doc 2 being longer-normalized comparable
    val noTerms = graft.operators.Corpus
      .bm25(docs, "doc_id", "text", terms = Seq("absent"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(noTerms.values.forall(_ == 0L), s"df=0 must score 0: $noTerms")
    // deterministic across runs
    val again = graft.operators.Corpus
      .bm25(docs, "doc_id", "text", terms = Seq("spark", "pond", "absent"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == again)
  }

  test("invertedIndex: df/cf and bounded sorted posting sample") {
    val docs = Seq((1L, "a b a"), (2L, "b c"), (3L, "a")).toDF("doc_id", "text")
    val got = Corpus.invertedIndex(docs, "doc_id", "text", maxPostings = 2)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    assert(got == Map(
      "a" -> ((2L, 3L, "1,3")),
      "b" -> ((2L, 2L, "1,2")),
      "c" -> ((1L, 1L, "2"))))
  }

  test("invertedIndex: posting cap keeps the SMALLEST doc ids") {
    val docs = Seq((9L, "w"), (2L, "w"), (5L, "w")).toDF("doc_id", "text")
    val got = Corpus.invertedIndex(docs, "doc_id", "text", maxPostings = 2)
      .collect().map(r => (r.getLong(1), r.getString(3))).head
    assert(got == ((3L, "2,5")))
  }

  test("classTerms: over-represented term wins its class, staged integer lift") {
    // class A: "x x x y" (ct=4), class B: "y y y y" (ct=4); total 8
    // x: tf_g=3; in A lift = (3*1e6 div 3) * 8 div 4 = 2000000
    // y in A: (1*1e6 div 5) * 8 div 4 = 400000; y in B: (4*1e6 div 5)*8 div 4 = 1600000
    val docs = Seq(("A", "x x x y"), ("B", "y y y y")).toDF("source", "text")
    val got = Corpus.classTerms(docs, "source", "text", minTf = 1, k = 2)
      .collect().map(r => ((r.getString(0), r.getString(1)),
        (r.getLong(3), r.getLong(4)))).toMap
    assert(got(("A", "x")) == ((2000000L, 1L)))
    assert(got(("A", "y")) == ((400000L, 2L)))
    assert(got(("B", "y")) == ((1600000L, 1L)))
  }

  test("rakeKeyphrases: stopwords split runs, degree/freq scores replay by hand") {
    import graft.operators.Corpus
    // "red apple and green apple": candidate runs [red apple], [green
    // apple]. freq: red 1, green 1, apple 2; degree: red 2, green 2,
    // apple 4 -> every word scores 2e6, both phrases 4e6
    val docs = Seq((1L, "red apple and green apple")).toDF("doc_id", "text")
    val got = Corpus.rakeKeyphrases(docs, "doc_id", "text",
      stopwords = Seq("and"), minCount = 1L, k = 10)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .toSet
    assert(got == Set(("green apple", 1L, 4000000L),
      ("red apple", 1L, 4000000L)))
  }

  test("rakeKeyphrases: repeated phrase counts occurrences and keeps one score") {
    import graft.operators.Corpus
    val docs = Seq((1L, "big data"), (2L, "big data"), (3L, "small data"))
      .toDF("doc_id", "text")
    val got = Corpus.rakeKeyphrases(docs, "doc_id", "text",
      stopwords = Seq("the"), minCount = 2L, k = 10)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    // only "big data" clears minCount 2
    assert(got.toSeq == Seq(("big data", 2L)))
  }

  test("heapsCurve: repeats advance tokens only, new types credit the first doc, empty docs drop") {
    import graft.operators.Corpus
    val docs = Seq((1L, "a b a"), (2L, "b c"), (3L, "   "), (4L, "c d"))
      .toDF("doc_id", "text")
    val got = Corpus.heapsCurve(docs, "doc_id", "text")
      .select(col("doc_id"), col("n_tokens"), col("cum_tokens"),
        col("cum_types"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSet
    assert(got == Set(
      (1L, 3L, 3L, 2L),   // a b a: 3 tokens, types {a, b}
      (2L, 2L, 5L, 3L),   // b c: only c is new
      (4L, 2L, 7L, 4L)))  // c d: d new; doc 3 (whitespace) omitted
  }

  test("importanceWeights: target-like doc outranks source-like; hand ratios; zero-bigram doc reports 0/NULL") {
    import graft.operators.Corpus
    // target has "the cat" twice plus "cat sat"/"cat ran" once each;
    // source doc 1 shares the target's bigrams, doc 2 shares none,
    // doc 3 has one token (no bigram)
    val target = Seq((100L, "the cat sat"), (101L, "the cat ran"))
      .toDF("doc_id", "text")
    val source = Seq((1L, "the cat sat"), (2L, "zq xw vv"), (3L, "one"))
      .toDF("doc_id", "text")
    val r = Corpus.importanceWeights(source, target, "doc_id", "text",
        buckets = 1024).collect()
      .map(x => x.getLong(0) -> (x.getLong(1),
        Option(x.get(2)).map(_.asInstanceOf[Long]))).toMap
    // doc 1: "the cat" (t=2, s=1 -> 3e6//2 = 1500000), "cat sat"
    // (t=1, s=1 -> 1000000) -> mean 1250000; doc 2: two unseen
    // bigrams (t=0, s=1 -> 500000 each) -> 500000
    assert(r(1L) === ((2L, Some(1250000L))))
    assert(r(2L) === ((2L, Some(500000L))))
    assert(r(1L)._2.get > r(2L)._2.get,
      "the target-like document must outrank the source-like one")
    // a document with < 2 tokens has no profile: honest NULL, not 1e6
    assert(r(3L) === ((0L, None)))
  }
}
