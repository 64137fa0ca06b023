package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.text

/** Corpus-level analysis operators for the training-data pipeline:
  * vocabulary statistics and distribution summaries that in practice
  * run over the WHOLE corpus (billions of documents), so every one of
  * them is shaped as partial-aggregate -> single hash exchange ->
  * final aggregate.
  */
object Corpus {

  /** Top-k corpus vocabulary by token frequency.
    *
    * Shape at scale: explode is a local projection; the per-token count
    * is a HashAggregate with MAP-SIDE partial combine, so the shuffle
    * carries one (token, partial-count) row per distinct token per task
    * — proportional to vocabulary size, not corpus size. The final
    * top-k is TakeOrderedAndProject (per-partition heaps + driver merge
    * of k rows), never a global sort.
    *
    * Ordering ties break by token ascending, so the selected k rows are
    * deterministic and engine-portable.
    */
  def vocabTopK(docs: DataFrame, textCol: String, k: Int): DataFrame =
    docs
      .select(explode(split(lower(trim(col(textCol))), "\\s+")).as("token"))
      .filter(length(col("token")) > 0)
      .groupBy(col("token"))
      .agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("token").asc)
      .limit(k)

  /** Unigram language-model document scoring — the CCNet/KenLM quality
    * idea at its simplest useful tier, self-trained on the corpus:
    *
    *  1. ONE aggregation builds token counts; the top `vocabSize`
    *     tokens (by count desc, token asc — deterministic) become the
    *     vocabulary, log-probabilities scaled to exact longs
    *     (floor(1e6*ln(count/total)+0.5)); everything else scores the
    *     OOV floor ln(0.5/total).
    *  2. Scoring is then a pure PROJECTION: the vocabulary rides the
    *     plan as a reference object (driver-bounded, ~vocabSize
    *     entries), so per-document mean log-prob / perplexity costs no
    *     join and no shuffle — the shape that lets a 100 TB corpus be
    *     scored in the same pass that reads it.
    *
    * Integer-scaled log-probs make the per-doc sum order-independent
    * and engine-exact; only the final perplexity is a rounded double.
    * Output: (id, n_tokens, lp_scaled, ppl); empty docs score ppl 0.
    */
  def unigramScore(docs: DataFrame, idCol: String, textCol: String,
                   vocabSize: Int): DataFrame = {
    require(vocabSize > 0, s"vocabSize must be positive, got $vocabSize")
    // persisted: the counts aggregation feeds TWO actions (grand total
    // + top-K collect); without it the corpus-wide tokenize/count scan
    // runs twice (r4 review finding)
    val counts = docs
      .select(explode(split(lower(trim(col(textCol))), "\\s+")).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy(col("w")).agg(count(lit(1)).as("c"))
      .persist()
    val (vocab, oov) = try {
      val totalRow = counts.agg(sum(col("c")).cast("long")).first()
      val total = if (totalRow.isNullAt(0)) 0L else totalRow.getLong(0)
      def scaled(p: Double): Long = math.floor(1e6 * math.log(p) + 0.5).toLong
      if (total == 0L) (Map.empty[String, Long], 0L)
      else {
        val top = counts.orderBy(col("c").desc, col("w").asc).limit(vocabSize)
          .collect().map(r => r.getString(0) -> scaled(r.getLong(1).toDouble / total))
        (top.toMap, scaled(0.5 / total))
      }
    } finally counts.unpersist()
    // null text scores as empty (0 tokens, ppl 0) — pipeline-friendly,
    // and what the SQL oracle's outer join naturally produces
    val st = graft.functions.text.unigramScore(
      coalesce(col(textCol), lit("")), vocab, oov)
    docs.select(col(idCol),
        element_at(st, 1).cast("int").as("n_tokens"),
        element_at(st, 2).as("lp_scaled"))
      .withColumn("ppl", when(col("n_tokens") === 0, lit(0.0))
        .otherwise(round(exp(-(col("lp_scaled").cast("double")) /
          (col("n_tokens") * lit(1e6))), 6)))
  }

  /** Bigram language-model scoring with STUPID BACKOFF (Brants et al.
    * 2007, "Large Language Models in Machine Translation") — the next
    * quality tier above [[unigramScore]]: a document full of real
    * words in impossible ORDER ("the of and is the of") sails through
    * a unigram filter and is exactly what a bigram score catches.
    *
    * Training (two bounded aggregations over the corpus):
    *   - token counts as in [[unigramScore]] (top `vocabSize` becomes
    *     the unigram vocabulary, OOV floor ln(0.5/total));
    *   - bigram counts joined to their prefix's unigram count; the top
    *     `bigramSize` bigrams (count desc, bigram asc — deterministic)
    *     carry score ln(c(w1 w2)/c(w1)).
    * Scoring is a pure projection: both models ride the plan as small
    * literal maps and each position i contributes the bigram score or,
    * when the bigram is unmodeled, ln(0.4) + unigram(w2) — stupid
    * backoff's fixed penalty (scores, not normalized probabilities —
    * the right trade for filtering, per the paper). Integer-scaled
    * logs keep the per-doc sum order-independent and engine-exact.
    * Output: (id, n_bigrams, lp_scaled, ppl); docs with < 2 tokens
    * score ppl 0. */
  def bigramScore(docs: DataFrame, idCol: String, textCol: String,
                  vocabSize: Int, bigramSize: Int): DataFrame = {
    require(vocabSize > 0, s"vocabSize must be positive, got $vocabSize")
    require(bigramSize > 0, s"bigramSize must be positive, got $bigramSize")
    val Sep = "\u001f" // unit separator: cannot appear inside a token
    def toks(c: org.apache.spark.sql.Column) =
      filter(split(lower(trim(coalesce(c, lit("")))), "\\s+"),
        w => length(w) > 0)
    def bigramAt(t: org.apache.spark.sql.Column,
                 i: org.apache.spark.sql.Column) =
      concat(element_at(t, i), lit(Sep), element_at(t, i + 1))
    def scaled(p: Double): Long = math.floor(1e6 * math.log(p) + 0.5).toLong

    val tok = docs.select(toks(col(textCol)).as("__t"))
    val uniCounts = tok.select(explode(col("__t")).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("c"))
      .persist() // feeds the total, the vocab top-k, AND the bigram join
    val (vocab, oov, model) = try {
      val totalRow = uniCounts.agg(sum(col("c")).cast("long")).first()
      val total = if (totalRow.isNullAt(0)) 0L else totalRow.getLong(0)
      if (total == 0L) (Map.empty[String, Long], 0L, Map.empty[String, Long])
      else {
        val top = uniCounts.orderBy(col("c").desc, col("w").asc)
          .limit(vocabSize).collect()
          .map(r => r.getString(0) -> scaled(r.getLong(1).toDouble / total))
        val bgTop = tok.filter(size(col("__t")) >= 2)
          .select(explode(transform(sequence(lit(1), size(col("__t")) - 1),
            i => bigramAt(col("__t"), i))).as("b"))
          .groupBy(col("b")).agg(count(lit(1)).as("cb"))
          .join(uniCounts.select(col("w").as("__pw"), col("c").as("c1")),
            substring_index(col("b"), Sep, 1) === col("__pw"))
          .orderBy(col("cb").desc, col("b").asc).limit(bigramSize)
          .select(col("b"), col("cb"), col("c1")).collect()
          .map(r => r.getString(0) ->
            scaled(r.getLong(1).toDouble / r.getLong(2)))
        (top.toMap, scaled(0.5 / total), bgTop.toMap)
      }
    } finally uniCounts.unpersist()

    val backoff = scaled(0.4)
    val uniMap = typedLit(vocab)
    val bgMap = typedLit(model)
    // tokenize ONCE per row in its own projection: the scoring lambda
    // references the token array at every position, and inlining the
    // split there would re-tokenize per bigram — O(n²) per document.
    // CollapseProject keeps the stage split because the alias is
    // multiply-referenced and non-cheap (both Projects still fuse into
    // one codegen stage).
    val t = col("__t")
    val n = size(t)
    val lp = when(n >= 2,
        aggregate(sequence(lit(1), n - 1), lit(0L), (acc, i) =>
          acc + coalesce(element_at(bgMap, bigramAt(t, i)),
            lit(backoff) +
              coalesce(element_at(uniMap, element_at(t, i + 1)), lit(oov)))))
      .otherwise(lit(0L))
    docs.withColumn("__t", toks(col(textCol)))
      .select(col(idCol),
        greatest(n - 1, lit(0)).cast("int").as("n_bigrams"),
        lp.as("lp_scaled"))
      .withColumn("ppl", when(col("n_bigrams") === 0, lit(0.0))
        .otherwise(round(exp(-(col("lp_scaled").cast("double")) /
          (col("n_bigrams") * lit(1e6))), 6)))
  }

  /** Top-k most-similar document pairs by TF-IDF cosine — lexical
    * retrieval's workhorse representation (Salton's vector model; the
    * same weighting family as BM25 without the saturation terms),
    * self-trained like the LM tiers:
    *
    *   - terms keep an integer-scaled idf (floor(1e3·ln(N/df)+0.5))
    *     when minDf ≤ df ≤ maxDf — the df ceiling is ALSO the scale
    *     lever: it drops stopword-grade terms whose posting lists
    *     would otherwise dominate the term join (candidate pairs ∝
    *     Σ df², so capping df caps the join);
    *   - doc-vector weights tf·idf are exact integers, so dot products
    *     and squared norms are exact integer sums — only the final
    *     cosine touches doubles (sqrt is correctly rounded per IEEE,
    *     so the value replays cross-engine; round 6 guards the rest);
    *   - pairs meet through a term-keyed equi-join (shuffle ∝ postings,
    *     never all-pairs), and the top-k is TakeOrdered under the
    *     total order (cos desc, id_a, id_b) — deterministic through
    *     the LIMIT boundary.
    *
    * Output: (id_a, id_b, cos), id_a < id_b, k rows. */
  def tfidfSimilarPairs(docs: DataFrame, idCol: String, textCol: String,
                        minDf: Int, maxDf: Int, topK: Int): DataFrame = {
    require(minDf >= 1 && maxDf >= minDf, s"bad df bounds [$minDf, $maxDf]")
    require(topK > 0, s"topK must be positive, got $topK")
    val nDocs = docs.count()
    val tok = docs.select(col(idCol).as("__id"),
      explode(filter(split(lower(trim(coalesce(col(textCol), lit("")))),
        "\\s+"), w => length(w) > 0)).as("w"))
    // tf feeds the df aggregate AND the vector join; vec feeds norms
    // and both join sides — materialize each once (scope-tracked)
    val tf = Dedup.materializeShared(
      tok.groupBy(col("__id"), col("w")).agg(count(lit(1)).as("tf")))
    val idf = tf.groupBy(col("w")).agg(count(lit(1)).as("df"))
      .filter(col("df").between(minDf, maxDf))
      .select(col("w"),
        floor(lit(1e3) * log(lit(nDocs.toDouble) / col("df").cast("double"))
          + 0.5).cast("long").as("idf"))
    val vec = Dedup.materializeShared(
      tf.join(idf, "w")
        .select(col("__id"), col("w"), (col("tf") * col("idf")).as("wt")))
    val norm = vec.groupBy(col("__id")).agg(sum(col("wt") * col("wt")).as("n2"))
    val a = vec.select(col("w"), col("__id").as("id_a"), col("wt").as("wt_a"))
    val b = vec.select(col("w"), col("__id").as("id_b"), col("wt").as("wt_b"))
    val dot = a.join(b, Seq("w")).filter(col("id_a") < col("id_b"))
      .groupBy(col("id_a"), col("id_b"))
      .agg(sum(col("wt_a") * col("wt_b")).as("d"))
    dot
      .join(norm.select(col("__id").as("id_a"), col("n2").as("n2_a")), "id_a")
      .join(norm.select(col("__id").as("id_b"), col("n2").as("n2_b")), "id_b")
      .select(col("id_a"), col("id_b"),
        round(col("d").cast("double") /
          (sqrt(col("n2_a").cast("double")) * sqrt(col("n2_b").cast("double"))),
          6).as("cos"))
      .orderBy(col("cos").desc, col("id_a").asc, col("id_b").asc)
      .limit(topK)
  }

  /** Per-column data profile: row/null/distinct counts for every
    * column of the frame — the schema-drift / data-quality sweep a
    * pipeline runs before trusting an ingest batch. ONE pass over the
    * data: each column contributes two aggregates to a single
    * grouped-less aggregation (row count is shared), then `stack`
    * unpivots the wide row INSIDE the plan — the operator stays lazy
    * (no construction-time job, the real aggregation is visible to
    * plan audits) and returns (col_name, n_rows, n_nulls, n_distinct).
    * Exact distinct counts (oracle-checkable); swap in
    * approx_count_distinct at 100 TB when ±2% suffices. */
  def profile(df: DataFrame): DataFrame = {
    val cols = df.columns.toSeq
    require(cols.forall(c => !c.contains("`") && !c.contains("'")),
      "profile: column names must not contain quotes/backticks")
    val aggs = count(lit(1)).as("__n") +:
      cols.flatMap(c => Seq(
        count(when(col(c).isNull, lit(1))).as(s"__nulls_$c"),
        countDistinct(col(c)).as(s"__dist_$c")))
    val stackArgs = cols
      .map(c => s"'$c', `__nulls_$c`, `__dist_$c`").mkString(", ")
    df.agg(aggs.head, aggs.tail: _*)
      .selectExpr(
        s"stack(${cols.size}, $stackArgs) AS (col_name, n_nulls, n_distinct)",
        "__n AS n_rows")
      .select(col("col_name"), col("n_rows"), col("n_nulls"), col("n_distinct"))
  }

  /** Gopher-style quality gates — every signal must pass. Bounds are
    * inclusive; ratios compare at the shared round-6 precision so the
    * decision is engine-portable (same rounded value on both sides of
    * the SQL oracle). */
  final case class QualityGates(
      minTokens: Int = 20,
      maxTokens: Int = 100000,
      minQuality: Double = 0.5,
      maxDupWordRatio: Double = 0.6,
      maxTopBigramRatio: Double = 0.1)

  /** Composed quality filtering (the Gopher/C4 pipeline stage): drop
    * documents failing ANY of token-count bounds, composite quality
    * score, duplicate-word fraction, or top-bigram fraction. One
    * codegen'd filter over the scan — all four signals come from two
    * one-pass kernels, no shuffle, linear at any corpus size. */
  def qualityFilter(docs: DataFrame, textCol: String,
                    gates: QualityGates = QualityGates()): DataFrame = {
    val c = col(textCol)
    // token gate from the SAME kernel as the repetition ratios (r4
    // review finding: tokenCount keeps empty split segments, the
    // repetition kernel drops them — mixing the two made the gate
    // diverge from the oracle on edge-whitespace docs)
    docs.filter(
      element_at(text.repetitionStats(c), 1)
        .between(gates.minTokens, gates.maxTokens) &&
      text.qualityScore(c) >= gates.minQuality &&
      text.dupWordRatio(c) <= gates.maxDupWordRatio &&
      text.topBigramRatio(c) <= gates.maxTopBigramRatio)
  }

  /** Per-source corpus health report: document and distinct-content
    * counts, exact-dup rate, token volume, and mean quality — the
    * one-pass dashboard a curation run starts from. The plain
    * aggregates combine map-side; the EXACT count-distinct is the
    * honest cost: it plans as a two-round distinct aggregate whose
    * first exchange carries one row per distinct (source, fingerprint)
    * pair — proportional to distinct CONTENT, not to source count
    * (plan-pinned at 2 exchanges in CorpusOpsSpec). At 100 TB swap in
    * approx_count_distinct (HLL, one exchange) when a ±2% dup rate is
    * acceptable; the exact form is kept here because it is what the
    * DuckDB oracle can check. The ratio outputs are deliberately NOT
    * rounded: every operand is an exact integer aggregate, so the one
    * IEEE-754 division is bit-identical in any engine — whereas a final
    * round-to-6 reintroduces cross-engine last-ulp risk (BigDecimal
    * HALF_UP here vs the oracle engine's own rounding) on tie-adjacent
    * values. For cross-engine RESULT-HASH checks use
    * [[sourceReportInts]] instead: it carries the same facts as pure
    * BIGINT aggregates, which hash identically under any formatter —
    * full-precision doubles proved hasher-sensitive even when the
    * math was bit-identical. */
  def sourceReport(docs: DataFrame, groupCol: String, textCol: String,
                   approx: Boolean = false): DataFrame =
    // both ratios derive from the integer base by ONE IEEE division
    // each — identical operands and op order to computing them inside
    // the aggregate, so the CorpusOpsSpec bit-exact pin holds; sharing
    // the base with sourceReportInts means the fingerprint/token/
    // quality projection cannot drift between the two forms
    sourceBase(docs, groupCol, textCol, approx).select(
      col(groupCol), col("n_docs"), col("n_distinct"),
      (lit(1.0) - col("n_distinct").cast("double") / col("n_docs"))
        .as("dup_rate"),
      col("total_tokens"),
      (col("sum_q_scaled").cast("double") / (col("n_docs") * lit(1e6)))
        .as("avg_quality"))

  /** Shared integer aggregation under both report forms. approx=true is
    * the 100 TB dial: swaps the exact two-exchange distinct aggregate
    * for approx_count_distinct (HLL++, rsd 2%) — a plain partial/final
    * aggregate, ONE exchange carrying one sketch per (source) per task
    * instead of one row per distinct fingerprint. The exact form stays
    * the default because it is what the DuckDB oracle can check; the
    * approx tier is tolerance-spec'd against it. sum_q_scaled is the
    * exact order-independent mean carrier: __q is already round-6, so
    * floor(q*1e6 + 0.5) is a lossless long (avg() over doubles sums in
    * partition-completion order and flips the last ulp run to run — an
    * r4 driver hash flake). */
  private def sourceBase(docs: DataFrame, groupCol: String, textCol: String,
                         approx: Boolean): DataFrame = {
    val c = col(textCol)
    val nDistinct = if (approx) approx_count_distinct(col("__fp"), 0.02)
                    else countDistinct(col("__fp"))
    docs
      .select(col(groupCol), text.fingerprintMd5(c).as("__fp"),
        text.tokenCount(c).cast("long").as("__tok"),
        text.qualityScore(c).as("__q"))
      .groupBy(col(groupCol))
      .agg(
        count(lit(1)).as("n_docs"),
        nDistinct.as("n_distinct"),
        sum(col("__tok")).as("total_tokens"),
        sum(floor(col("__q") * 1e6 + lit(0.5)).cast("long"))
          .as("sum_q_scaled"))
  }

  /** Integer-only projection of [[sourceReport]]: the same per-source
    * health facts expressed as exact BIGINT aggregates — `n_dups =
    * n_docs − n_distinct` in place of `dup_rate`, `sum_q_scaled`
    * (the lossless floor(q·1e6+0.5) long sum) in place of
    * `avg_quality`. The information content is identical (the caller
    * recovers both ratios with one division), but integers hash
    * identically under any engine/formatter, so this is the
    * projection a cross-engine result-hash check should compare.
    * CorpusOpsSpec pins [[sourceReport]]'s ratio columns against this
    * form row by row. */
  def sourceReportInts(docs: DataFrame, groupCol: String,
                       textCol: String): DataFrame =
    sourceBase(docs, groupCol, textCol, approx = false).select(
      col(groupCol), col("n_docs"), col("n_distinct"),
      (col("n_docs") - col("n_distinct")).as("n_dups"),
      col("total_tokens"), col("sum_q_scaled"))

  /** Per-group length-distribution summary: exact interpolated
    * percentiles (Spark `percentile`, the R-7 / quantile_cont
    * definition every engine uses), mean, and count.
    *
    * Exact percentiles need the values per group — Spark's percentile
    * aggregate buffers them per group, which is the honest cost of
    * EXACT quantiles and fine for bounded group counts (sources,
    * languages). For free-cardinality groups at 100 TB you'd switch to
    * approx_percentile (t-digest, constant memory); this operator is
    * the oracle-checkable exact tier.
    *
    * Ratios/means are rounded to 6 decimals: interpolation order of
    * operations may differ across engines in the last ulp.
    */
  def lengthStats(docs: DataFrame, groupCol: String, lenCol: String,
                  approx: Boolean = false): DataFrame = {
    // approx=true is the free-cardinality-group / 100 TB tier:
    // approx_percentile keeps a constant-size sketch per group instead
    // of buffering every value, same partial/final one-exchange shape.
    // (accuracy 10000 => within 1e-4 relative rank; tolerance-spec'd
    // against the exact tier in CorpusOpsSpec.)
    val pct =
      if (approx)
        expr(s"approx_percentile($lenCol, array(0.25D, 0.5D, 0.9D, 0.99D), 10000)")
          .cast("array<double>")
      else expr(s"percentile($lenCol, array(0.25D, 0.5D, 0.9D, 0.99D))")
    docs.groupBy(col(groupCol))
      .agg(
        count(lit(1)).as("n_docs"),
        round(avg(col(lenCol)), 6).as("avg_len"),
        round(element_at(pct, 1), 6).as("p25"),
        round(element_at(pct, 2), 6).as("p50"),
        round(element_at(pct, 3), 6).as("p90"),
        round(element_at(pct, 4), 6).as("p99"))
  }

  /** BM25 relevance of every document against a fixed term set —
    * the ranking signal for relevance-targeted corpus curation (keep
    * documents that score against a topic query; Robertson & Zaragoza
    * 2009 for the formula).
    *
    * Shape at scale: one projection computes per-term tf from the token
    * array (no explode — `terms` is a handful of literals), one
    * single-row global aggregate collects N / total tokens / per-term
    * document frequencies, broadcast back as a 1-row cross join, one
    * final projection scores. Zero data shuffles; the only exchange is
    * the singleton aggregate.
    *
    * Cross-engine contract: per-term contributions are floored to
    * 1e6-scaled longs and summed as integers (order-free, the
    * q_diversity pattern), every constant reaches both engines as the
    * same shortest-round-trip double literal, and the float expression
    * trees are parenthesized identically — so the oracle compares
    * exact integers. A term absent from the corpus (df=0) contributes
    * 0 from every doc by the tf>0 guard. */
  def bm25(docs: DataFrame, idCol: String, textCol: String,
           terms: Seq[String], k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(terms.nonEmpty, "bm25 needs at least one query term")
    val toks = filter(split(lower(trim(col(textCol))), "\\s+"),
      x => x =!= lit(""))
    val withTf = docs.select(
      Seq(col(idCol).as("id"), size(toks).as("dl")) ++
        terms.zipWithIndex.map { case (t, i) =>
          size(filter(toks, x => x === lit(t))).as(s"tf$i")
        }: _*)
    val statCols = Seq(count(lit(1)).as("n"), sum(col("dl")).as("t")) ++
      terms.indices.map(i =>
        sum((col(s"tf$i") > 0).cast("long")).as(s"df$i"))
    val stats = withTf.agg(statCols.head, statCols.tail: _*)
    val scored = withTf.crossJoin(broadcast(stats))
    val ratio = col("dl").cast("double") * col("n").cast("double") /
      col("t").cast("double")
    def term(i: Int) = {
      val tf = col(s"tf$i").cast("double")
      val dfc = col(s"df$i").cast("double")
      val idf = log(lit(1.0) +
        (col("n").cast("double") - dfc + lit(0.5)) / (dfc + lit(0.5)))
      val tfn = tf * lit(k1 + 1.0) /
        (tf + lit(k1) * (lit(1.0) - lit(b) + lit(b) * ratio))
      when(col(s"tf$i") > 0,
        floor(idf * tfn * lit(1e6)).cast("long")).otherwise(lit(0L))
    }
    scored.select(col("id").as(idCol),
      terms.indices.map(term).reduce(_ + _).as("bm25_micros"),
      col("dl").cast("long").as("n_tokens"))
  }

  /** Inverted-index build — IR's core artifact (term → document
    * postings; Zobel & Moffat 2006, "Inverted files for text search
    * engines"). Per term: document frequency, collection frequency,
    * and a BOUNDED posting sample (the `maxPostings` smallest doc ids,
    * comma-joined — the index head a serving tier would prefetch).
    *
    * Scale shape: one explode → one (term, doc) count aggregation
    * (map-side combined; cardinality = distinct term-doc pairs, the
    * index's own size), then a row_number window per term to CAP the
    * collected postings BEFORE any collect_list — an unbounded
    * collect_list on a stopword's postings is the classic 100 TB
    * OOM; here the per-term buffer is ≤ maxPostings rows by
    * construction. df/cf fold into the same aggregation. */
  def invertedIndex(docs: DataFrame, idCol: String, textCol: String,
                    maxPostings: Int): DataFrame = {
    require(maxPostings >= 1, s"maxPostings must be positive: $maxPostings")
    val toks = filter(split(lower(trim(coalesce(col(textCol), lit("")))),
      "\\s+"), w => length(w) > 0)
    val td = docs
      .select(col(idCol).cast("long").as("did"), explode(toks).as("term"))
      .groupBy(col("term"), col("did")).agg(count(lit(1)).as("c_td"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("term")).orderBy(col("did").asc)
    td.withColumn("__rn", row_number().over(w))
      .groupBy(col("term"))
      .agg(
        count(lit(1)).as("df"),
        sum(col("c_td")).as("cf"),
        array_join(transform(sort_array(collect_list(
          when(col("__rn") <= maxPostings, col("did")))),
          x => x.cast("string")), ",").as("posting_sample"))
  }

  /** Per-class term signatures — the c-TF-IDF idea (Grootendorst 2022,
    * BERTopic): for each class (source, topic, language), the terms
    * most over-represented relative to the whole corpus. Score is the
    * integer lift `(tf_c·1e6 div tf_g) · T div ct` (class share of the
    * term, normalized by the class's share of all tokens) — staged
    * division keeps every intermediate < 2^63 and both engines replay
    * the exact same truncation chain. `minTf` prunes the unstable
    * rare-term tail; top-k per class under (lift desc, term asc).
    *
    * Scale shape: one tokenize → one (class, term) count aggregation;
    * term globals re-derive from the class counts (window over term),
    * class totals likewise — no second corpus pass. Final rank is a
    * window over (class) on the pruned count table. */
  def classTerms(docs: DataFrame, classCol: String, textCol: String,
                 minTf: Long, k: Int): DataFrame = {
    require(minTf >= 1 && k >= 1)
    import org.apache.spark.sql.expressions.Window
    val toks = filter(split(lower(trim(coalesce(col(textCol), lit("")))),
      "\\s+"), w => length(w) > 0)
    val tc = docs.select(col(classCol).as("class"), explode(toks).as("term"))
      .groupBy(col("class"), col("term")).agg(count(lit(1)).as("tf_c"))
    val totalRow = tc.agg(sum(col("tf_c")).cast("long").as("total"))
    val scored = tc
      .withColumn("tf_g", sum(col("tf_c")).over(Window.partitionBy(col("term"))))
      .withColumn("ct", sum(col("tf_c")).over(Window.partitionBy(col("class"))))
      .crossJoin(broadcast(totalRow))
      .filter(col("tf_c") >= minTf)
      .withColumn("lift_ppm",
        expr("(tf_c * 1000000L div tf_g) * total div ct"))
    val wRank = Window.partitionBy(col("class"))
      .orderBy(col("lift_ppm").desc, col("term").asc)
    scored.withColumn("__rk", row_number().over(wRank))
      .filter(col("__rk") <= k)
      .select(col("class"), col("term"), col("tf_c"), col("lift_ppm"),
        col("__rk").cast("long").as("rank"))
  }

  /** Top-k collocations by PMI lift — corpus-level phrase mining
    * (Church & Hanks 1990, "Word Association Norms, Mutual Information,
    * and Lexicography"). PMI(a,b) = ln(N·c(ab) / (c(a)·c(b))); since ln
    * is monotone, ranking by the LIFT N·c(ab)/(c(a)·c(b)) ranks by PMI
    * without a float log — computed here as the ppm-scaled BIGINT
    * `N·c(ab)·1e6 div (c(a)·c(b))`, exact in both engines (all factors
    * < 2^31, the product < 2^63 for any corpus this integer form is
    * used on — at larger N, swap the 1e6 scale down; the ORDER is
    * unchanged).
    *
    * Scale shape: one tokenize pass feeds two counting aggregations
    * (unigrams, adjacent bigrams), both map-side combined; the bigram
    * table joins its prefix and suffix counts on the word key (shuffle
    * ∝ distinct bigrams, never corpus size); `minCount` prunes the
    * hapax tail BEFORE the joins — at 100 TB that filter is what keeps
    * the bigram table from being dominated by noise pairs that PMI is
    * notoriously unstable on. Top-k via TakeOrdered (count-bounded
    * heap), total order (lift desc, pair asc). */
  def pmiCollocations(docs: DataFrame, textCol: String,
                      minCount: Int, k: Int): DataFrame = {
    require(minCount >= 1 && k >= 1)
    val toks = filter(split(lower(trim(coalesce(col(textCol), lit("")))),
      "\\s+"), w => length(w) > 0)
    // the tokenize projection is deliberately NOT cached: it feeds two
    // counting branches, and re-running a linear split is cheaper than
    // a corpus-sized cache (the Dedup tier's eager-checkpoint A/B made
    // the same call for its cheap-recompute branches)
    val tok = docs.select(toks.as("__t"))
    val uni = tok.select(explode(col("__t")).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("c"))
    val total = uni.agg(sum(col("c")).cast("long").as("n_total"))
    val bi = tok.filter(size(col("__t")) >= 2)
      .select(explode(transform(sequence(lit(1), size(col("__t")) - 1),
        i => struct(element_at(col("__t"), i).as("w1"),
          element_at(col("__t"), i + 1).as("w2")))).as("p"))
      .select(col("p.w1"), col("p.w2"))
      .groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("c_ab"))
      .filter(col("c_ab") >= minCount)
    bi
      .join(uni.select(col("w").as("w1"), col("c").as("c_a")), Seq("w1"))
      .join(uni.select(col("w").as("w2"), col("c").as("c_b")), Seq("w2"))
      .crossJoin(broadcast(total))
      .select(col("w1"), col("w2"), col("c_ab"),
        expr("n_total * c_ab * 1000000L div (c_a * c_b)").as("lift_ppm"))
      .orderBy(col("lift_ppm").desc, col("w1").asc, col("w2").asc)
      .limit(k)
  }

  /** RAKE keyphrase extraction (Rose et al. 2010): candidate phrases
    * are maximal stopword-free token runs; word score = degree/freq
    * (degree sums the lengths of every phrase the word appears in);
    * phrase score sums its words' scores. All ratios are exact integer
    * ppm, so the ranking replays engine-for-engine. Phrase runs are
    * recovered with the pos − row_number() islands trick — no
    * per-document UDF, every stage a key-partitioned aggregate; the
    * word-score table is vocabulary-sized. Output: top-k distinct
    * phrases seen ≥ minCount times, by (score desc, phrase asc). */
  def rakeKeyphrases(df: DataFrame, idCol: String, textCol: String,
      stopwords: Seq[String], minCount: Long, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val toks = df
      .select(col(idCol).as("__doc"),
        filter(split(lower(trim(coalesce(col(textCol), lit("")))), "\\s+"),
          t => length(t) > 0).as("__ts"))
      .select(col("__doc"), posexplode(col("__ts")).as(Seq("__pos", "__tok")))
    val cand = toks.filter(!col("__tok").isin(stopwords.map(x => x: Any): _*))
    val ph = cand.withColumn("__pk", col("__pos") -
      row_number().over(Window.partitionBy(col("__doc")).orderBy(col("__pos"))))
    val phr = ph.groupBy(col("__doc"), col("__pk"))
      .agg(array_join(transform(array_sort(collect_list(
        struct(col("__pos"), col("__tok")))), s => s.getField("__tok")), " ")
        .as("phrase"), count(lit(1)).as("__plen"))
    val wo = ph.join(phr.select(col("__doc"), col("__pk"), col("__plen")),
      Seq("__doc", "__pk"))
    val wsc = wo.groupBy(col("__tok"))
      .agg(count(lit(1)).as("__freq"), sum(col("__plen")).as("__deg"))
      .select(col("__tok"), expr("__deg * 1000000L div __freq").as("__wscore"))
    val psc = wo.join(wsc, Seq("__tok"))
      .groupBy(col("__doc"), col("__pk"))
      .agg(sum(col("__wscore")).as("__score"))
    phr.join(psc, Seq("__doc", "__pk"))
      .groupBy(col("phrase"))
      .agg(count(lit(1)).as("n_occurrences"), min(col("__score")).as("score_ppm"))
      .filter(col("n_occurrences") >= minCount)
      .orderBy(col("score_ppm").desc, col("phrase").asc)
      .limit(k)
  }

  /** Exact phrase search in the inverted-index prune-then-verify
    * shape: candidates are documents containing ALL of the phrase's
    * tokens (a token-level probe over the exploded token stream — the
    * access path an inverted index gives, bounded by the rarest
    * token's postings), then the substring verify and occurrence count
    * run on candidates ONLY — never a corpus-wide contains() scan.
    * Occurrences count by exact length arithmetic, engine-portable. */
  def phraseSearch(df: DataFrame, idCol: String, textCol: String,
                   phrase: String): DataFrame = {
    val p = phrase.toLowerCase.trim
    require(p.nonEmpty && !p.contains("'"), s"bad phrase: '$phrase'")
    val toks = p.split("\\s+").filter(_.nonEmpty).distinct
    val cand = df.select(col(idCol),
        explode(split(lower(trim(col(textCol))), "\\s+")).as("__tok"))
      .filter(col("__tok").isin(toks.toIndexedSeq: _*))
      .groupBy(col(idCol))
      .agg(countDistinct(col("__tok")).as("__nt"))
      .filter(col("__nt") === toks.length)
      .select(col(idCol))
    df.join(cand, Seq(idCol), "left_semi")
      .withColumn("__lt", lower(col(textCol)))
      .filter(col("__lt").contains(p))
      .select(col(idCol), expr(
        s"(length(__lt) - length(replace(__lt, '$p', ''))) div ${p.length}")
        .as("n_occurrences"))
  }

  /** Vocabulary coverage curve (the Zipf-truncation signal): for each
    * rank cutoff k, the share of all token OCCURRENCES covered by the
    * k most frequent types — "how much of the stream survives a
    * k-entry vocabulary". The top-`max(cutoffs)` types come off the
    * bounded-heap top-k operator (never a vocab-wide sort window);
    * everything after is a cutoffs×k cross of driver-bounded frames.
    * Ranks order by (count desc, token asc), exact-integer ppm. */
  /** Heaps-law vocabulary-growth curve: processing documents in id
    * order, the running token total and running distinct-type total
    * after each document — the empirical V(n) ≈ K·n^β curve that sizes
    * tokenizer vocabularies and detects corpus saturation (a flattening
    * tail means new data stops contributing types).
    *
    * A type counts as "new" in the smallest doc id containing it, so
    * cum_types needs no distinct-over-prefix: one (token → min doc)
    * aggregation turns it into an ordinary prefix sum, and both
    * cumulatives ride [[Analytics.distributedCumSum]] — no global-sort
    * window at any corpus size. Docs with zero tokens don't advance
    * either axis and are omitted. */
  def heapsCurve(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = df.select(col(idCol).as("doc_id"),
        explode(split(lower(trim(col(textCol))), "\\s+")).as("__tok"))
      .filter(length(col("__tok")) > 0)
    val perDoc = toks.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_tokens"))
    val firstDoc = toks.groupBy(col("__tok"))
      .agg(min(col("doc_id")).as("doc_id"))
      .groupBy(col("doc_id")).agg(count(lit(1)).as("n_new"))
    val joined = perDoc.join(firstDoc, Seq("doc_id"), "left")
      .withColumn("n_new", coalesce(col("n_new"), lit(0L)))
    Analytics.distributedCumSum(joined, "doc_id", Seq("n_tokens", "n_new"))
      .select(col("doc_id"), col("n_tokens"),
        col("cum_n_tokens").as("cum_tokens"),
        col("cum_n_new").as("cum_types"))
  }

  def vocabCoverage(df: DataFrame, textCol: String,
                    cutoffs: Seq[Int]): DataFrame = {
    require(cutoffs.nonEmpty && cutoffs.forall(_ >= 1),
      s"cutoffs must be positive, got $cutoffs")
    val tf = df.select(explode(split(lower(trim(col(textCol))), "\\s+"))
        .as("__tok"))
      .filter(length(col("__tok")) > 0)
      .groupBy(col("__tok")).agg(count(lit(1)).as("__cnt"))
    val tot = tf.agg(sum(col("__cnt")).as("total"),
      count(lit(1)).as("n_types"))
    val top = graft.plans.TopK.perKey(
      tf.withColumn("__g", lit(0)),
      Seq("__g"), Seq(("__cnt", false), ("__tok", true)), cutoffs.max)
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("__g"))
      .orderBy(col("__cnt").desc, col("__tok").asc)
    val ranked = top.withColumn("__r", row_number().over(w))
    val cuts = ranked.sparkSession.range(1)
      .select(explode(array(cutoffs.map(k => lit(k.toLong)): _*)).as("k"))
    ranked.crossJoin(broadcast(cuts))
      .groupBy(col("k"))
      .agg(coalesce(sum(when(col("__r") <= col("k"), col("__cnt"))), lit(0L))
        .as("covered"))
      .crossJoin(broadcast(tot))
      .select(col("k"), col("n_types"), col("total"), col("covered"),
        expr("covered * 1000000 div total").as("coverage_ppm"))
  }

  /** Hashing-trick vectorizer (Weinberger et al., ICML 2009): tokens
    * hash into a FIXED `dim`-bucket signed-count space — no vocabulary
    * table to build, broadcast, or keep consistent across batches,
    * which is the whole point at corpus scale: feature extraction
    * becomes a stateless per-row projection + one map-side-combined
    * aggregation, and any two clusters hash identically forever. The
    * sign bit (an independent hash) makes collisions cancel in
    * expectation instead of accumulating. Output is the sparse form
    * (id, feature, val), val = signed count — rows where signs fully
    * cancel are kept (the hashed vector's true coordinate is 0).
    * Both hashes ride the engine-portable 52-bit md5 ([[Sketch.kmvHash]]),
    * so the vectors replay bit-for-bit in any engine. */
  /** The (id, hashed word-bigram bucket) occurrence rows of a corpus —
    * the shared feature front of [[importanceWeights]]: whitespace
    * tokens (lower/trim, empties dropped), adjacent-pair bigrams built
    * ARRAY-SIDE (zip_with over two slices — no positional self-join,
    * so nothing shuffles until the consumer aggregates), each bigram
    * hashed to `buckets` buckets via the 52-bit md5 hash every
    * sampling-family oracle replays ([[Sketch.kmvHash]]). Documents
    * with < 2 tokens contribute no rows. */
  private def bigramBucketRows(df: DataFrame, idCol: String,
      textCol: String, buckets: Int): DataFrame =
    df.select(col(idCol),
        expr(s"filter(split(lower(trim($textCol)), '\\\\s+'), " +
          "t -> length(t) > 0)").as("__toks"))
      .select(col(idCol), explode(expr(
        "zip_with(slice(__toks, 1, greatest(size(__toks) - 1, 0)), " +
        "slice(__toks, 2, greatest(size(__toks) - 1, 0)), " +
        "(a, b) -> concat(a, ' ', b))")).as("__g"))
      .select(col(idCol),
        (Sketch.kmvHash(col("__g")) % buckets).as("__bkt"))

  /** DSIR-style IMPORTANCE WEIGHTS (Xie et al. 2023, "Data Selection
    * for Language Models via Importance Resampling"), integer variant:
    * score every SOURCE document by how target-like its hashed
    * word-bigram profile is, so the mixture tier can resample the raw
    * corpus toward a quality target — the principled upgrade to the
    * heuristic mix dials. Per bucket b of `buckets` hashed bigram
    * buckets, the add-one-smoothed importance ratio
    *   ratio_ppm(b) = (t_cnt(b) + 1) · 1e6 div (s_cnt(b) + 1)
    * (t/s = bigram occurrences in the target/source corpus); per
    * source document, weight_ppm = Σ_g ratio_ppm(bucket(g)) div
    * n_bigrams — the MEAN ratio over the document's bigram
    * occurrences; 1e6 ≈ "looks like the source average", higher =
    * more target-like. DOCUMENTED DIVERGENCE from the paper: DSIR
    * ranks by the log-likelihood ratio Σ_g (log p_target(g) −
    * log p_source(g)); this operator ranks by the mean LINEAR ratio
    * instead — no transcendental ever crosses the engine boundary, at
    * the cost of the log's outlier damping (one extreme bucket can
    * dominate a mean where it would only add a constant to a log sum)
    * — acceptable for RANKING a resampling pool, which is the DSIR
    * use. A document with no bigram (< 2 tokens) reports n_bigrams =
    * 0 and an honest NULL weight (no profile to score). Exactness
    * envelope: Σ_doc ratio ≤ n_bigrams · max_b ratio_ppm must fit
    * Int64 — with smoothing, ratio_ppm ≤ (T+1)·5e5 (T = total target
    * bigrams), so pathological single-hot-bucket corpora overflow
    * before balanced ones; at the default 8192 buckets a balanced
    * corpus has ratio_ppm ~ (T/S)·1e6 and the envelope is ~9e18 /
    * (doc bigrams · T/S) — shard the target if T/S exceeds ~1e6.
    * Output per source doc: doc_id (idCol's name), n_bigrams,
    * weight_ppm.
    *
    * Scale shape: bigrams build array-side (no positional join); the
    * bucket tallies are TWO map-side-combined aggregations onto ≤
    * `buckets` rows; the ratio attaches to source occurrences by a
    * broadcast-sized bucket join; the per-doc mean is one doc-keyed
    * aggregation; the final left join returns every source doc
    * exactly once. */
  def importanceWeights(source: DataFrame, target: DataFrame,
      idCol: String, textCol: String, buckets: Int = 8192): DataFrame = {
    require(buckets >= 2 && buckets <= 1048576,
      s"buckets must be in [2, 1048576], got $buckets")
    val srcRows = bigramBucketRows(source, idCol, textCol, buckets)
    val tCnt = bigramBucketRows(target, idCol, textCol, buckets)
      .groupBy(col("__bkt")).agg(count(lit(1)).as("__t"))
    val sCnt = srcRows.groupBy(col("__bkt")).agg(count(lit(1)).as("__s"))
    val ratio = sCnt.join(tCnt, Seq("__bkt"), "left")
      .select(col("__bkt"),
        expr("(coalesce(__t, 0L) + 1L) * 1000000L div (__s + 1L)")
          .as("__r"))
    val perDoc = srcRows.join(ratio, Seq("__bkt"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_bigrams"),
        expr("sum(__r) div count(1)").as("weight_ppm"))
    source.select(col(idCol)).distinct()
      .join(perDoc, Seq(idCol), "left")
      .select(col(idCol), coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        col("weight_ppm"))
  }

  def featureHash(df: DataFrame, idCol: String, textCol: String,
                  dim: Int = 64): DataFrame = {
    require(dim >= 2, s"dim must be >= 2, got $dim")
    val toks = df.select(col(idCol),
        explode(split(lower(trim(col(textCol))), "\\s+")).as("__tok"))
      .filter(length(col("__tok")) > 0)
    toks.select(col(idCol),
        (Sketch.kmvHash(col("__tok")) % dim).as("feature"),
        when(Sketch.kmvHash(concat(lit("sign:"), col("__tok"))) % 2 === 0,
          lit(1L)).otherwise(lit(-1L)).as("__s"))
      .groupBy(col(idCol), col("feature"))
      .agg(sum(col("__s")).as("val"))
  }
}
