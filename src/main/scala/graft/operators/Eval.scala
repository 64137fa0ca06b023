package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Retrieval-quality evaluation over ranked candidate lists — the
  * measurement half of the ANN tier. The search operators
  * ([[Similarity]], [[Ivf]], [[Pq]]) produce rankings; these operators
  * score them: recall of an approximate/compressed ranking against the
  * exact one, and reciprocal rank + precision against a relevance
  * label. Mirrors the reference's validator posture (compute the
  * quality number next to the data, don't export and re-join —
  * rustic-witcher keeps validation inside the engine,
  * data_anonymization/src/spark_data_validator.rs).
  *
  * All metrics are exact-integer ppm (`x * 1000000 div y`), so results
  * replay bit-for-bit in any engine. Scale shape: every input here is
  * queries×k rows — the corpus-sized work already happened inside the
  * search operator — so these joins and aggregations are trivially
  * broadcastable at any corpus scale; nothing below re-touches corpus
  * data.
  */
object Eval {

  /** Recall@k of an approximate ranking against the exact one, per
    * query: `|approx top-k ∩ exact top-k| / |exact top-k|` in ppm.
    * Both inputs carry (query_id, corpus_id, rank) as produced by the
    * search tier. The denominator is the exact list's size (= k unless
    * the corpus is smaller), so a query with fewer than k true
    * neighbors is not penalized for the shortfall. */
  def recallAtK(approx: DataFrame, exact: DataFrame, k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val e = exact.filter(col("rank") <= k)
      .select(col("query_id"), col("corpus_id"))
    val a = approx.filter(col("rank") <= k)
      .select(col("query_id"), col("corpus_id"))
    val den = e.groupBy(col("query_id")).agg(count(lit(1)).as("n_exact"))
    val hits = e.join(a, Seq("query_id", "corpus_id"), "left_semi")
      .groupBy(col("query_id")).agg(count(lit(1)).as("n_hits"))
    den.join(hits, Seq("query_id"), "left")
      .select(col("query_id"),
        coalesce(col("n_hits"), lit(0L)).as("n_hits"),
        col("n_exact"),
        expr("coalesce(n_hits, 0) * 1000000 div n_exact").as("recall_ppm"))
  }

  /** Reciprocal-rank fusion (Cormack, Clarke & Büttcher, SIGIR 2009):
    * combine N per-query rankings into one by summing 1/(k + rank) —
    * the standard hybrid-retrieval merge (lexical + dense lists fuse
    * without score calibration because only RANKS enter). Scores are
    * exact-integer `1000000 div (k + rank)` so fusion replays
    * bit-for-bit; final order (rrf_score desc, corpus_id asc) is
    * total. Inputs and output are queries×k-sized — corpus work
    * happened inside the search operators. */
  def rrfFuse(rankings: Seq[org.apache.spark.sql.DataFrame], k: Int = 60,
              topK: Int = 10): org.apache.spark.sql.DataFrame = {
    require(rankings.nonEmpty, "rrfFuse needs at least one ranking")
    require(k >= 0 && topK >= 1, s"bad k=$k topK=$topK")
    val scored = rankings.map(_.select(col("query_id"), col("corpus_id"),
        expr(s"1000000 div ($k + rank)").as("__s")))
      .reduce(_ unionByName _)
      .groupBy(col("query_id"), col("corpus_id"))
      .agg(sum(col("__s")).as("rrf_score"), count(lit(1)).as("n_lists"))
    val top = graft.plans.TopK.perKey(scored, Seq("query_id"),
      Seq(("rrf_score", false), ("corpus_id", true)), topK)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id"))
      .orderBy(col("rrf_score").desc, col("corpus_id").asc)
    top.withColumn("rank", row_number().over(w))
  }

  /** Reciprocal rank and precision@k of a ranked list against a
    * boolean relevance column: per query, the rank of the FIRST
    * relevant hit (NULL when none land in the top k — rr_ppm then 0,
    * the standard MRR convention), the relevant count, and
    * precision@k, all in exact ppm. */
  def rankingQuality(ranked: DataFrame, relCol: String, k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    ranked.filter(col("rank") <= k)
      .groupBy(col("query_id"))
      .agg(min(when(col(relCol), col("rank"))).cast("long")
          .as("first_rel_rank"),
        count(when(col(relCol), 1)).as("n_rel"))
      .select(col("query_id"), col("first_rel_rank"),
        coalesce(expr("1000000 div first_rel_rank"), lit(0L)).as("rr_ppm"),
        col("n_rel"),
        expr(s"n_rel * 1000000 div $k").as("precision_ppm"))
  }

  /** The baked integer discount weights of [[ndcgAtK]]:
    * w_i = round(1e6 / log2(i+1)) for positions 1..k. Computed ONCE
    * here and embedded as literals in both the Spark plan and the
    * oracle SQL (the DP-cutpoint discipline) — the transcendental
    * log2 never crosses the engine boundary, so nDCG stays
    * exact-integer and replays bit-for-bit. */
  def ndcgWeights(k: Int): Seq[Long] =
    (1 to k).map(i =>
      math.round(1000000.0 / (math.log(i + 1.0) / math.log(2.0))))

  /** nDCG@k over a ranked list with GRADED integer relevance — the
    * standard ranking-quality metric next to [[rankingQuality]]'s
    * MRR/precision (Järvelin & Kekäläinen 2002), in exact ppm:
    * DCG = Σ rel_i·w(rank_i), IDCG = the same weights against the
    * query's relevances re-sorted descending (the ideal ordering),
    * ndcg = DCG/IDCG — with w the BAKED integer discounts of
    * [[ndcgWeights]], so no float ever enters. The all-irrelevant
    * query (IDCG = 0) reports 0 by convention. The ppm finish
    * self-switches on overflow (the HHI CASE, identical in the
    * oracle), so graded relevance of any magnitude stays in Int64.
    * Input: (query_id, rank, relCol) — a search-tier ranking joined
    * to labels. Output: query_id, n_ranked, dcg_scaled, idcg_scaled,
    * ndcg_ppm.
    *
    * Scale shape: inputs are queries×k rows (the corpus-sized work
    * happened in the search operator); the ideal re-sort is a
    * per-query window over ≤ k rows; one map-side-combined groupBy
    * finishes. */
  def ndcgAtK(ranked: DataFrame, relCol: String, k: Int): DataFrame = {
    require(k >= 1 && k <= 10000, s"k must be in [1, 10000], got $k")
    import org.apache.spark.sql.expressions.Window
    val wArr = array(ndcgWeights(k).map(lit): _*)
    val iw = Window.partitionBy(col("query_id"))
      .orderBy(col("__rel").desc, col("rank").asc)
    ranked.filter(col("rank") <= k)
      .withColumn("__rel", col(relCol).cast("long"))
      // LOUD rank contract (the bounded-contract discipline): a rank
      // < 1 would silently index the weight array FROM THE END
      // (element_at's negative-index semantics) — a wrong DCG with no
      // error — so malformed input fails the job instead
      .withColumn("__w", guardRankGe1("ndcgAtK",
        element_at(wArr, col("rank").cast("int"))))
      .withColumn("__iw", element_at(wArr, row_number().over(iw)))
      .groupBy(col("query_id"))
      .agg(count(lit(1)).as("n_ranked"),
        count_distinct(col("rank")).as("__nd"),
        sum(col("__rel") * col("__w")).as("dcg_scaled"),
        sum(col("__rel") * col("__iw")).as("idcg_scaled"))
      // duplicate ranks within a query would double-count position
      // weights undetected — same loud failure, caught on the
      // queries×k aggregate (one integer compare per query)
      .withColumn("ndcg_ppm",
        when(col("__nd") =!= col("n_ranked"), raise_error(concat(
          lit("ndcgAtK: duplicate ranks within query_id "),
          col("query_id").cast("string"),
          lit(" — position weights would double-count; fix the " +
            "upstream ranking"))))
        .otherwise(expr(
          "CASE WHEN idcg_scaled <= 0 THEN 0L " +
          "WHEN dcg_scaled <= 9000000000000L THEN " +
          "dcg_scaled * 1000000L div idcg_scaled " +
          "ELSE (dcg_scaled div idcg_scaled) * 1000000L + " +
          "(dcg_scaled % idcg_scaled) div " +
          "greatest(idcg_scaled div 1000000L, 1L) END")))
      .drop("__nd")
  }

  /** The shared loud rank guard of [[ndcgAtK]] and
    * [[averagePrecisionAtK]]: pass `value` through when rank ≥ 1, fail
    * the job with a named error otherwise (a malformed upstream ranking
    * must never silently mis-weight). */
  private def guardRankGe1(op: String,
      value: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    when(col("rank") >= 1, value).otherwise(raise_error(concat(
      lit(s"$op: rank must be >= 1, got "), col("rank").cast("string"),
      lit(" — fix the upstream ranking"))))

  /** Average precision @k per query (the per-query half of Mean Average
    * Precision, the standard rank-weighted retrieval metric next to
    * [[rankingQuality]]'s MRR/precision and [[ndcgAtK]]): AP =
    * (Σ over relevant hits at rank r of precision@r) / n_rel, with
    * n_rel the relevant count INSIDE the top k (the AP@k convention —
    * the audit grades the list it can see) — in exact ppm, all-integer
    * (precision@r = cum_rel(r)·1e6 div r; AP = Σ div n_rel — no
    * transcendental, so no baked-literal machinery needed). A query
    * with no relevant hit in the top k reports 0, matching the MRR
    * convention. Mean over queries = MAP, one trivial avg downstream.
    * Shares [[ndcgAtK]]'s loud rank contract: rank < 1 or duplicate
    * ranks within a query fail the job instead of mis-scoring.
    * Input: (query_id, rank, relCol boolean). Output: query_id,
    * n_ranked, n_rel, ap_ppm.
    *
    * Scale shape: inputs are queries×k rows; the cumulative-hit window
    * is per-query over ≤ k rows; one map-side-combined groupBy
    * finishes. */
  def averagePrecisionAtK(ranked: DataFrame, relCol: String,
      k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("query_id")).orderBy(col("rank").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ranked.filter(col("rank") <= k)
      .withColumn("__r", guardRankGe1("averagePrecisionAtK",
        when(col(relCol), 1L).otherwise(0L)))
      .withColumn("__cum", sum(col("__r")).over(w))
      .groupBy(col("query_id"))
      .agg(count(lit(1)).as("n_ranked"),
        count_distinct(col("rank")).as("__nd"),
        sum(col("__r")).as("n_rel"),
        // cum ≤ k and rank ≤ k, so the ppm product is ≤ k·1e6 — no
        // overflow split needed at any sane k
        sum(when(col("__r") === 1L, expr("__cum * 1000000L div rank")))
          .as("__psum"))
      .withColumn("ap_ppm",
        when(col("__nd") =!= col("n_ranked"), raise_error(concat(
          lit("averagePrecisionAtK: duplicate ranks within query_id "),
          col("query_id").cast("string"),
          lit(" — precision@r would mis-count; fix the upstream " +
            "ranking"))))
        .when(col("n_rel") === 0, lit(0L))
        .otherwise(expr("__psum div n_rel")))
      .select(col("query_id"), col("n_ranked"), col("n_rel"), col("ap_ppm"))
  }

  /** Kendall rank correlation (tau-a numerator over the matched items)
    * between TWO rankings of the same per-query candidate sets — "do
    * the approximate and exact rankings ORDER the corpus the same
    * way", a strictly finer agreement read than [[recallAtK]]'s set
    * overlap (two rankings can share every item and still invert every
    * pair). Per query over the items PRESENT IN BOTH top-k lists
    * (inner join — an item one ranking missed has no pair order to
    * compare; recall measures that miss): C − D = Σ over item pairs of
    * sign((ra_x − ra_y)·(rb_x − rb_y)), tau = (C − D)/(m(m−1)/2). All
    * exact integers; tau_ppm keeps Spark's truncate-toward-zero and
    * DuckDB's floor identical by dividing the MAGNITUDE and re-applying
    * the sign (the Kruskal–Wallis negative-numerator lesson). Rankings
    * are row_number-style (ties impossible within a query); a tied
    * pair would contribute 0, per tau-a. Single-item overlap (m ≤ 1)
    * reports tau 0. Output: query_id, n_items, cd (= C − D), tau_ppm.
    *
    * Scale shape: inputs are queries×k rows; the pair frame is the
    * per-query self-join — queries×k² rows bounded by the k knob, the
    * same budget as one extra ranking pass; one map-side-combined
    * groupBy finishes. */
  def kendallTau(rankedA: DataFrame, rankedB: DataFrame, k: Int): DataFrame = {
    require(k >= 1 && k <= 1000, s"k must be in [1, 1000], got $k")
    val a = rankedA.filter(col("rank") <= k).select(col("query_id"),
      col("corpus_id"), col("rank").cast("long").as("__ra"))
    val b = rankedB.filter(col("rank") <= k).select(col("query_id"),
      col("corpus_id"), col("rank").cast("long").as("__rb"))
    val j = a.join(b, Seq("query_id", "corpus_id"))
    val m = j.groupBy(col("query_id")).agg(count(lit(1)).as("n_items"))
    val x = j.select(col("query_id"), col("corpus_id").as("__ca"),
      col("__ra").as("__rax"), col("__rb").as("__rbx"))
    val y = j.select(col("query_id"), col("corpus_id").as("__cb"),
      col("__ra").as("__ray"), col("__rb").as("__rby"))
    val cd = x.join(y, Seq("query_id")).filter(col("__ca") < col("__cb"))
      .select(col("query_id"),
        signum((col("__rax") - col("__ray")) * (col("__rbx") - col("__rby")))
          .cast("long").as("__s"))
      .groupBy(col("query_id"))
      .agg(sum(col("__s")).as("cd"))
    m.join(cd, Seq("query_id"), "left")
      .select(col("query_id"), col("n_items"),
        coalesce(col("cd"), lit(0L)).as("cd"))
      .withColumn("tau_ppm", expr(
        "CASE WHEN n_items < 2 THEN 0L " +
        "WHEN cd >= 0 THEN cd * 1000000L div (n_items * (n_items - 1) div 2) " +
        "ELSE -((-cd) * 1000000L div (n_items * (n_items - 1) div 2)) " +
        "END"))
  }

  /** KMV cardinality-sketch error report: per group, the k-minimum-
    * values estimate next to the exact distinct count and the relative
    * error in ppm — the accuracy audit run before trusting sketch
    * roll-ups as the serving path. The exact side is one
    * map-side-combined distinct count; the sketch side is [[Sketch.kmv]]
    * (bounded-heap top-k, never a global sort). */
  def kmvCardinalityError(df: DataFrame, groupCols: Seq[String],
                          valueCol: String, k: Int): DataFrame = {
    val est = Sketch.kmv(df, groupCols, valueCol, k)
      .select(groupCols.map(col) :+
        Sketch.kmvEstimate(col("sketch"), k).as("n_est"): _*)
    val exact = df.groupBy(groupCols.map(col): _*)
      .agg(countDistinct(col(valueCol)).as("n_exact"))
    est.join(exact, groupCols)
      .withColumn("err_ppm", expr(
        "CASE WHEN n_exact > 0 " +
        "THEN abs(n_est - n_exact) * 1000000L div n_exact END"))
  }

  /** Quantile-sketch RANK-error report: for p50/p90, how many corpus
    * rows actually fall at or below the sketch's estimate vs the true
    * target rank, and the gap as a share of n — rank error is the
    * quantity sketch guarantees (KLL/GK-style bounds are rank bounds),
    * and unlike value error it stays exact-integer. Target ranks use
    * integer formulas (ceil(n/2), ceil(9n/10)) so no float multiply
    * sits near a boundary. The estimate row per group is tiny and
    * equi-joins back onto the corpus (AQE broadcasts it). */
  def quantileSketchRankError(df: DataFrame, groupCol: String,
                              valueCol: String, idCol: String,
                              k: Int): DataFrame = {
    val est = Sketch.quantileSketch(df, Seq(groupCol), valueCol, idCol, k)
      .select(col(groupCol),
        round(Sketch.quantileEstimate(col("qsketch"), 0.5), 6).as("__e50"),
        round(Sketch.quantileEstimate(col("qsketch"), 0.9), 6).as("__e90"))
    df.select(col(groupCol), col(valueCol))
      .join(est, Seq(groupCol))
      .groupBy(col(groupCol))
      .agg(count(lit(1)).as("n"),
        count(when(col(valueCol) <= col("__e50"), 1)).as("rank_est_p50"),
        count(when(col(valueCol) <= col("__e90"), 1)).as("rank_est_p90"))
      .select(col(groupCol), col("n"),
        expr("(n + 1) div 2").as("rank_exact_p50"),
        col("rank_est_p50"),
        expr("abs(rank_est_p50 - (n + 1) div 2) * 1000000L div n")
          .as("err_p50_ppm"),
        expr("(n * 9 + 9) div 10").as("rank_exact_p90"),
        col("rank_est_p90"),
        expr("abs(rank_est_p90 - (n * 9 + 9) div 10) * 1000000L div n")
          .as("err_p90_ppm"))
  }

  /** Cohen's kappa (Cohen 1960) between two categorical columns —
    * chance-corrected agreement, the standard inter-annotator /
    * detector-vs-label metric. One row: n, the diagonal, observed and
    * expected agreement, and kappa, all exact-integer ppm:
    * `kappa_ppm = (diag·n − Σ_c rt_c·ct_c) · 1e6 div (n² − Σ rt·ct)`
    * (0 when the denominator vanishes — the single-class degenerate
    * case where kappa is undefined). Exactness bound: n²·1e6 must fit
    * a BIGINT, so evaluate on slices of ≤ ~3e6 rows (eval sets are
    * sampled anyway; shard bigger ones and pool the confusion counts).
    *
    * Scale shape: one (a, b) pair-count aggregation (map-side
    * combined, |domain|² rows), then class-marginal roll-ups and two
    * single-row attaches — everything after the first shuffle is
    * domain-sized. */
  def cohensKappa(pairs: DataFrame, aCol: String, bCol: String): DataFrame = {
    val cm = pairs.groupBy(col(aCol).as("__a"), col(bCol).as("__b"))
      .agg(count(lit(1)).as("__n"))
    val tot = cm.agg(sum(col("__n")).as("n_total"),
      sum(when(col("__a") === col("__b"), col("__n")).otherwise(0L))
        .as("diag"))
    val rt = cm.groupBy(col("__a").as("__cls")).agg(sum(col("__n")).as("__rt"))
    val ct = cm.groupBy(col("__b").as("__cls")).agg(sum(col("__n")).as("__ct"))
    val pe = rt.join(ct, Seq("__cls"))
      .agg(coalesce(sum(expr("__rt * __ct")), lit(0L)).as("pe_num"))
    tot.crossJoin(broadcast(pe))
      .select(col("n_total"), col("diag"),
        expr("diag * 1000000L div n_total").as("po_ppm"),
        expr("pe_num * 1000000L div (n_total * n_total)").as("pe_ppm"),
        expr("CASE WHEN n_total * n_total = pe_num THEN 0L " +
          "ELSE (diag * n_total - pe_num) * 1000000L " +
          "div (n_total * n_total - pe_num) END").as("kappa_ppm"))
  }
}
