package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distribution-shape operators: equi-width histograms and robust
  * (median/MAD) outlier detection. Both are exact and engine-portable
  * by construction — bin assignment is pure integer arithmetic and the
  * MAD tier reuses the interpolated-percentile contract lengthStats
  * established (round-6 on reported floats, comparisons on raw ones).
  */
object Stats {

  /** Exact equi-width histogram over a 2-decimal numeric column.
    *
    * The column is scaled to integer cents (the dsum convention), the
    * [min, max] span is split into `nBins` equal integer ranges, and
    * bin assignment is `(xc − lo)·nBins div span` — closed-form integer
    * math, so every engine puts every row in the same bin (a float
    * `floor((x−lo)/w)` flips bins at representation boundaries).
    * Per-bin output: count plus the observed value range.
    *
    * Scale shape: one min/max aggregate (single row, broadcast back —
    * the BM25 stats pattern) then one map-side-combined groupBy with at
    * most `nBins` groups. Two linear passes, no sort, no window. The
    * data-dependent bounds are the point: a 100 TB scan gets a
    * histogram without anyone guessing the domain first. */
  def histogram(df: DataFrame, valueCol: String, nBins: Int): DataFrame = {
    require(nBins >= 1, s"nBins must be positive, got $nBins")
    val cents = df.select(
      expr(s"CAST(round($valueCol * 100) AS BIGINT)").as("__xc"),
      col(valueCol).cast("double").as("__v"))
    val bounds = cents.agg(min(col("__xc")).as("__lo"),
      max(col("__xc")).as("__hi"))
    cents.crossJoin(broadcast(bounds))
      .select(
        expr(s"(__xc - __lo) * $nBins div (__hi - __lo + 1)").as("bin"),
        col("__v"))
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("n"),
        min(col("__v")).as("bin_min"),
        max(col("__v")).as("bin_max"))
  }

  /** Per-group winsorization — clip values into the [pLo, pHi]
    * percentile band, the standard robust pre-processing step before
    * any mean-based statistic meets heavy tails (Tukey; Dixon 1960).
    *
    * Bounds are EXACT ORDER STATISTICS, not interpolated quantiles:
    * the clip value at rank ceil(p·n) under the (value, tie) total
    * order is an actual data value, so the clipped column contains
    * only values that exist in the input — no interpolation float to
    * disagree about across engines (interpolated quantile_cont formula
    * order differs engine-to-engine in the last ulp; an order
    * statistic cannot).
    *
    * Scale shape: ONE exchange on the group key — rank, count, and
    * both boundary lookups are windows over the same partitioning,
    * and the clip is a projection. */
  def winsorize(df: DataFrame, groupCol: String, valueCol: String,
                tieCol: String, pLo: Double, pHi: Double): DataFrame = {
    require(pLo >= 0 && pHi <= 1 && pLo < pHi, s"bad band [$pLo, $pHi]")
    // bucketed two-phase rank (per-value-type clipping groups are FEW
    // and huge — the low-cardinality regime, see
    // Analytics.bucketedGroupRank); the order-statistic clip bounds
    // reduce to a one-row-per-group aggregate that broadcast-joins
    // back for the clip projection
    val cols = df.columns
    val ranked = Analytics.bucketedGroupRank(df, groupCol, valueCol,
      Seq(tieCol))
    val bounds = ranked.groupBy(col(groupCol)).agg(
      max(when(col("__rank") === greatest(lit(1L),
        ceil(lit(pLo) * col("__gn"))), col(valueCol))).as("__lo"),
      max(when(col("__rank") === ceil(lit(pHi) * col("__gn")),
        col(valueCol))).as("__hi"))
    ranked.join(broadcast(bounds), Seq(groupCol))
      .withColumn("v_clip",
        least(greatest(col(valueCol), col("__lo")), col("__hi")))
      .select((cols.map(col) :+ col("v_clip")): _*)
  }

  /** 2-D skyline (Pareto frontier, maximize both axes; Börzsönyi et
    * al. 2001, "The Skyline Operator"): rows not strictly dominated —
    * no other row is ≥ on both axes and > on at least one. Exact
    * duplicates of a frontier point all survive (neither dominates).
    *
    * The skyline is DISTRIBUTIVE — skyline(S) = skyline(∪ skyline(Pᵢ))
    * — which is the whole 100 TB design: a single global
    * sort-and-scan window would serialize the corpus through one
    * partition. Stages:
    *   1. per x-value max(y) (map-side combined; |distinct x| rows);
    *   2. per-BUCKET closed-form frontier (sort by x desc inside the
    *      bucket, keep rows whose y beats the running strict-prefix
    *      max) — drops only dominated points, so it is sound for any
    *      bucketing; bucketing BY x-range makes it effective;
    *   3. the same closed form once more over the (small) union of
    *      bucket frontiers, single partition;
    *   4. join the surviving (x, y) frontier back to the input to emit
    *      every tying original row.
    * Dominance is transitive, so a dominated point always has a
    * SURVIVING dominator — stages 2/3 never lose a frontier point. */
  def skyline(df: DataFrame, xCol: String, yCol: String,
              buckets: Int = 64): DataFrame = {
    require(buckets >= 1)
    import org.apache.spark.sql.expressions.Window
    val gx = df.groupBy(col(xCol).as("__x"))
      .agg(max(col(yCol)).as("__y"))
    // bucket by x rank-range via the min/max broadcast (histogram
    // pattern); any tie-up of bucket boundaries only costs prune
    // EFFECTIVENESS, never correctness, so double arithmetic is fine
    val bounds = gx.agg(min(col("__x")).as("__lo"), max(col("__x")).as("__hi"))
    val bucketed = gx.crossJoin(broadcast(bounds))
      .withColumn("__b",
        when(col("__hi") === col("__lo"), lit(0))
          .otherwise(least(lit(buckets - 1), floor(
            (col("__x") - col("__lo")) / (col("__hi") - col("__lo")) *
              buckets).cast("int"))))
    def frontier(in: DataFrame, part: Seq[String]): DataFrame = {
      val w = Window.partitionBy(part.map(col): _*)
        .orderBy(col("__x").desc)
        .rowsBetween(Window.unboundedPreceding, -1)
      in.withColumn("__pm", max(col("__y")).over(w))
        .filter(col("__pm").isNull || col("__y") > col("__pm"))
        .drop("__pm")
    }
    val local = frontier(bucketed, Seq("__b"))
    val global = frontier(local.withColumn("__g", lit(0)), Seq("__g"))
      .select(col("__x"), col("__y"))
    df.join(broadcast(global),
      col(xCol) === col("__x") && col(yCol) === col("__y"))
      .drop("__x", "__y")
  }

  /** Robust per-group outlier summary by median/MAD (Hampel's rule;
    * Leys et al. 2013 recommend it over mean/σ exactly because the
    * outliers being hunted poison the mean). A value is flagged when
    * |x − median| > z·1.4826·MAD (1.4826 scales MAD to σ under
    * normality). Output per group: n, n_outliers, med/mad rounded to 6
    * (the cross-engine float-report convention).
    *
    * Scale shape: ONE exchange. Both medians ride the same
    * partition-by-group window (median, then MAD over the derived
    * deviations — the second window reuses the first's partitioning,
    * so Spark plans one shuffle and two in-partition passes), and the
    * flag count folds into a final partial-combined groupBy on keys
    * that are already co-located — no second exchange there either.
    * Exact per-group percentile buffering is the honest cost of exact
    * medians and fine for bounded group cardinality (event types,
    * sources); swap percentile → approx_percentile for the
    * free-cardinality tier, as in lengthStats. */
  def madOutliers(df: DataFrame, groupCol: String, valueCol: String,
                  z: Double = 3.0): DataFrame = {
    require(z > 0, s"z must be positive, got $z")
    val wg = org.apache.spark.sql.expressions.Window.partitionBy(col(groupCol))
    df
      .withColumn("__med", expr(s"percentile($valueCol, 0.5D)").over(wg))
      .withColumn("__dev", abs(col(valueCol).cast("double") - col("__med")))
      .withColumn("__mad", expr("percentile(__dev, 0.5D)").over(wg))
      .groupBy(col(groupCol))
      .agg(
        count(lit(1)).as("n"),
        count(when(col("__dev") > lit(z) * lit(1.4826) * col("__mad"), 1))
          .as("n_outliers"),
        round(min(col("__med")), 6).as("med"),
        round(min(col("__mad")), 6).as("mad"))
  }

  /** CUSUM drift detection over an ordered count series, all-integer:
    * dev_i = n_i·1e6 − floor(total·1e6/days), cusum = running sum of
    * dev. The two global stats ride a single-row broadcast (the BM25
    * crossJoin pattern, bnljAllowed); the running window orders the
    * ALREADY-AGGREGATED series — one row per day — so the global
    * ordering is bounded by the series length, not the input rows. */
  def cusumDaily(counts: DataFrame, idxCol: String, nCol: String): DataFrame = {
    val tot = counts.agg(sum(col(nCol)).as("__total"),
      count(lit(1)).as("__days"))
    val w = org.apache.spark.sql.expressions.Window.orderBy(col(idxCol).asc)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    counts.crossJoin(broadcast(tot))
      .withColumn("__dev",
        col(nCol) * lit(1000000L) - expr("__total * 1000000 div __days"))
      .select(col(idxCol), col(nCol),
        sum(col("__dev")).over(w).cast("long").as("cusum_ppm"))
  }

  /** Rank-percentile (quantile) normalization within groups: ppm of
    * (rank−1)/(cnt−1) under the (value, tie) total order — the
    * cross-source score-leveling step before mixing corpora whose raw
    * quality scores live on different scales. Both windows share the
    * group partitioning: one exchange. */
  def quantileNormalize(df: DataFrame, groupCol: String, valCol: String,
      tieCol: String): DataFrame =
    // (valCol, tieCol) is a TOTAL order (tieCol unique), so the rank
    // here is a row number — the bucketed two-phase rank is a drop-in.
    // Cross-source normalization groups are few and corpus-huge (the
    // low-cardinality regime, see Analytics.bucketedGroupRank); the
    // previous per-group window serialized each source into one task.
    Analytics.bucketedGroupRank(
        df.select(col(tieCol), col(groupCol), col(valCol)),
        groupCol, valCol, Seq(tieCol))
      .select(col(tieCol), col(groupCol), col(valCol),
        expr("(__rank - 1) * 1000000 div (__gn - 1)").as("pct_ppm"))

  /** Leave-one-out target encoding: each row's category is replaced by
    * the mean target of the OTHER rows in its category — the standard
    * leakage guard for categorical ML features, exact in integer
    * arithmetic ((sum − own) div (n − 1)). Category stats are one
    * groupBy over a low-cardinality dimension, broadcast back; rows in
    * singleton categories encode to NULL (no peers to average). */
  def targetEncodeLoo(df: DataFrame, catCol: String, targetCol: String,
      keyCol: String): DataFrame = {
    val g = df.groupBy(col(catCol))
      .agg(sum(col(targetCol)).as("__s"), count(lit(1)).as("__n"))
    df.join(broadcast(g), catCol)
      .select(col(keyCol), col(catCol),
        expr(s"CASE WHEN __n > 1 THEN (__s - $targetCol) div (__n - 1) END")
          .as("loo_cents"))
  }

  /** RFM (recency / frequency / monetary) segmentation — the classic
    * customer-value scoring, quintiles taken WITHIN each dimension
    * segment so no global single-partition sort exists at any input
    * size (scores are segment-relative by design; the global variant
    * is q_ntile's precedent). Recency anchors on the corpus max date —
    * a single-row broadcast (bnljAllowed). All-integer: day diffs,
    * counts, cents, and ntile ranks under (measure, key) total orders.
    * `dims` carries (keyCol, segCol). */
  def rfmScores(txns: DataFrame, keyCol: String, dateCol: String,
      centsCol: String, dims: DataFrame, segCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val per = txns.groupBy(col(keyCol))
      .agg(max(col(dateCol)).as("__last_d"),
        count(lit(1)).as("f"), sum(col(centsCol)).as("m_cents"))
    val g = per.agg(max(col("__last_d")).as("__maxd"))
    val j = per.crossJoin(broadcast(g))
      .withColumn("rec", datediff(col("__maxd"), col("__last_d")).cast("long"))
      .join(dims, keyCol)
    def q(orderKeys: org.apache.spark.sql.Column*) =
      ntile(5).over(Window.partitionBy(col(segCol)).orderBy(orderKeys: _*))
        .cast("long")
    j.select(col(keyCol), col(segCol), col("rec"), col("f"), col("m_cents"),
      (q(col("rec").asc, col(keyCol).asc) * 100 +
        q(col("f").desc, col(keyCol).asc) * 10 +
        q(col("m_cents").desc, col(keyCol).asc)).as("rfm"))
  }

  /** Spearman rank correlation per group, in exact integer ppm:
    * ρ = 1 − 6·Σd²/(n(n²−1)) over ranks under (value, key) total
    * orders (the deterministic tie policy — classic midrank ties would
    * reintroduce float averages). One exchange: both rank windows and
    * the count share the group partitioning.
    *
    * Integer bound: 6e6·Σd² must stay under 2^63; Σd² < n³/3 caps the
    * per-group size around 16k rows at ppm scale — right for segment/
    * nation-sized groups; scale the ppm factor down for larger ones. */
  def spearmanPpm(df: DataFrame, groupCol: String, xCol: String,
      yCol: String, keyCol: String): DataFrame = {
    // two independent rank passes via the bucketed two-phase rank
    // (correlation groups are typically FEW and huge — the
    // low-cardinality regime, see Analytics.bucketedGroupRank; a plain
    // per-group window would serialize each group into one task),
    // re-joined on the row key
    def ranks(c: String, as: String) =
      Analytics.bucketedGroupRank(
          df.select(col(groupCol), col(c), col(keyCol)),
          groupCol, c, Seq(keyCol))
        .select(col(groupCol), col(keyCol), col("__rank").as(as))
    ranks(xCol, "__ra").join(ranks(yCol, "__rb"), Seq(groupCol, keyCol))
      .groupBy(col(groupCol))
      .agg(count(lit(1)).as("n"),
        sum((col("__ra") - col("__rb")) * (col("__ra") - col("__rb")))
          .as("__d2"))
      .select(col(groupCol), col("n"),
        expr("1000000L - (6000000L * __d2) div (n * (n * n - 1))")
          .as("rho_ppm"))
  }

  /** Exact per-group mode with the deterministic (count desc, value
    * asc) tie-break — two key-partitioned aggregations, never a
    * per-group value buffer. */
  def modePerGroup(df: DataFrame, groupCol: String, valCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val counts = df.groupBy(col(groupCol), col(valCol))
      .agg(count(lit(1)).as("n"))
    val w = Window.partitionBy(col(groupCol))
      .orderBy(col("n").desc, col(valCol).asc)
    counts.withColumn("__rk", rank().over(w)).filter(col("__rk") === 1)
      .select(col(groupCol), col(valCol).as("mode_value"), col("n"))
  }

  /** Distribution-drift monitor: total-variation distance (exact ppm)
    * between two cohorts' value distributions per group, over
    * equal-width integer-cents bins (the PSI use case without its
    * float log). Bin bounds ride the histogram pattern's single-row
    * broadcast; everything after is two bounded aggregations — the
    * report is |groups|·|bins| at most, never corpus-sized. */
  def distributionDrift(df: DataFrame, groupCol: String, centsCol: String,
      cohortCol: String, nBins: Int): DataFrame = {
    require(nBins >= 1, s"nBins must be positive, got $nBins")
    val c = df.select(col(groupCol), col(centsCol).as("__xc"),
      col(cohortCol).as("__h"))
    val bounds = c.agg(min(col("__xc")).as("__lo"), max(col("__xc")).as("__hi"))
    val counts = c.crossJoin(broadcast(bounds))
      .select(col(groupCol), col("__h"),
        expr(s"(__xc - __lo) * $nBins div (__hi - __lo + 1)").as("__bin"))
      .groupBy(col(groupCol), col("__bin"))
      .agg(sum(when(col("__h") === 0, 1L).otherwise(0L)).as("__n0"),
        sum(when(col("__h") === 1, 1L).otherwise(0L)).as("__n1"))
    val tots = counts.groupBy(col(groupCol))
      .agg(sum(col("__n0")).as("__t0"), sum(col("__n1")).as("__t1"))
    counts.join(tots, groupCol)
      .withColumn("__d", abs(expr("__n0 * 1000000 div __t0") -
        expr("__n1 * 1000000 div __t1")))
      .groupBy(col(groupCol))
      .agg(expr("sum(__d) div 2").cast("long").as("tv_ppm"))
  }

  /** Weighted quartiles of an integer-cents value: the smallest value
    * whose cumulative WEIGHT reaches 25/50/75% of the total (lower
    * weighted quantile — `4·cum ≥ q·total` in pure integer compares).
    * The weighted median is the robust center when rows carry unequal
    * mass (revenue-weighted price, token-weighted doc score).
    *
    * Scale shape: the prefix weights ride
    * [[Analytics.distributedCumSum]] — NO global-sort window at any
    * size (only the ≤64-row bucket-prefix frame) — then one single-row
    * total attach and one map-side-combined conditional-min aggregate.
    * (tieCols must totalize the value order, same contract as the
    * cumsum.) */
  def weightedQuartiles(df: DataFrame, centsCol: String, weightCol: String,
                        tieCols: Seq[String]): DataFrame = {
    require(tieCols.nonEmpty, "tieCols must totalize the order")
    val c = df.select((col(centsCol).cast("long").as("__v") +:
      col(weightCol).cast("long").as("__w") +: tieCols.map(col)): _*)
    val cum = Analytics.distributedCumSum(c, "__v", Seq("__w"),
      tieCols = tieCols)
    val tot = c.agg(sum(col("__w")).as("__tw"))
    cum.crossJoin(broadcast(tot))
      .agg(max(col("__tw")).as("total_weight"),
        min(when(expr("cum___w * 4 >= __tw"), col("__v"))).as("wq25_cents"),
        min(when(expr("cum___w * 2 >= __tw"), col("__v"))).as("wq50_cents"),
        min(when(expr("cum___w * 4 >= 3 * __tw"), col("__v"))).as("wq75_cents"))
  }

  /** Pareto concentration: for each coverage threshold, how many of
    * the top keys (by their cents total, descending) it takes to reach
    * that share of the grand total — the "how 80/20 is this corpus"
    * report (revenue concentration, token-source concentration).
    * `n_keys(t)` = rank of the first key whose inclusive cumulative
    * total reaches `ceil(t·total)` — all exact ppm-integer arithmetic.
    *
    * Scale shape: one per-key aggregation, descending prefix totals on
    * [[Analytics.distributedCumSum]] (order by the negated total — no
    * global-sort window), one single-row total attach, one counting
    * aggregate per threshold. */
  def paretoCoverage(df: DataFrame, keyCol: String, centsCol: String,
                     thresholdsPpm: Seq[Long]): DataFrame = {
    require(thresholdsPpm.nonEmpty &&
      thresholdsPpm.forall(t => t > 0 && t < 1000000),
      s"thresholds must be ppm in (0, 1e6), got $thresholdsPpm")
    val rev = df.groupBy(col(keyCol).as("__k"))
      .agg(sum(col(centsCol).cast("long")).as("__r"))
    val cum = Analytics.distributedCumSum(
      rev.withColumn("__nr", -col("__r")), "__nr", Seq("__r"),
      tieCols = Seq("__k"))
    val tot = rev.agg(sum(col("__r")).as("__t"),
      count(lit(1)).as("__nk"))
    val withT = cum.crossJoin(broadcast(tot))
    thresholdsPpm.map { t =>
      withT.agg(lit(t).as("threshold_ppm"),
        (coalesce(sum(when(
          expr(s"cum___r < (__t * ${t}L + 999999L) div 1000000L"), 1L)),
          lit(0L)) + 1L).as("n_keys"),
        max(col("__nk")).as("n_total_keys"))
    }.reduce(_ unionByName _)
  }

  /** Mann–Whitney U (Wilcoxon rank-sum) between cohort 0 and cohort 1
    * of an integer-cents value, in EXACT integers: with per-distinct-
    * value counts and the cumulative count of strictly-smaller values,
    * cohort A's tie-averaged rank sum DOUBLED is
    * `R2 = Σ_v cA(v)·(2·below(v) + c(v) + 1)` (average rank of a tie
    * block of size c starting after `below` rows is below + (c+1)/2 —
    * doubling clears the half), and `U2 = R2 − nA·(nA+1)` is twice the
    * U statistic. Reports (n0, n1, u2_a, u2_max = 2·n0·n1) — the
    * nonparametric location-shift test that needs no distributional
    * assumption and no floats (compare u2_a to u2_max/2 for direction;
    * normal-approximate downstream if a p-value is wanted).
    *
    * Scale shape: one distinct-value aggregation, prefix counts on
    * [[Analytics.distributedCumSum]] (no global-sort window), one
    * single-row total attach. */
  def mannWhitneyU(df: DataFrame, centsCol: String, cohortCol: String)
      : DataFrame = {
    val v = df.select(col(centsCol).cast("long").as("__v"),
        col(cohortCol).cast("int").as("__h"))
      .groupBy(col("__v"))
      .agg(count(lit(1)).as("__c"),
        sum(when(col("__h") === 1, 1L).otherwise(0L)).as("__ca"))
    val cum = Analytics.distributedCumSum(v, "__v", Seq("__c"))
    val tot = v.agg(sum(col("__c") - col("__ca")).as("__n0"),
      sum(col("__ca")).as("__na"))
    cum.crossJoin(broadcast(tot))
      .select(col("__n0"), col("__na"),
        // cum___c includes v's own block: below = cum - c
        expr("__ca * (2 * (cum___c - __c) + __c + 1)").as("__r2"))
      .groupBy(col("__n0"), col("__na"))
      .agg(sum(col("__r2")).as("__r2a"))
      .select(col("__n0").as("n0"), col("__na").as("n1"),
        expr("__r2a - __na * (__na + 1)").as("u2_a"),
        expr("2 * __n0 * __na").as("u2_max"))
  }

  /** ROC AUC from integer-cents scores and a 0/1 label, exact ppm:
    * AUC = P(score of a positive > score of a negative) + ½·P(tie) —
    * algebraically U₁/(n₀n₁), taken from [[mannWhitneyU]]'s doubled
    * tie-averaged rank sums (u2_a div u2_max — the doubling gives ties
    * their standard half credit without a float), so it inherits the
    * no-global-sort scale shape. The classifier-eval primitive next to
    * recall@k / MRR. Output: n_neg, n_pos, auc_ppm.
    * The ppm finish SELF-SWITCHES on overflow (the HHI/Simpson CASE,
    * identical in the oracle): direct u2_a·1e6 div u2_max while
    * u2_max ≤ 9e12 (u2_a ≤ u2_max, so the product provably fits
    * Int64), else quotient·1e6 plus the remainder against the
    * 1e-6-truncated divisor — deterministic in both engines at ANY
    * n₀·n₁, no envelope. */
  def aucPpm(df: DataFrame, scoreCentsCol: String,
             labelCol: String): DataFrame =
    mannWhitneyU(df, scoreCentsCol, labelCol)
      .select(col("n0").as("n_neg"), col("n1").as("n_pos"),
        aucFinish.as("auc_ppm"))

  /** The self-switching exact-ppm finish of [[aucPpm]] over the
    * (u2_a, u2_max) doubled-U columns, factored out so the overflow
    * branch is testable on synthetic frames past the direct branch's
    * 9e12 switch point without materializing 4.6e12 row pairs. */
  private[graft] def aucFinish: Column =
    expr("CASE WHEN u2_max <= 9000000000000L " +
      "THEN u2_a * 1000000L div greatest(u2_max, 1L) " +
      "ELSE (u2_a div u2_max) * 1000000L + " +
      "(u2_a % u2_max) div greatest(u2_max div 1000000L, 1L) END")

  /** Brier score (Brier 1950) of a ppm probability score against a 0/1
    * label, in EXACT ppm — the CALIBRATION grade next to [[aucPpm]]'s
    * ranking grade (AUC is invariant to any monotone rescaling of the
    * scores; Brier is exactly what it cannot see): mean over rows of
    * (score/1e6 − label)², reported ×1e6. All-integer via the hi/lo sum
    * split: with d = score_ppm − label·1e6 (|d| ≤ 1e6 under the score
    * contract), Σd² is carried as (Σ d² div 1e6, Σ d² % 1e6) — each
    * component ≤ n·1e6, so the pair stays in Int64 at ANY n the final
    * division supports — and the ppm finish
    * `Σd² div (n·1e6) = s_hi div n + ((s_hi % n)·1e6 + s_lo) div (n·1e6)`
    * is the exact floor (derivation in the source; every term
    * non-negative, so Spark's truncation and DuckDB's floor agree).
    * Envelope: exact for n ≤ 4.6e12 rows (the (s_hi % n)·1e6 term) —
    * far past any eval frame; shard beyond. The score contract
    * (0 ≤ score_ppm ≤ 1e6) is LOUD: an out-of-range score fails the
    * job (a mis-scaled score column would otherwise report a
    * plausible-but-wrong calibration). Output: n, n_pos, brier_ppm
    * (0 = perfectly calibrated confident truth, 1e6 = maximally wrong;
    * the always-p baseline scores p(1−p) — ~250000 at p = 0.5).
    *
    * Scale shape: one map-side-combined single-row aggregate; nothing
    * shuffles more than partial sums. */
  def brierScore(df: DataFrame, scorePpmCol: String,
                 labelCol: String): DataFrame = {
    val s = col(scorePpmCol).cast("long")
    // coalesce inside the concat: a NULL score fails the same guard
    // (NULL comparison falls to otherwise), and without it the raised
    // message itself would be NULL (concat with NULL is NULL) — the
    // contract error must NAME the offending value, "NULL" included
    val guarded = when(s >= 0L && s <= 1000000L, s)
      .otherwise(raise_error(concat(
        lit("brierScore: score_ppm must be in [0, 1e6], got "),
        coalesce(s.cast("string"), lit("NULL")),
        lit(" — rescale the score column"))))
    df.select(guarded.as("__s"), col(labelCol).cast("long").as("__l"))
      .select(col("__l"), expr("__s - __l * 1000000L").as("__d"))
      .select(col("__l"), expr("__d * __d div 1000000L").as("__dhi"),
        expr("__d * __d % 1000000L").as("__dlo"))
      .agg(count(lit(1)).as("n"),
        coalesce(sum(col("__l")), lit(0L)).as("n_pos"),
        coalesce(sum(col("__dhi")), lit(0L)).as("__shi"),
        coalesce(sum(col("__dlo")), lit(0L)).as("__slo"))
      .select(col("n"), col("n_pos"),
        // Σd² = __shi·1e6 + __slo; with __shi = q·n + r the exact floor
        // Σd² div (n·1e6) = q + (r·1e6 + __slo) div (n·1e6) — the
        // first term is a multiple of the divisor, so the split is
        // lossless at any magnitude of the remainder term. greatest
        // guards the n = 0 empty frame (reports 0).
        expr("__shi div greatest(n, 1L) + " +
          "((__shi % greatest(n, 1L)) * 1000000L + __slo) div " +
          "(greatest(n, 1L) * 1000000L)").as("brier_ppm"))
  }

  /** Reliability (calibration) bins next to [[brierScore]]'s single
    * number — the binned curve a calibration audit actually reads
    * (DeGroot & Fienberg 1983's reliability diagram): scores bucket
    * into `bins` equal-width ppm bins (bin = score·bins div 1e6,
    * clamped so score_ppm = 1e6 lands in the top bin), and each bin
    * reports its row count, mean score, and empirical positive rate —
    * a calibrated scorer has mean_score_ppm ≈ frac_pos_ppm per bin.
    * Exact integers: Σscore ≤ n·1e6 and Σlabel·1e6 ≤ n·1e6 both fit
    * Int64 for n ≤ 9.2e12 rows per bin; divisions truncate identically
    * in both engines (non-negative numerators). Shares [[brierScore]]'s
    * loud score contract. Empty bins are absent (a GROUP BY row needs a
    * member), which is the honest report. Output: bin, n, n_pos,
    * mean_score_ppm, frac_pos_ppm.
    *
    * Scale shape: one map-side-combined groupBy onto ≤ `bins` rows. */
  def calibrationBins(df: DataFrame, scorePpmCol: String,
                      labelCol: String, bins: Int = 10): DataFrame = {
    require(bins >= 2 && bins <= 1000, s"bins must be in [2, 1000], got $bins")
    val s = col(scorePpmCol).cast("long")
    // same NULL-naming coalesce as brierScore's guard
    val guarded = when(s >= 0L && s <= 1000000L, s)
      .otherwise(raise_error(concat(
        lit("calibrationBins: score_ppm must be in [0, 1e6], got "),
        coalesce(s.cast("string"), lit("NULL")),
        lit(" — rescale the score column"))))
    df.select(guarded.as("__s"), col(labelCol).cast("long").as("__l"))
      .select(expr(s"least(__s * $bins div 1000000L, ${bins - 1}L)")
        .as("bin"), col("__s"), col("__l"))
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("n"), sum(col("__l")).as("n_pos"),
        expr("sum(__s) div count(1)").as("mean_score_ppm"),
        expr("sum(__l) * 1000000L div count(1)").as("frac_pos_ppm"))
  }

  /** Expected calibration error (Naeini, Cooper & Hauskrecht 2015) —
    * the ONE-NUMBER roll-up of [[calibrationBins]]: the bin-size-
    * weighted mean of |mean score − positive rate| over the non-empty
    * bins, `Σ_b n_b·|conf_b − acc_b| div n`, in exact ppm (bin means
    * are the bins' truncating ppm divisions; n_b·|diff| ≤ n·1e6 keeps
    * the weighted sum in Int64 to 9.2e12 rows). The standard
    * calibration summary next to [[brierScore]] — Brier mixes
    * calibration with refinement, ECE isolates the calibration gap.
    * Inherits the bins' loud score contract. Output: one row (n,
    * n_bins = non-empty bins, ece_ppm).
    *
    * Scale shape: [[calibrationBins]]' one map-side-combined groupBy
    * onto ≤ bins rows, then a ≤ bins-row aggregate. */
  def expectedCalibrationError(df: DataFrame, scorePpmCol: String,
      labelCol: String, bins: Int = 10): DataFrame =
    calibrationBins(df, scorePpmCol, labelCol, bins)
      .agg(coalesce(sum(col("n")), lit(0L)).as("n"),
        count(lit(1)).as("n_bins"),
        coalesce(sum(expr("n * abs(mean_score_ppm - frac_pos_ppm)")),
          lit(0L)).as("__w"))
      .select(col("n"), col("n_bins"),
        expr("__w div greatest(n, 1L)").as("ece_ppm"))

  /** ISOTONIC RECALIBRATION over the reliability bins — the fixing
    * half next to [[expectedCalibrationError]]'s measuring half: fit
    * the monotone-non-decreasing step function closest (weighted least
    * squares) to the bins' empirical positive rates, i.e. pool-adjacent-
    * violators (Ayer et al. 1955; Zadrozny & Elkan 2002 for the
    * calibration use) — but computed via the MINIMAX CLOSED FORM
    * instead of the sequential pooling loop:
    *   fit_i = max_{j ≤ i} min_{k ≥ i} rate(j..k),
    * rate(j..k) = Σ n_pos over bins j..k ×1e6 div Σ n — the textbook
    * identity for the isotonic-regression solution, chosen because it
    * is pure relational algebra (three bounded self-joins + two
    * aggregations) with ONE truncating division per (j,k) interval:
    * no sequential state, so both engines replay it bit-for-bit.
    * Truncation note: the floor applies to each interval rate BEFORE
    * the max-min; truncation is monotone, so the fit is still
    * non-decreasing in i (spec-pinned), and on rates that divide
    * exactly it IS classic PAV's output (spec-pinned against a
    * hand-pooled fixture). Empty bins are absent upstream
    * ([[calibrationBins]]) and the fit pools over the PRESENT bins in
    * bin order — the honest read (an absent bin contributes no rows
    * to pool). Inherits the bins' loud score contract. Output per
    * non-empty bin: bin, n, n_pos, mean_score_ppm, frac_pos_ppm,
    * fit_ppm (the recalibrated probability for scores landing in that
    * bin).
    *
    * Scale shape: the corpus touch is [[calibrationBins]]' ONE
    * map-side-combined groupBy onto ≤ `bins` rows; everything after
    * runs on frames bounded by bins³ div 6 tuples (≤ 1.7e8 at the
    * 1000-bin cap, ~220 at the default 10) — bounded by a CONSTRUCTOR
    * ARGUMENT, never by the corpus, so the non-equi joins are
    * broadcast nested loops over provably tiny sides. */
  def isotonicCalibration(df: DataFrame, scorePpmCol: String,
      labelCol: String, bins: Int = 10): DataFrame = {
    val b = calibrationBins(df, scorePpmCol, labelCol, bins)
    // interval rates over present-bin ranges [j, k]: one row per
    // ordered bin pair, pooled counts via the membership join
    val j = b.select(col("bin").as("__j"))
    val k = b.select(col("bin").as("__k"))
    val member = b.select(col("bin").as("__b2"), col("n").as("__n"),
      col("n_pos").as("__p"))
    val rate = j.join(k, col("__j") <= col("__k"))
      .join(member, col("__b2") >= col("__j") && col("__b2") <= col("__k"))
      .groupBy(col("__j"), col("__k"))
      .agg(expr("sum(__p) * 1000000L div sum(__n)").as("__r"))
    // fit_i = max_{j<=i} min_{k>=i} rate(j,k): the (i,j,k) triples are
    // exactly the pairs straddling i
    val fit = rate.join(b.select(col("bin").as("__i")),
        col("__j") <= col("__i") && col("__k") >= col("__i"))
      .groupBy(col("__i"), col("__j")).agg(min(col("__r")).as("__mn"))
      .groupBy(col("__i")).agg(max(col("__mn")).as("fit_ppm"))
      .select(col("__i").as("bin"), col("fit_ppm"))
    b.join(fit, Seq("bin"))
      .select(col("bin"), col("n"), col("n_pos"), col("mean_score_ppm"),
        col("frac_pos_ppm"), col("fit_ppm"))
  }

  /** Group-fairness report of a thresholded score against a 0/1 label
    * — the governance-tier read next to the privacy operators: per
    * group, the three standard classification-fairness quantities
    * (Hardt, Price & Srebro 2016's equalized-odds components plus the
    * demographic-parity selection rate), in exact ppm —
    *   - sel_ppm: P(score ≥ t) within the group (demographic parity
    *     compares these across groups);
    *   - tpr_ppm: P(score ≥ t | label = 1) (equal opportunity);
    *   - fpr_ppm: P(score ≥ t | label = 0) (the second equalized-odds
    *     coordinate).
    * A group with no positives (or no negatives) reports NULL for the
    * undefined rate rather than a fake 0 — the honest report (the CASE
    * is mirrored in the oracle). Counts ride along so the reader can
    * judge statistical weight. Label convention is [[mannWhitneyU]]'s:
    * label = 1 is positive, every other NON-NULL value negative; a
    * NULL label is NEITHER — it counts in n (the group saw the row)
    * but is excluded from both the TPR and FPR denominators (negatives
    * are counted explicitly as label ≠ 1, not derived as n − n_pos, so
    * a NULL label can never deflate fpr_ppm). A NULL score counts as
    * not-selected everywhere (threshold comparison with NULL is NULL)
    * — both conventions replay identically in the oracle's CASE
    * filters. Output per group: grp (avoiding the reserved word), n,
    * n_pos, n_sel, sel_ppm, tpr_ppm, fpr_ppm.
    *
    * Scale shape: ONE map-side-combined groupBy onto |groups| rows;
    * nothing else touches corpus data. */
  def fairnessReport(df: DataFrame, groupCol: String, scorePpmCol: String,
                     labelCol: String, thresholdPpm: Long): DataFrame = {
    val pos = col(labelCol).cast("int") === 1
    val sel = col(scorePpmCol).cast("long") >= thresholdPpm
    df.groupBy(col(groupCol).as("grp"))
      .agg(count(lit(1)).as("n"),
        count(when(pos, 1)).as("n_pos"),
        // negatives counted EXPLICITLY (label ≠ 1 is NULL on a NULL
        // label, so NULL-label rows fall out of the FPR denominator
        // exactly as they fall out of the __fp numerator — n − n_pos
        // would silently count them as negatives)
        count(when(!pos, 1)).as("__nneg"),
        count(when(sel, 1)).as("n_sel"),
        count(when(pos && sel, 1)).as("__tp"),
        count(when(!pos && sel, 1)).as("__fp"))
      .select(col("grp"), col("n"), col("n_pos"), col("n_sel"),
        expr("n_sel * 1000000L div n").as("sel_ppm"),
        expr("CASE WHEN n_pos > 0 THEN __tp * 1000000L div n_pos END")
          .as("tpr_ppm"),
        expr("CASE WHEN __nneg > 0 THEN __fp * 1000000L div __nneg END")
          .as("fpr_ppm"))
  }

  /** Cliff's delta (Cliff 1993) — the standard nonparametric EFFECT
    * SIZE companion to [[mannWhitneyU]]'s test statistic: δ =
    * P(x₁ > x₀) − P(x₁ < x₀) over cross-cohort pairs, in exact ppm.
    * Algebraically δ = 2·U₁/(n₀n₁) − 1 = 2·AUC − 1, so it reads
    * straight off the doubled-U frame: delta_ppm = 2·auc_ppm − 1e6 —
    * the division happens on the NON-NEGATIVE AUC (inheriting
    * [[aucPpm]]'s self-switching overflow finish), and the sign
    * arrives by pure subtraction, so the negative result never meets
    * the truncate-vs-floor engine divergence. |δ| ≥ 0.474 is Romano's
    * "large" threshold; 0 = stochastically equal cohorts. Output:
    * n0, n1, delta_ppm ∈ [−1e6, 1e6].
    *
    * Scale shape: identical to [[mannWhitneyU]] — one distinct-value
    * aggregation + prefix counts, no global sort. */
  def cliffsDelta(df: DataFrame, centsCol: String,
                  cohortCol: String): DataFrame =
    mannWhitneyU(df, centsCol, cohortCol)
      .select(col("n0"), col("n1"),
        (aucFinish * lit(2L) - lit(1000000L)).as("delta_ppm"))

  /** Two-sample Kolmogorov–Smirnov statistic over integer cents, in
    * EXACT ppm: D = max_v |F₀(v) − F₁(v)| with F the empirical CDFs —
    * the sup-norm distribution-distance whose binned sibling is
    * [[distributionDrift]]'s total variation (KS needs no bin choice
    * and is the classic two-sample location/shape test; compare
    * D·sqrt(n₀n₁/(n₀+n₁)) to the Kolmogorov quantile downstream if a
    * p-value is wanted). The CDF steps are evaluated at every distinct
    * value, which is where the sup over the whole real line is
    * attained. Integer throughout: cum·1e6 div n per cohort, abs diff,
    * max. An empty cohort divides by a guarded 1 (reported counts stay
    * raw). Cohort convention is [[mannWhitneyU]]'s: rows with
    * `cohortCol` = 1 are cohort 1, EVERY other value is cohort 0 — no
    * row is silently dropped on non-binary input.
    *
    * Scale shape: one distinct-value aggregation, prefix counts for
    * BOTH cohorts on one [[Analytics.distributedCumSum]] pass (no
    * global-sort window), one single-row total attach, one max. */
  def ksStatistic(df: DataFrame, centsCol: String,
                  cohortCol: String): DataFrame = {
    val v = df.select(col(centsCol).cast("long").as("__v"),
        col(cohortCol).cast("int").as("__h"))
      .groupBy(col("__v"))
      .agg(sum(when(col("__h") === 1, 0L).otherwise(1L)).as("__c0"),
        sum(when(col("__h") === 1, 1L).otherwise(0L)).as("__c1"))
    val cum = Analytics.distributedCumSum(v, "__v", Seq("__c0", "__c1"))
    val tot = v.agg(sum(col("__c0")).as("__n0"), sum(col("__c1")).as("__n1"))
    cum.crossJoin(broadcast(tot))
      .select(col("__n0"), col("__n1"),
        abs(expr("cum___c0 * 1000000L div greatest(__n0, 1L)") -
          expr("cum___c1 * 1000000L div greatest(__n1, 1L)")).as("__d"))
      .groupBy(col("__n0"), col("__n1"))
      .agg(max(col("__d")).as("d_ppm"))
      .select(col("__n0").as("n0"), col("__n1").as("n1"), col("d_ppm"))
  }

  /** Kruskal–Wallis H (the k-group extension of [[mannWhitneyU]]):
    * rank-based one-way test over integer cents, midranks for ties via
    * the DOUBLED-rank trick (2·midrank is always an integer), tie
    * correction C = 1 − Σ(t³−t)/(N³−N), all in exact integer
    * arithmetic. The distributed part produces the value-grouped rank
    * frame (one [[Analytics.distributedCumSum]] pass — no global-sort
    * window) and the k-row per-group (n_i, Σ 2·rank) frame; the k-row
    * finish runs on the driver in BigInt (squares reach N⁴, past
    * Int64) with truncating division at the same points DuckDB's
    * HUGEINT replay truncates — so h_ppm replays bit-for-bit. Output:
    * one row (n, k_groups, dof, h_ppm); degenerate inputs (all values
    * tied, or a single group) report h_ppm = 0.
    *
    * Scale shape: two map-side-combined aggregates + the cumsum pass;
    * nothing after them touches corpus rows; the collect is k rows. */
  def kruskalWallisH(df: DataFrame, centsCol: String,
                     groupCol: String): DataFrame = {
    val v = df.select(col(centsCol).cast("long").as("__v"),
      col(groupCol).cast("string").as("__g"))
    val byVal = v.groupBy(col("__v")).agg(count(lit(1)).as("__c"))
    val r2 = Analytics.distributedCumSum(byVal, "__v", Seq("__c"))
      .select(col("__v"),
        expr("2 * (cum___c - __c) + __c + 1").as("__r2v"))
    val grp = v.groupBy(col("__g"), col("__v"))
      .agg(count(lit(1)).as("__cg"))
      .join(r2, Seq("__v"))
      .groupBy(col("__g"))
      .agg(sum(col("__cg")).as("__ni"),
        sum(expr("__cg * __r2v")).as("__r2i"))
      .collect().map(r => (r.getLong(1), r.getLong(2)))
    val tieSum = BigInt(byVal
      .agg(sum(expr("CAST(__c AS DECIMAL(38,0)) * __c * __c - __c")).as("t"))
      .head().getDecimal(0).toBigInteger)
    val n = BigInt(grp.map(_._1).sum)
    val k = grp.length.toLong
    val m = BigInt(1000000L)
    val hPpm: Long =
      if (n < 2 || k < 2 || n * n * n - n == 0) 0L
      else {
        val s = grp.map { case (ni, r2i) =>
          BigInt(r2i) * r2i * m / ni }.sum
        // clamp: near H=0 with uneven ties the truncations in s can
        // push hraw to -1 where exact H is a tiny positive — and Scala
        // BigInt division truncates toward zero while DuckDB's //
        // floors, so a negative numerator would differ by 1 ppm
        // between engines; H >= 0 mathematically, so clamp both sides
        val hraw = (BigInt(3) * s / (n * (n + 1)) -
          BigInt(3) * (n + 1) * m).max(BigInt(0))
        val cPpm = m - tieSum * m / (n * n * n - n)
        if (cPpm <= 0) 0L else (hraw * m / cPpm).toLong
      }
    val spark = df.sparkSession
    import spark.implicits._
    Seq((n.toLong, k, k - 1, hPpm))
      .toDF("n", "k_groups", "dof", "h_ppm")
  }

  /** Split-conformal prediction thresholds (Vovk et al. 2005; Lei et
    * al. 2018): for each miscoverage α, the ⌈(n+1)(1−α)⌉-th smallest
    * calibration score — the radius that makes prediction sets cover
    * with probability ≥ 1−α. Rank arithmetic is exact integer
    * (`r = (n+1)·(1e6−α_ppm) div 1e6 + 1`, capped at n), and the
    * selection is "smallest value whose cumulative count reaches r" —
    * one [[Analytics.distributedCumSum]] pass, never a global sort.
    * One output row per α: alpha_ppm, n, rank, threshold_cents. */
  def conformalThresholds(df: DataFrame, centsCol: String,
                          tieCols: Seq[String],
                          alphasPpm: Seq[Long]): DataFrame = {
    require(alphasPpm.nonEmpty &&
      alphasPpm.forall(a => a > 0 && a < 1000000),
      s"alphas must be ppm in (0, 1e6), got $alphasPpm")
    val c = df.select((col(centsCol).cast("long").as("__v") +:
      lit(1L).as("__one") +: tieCols.map(col)): _*)
    val cum = Analytics.distributedCumSum(c, "__v", Seq("__one"),
      tieCols = tieCols)
    val tot = c.agg(count(lit(1)).as("__n"))
    val withN = cum.crossJoin(broadcast(tot))
    alphasPpm.map { a =>
      withN
        .withColumn("__r", // ceil((n+1)(1-α)) in ppm, capped at n
          least(col("__n"),
            expr(s"((__n + 1) * ${1000000L - a}L + 999999L) div 1000000L")))
        .agg(lit(a).as("alpha_ppm"), max(col("__n")).as("n"),
          max(col("__r")).as("rank_k"),
          min(when(expr("cum___one >= __r"), col("__v")))
            .as("threshold_cents"))
    }.reduce(_ unionByName _)
  }

  /** Pearson chi-square independence statistic between two categorical
    * columns, in EXACT integer arithmetic: with o the observed cell,
    * r/c the marginals and N the total, each cell contributes
    * `(o·N − r·c)² / (r·c·N)` to χ² — evaluated as ppm via the
    * overflow-safe split `q·1e6 + rem·1e6 div m` (q = d² div m,
    * rem = d² % m), so the statistic replays bit-for-bit. The grid is
    * DENSIFIED (a zero cell still contributes r·c/N) via the
    * domain-bounded marginal cross — the t-closeness posture. One row:
    * N, the level counts, degrees of freedom, and χ²·1e6.
    * Exactness bound: N ≤ ~5e4 per evaluated slice (d² ≤ N⁴ must fit
    * a BIGINT); sample bigger corpora first — the audit is about the
    * association, not the row count.
    *
    * Scale shape: one cell-count aggregation (map-side combined,
    * |A|·|B| rows), two domain-sized marginal roll-ups, and a
    * domain×domain cross — nothing after the first shuffle touches
    * corpus rows. */
  /** [[chiSquare]] with its exactness precondition ENFORCED: when the
    * input exceeds `maxN` rows, a content-hash sample (the
    * [[Sampling.sampleHex]] md5 pattern, 8 hex chars = u32) brings the
    * expected evaluated slice down to `maxN` before the exact-integer
    * statistic runs — the guard the bare operator documents but left to
    * the caller. The keep predicate is pure integer arithmetic,
    * `u32 < (maxN·2^32) div N`, so it replays bit-for-bit in any
    * engine: when N ≤ maxN the right side is ≥ 2^32 and every row is
    * kept (the filter self-disables — no driver-side branch, one
    * static plan/SQL for both regimes). N rides a single-row broadcast
    * (the scalar-attach pattern). `maxN` is capped at 50 000 so even a
    * +5σ binomial overshoot keeps d² = (o·N − r·c)² ≤ N⁴ inside
    * BIGINT under ANSI mode. */
  def chiSquareSampled(df: DataFrame, idCol: String, aCol: String,
                       bCol: String, maxN: Long = 40000L,
                       seed: Long = graft.fakegen.FakeGen.DefaultSeed): DataFrame = {
    require(maxN >= 1L && maxN <= 50000L,
      s"maxN must be in [1, 5e4] (N^4 must fit BIGINT), got $maxN")
    val u32 = conv(substring(md5(concat(lit(s"$seed:chi2:"),
      col(idCol).cast("string"))), 1, 8), 16, 10).cast("long")
    val tot = df.agg(greatest(count(lit(1)), lit(1L)).as("__nn"))
    val pre = df.select(col(aCol), col(bCol), u32.as("__u32"))
      .crossJoin(broadcast(tot))
      .filter(expr(s"__u32 < ${maxN * 4294967296L}L div __nn"))
      .select(col(aCol), col(bCol))
    chiSquare(pre, aCol, bCol)
  }

  def chiSquare(df: DataFrame, aCol: String, bCol: String): DataFrame = {
    val cells = df.groupBy(col(aCol).as("__a"), col(bCol).as("__b"))
      .agg(count(lit(1)).as("__o"))
    val rt = cells.groupBy(col("__a")).agg(sum(col("__o")).as("__r"))
    val ct = cells.groupBy(col("__b")).agg(sum(col("__o")).as("__c"))
    val tot = cells.agg(sum(col("__o")).as("__n"),
      count(lit(1)).as("__cells"))
    rt.crossJoin(broadcast(ct))
      .join(cells, Seq("__a", "__b"), "left")
      .na.fill(0L, Seq("__o"))
      .crossJoin(broadcast(tot))
      .withColumn("__d", expr("__o * __n - __r * __c"))
      .withColumn("__m", expr("__r * __c * __n"))
      .withColumn("__t",
        expr("(__d * __d div __m) * 1000000L + (__d * __d % __m) * 1000000L div __m"))
      .agg(max(col("__n")).as("n"),
        countDistinct(col("__a")).cast("long").as("a_levels"),
        countDistinct(col("__b")).cast("long").as("b_levels"),
        sum(col("__t")).as("chi2_ppm"))
      .select(col("n"), col("a_levels"), col("b_levels"),
        expr("(a_levels - 1) * (b_levels - 1)").as("dof"), col("chi2_ppm"))
  }

  /** Effect size for [[chiSquare]]: Cramér's V = sqrt(χ² / (n·d)),
    * d = min(a_levels, b_levels) − 1 — the [0, 1] association measure
    * a raw χ² (which grows with n) can't give. Integer ppm throughout:
    * V²·1e12 comes from the same two-step division the χ² cell term
    * uses (quotient·1e6 + remainder·1e6 div m — each addend ≤ 1e12, so
    * no Long overflow at any n), then V_ppm = floor(sqrt(·)) — IEEE
    * sqrt is correctly rounded, so the double step is engine-exact on
    * integers ≤ 2^53. Output: n, dof, chi2_ppm, v_ppm.
    *
    * Scale shape: inherits [[chiSquare]]'s (level-sized frames after
    * one corpus aggregate); the V projection touches one row. */
  def cramersV(df: DataFrame, aCol: String, bCol: String): DataFrame =
    cramersVFinish(chiSquare(df, aCol, bCol))

  /** [[cramersV]] with [[chiSquareSampled]]'s exactness guard: the
    * same self-disabling content-hash sample caps the evaluated slice
    * at `maxN` so d² = (o·N − r·c)² stays inside BIGINT — the bare
    * operator's N ≤ ~5e4 envelope enforced instead of documented
    * (identical filter arithmetic in the oracle, all-keep when
    * N ≤ maxN). */
  def cramersVSampled(df: DataFrame, idCol: String, aCol: String,
                      bCol: String, maxN: Long = 40000L,
                      seed: Long = graft.fakegen.FakeGen.DefaultSeed): DataFrame =
    cramersVFinish(chiSquareSampled(df, idCol, aCol, bCol, maxN, seed))

  private def cramersVFinish(chi: DataFrame): DataFrame =
    chi
      .withColumn("__d", expr("greatest(least(a_levels, b_levels) - 1, 1L)"))
      .withColumn("__m", expr("n * __d"))
      .withColumn("__v2",
        expr("(chi2_ppm div __m) * 1000000L + " +
             "(chi2_ppm % __m) * 1000000L div __m"))
      .withColumn("v_ppm",
        floor(sqrt(col("__v2").cast("double"))).cast("long"))
      .select(col("n"), col("dof"), col("chi2_ppm"), col("v_ppm"))

  /** Deterministic half-sample bootstrap of a mean: B resamples, row r
    * belongs to resample i iff BIT i of its salted 52-bit md5 value is
    * set — one hash per ROW (not per row×resample; a good hash's bits
    * are independent fair coins, so the B memberships are independent
    * 50% draws) — a replayable stand-in for Poisson bootstrap that
    * gives the same uncertainty read (Kleiner et al. 2014, "bag of
    * little bootstraps" motivates subsample-based CI at scale). Per
    * resample: n, the exact cents sum, and the ppm-scaled mean
    * (`sum·1e6 div n`) — all integers, so the CI table replays
    * bit-for-bit in any engine. Spread across the B means IS the
    * sampling-uncertainty estimate.
    *
    * Scale shape: ONE scan, one md5 per row, 2B conditional aggregates
    * folded map-side to a single partial row per partition — no row
    * multiplication, no per-resample pass (the explode formulation
    * benched 32× the hashing for nothing). Exactness bound:
    * |sum_cents|·1e6 must fit a BIGINT (cents sums to ~9e12, ~$92B per
    * resample); rescale the value column or shard beyond that. */
  def bootstrapMeans(df: DataFrame, idCol: String, centsCol: String,
                     b: Int = 32, seed: String = "bs"): DataFrame = {
    require(b >= 2 && b <= 48, s"b must be in [2, 48] (hash bits), got $b")
    val u = expr("cast(conv(substr(md5(concat(__id, ':', " +
      s"'$seed')), 1, 13), 16, 10) as bigint)")
    val aggs = (0 until b).flatMap { i =>
      val in = expr(s"(__u >> $i) & 1 = 1")
      Seq(sum(when(in, 1L)).as(s"__n_$i"),
        sum(when(in, col("__c"))).as(s"__s_$i"))
    }
    val stackExpr = s"stack($b, " +
      (0 until b).map(i => s"$i, __n_$i, __s_$i").mkString(", ") +
      ") as (resample, n, sum_cents)"
    df.select(col(idCol).cast("string").as("__id"),
        col(centsCol).cast("long").as("__c"))
      .select(col("__c"), u.as("__u"))
      .agg(aggs.head, aggs.tail: _*)
      .select(expr(stackExpr))
      // A resample with zero members aggregates to NULL n/sum; the
      // oracle's unnest-and-group formulation emits no row for it.
      // Coalesce-and-filter so both engines agree on tiny inputs
      // (RobustnessSpec pins the n=1 corpus).
      .withColumn("n", coalesce(col("n"), lit(0L)))
      .filter(col("n") > 0)
      .select(col("resample"), col("n"), col("sum_cents"),
        expr("sum_cents * 1000000L div n").as("mean_cents_ppm"))
  }
}
