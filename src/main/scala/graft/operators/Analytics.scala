package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Product-analytics report operators, extracted from the inline
  * SparkEntry query bodies (round 12) so each multi-step report is a
  * named, unit-tested operator (the Temporal/Stats pattern). Semantics
  * are unchanged — every consumer query keeps its DuckDB oracle.
  *
  * Scale notes follow each operator; the common rules: exact integer
  * ppm arithmetic (never float ratios), per-key windows (the only
  * partition-less windows ride provably tiny frames and are named in
  * PlanAuditSpec's globalWindowAllowed), and single-row global stats
  * attached via broadcast cross-join (the BM25 pattern) instead of a
  * driver collect.
  */
object Analytics {

  /** Exact per-group order-statistic percentiles: rank by (value, tie)
    * inside each group, pick the ceil(n*p)-th value per requested
    * percentile. One hash exchange on the group key; both windows and
    * the final aggregate reuse it. `percentiles` maps p -> output
    * column name; `nName` names the group-count column.
    *
    * Regime note: a group's rows pass through ONE window task here —
    * right for many small groups (per-user stats). For a handful of
    * huge categories use [[exactPercentilesBucketed]], which computes
    * the same ranks two-phase and never serializes a group. */
  def exactPercentiles(df: DataFrame, groupCol: String, valCol: String,
                       tieCols: Seq[String],
                       percentiles: Seq[(Double, String)],
                       nName: String): DataFrame = {
    require(percentiles.nonEmpty)
    val wp = Window.partitionBy(col(groupCol))
    val wr = wp.orderBy((col(valCol).asc +: tieCols.map(col(_).asc)): _*)
    val ranked = df.withColumn("__rn", row_number().over(wr))
      .withColumn("__n", count(lit(1)).over(wp))
    val aggs = max(col("__n")).as(nName) +: percentiles.map { case (p, name) =>
      max(when(col("__rn") === ceil(col("__n") * p), col(valCol))).as(name)
    }
    ranked.groupBy(col(groupCol)).agg(aggs.head, aggs.tail: _*)
  }

  /** Per-group global rank via the two-phase form (the
    * [[ntileDistributed]] machinery, per group): range-bucket each row
    * inside its group from a broadcast per-group min/max, turn
    * per-(group, bucket) counts into prefix offsets with one
    * PARTITIONED window over the (groups x buckets)-row table, then
    * rank = prefix + per-(group, bucket) row_number — no task ever
    * holds more than one bucket of one group. Appends `__rank` (1-based
    * within group by (value, ties) asc) and `__gn` (group count).
    *
    * Regime: for LOW-CARDINALITY groups (a handful of categories over
    * billions of rows), where a plain per-group window serializes an
    * entire huge group into ONE task. With millions of small groups the
    * plain window is better (the prefix table would be groups x
    * buckets rows); callers pick per [[exactPercentiles]] vs
    * [[exactPercentilesBucketed]]. Equal values always share a bucket
    * (floor of a monotone expression), so a near-constant column
    * degrades toward one hot bucket — the value-spread caveat shared
    * with nucleusTopP's bucketing.
    *
    * Cost shape: THREE streaming passes over the input (bounds,
    * per-bucket counts, final rank) — the honest minimum for EXACT
    * distributed ranks (TeraSort-style single-pass ranking needs only
    * approximate split points; exact rank offsets need exact counts).
    * Each pass is embarrassingly parallel and nothing is materialized,
    * so at toy scale the extra passes show as a fixed overhead the
    * single-task window doesn't pay — the trade inverts as soon as a
    * group outgrows one task.
    *
    * Deliberately NOT eagerly checkpointed: an r12 idle A/B at sf0.1
    * (materializeShared on the ranked frame + the q_lead_time join
    * slice, min-of-3) measured a wash across all four consumer queries
    * — the two consumers of the ranked frame start from the same
    * exchanges, which AQE reuse already computes once (the
    * contaminationPairs bucketHits lesson), and eager checkpointing
    * would also make bare plan CONSTRUCTION launch jobs for every
    * caller. */
  def bucketedGroupRank(df: DataFrame, groupCol: String,
                        valCol: String, tieCols: Seq[String],
                        buckets: Int = 64): DataFrame = {
    require(buckets >= 1)
    val bounds = df.groupBy(col(groupCol)).agg(
      min(col(valCol).cast("double")).as("__lo"),
      max(col(valCol).cast("double")).as("__hi"),
      count(lit(1)).as("__gn"))
    // NULL values bucket to 0 explicitly: floor(NULL) is NULL and
    // least() SKIPS nulls, so without this branch nulls would land in
    // the TOP bucket and rank after the highest values — the opposite
    // of the window form this replaces (Spark asc = nulls FIRST). With
    // bucket 0 + the nulls-first local orderBy, window semantics hold.
    val bucketed = df.join(broadcast(bounds), Seq(groupCol))
      .withColumn("__b",
        when(col(valCol).isNull, lit(0))
          .when(col("__hi") === col("__lo"), lit(0))
          .otherwise(least(lit(buckets - 1), floor(
            (col(valCol).cast("double") - col("__lo")) /
              (col("__hi") - col("__lo")) * buckets).cast("int"))))
    val prefixes = bucketed.groupBy(col(groupCol), col("__b"))
      .agg(count(lit(1)).as("__bn"))
      .withColumn("__prefix",
        coalesce(sum(col("__bn")).over(Window.partitionBy(col(groupCol))
          .orderBy(col("__b").asc)
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .drop("__bn")
    val wLocal = Window.partitionBy(col(groupCol), col("__b"))
      .orderBy((col(valCol).asc +: tieCols.map(col(_).asc)): _*)
    bucketed
      .join(broadcast(prefixes), Seq(groupCol, "__b"))
      .withColumn("__rank", col("__prefix") + row_number().over(wLocal))
      .drop("__b", "__lo", "__hi", "__prefix")
  }

  /** [[exactPercentiles]] for the low-cardinality-group regime: same
    * output, but ranks come from [[bucketedGroupRank]] so a
    * billion-row category never serializes into one window task. */
  def exactPercentilesBucketed(df: DataFrame, groupCol: String,
                               valCol: String, tieCols: Seq[String],
                               percentiles: Seq[(Double, String)],
                               nName: String,
                               buckets: Int = 64): DataFrame = {
    require(percentiles.nonEmpty)
    val ranked = bucketedGroupRank(df, groupCol, valCol, tieCols, buckets)
    val aggs = max(col("__gn")).as(nName) +:
      percentiles.map { case (p, name) =>
        max(when(col("__rank") === ceil(col("__gn") * p), col(valCol)))
          .as(name)
      }
    ranked.groupBy(col(groupCol)).agg(aggs.head, aggs.tail: _*)
  }

  /** [[iqrOutliers]] for the low-cardinality-group regime: quartiles
    * come off the bucketed rank as a one-row-per-group aggregate that
    * broadcast-joins back for the fence count — both passes are
    * map-side-combined aggregates, no per-group window task. */
  def iqrOutliersBucketed(df: DataFrame, groupCol: String, valCol: String,
                          tieCol: String, buckets: Int = 64): DataFrame = {
    val ranked = bucketedGroupRank(df, groupCol, valCol, Seq(tieCol),
      buckets)
    val qs = ranked.groupBy(col(groupCol)).agg(
      max(col("__gn")).as("__n"),
      max(when(col("__rank") === ceil(col("__gn") * 0.25), col(valCol)))
        .as("__q1"),
      max(when(col("__rank") === ceil(col("__gn") * 0.75), col(valCol)))
        .as("__q3"))
    ranked.join(broadcast(qs), Seq(groupCol))
      .groupBy(col(groupCol))
      .agg(max(col("__n")).as("n"), max(col("__q1")).as("q1_c"),
        max(col("__q3")).as("q3_c"),
        count(when(
          col(valCol) * 2 < col("__q1") * 2 - (col("__q3") - col("__q1")) * 3
            || col(valCol) * 2 > col("__q3") * 2 +
              (col("__q3") - col("__q1")) * 3, 1)).as("n_outliers"))
  }

  /** Tukey IQR outlier counts per group at exact order-statistic
    * quartiles; the 1.5-IQR fences stay integer by scaling both sides
    * by 2. Input value must already be an integer scale (e.g. cents).
    * Output: (group, n, q1_c, q3_c, n_outliers). Same one-exchange
    * shape as [[exactPercentiles]] — the per-group window regime; use
    * [[iqrOutliersBucketed]] when groups are few and huge. */
  def iqrOutliers(df: DataFrame, groupCol: String, valCol: String,
                  tieCol: String): DataFrame = {
    val wp = Window.partitionBy(col(groupCol))
    val wr = wp.orderBy(col(valCol).asc, col(tieCol).asc)
    df.withColumn("__rn", row_number().over(wr))
      .withColumn("__n", count(lit(1)).over(wp))
      .withColumn("__q1",
        max(when(col("__rn") === ceil(col("__n") * 0.25), col(valCol)))
          .over(wp))
      .withColumn("__q3",
        max(when(col("__rn") === ceil(col("__n") * 0.75), col(valCol)))
          .over(wp))
      .groupBy(col(groupCol))
      .agg(max(col("__n")).as("n"), max(col("__q1")).as("q1_c"),
        max(col("__q3")).as("q3_c"),
        count(when(
          col(valCol) * 2 < col("__q1") * 2 - (col("__q3") - col("__q1")) * 3
            || col(valCol) * 2 > col("__q3") * 2 +
              (col("__q3") - col("__q1")) * 3, 1)).as("n_outliers"))
  }

  /** Step-to-step funnel conversion in exact ppm over
    * [[Temporal.funnel]]'s per-user step timestamps. The funnel output
    * collapses to ONE row of step counts (a single aggregate), then
    * explodes to one report row per step — no second pass over the
    * events. Conversion guards n=0 (ANSI div). */
  def funnelRates(df: DataFrame, userCol: String, tsCol: String,
                  steps: Seq[Column], windowUs: Long): DataFrame = {
    require(steps.size >= 2)
    val f = Temporal.funnel(df, userCol, tsCol, steps, windowUs)
    val counts = (1 to steps.size).map { i =>
      if (i == 1) count(lit(1)).as("n1") else count(col(s"t$i")).as(s"n$i")
    }
    val agged = f.agg(counts.head, counts.tail: _*)
    val rows = (1 to steps.size).map { i =>
      val conv =
        if (i == 1) lit(null).cast("long")
        else expr(s"CASE WHEN n${i - 1} > 0 THEN n$i * 1000000 div n${i - 1} END")
      struct(lit(i).as("step"), col(s"n$i").as("n_reached"),
        conv.as("conv_ppm"))
    }
    agged.select(explode(array(rows: _*)).as("__r"))
      .select(col("__r.step"), col("__r.n_reached"), col("__r.conv_ppm"))
  }

  /** Linear (equal-credit) multi-touch attribution: each anchor
    * (purchase) range-joins its in-window touches, then splits credit
    * 1e6/n_touches. The range join is [[Temporal.rangeJoin]]'s banded
    * equi-join — never a time-cross; the credit window partitions by
    * the anchor id, bounded by touches-per-anchor. Output: (anchorId,
    * keys..., touchId, n_touches, credit_ppm). */
  def attributionLinear(anchors: DataFrame, touches: DataFrame,
                        keys: Seq[String], tsCol: String, startCol: String,
                        endCol: String, blockWidth: Long,
                        anchorIdCol: String, touchIdCol: String): DataFrame =
    Temporal.rangeJoin(anchors, touches, keys, tsCol, startCol, endCol,
        blockWidth)
      .withColumn("n_touches", count(lit(1))
        .over(Window.partitionBy(col(anchorIdCol))).cast("long"))
      .select((col(anchorIdCol) +: keys.map(col)) ++
        Seq(col(touchIdCol), col("n_touches"),
          expr("1000000 div n_touches").as("credit_ppm")): _*)

  /** Exponential time-decay attribution: every touch inside the
    * lookback window gets credit ∝ 2^(−steps), steps = full half-lives
    * between touch and conversion — the industry decay model kept
    * EXACT by using power-of-two integer weights (1L << (maxSteps −
    * steps)) instead of a float pow. `maxSteps` caps the shift (older
    * touches all weigh 1); ≤ 42 keeps w·1e6 inside BIGINT.
    *
    * Same scale shape as [[attributionLinear]]: the blocked range join
    * bounds candidate pairs, the per-anchor normalizing window rides
    * the anchor-id partition (touches-per-window sized). */
  def attributionDecay(anchors: DataFrame, touches: DataFrame,
                       keys: Seq[String], tsCol: String, startCol: String,
                       endCol: String, blockWidth: Long,
                       anchorIdCol: String, touchIdCol: String,
                       halfLifeUs: Long, maxSteps: Int = 20): DataFrame = {
    require(halfLifeUs > 0, s"halfLifeUs must be > 0, got $halfLifeUs")
    require(maxSteps >= 1 && maxSteps <= 42,
      s"maxSteps must be in [1, 42] (w * 1e6 must fit a BIGINT), got $maxSteps")
    Temporal.rangeJoin(anchors, touches, keys, tsCol, startCol, endCol,
        blockWidth)
      .withColumn("__steps",
        least(lit(maxSteps.toLong),
          expr(s"($tsCol - $startCol) div ${halfLifeUs}L")))
      .withColumn("__w", expr(s"shiftleft(1L, cast($maxSteps - __steps AS int))"))
      .withColumn("__tot", sum(col("__w"))
        .over(Window.partitionBy(col(anchorIdCol))))
      .select((col(anchorIdCol) +: keys.map(col)) ++
        Seq(col(touchIdCol), col("__steps").as("half_lives"),
          expr("__w * 1000000L div __tot").as("credit_ppm")): _*)
  }

  /** Rare-category consolidation: categories whose corpus share falls
    * below `minSharePpm` collapse into `otherLabel` — the standard
    * cardinality-control step before one-hot/target encoding or
    * per-category mixing (a 100 TB tail of near-empty categories
    * wrecks both). Output is the MERGED distribution (category, n_rows,
    * share_ppm) in exact ppm integers, so the policy replays
    * bit-for-bit in any engine.
    *
    * Scale shape: one map-side-combined count keyed by category, a
    * single-row total broadcast (the scalar-attach pattern), then a
    * category-sized re-aggregation — nothing after the first shuffle
    * touches corpus rows. */
  def rareCategoryMerge(df: DataFrame, catCol: String, minSharePpm: Long,
                        otherLabel: String = "__OTHER__"): DataFrame = {
    require(minSharePpm >= 1 && minSharePpm <= 1000000L,
      s"minSharePpm must be in [1, 1e6], got $minSharePpm")
    val c = df.groupBy(col(catCol).cast("string").as("__cat"))
      .agg(count(lit(1)).as("__n"))
    val tot = c.agg(greatest(sum(col("__n")), lit(1L)).as("__t"))
    c.crossJoin(broadcast(tot))
      .withColumn("category",
        when(expr(s"__n * 1000000L div __t >= ${minSharePpm}L"), col("__cat"))
          .otherwise(lit(otherLabel)))
      .groupBy(col("category"))
      .agg(sum(col("__n")).as("n_rows"), max(col("__t")).as("__t"))
      .withColumn("share_ppm", expr("n_rows * 1000000L div __t"))
      .drop("__t")
  }

  /** Gini coefficient per group over NON-NEGATIVE integer cents — the
    * rank-based inequality read for continuous values (the
    * [[concentrationIndex]] sibling for a numeric column):
    * G = (2·Σ rank·x − (n+1)·Σx) / (n·Σx), ranks ascending by
    * (value, ties). Tied values contribute a rank-sum independent of
    * tie-break order, so the statistic is deterministic. Integer ppm
    * with a THREE-branch self-switching division (exact ×1e6 while
    * n·Σx ≤ 9e12, then the ×1000 and ×1 remainder splits — identical
    * CASE in the oracle). Output: group, n, sum_cents, gini_ppm.
    *
    * Scale shape: ranks ride [[bucketedGroupRank]] (two-phase, no
    * group ever serializes into one task), then one
    * map-side-combined aggregate. Envelope: Σ rank·x must fit Int64
    * (~n²·x̄ — shard groups past ~1e8 rows of large cents). */
  def giniIndex(df: DataFrame, groupCol: String, centsCol: String,
                tieCols: Seq[String], buckets: Int = 64): DataFrame = {
    val ranked = bucketedGroupRank(
      df.select((col(groupCol) +: col(centsCol).cast("long").as("__x") +:
        tieCols.map(col)): _*), groupCol, "__x", tieCols, buckets)
    ranked.groupBy(col(groupCol))
      .agg(max(col("__gn")).as("n"),
        sum(col("__x")).as("sum_cents"),
        sum(expr("__rank * __x")).as("__srx"))
      .withColumn("__num", expr("2 * __srx - (n + 1) * sum_cents"))
      .withColumn("__den", expr("n * sum_cents"))
      .withColumn("gini_ppm", expr(
        "CASE WHEN __den <= 0 THEN 0L " +
        "WHEN __den <= 9000000000000L THEN __num * 1000000L div __den " +
        "WHEN __den <= 9000000000000000L THEN " +
        "  (__num div __den) * 1000000L + " +
        "  ((__num % __den) * 1000L) div greatest(__den div 1000L, 1L) " +
        "ELSE (__num div __den) * 1000000L + " +
        "  (__num % __den) div greatest(__den div 1000000L, 1L) END"))
      .select(col(groupCol), col("n"), col("sum_cents"), col("gini_ppm"))
  }

  /** Herfindahl–Hirschman concentration per group: HHI = Σ share_i²
    * over `catCol` within each `groupCol`, in exact ppm — 1e6/k for a
    * uniform split over k categories, 1e6 for a monopoly. The
    * concentration read a mixing pipeline runs per source/shard before
    * trusting a "balanced" corpus. Integer arithmetic self-switches
    * (the chiSquareSampled pattern — same CASE in the oracle): the
    * direct Σ n_i²·1e6 div N² while N ≤ 3e6 (provably no Int64
    * overflow), else quotient·1e6 plus the remainder against a
    * 1e-6-truncated divisor — deterministic in both engines, exact to
    * the last ppm digit in the regime the small fixtures exercise.
    * N² itself must fit Int64 (groups ≤ ~3e9 rows; shard beyond).
    * Output: group, n, k_categories, hhi_ppm.
    *
    * Scale shape: one map-side-combined (group, cat) count, then a
    * group-keyed re-aggregation over category-sized frames. */
  def concentrationIndex(df: DataFrame, groupCol: String,
                         catCol: String): DataFrame =
    df.groupBy(col(groupCol), col(catCol).as("__cat"))
      .agg(count(lit(1)).as("__n"))
      .groupBy(col(groupCol))
      .agg(sum(col("__n")).as("n"),
        countDistinct(col("__cat")).cast("long").as("k_categories"),
        sum(col("__n") * col("__n")).as("__ss"))
      .withColumn("hhi_ppm", expr(
        "CASE WHEN n <= 3000000L THEN __ss * 1000000L div (n * n) " +
        "ELSE (__ss div (n * n)) * 1000000L + " +
        "(__ss % (n * n)) div greatest((n * n) div 1000000L, 1L) END"))
      .drop("__ss")

  /** Simpson concentration index per group (Simpson 1949, "Measurement
    * of diversity"): the probability two random rows drawn WITHOUT
    * replacement share a category — Σ n_i(n_i−1) / (N(N−1)) in exact
    * ppm (1e6 − simpson_ppm is the Gini–Simpson diversity). The
    * without-replacement form is the unbiased estimator and the one
    * whose numerator stays integral; the [[concentrationIndex]] HHI is
    * its with-replacement sibling. Groups with fewer than two rows
    * report 0 (no pair to draw). Same self-switching overflow split
    * and N ≤ ~3e9 envelope as HHI — identical CASE in the oracle.
    *
    * Scale shape: one map-side-combined (group, cat) count, then a
    * group-keyed re-aggregation over category-sized frames. */
  def simpsonIndex(df: DataFrame, groupCol: String,
                   catCol: String): DataFrame =
    df.groupBy(col(groupCol), col(catCol).as("__cat"))
      .agg(count(lit(1)).as("__n"))
      .groupBy(col(groupCol))
      .agg(sum(col("__n")).as("n"),
        countDistinct(col("__cat")).cast("long").as("k_categories"),
        sum(col("__n") * (col("__n") - 1)).as("__ss"))
      .withColumn("simpson_ppm", expr(
        "CASE WHEN n < 2 THEN 0L " +
        "WHEN n <= 3000000L THEN __ss * 1000000L div (n * (n - 1)) " +
        "ELSE (__ss div (n * (n - 1))) * 1000000L + " +
        "(__ss % (n * (n - 1))) div greatest((n * (n - 1)) div 1000000L, 1L) END"))
      .drop("__ss")

  /** Apply-variant of [[rareCategoryMerge]]: returns the INPUT ROWS
    * with `catCol` rewritten — categories below the share threshold
    * become `otherLabel`, everything else passes through (NULL
    * categories count as a category of their own via the same string
    * cast, so their share decides like any other). This is what a
    * pipeline consumes; the sibling returns the merged distribution.
    *
    * Scale shape: the keep-set is at most distinct(cat) rows and
    * arrives at the corpus via a BROADCAST join — corpus rows are
    * touched exactly once, no corpus-sized shuffle. */
  def applyRareMerge(df: DataFrame, catCol: String, minSharePpm: Long,
                     otherLabel: String = "__OTHER__"): DataFrame = {
    require(minSharePpm >= 1 && minSharePpm <= 1000000L,
      s"minSharePpm must be in [1, 1e6], got $minSharePpm")
    val c = df.groupBy(col(catCol).cast("string").as("__cat"))
      .agg(count(lit(1)).as("__n"))
    val tot = c.agg(greatest(sum(col("__n")), lit(1L)).as("__t"))
    // the survival marker is a separate flag: a surviving NULL
    // category must pass through as NULL, which __cat itself can't
    // signal after the null-safe join
    val keep = c.crossJoin(broadcast(tot))
      .filter(expr(s"__n * 1000000L div __t >= ${minSharePpm}L"))
      .select(col("__cat"), lit(1).as("__keep"))
    df.join(broadcast(keep),
        col(catCol).cast("string") <=> col("__cat"), "left")
      .withColumn(catCol,
        when(col("__keep").isNotNull, col(catCol).cast("string"))
          .otherwise(lit(otherLabel)))
      .drop("__cat", "__keep")
  }

  /** Distributed prefix sums over a totally-ordered axis: cum_<col>
    * running totals of each `valCols` in `orderCol` order, without a
    * global-sort window. Two-phase: range-bucket the axis (bounds from
    * a single-row broadcast — the BM25 attach pattern), per-bucket
    * partials prefix-summed over a ≤`buckets`-row frame, then local
    * running sums inside each bucket partition. The only partition-less
    * window rides the `buckets`-row partial frame regardless of input
    * size. (`orderCol`, `tieCols`) must totalize the order; equal
    * `orderCol` values always land in the SAME range bucket, so the
    * tie-break only ever resolves within one bucket's local window. */
  def distributedCumSum(df: DataFrame, orderCol: String,
                        valCols: Seq[String], buckets: Int = 64,
                        tieCols: Seq[String] = Nil): DataFrame = {
    require(valCols.nonEmpty && buckets >= 1)
    val bounds = df.agg(min(col(orderCol).cast("double")).as("__lo"),
      max(col(orderCol).cast("double")).as("__hi"))
    val bucketed = df.crossJoin(broadcast(bounds))
      .withColumn("__b",
        when(col("__hi") === col("__lo"), lit(0))
          .otherwise(least(lit(buckets - 1), floor(
            (col(orderCol).cast("double") - col("__lo")) /
              (col("__hi") - col("__lo")) * buckets).cast("int"))))
      .drop("__lo", "__hi")
    val partialAggs = valCols.map(c => sum(col(c)).as(s"__s_$c"))
    val partials = bucketed.groupBy(col("__b"))
      .agg(partialAggs.head, partialAggs.tail: _*)
    val wPrefix = Window.orderBy(col("__b").asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val prefixed = valCols.foldLeft(partials) { (d, c) =>
      d.withColumn(s"__p_$c",
        coalesce(sum(col(s"__s_$c")).over(wPrefix), lit(0L)))
    }.select(col("__b") +: valCols.map(c => col(s"__p_$c")): _*)
    val wLocal = Window.partitionBy(col("__b"))
      .orderBy((col(orderCol).asc +: tieCols.map(col(_).asc)): _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    valCols.foldLeft(bucketed.join(broadcast(prefixed), Seq("__b"))) {
      (d, c) =>
        d.withColumn(s"cum_$c",
          (col(s"__p_$c") + sum(col(c)).over(wLocal)).cast("long"))
    }.drop("__b" +: valCols.map(c => s"__p_$c"): _*)
  }

  /** Cohort LTV: users cohorted by their first period, revenue summed
    * per (cohort, period offset) with a running cumulative. The cumsum
    * window partitions by cohort — frames are periods-per-cohort sized,
    * never user-sized. */
  def cohortLtv(df: DataFrame, userCol: String, periodCol: String,
                centsCol: String): DataFrame = {
    val firstP = df.groupBy(col(userCol))
      .agg(min(col(periodCol)).as("__cohort"))
    df.join(firstP, userCol)
      .groupBy(col("__cohort").as("cohort"),
        (col(periodCol) - col("__cohort")).as("offset"))
      .agg(sum(col(centsCol)).as("cents"),
        countDistinct(col(userCol)).as("n_users"))
      .withColumn("cum_cents",
        sum(col("cents")).over(Window.partitionBy(col("cohort"))
          .orderBy(col("offset").asc)).cast("long"))
  }

  /** Daily churn: an active user churns on day d when their next
    * active day is > d+1 (or never). The last observed day is censored
    * out via a single-row max-day broadcast (bnljAllowed pattern).
    * Input must be (user, day) DISTINCT actives. */
  def dailyChurn(actives: DataFrame, userCol: String,
                 dayCol: String): DataFrame = {
    val w = Window.partitionBy(col(userCol)).orderBy(col(dayCol).asc)
    val l = actives.withColumn("__nxt", lead(col(dayCol), 1).over(w))
    val mx = actives.agg(max(col(dayCol)).as("__maxd"))
    l.crossJoin(broadcast(mx)).filter(col(dayCol) < col("__maxd"))
      .groupBy(col(dayCol))
      .agg(count(lit(1)).as("n_active"),
        count(when(col("__nxt").isNull || col("__nxt") > col(dayCol) + 1,
          1)).as("n_churned"))
      .withColumn("churn_ppm", expr("n_churned * 1000000 div n_active"))
  }

  /** Growth curve: new users (first-ever active day) per day plus the
    * cumulative distinct-user total. The running window is global but
    * rides the day-sized frame (one row per day —
    * globalWindowAllowed). */
  def userGrowth(actives: DataFrame, userCol: String,
                 dayCol: String): DataFrame = {
    val nf = actives.groupBy(col(userCol)).agg(min(col(dayCol)).as("__fd"))
      .groupBy(col("__fd").as(dayCol)).agg(count(lit(1)).as("n_new"))
    actives.select(col(dayCol)).distinct()
      .join(nf, Seq(dayCol), "left").na.fill(0L, Seq("n_new"))
      .withColumn("cum_users",
        sum(col("n_new")).over(Window.orderBy(col(dayCol).asc)).cast("long"))
  }

  /** Day-over-day trending ranks: per day, categories ranked by count
    * (count desc, category asc), each joined to its own previous-day
    * rank — `rank_delta` positive = rising. The rank window partitions
    * by DAY (bounded by the category domain per partition, never
    * corpus-wide) and the self-join is a plain equi-join on
    * (day, category). `dayCol` is an epoch-day BIGINT so the
    * previous-day key is exact integer arithmetic. */
  def trendingRanks(df: DataFrame, dayCol: String,
                    catCol: String): DataFrame = {
    val daily = df.groupBy(col(dayCol).as("day"), col(catCol).as("cat"))
      .agg(count(lit(1)).as("n"))
    val w = Window.partitionBy(col("day"))
      .orderBy(col("n").desc, col("cat").asc)
    val ranked = daily.withColumn("rank",
      row_number().over(w).cast("long"))
    val prev = ranked.select(col("cat"), (col("day") + 1).as("day"),
      col("rank").as("prev_rank"))
    ranked.join(prev, Seq("day", "cat"), "left")
      .withColumn("rank_delta", col("prev_rank") - col("rank"))
  }

  /** Gini split gain of a categorical feature against a label (the
    * CART split criterion as a standalone feature-relevance report):
    * corpus impurity, the feature-weighted impurity, and their
    * difference — gain 0 means the feature carries no label signal.
    * The corpus is touched ONCE (one map-side-combined count over the
    * (feature, label) domain); every Gini term derives from that
    * domain-sized table in exact integer ppm (Σc² ratios, truncating
    * div — replayed verbatim by the oracle). */
  def giniGain(df: DataFrame, featureCol: String,
               labelCol: String): DataFrame = {
    val vc = df.groupBy(col(featureCol).as("__f"), col(labelCol).as("__l"))
      .agg(count(lit(1)).as("__c"))
    val nDf = vc.agg(sum(col("__c")).as("n"))
    val cls = vc.groupBy(col("__l")).agg(sum(col("__c")).as("__c"))
    val g0 = cls.crossJoin(broadcast(nDf))
      .agg(expr("1000000 - sum(__c * __c) * 1000000 div (max(n) * max(n))")
        .as("gini_ppm"))
    val vg = vc.groupBy(col("__f"))
      .agg(sum(col("__c")).as("__nv"),
        expr("1000000 - sum(__c * __c) * 1000000 div " +
          "(sum(__c) * sum(__c))").as("__gv"))
    val w = vg.crossJoin(broadcast(nDf))
      .agg(expr("sum(__nv * __gv) div max(n)").as("weighted_gini_ppm"))
    nDf.crossJoin(broadcast(g0)).crossJoin(broadcast(w))
      .withColumn("gain_ppm", col("gini_ppm") - col("weighted_gini_ppm"))
  }

  /** Benford first-significant-digit profile: counts plus observed ppm
    * share, all-integer; the total rides a single-row broadcast. */
  def benford(df: DataFrame, numCol: String): DataFrame = {
    val d = df.select(substring(floor(col(numCol)).cast("long")
      .cast("string"), 1, 1).as("digit"))
    val total = d.agg(count(lit(1)).as("__n"))
    d.groupBy(col("digit")).agg(count(lit(1)).as("n"))
      .crossJoin(broadcast(total))
      .select(col("digit"), col("n"),
        expr("n * 1000000L div __n").as("share_ppm"))
  }

  /** A/B lift report from one row per user (variant, converted?):
    * per-variant conversion rates and lift vs the `control` variant in
    * ppm. The control rate attaches via a window over the
    * variants-sized frame (globalWindowAllowed). Lift is NULL when the
    * control variant converted zero users (the ratio is undefined and
    * the integer div would throw under ANSI mode) or is absent from
    * the data entirely. */
  def abLift(perUser: DataFrame, variantCol: String, convCol: String,
             control: Long = 0L): DataFrame = {
    val v = perUser.groupBy(col(variantCol))
      .agg(count(lit(1)).as("n_users"),
        count(when(col(convCol), 1)).as("n_conv"))
      .withColumn("rate_ppm", expr("n_conv * 1000000 div n_users"))
    v.withColumn("__ctrl", max(when(col(variantCol) === control,
        col("rate_ppm"))).over(Window.partitionBy()))
      .withColumn("lift_ppm", expr(s"CASE WHEN $variantCol <> $control " +
        "AND __ctrl > 0 THEN " +
        "(rate_ppm - __ctrl) * 1000000 div __ctrl END"))
      .drop("__ctrl")
  }

  /** Share-of-total in exact ppm appended as `outCol`; the total rides
    * a window over the already-aggregated (group-sized) frame. */
  def shareOfTotal(df: DataFrame, valCol: String,
                   outCol: String): DataFrame =
    df.withColumn(outCol,
      expr(s"$valCol * 1000000 div (sum($valCol) OVER ())"))

  /** Period-over-period delta in ppm via lag over the period-sized
    * frame (one row per period — globalWindowAllowed). */
  def periodDelta(df: DataFrame, orderCol: String,
                  valCol: String): DataFrame =
    df.withColumn("__prev", lag(col(valCol), 1).over(
        Window.orderBy(col(orderCol).asc)))
      .withColumn("delta_ppm", expr(
        s"CASE WHEN __prev IS NOT NULL " +
          s"THEN ($valCol - __prev) * 1000000 div __prev END"))
      .drop("__prev")

  /** Per-group freshness: latest timestamp and its lag behind the
    * global max (the monitoring "how stale is each feed" view). The
    * global-max window rides one row per group
    * (globalWindowAllowed). */
  def freshnessLag(df: DataFrame, groupCol: String,
                   tsCol: String): DataFrame =
    df.groupBy(col(groupCol))
      .agg(max(col(tsCol)).as("max_ts"))
      .withColumn("lag_us",
        max(col("max_ts")).over(Window.partitionBy()) - col("max_ts"))

  /** Integer span stats per group: n, truncated mean, min, max —
    * output columns named after `valCol` (avg_<v>, min_<v>, max_<v>).
    * One partial-aggregated exchange. */
  def spanStats(df: DataFrame, groupCol: String,
                valCol: String): DataFrame =
    df.groupBy(col(groupCol))
      .agg(count(lit(1)).as("n"), sum(col(valCol)).as("__s"),
        min(col(valCol)).as(s"min_$valCol"),
        max(col(valCol)).as(s"max_$valCol"))
      .select(col(groupCol), col("n"), expr("__s div n").as(s"avg_$valCol"),
        col(s"min_$valCol"), col(s"max_$valCol"))

  /** EXACT global ntile(k) without the single-partition sort: Spark's
    * `ntile(k).over(Window.orderBy(...))` serializes the WHOLE input
    * into one task — the one plan shape that cannot survive a 100x
    * scale-up. This computes the identical bucket labels via the
    * nucleusTopP two-phase global rank:
    *
    *   - range-bucket on the (numeric) order value (single-row min/max
    *     broadcast; equal values always share a bucket, so bucket asc
    *     is consistent with value asc),
    *   - per-bucket counts -> a ≤`buckets`-row prefix table (the one
    *     partition-less window, bounded by construction),
    *   - PARALLEL per-bucket row_number; global rank = prefix + local,
    *   - ntile label from the rank in pure integer arithmetic with
    *     Spark's own bucket-size convention (first n mod k buckets get
    *     the extra row).
    *
    * `tieCols` must totalize the order (ntile of a non-total order is
    * not well defined across engines). Equivalence with the built-in
    * is property-pinned in AnalyticsSpec. */
  def ntileDistributed(df: DataFrame, k: Int, valCol: String,
                       tieCols: Seq[String], outCol: String,
                       buckets: Int = 64): DataFrame = {
    require(k >= 1, s"k must be positive, got $k")
    require(buckets >= 1)
    val bounds = df.agg(min(col(valCol).cast("double")).as("__lo"),
      max(col(valCol).cast("double")).as("__hi"),
      count(lit(1)).as("__n"))
    // Same null-to-bucket-0 rule as bucketedGroupRank: built-in ntile
    // over an asc order ranks nulls first, so nulls must not fall into
    // the top bucket via least()'s null-skipping.
    val bucketed = df.crossJoin(broadcast(bounds))
      .withColumn("__b",
        when(col(valCol).isNull, lit(0))
          .when(col("__hi") === col("__lo"), lit(0))
          .otherwise(least(lit(buckets - 1), floor(
            (col(valCol).cast("double") - col("__lo")) /
              (col("__hi") - col("__lo")) * buckets).cast("int"))))
    val prefixes = bucketed.groupBy(col("__b"))
      .agg(count(lit(1)).as("__bn"))
      .withColumn("__prefix",
        coalesce(sum(col("__bn")).over(Window.orderBy(col("__b").asc)
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .drop("__bn")
    val wLocal = Window.partitionBy(col("__b"))
      .orderBy((col(valCol).asc +: tieCols.map(col(_).asc)): _*)
    bucketed
      .join(broadcast(prefixes), Seq("__b"))
      .withColumn("__rank", col("__prefix") + row_number().over(wLocal))
      // Spark ntile: size = n div k, rem = n mod k; the first `rem`
      // buckets carry size+1 rows. CASE is lazy, so the div-by-size
      // branch never evaluates when n < k (size = 0).
      .withColumn(outCol, expr(
        s"CASE WHEN __rank <= (__n % $k) * ((__n div $k) + 1) " +
          s"THEN (__rank - 1) div ((__n div $k) + 1) + 1 " +
          s"ELSE (__n % $k) + " +
          s"(__rank - (__n % $k) * ((__n div $k) + 1) - 1) div (__n div $k) " +
          "+ 1 END").cast("long"))
      .drop("__b", "__lo", "__hi", "__n", "__prefix", "__rank")
  }

  /** Readability profile: words/sentence and chars/word in exact ppm —
    * the Flesch-style signals without the float formula. Pure
    * projection (one codegen stage, no shuffle). */
  def readability(df: DataFrame, idCol: String,
                  textCol: String): DataFrame =
    df.select(col(idCol),
      size(filter(split(trim(coalesce(col(textCol), lit(""))), "\\s+"),
        t => length(t) > 0)).cast("long").as("n_words"),
      greatest(size(filter(split(coalesce(col(textCol), lit("")),
        "[.!?]+"), s => length(trim(s)) > 0)), lit(1)).cast("long")
        .as("n_sentences"),
      length(regexp_replace(coalesce(col(textCol), lit("")), "\\s", ""))
        .cast("long").as("__nc"))
      .withColumn("wps_ppm", expr("n_words * 1000000 div n_sentences"))
      .withColumn("cpw_ppm", expr(
        "CASE WHEN n_words > 0 THEN __nc * 1000000 div n_words END"))
      .drop("__nc")

  /** Lag-k autocorrelation of the daily row-count series (the sample
    * ACF of Box & Jenkins over lag-aligned pairs), exact up to one
    * final IEEE step. The corpus collapses to ONE map-side-combined
    * daily aggregation; the lag alignment is a self-join of that
    * bounded table (AQE broadcasts it), so nothing downstream exceeds
    * maxLag·days rows. Sufficient statistics are exact BIGINT SUMS
    * (Σy² stays in range while daily counts stay under
    * ~sqrt(9.2e18/days) ≈ 3e7 on a 30-year span — the documented
    * bound, pmiCollocations-style); the n·Σxy-shaped PRODUCTS are
    * taken in double so they can never overflow, and every double op
    * (cast/mul/sub/div/sqrt) is correctly rounded IEEE over the same
    * exact integer inputs — the oracle replays the ppm bit-for-bit
    * by running the SAME ops in the SAME order. */
  def autocorrelation(df: DataFrame, tsCol: String, maxLag: Int): DataFrame = {
    require(maxLag >= 1, s"maxLag must be positive, got $maxLag")
    val daily = df.groupBy(col(tsCol).cast("date").as("day"))
      .agg(count(lit(1)).as("n"))
    val base = daily.select(col("day").as("day_a"), col("n").as("x"))
    val lagged = daily.select(
      explode(sequence(lit(1), lit(maxLag))).as("lag"),
      col("day").as("day_b"), col("n").as("y"))
    // equi-join form: day_a + lag = day_b rewritten so each side of
    // the predicate touches ONE frame (date_add(day_a, lag) mixes
    // both, forcing a nested-loop join; date_sub(day_b, lag) is pure
    // right side, so this hash-partitions on the derived day key)
    val s = base
      .join(lagged,
        col("day_a") === date_sub(col("day_b"), col("lag").cast("int")))
      .groupBy(col("lag"))
      .agg(count(lit(1)).as("n"),
        sum(col("x")).as("sx"), sum(col("y")).as("sy"),
        sum(col("x") * col("y")).as("sxy"),
        sum(col("x") * col("x")).as("sxx"),
        sum(col("y") * col("y")).as("syy"))
    val nD = col("n").cast("double")
    val num = nD * col("sxy").cast("double") -
      col("sx").cast("double") * col("sy").cast("double")
    val varx = nD * col("sxx").cast("double") -
      col("sx").cast("double") * col("sx").cast("double")
    val vary = nD * col("syy").cast("double") -
      col("sy").cast("double") * col("sy").cast("double")
    // Degenerate-series guard: a constant series (varx or vary = 0)
    // would divide by zero → Infinity, and the cast("long") of a
    // non-finite double THROWS under Spark 4's default ANSI mode,
    // failing the whole query. rho is undefined there → NULL.
    s.select(col("lag").cast("long").as("lag"), col("n"),
        when(varx > 0 && vary > 0,
          round(lit(1e6) * num / (sqrt(varx) * sqrt(vary))).cast("long"))
          .as("rho_ppm"))
      .orderBy(col("lag"))
  }

  /** Per-group OLS trend of a daily BIGINT series: slope (units/day)
    * and fit quality in exact-integer-fed ppm. Same numeric
    * discipline as [[autocorrelation]]: one daily aggregation bounds
    * everything at distinct (group, day) rows; sufficient stats are
    * exact BIGINT SUMS (x = days since 1992-01-01 stays ≤ ~13k;
    * Σy² stays in range while daily group totals stay under
    * ~sqrt(9.2e18/days) — callers keep units coarse, dollars not
    * cents, the pmiCollocations documented-bound pattern); the
    * n·Σxy-shaped products are taken in double so they never
    * overflow, and slope and r² are same-order correctly-rounded
    * IEEE steps, replayed verbatim by the oracle. */
  def trendSlopes(df: DataFrame, groupCol: String, dayCol: String,
                  valCol: String): DataFrame = {
    val daily = df.groupBy(col(groupCol).as("grp"), col(dayCol).as("day"))
      .agg(sum(col(valCol)).as("y"))
      .select(col("grp"),
        datediff(col("day"), to_date(lit("1992-01-01"))).cast("long").as("x"),
        col("y"))
    val s = daily.groupBy(col("grp"))
      .agg(count(lit(1)).as("n_days"),
        sum(col("x")).as("sx"), sum(col("y")).as("sy"),
        sum(col("x") * col("y")).as("sxy"),
        sum(col("x") * col("x")).as("sxx"),
        sum(col("y") * col("y")).as("syy"))
    val nD = col("n_days").cast("double")
    val num = nD * col("sxy").cast("double") -
      col("sx").cast("double") * col("sy").cast("double")
    val den = nD * col("sxx").cast("double") -
      col("sx").cast("double") * col("sx").cast("double")
    val vary = nD * col("syy").cast("double") -
      col("sy").cast("double") * col("sy").cast("double")
    // Degenerate-group guards, matching funnelRates' div discipline:
    // a single-day group has den = 0 (slope undefined), a constant
    // series has vary = 0 (r² undefined) — unguarded they produce
    // Infinity/NaN and the cast("long") throws under ANSI mode.
    s.select(col("grp"), col("n_days"),
        when(den > 0, round(lit(1e6) * num / den).cast("long"))
          .as("slope_ppm"),
        when(den > 0 && vary > 0,
          round(lit(1e6) * num * num / (den * vary)).cast("long"))
          .as("r2_ppm"))
      .orderBy(col("grp"))
  }
}
