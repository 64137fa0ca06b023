package graft.operators

import org.apache.spark.sql.DataFrame
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
}
