package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Privacy-risk reports over anonymized outputs — the QA step after the
  * faker/nullify pipeline runs (Sweeney 2002, "k-anonymity: a model for
  * protecting privacy"; Machanavajjhala et al. 2007, "l-diversity").
  * The reference anonymizes; these operators measure whether the result
  * is actually safe to release.
  *
  * Both are one map-side-combined aggregation whose output is bounded
  * by the number of VIOLATING quasi-identifier groups — at 100 TB the
  * report stays small precisely when the data is safe, and when it is
  * not, the report is the work list.
  */
object Privacy {

  /** Quasi-identifier groups smaller than k — each one a re-
    * identification risk (an attacker knowing the QI values pins the
    * individual to < k candidates). Returns (QI columns..., n) for
    * violating groups only. */
  def kAnonymityViolations(df: DataFrame, quasiCols: Seq[String],
                           k: Long): DataFrame = {
    require(quasiCols.nonEmpty && k >= 1)
    df.groupBy(quasiCols.map(col): _*)
      .agg(count(lit(1)).as("n"))
      .filter(col("n") < k)
  }

  /** Quasi-identifier groups whose SENSITIVE column takes fewer than l
    * distinct values — k-anonymous groups can still leak by value
    * homogeneity (everyone in the group shares the diagnosis). Returns
    * (QI columns..., n, n_distinct_sensitive) for violating groups. */
  def lDiversityViolations(df: DataFrame, quasiCols: Seq[String],
                           sensitiveCol: String, l: Long): DataFrame = {
    require(quasiCols.nonEmpty && l >= 1)
    df.groupBy(quasiCols.map(col): _*)
      .agg(count(lit(1)).as("n"),
        countDistinct(col(sensitiveCol)).as("n_distinct_sensitive"))
      .filter(col("n_distinct_sensitive") < l)
  }
}
