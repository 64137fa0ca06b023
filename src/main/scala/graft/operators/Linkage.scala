package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Record-linkage scoring — the entity-resolution step after blocking
  * (Fellegi & Sunter 1969, "A theory for record linkage"): candidate
  * pairs inside a block score the SUM of per-field agreement weights
  * (+w_agree when the field comparator agrees, −w_disagree when it
  * does not), and pairs at or above the decision threshold are
  * declared links. Weights are ppm integer LITERALS supplied by the
  * caller (in production they come from EM-estimated m/u probabilities
  * as log-odds; fixing them as integers is what makes the decision
  * replay bit-for-bit in any engine — the same reason the DP tier
  * bakes its cutpoints).
  *
  * Scale shape: the block equi-join bounds the quadratic — pair work
  * is Σ_b |block_b|², never corpus², which is the standard ER posture
  * (choose block keys so the hottest block fits; the key-skew profile
  * operator is the audit for that). Per pair, scoring is a codegen'd
  * projection; the output is the LINKS, report-sized when the
  * threshold is meaningful.
  */
object Linkage {

  /** One field comparator: `col` is projected from both sides, `same`
    * builds the agreement predicate over (left, right). A NULL
    * comparison counts as disagreement (standard FS treatment of
    * missing fields: no evidence FOR the link). */
  final case class FieldRule(col: String, same: (Column, Column) => Column,
                             wAgreePpm: Long, wDisagreePpm: Long) {
    require(wAgreePpm > 0 && wDisagreePpm > 0,
      s"weights must be positive ppm, got +$wAgreePpm/-$wDisagreePpm")
  }

  /** Equality comparator — the common case. */
  def eq(col: String, wAgreePpm: Long, wDisagreePpm: Long): FieldRule =
    FieldRule(col, (a, b) => a === b, wAgreePpm, wDisagreePpm)

  def scorePairs(df: DataFrame, idCol: String, blockCols: Seq[String],
                 rules: Seq[FieldRule], thresholdPpm: Long): DataFrame = {
    require(blockCols.nonEmpty, "linkage needs at least one block key")
    require(rules.nonEmpty, "linkage needs at least one field rule")
    def side(tag: String) = df.select(
      (col(idCol).as(s"id_$tag") +: blockCols.map(col)) ++
        rules.map(r => col(r.col).as(s"__${tag}_${r.col}")): _*)
    val paired = side("a").join(side("b"), blockCols)
      .filter(col("id_a") < col("id_b"))
    val agrees = rules.map(r =>
      coalesce(r.same(col(s"__a_${r.col}"), col(s"__b_${r.col}")), lit(false)))
    val score = rules.zip(agrees).map { case (r, ok) =>
      when(ok, lit(r.wAgreePpm)).otherwise(lit(-r.wDisagreePpm))
    }.reduce(_ + _)
    val pattern = concat(agrees.map(ok => when(ok, lit("A")).otherwise(lit("D"))): _*)
    paired
      .withColumn("pattern", pattern)
      .withColumn("score_ppm", score.cast("long"))
      .filter(col("score_ppm") >= thresholdPpm)
      .select(col("id_a"), col("id_b"), col("pattern"), col("score_ppm"))
  }
}
