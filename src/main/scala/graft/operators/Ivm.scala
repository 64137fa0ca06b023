package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental view maintenance for distributive aggregates.
  *
  * A partitioned aggregate view (counts / sums keyed by dimensions) is
  * refreshed by aggregating ONLY the new partition and merging it into
  * the stored view — never rescanning the base. The merge is a
  * groupBy-sum over (base ∪ delta) partial rows; for distributive
  * measures (count, sum over integers) merge(aggr(A), aggr(B)) ==
  * aggr(A ∪ B) exactly, which the oracle — a full recompute — pins.
  *
  * Scale shape: at 100 TB the base view is orders of magnitude smaller
  * than the base table (one row per key), so the refresh costs one scan
  * of the delta plus a shuffle of |view| + |delta-agg| rows. Retractions
  * (CDC deletes) fold in as negated measures by the same merge.
  */
object Ivm {

  /** Merge two partial aggregates of the same additive view. Every
    * non-key column is treated as an additive measure and summed;
    * integer measures stay integer (sum(LongType) is LongType). */
  def mergeAdditive(base: DataFrame, delta: DataFrame,
      keys: Seq[String]): DataFrame = {
    val measures = base.columns.filterNot(keys.contains)
    require(measures.nonEmpty, "view has no measure columns")
    val aggs = measures.map(m => sum(col(m)).as(m))
    base.unionByName(delta)
      .groupBy(keys.map(col): _*)
      .agg(aggs.head, aggs.tail: _*)
  }
}
