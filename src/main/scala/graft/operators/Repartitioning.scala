package graft.operators

import org.apache.spark.sql.{Column, DataFrame}

/** Parallelism repair for under-split scans.
  *
  * A parquet scan's partition count comes from its file/row-group
  * layout. A real multi-file corpus (the 100 TB case) splits into far
  * more partitions than cores and needs nothing; a single-row-group
  * file (the local testdata case) yields ONE task no matter how many
  * cores exist, serializing every downstream kernel. The fix for the
  * latter — `repartition(key)` — is a full-input shuffle, which must
  * never leak into production plans (round-4 verdict item #3: an
  * unconditional repartition here becomes a full corpus exchange
  * before any pruning at scale).
  *
  * [[ensureParallelism]] applies the repair ONLY when the scan is
  * actually starved: fewer physical partitions than `minFraction` of
  * the session's default parallelism. On a healthy layout it returns
  * the input DataFrame unchanged (same plan object — zero added
  * exchanges, asserted in PlanAuditSpec).
  */
object Repartitioning {

  /** Repartition `df` by `key` iff its physical scan yields fewer
    * partitions than `minFraction * defaultParallelism`. Inspecting
    * the partition count plans the scan (file listing) but runs no
    * job; the scan would list files anyway on first use.
    */
  def ensureParallelism(df: DataFrame, key: Column,
                        minFraction: Double = 0.5): DataFrame = {
    val target = math.max(1,
      math.ceil(df.sparkSession.sparkContext.defaultParallelism * minFraction).toInt)
    if (df.rdd.getNumPartitions < target) df.repartition(key) else df
  }
}
