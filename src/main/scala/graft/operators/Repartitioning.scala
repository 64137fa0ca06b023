package graft.operators

import org.apache.spark.internal.Logging
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.execution.FileSourceScanExec

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
  * the input DataFrame unchanged — literally the same object, so zero
  * added exchanges (both branches asserted in PlanAuditSpec: healthy
  * multi-file scan ⇒ `eq` input / no Exchange; single-file scan ⇒
  * repartition present).
  *
  * The partition probe reads the non-adaptive physical plan's file-scan
  * leaves ([[FileSourceScanExec]]) and sums their split counts — file
  * listing only, no job, and (unlike a `df.rdd` probe) it never
  * materializes AQE query stages when the input carries joins or
  * shuffles. A plan with no file-scan leaf (in-memory test data, JDBC)
  * reports Int.MaxValue — i.e. "not starved", repair declines: the
  * operator targets scans, and guessing for other sources would risk
  * an unobserved full-input shuffle.
  */
object Repartitioning extends Logging {

  /** Total split count across the plan's scan leaves — DSv1
    * ([[FileSourceScanExec]]) and DSv2
    * ([[org.apache.spark.sql.execution.datasources.v2.BatchScanExec]]:
    * parquet with v1 disabled, Delta/Iceberg-style sources) alike, so
    * the starvation repair can't be silently defeated by the source API
    * in use. Int.MaxValue when the plan has no scan leaf (in-memory,
    * JDBC — never "starved"). */
  def scanPartitions(df: DataFrame): Int = {
    val counts = df.queryExecution.sparkPlan.collectLeaves().collect {
      case f: FileSourceScanExec => f.inputRDDs().map(_.getNumPartitions).sum
      case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec =>
        b.inputPartitions.length
    }
    if (counts.isEmpty) Int.MaxValue else counts.sum
  }

  /** Repartition `df` by `key` iff its file scan yields fewer splits
    * than `minFraction * defaultParallelism`. When the repair fires it
    * logs the observed/target counts — on a production corpus this
    * firing means compacted/undersplit input and a full-input shuffle,
    * which should be visible, not silent.
    *
    * The repair PINS the partition count to the session's default
    * parallelism (`repartition(n, key)`, shuffle origin
    * REPARTITION_BY_NUM) instead of the keyless-count form
    * (`repartition(key)`, REPARTITION_BY_COL). The difference is AQE:
    * coalescePartitions folds a BY_COL shuffle back down BY BYTES
    * (minPartitionSize, 1 MB), and the starved inputs this repair
    * exists for are exactly the byte-small / CPU-heavy ones (a few MB
    * of ids+text feeding comparator or shingle kernels) — AQE would
    * merge the repaired shuffle straight back to 1-2 tasks and
    * re-serialize the kernel. BY_NUM is exempt from coalescing, and
    * one-task-per-core is the correct repair for a starved scan by
    * construction: the count derives from the session (8-core driver
    * run => 8), never from a constant, and a healthy production layout
    * never reaches this branch at all.
    */
  def ensureParallelism(df: DataFrame, key: Column,
                        minFraction: Double = 0.5): DataFrame = {
    val cores = df.sparkSession.sparkContext.defaultParallelism
    val target = math.max(1, math.ceil(cores * minFraction).toInt)
    // A plan that already shuffles is already parallel downstream of
    // that exchange (its width comes from shuffle partitions + AQE,
    // not from the scan's split count) — repairing it would stack a
    // second full exchange on top of the first for nothing. Broadcast
    // exchanges don't count: a broadcast join's STREAM side is still
    // scan-shaped.
    val alreadyShuffled = df.queryExecution.sparkPlan.exists {
      case _: org.apache.spark.sql.execution.exchange.ShuffleExchangeLike => true
      case _ => false
    }
    if (alreadyShuffled) return df
    val observed = scanPartitions(df)
    if (observed < target) {
      logWarning(s"ensureParallelism: scan is starved ($observed splits < " +
        s"target $target = ceil($minFraction x defaultParallelism)); " +
        s"repartitioning to $cores by $key — a full-input shuffle")
      df.repartition(cores, key)
    } else df
  }
}
