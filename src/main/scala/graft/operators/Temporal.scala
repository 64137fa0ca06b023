package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal operators Spark lacks natively.
  *
  * [[asofJoin]]: for every left row, attach the most recent right row
  * with `right.ts <= left.ts` within the same key (backward as-of; the
  * point-in-time join of feature stores and market data).
  *
  * Implementation follows the preference ladder (compose built-ins
  * before custom SparkStrategy): both sides union into one stream,
  * partitioned by key and ordered by (ts, side) with right rows first
  * at equal timestamps (inclusive <=); a running `last(ignoreNulls)`
  * carries the latest right payload forward; left rows then project it.
  *
  * Scale shape: ONE shuffle of (key, ts, payload) — same cost as the
  * sort-merge join a custom physical operator would do, with AQE and
  * codegen'd window execution for free. No per-key materialization:
  * the window is running state over a sorted partition stream.
  */
object Temporal {

  /** NOTE: right-payload columns participate in a window ORDERING (the
    * deterministic tie-break among right rows sharing (key, ts)), so
    * they must be orderable types — drop or pre-hash map-typed payload
    * columns before the join (Spark rejects them at analysis). */
  def asofJoin(left: DataFrame, right: DataFrame, keyCols: Seq[String],
               tsCol: String, rightPrefix: String = "r_"): DataFrame = {
    val rightPayloadCols = right.columns.filterNot(c =>
      keyCols.contains(c) || c == tsCol)
    val payload = struct(rightPayloadCols.map(col).toIndexedSeq: _*)

    val keyed = keyCols.map(col)
    val l = left.withColumn("__side", lit(1))
      .withColumn("__rp", lit(null).cast(
        right.select(payload).schema.head.dataType))
    val r = right
      .withColumn("__side", lit(0))
      .withColumn("__rp", payload)
      .select((keyed ++ Seq(col(tsCol), col("__side"), col("__rp"))): _*)
    // align schemas: right rows carry nulls for left-only columns
    val leftOnly = left.columns.filterNot(c =>
      keyCols.contains(c) || c == tsCol)
    val rAligned = leftOnly.foldLeft(r) { (df, c) =>
      df.withColumn(c, lit(null).cast(left.schema(c).dataType))
    }.select(l.columns.map(col).toIndexedSeq: _*)

    // __rp in the ordering: deterministic winner among right rows that
    // share (key, ts) — struct ordering is field-wise
    val w = Window.partitionBy(keyed: _*)
      .orderBy(col(tsCol).asc, col("__side").asc, col("__rp").asc_nulls_last)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val merged = l.unionByName(rAligned)
      .withColumn("__last_r", last(col("__rp"), ignoreNulls = true).over(w))

    val out = merged.filter(col("__side") === 1)
      .drop("__side", "__rp")
    rightPayloadCols.foldLeft(out) { (df, c) =>
      df.withColumn(rightPrefix + c, col("__last_r").getField(c))
    }.drop("__last_r")
  }

  /** Gap-based sessionization: events within `gap` of the previous
    * event (per key) share a session; a larger gap starts a new one.
    * Emits one row per (key, session): index, event count, start/end.
    *
    * Classic two-window formulation — `lag` marks session starts,
    * a running sum numbers them — then an aggregate rolls sessions up.
    * Scale shape: ONE hash exchange on the key; the windows sort within
    * partitions, and the final groupBy(key, session_idx) reuses the
    * key partitioning (HashPartitioning(key) satisfies the clustered
    * distribution on (key, session_idx) — no second shuffle; asserted
    * in PlanAuditSpec).
    *
    * `tieCol` makes the ordering total when timestamps collide, so
    * session numbering is deterministic under retries.
    */
  def sessionize(events: DataFrame, keyCol: String, tsCol: String,
                 gap: Long, tieCol: String): DataFrame = {
    require(gap > 0, s"session gap must be positive, got $gap")
    val w = Window.partitionBy(col(keyCol)).orderBy(col(tsCol).asc, col(tieCol).asc)
    val isNew = when(
      col(tsCol) - lag(col(tsCol), 1).over(w) > gap, lit(1L)).otherwise(lit(0L))
    events
      .withColumn("session_idx",
        sum(isNew).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col(keyCol), col("session_idx"))
      .agg(
        count(lit(1)).as("n_events"),
        min(col(tsCol)).as("session_start"),
        max(col(tsCol)).as("session_end"))
  }

  /** Range (interval) join: pairs where `left.ts` falls in
    * `[right.start, right.end]`, equi-keyed on `keyCols`.
    *
    * Spark plans a bare band condition as a nested-loop join — O(n*m)
    * per key. Bucket blocking makes it an equi-join: both sides map to
    * fixed-width ts blocks (right intervals explode to every block they
    * overlap), join on (key, block), then the exact band predicate
    * filters. Each matching pair meets in EXACTLY one block (the one
    * containing left.ts), so no dedup is needed.
    *
    * `blockWidth` should be ~the typical interval length: wider means
    * fewer replicas per interval, narrower means fewer false candidates
    * per block.
    */
  def rangeJoin(left: DataFrame, right: DataFrame, keyCols: Seq[String],
                leftTs: String, rightStart: String, rightEnd: String,
                blockWidth: Long): DataFrame = {
    require(blockWidth > 0)
    val l = left.withColumn("__block", floor(col(leftTs) / blockWidth))
    val r = right.withColumn("__block", explode(sequence(
      floor(col(rightStart) / blockWidth), floor(col(rightEnd) / blockWidth))))
    l.join(r, keyCols :+ "__block")
      .filter(col(leftTs) >= col(rightStart) && col(leftTs) <= col(rightEnd))
      .drop("__block")
  }
}
