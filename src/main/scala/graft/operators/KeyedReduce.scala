package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** k=1 top-k as a standard aggregate: `min_by`/`max_by` of the full-row
  * struct keyed by the order-column struct (lexicographic struct
  * comparison). Why a separate formulation when TopKPerKeyExec exists:
  * the aggregate rides Spark's stock two-phase machinery — partial
  * (map-side) combine before the exchange, so the shuffle carries one
  * row per (partition, key) instead of every input row, and spilling /
  * AQE re-planning come for free. On a dup-heavy 100 TB corpus (exact
  * dedup, CDC deltas) shuffle volume is the bottleneck and this wins;
  * the cost is that a struct-typed buffer plans as SortAggregate (a
  * per-partition sort by group key) rather than HashAggregate — an
  * in-memory/spillable sort of each map task's slice, not a global one.
  *
  * Constraints vs the physical operator: all order columns share one
  * direction (struct comparison is uniformly asc/desc), and rows whose
  * order struct is entirely NULL are ignored by min_by/max_by (our
  * consumers order by PKs/ingestion timestamps, which are non-null).
  * For k>1 or mixed-direction ranking use [[graft.plans.TopK.perKey]].
  */
object KeyedReduce {

  /** One surviving row per `keyCols`: the row whose `orderCols` struct
    * is the smallest (`largest = false`) or largest. Ties must be
    * broken by the order columns themselves (append a unique column);
    * otherwise the winner is the first encountered, which is not
    * deterministic across partitionings. Output schema/column order =
    * input schema. */
  def reduceByKey(df: DataFrame, keyCols: Seq[String], orderCols: Seq[String],
                  largest: Boolean): DataFrame = {
    require(keyCols.nonEmpty, "keyCols must be non-empty")
    require(orderCols.nonEmpty, "orderCols must be non-empty")
    val allCols = df.columns.toIndexedSeq
    val rowStruct = struct(allCols.map(col): _*)
    val ordStruct = struct(orderCols.map(col): _*)
    val picked =
      if (largest) max_by(rowStruct, ordStruct) else min_by(rowStruct, ordStruct)
    df.groupBy(keyCols.map(col): _*)
      .agg(picked.as("__row"))
      .select(allCols.map(c => col("__row").getField(c).as(c)): _*)
  }
}
