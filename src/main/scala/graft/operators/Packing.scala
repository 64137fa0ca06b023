package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing for LLM pre-training batches: assign documents to
  * fixed token-budget packs so downstream training reads contiguous
  * groups instead of ragged documents.
  *
  * This is CONTIGUOUS packing (greedy in a deterministic document
  * order, no document splitting, no first-fit search): doc d joins pack
  * floor(prefix_tokens(d) / budget), where prefix_tokens is the sum of
  * token counts of all earlier docs in its shard. Simple, deterministic,
  * and one window pass — the shape real pipelines use when token counts
  * are small relative to the budget. Overlong documents still get a
  * pack id (they'd be truncated/split by the tokenizer downstream).
  *
  * Scale: the window partitions by `shardCol` — packing is per shard
  * (language, source, date bucket...), so the sort parallelizes across
  * shards and no global ordering exists. A single global pack order
  * would serialize 100 TB through one task; per-shard is the contract.
  */
object Packing {

  /** Adds `pack_id` (long, per shard) and `n_tokens` to `df`.
    * Deterministic given (shardCol, idCol) uniqueness. */
  def contiguous(df: DataFrame, shardCol: String, idCol: String,
                 tokenCol: String, budgetTokens: Long): DataFrame = {
    require(budgetTokens > 0, "budgetTokens must be positive")
    val w = Window.partitionBy(col(shardCol)).orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("__cum", sum(col(tokenCol)).over(w))
      .withColumn("pack_id",
        ((col("__cum") - col(tokenCol)) / budgetTokens).cast("long"))
      .drop("__cum")
  }
}
