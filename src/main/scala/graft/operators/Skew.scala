package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-handling utilities for hot keys (a boilerplate shingle shared by
  * millions of documents, one user producing half the events). AQE's
  * skew-join splitting covers sort-merge joins; these cover the
  * aggregate and broadcast-unfriendly cases explicitly.
  */
object Skew {

  /** Two-stage salted aggregation: groupBy(keys + salt) computes
    * partial aggregates across `buckets` shards of each hot key, then a
    * cheap second aggregate merges shards. Use when one key dominates
    * and the single reducer for it becomes the straggler.
    *
    * `aggs` must be mergeable as (partialName -> mergeExpr), e.g.
    * count -> sum, sum -> sum, max -> max. Helpers below cover the
    * common ones.
    */
  /** Columns of `df` whose types hash() accepts (MapType anywhere in the
    * type rejects the whole expression at analysis). */
  private def hashableCols(df: DataFrame): Seq[Column] = {
    import org.apache.spark.sql.types._
    def hasMap(dt: DataType): Boolean = dt match {
      case _: MapType => true
      case ArrayType(e, _) => hasMap(e)
      case StructType(fs) => fs.exists(f => hasMap(f.dataType))
      case _ => false
    }
    df.schema.fields.filterNot(f => hasMap(f.dataType)).map(f => col(f.name)).toIndexedSeq
  }

  def saltedAggregate(df: DataFrame, keys: Seq[String], buckets: Int,
                      partial: Seq[Column], merge: Seq[Column]): DataFrame = {
    // salt from ROW CONTENT, never monotonically_increasing_id(): a
    // recomputed task would re-salt its rows differently and the
    // two-stage aggregate would double-count/drop through the shuffle.
    // Inherent limit of ANY retry-stable salt: byte-identical duplicate
    // rows co-bucket (indistinguishable content has one deterministic
    // image) — spreading them needs nondeterminism, which is exactly
    // what breaks recompute safety. Map-typed columns are skipped
    // (hash() rejects MapType).
    val salted = df.withColumn("__salt",
      pmod(hash(hashableCols(df): _*), lit(buckets)))
    salted
      .groupBy((keys.map(col) :+ col("__salt")): _*)
      .agg(partial.head, partial.tail: _*)
      .groupBy(keys.map(col): _*)
      .agg(merge.head, merge.tail: _*)
  }

  /** count(*) per key, salted. */
  def saltedCount(df: DataFrame, keys: Seq[String], buckets: Int = 32): DataFrame =
    saltedAggregate(df, keys, buckets,
      partial = Seq(count(lit(1)).as("__pc")),
      merge = Seq(sum(col("__pc")).as("n")))

  /** sum(valueCol) per key, salted. */
  def saltedSum(df: DataFrame, keys: Seq[String], valueCol: String,
                buckets: Int = 32): DataFrame =
    saltedAggregate(df, keys, buckets,
      partial = Seq(sum(col(valueCol)).as("__ps")),
      merge = Seq(sum(col("__ps")).as(s"sum_$valueCol")))

  /** Salted equi-join for a skewed LEFT side against a non-broadcastable
    * right side: left rows get a content-derived deterministic salt in
    * [0, buckets); the right side replicates `buckets` times. One
    * shuffle each, hot keys spread over `buckets` reducers, and the
    * assignment survives partial stage recompute (same row bytes =>
    * same bucket).
    */
  def saltedJoin(left: DataFrame, right: DataFrame, key: String,
                 buckets: Int = 8): DataFrame = {
    val saltedLeft = left.withColumn("__salt",
      pmod(hash(hashableCols(left): _*), lit(buckets)))
    val replicatedRight = right.withColumn("__salt",
      explode(array((0 until buckets).map(lit): _*)))
    saltedLeft.join(replicatedRight, Seq(key, "__salt")).drop("__salt")
  }
}
