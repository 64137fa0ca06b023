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

  /** The diagnosis that DECIDES whether the salted paths above (or AQE
    * skew handling) are worth their cost: the topK heaviest join/agg
    * keys with their share of all rows and their hot ratio vs a
    * perfectly uniform key (`cnt·n_keys·1e6 div n_rows` — 1e6 = exactly
    * average, 50e6 = this key is 50x a fair shard). Run it on the join
    * key BEFORE shipping a 100 TB shuffle; a top entry at >>1e6 ppm is
    * the straggler task.
    *
    * Scale shape: one map-side-combined count per key, a
    * TakeOrderedAndProject for the topK (per-partition heads merged on
    * the driver — no global sort shuffle), and a single-row stats
    * attach (structurally-benign broadcast). */
  def keySkewProfile(df: DataFrame, keys: Seq[String],
                     topK: Int = 10): DataFrame = {
    require(keys.nonEmpty && topK >= 1)
    val counts = df.groupBy(keys.map(col): _*).agg(count(lit(1)).as("cnt"))
    val stats = counts.agg(count(lit(1)).as("n_keys"),
      sum(col("cnt")).as("n_rows"))
    counts.orderBy(col("cnt").desc +: keys.map(col(_).asc): _*)
      .limit(topK)
      .crossJoin(broadcast(stats))
      .select(keys.map(col) ++ Seq(col("cnt"),
        expr("cnt * 1000000L div n_rows").as("share_ppm"),
        expr("cnt * n_keys * 1000000L div n_rows").as("hot_ratio_ppm"),
        col("n_keys"), col("n_rows")): _*)
  }
}
