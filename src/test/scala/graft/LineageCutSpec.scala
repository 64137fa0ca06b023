package graft

import org.apache.spark.sql.functions._

import graft.operators.LineageCut

/** The layout-keeping lineage cut: under AQE a plain localCheckpoint
  * reports UnknownPartitioning, so every downstream same-key stage
  * re-shuffles rows the checkpoint already laid out correctly. The cut
  * re-declares the final adaptive plan's partitioning/ordering — gated
  * on the layout being at least defaultParallelism wide, so a
  * coalesced 1–4-partition local layout (which would pin downstream
  * stages to that width) falls back to the plain checkpoint. */
class LineageCutSpec extends SparkTestBase {

  private def aggByK = spark.range(0, 10000)
    .select(col("id"), (col("id") % 97).as("k"))
    .groupBy(col("k")).agg(sum(col("id")).as("s"))

  private def hasExchange(df: org.apache.spark.sql.DataFrame): Boolean =
    df.queryExecution.executedPlan.toString.contains("Exchange")

  test("gate OPEN (full-width layout): downstream same-key aggregation elides its exchange; rows identical") {
    val key = "spark.sql.adaptive.coalescePartitions.enabled"
    val old = spark.conf.get(key, "true")
    try {
      // with coalescing off the aggregation's exchange keeps all
      // shuffle partitions (4 == defaultParallelism on local[4]), so
      // the kept layout passes the width gate
      spark.conf.set(key, "false")
      val ck = LineageCut.cut(aggByK)
      val reAgg = ck.groupBy(col("k")).agg(count(lit(1)).as("c"))
      val expected = aggByK.groupBy(col("k")).agg(count(lit(1)).as("c"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val got = reAgg.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got === expected, "kept layout must not change results")
      assert(!hasExchange(reAgg),
        "a same-key aggregation over a kept full-width layout must not re-shuffle")
      LineageCut.release(ck)
    } finally spark.conf.set(key, old)
  }

  test("gate CLOSED (coalesced local layout): the cut stays a plain checkpoint — downstream aggregation re-shuffles at session width") {
    val ck = LineageCut.cut(aggByK) // default AQE coalescing: 10k tiny rows collapse under 4 partitions
    val reAgg = ck.groupBy(col("k")).agg(count(lit(1)).as("c"))
    val expected = aggByK.groupBy(col("k")).agg(count(lit(1)).as("c"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val got = reAgg.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === expected)
    assert(hasExchange(reAgg),
      "a narrower-than-parallelism layout must NOT be kept (it would pin " +
        "downstream stages below the session width)")
    LineageCut.release(ck)
  }
}
