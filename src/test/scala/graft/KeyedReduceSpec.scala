package graft

import graft.operators.{CdcMerge, Dedup, KeyedReduce}

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

class KeyedReduceSpec extends SparkTestBase {
  import spark.implicits._

  test("reduceByKey(min) equals the window formulation exactly") {
    val orders = spark.read.parquet(sf("sf0.01") + "/orders.parquet")
    val got = KeyedReduce.reduceByKey(orders, Seq("o_custkey"),
      Seq("o_totalprice", "o_orderkey"), largest = false)
    val w = Window.partitionBy($"o_custkey")
      .orderBy($"o_totalprice".asc, $"o_orderkey".asc)
    val want = orders.withColumn("rn", row_number().over(w))
      .filter($"rn" === 1).drop("rn")
    assert(got.schema == orders.schema) // column order + types preserved
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty)
  }

  test("reduceByKey(max) ties broken by later order columns") {
    val df = Seq((1L, 10.0, 100L), (1L, 10.0, 101L), (1L, 5.0, 102L), (2L, 1.0, 103L))
      .toDF("k", "v", "id")
    val got = KeyedReduce.reduceByKey(df, Seq("k"), Seq("v", "id"), largest = true)
      .select("id").as[Long].collect().toSet
    assert(got == Set(101L, 103L)) // v tie at k=1 broken by id desc... max(101)
  }

  // AQE wraps the tree in AdaptiveSparkPlanExec, so node-collect sees
  // nothing; assert on the printed tree instead (child plans print BELOW
  // their parent, i.e. at a LARGER string index).
  private def assertPartialBeforeExchange(plan: String): Unit = {
    val exch = plan.indexOf("Exchange hashpartitioning")
    val partial = plan.indexOf("partial_")
    assert(exch >= 0, s"no hash exchange:\n$plan")
    assert(plan.indexOf("Exchange hashpartitioning", exch + 1) < 0,
      s"expected exactly one exchange:\n$plan")
    assert(partial > exch, s"no partial (map-side) aggregate below the exchange:\n$plan")
  }

  test("plan: partial aggregation before the single exchange") {
    val orders = spark.read.parquet(sf("sf0.01") + "/orders.parquet")
    val got = KeyedReduce.reduceByKey(orders, Seq("o_custkey"),
      Seq("o_orderkey"), largest = false)
    assertPartialBeforeExchange(got.queryExecution.executedPlan.toString)
  }

  test("Dedup.exact and CdcMerge.latestPerKey ride the aggregate path") {
    val docs = spark.read.parquet(sf() + "/documents.parquet")
    val deduped = Dedup.exact(docs, "doc_id", Seq("lang"))
    assertPartialBeforeExchange(deduped.queryExecution.executedPlan.toString)
    // semantics: min doc_id per lang survives
    val wantIds = docs.groupBy("lang").agg(min("doc_id").as("doc_id"))
      .select("doc_id").as[Long].collect().toSet
    assert(deduped.select("doc_id").as[Long].collect().toSet == wantIds)

    val events = eventsUs().withColumnRenamed("ts", "ts_us")
    val latest = CdcMerge.latestPerKey(events, Seq("user_id"), "ts_us",
      tieBreakers = Seq("event_id"))
    val w = Window.partitionBy($"user_id").orderBy($"ts_us".desc, $"event_id".desc)
    val want = events.withColumn("rn", row_number().over(w))
      .filter($"rn" === 1).drop("rn")
    assert(latest.exceptAll(want).isEmpty && want.exceptAll(latest).isEmpty)
  }
}
