package graft

import graft.operators.Bucketing
import graft.streaming.CdcStream

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

class BucketingStreamSpec extends SparkTestBase {
  import spark.implicits._

  test("co-located join of same-bucketed tables plans no Exchange") {
    val orders = spark.read.parquet(sf() + "/orders.parquet")
    val lineitem = spark.read.parquet(sf() + "/lineitem.parquet")
      .withColumnRenamed("l_orderkey", "o_orderkey")
    Bucketing.writeBucketed(orders, "b_orders", "o_orderkey", 8,
      sortCols = Seq("o_orderkey"))
    Bucketing.writeBucketed(lineitem, "b_lineitem", "o_orderkey", 8,
      sortCols = Seq("o_orderkey"))

    // force the sort-merge path (broadcast would sidestep bucketing on
    // this tiny table; at 100 TB neither side broadcasts)
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10MB")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = Bucketing.coLocatedJoin(spark, "b_orders", "b_lineitem", "o_orderkey")
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), plan)
      // shuffle nodes print as 'Exchange hashpartitioning', never the
      // class name 'ShuffleExchange' — the old assertion was vacuous
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join still shuffles:\n$plan")
      assert(plan.contains("Bucketed: true"), s"scan did not use buckets:\n$plan")
      val expected = orders.join(lineitem, "o_orderkey").count()
      assert(joined.count() == expected)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("streaming dedup within watermark drops repeats, keeps state bounded") {
    val dir = java.nio.file.Files.createTempDirectory("graft_sdd").toString
    val ev = eventsUs()
      .withColumn("ts", timestamp_micros(col("ts")))
      .select($"user_id", $"event_type", $"ts")
    // duplicate every row => dedup must halve it
    ev.unionAll(ev).write.mode("overwrite").parquet(s"$dir/in")
    val schema = spark.read.parquet(s"$dir/in").schema

    val stream = CdcStream.readFiles(spark, s"$dir/in", schema)
    val deduped = CdcStream.dedupWithinWatermark(stream, "ts", "30 days",
      Seq("user_id", "event_type", "ts"))
    val q = deduped.writeStream.outputMode("append")
      .format("memory").queryName("dedup_stream")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)

    val got = spark.table("dedup_stream").count()
    assert(got == ev.count(), s"expected ${ev.count()} deduped rows, got $got")
  }
}
