package graft

import graft.operators.Temporal

class TemporalSpec extends SparkTestBase {
  import spark.implicits._

  test("asof join: backward match, inclusive equality, null before first") {
    val left = Seq((1L, 10L, "p1"), (1L, 20L, "p2"), (1L, 5L, "p0"),
      (2L, 100L, "q1")).toDF("user", "ts", "name")
    val right = Seq((1L, 10L, "c10"), (1L, 15L, "c15"), (3L, 1L, "cX"))
      .toDF("user", "ts", "label")
    val got = Temporal.asofJoin(left, right, Seq("user"), "ts")
      .select("user", "ts", "name", "r_label")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        if (r.isNullAt(3)) null else r.getString(3))).toSet
    assert(got == Set(
      (1L, 5L, "p0", null),     // before any right row
      (1L, 10L, "p1", "c10"),   // inclusive: right at SAME ts matches
      (1L, 20L, "p2", "c15"),   // latest prior
      (2L, 100L, "q1", null)))  // key with no right rows at all
  }

  test("asof join deterministic across partitionings") {
    val ev = spark.read.parquet(sf("sf0.01") + "/events.parquet")
      .withColumn("ts", org.apache.spark.sql.functions.expr("ts div 1000"))
    val p = ev.filter($"event_type" === "purchase")
      .select($"event_id", $"user_id", $"ts")
    val c = ev.filter($"event_type" === "click")
      .select($"user_id", $"ts", $"event_id".as("click_id"))
    val a = Temporal.asofJoin(p, c, Seq("user_id"), "ts")
      .orderBy("event_id").collect()
    val b = Temporal.asofJoin(p.repartition(17), c.repartition(3),
      Seq("user_id"), "ts").orderBy("event_id").collect()
    assert(a.sameElements(b))
  }
}
