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

  test("range join: block boundaries, inclusive ends, equals nested-loop result") {
    val l = Seq((1L, 100L, "a"), (1L, 150L, "b"), (1L, 201L, "c"), (2L, 100L, "d"))
      .toDF("k", "ts", "n")
    val r = Seq((1L, 90L, 150L, "w1"), (1L, 140L, 200L, "w2"), (2L, 500L, 600L, "w3"))
      .toDF("k", "s", "e", "w")
    // tiny blockWidth forces multi-block interval replication
    val got = Temporal.rangeJoin(l, r, Seq("k"), "ts", "s", "e", blockWidth = 7L)
      .select("n", "w").as[(String, String)].collect().toSet
    val expected = l.join(r, Seq("k"))
      .filter($"ts" >= $"s" && $"ts" <= $"e")
      .select("n", "w").as[(String, String)].collect().toSet
    assert(got == expected)
    assert(got == Set(("a", "w1"), ("b", "w1"), ("b", "w2"))) // inclusive 150
  }

  test("asof join deterministic across partitionings") {
    val ev = eventsUs("sf0.01")
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
