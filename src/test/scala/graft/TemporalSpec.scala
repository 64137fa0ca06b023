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

  test("query constants are µs per the events contract: 30-min boundary rows") {
    // q_range_join's window and q_sessionize's gap are 1800000000 —
    // 30 minutes ONLY because the events helper surfaces ts in
    // MICROSECONDS on every fixture variant. Pin the unit at real µs
    // magnitudes: exactly +30min is inside the window / same session,
    // one microsecond later is out / a new session.
    val base = 1700000000000000L // a realistic µs epoch (2023-11-14)
    val purchases = Seq((1L, base + 1800000000L, 10L), (1L, base + 1800000001L, 11L))
      .toDF("user_id", "ts", "event_id")
    val windows = Seq((1L, base, base + 1800000000L, 100L))
      .toDF("user_id", "start", "end", "click_id")
    val inWindow = Temporal.rangeJoin(purchases, windows, Seq("user_id"),
      "ts", "start", "end", blockWidth = 1800000000L)
      .select("event_id").as[Long].collect().toSet
    assert(inWindow == Set(10L))

    val ev = Seq((1L, base, 1L), (1L, base + 1800000000L, 2L),
      (1L, base + 3600000001L, 3L)).toDF("user_id", "ts", "event_id")
    val sess = Temporal.sessionize(ev, "user_id", "ts", gap = 1800000000L,
      tieCol = "event_id").orderBy("session_idx")
      .collect().map(r => (r.getLong(1), r.getLong(2))).toSeq
    assert(sess == Seq((0L, 2L), (1L, 1L))) // ==gap merges, gap+1µs splits
  }

  test("funnel: order, strict-increase, and window gates on crafted edges") {
    val ev = Seq(
      // u1: clean view -> click -> purchase inside the window
      (1L, 10L, "view"), (1L, 20L, "click"), (1L, 30L, "purchase"),
      // u2: click BEFORE the first view never counts; none after
      (2L, 5L, "click"), (2L, 10L, "view"),
      // u3: same-ts click is not strictly after; purchase misses the
      // window (anchor 10 + 100 < 200)
      (3L, 10L, "view"), (3L, 10L, "click"), (3L, 15L, "click"),
      (3L, 200L, "purchase"),
      // u4: never entered the funnel (no view) -> no output row
      (4L, 5L, "purchase")
    ).toDF("user_id", "ts", "event_type")
    val got = Temporal.funnel(ev, "user_id", "ts",
        Seq($"event_type" === "view", $"event_type" === "click",
          $"event_type" === "purchase"), window = 100L)
      .orderBy("user_id")
      .as[(Long, Long, Option[Long], Option[Long], Int)].collect().toSeq
    assert(got == Seq(
      (1L, 10L, Some(20L), Some(30L), 3),
      (2L, 10L, None, None, 1),
      (3L, 10L, Some(15L), None, 2)))
  }

  test("anomalies: spike flags against its trailing baseline, never dilutes it") {
    // 10 steady readings, then a spike, then steady again: only the
    // spike flags (the window EXCLUDES self, so the spike can't mask
    // itself), and the reading right after it stays unflagged (the
    // spike inflates the trailing variance, but (n·x−S)² stays small)
    val ev = (1 to 10).map(i => (1L, i.toLong, i.toLong, 100.0 + (i % 2))) ++
      Seq((1L, 11L, 11L, 500.0)) ++
      (12 to 15).map(i => (1L, i.toLong, i.toLong, 100.0 + (i % 2)))
    val got = Temporal.anomalies(ev.toDF("user_id", "ts", "event_id", "value"),
        "user_id", "ts", "value", tieCol = "event_id",
        window = 20, z = 3, minPoints = 8)
      .orderBy("ts").as[(Long, Long, Long, Double, Boolean)].collect()
    val flagged = got.filter(_._5).map(_._2).toSeq
    assert(flagged == Seq(11L), s"flagged $flagged")
    // first 8 rows can never flag (insufficient history)
    assert(got.take(8).forall(!_._5))
  }

  test("retention: cohort = first active period; offsets count distinct keys") {
    val ev = Seq(
      (1L, 1L), (1L, 12L), (1L, 35L), // u1: periods 0,1,3 -> cohort 0
      (2L, 11L), (2L, 13L),           // u2: period 1 twice -> cohort 1
      (3L, 2L), (3L, 9L)              // u3: period 0 twice -> cohort 0
    ).toDF("user_id", "ts")
    val got = Temporal.retention(ev, "user_id", "ts", periodLength = 10L)
      .orderBy("cohort", "offset")
      .as[(Long, Long, Long)].collect().toSeq
    assert(got == Seq((0L, 0L, 2L), (0L, 1L, 1L), (0L, 3L, 1L), (1L, 0L, 1L)))
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

  test("slidingRangeAgg: RANGE frame lower bound is inclusive at exactly -range") {
    val e = Seq((1L, 1L, 1000000L, 10L), (2L, 1L, 4600000L, 20L),
      (3L, 1L, 4600001L, 30L), (4L, 2L, 4600000L, 5L))
      .toDF("event_id", "user_id", "ts", "cents")
    val got = Temporal.slidingRangeAgg(e, "user_id", "ts", "cents",
      rangeUs = 3600000L)
      .collect().map(r => (r.getLong(0), r.getLong(3), r.getLong(4))).toSet
    // event 2 at ts 4600000: frame [1000000, 4600000] INCLUDES event 1
    // event 3 at ts 4600001: frame [1000001, 4600001] excludes event 1
    assert(got == Set((1L, 1L, 10L), (2L, 2L, 30L), (3L, 2L, 50L),
      (4L, 1L, 5L)))
  }

  test("timeToNextEvent: lead gaps under (ts, tie) order; last event has none") {
    val e = Seq((1L, 100L, 1L, "a"), (1L, 150L, 2L, "b"), (1L, 175L, 3L, "a"),
      (2L, 500L, 4L, "a")).toDF("user_id", "ts", "event_id", "event_type")
    val got = Temporal.timeToNextEvent(e, "user_id", "ts", "event_id",
      "event_type")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    // gaps: a@100 -> 50, b@150 -> 25; a@175 and a@500 are per-user last
    assert(got == Set(("a", 1L, 50L), ("b", 1L, 25L)))
  }

  test("activityIslands: consecutive days merge, a one-day gap splits") {
    val day = 86400000000L
    val e = Seq((1L, 10 * day), (1L, 10 * day + 5L), (1L, 11 * day),
      (1L, 13 * day), (2L, 10 * day)).toDF("user_id", "ts")
    val got = Temporal.activityIslands(e, "user_id", "ts")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSet
    assert(got == Set((1L, 10L, 11L, 2L), (1L, 13L, 13L, 1L),
      (2L, 10L, 10L, 1L)))
  }

  test("lastTouch: latest strictly-prior touch wins; no-prior conversions drop") {
    val e = Seq(
      (1L, 100L, 1L, "click"), (1L, 200L, 2L, "view"),
      (1L, 200L, 3L, "purchase"),   // touch at the SAME ts but lower tie is prior
      (1L, 300L, 4L, "purchase"),
      (2L, 50L, 5L, "purchase"),    // no prior touch -> dropped
      (2L, 60L, 6L, "click"))
      .toDF("user_id", "ts", "event_id", "event_type")
    val got = Temporal.lastTouch(e, "user_id", "ts", "event_id",
      "event_type", Seq("click", "view"), "purchase")
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getLong(3))).toSet
    // purchase 3: prior rows are (1,click@100),(2,view@200 same ts, tie 2<3) -> view, gap 0
    // purchase 4: latest prior touch is view@200 -> gap 100
    assert(got == Set((3L, 2L, 0L), (4L, 2L, 100L)))
  }

  test("asofJoinTolerance: (ts-tol, ts] window, latest right wins, stale rows never match") {
    val p = Seq((1L, 1000L, 10L), (1L, 5000L, 11L), (2L, 1000L, 12L))
      .toDF("user_id", "ts", "event_id")
    val c = Seq((1L, 900L, 100L),   // gap 100 to p10: inside tol
      (1L, 1000L, 101L),            // same instant as p10: inclusive, latest
      (1L, 4000L, 102L),            // gap 1000 to p11: STALE, beyond tol
      (2L, 800L, 103L))             // gap 200 = tol to p12: EXCLUDED (strict >)
      .toDF("user_id", "c_ts", "attr_id")
    val got = Temporal.asofJoinTolerance(p, c, Seq("user_id"),
      leftTs = "ts", leftTie = "event_id", rightTs = "c_ts",
      rightTie = "attr_id", tolUs = 200L)
      .select("event_id", "attr_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // p10 keeps the latest of its two in-window candidates; p11 and
    // p12 have none and drop
    assert(got == Set((10L, 101L)))
  }

  test("ohlcResample: open/close follow the (ts, tie) order, high/low the extremes") {
    val e = Seq(
      (1L, 100L, 1L, 50L), (1L, 100L, 2L, 70L),  // same ts: tie orders open
      (1L, 200L, 3L, 10L), (1L, 300L, 4L, 60L),
      (1L, 86400000000L + 5L, 5L, 99L))           // next bucket
      .toDF("user_id", "ts", "event_id", "cents")
    val got = Temporal.ohlcResample(e, "user_id", "ts", "event_id",
      "cents", stepUs = 86400000000L)
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6))).toSet
    assert(got == Set((0L, 50L, 70L, 10L, 60L, 4L),
      (1L, 99L, 99L, 99L, 99L, 1L)))
  }

  test("topPaths: order by (ts, tie), cap at maxLen, floor at minCount") {
    val day = 86400000000L
    val e = Seq(
      (1L, 10 * day + 1, 1L, "a"), (1L, 10 * day + 2, 2L, "b"),
      (1L, 10 * day + 2, 3L, "c"),   // same ts: tie orders b before c
      (2L, 20 * day + 1, 4L, "a"), (2L, 20 * day + 2, 5L, "b"),
      (2L, 20 * day + 3, 6L, "c"), (2L, 20 * day + 4, 7L, "d"),
      (3L, 30 * day, 8L, "z"))
      .toDF("user_id", "ts", "event_id", "event_type")
    val got = Temporal.topPaths(e, "user_id", "ts", "event_id",
      "event_type", stepUs = day, maxLen = 3, minCount = 2L)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    // both multi-event days truncate to a>b>c; z day is below minCount
    assert(got == Set(("a>b>c", 2L)))
  }

  test("rollingDistinct: trailing-window actives, repeats collapse, window edge exact") {
    // user 1 on days 1 and 3 (twice); user 2 on day 10 only
    val d = Seq((1L, 1L), (3L, 1L), (3L, 1L), (10L, 2L))
      .toDF("day", "k")
    val r = Temporal.rollingDistinct(d, "day", "k", windowDays = 7)
      .as[(Long, Long)].collect().toMap
    // observed days only: 1, 3, 10. Day 1: {1}; day 3: {1} (both obs
    // inside the window, one user); day 10: day-3 support ends at
    // day 9, so only user 2
    assert(r == Map(1L -> 1L, 3L -> 1L, 10L -> 1L))
    // window 8 pulls user 1's day-3 observation into day 10
    val r8 = Temporal.rollingDistinct(d, "day", "k", windowDays = 8)
      .as[(Long, Long)].collect().toMap
    assert(r8(10L) == 2L)
  }

  test("pointInTimeJoin: facts land on the version in effect at their ts, current version open-ended") {
    import graft.operators.CdcMerge
    // user 1 changes state at ts 10 (A) and 30 (B); facts at 10, 20,
    // 30, 40 must see A, A, B, B
    val changes = Seq((1L, 10L, 1L, "A"), (1L, 20L, 2L, "A"),
      (1L, 30L, 3L, "B")).toDF("user_id", "ts", "event_id", "state")
    val dim = CdcMerge.scd2(changes, pk = Seq("user_id"), ts = "ts",
      tie = "event_id", tracked = Seq("state"))
    val facts = Seq((1L, 10L, 101L), (1L, 20L, 102L), (1L, 30L, 103L),
      (1L, 40L, 104L)).toDF("user_id", "ts", "event_id")
    val got = CdcMerge.pointInTimeJoin(facts, dim, Seq("user_id"), "ts")
      .select($"event_id", $"dim_state", $"dim_is_current")
      .as[(Long, String, Boolean)].collect().toSet
    assert(got == Set((101L, "A", false), (102L, "A", false),
      (103L, "B", true), (104L, "B", true)))
  }

  test("survivalHazard: at-risk is reverse-cumulative, hazard exact ppm, last offset always 1e6") {
    // lifetimes: u1 = 0 (single day), u2 = 2, u3 = 2, u4 = 5
    val d = Seq((1L, 10L), (2L, 10L), (2L, 12L), (3L, 1L), (3L, 3L),
      (4L, 0L), (4L, 5L)).toDF("k", "day")
    val r = Temporal.survivalHazard(d, "k", "day")
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(r == Set(
      (0L, 4L, 1L, 250000L),  // everyone at risk at 0; u1 churns
      (2L, 3L, 2L, 666666L),  // u2,u3 churn of {u2,u3,u4}
      (5L, 1L, 1L, 1000000L)))// the longest lifetime always hazards out
  }

  test("interArrival: gaps per (ts, tie) order in whole seconds; single-event keys drop") {
    // u1: gaps 2s and 5s (mean 3s truncating); u2: one event, no gap
    val d = Seq((1L, 0L, 1L), (1L, 2000000L, 2L), (1L, 7000000L, 3L),
      (2L, 0L, 4L)).toDF("k", "ts", "id")
    val r = Temporal.interArrival(d, "k", "ts", "id")
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    assert(r == Set((1L, 2L, 3L, 2L, 5L)))
  }

  test("transitions step=2: skips one state, rows with no t+2 successor drop") {
    // u1 stream: A B A B -> 2-step pairs (A,A), (B,B)
    val d = Seq((1L, 1L, 1L, "A"), (1L, 2L, 2L, "B"),
      (1L, 3L, 3L, "A"), (1L, 4L, 4L, "B")).toDF("k", "ts", "id", "st")
    val r = Temporal.transitions(d, "k", "ts", "st", tieCol = "id", step = 2)
      .as[(String, String, Long, Long)].collect().toSet
    assert(r == Set(("A", "A", 1L, 1000000L), ("B", "B", 1L, 1000000L)))
  }
}
