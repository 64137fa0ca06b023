package graft

import graft.operators.Analytics
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Hand-computed fixtures for every Analytics operator (extracted from
  * the inline SparkEntry bodies in round 12 — these pin the semantics
  * independently of the DuckDB oracles). */
class AnalyticsSpec extends SparkTestBase {
  import spark.implicits._

  test("exactPercentiles: ceil(n*p)-th order statistic per group, ties broken by tieCols") {
    val d = Seq(("g", 10L, 1L), ("g", 20L, 2L), ("g", 30L, 3L), ("g", 40L, 4L))
      .toDF("grp", "v", "tie")
    val r = Analytics.exactPercentiles(d, "grp", "v", Seq("tie"),
      Seq(0.5 -> "p50", 0.9 -> "p90"), nName = "n").collect().head
    // ceil(4*.5)=2nd=20, ceil(4*.9)=4th=40
    assert(r.getAs[Long]("n") == 4L && r.getAs[Long]("p50") == 20L &&
      r.getAs[Long]("p90") == 40L)
  }

  test("iqrOutliers: integer 1.5-IQR fences catch only the extreme") {
    val d = (1L to 8L).map(i => ("g", i * 10, i)) :+ (("g", 1000L, 9L))
    val r = Analytics.iqrOutliers(d.toDF("grp", "v", "tie"), "grp", "v", "tie")
      .collect().head
    // n=9: q1 = 3rd = 30, q3 = 7th = 70, IQR=40 -> fences [-30, 130]
    assert(r.getAs[Long]("n") == 9L && r.getAs[Long]("q1_c") == 30L &&
      r.getAs[Long]("q3_c") == 70L && r.getAs[Long]("n_outliers") == 1L)
  }

  test("funnelRates: per-step reach and ppm conversion") {
    val e = Seq((1L, 0L, "view"), (1L, 1L, "click"), (1L, 2L, "purchase"),
      (2L, 0L, "view"), (2L, 1L, "click"), (3L, 0L, "view"))
      .toDF("u", "ts", "et")
    val r = Analytics.funnelRates(e, "u", "ts",
      Seq(col("et") === "view", col("et") === "click",
        col("et") === "purchase"), windowUs = 1000L)
      .collect().map(x => (x.getInt(0), x.getLong(1),
        if (x.isNullAt(2)) -1L else x.getLong(2))).sortBy(_._1).toSeq
    assert(r == Seq((1, 3L, -1L), (2, 2L, 666666L), (3, 1L, 500000L)))
  }

  test("attributionLinear: equal ppm credit across in-window touches") {
    val p = Seq((100L, 7L, 50L)).toDF("event_id", "u", "ts")
    val c = Seq((7L, 0L, 99L, 201L), (7L, 10L, 109L, 202L),
      (7L, 60L, 169L, 203L)) // starts after the purchase: never joins
      .toDF("u", "__s", "__e", "touch_id")
    val r = Analytics.attributionLinear(p, c, Seq("u"), "ts", "__s", "__e",
      blockWidth = 100L, anchorIdCol = "event_id", touchIdCol = "touch_id")
      .collect().map(x => (x.getAs[Long]("touch_id"),
        x.getAs[Long]("n_touches"), x.getAs[Long]("credit_ppm"))).toSet
    assert(r == Set((201L, 2L, 500000L), (202L, 2L, 500000L)))
  }

  test("cohortLtv: first-period cohorts with per-cohort running revenue") {
    val d = Seq((1L, 0L, 100L), (1L, 1L, 200L), (2L, 1L, 50L))
      .toDF("u", "p", "c")
    val r = Analytics.cohortLtv(d, "u", "p", "c").collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getAs[Long]("cents"),
        x.getAs[Long]("n_users"), x.getAs[Long]("cum_cents"))).toSet
    assert(r == Set((0L, 0L, 100L, 1L, 100L), (0L, 1L, 200L, 1L, 300L),
      (1L, 0L, 50L, 1L, 50L)))
  }

  test("dailyChurn: churn = no next-day activity; last day censored") {
    val a = Seq((1L, 1L), (1L, 2L), (2L, 1L)).toDF("u", "day")
    val r = Analytics.dailyChurn(a, "u", "day").collect()
      .map(x => (x.getLong(0), x.getAs[Long]("n_active"),
        x.getAs[Long]("n_churned"), x.getAs[Long]("churn_ppm"))).toSeq
    // day 2 (the max day) is censored out; day 1: u2 churns, u1 returns
    assert(r == Seq((1L, 2L, 1L, 500000L)))
  }

  test("userGrowth: new-user counts with zero-filled days and cumulative total") {
    val a = Seq((1L, 1L), (2L, 1L), (1L, 2L), (3L, 3L)).toDF("u", "day")
    val r = Analytics.userGrowth(a, "u", "day").collect()
      .map(x => (x.getLong(0), x.getAs[Long]("n_new"),
        x.getAs[Long]("cum_users"))).sortBy(_._1).toSeq
    assert(r == Seq((1L, 2L, 2L), (2L, 0L, 2L), (3L, 1L, 3L)))
  }

  test("benford: first significant digit shares in exact ppm") {
    val d = Seq(19.5, 150.0, 2.3, 95.0).toDF("x")
    val r = Analytics.benford(d, "x").collect()
      .map(x => (x.getString(0), x.getAs[Long]("n"),
        x.getAs[Long]("share_ppm"))).toSet
    assert(r == Set(("1", 2L, 500000L), ("2", 1L, 250000L),
      ("9", 1L, 250000L)))
  }

  test("trendingRanks: rank deltas against the previous day; first day has NULL prev") {
    // day 1: a=3, b=1 -> a rank 1, b rank 2
    // day 2: a=1, b=2 -> b rank 1 (delta +1, rising), a rank 2 (-1)
    val d = (Seq.fill(3)((1L, "a")) ++ Seq((1L, "b")) ++
      Seq((2L, "a")) ++ Seq.fill(2)((2L, "b"))).toDF("day", "cat")
    val r = Analytics.trendingRanks(d, "day", "cat").collect()
      .map(x => ((x.getLong(0), x.getString(1)),
        (x.getLong(3), if (x.isNullAt(4)) None else Some(x.getLong(4)),
          if (x.isNullAt(5)) None else Some(x.getLong(5))))).toMap
    assert(r((1L, "a")) == (1L, None, None))
    assert(r((1L, "b")) == (2L, None, None))
    assert(r((2L, "b")) == (1L, Some(2L), Some(1L)))
    assert(r((2L, "a")) == (2L, Some(1L), Some(-1L)))
  }

  test("forgetReport + forgetPurge: counts match, purged output reports zero matches, nulls survive") {
    import graft.operators.Privacy
    val t1 = Seq(Some(1L), Some(2L), Some(3L), None).toDF("k")
    val t2 = Seq(1L, 1L, 5L).toDF("k")
    val keys = Seq(1L, 9L).toDF("subject")
    val rep = Privacy.forgetReport(
      Seq(("t1", t1, "k"), ("t2", t2, "k")), keys, "subject")
      .collect().map(x => x.getString(0) -> (x.getLong(1), x.getLong(2)))
      .toMap
    assert(rep == Map("t1" -> (4L, 1L), "t2" -> (3L, 2L)))
    val purged = Privacy.forgetPurge(t2, "k", keys, "subject")
    assert(purged.count() == 1)
    val purgedNulls = Privacy.forgetPurge(t1, "k", keys, "subject")
    assert(purgedNulls.count() == 3) // the null-keyed row survives
    val after = Privacy.forgetReport(Seq(("t2", purged, "k")), keys,
      "subject").collect().head
    assert(after.getLong(2) == 0L)
  }

  test("giniGain: a perfectly predictive feature captures all impurity, a useless one none") {
    // 2 classes, 50/50 -> overall gini = 500000
    val perfect = Seq(("f1", "a"), ("f1", "a"), ("f2", "b"), ("f2", "b"))
      .toDF("f", "l")
    val p = Analytics.giniGain(perfect, "f", "l").collect().head
    assert(p.getAs[Long]("gini_ppm") == 500000L &&
      p.getAs[Long]("weighted_gini_ppm") == 0L &&
      p.getAs[Long]("gain_ppm") == 500000L)
    // identical class mix in every feature value -> zero gain
    val useless = Seq(("f1", "a"), ("f1", "b"), ("f2", "a"), ("f2", "b"))
      .toDF("f", "l")
    val u = Analytics.giniGain(useless, "f", "l").collect().head
    assert(u.getAs[Long]("gini_ppm") == 500000L &&
      u.getAs[Long]("gain_ppm") == 0L)
  }

  test("abLift: zero-conversion control yields NULL lift, not an ANSI div-by-zero") {
    val u = Seq((0L, false), (0L, false), (1L, true), (1L, false))
      .toDF("variant", "conv")
    val r = Analytics.abLift(u, "variant", "conv").collect()
      .map(x => (x.getLong(0), x.getAs[Long]("rate_ppm"), x.isNullAt(4)))
      .toSet
    assert(r == Set((0L, 0L, true), (1L, 500000L, true)))
  }

  test("bucketedGroupRank: NULL values rank FIRST (window nulls-first semantics)") {
    val d = Seq(("g", Option(30L), 1L), ("g", Option.empty[Long], 2L),
      ("g", Option(10L), 3L), ("g", Option.empty[Long], 4L),
      ("g", Option(20L), 5L)).toDF("grp", "v", "tie")
    val r = Analytics.bucketedGroupRank(d, "grp", "v", Seq("tie"), buckets = 4)
      .select($"tie", $"__rank").as[(Long, Long)].collect().toMap
    // nulls first (tie asc breaks the tie), then values ascending
    assert(r == Map(2L -> 1L, 4L -> 2L, 3L -> 3L, 5L -> 4L, 1L -> 5L))
  }

  test("trendSlopes: single-day and constant groups yield NULLs, not ANSI cast failures") {
    val d = Seq(("solo", "1995-01-01", 5L),
      ("flat", "1995-01-01", 7L), ("flat", "1995-01-02", 7L),
      ("up", "1995-01-01", 1L), ("up", "1995-01-02", 3L))
      .toDF("g", "day", "v")
      .withColumn("day", to_date(col("day")))
    val r = Analytics.trendSlopes(d, "g", "day", "v").collect()
      .map(x => (x.getString(0),
        if (x.isNullAt(2)) None else Some(x.getLong(2)),
        if (x.isNullAt(3)) None else Some(x.getLong(3)))).toSet
    // solo: den=0 → both NULL; flat: slope exactly 0, vary=0 → r² NULL;
    // up: slope 2/day, perfect fit
    assert(r == Set(("solo", None, None), ("flat", Some(0L), None),
      ("up", Some(2000000L), Some(1000000L))))
  }

  test("autocorrelation: a constant daily series yields NULL rho, not an ANSI cast failure") {
    // 8 days, one event per day -> every lagged pair is (1,1): varx=vary=0
    val e = (1 to 8).map(i => (i.toLong,
      java.sql.Timestamp.valueOf(f"1995-01-0$i%d 12:00:00")))
      .toDF("id", "ts")
    val r = Analytics.autocorrelation(e, "ts", maxLag = 3).collect()
    assert(r.length == 3 && r.forall(_.isNullAt(2)))
  }

  test("abLift: rate and lift vs the control variant in ppm") {
    val u = Seq((0L, false), (0L, true), (1L, true), (1L, true))
      .toDF("variant", "conv")
    val r = Analytics.abLift(u, "variant", "conv").collect()
      .map(x => (x.getLong(0), x.getAs[Long]("rate_ppm"),
        if (x.isNullAt(4)) -1L else x.getAs[Long]("lift_ppm"))).toSet
    assert(r == Set((0L, 500000L, -1L), (1L, 1000000L, 1000000L)))
  }

  test("shareOfTotal: ppm shares over the aggregated frame") {
    val d = Seq(("a", 30L), ("b", 70L)).toDF("k", "cents")
    val r = Analytics.shareOfTotal(d, "cents", "share_ppm").collect()
      .map(x => (x.getString(0), x.getAs[Long]("share_ppm"))).toSet
    assert(r == Set(("a", 300000L), ("b", 700000L)))
  }

  test("periodDelta: lag-based ppm delta, truncation toward zero") {
    val d = Seq((1L, 100L), (2L, 150L), (3L, 120L)).toDF("day", "cents")
    val r = Analytics.periodDelta(d, "day", "cents").collect()
      .map(x => (x.getLong(0), if (x.isNullAt(2)) None
        else Some(x.getAs[Long]("delta_ppm")))).sortBy(_._1).toSeq
    assert(r == Seq((1L, None), (2L, Some(500000L)), (3L, Some(-200000L))))
  }

  test("freshnessLag: per-group max ts lag behind the global max") {
    val d = Seq(("a", 100L), ("a", 90L), ("b", 70L)).toDF("g", "ts")
    val r = Analytics.freshnessLag(d, "g", "ts").collect()
      .map(x => (x.getString(0), x.getAs[Long]("max_ts"),
        x.getAs[Long]("lag_us"))).toSet
    assert(r == Set(("a", 100L, 0L), ("b", 70L, 30L)))
  }

  test("spanStats: n / truncated avg / min / max named after the value column") {
    val d = Seq(("x", 1L), ("x", 2L), ("x", 4L)).toDF("g", "days")
    val r = Analytics.spanStats(d, "g", "days").collect().head
    assert(r.getAs[Long]("n") == 3L && r.getAs[Long]("avg_days") == 2L &&
      r.getAs[Long]("min_days") == 1L && r.getAs[Long]("max_days") == 4L)
  }

  test("ntileDistributed == built-in ntile on random data (ties, n % k != 0, n < k)") {
    import org.apache.spark.sql.expressions.Window
    val r = new scala.util.Random(13L)
    // duplicate-heavy values force tie-handling through tieCols; sizes
    // cover remainder buckets and the n < k degenerate case
    for ((n, k) <- Seq((97, 4), (50, 7), (3, 8), (64, 64), (10, 1))) {
      val rows = (1L to n.toLong).map(i => (i, r.nextInt(9).toDouble))
        .toDF("id", "v")
      val expected = rows.select($"id",
          ntile(k).over(Window.orderBy($"v".asc, $"id".asc))
            .cast("long").as("q"))
        .as[(Long, Long)].collect().toMap
      val got = Analytics.ntileDistributed(rows, k, "v", Seq("id"), "q",
          buckets = 4)
        .select($"id", $"q").as[(Long, Long)].collect().toMap
      assert(got == expected, s"n=$n k=$k")
    }
    // all-equal values: one range bucket, labels still exact
    val flat = (1L to 10L).map((_, 5.0)).toDF("id", "v")
    val gotFlat = Analytics.ntileDistributed(flat, 4, "v", Seq("id"), "q")
      .select($"id", $"q").as[(Long, Long)].collect().toMap
    val expFlat = flat.select($"id",
        ntile(4).over(Window.orderBy($"v".asc, $"id".asc))
          .cast("long").as("q"))
      .as[(Long, Long)].collect().toMap
    assert(gotFlat == expFlat)
    // NULL values: built-in ntile over an asc order puts nulls FIRST;
    // the bucketed form must send them to bucket 0, not (via least()'s
    // null-skipping) to the top bucket
    val withNulls = Seq((1L, Option(5.0)), (2L, Option.empty[Double]),
      (3L, Option(1.0)), (4L, None), (5L, Option(9.0)), (6L, Option(7.0)))
      .toDF("id", "v")
    val gotNull = Analytics.ntileDistributed(withNulls, 3, "v", Seq("id"), "q")
      .select($"id", $"q").as[(Long, Long)].collect().toMap
    val expNull = withNulls.select($"id",
        ntile(3).over(Window.orderBy($"v".asc, $"id".asc))
          .cast("long").as("q"))
      .as[(Long, Long)].collect().toMap
    assert(gotNull == expNull)
  }

  test("distributedCumSum: equals the global-window prefix sum at every bucket count") {
    val d = (1L to 40L).map(i => (i * 3L, i % 7L, i % 5L))
      .toDF("id", "a", "b")
    val exp = d.select($"id",
        sum($"a").over(Window.orderBy($"id")).cast("long").as("ca"),
        sum($"b").over(Window.orderBy($"id")).cast("long").as("cb"))
      .as[(Long, Long, Long)].collect().toSet
    for (buckets <- Seq(1, 3, 64)) {
      val got = Analytics.distributedCumSum(d, "id", Seq("a", "b"), buckets)
        .select($"id", $"cum_a", $"cum_b")
        .as[(Long, Long, Long)].collect().toSet
      assert(got == exp, s"buckets=$buckets")
    }
  }

  test("rareCategoryMerge: sub-threshold tail collapses into OTHER with exact ppm shares") {
    // 10 rows: a x6, b x2, c x1, d x1 — threshold 150000 ppm (15%)
    // keeps a (600000) and b (200000); c+d merge to __OTHER__ (200000)
    val d = (Seq.fill(6)("a") ++ Seq.fill(2)("b") ++ Seq("c", "d"))
      .zipWithIndex.map { case (c, i) => (i.toLong, c) }.toDF("id", "cat")
    val got = Analytics.rareCategoryMerge(d, "cat", minSharePpm = 150000L)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2))).toMap
    assert(got === Map(
      "a" -> ((6L, 600000L)),
      "b" -> ((2L, 200000L)),
      "__OTHER__" -> ((2L, 200000L))))
    // threshold above every share: everything merges to one row
    val all = Analytics.rareCategoryMerge(d, "cat", minSharePpm = 700000L)
      .collect()
    assert(all.length == 1 && all(0).getString(0) == "__OTHER__" &&
      all(0).getLong(1) == 10L && all(0).getLong(2) == 1000000L)
  }

  test("giniIndex: equality reads 0, extreme concentration reads (n-1)/n, tie-order invariant") {
    // group A: all equal -> G = 0; group B: one holder of everything
    // among 4 rows -> G = (n-1)/n = 750000 ppm
    val d = (Seq.fill(4)(("A", 10L)) ++ Seq(("B", 0L), ("B", 0L),
      ("B", 0L), ("B", 40L))).zipWithIndex
      .map { case ((g, x), i) => (g, x, i.toLong) }.toDF("g", "cents", "tie")
    val got = Analytics.giniIndex(d, "g", "cents", Seq("tie"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(got("A") == ((4L, 40L, 0L)))
    assert(got("B") == ((4L, 40L, 750000L)))
    // tie-break order cannot move the statistic: reversed tie ids
    val d2 = d.withColumn("tie", -col("tie"))
    val got2 = Analytics.giniIndex(d2, "g", "cents", Seq("tie"))
      .collect().map(r => r.getString(0) -> r.getLong(3)).toMap
    assert(got2("A") == 0L && got2("B") == 750000L)
  }

  test("concentrationIndex: monopoly reads 1e6, uniform split reads 1e6/k") {
    val d = (Seq.fill(8)((1L, "only")) ++
      Seq.fill(5)((2L, "a")) ++ Seq.fill(5)((2L, "b")) ++
      Seq.fill(5)((2L, "c")) ++ Seq.fill(5)((2L, "d")))
      .toDF("grp", "cat")
    val got = Analytics.concentrationIndex(d, "grp", "cat")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(got(1L) == ((8L, 1L, 1000000L)))
    assert(got(2L) == ((20L, 4L, 250000L)))
  }

  test("simpsonIndex: without-replacement pair probability; singleton group reads 0") {
    // group 1: cats x,x,y -> sum n(n-1) = 2 over 3*2 draws = 333333;
    // group 2: monopoly of 4 -> 12/12 = 1e6; group 3: one row -> 0
    val d = (Seq((1L, "x"), (1L, "x"), (1L, "y")) ++
      Seq.fill(4)((2L, "only")) ++ Seq((3L, "z")))
      .toDF("grp", "cat")
    val got = Analytics.simpsonIndex(d, "grp", "cat")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(got(1L) == ((3L, 2L, 333333L)))
    assert(got(2L) == ((4L, 1L, 1000000L)))
    assert(got(3L) == ((1L, 1L, 0L)))
  }

  test("applyRareMerge: rows come back relabeled, survivors untouched, NULL is its own category") {
    // a x6, b x2, null x1, d x1 — threshold 15%: a and b survive;
    // null and d (10% each) relabel to __OTHER__
    val d = ((Seq.fill(6)(Option("a")) ++ Seq.fill(2)(Option("b")) ++
      Seq(None, Option("d"))): Seq[Option[String]])
      .zipWithIndex.map { case (c, i) => (i.toLong, c) }.toDF("id", "cat")
    val got = Analytics.applyRareMerge(d, "cat", minSharePpm = 150000L)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got.size == 10)
    assert((0 to 5).forall(i => got(i.toLong) == "a"))
    assert(got(6L) == "b" && got(7L) == "b")
    assert(got(8L) == "__OTHER__" && got(9L) == "__OTHER__")
    // a NULL category ABOVE threshold survives as the string "NULL"?
    // no — it stays whatever the cast gives; pin that it is kept, not
    // merged, when its share clears the bar
    val d2 = (Seq.fill(5)(None: Option[String]) ++ Seq.fill(5)(Option("x")))
      .zipWithIndex.map { case (c, i) => (i.toLong, c) }.toDF("id", "cat")
    val got2 = Analytics.applyRareMerge(d2, "cat", minSharePpm = 400000L)
      .collect().map(r => r.getLong(0) -> Option(r.getString(1))).toMap
    assert(got2(0L).isEmpty, "above-threshold NULL category must pass through as NULL")
    assert(got2(9L).contains("x"))
  }

  test("attributionDecay: power-of-two credits, fresh touch outweighs stale 2:1 per half-life") {
    // anchor at ts 100s; touches at 100s (0 half-lives) and 61s ago
    // (1 half-life at 60s): weights 2:1 -> credits 666666 / 333333
    val p = Seq((1L, 7L, 100000000L)).toDF("aid", "k", "ts")
    val c = Seq((10L, 7L, 100000000L), (11L, 7L, 39000000L))
      .toDF("tid", "k", "t0")
      .select($"k", $"t0".as("__s"), ($"t0" + 120000000L - 1).as("__e"), $"tid")
    val got = Analytics.attributionDecay(p, c, Seq("k"), "ts", "__s", "__e",
        blockWidth = 120000000L, anchorIdCol = "aid", touchIdCol = "tid",
        halfLifeUs = 60000000L, maxSteps = 20)
      .select($"tid", $"half_lives", $"credit_ppm")
      .as[(Long, Long, Long)].collect().toSet
    assert(got == Set((10L, 0L, 666666L), (11L, 1L, 333333L)))
  }

  test("readability: ppm words-per-sentence and chars-per-word") {
    val d = Seq((1L, "Hello world. Bye")).toDF("id", "text")
    val r = Analytics.readability(d, "id", "text").collect().head
    assert(r.getAs[Long]("n_words") == 3L &&
      r.getAs[Long]("n_sentences") == 2L &&
      r.getAs[Long]("wps_ppm") == 1500000L &&
      r.getAs[Long]("cpw_ppm") == 4666666L)
  }
}
