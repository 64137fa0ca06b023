package graft

import graft.operators.Analytics

/** Randomized-equivalence tests for the extracted analytics operators:
  * each is pinned to an INDEPENDENT brute-force replica (plain Scala
  * collections / BigInt arithmetic) over seeded-random data — the
  * DuckDB oracles pin the fixture, these pin the semantics off it.
  * Few seeds, larger inputs (each property is a Spark job). */
class AnalyticsPropertySpec extends SparkTestBase {
  import spark.implicits._

  private def randRows(seed: Long, n: Int): Seq[(String, Long, Long)] = {
    val r = new scala.util.Random(seed)
    // duplicate-heavy values so order-statistic tie handling is hit
    (1 to n).map(i => (s"g${r.nextInt(5)}", r.nextInt(50).toLong, i.toLong))
  }

  test("exactPercentiles == brute-force ceil(n*p)-th order statistic") {
    for (seed <- Seq(7L, 21L, 99L)) {
      val rows = randRows(seed, 400)
      val got = Analytics.exactPercentiles(rows.toDF("g", "v", "tie"),
          "g", "v", Seq("tie"),
          Seq(0.25 -> "p25", 0.5 -> "p50", 0.9 -> "p90"), nName = "n")
        .collect()
        .map(r => r.getString(0) ->
          ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
      val exp = rows.groupBy(_._1).map { case (g, rs) =>
        val sorted = rs.map(t => (t._2, t._3)).sorted.map(_._1)
        // the same double arithmetic the operator's ceil(n*p) runs
        def pick(p: Double) = sorted(math.ceil(sorted.size * p).toInt - 1)
        g -> ((sorted.size.toLong, pick(0.25), pick(0.5), pick(0.9)))
      }
      assert(got == exp, s"seed $seed")
    }
  }

  test("iqrOutliers == brute-force integer-fence replica") {
    for (seed <- Seq(3L, 17L)) {
      val rows = randRows(seed, 300)
      val got = Analytics.iqrOutliers(rows.toDF("g", "v", "tie"),
          "g", "v", "tie")
        .collect()
        .map(r => r.getString(0) ->
          ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
      val exp = rows.groupBy(_._1).map { case (g, rs) =>
        val sorted = rs.map(t => (t._2, t._3)).sorted.map(_._1)
        val n = sorted.size
        val q1 = sorted(math.ceil(n * 0.25).toInt - 1)
        val q3 = sorted(math.ceil(n * 0.75).toInt - 1)
        val out = sorted.count(v =>
          2 * v < 2 * q1 - 3 * (q3 - q1) || 2 * v > 2 * q3 + 3 * (q3 - q1))
        g -> ((n.toLong, q1, q3, out.toLong))
      }
      assert(got == exp, s"seed $seed")
    }
  }

  test("bucketed order-statistic forms == plain forms on random data") {
    // the low-cardinality-regime variants must produce IDENTICAL
    // output to the per-group-window forms — duplicate-heavy values
    // (bucket-boundary ties) and several bucket counts
    for (seed <- Seq(5L, 42L); buckets <- Seq(1, 4, 64)) {
      val rows = randRows(seed, 350)
      val df = rows.toDF("g", "v", "tie")
      val plainP = Analytics.exactPercentiles(df, "g", "v", Seq("tie"),
        Seq(0.5 -> "p50", 0.9 -> "p90"), "n").collect()
        .map(r => r.getString(0) ->
          ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
      val bucketP = Analytics.exactPercentilesBucketed(df, "g", "v",
        Seq("tie"), Seq(0.5 -> "p50", 0.9 -> "p90"), "n",
        buckets = buckets).collect()
        .map(r => r.getString(0) ->
          ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
      assert(bucketP == plainP, s"seed $seed buckets $buckets")
      val plainI = Analytics.iqrOutliers(df, "g", "v", "tie").collect()
        .map(r => r.getString(0) ->
          ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
      val bucketI = Analytics.iqrOutliersBucketed(df, "g", "v", "tie",
        buckets = buckets).collect()
        .map(r => r.getString(0) ->
          ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
      assert(bucketI == plainI, s"seed $seed buckets $buckets")
    }
    // all-equal values inside a group: one range bucket, still exact
    val flat = Seq(("g", 7L, 1L), ("g", 7L, 2L), ("g", 7L, 3L))
      .toDF("g", "v", "tie")
    assert(Analytics.exactPercentilesBucketed(flat, "g", "v", Seq("tie"),
        Seq(0.5 -> "p50"), "n").collect().head.getLong(2) == 7L)
  }

  test("spearmanPpm (bucketed ranks) == brute-force rank replica") {
    import graft.operators.Stats
    for (seed <- Seq(2L, 44L)) {
      val r = new scala.util.Random(seed)
      val rows = (1L to 200L).map(k =>
        (s"g${r.nextInt(3)}", k, r.nextInt(40).toDouble, r.nextInt(9999).toLong))
      val got = Stats.spearmanPpm(rows.toDF("g", "k", "x", "y"),
          "g", "x", "y", "k").collect()
        .map(x => x.getString(0) -> ((x.getLong(1), x.getLong(2)))).toMap
      val exp = rows.groupBy(_._1).map { case (g, rs) =>
        val ra = rs.sortBy(t => (t._3, t._2)).zipWithIndex
          .map { case (t, i) => t._2 -> (i + 1L) }.toMap
        val rb = rs.sortBy(t => (t._4, t._2)).zipWithIndex
          .map { case (t, i) => t._2 -> (i + 1L) }.toMap
        val n = rs.size.toLong
        val d2 = rs.map(t => { val d = ra(t._2) - rb(t._2); d * d }).sum
        g -> ((n, 1000000L - (6000000L * d2) / (n * (n * n - 1))))
      }
      assert(got == exp, s"seed $seed")
    }
  }

  test("winsorize (bucketed bounds) == brute-force order-statistic clip") {
    import graft.operators.Stats
    for (seed <- Seq(9L, 77L)) {
      val r = new scala.util.Random(seed)
      val rows = (1L to 180L).map(k =>
        (s"g${r.nextInt(3)}", k, r.nextInt(30).toDouble))
      val got = Stats.winsorize(rows.toDF("g", "k", "v"),
          "g", "v", "k", pLo = 0.05, pHi = 0.95).collect()
        .map(x => (x.getString(0), x.getLong(1)) -> x.getDouble(3)).toMap
      val exp = rows.groupBy(_._1).flatMap { case (_, rs) =>
        val sorted = rs.sortBy(t => (t._3, t._2)).map(_._3)
        val n = sorted.size
        val lo = sorted(math.max(1, math.ceil(0.05 * n).toInt) - 1)
        val hi = sorted(math.ceil(0.95 * n).toInt - 1)
        rs.map(t => (t._1, t._2) -> math.min(math.max(t._3, lo), hi))
      }
      assert(got == exp, s"seed $seed")
    }
  }

  test("benford == BigInt first-digit replica; shares truncate toward zero") {
    val r = new scala.util.Random(11L)
    val vals = (1 to 500).map(_ => r.nextDouble() * math.pow(10, r.nextInt(6)))
    val got = Analytics.benford(vals.toDF("x"), "x").collect()
      .map(x => x.getString(0) -> ((x.getLong(1), x.getLong(2)))).toMap
    val digits = vals.map(v => math.floor(v).toLong.toString.take(1))
    val exp = digits.groupBy(identity).map { case (d, ds) =>
      val n = BigInt(ds.size)
      d -> ((ds.size.toLong, (n * 1000000 / BigInt(vals.size)).toLong))
    }
    assert(got == exp)
  }

  test("shareOfTotal == BigInt ppm replica on random aggregates") {
    val r = new scala.util.Random(23L)
    val rows = (1 to 40).map(i => (i.toLong, (r.nextInt(100000) + 1).toLong))
    val got = Analytics.shareOfTotal(rows.toDF("k", "cents"),
        "cents", "share_ppm")
      .collect().map(x => x.getLong(0) -> x.getLong(2)).toMap
    val total = BigInt(rows.map(_._2).sum)
    val exp = rows.map { case (k, c) =>
      k -> (BigInt(c) * 1000000 / total).toLong
    }.toMap
    assert(got == exp)
  }

  test("cohortLtv cumulative == per-cohort prefix-sum replica") {
    val r = new scala.util.Random(31L)
    val rows = (1 to 300).map(_ =>
      (r.nextInt(20).toLong, r.nextInt(6).toLong, r.nextInt(500).toLong))
    val got = Analytics.cohortLtv(rows.toDF("u", "p", "c"), "u", "p", "c")
      .collect()
      .map(x => (x.getLong(0), x.getLong(1)) ->
        ((x.getAs[Long]("cents"), x.getAs[Long]("n_users"),
          x.getAs[Long]("cum_cents")))).toMap
    val cohortOf = rows.groupBy(_._1).map { case (u, rs) =>
      u -> rs.map(_._2).min }
    val cells = rows.groupBy(t => (cohortOf(t._1), t._2 - cohortOf(t._1)))
      .map { case (key, rs) =>
        key -> ((rs.map(_._3).sum, rs.map(_._1).distinct.size.toLong)) }
    val exp = cells.map { case ((co, off), (cents, nu)) =>
      val cum = cells.collect {
        case ((c2, o2), (ct, _)) if c2 == co && o2 <= off => ct }.sum
      (co, off) -> ((cents, nu, cum))
    }
    assert(got == exp)
  }
}
