package graft

import graft.operators.Stats

/** Randomized-equivalence tests for the round-14 statistics operators:
  * each is pinned to an INDEPENDENT brute-force replica (plain Scala
  * collections / BigInt arithmetic) over seeded-random data — same
  * posture as AnalyticsPropertySpec. Few seeds, each property is a
  * Spark job.
  */
class StatsPropertySpec extends SparkTestBase {
  import spark.implicits._

  test("weightedQuartiles == brute expand-by-weight order statistics") {
    for (seed <- Seq(5L, 42L)) {
      val r = new scala.util.Random(seed)
      val rows = (1 to 300).map(i =>
        (r.nextInt(40).toLong - 10, r.nextInt(5).toLong + 1, i.toLong))
      val got = Stats.weightedQuartiles(rows.toDF("cents", "w", "tie"),
        "cents", "w", Seq("tie")).first()
      // brute: expand each value weight times, take the k-th smallest
      // with cum >= ceil(q * total) via the same >= compare
      val expanded = rows.flatMap { case (v, w, _) =>
        Seq.fill(w.toInt)(v)
      }.sorted
      val tw = expanded.size.toLong
      def pick(mulCum: Long, mulTot: Long): Long = {
        // smallest v whose 1-based cumulative count c has c*mulCum >= tw*mulTot
        val idx = (0 until expanded.size).find(i =>
          (i + 1).toLong * mulCum >= tw * mulTot).get
        expanded(idx)
      }
      assert(got.getAs[Long]("total_weight") === tw)
      assert(got.getAs[Long]("wq25_cents") === pick(4, 1), s"seed $seed q25")
      assert(got.getAs[Long]("wq50_cents") === pick(2, 1), s"seed $seed q50")
      assert(got.getAs[Long]("wq75_cents") === pick(4, 3), s"seed $seed q75")
    }
  }

  test("mannWhitneyU == brute tie-averaged rank sums (doubled)") {
    for (seed <- Seq(11L, 77L)) {
      val r = new scala.util.Random(seed)
      val rows = (1 to 400).map(_ =>
        (r.nextInt(30).toLong, if (r.nextBoolean()) 1 else 0))
      val row = Stats.mannWhitneyU(rows.toDF("cents", "half"),
        "cents", "half").first()
      // brute doubled rank sum of cohort 1 over the combined sample
      val sorted = rows.map(_._1).sorted
      val firstRank = sorted.zipWithIndex.groupBy(_._1)
        .map { case (v, xs) => v -> (xs.map(_._2).min + 1) }
      val blockSize = sorted.groupBy(identity).map { case (v, xs) => v -> xs.size }
      val r2a = rows.filter(_._2 == 1).map { case (v, _) =>
        2L * firstRank(v) + blockSize(v) - 1L // doubled avg rank of v's block
      }.sum
      val na = rows.count(_._2 == 1).toLong
      val n0 = rows.size - na
      assert(row.getAs[Long]("n0") === n0 && row.getAs[Long]("n1") === na)
      assert(row.getAs[Long]("u2_a") === r2a - na * (na + 1), s"seed $seed")
      assert(row.getAs[Long]("u2_max") === 2L * n0 * na)
    }
  }

  test("chiSquare == brute BigInt floor-sum over the dense grid") {
    for (seed <- Seq(13L, 31L)) {
      val r = new scala.util.Random(seed)
      val rows = (1 to 500).map(_ =>
        (s"a${r.nextInt(4)}", s"b${r.nextInt(3)}"))
      val row = Stats.chiSquare(rows.toDF("x", "y"), "x", "y").first()
      val n = BigInt(rows.size)
      val as = rows.map(_._1).distinct.sorted
      val bs = rows.map(_._2).distinct.sorted
      val cell = rows.groupBy(identity).map { case (k, xs) => k -> BigInt(xs.size) }
      val rt = rows.groupBy(_._1).map { case (k, xs) => k -> BigInt(xs.size) }
      val ct = rows.groupBy(_._2).map { case (k, xs) => k -> BigInt(xs.size) }
      val expected = (for (a <- as; b <- bs) yield {
        val o = cell.getOrElse((a, b), BigInt(0))
        val d = o * n - rt(a) * ct(b)
        val m = rt(a) * ct(b) * n
        // the operator's overflow-safe two-term floor split
        (d * d / m) * 1000000 + (d * d % m) * 1000000 / m
      }).sum
      assert(BigInt(row.getAs[Long]("chi2_ppm")) === expected, s"seed $seed")
      assert(row.getAs[Long]("dof") ===
        (as.size - 1).toLong * (bs.size - 1).toLong)
    }
  }

  test("paretoCoverage == brute sorted-cumsum coverage ranks") {
    for (seed <- Seq(23L, 61L)) {
      val r = new scala.util.Random(seed)
      val rows = (1 to 200).map(i => (i.toLong, r.nextInt(1000).toLong + 1))
      val thresholds = Seq(300000L, 500000L, 800000L, 950000L)
      val got = Stats.paretoCoverage(rows.toDF("k", "cents"), "k", "cents",
          thresholds)
        .collect().map(r2 => r2.getLong(0) -> r2.getLong(1)).toMap
      val sortedRev = rows.sortBy { case (k, v) => (-v, k) }.map(_._2)
      val total = sortedRev.sum
      val cums = sortedRev.scanLeft(0L)(_ + _).tail
      for (t <- thresholds) {
        val target = (total * t + 999999L) / 1000000L
        val exp = cums.indexWhere(_ >= target) + 1L
        assert(got(t) === exp, s"seed $seed threshold $t")
      }
    }
  }

  test("conformalThresholds == brute sorted selection at every alpha") {
    for (seed <- Seq(9L, 37L)) {
      val r = new scala.util.Random(seed)
      val rows = (1 to 350).map(i => (r.nextInt(500).toLong, i.toLong))
      val alphas = Seq(50000L, 100000L, 250000L, 500000L)
      val got = Stats.conformalThresholds(rows.toDF("cents", "id"),
          "cents", Seq("id"), alphas)
        .collect().map(r2 => r2.getLong(0) ->
          ((r2.getLong(2), r2.getLong(3)))).toMap
      val sorted = rows.map(_._1).sorted
      val n = sorted.size.toLong
      for (a <- alphas) {
        val rk = math.min(n, ((n + 1) * (1000000L - a) + 999999L) / 1000000L)
        assert(got(a) === ((rk, sorted((rk - 1).toInt))),
          s"seed $seed alpha $a")
      }
    }
  }

  test("bootstrapMeans == brute bit-membership sums") {
    val rows = (1L to 500L).map(i => (i, i * 7 % 101))
    val got = Stats.bootstrapMeans(rows.toDF("id", "cents"), "id", "cents",
        b = 16, seed = "prop")
      .collect().map(r => r.getInt(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    // brute: same md5-bit membership via MessageDigest
    val md = java.security.MessageDigest.getInstance("MD5")
    def u(id: Long): Long = {
      val hex = md.digest(s"$id:prop".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(13)
      java.lang.Long.parseLong(hex, 16)
    }
    for (b <- 0 until 16) {
      val in = rows.filter { case (id, _) => ((u(id) >> b) & 1L) == 1L }
      assert(got(b) === ((in.size.toLong, in.map(_._2).sum)), s"bit $b")
    }
  }
}
