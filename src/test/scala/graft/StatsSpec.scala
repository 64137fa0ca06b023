package graft

import graft.operators.{Corpus, Stats, Temporal}

class StatsSpec extends SparkTestBase {
  import spark.implicits._

  test("histogram: integer-cents bin assignment, boundary values land low") {
    // cents span [100, 200], 2 bins => bin = (xc-100)*2 div 101:
    // 1.50 (xc 150 -> 100 div 101 = 0) stays LOW, 1.51 tips HIGH
    val df = Seq(1.00, 1.50, 1.51, 2.00).toDF("v")
    val got = Stats.histogram(df, "v", nBins = 2)
      .collect().map(r => (r.getLong(0),
        (r.getLong(1), r.getDouble(2), r.getDouble(3)))).toMap
    assert(got == Map(0L -> ((2L, 1.00, 1.50)), 1L -> ((2L, 1.51, 2.00))))
  }

  test("histogram: single distinct value collapses to bin 0") {
    val got = Stats.histogram(Seq(5.0, 5.0, 5.0).toDF("v"), "v", nBins = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got == Map(0L -> 3L))
  }

  test("madOutliers: zero-MAD group flags any deviation; MAD group uses Hampel rule") {
    val df = Seq(
      // med=1, MAD=0: the 100 deviates, everything else is AT the median
      ("flat", 1.0), ("flat", 1.0), ("flat", 1.0), ("flat", 1.0),
      ("flat", 100.0),
      // med=3, devs (2,1,0,1,97), MAD=1 -> threshold 3*1.4826: only 97
      ("spread", 1.0), ("spread", 2.0), ("spread", 3.0), ("spread", 4.0),
      ("spread", 100.0)).toDF("g", "v")
    val got = Stats.madOutliers(df, "g", "v")
      .collect().map(r => (r.getString(0),
        (r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4)))).toMap
    assert(got == Map(
      "flat" -> ((5L, 1L, 1.0, 0.0)),
      "spread" -> ((5L, 1L, 3.0, 1.0))))
  }

  test("kruskalWallisH: hand-computed tie-corrected H; degenerate inputs read 0") {
    // A=[1,2,3], B=[4,5,6], C=[1,1,6]: doubled midranks give per-group
    // rank2 sums (22, 43, 25); H = 2.9913043 corrected -> 2991301 ppm
    // under the truncating integer pipeline (hand-replayed)
    val d = Seq(("A", 1L), ("A", 2L), ("A", 3L), ("B", 4L), ("B", 5L),
      ("B", 6L), ("C", 1L), ("C", 1L), ("C", 6L)).toDF("g", "cents")
    val r = graft.operators.Stats.kruskalWallisH(d, "cents", "g")
      .collect()(0)
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) ==
      ((9L, 3L, 2L, 2991301L)))
    // all values tied: C = 0 -> h_ppm 0 by contract
    val tied = Seq(("A", 5L), ("A", 5L), ("B", 5L), ("B", 5L))
      .toDF("g", "cents")
    assert(graft.operators.Stats.kruskalWallisH(tied, "cents", "g")
      .collect()(0).getLong(3) == 0L)
    // single group: h_ppm 0
    val one = Seq(("A", 1L), ("A", 2L)).toDF("g", "cents")
    assert(graft.operators.Stats.kruskalWallisH(one, "cents", "g")
      .collect()(0).getLong(3) == 0L)
  }

  test("cramersV: perfect association reads ~1e6, independence reads 0") {
    // 2x2 perfect association: a determines b
    val perfect = (Seq.fill(10)(("x", "p")) ++ Seq.fill(10)(("y", "q")))
      .toDF("a", "b")
    val vp = graft.operators.Stats.cramersV(perfect, "a", "b")
      .select("v_ppm", "dof").collect()(0)
    assert(vp.getLong(1) == 1L)
    assert(vp.getLong(0) >= 999000L && vp.getLong(0) <= 1000000L,
      s"perfect association v_ppm=${vp.getLong(0)}")
    // independence: uniform 2x2 grid -> chi2 = 0 -> v = 0
    val indep = Seq(("x", "p"), ("x", "q"), ("y", "p"), ("y", "q"))
      .flatMap(Seq.fill(5)(_)).toDF("a", "b")
    val vi = graft.operators.Stats.cramersV(indep, "a", "b")
      .select("v_ppm").collect()(0).getLong(0)
    assert(vi == 0L, s"independent grid v_ppm=$vi")
  }

  test("winsorize: exact order-statistic bounds, only input values appear") {
    // group g: values 1..20; rlo = ceil(0.05*20) = 1 -> lo = 1,
    // rhi = ceil(0.95*20) = 19 -> hi = 19; so 20 clips to 19 and the
    // minimum stays itself
    val df = (1 to 20).map(i => ("g", i.toLong, i.toDouble)).toDF("g", "id", "v")
    val got = Stats.winsorize(df, "g", "v", "id", 0.05, 0.95)
      .collect().map(r => r.getLong(1) -> r.getDouble(3)).toMap
    assert(got(20L) == 19.0 && got(19L) == 19.0 && got(1L) == 1.0 && got(10L) == 10.0)
    val clipped = got.values.toSet
    assert(clipped.subsetOf((1 to 20).map(_.toDouble).toSet))
  }

  test("privacy: k-anonymity and l-diversity flag exactly the risky groups") {
    import graft.operators.Privacy
    val df = Seq(
      ("DE", 1, "flu"), ("DE", 1, "cold"), ("DE", 1, "flu"),
      ("DE", 2, "flu"),                       // group of 1 -> k violation
      ("FR", 1, "flu"), ("FR", 1, "flu"), ("FR", 1, "flu")
    ).toDF("country", "band", "dx")
    val kv = Privacy.kAnonymityViolations(df, Seq("country", "band"), k = 3)
      .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2))).toSet
    assert(kv == Set(("DE", 2, 1L)))
    // FR group is 3-anonymous but every dx is identical -> l violation;
    // DE/1 has 2 distinct dx -> also < 3; DE/2 trivially
    val lv = Privacy.lDiversityViolations(df, Seq("country", "band"), "dx", l = 3)
      .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(3))).toSet
    assert(lv == Set(("DE", 1, 2L), ("DE", 2, 1L), ("FR", 1, 1L)))
  }

  test("ewmaHalfLife: hand-computed truncated weighted sum, missing history = 0") {
    val ev = Seq((1L, 10L, 1L, 8.0), (1L, 20L, 2L, 4.0), (1L, 30L, 3L, 2.0))
      .toDF("u", "ts", "id", "v")
    val got = Temporal.ewmaHalfLife(ev, "u", "ts", "id", "v", lags = 2)
      .collect().map(r => (r.getLong(1), r.getDouble(3))).toMap
    // t=10: 8; t=20: 4 + 8/2 = 8; t=30: 2 + 4/2 + 8/4 = 6
    assert(got == Map(10L -> 8.0, 20L -> 8.0, 30L -> 6.0))
  }

  test("transitions: counts and ppm probabilities on a crafted flow") {
    // user 1: A B A B  -> A->B x2, B->A x1; user 2: A C -> A->C x1
    val ev = Seq(
      (1L, 10L, 1L, "A"), (1L, 20L, 2L, "B"),
      (1L, 30L, 3L, "A"), (1L, 40L, 4L, "B"),
      (2L, 10L, 5L, "A"), (2L, 20L, 6L, "C")).toDF("u", "ts", "id", "st")
    val got = Temporal.transitions(ev, "u", "ts", "st", "id")
      .collect().map(r => ((r.getString(0), r.getString(1)),
        (r.getLong(2), r.getLong(3)))).toMap
    assert(got == Map(
      ("A", "B") -> ((2L, 666666L)), // 2·1e6 div 3
      ("A", "C") -> ((1L, 333333L)),
      ("B", "A") -> ((1L, 1000000L))))
  }

  test("resampleLocf: empty buckets carry forward, in-bucket last wins by (ts, tie)") {
    val ev = Seq(
      (1L, 1L, 1L, 1.0),  // bucket 0
      (1L, 5L, 2L, 2.0),  // bucket 0, later ts
      (1L, 5L, 3L, 3.0),  // bucket 0, same ts — higher tie wins
      (1L, 35L, 4L, 9.0), // bucket 3; buckets 1,2 are gaps
      (2L, 12L, 5L, 7.0)  // single-bucket key
    ).toDF("u", "ts", "id", "v")
    val got = Temporal.resampleLocf(ev, "u", "ts", "v", "id", step = 10L)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    assert(got == Map(
      (1L, 0L) -> 3.0, (1L, 10L) -> 3.0, (1L, 20L) -> 3.0, (1L, 30L) -> 9.0,
      (2L, 10L) -> 7.0))
  }

  test("transitions: tie at same ts breaks by tie column, not arrival order") {
    val ev = Seq(
      (1L, 10L, 2L, "B"), (1L, 10L, 1L, "A"), (1L, 20L, 3L, "C"))
      .toDF("u", "ts", "id", "st")
    val got = Temporal.transitions(ev, "u", "ts", "st", "id")
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(got == Set(("A", "B"), ("B", "C")))
  }

  test("pmiCollocations: integer lift ranks the exclusive pair first") {
    // tokens: a,b x3 each; c x7. N=13.
    // (a,b): c_ab=3 -> lift = 13·3·1e6 div (3·3) = 4333333
    // (c,c): c_ab=5 -> lift = 13·5·1e6 div (7·7) = 1326530
    val docs = Seq("a b", "a b", "a b", "c c c c", "c c c")
      .toDF("text")
    val got = Corpus.pmiCollocations(docs, "text", minCount = 3, k = 10)
      .collect().map(r => (r.getString(0), r.getString(1),
        r.getLong(2), r.getLong(3)))
    assert(got.toSeq == Seq(
      ("a", "b", 3L, 4333333L),
      ("c", "c", 5L, 1326530L)))
  }

  test("skyline: strict dominance drops, frontier ties and duplicates survive") {
    val pts = Seq(
      (1L, 1.0, 10L), // max y -> frontier
      (2L, 2.0, 5L),  // frontier
      (5L, 2.0, 5L),  // exact duplicate of 2 -> also survives
      (3L, 3.0, 1L),  // max x -> frontier
      (4L, 1.5, 3L)   // dominated by (2.0, 5) on both axes
    ).toDF("id", "x", "y")
    val got = Stats.skyline(pts, "x", "y", buckets = 2)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(got == Set(1L, 2L, 5L, 3L))
  }

  test("skyline: equal y with strictly greater x dominates") {
    val pts = Seq((1L, 1.0, 5L), (2L, 2.0, 5L)).toDF("id", "x", "y")
    val got = Stats.skyline(pts, "x", "y")
      .select("id").collect().map(_.getLong(0)).toSet
    assert(got == Set(2L))
  }

  test("skyline: all-identical x (degenerate single bucket) keeps max y only") {
    val pts = Seq((1L, 7.0, 1L), (2L, 7.0, 9L), (3L, 7.0, 9L)).toDF("id", "x", "y")
    val got = Stats.skyline(pts, "x", "y")
      .select("id").collect().map(_.getLong(0)).toSet
    assert(got == Set(2L, 3L))
  }

  test("nucleusTopP: budget boundary — crossing row kept, next row cut") {
    import graft.operators.Sampling
    val d = Seq((1L, 10L, 5L), (2L, 9L, 5L), (3L, 8L, 5L), (4L, 7L, 5L))
      .toDF("id", "score", "tok") // total 20 tokens
    // p=0.5: prefix budget 10 -> rows 1,2 (row 3's prefix is exactly 10)
    val half = Sampling.nucleusTopP(d, "score", "id", "tok", pPpm = 500000L)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(half == Set(1L, 2L))
    // p=0.6: budget 12 falls MID row 3 -> the crossing row is kept
    val sixty = Sampling.nucleusTopP(d, "score", "id", "tok", pPpm = 600000L)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(sixty == Set(1L, 2L, 3L))
  }

  test("nucleusTopP: bucket count never changes the result") {
    import graft.operators.Sampling
    val d = (1L to 40L).map(i => (i, (i * 7) % 13, 3L + i % 4))
      .toDF("id", "score", "tok")
    def run(b: Int) = Sampling.nucleusTopP(d, "score", "id", "tok",
        pPpm = 550000L, buckets = b)
      .select("id", "__cum").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(run(1) == run(4) && run(4) == run(64))
  }

  test("nucleusTopP: no BIGINT overflow at multi-trillion token totals") {
    import graft.operators.Sampling
    // 4 rows x 4e12 tokens = 1.6e13 total. The naive predicate
    // (cum - tok) * 1e6 wraps negative at row 4 (1.2e13 * 1e6 > Long.Max)
    // and would KEEP the over-budget row; the decomposed threshold must
    // cut it. p=0.5 -> budget 8e12 -> rows 1,2 (row 3's prefix is
    // exactly the budget, strict cut).
    val big = Seq((1L, 4L, 4000000000000L), (2L, 3L, 4000000000000L),
      (3L, 2L, 4000000000000L), (4L, 1L, 4000000000000L))
      .toDF("id", "score", "tok")
    val got = Sampling.nucleusTopP(big, "score", "id", "tok", pPpm = 500000L)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(got == Set(1L, 2L))
    // mid-row crossing at the same scale: budget 9.6e12 falls inside
    // row 3 -> crossing row kept, row 4 still cut
    val sixty = Sampling.nucleusTopP(big, "score", "id", "tok", pPpm = 600000L)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(sixty == Set(1L, 2L, 3L))
  }

  test("pmiCollocations: minCount prunes hapax pairs before ranking") {
    val docs = Seq("x y", "p q", "p q").toDF("text")
    val got = Corpus.pmiCollocations(docs, "text", minCount = 2, k = 10)
      .collect().map(r => (r.getString(0), r.getString(1)))
    assert(got.toSeq == Seq(("p", "q")))
  }

  test("cusumDaily: integer devs vs floor-mean, running-summed in day order") {
    import graft.operators.Stats
    val counts = Seq((1L, 4L), (2L, 7L), (3L, 5L)).toDF("day_idx", "n")
    val got = Stats.cusumDaily(counts, "day_idx", "n")
      .collect().map(r => (r.getLong(0), r.getLong(2))).sortBy(_._1).toSeq
    // mean_ppm = floor(16e6/3) = 5333333
    // devs: 4e6-5333333 = -1333333; 7e6-5333333 = 1666667; 5e6-5333333 = -333333
    assert(got == Seq((1L, -1333333L), (2L, 333334L), (3L, 1L)))
  }

  test("quantileNormalize: rank ppm within group, value ties break by the tie column") {
    import graft.operators.Stats
    val df = Seq((1L, "s", 10L), (2L, "s", 20L), (3L, "s", 30L),
      (4L, "t", 5L), (5L, "t", 5L)).toDF("id", "src", "v")
    val got = Stats.quantileNormalize(df, "src", "v", "id")
      .collect().map(r => (r.getLong(0), r.getLong(3))).toMap
    assert(got == Map(1L -> 0L, 2L -> 500000L, 3L -> 1000000L,
      4L -> 0L, 5L -> 1000000L))
  }

  test("targetEncodeLoo: own row excluded, singleton categories encode to null") {
    import graft.operators.Stats
    val df = Seq((1L, "a", 10L), (2L, "a", 20L), (3L, "a", 33L),
      (4L, "b", 7L)).toDF("id", "cat", "t")
    val got = Stats.targetEncodeLoo(df, "cat", "t", "id")
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(2)) None else Some(r.getLong(2)))).toMap
    // id 1: (63-10)/2 = 26; id 2: (63-20)/2 = 21; id 3: (63-33)/2 = 15
    assert(got == Map(1L -> Some(26L), 2L -> Some(21L), 3L -> Some(15L),
      4L -> None))
  }

  test("rfmScores: quintile digits follow the segment-relative total orders") {
    import graft.operators.Stats
    // one segment, 5 customers with strictly ordered R/F/M profiles:
    // customer i has recency rank i, frequency rank 6-i, monetary rank i
    val txns = (1L to 5L).flatMap { i =>
      // customer i: last date day (10+i), (6-i) orders of 100*i cents
      (1L to (6 - i)).map(j => (i, java.sql.Date.valueOf(
        f"2024-01-${10 + i}%02d"), 100L * i))
    }.toDF("k", "d", "c")
    val dims = (1L to 5L).map(i => (i, "SEG")).toDF("k", "seg")
    val got = Stats.rfmScores(txns, "k", "d", "c", dims, "seg")
      .collect().map(r => r.getLong(0) -> r.getLong(5)).toMap
    // recency: later last-date = smaller rec -> customer 5 gets r=1
    // frequency: customer 1 has most orders -> f=1
    // monetary: cust 1: 5*100=500; 2: 4*200=800; 3: 900; 4: 800; 5: 500
    //   desc with key tie-break: 3(900),2(800),4(800),1(500),5(500)
    assert(got == Map(1L -> 514L, 2L -> 422L, 3L -> 331L, 4L -> 243L,
      5L -> 155L))
  }

  test("spearmanPpm: perfect, inverted, and near-zero correlations by hand") {
    import graft.operators.Stats
    // group p: y = x (rho 1e6); group q: y = -x (rho -1e6)
    val df = ((1L to 5L).map(i => ("p", i, i * 10L, i)) ++
      (1L to 5L).map(i => ("q", i, -i * 10L, i + 10)))
      .toDF("g", "x", "y", "k")
    val got = Stats.spearmanPpm(df, "g", "x", "y", "k")
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(got == Map("p" -> 1000000L, "q" -> -1000000L))
  }

  test("tClosenessDistances: skewed group reports the exact TV ppm, balanced reports ~0") {
    import graft.operators.Privacy
    // global: a/b 50-50. g1 all-a (TV ~0.5); g2 mirrors the corpus
    val df = Seq(("g1", "a"), ("g1", "a"), ("g2", "a"), ("g2", "b"),
      ("g2", "a"), ("g2", "b")).toDF("grp", "s")
    val got = Privacy.tClosenessDistances(df, Seq("grp"), "s")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // global shares: a 4/6 -> 666666 ppm, b 2/6 -> 333333 ppm
    // g1: a 1e6, b 0 -> |1e6-666666| + |0-333333| = 666667 -> /2 = 333333
    // g2: a 500000, b 500000 -> |500000-666666|+|500000-333333| = 333333 -> 166666
    assert(got == Map("g1" -> 333333L, "g2" -> 166666L))
  }

  test("modePerGroup: majority wins, count ties break to the smaller value") {
    import graft.operators.Stats
    val df = Seq(("g", "b"), ("g", "b"), ("g", "a"),
      ("h", "y"), ("h", "x")).toDF("grp", "v")
    val got = Stats.modePerGroup(df, "grp", "v")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
      .toSet
    assert(got == Set(("g", "b", 2L), ("h", "x", 1L)))
  }

  test("bootstrapMeans: deterministic replay, half-ish coverage per resample, exact ppm means, resamples differ") {
    val df = spark.range(1000).toDF("id")
      .withColumn("cents", ($"id" % 100) * 10)
    def run() = Stats.bootstrapMeans(df, "id", "cents", b = 8)
      .orderBy("resample").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val a = run()
    assert(a.sameElements(run()), "same seed must replay identically")
    assert(a.length === 8 && a.map(_._1).toSeq === (0 until 8))
    // each resample keeps ~50% of 1000 rows (binomial: 3-sigma ~ 47)
    assert(a.forall { case (_, n, _, _) => n > 400 && n < 600 },
      s"resample sizes out of band: ${a.map(_._2).mkString(",")}")
    // exact integer identity per row
    assert(a.forall { case (_, n, s, m) => m === s * 1000000L / n })
    // the resamples must actually differ (that's the spread being read)
    assert(a.map(_._4).distinct.length > 1)
  }

  test("paretoCoverage: hand revenues 50/30/20 at thresholds 50/80/90%") {
    val df = Seq(("a", 50L), ("b", 30L), ("c", 20L)).toDF("k", "cents")
    val out = Stats.paretoCoverage(df, "k", "cents",
        thresholdsPpm = Seq(500000L, 800000L, 900000L))
      .orderBy("threshold_ppm").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // 50%: top key alone (50/100); 80%: two keys (80/100); 90%: three
    assert(out.toSeq === Seq((500000L, 1L, 3L), (800000L, 2L, 3L),
      (900000L, 3L, 3L)))
  }

  test("aucPpm: perfect separation reads 1e6, full tie reads 5e5, one inversion drops a quarter") {
    import graft.operators.Stats
    def auc(rows: Seq[(Long, Int)]): Long =
      Stats.aucPpm(rows.toDF("cents", "label"), "cents", "label")
        .head().getLong(2)
    // positives {3,4} all above negatives {1,2}
    assert(auc(Seq((1L, 0), (2L, 0), (3L, 1), (4L, 1))) == 1000000L)
    // a single tied value across classes: half credit
    assert(auc(Seq((2L, 0), (2L, 1))) == 500000L)
    // one of 4 (pos, neg) comparisons inverted: 3/4
    assert(auc(Seq((1L, 0), (3L, 0), (2L, 1), (4L, 1))) == 750000L)
  }

  test("aucPpm: past the 9e12 switch point the self-switching finish stays exact — no Int64 overflow") {
    import graft.operators.Stats
    import org.apache.spark.sql.functions._
    // 4.4M rows, n0 = n1 = 2.2e6 -> u2_max = 2*n0*n1 = 9.68e12 > 9e12:
    // the direct branch's u2_a*1e6 would overflow Int64 (~1.9e19);
    // the CASE must route through the quotient+remainder split. 1000
    // distinct score values, labels balanced WITHIN each value.
    val df = spark.range(4400000L).select(
      (col("id") % 1000L).as("cents"),
      ((col("id") / 1000L) % 2L).cast("int").as("label"))
    val got = Stats.aucPpm(df, "cents", "label").head()
    assert((got.getLong(0), got.getLong(1)) === ((2200000L, 2200000L)))
    // independent BigInt replay of the doubled-U frame + the same CASE
    val grouped = df.groupBy(col("cents")).agg(
        count(lit(1)).as("c"), sum(col("label")).as("ca"))
      .orderBy("cents").collect()
      .map(r => (r.getLong(1), r.getLong(2)))
    var before = BigInt(0); var r2a = BigInt(0)
    grouped.foreach { case (c, ca) =>
      r2a += BigInt(ca) * (2 * before + c + 1); before += c }
    val n1 = BigInt(grouped.map(_._2).sum)
    val n0 = BigInt(grouped.map(_._1).sum) - n1
    val u2a = r2a - n1 * (n1 + 1)
    val u2max = 2 * n0 * n1
    assert(u2max > BigInt(9000000000000L), "fixture must exercise the overflow branch")
    val expect = (u2a / u2max) * 1000000 +
      (u2a % u2max) / (u2max / 1000000)
    assert(got.getLong(2) === expect.toLong)
    // balanced labels within every value => exact half credit
    assert(got.getLong(2) === 500000L)
  }

  test("ksStatistic: non-1 cohort values count as cohort 0 (the mannWhitneyU convention), never dropped") {
    import graft.operators.Stats
    // h = 2 joins cohort 0: c0 = {1, 2}, c1 = {1}
    //   F0*1e6 at v=1,2: 500000, 1e6; F1*1e6: 1e6, 1e6 -> D = 500000
    val d = Seq((1L, 0), (2L, 2), (1L, 1)).toDF("cents", "half")
    val r = Stats.ksStatistic(d, "cents", "half").head()
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) === ((2L, 1L, 500000L)))
  }

  test("ksStatistic: hand CDFs — step diffs at every distinct value, identical cohorts read 0") {
    import graft.operators.Stats
    // cohort 0 = {1,2,3}, cohort 1 = {3,4}:
    //   F0*1e6 at v=1,2,3,4: 333333, 666666, 1e6, 1e6
    //   F1*1e6:                   0,      0, 5e5, 1e6
    // max |diff| = 666666 at v=2
    val d = (Seq(1L, 2L, 3L).map((_, 0)) ++ Seq(3L, 4L).map((_, 1)))
      .toDF("cents", "half")
    val r = Stats.ksStatistic(d, "cents", "half").head()
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) === ((3L, 2L, 666666L)))
    // identical cohorts: D = 0
    val same = (Seq(5L, 6L, 7L).map((_, 0)) ++ Seq(5L, 6L, 7L).map((_, 1)))
      .toDF("cents", "half")
    assert(Stats.ksStatistic(same, "cents", "half").head().getLong(2) == 0L)
  }

  test("mannWhitneyU: hand ranks with and without ties; U2_a + U2_b = 2*n0*n1") {
    // no ties: c0 {1,3}, c1 {2,4} -> R_A = 2+4 = 6, U = 3 -> u2 = 6
    val a = Stats.mannWhitneyU(Seq((1L, 0), (3L, 0), (2L, 1), (4L, 1))
      .toDF("cents", "half"), "cents", "half").first()
    assert((a.getAs[Long]("n0"), a.getAs[Long]("n1"),
      a.getAs[Long]("u2_a"), a.getAs[Long]("u2_max")) === ((2L, 2L, 6L, 8L)))
    // ties: c0 {1,2}, c1 {2,3} -> avg rank of the 2s is 2.5,
    // R_A = 2.5 + 4 = 6.5 -> R2 = 13, u2_a = 13 - 2*3 = 7
    val b = Stats.mannWhitneyU(Seq((1L, 0), (2L, 0), (2L, 1), (3L, 1))
      .toDF("cents", "half"), "cents", "half").first()
    assert(b.getAs[Long]("u2_a") === 7L)
    // complement: swapping cohorts must give u2_b with u2_a+u2_b = 2*n0*n1
    val c = Stats.mannWhitneyU(Seq((1L, 1), (2L, 1), (2L, 0), (3L, 0))
      .toDF("cents", "half"), "cents", "half").first()
    assert(b.getAs[Long]("u2_a") + c.getAs[Long]("u2_a") === 8L)
  }

  test("conformalThresholds: ceil((n+1)(1-alpha))-th smallest, exact-multiple boundary, cap at n") {
    val df = (1 to 10).map(i => (i.toLong * 10, i.toLong)).toDF("cents", "id")
    val out = Stats.conformalThresholds(df, "cents", Seq("id"),
        alphasPpm = Seq(100000L, 500000L))
      .orderBy("alpha_ppm").collect()
      .map(r => (r.getAs[Long]("alpha_ppm"), r.getAs[Long]("n"),
        r.getAs[Long]("rank_k"), r.getAs[Long]("threshold_cents")))
    // n=10: alpha .1 -> ceil(11*.9) = 10 -> 100; alpha .5 -> ceil(5.5) = 6 -> 60
    assert(out.toSeq === Seq((100000L, 10L, 10L, 100L),
      (500000L, 10L, 6L, 60L)))
    // exact multiple: n=9, alpha .1 -> ceil(10*.9) = 9 exactly (no +1 drift)
    val df9 = (1 to 9).map(i => (i.toLong * 10, i.toLong)).toDF("cents", "id")
    val r9 = Stats.conformalThresholds(df9, "cents", Seq("id"),
      alphasPpm = Seq(100000L)).first()
    assert((r9.getAs[Long]("rank_k"), r9.getAs[Long]("threshold_cents"))
      === ((9L, 90L)))
  }

  test("weightedQuartiles: lower weighted quantiles by cumulative mass, tie order totalized") {
    // values (cents, weight): 10x1, 20x1, 30x2 -> total 4
    // cum: 10->1, 20->2, 30->4; q25 needs cw>=1, q50 cw>=2, q75 cw>=3
    val df = Seq((10L, 1L, 1L, 1L), (20L, 1L, 2L, 1L), (30L, 2L, 3L, 1L))
      .toDF("cents", "w", "k1", "k2")
    val r = Stats.weightedQuartiles(df, "cents", "w", Seq("k1", "k2")).first()
    assert((r.getAs[Long]("total_weight"), r.getAs[Long]("wq25_cents"),
      r.getAs[Long]("wq50_cents"), r.getAs[Long]("wq75_cents"))
      === ((4L, 10L, 20L, 30L)))
    // one heavy row dominating: median = that row's value
    val df2 = Seq((5L, 100L, 1L, 1L), (99L, 1L, 2L, 1L))
      .toDF("cents", "w", "k1", "k2")
    assert(Stats.weightedQuartiles(df2, "cents", "w", Seq("k1", "k2"))
      .first().getAs[Long]("wq50_cents") === 5L)
  }

  test("chiSquare: independence gives 0; a perfectly associated 2x2 gives N*1e6; zero cells contribute via the densified grid") {
    def chi(pairs: Seq[(String, String)]) = {
      val r = Stats.chiSquare(pairs.toDF("a", "b"), "a", "b").first()
      (r.getAs[Long]("n"), r.getAs[Long]("dof"), r.getAs[Long]("chi2_ppm"))
    }
    // uniform 2x2: every cell o = r*c/N exactly -> chi2 = 0
    assert(chi(Seq(("x", "u"), ("x", "v"), ("y", "u"), ("y", "v")))
      === ((4L, 1L, 0L)))
    // perfect association (diagonal only): chi2 = N for a 2x2
    // (phi = 1). The off-diagonal ZERO cells only enter through the
    // densified grid — drop them and the statistic would be wrong.
    assert(chi(Seq(("x", "u"), ("x", "u"), ("y", "v"), ("y", "v")))
      === ((4L, 1L, 4000000L)))
    // worked 2x3 example, N=6: rows x:4 y:2; cols u:3 v:2 w:1
    // cells x:(u2,v1,w1) y:(u1,v1,w0)
    // d = o*6 - r*c per cell: x/u 0, x/v 6-8=-2, x/w 6-4=2,
    //                         y/u 6-6=0, y/v 6-4=2, y/w -2
    // terms*1e6: 4/(8*6)=1/12, 4/(4*6)=1/6, 4/(4*6)=1/6, 4/(2*6)=1/3
    // chi2 = 1/12+1/6+1/6+1/3 = 3/4 -> 750000 ppm (sum of floors:
    // 83333+166666+166666+333333 = 749998)
    val (n, dof, c23) = chi(Seq(("x", "u"), ("x", "u"), ("x", "v"),
      ("x", "w"), ("y", "u"), ("y", "v")))
    assert(n === 6L && dof === 2L && c23 === 749998L)
  }

  test("topPaths: trigram counts over the (ts, tie) order; ppm shares; topK tie-break") {
    // user 1: a b a b a  -> trigrams aba, bab, aba
    // user 2: a b a      -> aba
    val ev = Seq(
      (1L, 10L, 1L, "a"), (1L, 20L, 2L, "b"), (1L, 30L, 3L, "a"),
      (1L, 40L, 4L, "b"), (1L, 50L, 5L, "a"),
      (2L, 10L, 6L, "a"), (2L, 20L, 7L, "b"), (2L, 30L, 8L, "a")
    ).toDF("user_id", "ts", "event_id", "event_type")
    val out = Temporal.topPaths(ev, "user_id", "ts", "event_type",
        tieCol = "event_id", topK = 2)
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2),
        r.getLong(3), r.getLong(4)))
    // 4 trigrams total: aba x3 (750000 ppm), bab x1 (250000 ppm)
    assert(out.toSeq === Seq(("a", "b", "a", 3L, 750000L),
      ("b", "a", "b", 1L, 250000L)))
  }

  test("fairnessReport: per-cohort selection/TPR/FPR by hand; undefined rates stay NULL") {
    val d = Seq(
      (0L, 600000L, 1), (0L, 400000L, 1), (0L, 700000L, 0), (0L, 100000L, 0),
      (1L, 900000L, 1),
      (2L, 100000L, 0))
      .toDF("grp", "s", "l")
    val r = Stats.fairnessReport(d, "grp", "s", "l", thresholdPpm = 500000L)
      .collect().map(x => x.getLong(0) ->
        (x.getLong(1), x.getLong(2), x.getLong(3), x.getLong(4),
          Option(x.get(5)).map(_.asInstanceOf[Long]),
          Option(x.get(6)).map(_.asInstanceOf[Long]))).toMap
    // cohort 0: 2/4 selected; TP 1 of 2 positives; FP 1 of 2 negatives
    assert(r(0L) === ((4L, 2L, 2L, 500000L, Some(500000L), Some(500000L))))
    // cohort 1 has no negatives -> FPR is honestly NULL, not 0
    assert(r(1L) === ((1L, 1L, 1L, 1000000L, Some(1000000L), None)))
    // cohort 2 has no positives -> TPR NULL; nothing selected -> FPR 0
    assert(r(2L) === ((1L, 0L, 0L, 0L, None, Some(0L))))
  }

  test("isotonicCalibration: minimax fit equals hand-pooled PAV; already-monotone bins pass through; fit is non-decreasing") {
    // rates by decile bin: [1/2, 1/4, 3/4] with weight 4 each — classic
    // PAV pools the violating first two bins: (2+1)/(4+4) = 3/8 =
    // 375000 ppm exactly, then [375000, 375000, 750000]
    def rows(bin: Int, n: Int, pos: Int) = (0 until n)
      .map(i => (bin * 100000L + 50000L, if (i < pos) 1 else 0))
    val d = (rows(0, 4, 2) ++ rows(1, 4, 1) ++ rows(2, 4, 3)).toDF("s", "l")
    val r = Stats.isotonicCalibration(d, "s", "l", bins = 10)
      .orderBy("bin").collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getLong(2), x.getLong(4),
        x.getLong(5)))
    assert(r.toSeq === Seq(
      (0L, 4L, 2L, 500000L, 375000L),
      (1L, 4L, 1L, 250000L, 375000L),
      (2L, 4L, 3L, 750000L, 750000L)))
    assert(r.map(_._5).sliding(2).forall(p => p(0) <= p(1)),
      "fit must be non-decreasing across bins")
    // an already-monotone curve is a PAV fixed point: fit == rate
    val mono = (rows(0, 4, 1) ++ rows(1, 4, 2) ++ rows(2, 4, 3))
      .toDF("s", "l")
    val rm = Stats.isotonicCalibration(mono, "s", "l", bins = 10)
      .orderBy("bin").collect()
    assert(rm.forall(x => x.getLong(5) === x.getLong(4)),
      "monotone input must pass through unpooled")
  }

  test("fairnessReport: NULL labels drop out of BOTH rate denominators; NULL scores count as not-selected") {
    // group 0: 1 pos (selected), 1 neg (selected), 2 NULL labels — the
    // NULL-label rows count in n but in NEITHER rate denominator, so
    // TPR = 1/1 and FPR = 1/1 (the old n − n_pos form would have read
    // FPR = 1/3, silently deflated by the unlabeled rows)
    val d = Seq(
      (0L, Some(600000L), Option(1)), (0L, Some(700000L), Option(0)),
      (0L, Some(900000L), None), (0L, Some(100000L), None),
      // group 1: a NULL score is not-selected (sel and __fp both skip
      // it) but IS a real negative in the FPR denominator
      (1L, Some(800000L), Option(0)), (1L, None, Option(0)))
      .toDF("grp", "s", "l")
    val r = Stats.fairnessReport(d, "grp", "s", "l", thresholdPpm = 500000L)
      .collect().map(x => x.getLong(0) ->
        (x.getLong(1), x.getLong(2), x.getLong(3), x.getLong(4),
          Option(x.get(5)).map(_.asInstanceOf[Long]),
          Option(x.get(6)).map(_.asInstanceOf[Long]))).toMap
    assert(r(0L) === ((4L, 1L, 3L, 750000L, Some(1000000L), Some(1000000L))))
    assert(r(1L) === ((2L, 0L, 1L, 500000L, None, Some(500000L))))
  }

  test("cliffsDelta: perfect separation ±1e6, identical cohorts 0, one inversion by hand") {
    // cohort 1 entirely above cohort 0 -> delta = +1e6
    val sep = Seq((1L, 0), (2L, 0), (10L, 1), (20L, 1)).toDF("c", "h")
    val s = Stats.cliffsDelta(sep, "c", "h").head()
    assert((s.getLong(0), s.getLong(1), s.getLong(2)) === ((2L, 2L, 1000000L)))
    // reversed -> -1e6 (the sign arrives by subtraction, never a
    // negative numerator meeting div)
    val rev = Seq((10L, 0), (20L, 0), (1L, 1), (2L, 1)).toDF("c", "h")
    assert(Stats.cliffsDelta(rev, "c", "h").head().getLong(2) === -1000000L)
    // identical single-value cohorts: all ties -> AUC 1/2 -> delta 0
    val tie = Seq((5L, 0), (5L, 0), (5L, 1)).toDF("c", "h")
    assert(Stats.cliffsDelta(tie, "c", "h").head().getLong(2) === 0L)
    // one inversion among 4 cross pairs: wins 3, losses 1 ->
    // delta = (3-1)/4 = 500000
    val inv = Seq((1L, 0), (3L, 0), (2L, 1), (4L, 1)).toDF("c", "h")
    assert(Stats.cliffsDelta(inv, "c", "h").head().getLong(2) === 500000L)
  }

  test("brierScore: hand values; hi/lo sum split equals a BigInt replay on a pseudorandom frame") {
    // (1e6,1) and (0,0) are perfect (d = 0); (5e5,1) and (25e4,0) miss
    // by 5e5 and 25e4 — Σd² = 25e10 + 6.25e10 = 3.125e11,
    // brier = 3.125e11 div (4·1e6) = 78125
    val d = Seq((1000000L, 1), (0L, 0), (500000L, 1), (250000L, 0))
      .toDF("score_ppm", "label")
    val r = Stats.brierScore(d, "score_ppm", "label").head()
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) ===
      ((4L, 2L, 78125L)))
    // the hi/lo split must equal floor(Σ BigInt(d)² / (n·1e6)) exactly
    // on a frame whose Σd² crosses the naive-sum comfort zone shape
    val rows = (0 until 20000).map { i =>
      ((i.toLong * 7919L) % 1000001L, if (i % 3 == 0) 1 else 0) }
    val big = rows.map { case (s, l) =>
      val dd = BigInt(s - l * 1000000L); dd * dd }.sum
    val expected = (big / (BigInt(rows.size) * 1000000)).toLong
    val g = Stats.brierScore(rows.toDF("score_ppm", "label"),
      "score_ppm", "label").head()
    assert(g.getLong(2) === expected)
    // empty frame: n = 0 reports brier 0, not a divide-by-zero null
    val empty = Seq.empty[(Long, Int)].toDF("score_ppm", "label")
    val e = Stats.brierScore(empty, "score_ppm", "label").head()
    assert((e.getLong(0), e.getLong(2)) === ((0L, 0L)))
  }

  test("brierScore / calibrationBins: an out-of-range score is a LOUD contract error") {
    val bad = Seq((1000001L, 1)).toDF("score_ppm", "label")
    val e1 = intercept[Exception](
      Stats.brierScore(bad, "score_ppm", "label").collect())
    assert(e1.getMessage.contains("score_ppm must be in [0, 1e6]"))
    val neg = Seq((-1L, 0)).toDF("score_ppm", "label")
    val e2 = intercept[Exception](
      Stats.calibrationBins(neg, "score_ppm", "label").collect())
    assert(e2.getMessage.contains("score_ppm must be in [0, 1e6]"))
  }

  test("calibrationBins: decile assignment with the top-bin clamp, truncating means and rates") {
    // 0 and 99999 land in bin 0; 100000 tips into bin 1; the exact
    // 1e6 score clamps into bin 9 (not a phantom bin 10)
    val d = Seq((0L, 0), (99999L, 1), (100000L, 0), (1000000L, 1))
      .toDF("score_ppm", "label")
    val got = Stats.calibrationBins(d, "score_ppm", "label", bins = 10)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(got === Map(
      0L -> ((2L, 1L, 49999L, 500000L)),
      1L -> ((1L, 0L, 100000L, 0L)),
      9L -> ((1L, 1L, 1000000L, 1000000L))))
  }

  test("expectedCalibrationError: bin-weighted |confidence - accuracy|; perfectly calibrated extremes read 0") {
    // the calibrationBins fixture: ECE = (2·|49999−500000| +
    // 1·|100000−0| + 1·|1000000−1000000|) div 4 = 1000002 div 4
    val d = Seq((0L, 0), (99999L, 1), (100000L, 0), (1000000L, 1))
      .toDF("score_ppm", "label")
    val r = Stats.expectedCalibrationError(d, "score_ppm", "label").head()
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) ===
      ((4L, 3L, 250000L)))
    // confident and correct at both extremes: every bin's mean score
    // equals its positive rate exactly
    val cal = Seq((0L, 0), (0L, 0), (1000000L, 1)).toDF("score_ppm", "label")
    val c = Stats.expectedCalibrationError(cal, "score_ppm", "label").head()
    assert((c.getLong(0), c.getLong(1), c.getLong(2)) === ((3L, 2L, 0L)))
  }
}
