package graft

import graft.operators.{Eval, Similarity}
import org.apache.spark.sql.functions._

/** Hand-computed fixtures for the retrieval-eval tier: recall@k,
  * reciprocal rank, precision@k, and the quantized integer-dot
  * ranking they score. */
class EvalSpec extends SparkTestBase {
  import spark.implicits._

  private def ranked(rows: (Long, Long, Int)*) =
    rows.toDF("query_id", "corpus_id", "rank")

  test("recallAtK: per-query overlap in ppm; missed queries keep a 0-hit row") {
    val exact = ranked((1L, 10L, 1), (1L, 11L, 2), (1L, 12L, 3),
      (2L, 20L, 1), (2L, 21L, 2), (2L, 22L, 3))
    // query 1 recovers 2 of 3; query 2 recovers none
    val approx = ranked((1L, 10L, 1), (1L, 12L, 2), (1L, 99L, 3),
      (2L, 98L, 1), (2L, 97L, 2), (2L, 96L, 3))
    val r = Eval.recallAtK(approx, exact, k = 3).collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getLong(2), x.getLong(3)))
      .toSet
    assert(r == Set((1L, 2L, 3L, 666666L), (2L, 0L, 3L, 0L)))
  }

  test("recallAtK: ranks past k are ignored on both sides") {
    val exact = ranked((1L, 10L, 1), (1L, 11L, 2), (1L, 12L, 3))
    val approx = ranked((1L, 11L, 1), (1L, 10L, 4))
    val r = Eval.recallAtK(approx, exact, k = 2).collect().head
    // exact top-2 = {10, 11}; approx top-2 = {11} (rank 4 dropped)
    assert(r.getAs[Long]("n_hits") == 1L && r.getAs[Long]("n_exact") == 2L &&
      r.getAs[Long]("recall_ppm") == 500000L)
  }

  test("rankingQuality: MRR from the first relevant rank, 0 when none relevant") {
    val d = Seq((1L, 100L, 1, false), (1L, 101L, 2, false), (1L, 102L, 3, true),
      (1L, 103L, 4, true), (2L, 200L, 1, false), (2L, 201L, 2, false))
      .toDF("query_id", "corpus_id", "rank", "rel")
    val r = Eval.rankingQuality(d, "rel", k = 4).collect()
      .map(x => (x.getLong(0),
        if (x.isNullAt(1)) -1L else x.getLong(1),
        x.getLong(2), x.getLong(3), x.getLong(4))).toSet
    // q1: first rel at 3 -> rr 333333, 2 rel of 4; q2: none -> rr 0
    assert(r == Set((1L, 3L, 333333L, 2L, 500000L),
      (2L, -1L, 0L, 0L, 0L)))
  }

  test("ndcgAtK: baked weights match hand log2 discounts; DCG/IDCG from the ideal re-sort; edge conventions") {
    // w_i = round(1e6/log2(i+1)): positions 1..4
    assert(Eval.ndcgWeights(4) === Seq(1000000L, 630930L, 500000L, 430677L))
    // one query, rels by rank = (0, 3, 1, 0):
    //   DCG  = 3*630930 + 1*500000            = 2392790
    //   IDCG = 3*1000000 + 1*630930 (re-sort) = 3630930
    val df = Seq((7L, 1, 0L), (7L, 2, 3L), (7L, 3, 1L), (7L, 4, 0L))
      .toDF("query_id", "rank", "rel")
    val r = Eval.ndcgAtK(df, "rel", k = 4).head()
    assert((r.getLong(1), r.getLong(2), r.getLong(3)) ===
      ((4L, 2392790L, 3630930L)))
    assert(r.getLong(4) === 2392790L * 1000000L / 3630930L)
    // perfect ordering reads exactly 1e6
    val perfect = Seq((1L, 1, 3L), (1L, 2, 1L), (1L, 3, 0L))
      .toDF("query_id", "rank", "rel")
    assert(Eval.ndcgAtK(perfect, "rel", 3).head().getLong(4) === 1000000L)
    // all-irrelevant query: IDCG = 0 -> ndcg 0 by convention
    val none = Seq((2L, 1, 0L), (2L, 2, 0L)).toDF("query_id", "rank", "rel")
    assert(Eval.ndcgAtK(none, "rel", 2).head().getLong(4) === 0L)
    // ranks past k are ignored
    val past = Seq((3L, 1, 1L), (3L, 9, 3L)).toDF("query_id", "rank", "rel")
    assert(Eval.ndcgAtK(past, "rel", 2).head().getLong(2) === 1000000L)
  }

  test("averagePrecisionAtK: hand AP over precision-at-hits; no-hit query reports 0; ranks past k ignored") {
    // query 1: rel at ranks 1 and 3 of 4 — AP = (p@1 + p@3)/2 =
    // (1000000 + 2000000 div 3) div 2 = 833333; query 2: no hit -> 0
    val d = Seq((1L, 1, true), (1L, 2, false), (1L, 3, true),
      (1L, 4, false), (2L, 1, false), (2L, 2, false))
      .toDF("query_id", "rank", "rel")
    val r = Eval.averagePrecisionAtK(d, "rel", k = 4).collect()
      .map(x => x.getLong(0) -> (x.getLong(1), x.getLong(2), x.getLong(3)))
      .toMap
    assert(r === Map(1L -> ((4L, 2L, 833333L)), 2L -> ((2L, 0L, 0L))))
    // a relevant hit past k neither scores nor counts in n_rel (the
    // AP@k convention: grade the list you can see)
    val past = Seq((3L, 1, true), (3L, 9, true)).toDF("query_id", "rank", "rel")
    val p = Eval.averagePrecisionAtK(past, "rel", k = 2).head()
    assert((p.getLong(1), p.getLong(2), p.getLong(3)) ===
      ((1L, 1L, 1000000L)))
  }

  test("kendallTau: hand concordance — perfect, inverted, one-inversion, single-item, and intersection-only scoring") {
    val a = ranked((1L, 10L, 1), (1L, 11L, 2), (1L, 12L, 3),
      (2L, 20L, 1), (2L, 21L, 2), (2L, 22L, 3),
      (3L, 30L, 1), (3L, 31L, 2), (3L, 32L, 3),
      (4L, 40L, 1), (4L, 99L, 2))
    val b = ranked((1L, 10L, 1), (1L, 11L, 2), (1L, 12L, 3),   // same order
      (2L, 20L, 3), (2L, 21L, 2), (2L, 22L, 1),               // reversed
      (3L, 30L, 2), (3L, 31L, 1), (3L, 32L, 3),               // one inversion
      (4L, 40L, 1), (4L, 98L, 2))                             // one shared item
    val r = Eval.kendallTau(a, b, k = 3).collect()
      .map(x => x.getLong(0) -> (x.getLong(1), x.getLong(2), x.getLong(3)))
      .toMap
    assert(r(1L) === ((3L, 3L, 1000000L)))
    assert(r(2L) === ((3L, -3L, -1000000L)))
    // (30,31) inverted, (30,32) and (31,32) concordant: cd = 1,
    // tau = 1e6 div 3 — and the negative twin divides the MAGNITUDE
    assert(r(3L) === ((3L, 1L, 333333L)))
    // items 99/98 exist in only one list: the intersection is {40}
    // alone — no pair to order, tau 0 by convention
    assert(r(4L) === ((1L, 0L, 0L)))
  }

  test("ndcgAtK / averagePrecisionAtK: rank < 1 and duplicate ranks are LOUD contract errors; valid input unchanged") {
    // a negative rank would silently read the weight array from the
    // END (element_at's negative-index semantics) — it must fail
    val neg = Seq((1L, -1, 2L), (1L, 1, 1L)).toDF("query_id", "rank", "rel")
    val e1 = intercept[Exception](Eval.ndcgAtK(neg, "rel", 5).collect())
    assert(e1.getMessage.contains("rank must be >= 1"))
    val zero = Seq((1L, 0, 2L)).toDF("query_id", "rank", "rel")
    val e2 = intercept[Exception](Eval.ndcgAtK(zero, "rel", 5).collect())
    assert(e2.getMessage.contains("rank must be >= 1"))
    // duplicate ranks within a query would double-count weights
    val dup = Seq((1L, 2, 2L), (1L, 2, 1L), (1L, 1, 0L))
      .toDF("query_id", "rank", "rel")
    val e3 = intercept[Exception](Eval.ndcgAtK(dup, "rel", 5).collect())
    assert(e3.getMessage.contains("duplicate ranks"))
    // same contract on the AP side
    val negB = Seq((1L, -1, true)).toDF("query_id", "rank", "rel")
    val e4 = intercept[Exception](
      Eval.averagePrecisionAtK(negB, "rel", 5).collect())
    assert(e4.getMessage.contains("rank must be >= 1"))
    val dupB = Seq((1L, 3, true), (1L, 3, false)).toDF("query_id", "rank", "rel")
    val e5 = intercept[Exception](
      Eval.averagePrecisionAtK(dupB, "rel", 5).collect())
    assert(e5.getMessage.contains("duplicate ranks"))
    // well-formed rankings still flow through both operators
    val ok = Seq((1L, 1, 1L), (1L, 2, 0L)).toDF("query_id", "rank", "rel")
    assert(Eval.ndcgAtK(ok, "rel", 2).head().getLong(4) === 1000000L)
  }

  test("nearestCentroidConfusion: separable labels classify; a planted outlier crosses over") {
    // label 0: two vectors at (1,0) plus one mislabeled at (0,1);
    // label 1: two at (0,1). Integer centroids: c0 = (666666, 333333),
    // c1 = (0, 1000000) — the outlier is L2-closer to c1.
    val d = Seq((1L, 0, Seq(1.0f, 0.0f)), (2L, 0, Seq(1.0f, 0.0f)),
      (3L, 0, Seq(0.0f, 1.0f)), (4L, 1, Seq(0.0f, 1.0f)),
      (5L, 1, Seq(0.0f, 1.0f))).toDF("vec_id", "label", "embedding")
    val r = Similarity.nearestCentroidConfusion(d, "vec_id", "label",
        "embedding").collect()
      .map(x => (x.getInt(0), x.getInt(1), x.getLong(2))).toSet
    assert(r == Set((0, 0, 2L), (0, 1, 1L), (1, 1, 2L)))
  }

  test("featureHash: stable buckets, signed counts scale with repetition, dim bound holds") {
    import graft.operators.Corpus
    val d = Seq((1L, "alpha beta alpha"), (2L, "alpha"), (3L, "beta beta"))
      .toDF("doc_id", "text")
    val r = Corpus.featureHash(d, "doc_id", "text", dim = 64).collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getLong(2)))
    assert(r.forall { case (_, f, _) => f >= 0 && f < 64 })
    // the same token always lands in the same bucket with the same
    // sign: doc 2 pins alpha's (bucket, sign), doc 3 pins beta's at
    // twice the unit — doc 1 must equal 2*alpha + 1*beta exactly
    val byDoc = r.groupBy(_._1).map { case (k, v) =>
      k -> v.map(t => t._2 -> t._3).toMap }
    val (alphaF, alphaUnit) = byDoc(2L).head
    assert(alphaUnit.abs == 1L)
    val (betaF, betaTwo) = byDoc(3L).head
    assert(betaTwo.abs == 2L)
    val expected1 = Seq(alphaF -> 2L * alphaUnit, betaF -> betaTwo / 2L)
      .groupMapReduce(_._1)(_._2)(_ + _).filter(_._2 != 0L)
    assert(byDoc(1L) == expected1)
  }

  test("rrfFuse: agreement beats a single top spot; scores are exact integer sums") {
    // list A: x first, y second; list B: y first, x absent.
    // y: 1e6/61 + 1e6/60 = 16393+16666 = 33059 beats x: 1e6/60 = 16666
    val a = ranked((1L, 100L, 1), (1L, 200L, 2))
    val b = ranked((1L, 200L, 1), (1L, 300L, 2))
    val r = graft.operators.Eval.rrfFuse(Seq(a, b), k = 59, topK = 3)
      .collect()
      .map(x => (x.getAs[Long]("corpus_id"), x.getAs[Long]("rrf_score"),
        x.getAs[Long]("n_lists"), x.getAs[Int]("rank")))
      .sortBy(_._4)
    assert(r(0) == (200L, 33059L, 2L, 1))
    assert(r(1) == (100L, 16666L, 1L, 2))
    assert(r(2) == (300L, 16393L, 1L, 3))
  }

  test("epochOrder: dense 1..n positions, different permutations across epochs, stable within") {
    import graft.operators.Sampling
    val d = (1L to 200L).toDF("doc_id")
    val e1 = Sampling.epochOrder(d, "doc_id", epoch = 1)
      .as[(Long, Long)].collect().toMap
    assert(e1.values.toSeq.sorted == (1L to 200L))
    val e1again = Sampling.epochOrder(d, "doc_id", epoch = 1)
      .as[(Long, Long)].collect().toMap
    assert(e1again == e1)
    val e2 = Sampling.epochOrder(d, "doc_id", epoch = 2)
      .as[(Long, Long)].collect().toMap
    assert(e2 != e1)
    assert(e2.values.toSeq.sorted == (1L to 200L))
  }

  test("centroidCalibration: bins partition the corpus; totals agree with the confusion diagonal") {
    val emb = spark.read.parquet(sf("sf0.01") + "/embeddings.parquet")
    val cal = Similarity.centroidCalibration(emb, "vec_id", "label",
      "embedding", bins = 10).collect()
    val n = emb.count()
    assert(cal.map(_.getAs[Long]("n")).sum == n)
    assert(cal.map(_.getAs[Long]("bin")).toSet == (0L to 9L).toSet)
    // equal-count deciles on 500 rows: every bin holds exactly 50
    assert(cal.forall(_.getAs[Long]("n") == n / 10))
    // total correct across bins == the confusion matrix diagonal
    val diag = Similarity.nearestCentroidConfusion(emb, "vec_id", "label",
        "embedding").collect()
      .filter(r => r.getInt(0) == r.getInt(1)).map(_.getAs[Long]("n")).sum
    assert(cal.map(_.getAs[Long]("n_correct")).sum == diag)
    // distance ranges are ordered bin to bin (confidence is monotone)
    val sorted = cal.sortBy(_.getAs[Long]("bin"))
    sorted.sliding(2).foreach { case Array(a, b) =>
      assert(a.getAs[Long]("hi_dist") <= b.getAs[Long]("lo_dist"))
    }
  }

  test("quantizedTopK at int8 scale reproduces the exact cosine top-1 on planted near-copies") {
    val emb = spark.read.parquet(sf("sf0.001") + "/embeddings.parquet")
    val q = emb.filter(col("vec_id") < 5)
      .select((col("vec_id") + 200000).as("vec_id"),
        concat(array(element_at(col("embedding"), 1) + lit(0.02f)),
          slice(col("embedding"), 2, 100000)).as("embedding"))
    val exact = Similarity.bruteForceTopK(emb, q, "vec_id", "embedding", 1)
      .select($"query_id", $"corpus_id").as[(Long, Long)].collect().toMap
    val quant = Similarity.quantizedTopK(emb, q, "vec_id", "embedding", 1)
      .select($"query_id", $"corpus_id").as[(Long, Long)].collect().toMap
    assert(quant == exact)
    // and the eval tier agrees: recall@1 of int8 vs exact is 1.0
    val r = Eval.recallAtK(
      Similarity.quantizedTopK(emb, q, "vec_id", "embedding", 1),
      Similarity.bruteForceTopK(emb, q, "vec_id", "embedding", 1), 1)
      .select($"recall_ppm").as[Long].collect()
    assert(r.nonEmpty && r.forall(_ == 1000000L))
  }

  test("IVF-PQ refine stage lifts recall@10 strictly above the ADC-only ranking at equal nprobe") {
    val dir = sf("sf0.001")
    val emb = spark.read.parquet(dir + "/embeddings.parquet")
    val q = emb.filter(col("vec_id") < 5)
      .select((col("vec_id") + 200000).as("vec_id"),
        concat(array(element_at(col("embedding"), 1) + lit(0.02f)),
          slice(col("embedding"), 2, 100000)).as("embedding"))
    val coarse = SparkEntry.ivfCentroidsFor(spark, dir)
    val cb = SparkEntry.pqCodebookFor(spark, dir)
    val exact = Similarity.bruteForceTopK(emb, q, "vec_id", "embedding", 10)
    def hits(refine: Boolean): Long = Eval.recallAtK(
      graft.operators.Pq.ivfAdcTopK(emb, q, "vec_id", "embedding", k = 10,
        coarse, cb, nprobe = 2, rerank = 32, refine = refine),
      exact, 10).agg(sum($"n_hits")).as[Long].head()
    val refined = hits(refine = true)
    val unrefined = hits(refine = false)
    // the exact re-rank of the SAME ADC candidate window must strictly
    // beat ranking by the compressed-domain distance alone — the
    // standard recall lever the refine stage exists for
    assert(refined > unrefined,
      s"refine should lift recall@10: refined=$refined unrefined=$unrefined")
    // and the refined top-1 is still every query's planted near-copy
    val top1 = graft.operators.Pq.ivfAdcTopK(emb, q, "vec_id", "embedding",
      k = 1, coarse, cb, nprobe = 2, rerank = 32)
      .select($"query_id", $"corpus_id").as[(Long, Long)].collect().toMap
    val bruteTop1 = Similarity.bruteForceTopK(emb, q, "vec_id", "embedding", 1)
      .select($"query_id", $"corpus_id").as[(Long, Long)].collect().toMap
    assert(top1 == bruteTop1)
  }

  test("kmvCardinalityError: below-capacity groups are exact (err 0)") {
    import graft.operators.Eval
    // 3 distinct values < k=32: the sketch IS the value set
    val d = Seq(("a", 1L), ("a", 2L), ("a", 2L), ("a", 3L), ("b", 9L))
      .toDF("g", "v")
    val r = Eval.kmvCardinalityError(d, Seq("g"), "v", k = 32)
      .select($"g", $"n_est", $"n_exact", $"err_ppm")
      .as[(String, Long, Long, Long)].collect().toSet
    assert(r == Set(("a", 3L, 3L, 0L), ("b", 1L, 1L, 0L)))
  }

  test("quantileSketchRankError: full-capacity sketch has zero rank error; targets use integer formulas") {
    import graft.operators.Eval
    // k >= n: the sketch holds every row, so estimates are the true
    // interpolated quantiles and the observed ranks land within the
    // interpolation bracket of the targets
    val d = (1 to 20).map(i => ("g", i.toDouble, i.toLong)).toDF("g", "v", "id")
    val r = Eval.quantileSketchRankError(d, "g", "v", "id", k = 64)
      .collect().head
    assert(r.getAs[Long]("n") == 20L)
    assert(r.getAs[Long]("rank_exact_p50") == 10L) // ceil(20/2) - wait, (20+1) div 2 = 10
    assert(r.getAs[Long]("rank_exact_p90") == 18L) // (20*9+9) div 10
    // quantile_cont p50 over 1..20 = 10.5 -> 10 values <= it; p90 =
    // 18.1 -> 18 values <= it: zero rank error at full capacity
    assert(r.getAs[Long]("err_p50_ppm") == 0L)
    assert(r.getAs[Long]("err_p90_ppm") == 0L)
  }

  test("cohensKappa: perfect agreement 1e6; independent raters ~0; single-class degenerate 0") {
    def kappa(pairs: Seq[(String, String)]): (Long, Long, Long) = {
      val r = Eval.cohensKappa(pairs.toDF("a", "b"), "a", "b").first()
      (r.getAs[Long]("po_ppm"), r.getAs[Long]("pe_ppm"),
        r.getAs[Long]("kappa_ppm"))
    }
    // perfect: po = 1, kappa = exactly 1e6 regardless of marginals
    assert(kappa(Seq(("x", "x"), ("y", "y"), ("x", "x")))._3 === 1000000L)
    // independent: a 2x2 with uniform marginals, po = pe = 1/2 -> 0
    val (po, pe, k0) = kappa(Seq(
      ("x", "x"), ("x", "y"), ("y", "x"), ("y", "y")))
    assert(po === 500000L && pe === 500000L && k0 === 0L)
    // both raters constant: n^2 == pe_num, the guarded degenerate case
    assert(kappa(Seq(("x", "x"), ("x", "x")))._3 === 0L)
    // worked asymmetric example: 10 pairs, diag 5+2 = 7, marginals
    // a: x=7 y=3, b: x=6 y=4 -> pe_num = 42 + 12 = 54
    // kappa = (7*10 - 54) * 1e6 div (100 - 54) = 16e6 div 46 = 347826
    val pairs = Seq.fill(5)(("x", "x")) ++ Seq.fill(2)(("x", "y")) ++
      Seq.fill(1)(("y", "x")) ++ Seq.fill(2)(("y", "y"))
    assert(kappa(pairs)._3 === 347826L)
  }

  test("mutualTopMatches: reciprocal best only — a one-way best into a better-matched pair is dropped") {
    // best(1)=2 and best(2)=1 -> mutual; best(3)=4, best(4)=3 -> mutual;
    // the (2,3) edge is one-way on both ends and must vanish
    val pairs = Seq((1L, 2L, 0.9), (2L, 3L, 0.8), (3L, 4L, 0.95))
      .toDF("id_a", "id_b", "cos")
    val got = Similarity.mutualTopMatches(pairs)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .toSet
    assert(got === Set((1L, 2L, 0.9), (3L, 4L, 0.95)))
    // hub case: 1 is everyone's best, but 1's best is only 2 -> one pair
    val hub = Seq((1L, 2L, 0.9), (1L, 3L, 0.8), (1L, 4L, 0.7))
      .toDF("id_a", "id_b", "cos")
    assert(Similarity.mutualTopMatches(hub)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
      === Seq((1L, 2L)))
  }

  test("keySkewProfile: hot key surfaces with exact share and hot-ratio; topK cuts on (cnt desc, key asc)") {
    import graft.operators.Skew
    // 4 keys, counts 6/2/1/1 over 10 rows
    val rows = Seq.fill(6)(1L) ++ Seq.fill(2)(2L) ++ Seq(3L, 4L)
    val out = Skew.keySkewProfile(rows.toDF("k"), Seq("k"), topK = 2)
      .collect().map(r => (r.getAs[Long]("k"), r.getAs[Long]("cnt"),
        r.getAs[Long]("share_ppm"), r.getAs[Long]("hot_ratio_ppm")))
    // hot key 1: share 600000 ppm, hot ratio 6*4*1e6/10 = 2.4e6 (2.4x fair)
    assert(out.toSeq === Seq((1L, 6L, 600000L, 2400000L),
      (2L, 2L, 200000L, 800000L)))
    // tie at the topK boundary resolves by key asc: keys 3 and 4 tie
    // at cnt 1 -> topK=3 must include key 3, not key 4
    val out3 = Skew.keySkewProfile(rows.toDF("k"), Seq("k"), topK = 3)
      .collect().map(_.getAs[Long]("k"))
    assert(out3.toSeq === Seq(1L, 2L, 3L))
  }
}
