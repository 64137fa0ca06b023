package graft

import graft.operators.Sampling

import org.apache.spark.sql.functions._

class SamplingSpec extends SparkTestBase {
  import spark.implicits._

  test("hashSample: deterministic, partition-invariant, ~fraction") {
    val df = spark.range(10000).toDF("id")
    val a = Sampling.hashSample(df, "id", 0.25).as[Long].collect().toSet
    val b = Sampling.hashSample(df.repartition(13), "id", 0.25)
      .as[Long].collect().toSet
    assert(a == b, "sample depends on partitioning")
    assert(math.abs(a.size - 2500) < 250, s"got ${a.size} of expected ~2500")
    val otherSeed = Sampling.hashSample(df, "id", 0.25, seed = 7L)
      .as[Long].collect().toSet
    assert(a != otherSeed)
  }

  test("proportionalSample: exact quotas, min-1 floor, partition-invariant") {
    // groups of 700 / 280 / 20 rows, budget 50 => quotas 35 / 14 / 1
    val df = (Seq.tabulate(700)(i => ("big", i.toLong)) ++
      Seq.tabulate(280)(i => ("mid", 1000L + i)) ++
      Seq.tabulate(20)(i => ("tiny", 2000L + i))).toDF("g", "id")
    val got = Sampling.proportionalSample(df, "g", "id", budget = 50)
    val byG = got.groupBy($"g").count().as[(String, Long)].collect().toMap
    assert(byG == Map("big" -> 35L, "mid" -> 14L, "tiny" -> 1L), s"quotas: $byG")
    val a = got.as[(String, Long)].collect().toSet
    val b = Sampling.proportionalSample(df.repartition(17), "g", "id", 50)
      .as[(String, Long)].collect().toSet
    assert(a == b, "selection depends on partitioning")
  }

  test("splitAssign: total partition, ~fractions, deterministic, null fails closed") {
    val df = spark.range(10000).toDF("id")
    val got = Sampling.splitAssign(df, "id", 0.8, 0.1)
      .groupBy($"split").count().as[(String, Long)].collect().toMap
    assert(got.keySet == Set("train", "val", "test"), s"splits: $got")
    assert(got.values.sum == 10000, "assignment must be a total partition")
    assert(math.abs(got("train") - 8000) < 400 &&
      math.abs(got("val") - 1000) < 200, s"shares off: $got")
    // stable across partitionings (same content hash → same split)
    val a = Sampling.splitAssign(df, "id", 0.8, 0.1)
      .as[(Long, String)].collect().toSet
    val b = Sampling.splitAssign(df.repartition(13), "id", 0.8, 0.1)
      .as[(Long, String)].collect().toSet
    assert(a == b, "split depends on partitioning")
    // a null key must raise, not silently fall out of every split
    val withNull = Seq(Some(1L), None).toDF("id")
    val e = intercept[Exception] {
      Sampling.splitAssign(withNull, "id", 0.8, 0.1).collect()
    }
    assert(e.getMessage.contains("stable split identity") ||
      Option(e.getCause).exists(_.getMessage.contains("stable split identity")))
  }

  test("stratified: exact per-class caps, deterministic choice") {
    val docs = spark.read.parquet(sf("sf0.01") + "/documents.parquet")
    val got = Sampling.stratified(docs, "lang", "doc_id", 20)
    val counts = got.groupBy("lang").count().as[(String, Long)].collect().toMap
    assert(counts.values.forall(_ <= 20))
    assert(counts("en") == 20) // en has 218 docs => capped
    // picks the smallest doc_ids per class
    val enIds = got.filter($"lang" === "en").select("doc_id").as[Long].collect().sorted
    val expected = docs.filter($"lang" === "en").select("doc_id")
      .as[Long].collect().sorted.take(20)
    assert(enIds.sameElements(expected))
  }

  test("contiguous sequence packing: budget boundaries, per-shard, deterministic") {
    val docs = Seq(
      ("a", 1L, 300), ("a", 2L, 300), ("a", 3L, 300), ("a", 4L, 50),
      ("b", 1L, 600), ("b", 2L, 10)).toDF("shard", "id", "n")
    val packed = graft.operators.Packing.contiguous(docs, "shard", "id", "n", 512)
      .select($"shard", $"id", $"pack_id")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    // shard a prefixes: 0,300,600,900 => packs 0,0,1,1; shard b: 0,600 => 0,1
    assert(packed == Set(("a", 1L, 0L), ("a", 2L, 0L), ("a", 3L, 1L),
      ("a", 4L, 1L), ("b", 1L, 0L), ("b", 2L, 1L)))
    // stable under repartitioning (per-shard window, deterministic order)
    val again = graft.operators.Packing.contiguous(
      docs.repartition(7), "shard", "id", "n", 512)
      .select($"shard", $"id", $"pack_id")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(again == packed)
  }

  test("weightedMix: provenance column, independent per-source draws") {
    val a = spark.range(1000).toDF("id")
    val b = spark.range(1000).toDF("id")
    val mixed = Sampling.weightedMix(Seq(("a", a, 0.5), ("b", b, 0.1)), "id")
    val bySource = mixed.groupBy("__source").count().as[(String, Long)].collect().toMap
    assert(math.abs(bySource("a") - 500) < 120, bySource.toString)
    assert(math.abs(bySource("b") - 100) < 60, bySource.toString)
    // same key, different sources: decisions are independent (domain-
    // separated seeds), so the kept-id sets differ
    val aIds = mixed.filter($"__source" === "a").select("id").as[Long].collect().toSet
    val bIds = mixed.filter($"__source" === "b").select("id").as[Long].collect().toSet
    assert(!bIds.subsetOf(aIds) || bIds.size < 20)
  }

  test("mixByTokenBudget: sampled tokens land near the budget; ample budget keeps all") {
    val a = spark.range(1000).toDF("id").withColumn("tok", lit(10L)) // 10k total
    val b = spark.range(100).toDF("id").withColumn("tok", lit(10L))  // 1k total
    val mixed = Sampling.mixByTokenBudget(
      Seq(("a", a, 2000L), ("b", b, 50000L)), "id", "tok")
    val toks = mixed.groupBy("__source").agg(sum($"tok").as("t"))
      .as[(String, Long)].collect().toMap
    assert(math.abs(toks("a") - 2000L) < 600, toks.toString) // rate 0.2 +- noise
    assert(toks("b") == 1000L, "under-budget source must keep every row")
    // deterministic: the same mix again selects identical rows
    val again = Sampling.mixByTokenBudget(
      Seq(("a", a, 2000L), ("b", b, 50000L)), "id", "tok")
      .select("id", "__source").collect().map(_.toSeq).toSet
    assert(again == mixed.select("id", "__source").collect().map(_.toSeq).toSet)
    // zero budget drops everything from that source
    val none = Sampling.mixByTokenBudget(Seq(("a", a, 0L)), "id", "tok")
    assert(none.count() == 0)
  }

  test("temperatureMix: tau flattens shares toward uniform; deterministic; zero-total safe") {
    // source a: 10x the tokens of b
    val a = spark.range(0, 1000).select($"id", lit(100L).as("tok"))
    val b = spark.range(2000, 2100).select($"id", lit(100L).as("tok"))
    def sampledTokens(tau: Double, budget: Long): Map[String, Long] =
      Sampling.temperatureMix(Seq(("a", a), ("b", b)), "id", "tok",
        totalBudget = budget, tau = tau)
        .groupBy("__source").agg(sum($"tok").as("t"))
        .as[(String, Long)].collect().toMap
    // tau=1: proportional — a gets ~10x b's tokens
    val t1 = sampledTokens(1.0, 20000L)
    assert(t1("a").toDouble / t1("b") > 5.0, t1.toString)
    // tau=2 (sqrt): compression — a's advantage shrinks toward sqrt(10)
    val t2 = sampledTokens(2.0, 20000L)
    val ratio2 = t2("a").toDouble / t2("b")
    assert(ratio2 < t1("a").toDouble / t1("b") && ratio2 > 1.0, (t1, t2).toString)
    // expected budgets: share_a = sqrt(1e5)/(sqrt(1e5)+sqrt(1e4)) ~= 0.76
    assert(math.abs(t2("a") + t2("b") - 20000L) < 4000, t2.toString)
    // determinism
    assert(sampledTokens(2.0, 20000L) == t2)
    // a zero-total source contributes nothing and doesn't NaN the rest
    val empty = spark.range(0, 0).select($"id", lit(0L).as("tok"))
    val withEmpty = Sampling.temperatureMix(Seq(("a", a), ("z", empty)),
      "id", "tok", totalBudget = 20000L)
    assert(withEmpty.filter($"__source" === "z").count() == 0)
    assert(withEmpty.count() > 0)
  }

  test("shardAssign: deterministic, partition-invariant, contiguous positions, balanced") {
    val df = spark.range(0, 2000).toDF("id")
    val sharded = Sampling.shardAssign(df, "id", nShards = 8)
      .select($"id", $"__shard", $"__pos")
    val rows = sharded.as[(Long, Int, Long)].collect().sortBy(_._1)
    // same assignment regardless of input partitioning
    val again = Sampling.shardAssign(df.repartition(17), "id", nShards = 8)
      .select($"id", $"__shard", $"__pos")
      .as[(Long, Int, Long)].collect().sortBy(_._1)
    assert(rows.sameElements(again))
    // every shard's positions are exactly 0..n_i-1 (dense, no gaps)
    rows.groupBy(_._2).foreach { case (shard, grp) =>
      val ps = grp.map(_._3).sorted
      assert(ps.sameElements(0L until ps.length.toLong),
        s"shard $shard positions not dense: ${ps.take(5).mkString(",")}")
    }
    // md5 balance: no shard is pathologically loaded (2000/8 = 250 +- 5 sigma)
    val sizes = rows.groupBy(_._2).values.map(_.length)
    assert(sizes.size == 8 && sizes.forall(s => s > 170 && s < 330), sizes.toString)
    // null keys fail closed (undefined shard order otherwise) — pin the
    // ACTUAL guard, not just any exception
    val withNull = Seq(Some(1L), None, Some(3L)).toDF("id")
    val e = intercept[Exception](
      Sampling.shardAssign(withNull, "id", nShards = 4).collect())
    def chain(t: Throwable): Seq[Throwable] =
      if (t == null) Nil else t +: chain(t.getCause)
    assert(chain(e).exists(c => c.getMessage != null &&
      c.getMessage.contains("shardAssign: null")), s"wrong failure: $e")
  }

  test("contaminationReport agrees with decontaminate's complement") {
    val docs = spark.read.parquet(sf("sf0.01") + "/documents.parquet")
    val corpus = docs.filter($"doc_id" >= 20)
    val ref = docs.filter($"doc_id" < 20)
    val flagged = graft.operators.Dedup.contaminationReport(
      corpus, ref, "doc_id", "text", groupCol = "source")
      .agg(sum($"n_docs_flagged")).as[Long].collect().head
    val kept = graft.operators.Dedup.decontaminate(
      corpus, ref, "doc_id", "text").count()
    assert(flagged == corpus.count() - kept,
      s"report flags $flagged but decontaminate dropped ${corpus.count() - kept}")
  }

  test("balanceClasses: every label keeps exactly min-class-count rows, deterministic") {
    import graft.operators.Sampling
    val df = ((1L to 10L).map(i => (i, "big")) ++ (11L to 13L).map(i => (i, "small")))
      .toDF("k", "lab")
    val got = Sampling.balanceClasses(df, "k", "lab")
    val counts = got.groupBy("lab").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts == Map("big" -> 3L, "small" -> 3L))
    val again = Sampling.balanceClasses(df, "k", "lab")
      .select("k").collect().map(_.getLong(0)).toSet
    assert(again == got.select("k").collect().map(_.getLong(0)).toSet)
  }

  test("reservoirByHash: exactly k, deterministic across partitionings") {
    import graft.operators.Sampling
    val df = (1L to 100L).map(i => (i, s"d$i")).toDF("k", "v")
    def draw(parts: Int) = Sampling.reservoirByHash(
      df.repartition(parts), "k", "seed1", 10)
      .select("k").collect().map(_.getLong(0)).toSet
    val one = draw(1)
    assert(one.size == 10)
    assert(one == draw(7) && one == draw(13))
    // a different salt draws a different set (content-keyed, not positional)
    assert(one != Sampling.reservoirByHash(df, "k", "seed2", 10)
      .select("k").collect().map(_.getLong(0)).toSet)
  }

  test("reservoirByHash plans a bounded top-k, not a global sort") {
    import graft.operators.Sampling
    val df = (1L to 50L).map(i => (i, i % 3)).toDF("k", "v")
    val plan = Sampling.reservoirByHash(df, "k", "s", 5)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan)
  }

  test("systematicWeighted: stride coverage, heavy-row multiplicity, determinism, zero-weight exclusion") {
    import graft.operators.Sampling
    // 200 rows of weight 10 (total 2000), k=20 -> stride 100: exactly
    // one pick per 100-cents block, so EXACTLY 20 distinct rows picked
    val even = (1L to 200L).map(i => (i, 10L)).toDF("id", "w")
    val picked = Sampling.systematicWeighted(even, "id", "w", k = 20)
    assert(picked.count() == 20)
    assert(picked.agg(sum($"picks")).as[Long].head() == 20L)
    // deterministic and partition-invariant (content-hash order)
    val again = Sampling.systematicWeighted(even.repartition(7), "id", "w",
      k = 20).select("id").as[Long].collect().toSet
    assert(again == picked.select("id").as[Long].collect().toSet)
    // a row heavier than the stride is picked with multiplicity: one
    // whale of weight 1000 among 100 minnows of 10 (total 2000, k=20,
    // stride 100) must carry ~10 picks — weight-proportional without
    // replacement
    val whale = ((1L to 100L).map(i => (i, 10L)) :+ (999L, 1000L))
      .toDF("id", "w")
    val wp = Sampling.systematicWeighted(whale, "id", "w", k = 20)
      .collect().map(r => r.getLong(0) -> r.getAs[Long]("picks")).toMap
    assert(wp(999L) >= 9L && wp(999L) <= 11L,
      s"whale picks ${wp.get(999L)} not ~10")
    assert(wp.values.sum == 20L)
    // zero/negative weights carry no mass and never appear
    val withZero = Seq((1L, 0L), (2L, -5L), (3L, 10L)).toDF("id", "w")
    val z = Sampling.systematicWeighted(withZero, "id", "w", k = 2)
      .select("id").as[Long].collect().toSet
    assert(z == Set(3L))
  }

  test("nestedSamples: levels are strict subsets (same hash, rising thresholds); stats are exact") {
    val df = spark.range(2000).toDF("id").withColumn("cents", $"id" * 3)
    val out = Sampling.nestedSamples(df, "id", "cents",
        fractions = Seq(0.1, 0.3, 0.6))
      .orderBy("fraction_ppm").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.map(_._1).toSeq === Seq(100000L, 300000L, 600000L))
    // counts strictly ascend and sit near the nominal rates
    val ns = out.map(_._2)
    assert(ns(0) < ns(1) && ns(1) < ns(2))
    assert(ns(0) > 120 && ns(0) < 280 && ns(2) > 1050 && ns(2) < 1350,
      s"counts far off nominal: ${ns.toSeq}")
    assert(out.forall { case (_, n, s, m) => m === s * 1000000L / n })
    // SUBSET property, row-exact: the 10% membership is contained in
    // the 30% membership (same sampleHex, larger threshold)
    def ids(f: Double) = Sampling.hashSample(df, "id", f, domain = "curve")
      .select("id").collect().map(_.getLong(0)).toSet
    val (s10, s30) = (ids(0.1), ids(0.3))
    assert(s10.subsetOf(s30) && s10.size < s30.size)
  }
}
