package graft

import graft.operators.Linkage
import org.apache.spark.sql.functions._

/** Hand-computed fixtures for the Fellegi–Sunter scorer: weight sums
  * per agreement pattern, blocking isolation, NULL-as-disagreement. */
class LinkageSpec extends SparkTestBase {
  import spark.implicits._

  private val rules = Seq(
    Linkage.eq("seg", 280000L, 120000L),
    Linkage.FieldRule("bal", (a, b) => abs(a - b) <= lit(10L),
      350000L, 150000L),
    Linkage.eq("sfx", 370000L, 160000L))

  test("scorePairs: pattern weight sums, threshold cut, cross-block isolation") {
    val df = Seq(
      (1L, 0, "X", 100L, "01"),  // 1-2: AAA = 1000000
      (2L, 0, "X", 105L, "01"),
      (3L, 0, "Y", 9000L, "01"), // 1-3 / 2-3: DDA = 100000
      (4L, 1, "X", 100L, "01"))  // other block: never pairs with 1-3
      .toDF("id", "blk", "seg", "bal", "sfx")
    val all = Linkage.scorePairs(df, "id", Seq("blk"), rules,
      thresholdPpm = Long.MinValue + 1)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getString(2), r.getLong(3))).toMap
    assert(all === Map(
      (1L, 2L) -> (("AAA", 1000000L)),
      (1L, 3L) -> (("DDA", 100000L)),
      (2L, 3L) -> (("DDA", 100000L))))
    // the decision threshold keeps only the link
    val links = Linkage.scorePairs(df, "id", Seq("blk"), rules, 550000L)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(links === Set((1L, 2L)))
  }

  test("emEstimate: recovers planted match/unmatch structure") {
    // planted world: matches agree on all 3 fields ~always, unmatches
    // rarely — EM from the generic init must pull m_i high, u_i low,
    // and put the all-agree pattern's posterior above the threshold
    val counts = Seq(
      ("AAA", 150L), ("AAD", 20L),          // mostly the match class
      ("ADD", 300L), ("DAD", 2000L),
      ("DDA", 150L), ("DDD", 8000L))        // the unmatch bulk
    val (p, m, u) = Linkage.emEstimate(counts, k = 3, iters = 20)
    assert(p > 5000L && p < 200000L, s"match share ppm out of range: $p")
    (0 until 3).foreach { i =>
      assert(m(i) > u(i), s"field $i: m=${m(i)} !> u=${u(i)}")
    }
    val postAAA = Linkage.posteriorPpm(Array(1, 1, 1), p, m, u)
    val postDDD = Linkage.posteriorPpm(Array(0, 0, 0), p, m, u)
    assert(postAAA >= 500000L, s"all-agree posterior too low: $postAAA")
    assert(postDDD < 100000L, s"all-disagree posterior too high: $postDDD")
  }

  test("emPatternWeights: pattern frame posteriors and decisions") {
    // two clean blocks: dup pair (1,2) agrees everywhere; filler pairs
    // disagree everywhere — with many blocks EM separates the classes
    val rows = (0 until 40).flatMap { b =>
      Seq((b * 10L + 1, b, "X", 100L + b * 1000L, "01"),
          (b * 10L + 2, b, "X", 100L + b * 1000L, "01"),
          (b * 10L + 3, b, "Y", 500L + b * 1000L, "02"))
    }
    val df = rows.toDF("id", "blk", "seg", "bal", "sfx")
    val out = Linkage.emPatternWeights(df, "id", Seq("blk"), Seq(
      ("seg", (a: org.apache.spark.sql.Column,
               b: org.apache.spark.sql.Column) => a === b),
      ("bal", (a: org.apache.spark.sql.Column,
               b: org.apache.spark.sql.Column) => abs(a - b) <= lit(10L)),
      ("sfx", (a: org.apache.spark.sql.Column,
               b: org.apache.spark.sql.Column) => a === b)))
      .collect().map(r =>
        r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getBoolean(3))))
      .toMap
    assert(out.keySet === Set("AAA", "DDD"))
    assert(out("AAA")._1 == 40L && out("DDD")._1 == 80L)
    assert(out("AAA")._3 && !out("DDD")._3,
      s"decisions did not separate the planted classes: $out")
  }

  test("emPatternWeights: >20 comparators is a loud contract error") {
    // the pattern-frame collect is bounded by 2^k — that bound is a
    // contract (the maxDriverPairs discipline), so k > 20 must fail
    // loudly instead of collecting up to 2^k rows to the driver
    val df = Seq((1L, 0, "X")).toDF("id", "blk", "seg")
    val comps = (0 until 21).map(_ => ("seg",
      (a: org.apache.spark.sql.Column,
       b: org.apache.spark.sql.Column) => a === b))
    val ex = intercept[IllegalArgumentException] {
      Linkage.emPatternWeights(df, "id", Seq("blk"), comps)
    }
    assert(ex.getMessage.contains("2^21"), ex.getMessage)
  }

  test("editBand: links a planted typo'd duplicate that exact equality misses") {
    // (1, 2) is the same entity with one character typo'd in the name
    val df = Seq(
      (1L, 0, "smith", "X"),
      (2L, 0, "smyth", "X"),   // edit distance 1 from smith
      (3L, 0, "jones", "X"))   // distance 4/5 from both
      .toDF("id", "blk", "name", "seg")
    val fuzzy = Seq(
      Linkage.editBand("name", maxDist = 1, 500000L, 300000L),
      Linkage.eq("seg", 280000L, 120000L))
    val exact = Seq(
      Linkage.eq("name", 500000L, 300000L),
      Linkage.eq("seg", 280000L, 120000L))
    def links(rules: Seq[Linkage.FieldRule]) =
      Linkage.scorePairs(df, "id", Seq("blk"), rules, 700000L)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(links(fuzzy) === Set((1L, 2L)))
    assert(links(exact) === Set.empty, "exact equality must miss the typo")
  }

  test("linkIncremental: equals the full batch re-run, including an entity bridge") {
    // existing corpus: entities {1,2} and {3,4} share a block but DON'T
    // link to each other (balance band too far), singleton 5,
    // untouched entity {6,7}; batch: 10 sits between the two balance
    // bands and BRIDGES the entities, 11 pulls singleton 5 into an
    // entity, 12-13 form a batch-only pair, 14 links nothing
    val existing = Seq(
      (1L, 0, "alpha", 0L), (2L, 0, "alpha", 10L),
      (3L, 0, "alpha", 100L), (4L, 0, "alpha", 110L),
      (5L, 1, "gamma", 0L),
      (6L, 2, "delta", 0L), (7L, 2, "delta", 0L))
      .toDF("id", "blk", "name", "bal")
    val batch = Seq(
      (10L, 0, "alpha", 55L),  // |55-10| and |55-100| both within 50
      (11L, 1, "gamma", 0L),
      (12L, 3, "kappa", 0L), (13L, 3, "kappa", 0L),
      (14L, 4, "sigma", 0L))
      .toDF("id", "blk", "name", "bal")
    val irules = Seq(
      Linkage.eq("name", 500000L, 300000L),
      Linkage.FieldRule("bal", (a, b) => abs(a - b) <= lit(50L),
        280000L, 120000L))
    val thr = 700000L
    val fe = Linkage.resolveEntities(
      Linkage.scorePairs(existing.unionByName(batch), "id", Seq("blk"),
        irules, thr).select(col("id_a"), col("id_b")))
      .collect().map(r => r.getLong(1) -> r.getLong(0)).toMap
    val ents = Linkage.resolveEntities(
      Linkage.scorePairs(existing, "id", Seq("blk"), irules, thr)
        .select(col("id_a"), col("id_b")))
    // fixture pre-check: the existing-only run keeps {1,2} and {3,4}
    // separate — the merge can only come from the batch record
    assert(ents.collect().map(r => r.getLong(1) -> r.getLong(0)).toMap ===
      Map(1L -> 1L, 2L -> 1L, 3L -> 3L, 4L -> 3L, 6L -> 6L, 7L -> 6L))
    val inc = Linkage.linkIncremental(existing, ents, batch, "id",
        Seq("blk"), irules, thr)
      .collect().map(r => r.getLong(1) -> r.getLong(0)).toMap
    assert(inc === fe, s"parity broke: $inc vs $fe")
    assert(fe === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 10L -> 1L,
      5L -> 5L, 11L -> 5L, 6L -> 6L, 7L -> 6L, 12L -> 12L, 13L -> 12L))
  }

  test("linkIncremental: first-batch bootstrap (empty existing corpus) equals the batch run") {
    val empty = Seq.empty[(Long, Int, String, Long)]
      .toDF("id", "blk", "name", "bal")
    val batch = Seq(
      (1L, 0, "alpha", 0L), (2L, 0, "alpha", 10L),
      (3L, 1, "beta", 0L))
      .toDF("id", "blk", "name", "bal")
    val brules = Seq(
      Linkage.eq("name", 500000L, 300000L),
      Linkage.FieldRule("bal", (a, b) => abs(a - b) <= lit(50L),
        280000L, 120000L))
    val emptyEnts = Linkage.resolveEntities(
      Linkage.scorePairs(empty, "id", Seq("blk"), brules, 700000L)
        .select(col("id_a"), col("id_b")))
    val got = Linkage.linkIncremental(empty, emptyEnts, batch, "id",
        Seq("blk"), brules, 700000L)
      .collect().map(r => r.getLong(1) -> r.getLong(0)).toMap
    assert(got === Map(1L -> 1L, 2L -> 1L))
  }

  test("blockingQuality: reduction over block-count sums, completeness vs planted truth") {
    // blocks: {0: [1,2,3], 1: [4]} -> candidates = 3 of allPairs 6 ->
    // reduction 500000; truth (1,2) captured, (1,4) crosses blocks ->
    // completeness 500000
    val df = Seq((1L, 0), (2L, 0), (3L, 0), (4L, 1)).toDF("id", "blk")
    val truth = Seq((1L, 2L), (1L, 4L)).toDF("id_a", "id_b")
    val r = Linkage.blockingQuality(df, "id", Seq("blk"), truth).head()
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
      r.getLong(4), r.getLong(5)) ===
      ((4L, 3L, 2L, 1L, 500000L, 500000L)))
  }

  test("blockingQuality: reversed and duplicated truth rows canonicalize to one pair") {
    val df = Seq((1L, 0), (2L, 0), (3L, 0), (4L, 1)).toDF("id", "blk")
    // the same two true pairs as above, but each stated twice and one
    // of them reversed — canonical (least, greatest) + distinct must
    // count them once each
    val truth = Seq((1L, 2L), (2L, 1L), (1L, 4L), (1L, 4L))
      .toDF("id_a", "id_b")
    val r = Linkage.blockingQuality(df, "id", Seq("blk"), truth).head()
    assert((r.getLong(2), r.getLong(3), r.getLong(5)) ===
      ((2L, 1L, 500000L)))
  }

  test("linkIncremental: a batch id colliding with an existing id is a loud contract error") {
    val existing = Seq((1L, 0, "alpha", 0L), (2L, 0, "alpha", 10L))
      .toDF("id", "blk", "name", "bal")
    val irules = Seq(Linkage.eq("name", 500000L, 300000L))
    val ents = Linkage.resolveEntities(
      Linkage.scorePairs(existing, "id", Seq("blk"), irules, 400000L)
        .select(col("id_a"), col("id_b")))
    val clash = Seq((2L, 0, "alpha", 5L)).toDF("id", "blk", "name", "bal")
    val e = intercept[IllegalArgumentException] {
      Linkage.linkIncremental(existing, ents, clash, "id", Seq("blk"),
        irules, 400000L)
    }
    assert(e.getMessage.contains("disjoint"))
  }

  test("scorePairsMultiBlock: single pass equals scorePairs; a second pass recovers a block-broken pair and dedups overlaps") {
    // blk1 splits {1,2,3} from {4}; blk2 re-unites 3 and 4 (the pair
    // blk1 loses) and ALSO re-finds (1,2) — which must score once
    val df = Seq(
      (1L, 0, 9, "X", 100L), (2L, 0, 9, "X", 105L),
      (3L, 0, 7, "Y", 9000L), (4L, 1, 7, "Y", 9010L))
      .toDF("id", "blk1", "blk2", "seg", "bal")
    val rulesMb = Seq(
      Linkage.eq("seg", 500000L, 300000L),
      Linkage.FieldRule("bal", (a, b) => abs(a - b) <= lit(50L),
        280000L, 120000L))
    val single = Linkage.scorePairs(df, "id", Seq("blk1"), rulesMb,
      Long.MinValue + 1).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> (r.getString(2), r.getLong(3)))
      .toMap
    val singleViaMulti = Linkage.scorePairsMultiBlock(df, "id",
      Seq(Seq("blk1")), rulesMb, Long.MinValue + 1).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> (r.getString(2), r.getLong(3)))
      .toMap
    assert(singleViaMulti === single)
    assert(!single.contains((3L, 4L)), "fixture: pass 1 must lose (3,4)")
    val multi = Linkage.scorePairsMultiBlock(df, "id",
      Seq(Seq("blk1"), Seq("blk2")), rulesMb, Long.MinValue + 1).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> (r.getString(2), r.getLong(3)))
      .toMap
    // (3,4) recovered by pass 2 with full agreement; (1,2) found by
    // BOTH passes appears once (a Map would hide a dup — check counts)
    assert(multi((3L, 4L)) === (("AA", 780000L)))
    assert(multi((1L, 2L)) === (("AA", 780000L)))
    val rows = Linkage.scorePairsMultiBlock(df, "id",
      Seq(Seq("blk1"), Seq("blk2")), rulesMb, Long.MinValue + 1)
      .groupBy("id_a", "id_b").count().collect()
    assert(rows.forall(_.getLong(2) == 1L), "cross-pass dedup must hold")
  }

  test("blockingQualityMulti: the second pass lifts completeness on the planted block-breaking pair") {
    val df = Seq(
      (1L, 0, 9), (2L, 0, 9), (3L, 0, 7), (4L, 1, 7)).toDF("id", "blk1", "blk2")
    val truth = Seq((1L, 2L), (3L, 4L)).toDF("id_a", "id_b")
    val one = Linkage.blockingQualityMulti(df, "id", Seq(Seq("blk1")), truth)
      .head()
    // single pass: candidates {12,13,23}, captures only (1,2)
    assert((one.getLong(1), one.getLong(3), one.getLong(5)) ===
      ((3L, 1L, 500000L)))
    // single-pass parity with blockingQuality
    val bq = Linkage.blockingQuality(df, "id", Seq("blk1"), truth).head()
    assert(one.toSeq === bq.toSeq)
    val two = Linkage.blockingQualityMulti(df, "id",
      Seq(Seq("blk1"), Seq("blk2")), truth).head()
    // pass 2 adds pairs {12, 34}: candidates dedup to 4, both truths
    // captured -> completeness 1e6 (up from 5e5)
    assert((two.getLong(1), two.getLong(3), two.getLong(5)) ===
      ((4L, 2L, 1000000L)))
  }

  test("scorePairsSortedNeighborhood: exactly the w-1 rank successors pair, including across bucket boundaries") {
    // keys a..f give ids 1..6 ranks 1..6; window 3 => each record
    // pairs with its next two. Buckets (rank div 3) split at 2|3 and
    // 5|6 — the cross-bucket pairs come from the second join leg.
    val df = Seq(
      (1L, "a", "X"), (2L, "b", "X"), (3L, "c", "X"),
      (4L, "d", "X"), (5L, "e", "Y"), (6L, "f", "Y"))
      .toDF("id", "k", "seg")
    val got = Linkage.scorePairsSortedNeighborhood(df, "id", Seq("k"),
        window = 3, Seq(Linkage.eq("seg", 500000L, 300000L)),
        Long.MinValue + 1)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(3)).toMap
    assert(got.keySet === Set((1L, 2L), (1L, 3L), (2L, 3L), (2L, 4L),
      (3L, 4L), (3L, 5L), (4L, 5L), (4L, 6L), (5L, 6L)))
    assert(got((1L, 2L)) === 500000L)   // X-X agrees
    assert(got((4L, 5L)) === -300000L)  // X-Y disagrees
  }

  test("blockingQualitySortedNeighborhood: closed-form candidates, rank-distance capture, small-n branch") {
    // keys a..d rank ids 1..4; window 3 => candidates = 4*2 - 3 = 5;
    // truth (1,2) at rank distance 1 captured, (1,4) at 3 lost
    val df = Seq((1L, "a"), (2L, "b"), (3L, "c"), (4L, "d")).toDF("id", "k")
    val truth = Seq((1L, 2L), (4L, 1L)).toDF("id_a", "id_b")
    val r = Linkage.blockingQualitySortedNeighborhood(df, "id", Seq("k"),
      window = 3, truth).head()
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
      r.getLong(5)) === ((4L, 5L, 2L, 1L, 500000L)))
    // n < window: the quadratic branch (all pairs are candidates)
    val tiny = Seq((1L, "a"), (2L, "b")).toDF("id", "k")
    val t2 = Linkage.blockingQualitySortedNeighborhood(tiny, "id", Seq("k"),
      window = 5, Seq((1L, 2L)).toDF("id_a", "id_b")).head()
    assert((t2.getLong(1), t2.getLong(5)) === ((1L, 1000000L)))
  }

  test("linkIncremental: parquet-persisted block index + entities round-trip equals the in-memory run") {
    val existing = Seq(
      (1L, 0, "alpha", 0L), (2L, 0, "alpha", 10L),
      (3L, 0, "alpha", 100L), (4L, 0, "alpha", 110L),
      (5L, 1, "gamma", 0L),
      (6L, 2, "delta", 0L), (7L, 2, "delta", 0L))
      .toDF("id", "blk", "name", "bal")
    val batch = Seq(
      (10L, 0, "alpha", 55L), (11L, 1, "gamma", 0L),
      (12L, 3, "kappa", 0L), (13L, 3, "kappa", 0L))
      .toDF("id", "blk", "name", "bal")
    val irules = Seq(
      Linkage.eq("name", 500000L, 300000L),
      Linkage.FieldRule("bal", (a, b) => abs(a - b) <= lit(50L),
        280000L, 120000L))
    val ents = Linkage.resolveEntities(
      Linkage.scorePairs(existing, "id", Seq("blk"), irules, 700000L)
        .select(col("id_a"), col("id_b")))
    val mem = Linkage.linkIncremental(existing, ents, batch, "id",
        Seq("blk"), irules, 700000L)
      .collect().map(r => r.getLong(1) -> r.getLong(0)).toMap
    // persist the block index (scaladoc contract: id + block cols +
    // rule fields, partitioned by block) and the entity assignment,
    // reload from disk, link the same batch — bit-for-bit equal
    val dir = java.nio.file.Files.createTempDirectory("graft_linkidx")
      .toString
    existing.write.partitionBy("blk").parquet(s"$dir/index")
    ents.write.parquet(s"$dir/entities")
    val gotDisk = Linkage.linkIncremental(
        spark.read.parquet(s"$dir/index"),
        spark.read.parquet(s"$dir/entities"),
        batch, "id", Seq("blk"), irules, 700000L)
      .collect().map(r => r.getLong(1) -> r.getLong(0)).toMap
    assert(gotDisk === mem)
  }

  test("starClusters: a chain stays cut (vs resolveEntities' closure); a triangle and a hub merge fully") {
    // chain 1-2-3: closure puts all three in entity 1; star labels
    // 1->1, 2->1, 3->2 — the endpoints never meet
    val chain = Seq((1L, 2L), (2L, 3L)).toDF("id_a", "id_b")
    val star = Linkage.starClusters(chain)
      .collect().map(r => r.getLong(1) -> r.getLong(0)).toMap
    assert(star === Map(1L -> 1L, 2L -> 1L, 3L -> 2L))
    val cc = Linkage.resolveEntities(chain)
      .collect().map(r => r.getLong(1) -> r.getLong(0)).toMap
    assert(cc === Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
    // a triangle (and any shared-hub star) collapses to one label
    val tri = Seq((1L, 2L), (2L, 3L), (1L, 3L)).toDF("id_a", "id_b")
    assert(Linkage.starClusters(tri).collect()
      .map(_.getLong(0)).toSet === Set(1L))
    val hub = Seq((5L, 7L), (5L, 9L), (5L, 6L)).toDF("id_a", "id_b")
    assert(Linkage.starClusters(hub).collect()
      .map(_.getLong(0)).toSet === Set(5L))
  }

  test("goldenRecords: recency rule — latest non-null by ts, ties to larger value, all-null entity reports NULL") {
    val members = Seq(
      (1L, Some(10L), 100L), (1L, Some(30L), 200L), (1L, None, 300L),
      (2L, Some(7L), 50L), (2L, Some(9L), 50L),  // ts tie at 50: larger value 9
      (3L, Option.empty[Long], 10L))             // all-null value column
      .toDF("entity_id", "v", "ts")
    val got = Linkage.goldenRecords(members, "entity_id",
        modalCols = Nil, maxCols = Nil, recencyCols = Seq(("v", "ts")))
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(2)) None else Some(r.getLong(2)))).toMap
    // entity 1: latest ts with non-null v is 200 -> v=30; the NULL v at
    // ts 300 must not win; entity 2: both at ts 50 -> larger v = 9
    assert(got === Map(1L -> Some(30L), 2L -> Some(9L), 3L -> None))
  }

  test("triage: three-way decision counts per pattern") {
    val df = Seq(
      (1L, 0, "X", 100L, "01"),  // 1-2: AAA = 1000000 -> link
      (2L, 0, "X", 105L, "01"),
      (3L, 0, "X", 9000L, "01"), // 1-3/2-3: ADA = 500000 -> possible
      (4L, 0, "Y", 9000L, "02")) // vs 1/2: DDD; vs 3: DDA? compute below
      .toDF("id", "blk", "seg", "bal", "sfx")
    // pair (3,4): seg X/Y = D, bal equal = A, sfx 01/02 = D -> DAD?
    // rule order is (seg, bal, sfx): pattern DAD = -120+350-160 = 70000
    val got = Linkage.triage(df, "id", Seq("blk"), rules,
        lowerPpm = 300000L, upperPpm = 550000L)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3))).toMap
    assert(got(("AAA", "link")) == ((1L, 1000000L)))
    assert(got(("ADA", "possible")) == ((2L, 500000L)))
    assert(got(("DAD", "nonlink")) == ((1L, 70000L)))
    assert(got(("DDD", "nonlink"))._1 == 2L) // (1,4) and (2,4)
  }

  test("resolveEntities + goldenRecords: clusters, modal tie-break, max rule") {
    val links = Seq((1L, 2L), (2L, 3L), (7L, 9L)).toDF("id_a", "id_b")
    val ents = Linkage.resolveEntities(links)
      .collect().map(r => r.getLong(1) -> r.getLong(0)).toMap
    assert(ents === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 7L -> 7L, 9L -> 7L))
    // survivorship: entity 1 has segs X,X,Y -> modal X; entity 7 has
    // Y,Z split 1-1 -> tie breaks to the smaller value Y; max bal wins
    val members = Seq(
      (1L, "X", 10L), (1L, "Y", 30L), (1L, "X", 20L),
      (7L, "Z", 5L), (7L, "Y", 4L)).toDF("entity_id", "seg", "bal")
    val g = Linkage.goldenRecords(members, "entity_id",
        modalCols = Seq("seg"), maxCols = Seq("bal"))
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getString(3))).toMap
    assert(g === Map(1L -> ((3L, 30L, "X")), 7L -> ((2L, 5L, "Y"))))
  }

  test("scorePairs: NULL field compares as disagreement, not NULL score") {
    val df = Seq(
      (1L, 0, Some("X"), 100L, "01"),
      (2L, 0, None: Option[String], 100L, "01")) // seg NULL -> D
      .toDF("id", "blk", "seg", "bal", "sfx")
    val got = Linkage.scorePairs(df, "id", Seq("blk"), rules,
      thresholdPpm = Long.MinValue + 1).collect()
    assert(got.length == 1 && got(0).getString(2) == "DAA" &&
      got(0).getLong(3) == -120000L + 350000L + 370000L)
  }

  // hybrid fixture: sorted by k the ids rank 1,3,4,2 (aaa,mmm,mmn,zzz);
  // (1,2) share a block but sit 3 ranks apart (equality-only capture);
  // (1,3) are rank-adjacent but block-split (SN-only capture); (3,4)
  // share a block AND are rank-adjacent (found by BOTH schemes — the
  // cross-scheme dedup case)
  private val hybridDf = Seq(
    (1L, "B", "aaa", "X"), (2L, "B", "zzz", "X"),
    (3L, "C", "mmm", "X"), (4L, "C", "mmn", "X"))
    .toDF("id", "blk", "k", "seg")
  private val hybridRules = Seq(Linkage.eq("seg", 500000L, 300000L))

  test("scorePairsHybrid: equality ∪ sorted-neighborhood candidates, canonicalized and deduped, links both scheme-exclusive pair classes") {
    val eqOnly = Linkage.scorePairsMultiBlock(hybridDf, "id",
      Seq(Seq("blk")), hybridRules, Long.MinValue + 1).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val snOnly = Linkage.scorePairsSortedNeighborhood(hybridDf, "id",
      Seq("k"), window = 2, hybridRules, Long.MinValue + 1).collect()
      .map(r => (math.min(r.getLong(0), r.getLong(1)),
        math.max(r.getLong(0), r.getLong(1)))).toSet
    // the fixture's premise: each scheme misses a pair the other finds
    assert(eqOnly === Set((1L, 2L), (3L, 4L)), "equality misses (1,3)")
    assert(snOnly === Set((1L, 3L), (3L, 4L), (2L, 4L)),
      "SN misses (1,2) — rank distance 3 > window-1")
    val hybrid = Linkage.scorePairsHybrid(hybridDf, "id", Seq(Seq("blk")),
      Seq("k"), window = 2, hybridRules, Long.MinValue + 1)
    val got = hybrid.collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(3)).toMap
    assert(got.keySet === (eqOnly ++ snOnly),
      "hybrid = the canonicalized union")
    assert(got((1L, 2L)) === 500000L && got((1L, 3L)) === 500000L)
    // (3,4) found by both schemes must score exactly once
    val counts = hybrid.groupBy("id_a", "id_b").count().collect()
    assert(counts.forall(_.getLong(2) == 1L), "cross-scheme dedup must hold")
  }

  test("sortedNeighborhoodPairsIncremental: containment always, exact parity on append, pinned divergence on a window squeeze") {
    def canon(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (math.min(r.getLong(0), r.getLong(1)),
        math.max(r.getLong(0), r.getLong(1)))).toSet
    def allPairs(df: org.apache.spark.sql.DataFrame, w: Int) =
      canon(Linkage.scorePairsSortedNeighborhood(df, "id", Seq("k"), w,
        Seq(Linkage.eq("seg", 500000L, 300000L)), Long.MinValue + 1)
        .select("id_a", "id_b"))
    // APPEND case: the batch sorts entirely after the existing corpus,
    // so no window is squeezed — prior ∪ incremental == full re-run
    val existing = Seq((1L, "a", "X"), (2L, "b", "X"), (3L, "c", "X"))
      .toDF("id", "k", "seg")
    val batch = Seq((10L, "x", "X"), (11L, "y", "X")).toDF("id", "k", "seg")
    val prior = allPairs(existing, 3)
    val inc = canon(Linkage.sortedNeighborhoodPairsIncremental(
      existing, batch, "id", Seq("k"), window = 3))
    assert(inc === Set((2L, 10L), (3L, 10L), (3L, 11L), (10L, 11L)),
      "every incremental pair touches a batch id")
    assert(prior ++ inc === allPairs(existing.unionByName(batch), 3),
      "append parity: no squeeze, so the union equals the full re-run")
    // SQUEEZE case: a batch row lands BETWEEN two existing neighbors at
    // the window edge — the full re-run loses their pair, the monotone
    // incremental corpus keeps it; the divergence is EXACTLY that pair
    val ex2 = Seq((1L, "a", "X"), (2L, "c", "X")).toDF("id", "k", "seg")
    val b2 = Seq((10L, "b", "X")).toDF("id", "k", "seg")
    val prior2 = allPairs(ex2, 2)
    assert(prior2 === Set((1L, 2L)))
    val inc2 = canon(Linkage.sortedNeighborhoodPairsIncremental(
      ex2, b2, "id", Seq("k"), window = 2))
    val full2 = allPairs(ex2.unionByName(b2), 2)
    assert(inc2 === Set((1L, 10L), (2L, 10L)))
    assert(full2 === inc2, "the full re-run dropped the squeezed pair")
    assert((prior2 ++ inc2) -- full2 === Set((1L, 2L)),
      "containment holds; the divergence is exactly the squeezed pair")
    // id collision across the frames is a loud contract error
    val e = intercept[IllegalArgumentException](
      Linkage.sortedNeighborhoodPairsIncremental(ex2,
        Seq((1L, "z", "X")).toDF("id", "k", "seg"), "id", Seq("k"), 2))
    assert(e.getMessage.contains("disjoint"))
    // a DUPLICATED batch id is equally loud: it would enter the rank
    // order twice and silently multiply its candidate pairs
    val dup = intercept[IllegalArgumentException](
      Linkage.sortedNeighborhoodPairsIncremental(ex2,
        Seq((10L, "b", "X"), (10L, "d", "X")).toDF("id", "k", "seg"),
        "id", Seq("k"), 2))
    assert(dup.getMessage.contains("unique"))
    // the scoring tail carries the FieldRule pattern/score semantics
    val scored = Linkage.linkIncrementalSortedNeighborhood(ex2, b2, "id",
      Seq("k"), window = 2, Seq(Linkage.eq("seg", 500000L, 300000L)),
      thresholdPpm = Long.MinValue + 1).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> (r.getString(2), r.getLong(3)))
      .toMap
    assert(scored.keys.map(p => (math.min(p._1, p._2),
      math.max(p._1, p._2))).toSet === inc2)
    assert(scored.values.toSet === Set(("A", 500000L)))
  }

  test("hybridPairsIncremental: equality side exact, SN side containment, cross-front dedup, every pair touches the batch") {
    def canon(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (math.min(r.getLong(0), r.getLong(1)),
        math.max(r.getLong(0), r.getLong(1)))).toSet
    def fullHybrid(df: org.apache.spark.sql.DataFrame, w: Int) =
      canon(Linkage.scorePairsHybrid(df, "id", Seq(Seq("blk")), Seq("k"),
        w, hybridRules, Long.MinValue + 1).select("id_a", "id_b"))
    // split the hybrid fixture: {1,3} existing, {2,4} batch — the
    // batch carries one equality-only pair (1,2 share blk B, far
    // apart in k) and one SN-only pair (3,4 adjacent in k, blocks
    // C vs C — also equality; so plant a blk-breaking row instead)
    val existing = Seq((1L, "B", "aaa", "X"), (3L, "C", "mmm", "X"))
      .toDF("id", "blk", "k", "seg")
    val batch = Seq((2L, "B", "zzz", "X"), (4L, "D", "mmn", "X"))
      .toDF("id", "blk", "k", "seg")
    val inc = canon(Linkage.hybridPairsIncremental(existing, batch, "id",
      Seq(Seq("blk")), Seq("k"), window = 2))
    // (1,2): equality-front only (ranks by k: aaa=1, mmm=2, mmn=3,
    // zzz=4 — distance 3 > w-1). (3,4): SN-front only (blk C vs D,
    // adjacent ranks). (2,4): neither (no shared blk, rank distance 1?
    // mmn=3, zzz=4 adjacent -> SN catches the batch-batch pair too)
    assert(inc === Set((1L, 2L), (3L, 4L), (2L, 4L)))
    assert(inc.forall { case (a, b) => Set(2L, 4L).contains(a) ||
      Set(2L, 4L).contains(b) }, "every incremental pair touches the batch")
    // containment: full hybrid pairs ⊆ prior hybrid pairs ∪ inc
    val prior = fullHybrid(existing, 2)
    val full = fullHybrid(existing.unionByName(batch), 2)
    assert(full.subsetOf(prior ++ inc),
      "containment: the full re-run must never exceed prior ∪ incremental")
    // this fixture has no squeeze (no existing pair sits at the window
    // edge), so parity is exact — the equality-side guarantee plus
    // append-parity on the SN side
    assert(full === prior ++ inc, "no squeeze here: exact parity")
    // the scoring tail dedups across fronts: one row per unique pair
    val scored = Linkage.linkIncrementalHybrid(existing, batch, "id",
      Seq(Seq("blk")), Seq("k"), window = 2, hybridRules,
      Long.MinValue + 1).collect()
    assert(scored.length === 3, "one scored row per unique candidate pair")
    assert(scored.map(r => (r.getLong(0), r.getLong(1))).toSet ===
      Set((1L, 2L), (3L, 4L), (2L, 4L)),
      "pairs arrive canonicalized id_a < id_b")
    // loud contracts ride along from the SN front
    val e = intercept[IllegalArgumentException](
      Linkage.hybridPairsIncremental(existing,
        Seq((1L, "B", "q", "X")).toDF("id", "blk", "k", "seg"),
        "id", Seq(Seq("blk")), Seq("k"), 2))
    assert(e.getMessage.contains("disjoint"))
  }

  test("blockingQualityHybrid: completeness strictly above BOTH single-scheme audits on complementary-miss truth") {
    val truth = Seq((1L, 2L), (3L, 1L)).toDF("id_a", "id_b")
    val eqA = Linkage.blockingQualityMulti(hybridDf, "id", Seq(Seq("blk")),
      truth).head()
    val snA = Linkage.blockingQualitySortedNeighborhood(hybridDf, "id",
      Seq("k"), window = 2, truth).head()
    val hyA = Linkage.blockingQualityHybrid(hybridDf, "id", Seq(Seq("blk")),
      Seq("k"), window = 2, truth).head()
    // each single scheme captures exactly one of the two truths
    assert(eqA.getAs[Long]("completeness_ppm") === 500000L)
    assert(snA.getAs[Long]("completeness_ppm") === 500000L)
    assert(hyA.getAs[Long]("completeness_ppm") === 1000000L,
      "hybrid captures both — strictly above each single scheme")
    // candidates = |{(1,2),(3,4)} ∪ {(1,3),(3,4),(2,4)}| = 4, the
    // dedup the hybrid scorer actually scores
    assert(hyA.getAs[Long]("n_candidate_pairs") === 4L)
    assert(hyA.getAs[Long]("n_records") === 4L &&
      hyA.getAs[Long]("n_true_pairs") === 2L &&
      hyA.getAs[Long]("n_captured") === 2L)
  }
}
