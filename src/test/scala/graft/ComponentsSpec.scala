package graft

import graft.operators.Dedup

class ComponentsSpec extends SparkTestBase {
  import spark.implicits._

  test("components: chains, singletons, disjoint clusters") {
    // a-b, b-c (chain), d-e, isolated f never appears in pairs
    val pairs = Seq((2L, 1L), (2L, 3L), (10L, 11L)).toDF("id_a", "id_b")
    val comp = Dedup.components(pairs).as[(Long, Long)].collect().toMap
    assert(comp(1L) == 1L && comp(2L) == 1L && comp(3L) == 1L)
    assert(comp(10L) == 10L && comp(11L) == 10L)
    assert(!comp.contains(99L))
  }

  test("components converge on a long chain") {
    val chain = (0L until 30L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val comp = Dedup.components(chain, maxIter = 40).as[(Long, Long)].collect().toMap
    assert(comp.values.toSet == Set(0L))
  }

  test("componentsAuto: driver and distributed branches agree exactly") {
    val pairs = Seq((2L, 1L), (2L, 3L), (10L, 11L), (5L, 5L)).toDF("id_a", "id_b")
    val driver = Dedup.componentsAuto(pairs).as[(Long, Long)].collect().toMap
    val dist = Dedup.componentsAuto(pairs, maxDriverPairs = 0L)
      .as[(Long, Long)].collect().toMap
    // NB the self-loop (5,5): both branches keep it as a singleton
    assert(driver == dist)
    assert(driver(1L) == 1L && driver(3L) == 1L && driver(11L) == 10L)
  }

  test("componentsAuto: capped probe still picks the right branch at the boundary") {
    // 4 pairs; the probe counts a LIMIT(bound+1) slice, so the branch
    // decision must stay exact at bound == n and bound == n - 1
    val pairs = Seq((2L, 1L), (2L, 3L), (10L, 11L), (20L, 21L))
      .toDF("id_a", "id_b")
    val expected = Dedup.componentsAuto(pairs, maxDriverPairs = 0L)
      .as[(Long, Long)].collect().toMap // distributed reference
    val atBound = Dedup.componentsAuto(pairs, maxDriverPairs = 4L)
      .as[(Long, Long)].collect().toMap // n == bound -> driver branch
    val belowBound = Dedup.componentsAuto(pairs, maxDriverPairs = 3L)
      .as[(Long, Long)].collect().toMap // n == bound+1 -> distributed
    assert(atBound == expected && belowBound == expected)
    // a bound past Int.MaxValue must not overflow the probe's limit()
    val huge = Dedup.componentsAuto(pairs, maxDriverPairs = Long.MaxValue - 1)
      .as[(Long, Long)].collect().toMap
    assert(huge == expected)
  }

  test("unionFindDropIds: chains and disjoint clusters") {
    val drop = Dedup.unionFindDropIds(Array((2L, 1L), (2L, 3L), (10L, 11L)))
    assert(drop == Set(2L, 3L, 11L)) // keep 1 (chain min) and 10
    assert(Dedup.unionFindDropIds(Array.empty).isEmpty)
  }

  test("dedupCorpus: driver and distributed paths agree") {
    val docA = (1 to 60).map(i => s"word$i").mkString(" ")
    val docB = (1 to 60).map(i => s"other$i").mkString(" ")
    val df = Seq((5L, docA), (7L, docA), (9L, docB)).toDF("id", "t")
    val driver = Dedup.dedupCorpus(df, "id", "t", threshold = 0.4)
      .select("id").as[Long].collect().toSet
    val dist = Dedup.dedupCorpus(df, "id", "t", threshold = 0.4,
      maxDriverPairs = 0L).select("id").as[Long].collect().toSet
    assert(driver == dist && driver == Set(5L, 9L))
  }

  test("dedupCorpus: both branches agree on a real corpus, exactly at the cap boundary") {
    // the sf0.001 documents table carries planted near-dup clusters —
    // a real pair list, not a toy triple. The hybrid switch is
    // pairCount <= maxDriverPairs, so the four runs pin: well inside
    // the cap, exactly AT the cap (driver), one below it (distributed),
    // and zero (fully distributed) — identical survivors everywhere.
    val docs = spark.read.parquet(sf() + "/documents.parquet")
      .select("doc_id", "text")
    val nPairs = Dedup.minhashPairs(docs, "doc_id", "text",
      threshold = 0.5).count()
    assert(nPairs > 0, "fixture lost its planted near-dups")
    def survivors(cap: Long): Set[Long] =
      Dedup.dedupCorpus(docs, "doc_id", "text", threshold = 0.5,
        maxDriverPairs = cap).select("doc_id").as[Long].collect().toSet
    val driver = survivors(Long.MaxValue)
    assert(driver.size < docs.count(), "dedup dropped nothing")
    assert(survivors(nPairs) == driver, "at-cap (driver) branch diverged")
    assert(survivors(nPairs - 1) == driver, "below-cap (distributed) branch diverged")
    assert(survivors(0L) == driver, "fully distributed branch diverged")
  }

  test("dedupCorpus keeps one representative per near-dup cluster") {
    val docA = (1 to 60).map(i => s"word$i").mkString(" ")
    val docAnear = ((1 to 30).map(i => s"word$i") ++ Seq("CHANGED") ++
      (32 to 60).map(i => s"word$i")).mkString(" ")
    val docB = (1 to 60).map(i => s"other$i").mkString(" ")
    val df = Seq((5L, docA), (2L, docAnear), (9L, docB), (7L, docA)).toDF("id", "t")
    val kept = Dedup.dedupCorpus(df, "id", "t", threshold = 0.4)
      .select("id").as[Long].collect().toSet
    // cluster {5,2,7} -> keep 2 (min); 9 unrelated -> kept
    assert(kept == Set(2L, 9L), s"kept $kept")
  }
}
