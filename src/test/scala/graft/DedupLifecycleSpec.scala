package graft

import org.apache.spark.sql.graftbridge.Bridge

import graft.operators.Dedup

/** Storage lifecycle of the dedup tier's materializations (candidate
  * checkpoints, the components() edge cache, the pair-list checkpoint):
  * [[Dedup.withCandidateScope]] must return the session's storage
  * footprint to baseline at scope exit, so a long-lived session
  * processing many corpora doesn't accrete blocks and doesn't need
  * spark.catalog.clearCache() hygiene (which would evict unrelated
  * caches the caller owns).
  */
class DedupLifecycleSpec extends SparkTestBase {
  import spark.implicits._

  // a corpus with a real near-dup cluster so every stage (banding,
  // verify, clustering) actually materializes something
  private def corpus = {
    val docA = (1 to 60).map(i => s"word$i").mkString(" ")
    val docAnear = ((1 to 30).map(i => s"word$i") ++ Seq("CHANGED") ++
      (32 to 60).map(i => s"word$i")).mkString(" ")
    val docB = (1 to 60).map(i => s"other$i").mkString(" ")
    Seq((5L, docA), (2L, docAnear), (9L, docB), (7L, docA)).toDF("id", "t")
  }

  private def persistedKeys = spark.sparkContext.getPersistentRDDs.keySet

  test("withCandidateScope: driver-branch pipeline storage returns to baseline") {
    val before = persistedKeys
    val survivors = Dedup.withCandidateScope {
      val out = Dedup.dedupCorpus(corpus, "id", "t", threshold = 0.4)
      val n = out.count() // terminal action INSIDE the scope
      // the candidate checkpoints exist while the scope is live (eager
      // localCheckpoint registers its blocks at construction)
      assert(persistedKeys.diff(before).nonEmpty,
        "expected live candidate materializations inside the scope")
      n
    }
    assert(survivors === 2) // cluster {5,2,7} -> keep 2; 9 unrelated
    val leaked = persistedKeys.diff(before)
    assert(leaked.isEmpty, s"scope exit leaked persistent RDDs: $leaked")
  }

  test("withCandidateScope: distributed-branch (components) frees the edge cache too") {
    spark.catalog.clearCache() // isolate CacheManager from other suites
    val before = persistedKeys
    val survivors = Dedup.withCandidateScope {
      // maxDriverPairs = 0 forces the distributed min-label fixpoint,
      // whose edges.cache() is a CacheManager entry (strong reference —
      // the leak class the scope exists to prevent)
      Dedup.dedupCorpus(corpus, "id", "t", threshold = 0.4,
        maxDriverPairs = 0L).count()
    }
    assert(survivors === 2)
    val leaked = persistedKeys.diff(before)
    assert(leaked.isEmpty, s"scope exit leaked persistent RDDs: $leaked")
    assert(Bridge.cacheIsEmpty(spark),
      "components() edge cache survived scope exit")
  }

  test("no scope: operators still work; blocks are GC-managed, not leaked to CacheManager") {
    spark.catalog.clearCache()
    val out = Dedup.minhashVerifiedPairs(corpus, "id", "t", threshold = 0.4)
    assert(out.count() >= 1)
    // eager checkpoints live in the block manager under ContextCleaner
    // ownership (freed on GC); the CacheManager — which never drops
    // entries on its own — must stay empty
    assert(Bridge.cacheIsEmpty(spark),
      "dedup tier created a CacheManager entry outside components()")
  }

  test("nested scopes free only their own materializations") {
    val before = persistedKeys
    Dedup.withCandidateScope {
      val outerPairs = Dedup.minhashPairs(corpus, "id", "t", threshold = 0.4)
      val outerLive = persistedKeys.diff(before)
      assert(outerLive.nonEmpty)
      Dedup.withCandidateScope {
        Dedup.minhashPairs(corpus, "id", "t", threshold = 0.3).count()
      }
      // inner scope exit must not free the outer scope's checkpoints
      assert(outerLive.subsetOf(persistedKeys),
        "inner scope released the outer scope's materializations")
      outerPairs.count() // outer data still usable
    }
    assert(persistedKeys.diff(before).isEmpty)
  }
}
