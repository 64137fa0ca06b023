package graft

import graft.operators.Dedup

import org.apache.spark.sql.functions._

/** Exact substring-level dedup (word-n-gram granularity): hand-computed
  * semantics, edge cases, and the hashed-fingerprint scale path pinned
  * equal to the exact string path. */
class SubstringDedupSpec extends SparkTestBase {
  import spark.implicits._

  // a 6-token span planted verbatim in docs 1 and 2; doc 3 shares
  // nothing 5 tokens long; doc 4 repeats its own gram WITHIN the doc
  // only; doc 5 is shorter than n; doc 6 is empty
  private val fixture = Seq(
    (1L, "alpha the quick brown fox jumps high today"),
    (2L, "beta gamma the quick brown fox jumps high later"),
    (3L, "entirely different words with no shared span at all"),
    (4L, "x y z w v x y z w v"),
    (5L, "too short"),
    (6L, "")).toDF("doc_id", "text")

  test("duplicatedNgramStats: hand-computed counts on the planted span") {
    val got = Dedup.duplicatedNgramStats(fixture, "doc_id", "text", n = 5)
      .orderBy("doc_id")
      .as[(Long, Long, Long, Long)].collect().toSeq
    // docs 1/2 share the 6-token run "the quick brown fox jumps high"
    // => two duplicated 5-grams each, covering 6 token positions
    assert(got(0) == (1L, 2L, 6L, 8L), s"doc1: ${got(0)}")
    assert(got(1) == (2L, 2L, 6L, 9L), s"doc2: ${got(1)}")
    assert(got(2) == (3L, 0L, 0L, 9L), s"doc3: ${got(2)}")
    // within-doc repetition alone is NOT cross-doc duplication
    assert(got(3) == (4L, 0L, 0L, 10L), s"doc4: ${got(3)}")
    assert(got(4) == (5L, 0L, 0L, 2L), s"doc5: ${got(4)}")
    assert(got(5) == (6L, 0L, 0L, 0L), s"doc6: ${got(5)}")
  }

  test("removeDuplicatedNgrams: covered spans deleted, survivors in order") {
    val got = Dedup.removeDuplicatedNgrams(fixture, "doc_id", "text", n = 5)
      .orderBy("doc_id").as[(Long, String)].collect().toSeq
    assert(got(0) == (1L, "alpha today"), s"doc1: ${got(0)}")
    assert(got(1) == (2L, "beta gamma later"), s"doc2: ${got(1)}")
    // untouched docs come back in the normalized token space
    assert(got(2)._2 == "entirely different words with no shared span at all")
    assert(got(3)._2 == "x y z w v x y z w v")
    assert(got(4)._2 == "too short")
    assert(got(5)._2 == "", s"empty doc must yield '': ${got(5)}")
  }

  test("a fully-duplicated doc is deleted to ''") {
    val df = Seq(
      (1L, "one two three four five"),
      (2L, "one two three four five")).toDF("doc_id", "text")
    val got = Dedup.removeDuplicatedNgrams(df, "doc_id", "text", n = 5)
      .as[(Long, String)].collect().toMap
    assert(got(1L) == "" && got(2L) == "", s"got $got")
  }

  test("minDocs raises the duplication bar") {
    val df = Seq(
      (1L, "one two three four five"),
      (2L, "one two three four five"),
      (3L, "one two three four five")).toDF("doc_id", "text")
    val atTwo = Dedup.duplicatedNgramStats(df, "doc_id", "text", n = 5)
      .agg(sum("n_dup_ngrams")).as[Long].first()
    val atFour = Dedup.duplicatedNgramStats(df, "doc_id", "text", n = 5,
        minDocs = 4)
      .agg(sum("n_dup_ngrams")).as[Long].first()
    assert(atTwo == 3L && atFour == 0L, s"got $atTwo / $atFour")
  }

  test("hashed fingerprint path ≡ exact string path on the corpus") {
    val docs = spark.read.parquet(sf() + "/documents.parquet")
    val exact = Dedup.duplicatedNgramStats(docs, "doc_id", "text", n = 5)
      .orderBy("doc_id").collect().toSeq
    val hashed = Dedup.duplicatedNgramStats(docs, "doc_id", "text", n = 5,
        hashed = true)
      .orderBy("doc_id").collect().toSeq
    assert(exact == hashed, "64-bit gram fingerprints diverged from strings")
    assert(exact.exists(_.getLong(1) > 0),
      "corpus must contain at least one cross-doc duplicated 5-gram " +
        "or the parity check is vacuous")
  }
}
