package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Dedup

/** Stage decomposition for the text-dedup family: times each tier of
  * the prune-then-verify pipelines separately and prints candidate /
  * verified pair counts, so a cost regression can be blamed on a stage
  * instead of a query. `sbt "runMain graft.tools.DedupProfile [sfDir]"`. */
object DedupProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("graft-dedup-profile")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000).selectExpr("sum(id)").write.format("noop").mode("overwrite").save()

    def docs: DataFrame =
      spark.read.parquet(s"$sfDir/documents.parquet").repartition(col("doc_id"))

    def timeCount(name: String)(mk: => DataFrame): Unit = {
      val t0 = System.nanoTime()
      val n = mk.count()
      println(f"[dedup-profile] $name%-28s ${(System.nanoTime() - t0) / 1e9}%7.3f s  rows=$n")
    }

    timeCount("minhash_sigs") {
      docs.select(graft.functions.text.minhash(col("text"), 3, 128, 42).as("sig"))
    }
    // construct INSIDE the timed thunk: the pair operators contain an
    // eager localCheckpoint, so building the DataFrame outside would run
    // the dominant banding job before the clock starts (r4 review
    // finding). The verify stages therefore time candidates + verify.
    timeCount("minhash_candidates") {
      Dedup.minhashPairs(docs, "doc_id", "text",
        shingleWidth = 3, numHashes = 128, bands = 32, threshold = 0.35)
    }
    timeCount("minhash_cand+verify") {
      Dedup.verifyPairsJaccard(docs, "doc_id", "text",
        Dedup.minhashPairs(docs, "doc_id", "text",
          shingleWidth = 3, numHashes = 128, bands = 32, threshold = 0.35),
        3, 0.5)
    }
    timeCount("simhash_candidates") {
      Dedup.simhashPairs(docs, "doc_id", "text", maxHamming = 6)
    }
    timeCount("simhash_cand+verify") {
      Dedup.verifyPairsJaccard(docs, "doc_id", "text",
        Dedup.simhashPairs(docs, "doc_id", "text", maxHamming = 6), 3, 0.5)
    }
    timeCount("exact_jaccard")(
      Dedup.ngramJaccardPairs(docs, "doc_id", "text", 3, 0.5))
    spark.stop()
  }
}
