package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.Dedup

/** Recall audit for the simhash pruner: per SF, the hamming-distance
  * distribution of the TRUE (exact-jaccard >= threshold) pairs — the
  * number a `maxHamming` choice must cover for the prune-then-verify
  * tier to have recall 1. `sbt "runMain graft.tools.HammingAudit"`. */
object HammingAudit {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[16]")
      .appName("graft-hamming-audit")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (sf <- Seq("sf0.001", "sf0.01", "sf0.1")) {
      val docs = spark.read.parquet(s"/root/testdata/$sf/documents.parquet")
      val exact = Dedup.ngramJaccardPairs(docs, "doc_id", "text", 3, 0.5)
      val sigs = docs.select(col("doc_id"),
        graft.functions.text.simhash(col("text")).as("sh"))
      val h = exact
        .join(sigs.select(col("doc_id").as("id_a"), col("sh").as("sh_a")), Seq("id_a"))
        .join(sigs.select(col("doc_id").as("id_b"), col("sh").as("sh_b")), Seq("id_b"))
        .select(bit_count(col("sh_a").bitwiseXOR(col("sh_b"))).as("hamming"))
        .groupBy("hamming").count().orderBy("hamming")
        .collect().map(r => s"${r.getInt(0)}:${r.getLong(1)}").mkString(" ")
      println(s"[hamming-audit] $sf true-pair hamming counts -> $h")
    }
    spark.stop()
  }
}
