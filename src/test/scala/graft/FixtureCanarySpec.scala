package graft

import graft.sources.FixtureCanary
import org.apache.spark.sql.functions._

class FixtureCanarySpec extends SparkTestBase {

  test("current fixture matches the recorded schema expectation (3 SFs)") {
    for (d <- Seq("sf0.001", "sf0.01", "sf0.1")) {
      val diffs = FixtureCanary.check(spark, sf(d))
      assert(diffs.isEmpty, s"fixture drift at $d:\n  " + diffs.mkString("\n  "))
    }
  }

  test("doctored fixture fails with a diff naming column and dtype") {
    val dir = java.nio.file.Files.createTempDirectory("graft_canary").toString
    // events with ts re-typed to STRING — the named-drift scenario
    spark.read.parquet(sf() + "/events.parquet")
      .withColumn("ts", col("ts").cast("string"))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val diffs = FixtureCanary.check(spark, dir)
    val tsLine = diffs.find(_.startsWith("events.ts:"))
    assert(tsLine.isDefined, s"no events.ts diff in: $diffs")
    assert(tsLine.get.contains("STRING"), tsLine.get)
    // the other nine tables are absent from the doctored dir — each a
    // named line, not a silent pass
    assert(diffs.count(_.contains("table missing")) == 9, diffs.mkString("; "))
  }

  test("dropped column is a named diff") {
    val dir = java.nio.file.Files.createTempDirectory("graft_canary2").toString
    spark.read.parquet(sf() + "/documents.parquet").drop("lang")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val diffs = FixtureCanary.check(spark, dir)
    assert(diffs.exists(_.startsWith("documents.lang: column missing")),
      diffs.mkString("; "))
  }
}
