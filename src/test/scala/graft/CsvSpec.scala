package graft

import graft.sources.Csv

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

/** The CSV delivery contract — same quarantine semantics as JsonlSpec
  * pins for JSONL, plus the quoting fidelity CSV uniquely risks. */
class CsvSpec extends SparkTestBase {
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("id", LongType), StructField("t", StringType)))

  private def writeLines(lines: Seq[String]): String = {
    val dir = java.nio.file.Files.createTempDirectory("csv_spec")
    val f = dir.resolve("d.csv")
    java.nio.file.Files.write(f, lines.mkString("\n").getBytes("UTF-8"))
    dir.toString
  }

  test("typed-parse failures quarantine with all-null payload; scan survives") {
    val path = writeLines(Seq(
      "1,alpha",
      "BROKEN id 9",
      "2,\"quoted, with comma\"",
      "3,"))
    val rows = Csv.read(spark, path, schema)
      .select($"id", $"t", col(Csv.CorruptColumn))
      .as[(Option[Long], Option[String], Option[String])].collect().toSet
    assert(rows == Set(
      (Some(1L), Some("alpha"), None),
      (None, None, Some("BROKEN id 9")),
      (Some(2L), Some("quoted, with comma"), None),
      (Some(3L), None, None)))
  }

  test("schema must not predeclare the quarantine column") {
    val bad = StructType(schema.fields :+
      StructField(Csv.CorruptColumn, StringType))
    val e = intercept[IllegalArgumentException] {
      Csv.read(spark, "/nonexistent", bad)
    }
    assert(e.getMessage.contains(Csv.CorruptColumn))
  }

  test("batch and stream reads agree row for row on the same delivery") {
    import org.apache.spark.sql.streaming.Trigger
    val path = writeLines(Seq(
      "1,alpha", "BROKEN id 9", "2,beta", "oops,", "4,"))
    val select = Seq($"id", $"t", col(Csv.CorruptColumn))
    val batch = Csv.read(spark, path, schema).select(select: _*)
      .as[(Option[Long], Option[String], Option[String])].collect().toSet
    val q = Csv.readStream(spark, path, schema).select(select: _*)
      .writeStream.format("memory").queryName("csv_parity")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    val streamed = spark.table("csv_parity")
      .as[(Option[Long], Option[String], Option[String])].collect().toSet
    assert(streamed == batch, s"stream diverged from batch:\n$streamed\nvs\n$batch")
    assert(batch.count(_._3.isDefined) == 2, "fixture must carry quarantine rows")
  }

  test("write -> read round-trip is exact for hostile strings; quarantine column dropped") {
    val dir = java.nio.file.Files.createTempDirectory("csv_write").toString
    val hostile = Seq(
      (1L, "plain"),
      (2L, "comma, inside"),
      (3L, "\"quoted\" and , both"),
      (4L, null.asInstanceOf[String]))
      .toDF("id", "t")
      .withColumn(Csv.CorruptColumn, lit("should be dropped"))
    Csv.write(hostile, dir)
    val back = Csv.read(spark, dir, schema)
    assert(!back.columns.contains(Csv.CorruptColumn + "0"),
      "carried quarantine column leaked into the written payload")
    val rows = back.select($"id", $"t")
      .as[(Option[Long], Option[String])].collect().toSet
    assert(rows == Set(
      (Some(1L), Some("plain")),
      (Some(2L), Some("comma, inside")),
      (Some(3L), Some("\"quoted\" and , both")),
      (Some(4L), None)))
  }
}
