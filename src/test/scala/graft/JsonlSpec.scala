package graft

import graft.sources.Jsonl

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

class JsonlSpec extends SparkTestBase {
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("id", LongType), StructField("t", StringType)))

  private def writeLines(lines: Seq[String]): String = {
    val dir = java.nio.file.Files.createTempDirectory("jsonl_spec")
    val f = dir.resolve("d.jsonl")
    java.nio.file.Files.write(f, lines.mkString("\n").getBytes("UTF-8"))
    dir.toString
  }

  test("clean lines round-trip; malformed lines quarantine, scan survives") {
    val path = writeLines(Seq(
      """{"id": 1, "t": "alpha"}""",
      """not json at all""",
      """{"id": 2, "t": "line\nbreak and \"quotes\""}""",
      """{"id": 3""",
      """{"id": 4, "t": null}"""))
    val rows = Jsonl.read(spark, path, schema)
      .select($"id", $"t", col(Jsonl.CorruptColumn))
      .as[(Option[Long], Option[String], Option[String])].collect().toSet
    assert(rows == Set(
      (Some(1L), Some("alpha"), None),
      (None, None, Some("not json at all")),
      (Some(2L), Some("line\nbreak and \"quotes\""), None),
      (None, None, Some("""{"id": 3""")),
      (Some(4L), None, None)))
  }

  test("extra fields are ignored; missing fields are null (schema'd, not inferred)") {
    val path = writeLines(Seq(
      """{"id": 7, "t": "x", "unexpected": [1,2,3]}""",
      """{"t": "orphan"}"""))
    val rows = Jsonl.read(spark, path, schema)
      .select($"id", $"t", col(Jsonl.CorruptColumn).isNull.as("clean"))
      .as[(Option[Long], Option[String], Boolean)].collect().toSet
    assert(rows == Set(
      (Some(7L), Some("x"), true),
      (None, Some("orphan"), true)))
  }

  test("schema must not predeclare the quarantine column") {
    val bad = StructType(schema.fields :+
      StructField(Jsonl.CorruptColumn, StringType))
    val e = intercept[IllegalArgumentException] {
      Jsonl.read(spark, "/nonexistent", bad)
    }
    assert(e.getMessage.contains(Jsonl.CorruptColumn))
  }

  test("quarantine rate is countable — the ingest health metric") {
    val path = writeLines((1 to 50).map { i =>
      if (i % 10 == 0) s"broken $i" else s"""{"id": $i, "t": "d$i"}"""
    })
    // NB: the aggregate must genuinely READ a payload column — Spark
    // disallows scans whose pruned schema is only the corrupt column
    // (UNSUPPORTED_FEATURE.QUERY_ONLY_CORRUPT_RECORD_COLUMN), and
    // column pruning sees through a projection that merely carries it
    val (bad, cleanIds) = Jsonl.read(spark, path, schema)
      .agg(sum(when(col(Jsonl.CorruptColumn).isNotNull, 1L).otherwise(0L)),
        count($"id"))
      .as[(Long, Long)].head()
    assert(bad == 5 && cleanIds == 45)
  }
}
