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
  test("corrupt-only queries: rejected raw (the documented caveat), both escapes work") {
    val path = writeLines((1 to 20).map { i =>
      if (i % 4 == 0) s"junk $i" else s"""{"id": $i, "t": "d$i"}"""
    })
    val df = Jsonl.read(spark, path, schema)
    // the caveat itself: a query whose pruned scan schema is ONLY the
    // corrupt column is refused by Spark over raw JSON
    val e = intercept[org.apache.spark.sql.AnalysisException] {
      df.select(col(Jsonl.CorruptColumn))
        .filter(col(Jsonl.CorruptColumn).isNotNull).count()
    }
    assert(e.getMessage.toLowerCase.contains("corrupt"), e.getMessage)
    // escape 1 (the doc's first pattern): carry a payload column —
    // and genuinely READ it: under a bare count() column pruning
    // strips the carried column again and re-triggers the error
    // (that subtlety is why the caveat is documented at all)
    val viaPayload = df.select($"id", col(Jsonl.CorruptColumn))
      .filter(col(Jsonl.CorruptColumn).isNotNull).collect().length
    assert(viaPayload == 5)
    // escape 2 (the doc's second pattern): cache the parsed frame —
    // the corrupt-only query then reads the cache, not the raw scan
    df.cache()
    try {
      val viaCache = df.select(col(Jsonl.CorruptColumn))
        .filter(col(Jsonl.CorruptColumn).isNotNull).count()
      assert(viaCache == 5)
    } finally { df.unpersist(blocking = true); () }
  }

  test("batch and stream reads agree row for row on the same delivery") {
    import org.apache.spark.sql.streaming.Trigger
    val path = writeLines(Seq(
      """{"id": 1, "t": "alpha"}""",
      """not json at all""",
      """{"id": 2, "t": "beta"}""",
      """{"id": 3""",
      """{"id": 4, "t": null}"""))
    val select = Seq($"id", $"t", col(Jsonl.CorruptColumn))
    val batch = Jsonl.read(spark, path, schema).select(select: _*)
      .as[(Option[Long], Option[String], Option[String])].collect().toSet
    val q = Jsonl.readStream(spark, path, schema).select(select: _*)
      .writeStream.format("memory").queryName("jsonl_parity")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    val streamed = spark.table("jsonl_parity")
      .as[(Option[Long], Option[String], Option[String])].collect().toSet
    assert(streamed == batch, s"stream diverged from batch:\n$streamed\nvs\n$batch")
    assert(batch.count(_._3.isDefined) == 2, "fixture must carry quarantine rows")
  }

  test("write -> read round-trip is exact for hostile strings and explicit nulls") {
    val dir = java.nio.file.Files.createTempDirectory("jsonl_write").toString
    val rows = Seq(
      (1L, Some("plain ascii")),
      (2L, Some("line\nbreak\ttab \"quotes\" back\\slash")),
      (3L, Some("unicode é中文 😀 and control \u0001")),
      (4L, None),
      (5L, Some("")))
    Jsonl.write(rows.toDF("id", "t"), dir)
    val back = Jsonl.read(spark, dir, schema)
      .select($"id", $"t", col(Jsonl.CorruptColumn))
      .as[(Option[Long], Option[String], Option[String])].collect().toSet
    assert(back == rows.map { case (i, t) => (Some(i), t, None) }.toSet)
  }

  test("write emits explicit nulls and drops a carried quarantine column") {
    val srcDir = writeLines(Seq(
      """{"id": 1, "t": "keep"}""",
      """broken line""",
      """{"id": 2, "t": null}"""))
    val outDir = java.nio.file.Files.createTempDirectory("jsonl_reexport").toString
    // a frame straight from read() carries the corrupt column; write()
    // must not re-export it (quarantine is diagnostics, not payload)
    Jsonl.write(Jsonl.read(spark, srcDir, schema), outDir)
    val lines = new java.io.File(outDir).listFiles()
      .filter(_.getName.endsWith(".json"))
      .flatMap(f => scala.io.Source.fromFile(f, "UTF-8").getLines()).toSet
    assert(lines.forall(!_.contains(Jsonl.CorruptColumn)),
      s"quarantine column leaked into the export: $lines")
    // explicit nulls: the id=2 line must carry "t":null, not omit t;
    // the quarantined source line becomes an all-null payload row
    assert(lines.contains("""{"id":2,"t":null}"""), lines.toString)
    assert(lines.contains("""{"id":null,"t":null}"""), lines.toString)
  }
}
