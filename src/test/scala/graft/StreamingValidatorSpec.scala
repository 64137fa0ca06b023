package graft

import graft.config.{ConfigLoader, Validation, Validations, ValueCheck}
import graft.operators.CdcMerge
import graft.pipeline.Validator
import graft.streaming.CdcStream

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

class StreamingValidatorSpec extends SparkTestBase {
  import spark.implicits._

  private def eventsWithTs = eventsUs()
    .withColumn("ts", timestamp_micros(col("ts")))

  test("streaming windowed agg with watermark matches batch computation") {
    val dir = java.nio.file.Files.createTempDirectory("graft_stream").toString
    eventsWithTs.write.mode("overwrite").parquet(s"$dir/in")
    val schema = spark.read.parquet(s"$dir/in").schema

    val stream = CdcStream.readFiles(spark, s"$dir/in", schema, maxFilesPerTrigger = 2)
    val agg = CdcStream.windowedCounts(stream, "ts", "1 hour", "6 hours")
    val q = agg.writeStream.outputMode("complete")
      .format("memory").queryName("win_agg")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)

    val streamed = spark.table("win_agg")
      .select($"window.start", $"event_type", $"n")
    val batch = eventsWithTs
      .groupBy(window($"ts", "6 hours"), $"event_type")
      .agg(count(lit(1)).as("n"))
      .select($"window.start", $"event_type", $"n")
    assert(streamed.count() > 0)
    assert(streamed.exceptAll(batch).isEmpty && batch.exceptAll(streamed).isEmpty)
  }

  test("md5 sampler is batch/stream unified: same rows either way") {
    // the sampling decision is a stateless content-keyed filter, so the
    // SAME operator runs unchanged on a stream and selects the SAME
    // rows — a training mix drawn incrementally equals one drawn batch
    val dir = java.nio.file.Files.createTempDirectory("graft_stream3").toString
    val ev = spark.read.parquet(sf() + "/events.parquet").select($"event_id")
    ev.write.mode("overwrite").parquet(s"$dir/in")
    val schema = spark.read.parquet(s"$dir/in").schema

    val stream = CdcStream.readFiles(spark, s"$dir/in", schema, maxFilesPerTrigger = 1)
    val sampled = graft.operators.Sampling.hashSample(stream, "event_id", 0.2)
    val q = sampled.writeStream.outputMode("append")
      .format("memory").queryName("stream_sample")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)

    val streamed = spark.table("stream_sample").as[Long].collect().toSet
    val batch = graft.operators.Sampling.hashSample(ev, "event_id", 0.2)
      .as[Long].collect().toSet
    assert(streamed == batch && batch.nonEmpty)
  }

  test("streaming session_window sessions match the batch computation") {
    val dir = java.nio.file.Files.createTempDirectory("graft_stream4").toString
    eventsWithTs.select($"user_id", $"ts").write.mode("overwrite").parquet(s"$dir/in")
    val schema = spark.read.parquet(s"$dir/in").schema

    // several micro-batches, so per-key sessions must MERGE across
    // batches in the state store to match the batch result
    val stream = CdcStream.readFiles(spark, s"$dir/in", schema, maxFilesPerTrigger = 1)
    val sess = CdcStream.sessionizeStream(stream, "user_id", "ts",
      gap = "30 minutes", watermark = "1 hour")
    val q = sess.writeStream.outputMode("complete")
      .format("memory").queryName("stream_sessions")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)

    val streamed = spark.table("stream_sessions")
    val batch = eventsWithTs
      .groupBy($"user_id", session_window($"ts", "30 minutes"))
      .agg(count(lit(1)).as("n_events"))
      .select($"user_id", $"session_window.start".as("session_start"),
        $"session_window.end".as("session_end"), $"n_events")
    assert(streamed.count() > 0)
    assert(streamed.exceptAll(batch).isEmpty && batch.exceptAll(streamed).isEmpty)
  }

  test("KMV sketch at ingest: per-micro-batch sketches merge to the batch sketch") {
    import graft.operators.Sketch
    val dir = java.nio.file.Files.createTempDirectory("graft_stream8").toString
    val ev = eventsUs().select($"event_type", $"user_id")
    ev.repartition(4).write.mode("overwrite").parquet(s"$dir/in")
    val schema = spark.read.parquet(s"$dir/in").schema

    // one sketch per arriving micro-batch — the mergeable-sketch ingest
    // pattern: history is never rescanned, the rollup is sketch-sized
    val perBatch = scala.collection.mutable.ArrayBuffer[(String, Seq[Long])]()
    val stream = CdcStream.readFiles(spark, s"$dir/in", schema, maxFilesPerTrigger = 1)
    val q = stream.writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        perBatch ++= Sketch.kmv(batch, Seq("event_type"), "user_id", 32)
          .collect().map(r => (r.getString(0), r.getSeq[Long](1)))
        ()
      }
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    assert(perBatch.map(_._1).distinct.size < perBatch.size,
      "expected multiple micro-batches to sketch the same group")

    val merged = Sketch.kmvMerge(
        perBatch.toSeq.toDF("event_type", "sketch"), Seq("event_type"), 32)
      .collect().map(r => r.getString(0) -> r.getSeq[Long](1)).toMap
    val whole = Sketch.kmv(ev, Seq("event_type"), "user_id", 32)
      .collect().map(r => r.getString(0) -> r.getSeq[Long](1)).toMap
    assert(merged == whole, "ingest-merged sketches diverged from batch sketch")
  }

  test("quantile sketch at ingest: per-micro-batch sketches merge to the batch sketch") {
    import graft.operators.Sketch
    val dir = java.nio.file.Files.createTempDirectory("graft_stream9").toString
    val ev = eventsUs().select($"event_type", $"event_id", $"value")
    ev.repartition(4).write.mode("overwrite").parquet(s"$dir/in")
    val schema = spark.read.parquet(s"$dir/in").schema

    val perBatch = scala.collection.mutable.ArrayBuffer[org.apache.spark.sql.Row]()
    val stream = CdcStream.readFiles(spark, s"$dir/in", schema, maxFilesPerTrigger = 1)
    val q = stream.writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        perBatch ++= Sketch.quantileSketch(batch, Seq("event_type"),
          "value", "event_id", 64).collect()
        ()
      }
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    assert(perBatch.map(_.getString(0)).distinct.size < perBatch.size,
      "expected multiple micro-batches to sketch the same group")

    val sketchType = Sketch.quantileSketch(ev, Seq("event_type"),
      "value", "event_id", 64).schema
    val shards = spark.createDataFrame(
      new java.util.ArrayList(java.util.Arrays.asList(perBatch.toSeq: _*)),
      sketchType)
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getString(0) -> r.getSeq[Any](1).toSeq).toMap
    val merged = canon(Sketch.quantileMerge(shards, Seq("event_type"), 64))
    val whole = canon(Sketch.quantileSketch(ev, Seq("event_type"),
      "value", "event_id", 64))
    assert(merged == whole, "ingest-merged quantile sketches diverged from batch")
  }

  test("HLL registers at ingest: per-micro-batch registers merge to the batch registers") {
    import graft.operators.Sketch
    val dir = java.nio.file.Files.createTempDirectory("graft_stream_hll").toString
    val ev = eventsUs().select($"event_type",
      ($"user_id" * 100000 + expr("ts div 86400000000")).as("ud"))
    ev.repartition(4).write.mode("overwrite").parquet(s"$dir/in")
    val schema = spark.read.parquet(s"$dir/in").schema

    val perBatch = scala.collection.mutable.ArrayBuffer[org.apache.spark.sql.Row]()
    val stream = CdcStream.readFiles(spark, s"$dir/in", schema, maxFilesPerTrigger = 1)
    val q = stream.writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        perBatch ++= Sketch.hll(batch, Seq("event_type"), "ud").collect()
        ()
      }
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    def canon(rows: Seq[org.apache.spark.sql.Row]) =
      rows.map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    val shards = perBatch.toSeq.map(r =>
      (r.getString(0), r.getLong(1), r.getLong(2)))
      .toDF("event_type", "bucket", "r")
    val merged = canon(Sketch.hllMerge(shards, Seq("event_type")).collect())
    val whole = canon(Sketch.hll(ev, Seq("event_type"), "ud").collect())
    assert(merged == whole, "ingest-merged HLL registers diverged from batch")
  }

  test("stream-stream interval join matches batch (view -> purchase attribution)") {
    val dir = java.nio.file.Files.createTempDirectory("graft_stream8").toString
    val ev = eventsUs().select($"event_id", $"user_id", $"event_type",
      timestamp_micros($"ts").as("ts"))
    val views = ev.filter($"event_type" === "view")
      .select($"user_id", $"ts".as("view_ts"), $"event_id".as("view_id"))
    val purchases = ev.filter($"event_type" === "purchase")
      .select($"user_id", $"ts".as("purchase_ts"), $"event_id".as("purchase_id"))
    views.write.mode("overwrite").parquet(s"$dir/views")
    purchases.write.mode("overwrite").parquet(s"$dir/purchases")

    def joined(l: org.apache.spark.sql.DataFrame,
               r: org.apache.spark.sql.DataFrame) =
      CdcStream.intervalJoinStreams(l, r, Seq("user_id"),
        "view_ts", "purchase_ts", watermark = "1 hour", maxSpan = "30 minutes")

    val q = joined(
        CdcStream.readFiles(spark, s"$dir/views",
          spark.read.parquet(s"$dir/views").schema, maxFilesPerTrigger = 1),
        CdcStream.readFiles(spark, s"$dir/purchases",
          spark.read.parquet(s"$dir/purchases").schema, maxFilesPerTrigger = 1))
      .writeStream.outputMode("append")
      .format("memory").queryName("stream_interval_join")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)

    val streamed = spark.table("stream_interval_join")
      .collect().map(_.toSeq).toSet
    val batch = joined(views, purchases).collect().map(_.toSeq).toSet
    assert(streamed == batch && streamed.nonEmpty,
      s"stream ${streamed.size} rows vs batch ${batch.size}")
    // the range is real: every pair respects [view_ts, view_ts + 30min]
    val bad = spark.table("stream_interval_join")
      .filter($"purchase_ts" < $"view_ts" ||
        $"purchase_ts" > $"view_ts" + expr("INTERVAL 30 minutes")).count()
    assert(bad == 0, s"$bad pairs violate the interval")
  }

  test("stream-static enrichment join matches batch; unmatched facts flow through") {
    val dir = java.nio.file.Files.createTempDirectory("graft_stream7").toString
    val ev = eventsUs().select($"event_id", $"event_type", $"value")
    ev.write.mode("overwrite").parquet(s"$dir/in")
    val schema = spark.read.parquet(s"$dir/in").schema
    // dimension misses one event_type on purpose: left-join semantics
    val dim = ev.select($"event_type").distinct().orderBy($"event_type")
      .limit(3).withColumn("category", concat(lit("cat_"), $"event_type"))

    val stream = CdcStream.readFiles(spark, s"$dir/in", schema, maxFilesPerTrigger = 1)
    val q = CdcStream.enrich(stream, dim, Seq("event_type"))
      .writeStream.outputMode("append")
      .format("memory").queryName("stream_enriched")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)

    val streamed = spark.table("stream_enriched").collect().map(_.toSeq).toSet
    val batch = CdcStream.enrich(ev, dim, Seq("event_type"))
      .collect().map(_.toSeq).toSet
    assert(streamed == batch && streamed.nonEmpty)
    assert(streamed.exists(_.last == null),
      "expected unmatched facts to flow through with null attributes")
  }

  test("curation ops are batch/stream unified: qualityFilter + redactPii on a stream") {
    // both are stateless per-row operators, so the SAME code runs
    // unchanged on a micro-batch stream and selects/produces the SAME
    // rows — curation applied at ingest equals curation applied batch
    val dir = java.nio.file.Files.createTempDirectory("graft_stream5").toString
    val docs = spark.read.parquet(sf() + "/documents.parquet")
      .select($"doc_id", $"text")
    docs.write.mode("overwrite").parquet(s"$dir/in")
    val schema = spark.read.parquet(s"$dir/in").schema

    val stream = CdcStream.readFiles(spark, s"$dir/in", schema, maxFilesPerTrigger = 1)
    def annotate(df: org.apache.spark.sql.DataFrame) =
      df.withColumn("entropy_scaled",
        element_at(graft.functions.text.diversityStats($"text"), 3))
    val curated = annotate(graft.operators.Transformators.redactPii(
      graft.operators.Corpus.qualityFilter(stream, "text",
        graft.operators.Corpus.QualityGates(minTokens = 20, maxTokens = 1000,
          minQuality = 0.55, maxDupWordRatio = 0.6, maxTopBigramRatio = 0.1)),
      Seq("text")))
    val q = curated.writeStream.outputMode("append")
      .format("memory").queryName("stream_curated")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)

    val streamed = spark.table("stream_curated").collect().map(_.toSeq).toSet
    val batch = annotate(graft.operators.Transformators.redactPii(
      graft.operators.Corpus.qualityFilter(docs, "text",
        graft.operators.Corpus.QualityGates(minTokens = 20, maxTokens = 1000,
          minQuality = 0.55, maxDupWordRatio = 0.6, maxTopBigramRatio = 0.1)),
      Seq("text"))).collect().map(_.toSeq).toSet
    assert(streamed.nonEmpty && streamed == batch)
  }

  test("tokenizer accounting is batch/stream unified: BpeStatsExpr on a stream") {
    // token accounting at ingest (per-arriving-file token budgets)
    // must equal the batch recount: the trained model is a pure
    // plan-shipped object, so the SAME projection runs both ways
    val dir = java.nio.file.Files.createTempDirectory("graft_stream6").toString
    val docs = spark.read.parquet(sf() + "/documents.parquet")
      .select($"doc_id", $"text")
    docs.write.mode("overwrite").parquet(s"$dir/in")
    val schema = spark.read.parquet(s"$dir/in").schema

    def tokenStats(df: org.apache.spark.sql.DataFrame) =
      df.select($"doc_id",
        org.apache.spark.sql.graftbridge.Bridge.column(
          graft.functions.BpeStatsExpr(
            org.apache.spark.sql.graftbridge.Bridge.expression($"text"),
            graft.functions.Bpe.default)).as("st"))
        .select($"doc_id", $"st.n_tokens", $"st.sum_chars")

    val stream = CdcStream.readFiles(spark, s"$dir/in", schema, maxFilesPerTrigger = 1)
    val q = tokenStats(stream).writeStream.outputMode("append")
      .format("memory").queryName("stream_bpe")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)

    val streamed = spark.table("stream_bpe").collect().map(_.toSeq).toSet
    val batch = tokenStats(docs).collect().map(_.toSeq).toSet
    assert(streamed.nonEmpty && streamed == batch)
  }

  test("streaming latest-per-key state matches batch CdcMerge.latestPerKey") {
    val dir = java.nio.file.Files.createTempDirectory("graft_stream2").toString
    val ev = eventsUs().select($"user_id", $"ts", $"event_id")
    ev.write.mode("overwrite").parquet(s"$dir/in")
    val schema = spark.read.parquet(s"$dir/in").schema

    val stream = CdcStream.readFiles(spark, s"$dir/in", schema)
    val latest = CdcStream.latestPerKeyStream(stream, "user_id", "ts")
    val q = latest.writeStream.outputMode("update")
      .format("memory").queryName("latest_keys")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)

    // schema-preserving: meta columns + the ORIGINAL payload columns
    assert(spark.table("latest_keys").columns.toSeq ==
      Seq("__key", "__ts", "user_id", "ts", "event_id"))
    // last update per key in the stream output == batch latest-per-key,
    // compared on the full original row (not just the timestamp)
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy($"__key").orderBy($"__ts".desc, $"event_id".desc)
    val streamedLatest = spark.table("latest_keys")
      .withColumn("rn", row_number().over(w)).filter($"rn" === 1)
      .select($"user_id", $"ts", $"event_id")
    val batchLatest = CdcMerge.latestPerKey(ev, Seq("user_id"), "ts")
    assert(streamedLatest.exceptAll(batchLatest).isEmpty)
    assert(batchLatest.exceptAll(streamedLatest).isEmpty)
  }

  test("streaming snapshot maintenance == batch applyDelta") {
    val dir = java.nio.file.Files.createTempDirectory("graft_stream4").toString
    val orders = spark.read.parquet(sf() + "/orders.parquet")
    orders.write.mode("overwrite").parquet(s"$dir/snapshot")

    // two delta files with increasing ingestion ts: an update wave, then
    // a delete wave touching a subset of the updated keys
    val u = orders.filter($"o_orderkey" % 5 === 0)
      .withColumn("o_totalprice", $"o_totalprice" + 111.0)
      .withColumn(CdcMerge.OpColumn, lit("U"))
      .withColumn(CdcMerge.TsColumn, lit(1L))
    val d = orders.filter($"o_orderkey" % 10 === 0)
      .withColumn(CdcMerge.OpColumn, lit("D"))
      .withColumn(CdcMerge.TsColumn, lit(2L))
    u.coalesce(1).write.mode("overwrite").parquet(s"$dir/deltas_stage/f1")
    d.coalesce(1).write.mode("overwrite").parquet(s"$dir/deltas_stage/f2")
    // land files in order — the file source orders by modification time,
    // so give them EXPLICIT increasing mtimes (copies land too fast to
    // rely on the clock; CDC application order matters: a delete
    // replayed before its earlier update would resurrect rows)
    new java.io.File(s"$dir/deltas").mkdirs()
    for ((f, i) <- Seq("f1", "f2").zipWithIndex) {
      val src = new java.io.File(s"$dir/deltas_stage/$f").listFiles()
        .filter(_.getName.endsWith(".parquet")).head
      val dst = new java.io.File(s"$dir/deltas/$f.parquet")
      java.nio.file.Files.copy(src.toPath, dst.toPath)
      dst.setLastModified(System.currentTimeMillis() - 60000 + i * 30000)
    }

    val schema = spark.read.parquet(s"$dir/deltas/f1.parquet").schema
    val stream = CdcStream.readFiles(spark, s"$dir/deltas", schema,
      maxFilesPerTrigger = 1)
    val q = CdcStream.maintainSnapshot(stream, s"$dir/snapshot",
      Seq("o_orderkey"), s"$dir/ckpt")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)

    val got = spark.read.parquet(s"$dir/snapshot")
    val want = CdcMerge.applyDelta(orders, u.unionByName(d), Seq("o_orderkey"))
    assert(got.count() == want.count())
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty)
  }

  test("validator: equals/contains all-rows semantics, throw on violation") {
    spark.read.parquet(sf() + "/region.parquet").createOrReplaceTempView("v_region")
    val good = Validations(Seq(
      Validation("SELECT r_name FROM v_region WHERE r_name = 'ASIA'",
        "r_name", ValueCheck.Equals("ASIA")),
      Validation("SELECT r_name FROM v_region WHERE r_name LIKE 'A%'",
        "r_name", ValueCheck.Contains("A"))))
    assert(Validator.runOrThrow(spark, good))

    val bad = Validations(Seq(
      Validation("SELECT r_name FROM v_region", "r_name", ValueCheck.Equals("ASIA"))))
    val results = Validator.run(spark, bad)
    assert(results.head.violations == 4) // all but ASIA
    intercept[IllegalStateException](Validator.runOrThrow(spark, bad))
    assert(Validator.runOrThrow(spark, bad, skip = true)) // SKIP_VALIDATIONS
  }

  test("streaming transitions match batch across a checkpoint restart") {
    import graft.operators.Temporal
    val dir = java.nio.file.Files.createTempDirectory("graft_stream_tr").toString
    val ev = eventsUs().select($"user_id", $"ts", $"event_id", $"event_type")
    // split at the median ts: per-key arrival order across the two
    // phases matches event-time order, so nothing is late-dropped and
    // the batch operator is the exact ground truth
    val split = ev.agg(expr("percentile(ts, 0.5D)")).first().getDouble(0).toLong
    ev.filter($"ts" <= split).write.parquet(s"$dir/in")
    val schema = spark.read.parquet(s"$dir/in").schema
    val ckpt = s"$dir/ckpt"

    // parquet sink (memory sink cannot recover from a checkpoint): the
    // output dir ACCUMULATES both phases, so it is the combined result
    def runPhase(): Unit = {
      val stream = CdcStream.readFiles(spark, s"$dir/in", schema,
        maxFilesPerTrigger = 4)
      val pairs = CdcStream.transitionsStream(stream, "user_id", "ts",
        "event_type", "event_id")
      val q = pairs.writeStream.outputMode("append").format("parquet")
        .option("path", s"$dir/out").option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination(120000)
    }
    runPhase()
    val n1 = spark.read.parquet(s"$dir/out").count()
    // phase 2: new files only (the checkpoint remembers phase 1); its
    // first pair per key SPANS the restart — recovered from state
    ev.filter($"ts" > split).write.mode("append").parquet(s"$dir/in")
    runPhase()
    val all = spark.read.parquet(s"$dir/out")
    assert(n1 > 0 && all.count() > n1)

    val combined = all.groupBy($"from_state", $"to_state")
      .agg(count(lit(1)).as("n")).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val batch = Temporal
      .transitions(ev, "user_id", "ts", "event_type", "event_id")
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2))
      .toMap
    assert(combined == batch)
  }

  test("funnelStream edge semantics: overlap, window cut, no-entry, late drop") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
    val in = MemoryStream[(Long, Long, Long, String)]
    val steps = Seq($"et" === "a", $"et" === "a", $"et" === "b")
    val out = CdcStream.funnelStream(
      in.toDF.toDF("u", "ts", "tie", "et"), "u", "ts", "tie",
      steps, windowUs = 100L)
    val q = out.writeStream.format("memory").queryName("graft_funnel_unit")
      .outputMode("append").start()
    try {
      in.addData(
        (1L, 10L, 1L, "a"), (1L, 15L, 2L, "a"), (1L, 20L, 3L, "b"), // full
        (2L, 10L, 1L, "a"), (2L, 200L, 2L, "a"), // 2nd a outside window
        (3L, 10L, 1L, "b")) // wrong first step: never enters
      q.processAllAvailable()
      // a late event older than key 1's cursor must not splice in
      in.addData((1L, 5L, 0L, "a"))
      q.processAllAvailable()
      val rows = spark.table("graft_funnel_unit")
        .as[(Long, Int, Long)].collect().toSet
      // overlapping a/a predicates advance steps 1 AND 2 (strictly
      // increasing ts); key 2 stalls at step 1; key 3 absent
      assert(rows == Set((1L, 1, 10L), (1L, 2, 15L), (1L, 3, 20L),
        (2L, 1, 10L)))
    } finally q.stop()
  }

  test("dedupFirstSeenStream: duplicate suppression survives a checkpoint restart; min-id within a batch") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
    // unit semantics: within-batch tie -> min id; later dup dropped
    val in = MemoryStream[(String, Long)]
    val q = CdcStream.dedupFirstSeenStream(
        in.toDF.toDF("k", "id"), "k", "id")
      .writeStream.format("memory").queryName("graft_dedup_unit")
      .outputMode("append").start()
    try {
      in.addData(("x", 7L), ("x", 3L), ("y", 1L))
      q.processAllAvailable()
      in.addData(("x", 1L), ("z", 9L)) // x already emitted: 1L dropped
      q.processAllAvailable()
      val rows = spark.table("graft_dedup_unit")
        .as[(String, Long)].collect().toSet
      assert(rows == Set(("x", 3L), ("y", 1L), ("z", 9L)))
    } finally q.stop()

    // restart parity: dup keys split across the checkpoint boundary
    // must still collapse to ONE emitted row per key
    val dir = java.nio.file.Files.createTempDirectory("graft_stream_dd").toString
    // key carries a coarse event_id quartile so the later quartiles'
    // keys genuinely FIRST-appear in phase 2 (a key built only from
    // user/event_type saturates in phase 1 on this dense fixture)
    val maxId = eventsUs().agg(max($"event_id")).first().getLong(0)
    val ev = eventsUs().select(
      concat_ws(":", $"user_id" % 20, $"event_type",
        expr(s"event_id * 4 div ${maxId + 1}")).as("k"), $"event_id")
    val split = ev.agg(expr("percentile(event_id, 0.5D)")).first()
      .getDouble(0).toLong
    ev.filter($"event_id" <= split).write.parquet(s"$dir/in")
    val schema = spark.read.parquet(s"$dir/in").schema
    def runPhase(): Unit = {
      val stream = CdcStream.readFiles(spark, s"$dir/in", schema,
        maxFilesPerTrigger = 4)
      val s = CdcStream.dedupFirstSeenStream(stream, "k", "event_id")
        .writeStream.outputMode("append").format("parquet")
        .option("path", s"$dir/out")
        .option("checkpointLocation", s"$dir/ckpt")
        .trigger(Trigger.AvailableNow()).start()
      s.awaitTermination(120000)
    }
    runPhase()
    val phase1Keys = spark.read.parquet(s"$dir/out")
      .select($"__key").as[String].collect().toSet
    ev.filter($"event_id" > split).write.mode("append").parquet(s"$dir/in")
    runPhase()
    val out = spark.read.parquet(s"$dir/out")
    val emitted = out.select($"__key").as[String].collect()
    val expectedKeys = ev.select($"k").distinct().as[String].collect().toSet
    // every key exactly once — a key seen in phase 1 whose duplicates
    // arrive in phase 2 must NOT re-emit (state recovered from ckpt)
    assert(emitted.length == emitted.toSet.size,
      "a key was emitted twice across the restart")
    assert(emitted.toSet == expectedKeys)
    assert(phase1Keys.nonEmpty && phase1Keys.size < expectedKeys.size,
      "split must leave some keys to first-appear in phase 2")
    // each emitted id really belongs to its key's group
    val pairs = out.as[(String, Long)].collect().toSet
    val valid = ev.as[(String, Long)].collect().toSet
    assert(pairs.subsetOf(valid))
  }

  test("dedupFirstSeenStream: a re-delivered duplicate batch emits nothing new; NULL key/id rows are filtered, not fatal") {
    val dir = java.nio.file.Files.createTempDirectory("graft_stream_dd2").toString
    val rows = Seq(("a", Some(5L)), ("a", Some(7L)), ("b", Some(2L)))
      .toDF("k", "id")
    rows.write.parquet(s"$dir/in")
    val schema = spark.read.parquet(s"$dir/in").schema
    def runPhase(): Unit = {
      val stream = CdcStream.readFiles(spark, s"$dir/in", schema,
        maxFilesPerTrigger = 4)
      val s = CdcStream.dedupFirstSeenStream(stream, "k", "id")
        .writeStream.outputMode("append").format("parquet")
        .option("path", s"$dir/out")
        .option("checkpointLocation", s"$dir/ckpt")
        .trigger(Trigger.AvailableNow()).start()
      s.awaitTermination(120000)
    }
    runPhase()
    // the at-least-once failure mode: the SAME batch content arrives
    // again after a crash-restart (source replay) — the winners must
    // not re-emit, state recovered from the checkpoint suppresses them
    rows.write.mode("append").parquet(s"$dir/in")
    runPhase()
    val out1 = spark.read.parquet(s"$dir/out").as[(String, Long)]
      .collect()
    assert(out1.length == 2 && out1.toSet == Set(("a", 5L), ("b", 2L)),
      s"re-delivered batch changed the output: ${out1.toSeq}")
    // NULL dedup key / NULL id rows are dropped by contract (no
    // identity to dedup on), not a runtime crash of the query
    Seq((Option("c"), Some(3L)), (None: Option[String], Some(9L)),
        (Option("d"), None: Option[Long]))
      .toDF("k", "id").write.mode("append").parquet(s"$dir/in")
    runPhase()
    val out2 = spark.read.parquet(s"$dir/out").as[(String, Long)]
      .collect().toSet
    assert(out2 == Set(("a", 5L), ("b", 2L), ("c", 3L)),
      s"NULL rows leaked or crashed the phase: $out2")
  }

  test("sessionizeStream edge semantics: gap boundary inclusive, late drop, per-key indexing") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
    val in = MemoryStream[(Long, Long, Long)]
    val out = CdcStream.sessionizeStream(
      in.toDF.toDF("u", "ts", "tie"), "u", "ts", "tie", gap = 10L)
    val q = out.writeStream.format("memory").queryName("graft_sess_unit")
      .outputMode("append").start()
    try {
      in.addData(
        (1L, 100L, 1L), (1L, 110L, 2L), // exactly gap: SAME session
        (1L, 121L, 3L),                 // gap+1 after 110: closes s0
        (2L, 100L, 1L))                 // second key: own idx space
      q.processAllAvailable()
      // a late event older than key 1's cursor must not splice in
      in.addData((1L, 50L, 0L))
      q.processAllAvailable()
      // close key 1's second session so it becomes visible
      in.addData((1L, 200L, 4L))
      q.processAllAvailable()
      val rows = spark.table("graft_sess_unit")
        .as[(Long, Long, Long, Long, Long)].collect().toSet
      // s0 = [100..110] with 2 events (the boundary event joined, the
      // late 50 didn't); s1 = [121..121] closed by the 200 event
      assert(rows == Set((1L, 0L, 2L, 100L, 110L), (1L, 1L, 1L, 121L, 121L)))
    } finally q.stop()
  }

  test("sessionizeStream: emitted sessions equal the FULL batch frame once the event-time flush fires, across a restart") {
    import graft.operators.Temporal
    val gap = 1800000000L // 30 min, the q_concurrency sessionize gap
    val dir = java.nio.file.Files.createTempDirectory("graft_stream_sn").toString
    val ev = eventsUs().select($"user_id", $"ts", $"event_id")
    // early split so open sessions genuinely span the restart
    val split = ev.agg(expr("percentile(ts, 0.05D)")).first().getDouble(0).toLong
    val Array(minTs, maxTs) = ev.agg(min($"ts"), max($"ts")).first() match {
      case r => Array(r.getLong(0), r.getLong(1))
    }
    // lateness spanning the whole fixture: part files inside a phase
    // cover arbitrary ts subsets, so the watermark must not flush a
    // key mid-stream while genuinely-newer rows are still in flight
    val lateness = maxTs - minTs + gap // strictly covers any in-flight disorder
    ev.filter($"ts" <= split).write.parquet(s"$dir/in")
    val schema = spark.read.parquet(s"$dir/in").schema
    def runPhase(): Unit = {
      val stream = CdcStream.readFiles(spark, s"$dir/in", schema,
        maxFilesPerTrigger = 4)
      val q = CdcStream.sessionizeStream(stream, "user_id", "ts",
          "event_id", gap, lateness = Some(lateness))
        .writeStream.outputMode("append").format("parquet")
        .option("path", s"$dir/out")
        .option("checkpointLocation", s"$dir/ckpt")
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination(120000)
    }
    runPhase()
    val n1 = spark.read.parquet(s"$dir/out").count()
    ev.filter($"ts" > split).write.mode("append").parquet(s"$dir/in")
    runPhase()
    val nData = spark.read.parquet(s"$dir/out").count()
    // two sentinel phases on a reserved key: the first advances the
    // watermark past every session_end + gap, the second runs a data
    // batch under that watermark so all armed timeouts FIRE (no-data
    // batches may do it earlier; either way is fine)
    Seq((-1L, maxTs + lateness + 2 * gap, 0L))
      .toDF("user_id", "ts", "event_id")
      .write.mode("append").parquet(s"$dir/in")
    runPhase()
    Seq((-1L, maxTs + lateness + 4 * gap, 1L))
      .toDF("user_id", "ts", "event_id")
      .write.mode("append").parquet(s"$dir/in")
    runPhase()
    val streamed = spark.read.parquet(s"$dir/out")
      .filter($"__key" >= 0) // sentinel sessions are not under test
      .select($"__key", $"session_idx", $"n_events", $"session_start",
        $"session_end")
      .as[(Long, Long, Long, Long, Long)].collect().toSet

    // ground truth: the FULL batch frame — the event-time flush closes
    // every key's final session, the exact gap the NoTimeout version
    // left open (it could only pin batch-minus-final parity)
    val batch = Temporal.sessionize(ev, "user_id", "ts", gap,
        tieCol = "event_id")
      .select($"user_id", $"session_idx", $"n_events", $"session_start",
        $"session_end")
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    assert(n1 > 0 && nData > n1,
      "phase 2 must close sessions across the restart")
    assert(streamed.size > nData.toInt,
      "the sentinel phases must flush final sessions beyond the data-closed ones")
    assert(streamed == batch,
      s"streamed ${streamed.size} sessions vs full batch frame ${batch.size}")
  }

  test("sessionizeStream: duplicate cursor rows count into the open session like batch") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
    val in = MemoryStream[(Long, Long, Long)]
    val q = CdcStream.sessionizeStream(
        in.toDF.toDF("u", "ts", "tie"), "u", "ts", "tie", gap = 10L)
      .writeStream.format("memory").queryName("graft_sess_dup")
      .outputMode("append").start()
    try {
      in.addData((1L, 100L, 1L), (1L, 100L, 1L)) // same row twice in-batch
      q.processAllAvailable()
      in.addData((1L, 100L, 1L)) // cursor-equal re-delivery across batches
      q.processAllAvailable()
      in.addData((1L, 121L, 2L)) // gap break closes s0
      q.processAllAvailable()
      val rows = spark.table("graft_sess_dup")
        .as[(Long, Long, Long, Long, Long)].collect().toSet
      // batch Temporal.sessionize counts every row: n = 3
      assert(rows == Set((1L, 0L, 3L, 100L, 100L)))
    } finally q.stop()
  }

  test("sessionizeStream: event-time timeout flushes an idle session; the key reopens at the NEXT idx with the cursor intact") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
    val gap = 10000000L // 10 s in µs
    val t0 = 1000000000000L
    val in = MemoryStream[(Long, Long, Long)]
    val q = CdcStream.sessionizeStream(
        in.toDF.toDF("u", "ts", "tie"), "u", "ts", "tie", gap,
        lateness = Some(0L))
      .writeStream.format("memory").queryName("graft_sess_flush")
      .outputMode("append").start()
    try {
      in.addData((1L, t0, 1L))
      q.processAllAvailable()
      in.addData((2L, t0 + 60000000L, 1L)) // wm -> t0+60s after this batch
      q.processAllAvailable()
      in.addData((2L, t0 + 61000000L, 2L)) // batch under the new wm: key 1 times out
      q.processAllAvailable()
      val flushed = spark.table("graft_sess_flush")
        .as[(Long, Long, Long, Long, Long)].collect().toSet
      assert(flushed.contains((1L, 0L, 1L, t0, t0)),
        s"idle session was not flushed: $flushed")
      // a row at/older than the flushed cursor stays dropped; a newer
      // one reopens the key at idx 1 (batch's idx continuity)
      in.addData((1L, t0, 1L), (1L, t0 + 70000000L, 2L))
      q.processAllAvailable()
      in.addData((1L, t0 + 90000000L, 3L)) // 20 s > gap: closes idx 1
      q.processAllAvailable()
      val rows = spark.table("graft_sess_flush")
        .as[(Long, Long, Long, Long, Long)].collect().toSet
      assert(rows.contains((1L, 1L, 1L, t0 + 70000000L, t0 + 70000000L)),
        s"reopened session did not continue at idx 1: $rows")
      assert(!rows.exists(r => r._1 == 1L && r._2 == 1L && r._3 > 1L),
        "the dropped cursor-aged row leaked into the reopened session")
    } finally q.stop()
  }

  test("ewmaStream: per-event EWMA equals the batch operator BIT-FOR-BIT across a checkpoint restart") {
    import graft.operators.Temporal
    val dir = java.nio.file.Files.createTempDirectory("graft_stream_ew").toString
    val ev = eventsUs().filter($"user_id" % 7 === 0)
      .select($"user_id", $"ts", $"event_id", $"value")
    // early split so the ring-buffer state genuinely spans the restart
    val split = ev.agg(expr("percentile(ts, 0.05D)")).first().getDouble(0).toLong
    ev.filter($"ts" <= split).write.parquet(s"$dir/in")
    val schema = spark.read.parquet(s"$dir/in").schema
    def runPhase(): Unit = {
      val stream = CdcStream.readFiles(spark, s"$dir/in", schema,
        maxFilesPerTrigger = 4)
      val q = CdcStream.ewmaStream(stream, "user_id", "ts", "event_id",
          "value")
        .writeStream.outputMode("append").format("parquet")
        .option("path", s"$dir/out")
        .option("checkpointLocation", s"$dir/ckpt")
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination(120000)
    }
    runPhase()
    val n1 = spark.read.parquet(s"$dir/out").count()
    ev.filter($"ts" > split).write.mode("append").parquet(s"$dir/in")
    runPhase()
    val streamed = spark.read.parquet(s"$dir/out")
      .select($"__key", $"ts", $"tie", $"ewma")
      .as[(Long, Long, Long, Double)].collect().toSet
    val batch = Temporal.ewmaHalfLife(ev, "user_id", "ts", "event_id",
        "value")
      .select($"user_id", $"ts", $"event_id", $"ewma")
      .as[(Long, Long, Long, Double)].collect().toSet
    assert(n1 > 0 && streamed.size > n1.toInt,
      "phase 2 must add per-event outputs across the restart")
    // set equality on RAW doubles: same ascending-lag sum order and
    // power-of-two divisions on both paths, so == is exact
    assert(streamed == batch,
      s"streamed ${streamed.size} rows vs batch ${batch.size}")
  }

  test("streaming funnel completions match batch across a checkpoint restart") {
    import graft.operators.Temporal
    val steps = Seq($"event_type" === "view", $"event_type" === "click",
      $"event_type" === "purchase")
    val windowUs = 259200000000L // 3 days, the q_funnel_rates window
    val dir = java.nio.file.Files.createTempDirectory("graft_stream_fn").toString
    val ev = eventsUs().select($"user_id", $"ts", $"event_id", $"event_type")
    // split EARLY (5th percentile of ts — any ts split keeps per-key
    // arrival in event-time order, so the batch operator stays the
    // exact ground truth): at the median this dense fixture completes
    // every funnel in phase 1 and the restart leg would assert nothing
    val split = ev.agg(expr("percentile(ts, 0.05D)")).first().getDouble(0).toLong
    ev.filter($"ts" <= split).write.parquet(s"$dir/in")
    val schema = spark.read.parquet(s"$dir/in").schema
    val ckpt = s"$dir/ckpt"

    def runPhase(): Unit = {
      val stream = CdcStream.readFiles(spark, s"$dir/in", schema,
        maxFilesPerTrigger = 4)
      val done = CdcStream.funnelStream(stream, "user_id", "ts",
        "event_id", steps, windowUs)
      val q = done.writeStream.outputMode("append").format("parquet")
        .option("path", s"$dir/out").option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination(120000)
    }
    runPhase()
    val n1 = spark.read.parquet(s"$dir/out").count()
    ev.filter($"ts" > split).write.mode("append").parquet(s"$dir/in")
    runPhase()
    val all = spark.read.parquet(s"$dir/out")
    assert(n1 > 0 && all.count() > n1,
      "phase 2 must add completions (some span the restart)")

    // the accumulated completion facts ARE the batch funnel frame:
    // (key, k, t_k) for every non-null t_k — set-exact, not just counts
    val streamed = all.select($"__key", $"step", $"step_ts")
      .as[(Long, Int, Long)].collect().toSet
    val batchFrame = Temporal.funnel(ev, "user_id", "ts", steps, windowUs)
    val batch = batchFrame.collect().flatMap { r =>
      (1 to 3).flatMap { k =>
        val i = batchFrame.columns.indexOf(s"t$k")
        if (r.isNullAt(i)) Nil
        else Seq((r.getLong(0), k, r.getLong(i)))
      }
    }.toSet
    assert(streamed == batch,
      s"streamed ${streamed.size} completions, batch ${batch.size}")
  }

  test("validator config end-to-end from TOML") {
    spark.read.parquet(sf() + "/customer.parquet").createOrReplaceTempView("v_customer")
    val v = ConfigLoader.parseValidations("""
      [[validations]]
      query = "SELECT c_name FROM v_customer WHERE c_custkey < 10"
      column_to_check = "c_name"
      [validations.value_check_type]
      type = "Contains"
      value = "Customer#"
    """)
    assert(Validator.runOrThrow(spark, v))
  }
}
