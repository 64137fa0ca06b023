package graft

/** Physical-plan regression guards: the properties that make these
  * operators scale are asserted, not assumed (prompt: ".explain the
  * plan and iterate until it's the plan you'd want").
  */
class PlanAuditSpec extends SparkTestBase {

  private def planOf(q: String): String = {
    val df = SparkEntry.queries(q)(spark, sf("sf0.01"))
    df.queryExecution.executedPlan.toString
  }

  test("whole surface: no UDF, no python barrier, no unbounded cartesian in ANY query plan") {
    // The blanket scale-hygiene sweep: every one of the ~100 public
    // queries must plan without a ScalaUDF (kills whole-stage codegen),
    // a python eval barrier, or a CartesianProduct (the unbounded
    // all-pairs shape). BroadcastNestedLoopJoin is allowed ONLY where
    // it is the intended plan: the two linear-scan ANN tiers (the
    // brute-force baseline and the PQ compressed-domain ADC scan — a
    // deliberate full scan over m-byte codes, not raw vectors), and
    // the SINGLE-ROW global-stats broadcast pattern (a scalar attach —
    // corpus x 1 row, not all-pairs; the operator keeps its stats
    // distributed instead of collecting them to the driver):
    // q_bm25_score's corpus stats, q_histogram's + q_skyline's min/max
    // bounds, q_pmi_collocations' token total, q_mix_top_p's token
    // total, q_cusum's series mean. q_t_closeness broadcasts the
    // sensitive-category DOMAIN (a handful of rows) to densify the
    // group x category frame — domain-bounded, not corpus-bounded.
    // Every other approximate tier must bucket-join.
    val bnljAllowed = Set("q_ann_topk", "q_ann_filtered", "q_ann_pq",
      "q_bm25_score",
      "q_histogram", "q_skyline", "q_pmi_collocations", "q_mix_top_p",
      "q_benford", "q_image_search", "q_hard_negatives", "q_balance_labels",
      "q_class_terms", "q_cusum", "q_rfm", "q_t_closeness", "q_recommend",
      "q_churn", "q_power_users", "q_dist_drift")
    val offenders = scala.collection.mutable.Buffer.empty[String]
    for ((name, fn) <- SparkEntry.queries.toSeq.sortBy(_._1)) {
      // candidate-scope bracket: dedup-tier queries materialize shared
      // candidate sets eagerly at CONSTRUCTION; release them per query
      // so the sweep doesn't accrete CacheManager entries
      graft.operators.Dedup.withCandidateScope {
        val plan = fn(spark, sf("sf0.01")).queryExecution.executedPlan.toString
        if (plan.contains("ScalaUDF")) offenders += s"$name: ScalaUDF"
        if (plan.contains("BatchEvalPython")) offenders += s"$name: python barrier"
        if (plan.contains("CartesianProduct")) offenders += s"$name: cartesian"
        if (plan.contains("BroadcastNestedLoopJoin") && !bnljAllowed(name))
          offenders += s"$name: unexpected nested-loop join"
      }
    }
    assert(offenders.isEmpty, s"plan hygiene violations:\n${offenders.mkString("\n")}")
  }

  test("single-exchange operators really plan one hash exchange") {
    // the scaladoc claims these reuse one key partitioning end to end
    // (madOutliers: both percentile windows + the final groupBy; scd2:
    // collapse lag + interval lead; ewma: all lags in one frame) —
    // assert it so a refactor that silently adds a shuffle fails here
    for (q <- Seq("q_mad_outliers", "q_cdc_scd2", "q_ewma")) {
      val plan = planOf(q)
      val n = plan.linesIterator.count(_.contains("Exchange hashpartitioning"))
      assert(n == 1, s"$q: expected 1 hash exchange, got $n:\n$plan")
    }
  }

  test("filter queries push predicates into the parquet scan") {
    for (q <- Seq("q_filter_startswith", "q_filter_equals", "q_filter_contains")) {
      val plan = planOf(q)
      assert(plan.contains("PushedFilters: ["), s"$q plan lacks pushdown:\n$plan")
      assert(!plan.contains("PushedFilters: []"), s"$q pushed nothing:\n$plan")
    }
  }

  test("projection queries prune columns at the scan") {
    val plan = planOf("q_fake_email") // selects 2 of 5 customer columns
    val readSchema = plan.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(readSchema.contains("c_custkey") && readSchema.contains("c_name"))
    assert(!readSchema.contains("c_acctbal") && !readSchema.contains("c_mktsegment"),
      s"scan reads pruned columns: $readSchema")
  }

  test("dimension join broadcasts the small side") {
    assert(planOf("q_join_agg").contains("BroadcastHashJoin"))
    assert(planOf("q_ann_topk").contains("BroadcastNestedLoopJoin") ||
           planOf("q_ann_topk").contains("BroadcastHashJoin"))
  }

  test("faker pipeline is one WholeStageCodegen over the scan (no UDF barrier)") {
    // entry() is the faker-bearing pipeline (q_anonymize_pipeline is the
    // SQL-expressible spine variant since r3, with no fake_* exprs)
    val plan = SparkEntry.entry(spark).queryExecution.executedPlan.toString
    assert(!plan.contains("BatchEvalPython") && !plan.contains("ScalaUDF"), plan)
    // '*(n)' prefixes mark WholeStageCodegen stages; the faker Project
    // must be inside one
    assert(plan.linesIterator.exists(l => l.contains("*(") && l.contains("fake_name")),
      s"faker projection not codegen'd:\n$plan")
  }

  test("aggregations are partial (map-side combine before the shuffle)") {
    val plan = planOf("q1_agg")
    // HashAggregate(partial) -> Exchange -> HashAggregate(final)
    assert(plan.contains("partial_sum") || plan.contains("partial_count"),
      s"no map-side partial aggregation:\n$plan")
  }

  test("embedding dedup runs as bucket equi-joins, never a cartesian") {
    for (q <- Seq("q_dedup_embedding", "q_dedup_embedding_lsh")) {
      val plan = planOf(q)
      assert(!plan.contains("CartesianProduct"), s"$q has a cartesian:\n$plan")
      assert(!plan.contains("BroadcastNestedLoopJoin"),
        s"$q has a nested-loop join:\n$plan")
    }
  }

  test("q_topk_rewrite plans as rule-inserted TopKPerKey; q_window_topk keeps its Window") {
    val rewritten = planOf("q_topk_rewrite")
    assert(rewritten.contains("TopKPerKey"),
      s"rule did not insert the heap operator:\n$rewritten")
    assert(!rewritten.contains("Window"),
      s"window survived the rewrite:\n$rewritten")
    // selecting rn makes the rewrite observable => rule must decline
    val kept = planOf("q_window_topk")
    assert(kept.contains("Window") && !kept.contains("TopKPerKey"),
      s"rule fired on a rank-keeping query:\n$kept")
  }

  test("ensureParallelism declines on a healthy multi-file scan: same plan, no Exchange") {
    import org.apache.spark.sql.functions.col
    val dir = java.nio.file.Files.createTempDirectory("healthy_scan").toString
    spark.range(1000).toDF("id").repartition(4).write.mode("overwrite").parquet(dir)
    val scan = spark.read.parquet(dir)
    val obs = graft.operators.Repartitioning.scanPartitions(scan)
    assert(obs >= 2, s"fixture must be multi-split, got $obs") // target = ceil(4*0.5) = 2
    val out = graft.operators.Repartitioning.ensureParallelism(scan, col("id"))
    assert(out eq scan, "healthy layout must return the identical DataFrame object")
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"healthy scan grew an exchange:\n$plan")
  }

  test("healthy multi-file documents dir: dedup spine inserts no repartition") {
    // the 100x layout in miniature: the REAL documents table written as
    // 32 part-files (at production scale the file count does this by
    // itself). Split-packing params pinned so each part-file is its own
    // split, as 128MB+ files would be at real scale — otherwise the
    // tiny fixtures coalesce into one split and the case proves nothing.
    import org.apache.spark.sql.functions.col
    val dir = java.nio.file.Files.createTempDirectory("docs_multifile").toString
    spark.read.parquet(sf("sf0.01") + "/documents.parquet")
      .repartition(32).write.mode("overwrite").parquet(dir)
    val conf = Seq("spark.sql.files.maxPartitionBytes" -> "1m",
                   "spark.sql.files.openCostInBytes" -> "1m")
    val prev = conf.map { case (k, _) => spark.conf.getOption(k) }
    conf.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val docs = spark.read.parquet(dir)
      val cores = spark.sparkContext.defaultParallelism
      val splits = graft.operators.Repartitioning.scanPartitions(docs)
      assert(splits >= cores,
        s"multi-file dir must out-split the $cores cores, got $splits")
      // the gate must DECLINE: healthy layout, identical object back
      val repaired = graft.operators.Repartitioning
        .ensureParallelism(docs, col("doc_id"))
      assert(repaired eq docs, "gate repartitioned a healthy layout")
      // and the full dedup spine planned over it carries no inserted
      // repartition — its only exchanges are the operator's own
      // (banding/aggregate shuffles), not a full-input repair
      val spine = graft.operators.Dedup
        .minhashVerifiedPairs(repaired, "doc_id", "text")
      val plan = spine.queryExecution.executedPlan.toString
      assert(!plan.contains("REPARTITION_BY_COL"),
        s"dedup spine over a healthy multi-file scan grew a repartition:\n$plan")
    } finally prev.zip(conf).foreach { case (old, (k, _)) =>
      old match { case Some(v) => spark.conf.set(k, v)
                  case None => spark.conf.unset(k) }
    }
  }

  test("ensureParallelism repairs a starved single-file scan: repartition fires") {
    import org.apache.spark.sql.functions.col
    val scan = spark.read.parquet(sf("sf0.001") + "/documents.parquet")
    assert(graft.operators.Repartitioning.scanPartitions(scan) === 1,
      "testdata documents must be a single split for this case to bite")
    val out = graft.operators.Repartitioning.ensureParallelism(scan, col("doc_id"))
    assert(!(out eq scan))
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("Exchange hashpartitioning(doc_id"),
      s"starved scan not repartitioned by key:\n$plan")
  }

  test("scanPartitions counts DSv2 BatchScan leaves (v1 disabled) like v1 scans") {
    val key = "spark.sql.sources.useV1SourceList"
    val prev = spark.conf.get(key,
      "avro,csv,json,kafka,orc,parquet,text")
    spark.conf.set(key, "")
    try {
      val scan = spark.read.parquet(sf("sf0.001") + "/documents.parquet")
      val plan = scan.queryExecution.sparkPlan.toString
      assert(plan.contains("BatchScan"), s"fixture is not a v2 scan:\n$plan")
      assert(graft.operators.Repartitioning.scanPartitions(scan) === 1,
        "v2 single-file scan must report its real split count, not MaxValue")
    } finally spark.conf.set(key, prev)
  }

  test("ensureParallelism declines on non-file sources (no scan leaf => never starved)") {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    val mem = Seq(1, 2, 3).toDF("id").coalesce(1)
    assert(graft.operators.Repartitioning.scanPartitions(mem) === Int.MaxValue)
    assert(graft.operators.Repartitioning.ensureParallelism(mem, col("id")) eq mem)
  }

  test("contaminationPairs construction: zero jobs with checkDisjoint=false") {
    import org.apache.spark.sql.functions.col
    val docs = spark.read.parquet(sf("sf0.01") + "/documents.parquet")
    @volatile var jobs = 0
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          js: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        jobs += 1
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      // library-caller shape: disjoint ids by construction => no guard
      // scan, no checkpoint job — PLAN CONSTRUCTION is free; PlanDump /
      // Bench / plan-only tooling stop paying a corpus scan per call
      val pairs = graft.operators.Dedup.contaminationPairs(
        docs.filter(col("doc_id") >= 20), docs.filter(col("doc_id") < 20),
        "doc_id", "text", checkDisjoint = false)
      org.apache.spark.sql.graftbridge.Bridge.flushListenerBus(spark.sparkContext)
      assert(jobs === 0,
        s"plan construction launched $jobs job(s) with checkDisjoint=false")
      // the default keeps the guard: id overlap must still be caught
      val overlap = intercept[IllegalArgumentException] {
        graft.operators.Dedup.contaminationPairs(
          docs, docs.filter(col("doc_id") < 20), "doc_id", "text")
      }
      assert(overlap.getMessage.contains("disjoint"))
      // and the constructed plan still computes: the planted eval split
      // must flag at least one contaminated doc when executed
      assert(pairs.limit(1).count() === 1L)
    } finally spark.sparkContext.removeSparkListener(listener)
  }

  test("cdc latest-per-key: max_by aggregate with map-side combine on one PK shuffle") {
    val plan = planOf("q_cdc_latest_per_key")
    assert(plan.contains("hashpartitioning(user_id"),
      s"latest-per-key should hash-partition by PK:\n$plan")
    // partial (map-side) combine BELOW the exchange: a CDC delta repeats
    // hot PKs, so the shuffle must carry per-partition winners, not rows
    assert(plan.indexOf("partial_max_by") > plan.indexOf("Exchange hashpartitioning"),
      s"expected partial max_by below the PK exchange:\n$plan")
    assert(!plan.contains("Window"), s"window formulation should be gone:\n$plan")
  }
}
