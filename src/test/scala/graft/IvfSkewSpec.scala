package graft

import graft.operators.{Ivf, Skew}

import org.apache.spark.sql.functions._

class IvfSkewSpec extends SparkTestBase {
  import spark.implicits._

  test("IVF: train deterministic, topK finds near-identical vectors") {
    val base = (0 until 40).map(i =>
      (0 until 32).map(d => math.sin(i * 32 + d).toFloat).toArray)
    val corpus = base.zipWithIndex.map { case (v, i) => (i.toLong, v) }.toDF("id", "v")
    val cent1 = Ivf.train(corpus, "id", "v", nlist = 8, iters = 2)
    val cent2 = Ivf.train(corpus, "id", "v", nlist = 8, iters = 2)
    assert(cent1.map(_.toSeq).toSeq == cent2.map(_.toSeq).toSeq, "training not deterministic")

    val queries = base.zipWithIndex.map { case (v, i) =>
      (100L + i, v.map(x => x + 0.0005f)) }.toDF("id", "v")
    val got = Ivf.topK(corpus, queries, "id", "v", k = 1, cent1, nprobe = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val hit = (0 until 40).count(i => got.get(100L + i).contains(i.toLong))
    assert(hit >= 38, s"recall@1 $hit/40")
  }

  test("IVF: sampled training (maxTrainRows) is deterministic and still clusters") {
    val emb = spark.read.parquet(sf() + "/embeddings.parquet")
    val c1 = Ivf.train(emb, "vec_id", "embedding", nlist = 8, iters = 1,
      maxTrainRows = 100)
    val c2 = Ivf.train(emb, "vec_id", "embedding", nlist = 8, iters = 1,
      maxTrainRows = 100)
    assert(c1.map(_.toSeq).toSeq == c2.map(_.toSeq).toSeq)
    val assigned = emb.select(Ivf.assign($"embedding", c1).as("c"))
      .groupBy("c").count().collect()
    assert(assigned.length > 2, "sampled training degenerated")
  }

  test("IVF assignment covers all rows exactly once") {
    val emb = spark.read.parquet(sf() + "/embeddings.parquet")
    val cent = Ivf.train(emb, "vec_id", "embedding", nlist = 16, iters = 1)
    val assigned = emb.select(Ivf.assign($"embedding", cent).as("c"))
    assert(assigned.count() == emb.count())
    val clusters = assigned.groupBy("c").count().collect()
    assert(clusters.forall(r => r.getInt(0) >= 0 && r.getInt(0) < 16))
    assert(clusters.length > 4, "degenerate clustering")
  }

  test("IvfIndex: build/load round-trip, pruned probing == retrain-and-query") {
    import graft.operators.IvfIndex
    val emb = spark.read.parquet(sf("sf0.001") + "/embeddings.parquet")
    val queries = emb.filter($"vec_id" < 5)
    val dir = java.nio.file.Files.createTempDirectory("ivf_idx").toString

    IvfIndex.build(emb, "vec_id", "embedding", dir, nlist = 16, iters = 2)
    val idx = IvfIndex.load(spark, dir)
    // centroids round-trip parquet floats EXACTLY
    val direct = Ivf.train(emb, "vec_id", "embedding", nlist = 16, iters = 2)
    assert(idx.centroids.length == 16 &&
      idx.centroids.zip(direct).forall { case (a, b) => a.sameElements(b) })

    // query via the persisted lists == retrain-and-query
    val viaIndex = IvfIndex.topK(idx, queries, "vec_id", "embedding",
        k = 1, nprobe = 2)
      .select("query_id", "corpus_id", "rank").collect().map(_.toSeq).toSet
    val viaTrain = Ivf.topK(emb, queries, "vec_id", "embedding",
        k = 1, direct, nprobe = 2)
      .select("query_id", "corpus_id", "rank").collect().map(_.toSeq).toSet
    assert(viaIndex == viaTrain && viaIndex.nonEmpty)

    // the scale property: only PROBED lists are read — the scan must
    // carry a cluster partition filter, not list every directory
    val plan = IvfIndex.topK(idx, queries, "vec_id", "embedding",
      k = 1, nprobe = 2).queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [cluster"),
      s"probe should prune list directories:\n$plan")
  }

  test("IvfIndex serving path: nprobe sweep is monotone, full recall at the oracle config") {
    // the serving-path twin of the retrain-path recall spec: recall is
    // measured on the LOADED index, so a save/load defect (clipped
    // floats, dropped list rows, broken partition pruning) surfaces as
    // a named recall shortfall. Probe sets are nested as nprobe grows,
    // so recall against the brute-force top-1 can only rise.
    import graft.operators.IvfIndex
    val emb = spark.read.parquet(sf("sf0.001") + "/embeddings.parquet")
    // q_ann_ivf_index's query shape: planted near-copies, offset ids
    val queries = emb.filter($"vec_id" < 5)
      .select(($"vec_id" + 200000).as("vec_id"),
        concat(array(element_at($"embedding", 1) + lit(0.02f)),
          slice($"embedding", 2, 100000)).as("embedding"))
    val dir = java.nio.file.Files.createTempDirectory("ivf_idx_recall").toString
    IvfIndex.build(emb, "vec_id", "embedding", dir, nlist = 16, iters = 2)
    val idx = IvfIndex.load(spark, dir)
    val brute = graft.operators.Similarity
      .bruteForceTopK(emb, queries, "vec_id", "embedding", k = 1)
      .select("query_id", "corpus_id").collect().map(_.toSeq).toSet
    assert(brute.size == 5)
    def recallAt(nprobe: Int): Double = {
      val got = IvfIndex.topK(idx, queries, "vec_id", "embedding",
          k = 1, nprobe = nprobe)
        .select("query_id", "corpus_id").collect().map(_.toSeq).toSet
      brute.intersect(got).size.toDouble / brute.size
    }
    val recalls = Seq(1, 2, 4).map(recallAt)
    assert(recalls.sliding(2).forall(w => w(0) <= w(1)),
      s"recall not monotone in nprobe: $recalls")
    // nprobe=2 is q_ann_ivf_index's oracle config — recall must be 1
    // there (and stay 1 above), or the driver row would be red
    assert(recalls(1) == 1.0 && recalls(2) == 1.0,
      s"recall below 1 at/above the oracle config: $recalls")
  }

  test("salted aggregates equal plain aggregates") {
    val ev = spark.read.parquet(sf() + "/events.parquet")
    val plainCount = ev.groupBy($"event_type").count()
      .as[(String, Long)].collect().toMap
    val salted = Skew.saltedCount(ev, Seq("event_type"), buckets = 16)
      .as[(String, Long)].collect().toMap
    assert(salted == plainCount)

    val plainSum = ev.groupBy($"event_type").agg(sum($"value"))
      .as[(String, Double)].collect().toMap
    val saltedSum = Skew.saltedSum(ev, Seq("event_type"), "value", buckets = 16)
      .as[(String, Double)].collect().toMap
    assert(saltedSum.keySet == plainSum.keySet)
    saltedSum.foreach { case (k, v) =>
      assert(math.abs(v - plainSum(k)) < 1e-6, s"$k: $v vs ${plainSum(k)}")
    }
  }

  test("salt is content-derived: stable across repartitionings (retry-safe)") {
    // monotonically_increasing_id-style salts change when a stage is
    // recomputed with a different row order; content hashes do not.
    // Repartitioning is a proxy for "the same rows arrive differently".
    val ev = spark.read.parquet(sf() + "/events.parquet")
    def buckets(df: org.apache.spark.sql.DataFrame) = df
      .withColumn("__salt", pmod(hash(df.columns.map(col).toIndexedSeq: _*), lit(16)))
      .select($"event_id", $"__salt").as[(Long, Int)].collect().toMap
    val a = buckets(ev)
    val b = buckets(ev.repartition(13))
    assert(a == b, "salt assignment must not depend on row placement")
  }

  test("salted join equals plain join") {
    val orders = spark.read.parquet(sf() + "/orders.parquet")
      .select($"o_orderkey", $"o_custkey")
    val customer = spark.read.parquet(sf() + "/customer.parquet")
      .select($"c_custkey".as("o_custkey"), $"c_mktsegment")
    val plain = orders.join(customer, "o_custkey")
    val salted = Skew.saltedJoin(orders, customer, "o_custkey", buckets = 4)
      .select(plain.columns.map(col).toIndexedSeq: _*)
    assert(salted.count() == plain.count())
    assert(salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty)
  }
}
