package graft

import graft.operators.{Ivf, IvfPqIndex, Pq, Similarity}

import org.apache.spark.sql.functions._

/** The persisted IVF-PQ serving artifact: build/write/load/query as a
  * whole cycle, checked against exact brute force — plus the two plan
  * properties that make it the 100 TB shape (directory pruning by
  * probed cluster; a codes-only ADC scan that never reads vec pages).
  */
class IvfPqIndexSpec extends SparkTestBase {
  import spark.implicits._

  private def emb = spark.read.parquet(sf("sf0.001") + "/embeddings.parquet")

  private def rmrf(f: java.io.File): Unit = {
    val kids = f.listFiles()
    if (kids != null) kids.foreach(rmrf)
    f.delete(); ()
  }

  private def queriesOf(df: org.apache.spark.sql.DataFrame) =
    df.filter(col("vec_id") < 8)
      .select((col("vec_id") + 500000).as("vec_id"),
        concat(array(element_at(col("embedding"), 1) + lit(0.015f)),
          slice(col("embedding"), 2, 100000)).as("embedding"))

  test("save/load/query cycle: loaded quantizers identical, top-k equals brute force") {
    val dir = java.nio.file.Files.createTempDirectory("ivfpq_spec").toString
    val coarse = Ivf.train(emb, "vec_id", "embedding", nlist = 16, iters = 2)
    val cb = Pq.train(emb, "vec_id", "embedding", m = 4, k = 8, iters = 2)
    IvfPqIndex.build(emb, "vec_id", "embedding", dir, coarse, cb)
    val idx = IvfPqIndex.load(spark, dir)
    // floats round-trip parquet exactly => the loaded quantizers ARE
    // the built ones (PqTable deep equality; centroid-wise compare)
    assert(idx.cb == cb, "codebook changed across save/load")
    assert(idx.centroids.map(_.toSeq).toSeq == coarse.map(_.toSeq).toSeq,
      "centroids changed across save/load")
    val got = IvfPqIndex.topK(idx, queriesOf(emb), "vec_id", "embedding",
        k = 2, nprobe = 2, rerank = 32)
      .select($"query_id", $"corpus_id", $"rank").as[(Long, Long, Int)]
      .collect().toSet
    val brute = Similarity.bruteForceTopK(emb, queriesOf(emb),
        "vec_id", "embedding", 2)
      .select($"query_id", $"corpus_id", $"rank").as[(Long, Long, Int)]
      .collect().toSet
    // k=2 over 8 planted queries: exactly 16 ranked rows — the
    // per-probe query duplication must not multiply re-rank rows
    assert(got.size == 16, s"expected 16 ranked rows, got ${got.size}")
    // exactness contract is rank-1 (the planted near-copy, cos ~0.999,
    // lands in the probed lists and survives quantization): rank 2 is
    // a ~0.5-cos background row that nprobe=2/16 legitimately may not
    // see — that approximation is the point of IVF, not a defect
    val gotTop = got.filter(_._3 == 1); val bruteTop = brute.filter(_._3 == 1)
    assert(gotTop == bruteTop,
      s"IVF-PQ index rank-1 diverged from brute force:\n$gotTop\nvs\n$bruteTop")
    rmrf(new java.io.File(dir))
  }

  test("append under frozen quantizers == full rebuild: list content and served top-k") {
    val dirInc = java.nio.file.Files.createTempDirectory("ivfpq_app").toString
    val dirFull = java.nio.file.Files.createTempDirectory("ivfpq_full").toString
    val coarse = Ivf.train(emb, "vec_id", "embedding", nlist = 16, iters = 2)
    val cb = Pq.train(emb, "vec_id", "embedding", m = 4, k = 8, iters = 2)
    // incremental: build the even half, append the odd half later
    IvfPqIndex.build(emb.filter($"vec_id" % 2 === 0), "vec_id", "embedding",
      dirInc, coarse, cb)
    IvfPqIndex.append(emb.filter($"vec_id" % 2 =!= 0), "vec_id", "embedding",
      dirInc)
    // reference: one build over the union corpus, same frozen models
    IvfPqIndex.build(emb, "vec_id", "embedding", dirFull, coarse, cb)

    def listRows(dir: String) = IvfPqIndex.load(spark, dir).lists
      .select($"cluster", $"id", $"codes", $"vec")
      .collect().map(r => (r.getInt(0), r.getLong(1),
        r.getSeq[Int](2), r.getSeq[Float](3))).toSet
    assert(listRows(dirInc) == listRows(dirFull),
      "appended inverted lists diverged from a full rebuild")

    def served(dir: String) = IvfPqIndex.topK(IvfPqIndex.load(spark, dir),
        queriesOf(emb), "vec_id", "embedding", k = 2, nprobe = 2, rerank = 32)
      .select($"query_id", $"corpus_id", $"cos", $"rank")
      .collect().map(_.toSeq).toSet
    assert(served(dirInc) == served(dirFull),
      "served top-k diverged between appended and rebuilt index")
    rmrf(new java.io.File(dirInc)); rmrf(new java.io.File(dirFull))
  }

  test("IvfIndex tombstones: deleted ids vanish from every k; compaction is result-identical and drops the side file") {
    import graft.operators.IvfIndex
    val emb = spark.read.parquet(sf("sf0.001") + "/embeddings.parquet")
    val dir = java.nio.file.Files.createTempDirectory("ivf_del").toString
    IvfIndex.build(emb, "vec_id", "embedding", dir, nlist = 8, iters = 2)
    val q = emb.filter($"vec_id" < 3)
      .select(($"vec_id" + 900000).as("vec_id"), $"embedding")
    def served(k: Int): Set[Long] =
      IvfIndex.topK(IvfIndex.load(spark, dir), q, "vec_id", "embedding",
          k = k, nprobe = 8)
        .select($"corpus_id").as[Long].collect().toSet
    // before deletion the nearest neighbors (the originals) are served
    val before = served(5)
    assert(before.exists(_ < 3))
    IvfIndex.markDeleted(emb.filter($"vec_id" < 3), "vec_id", dir)
    val afterAll = IvfIndex.topK(IvfIndex.load(spark, dir), q, "vec_id",
        "embedding", k = 500, nprobe = 8)
      .select($"corpus_id").as[Long].collect().toSet
    assert(afterAll.forall(_ >= 3), "tombstoned ids must never be served")
    val afterDelete = served(5)
    // compaction: identical results, tombstone file gone
    IvfIndex.compact(spark, dir)
    assert(served(5) == afterDelete)
    assert(!new java.io.File(s"$dir/tombstones.parquet").exists())
    // and the compacted lists physically dropped the rows
    assert(spark.read.parquet(s"$dir/lists.parquet")
      .filter($"id" < 3).count() == 0)
  }

  test("plan: probed-cluster directory pruning + codes-only ADC scan") {
    val dir = java.nio.file.Files.createTempDirectory("ivfpq_plan").toString
    IvfPqIndex.buildTrained(emb, "vec_id", "embedding", dir,
      nlist = 16, m = 4, k = 8, iters = 1)
    val idx = IvfPqIndex.load(spark, dir)
    val plan = IvfPqIndex.topK(idx, queriesOf(emb), "vec_id", "embedding",
      k = 1, nprobe = 2).queryExecution.executedPlan.toString
    // only PROBED list directories are listed/scanned
    assert(plan.contains("PartitionFilters: [cluster"),
      s"probe should prune list directories:\n$plan")
    // the ADC scan projects (id, codes): parquet must not read vec
    // pages for scored rows — that column stays for the re-rank scan
    val scans = plan.split('\n').filter(_.contains("ReadSchema"))
    assert(scans.exists(l => l.contains("codes") && !l.contains("vec")),
      s"no codes-only scan found — ADC side is reading vectors:\n$plan")
    rmrf(new java.io.File(dir))
  }
}
