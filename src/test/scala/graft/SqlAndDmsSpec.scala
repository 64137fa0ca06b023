package graft

import graft.fakegen.FakeGen
import graft.functions.registry
import graft.operators.CdcMerge
import graft.sources.DmsFiles

import org.apache.spark.sql.functions._

class SqlAndDmsSpec extends SparkTestBase {
  import spark.implicits._

  test("SQL surface: wrong input types fail ANALYSIS with a clear error") {
    registry.registerAll(spark)
    // strict ExpectsInputTypes: no silent int->string coercion followed
    // by a runtime ClassCastException deep in a 100 TB job
    for (bad <- Seq(
        "SELECT fake_email(42)",
        "SELECT minhash(123)",
        "SELECT cosine_sim('a', 'b')",
        "SELECT sig_agreement(array('x'), array('y'))",
        "SELECT rolling_fingerprint(7)")) {
      val e = intercept[org.apache.spark.sql.AnalysisException](spark.sql(bad))
      assert(e.getMessage.toLowerCase.contains("type"),
        s"$bad: expected a data-type mismatch, got: ${e.getMessage}")
    }
    // the typed column API still accepts non-strings via its explicit cast
    import graft.functions.anon
    val ok = spark.range(1).select(anon.fakeEmail(col("id")).as("e")).first()
    assert(ok.getString(0).nonEmpty)
  }

  test("SQL surface: hhi_ppm n = 0 is a LOUD contract error; n >= 1 unchanged") {
    registry.registerAll(spark)
    // a GROUP BY-produced (Σn², N) aggregate never emits N = 0, so a
    // zero divisor means the caller's frame is malformed — the old
    // silent greatest(n², 1) guard returned ss·1e6 (garbage the oracle
    // can't match); now it fails with a named error
    val e = intercept[Exception](spark.sql("SELECT hhi_ppm(5, 0)").collect())
    assert(e.getMessage.contains("n must be >= 1"))
    // in-contract inputs keep the exact self-switching arithmetic
    assert(spark.sql("SELECT hhi_ppm(8, 2) AS h").head().getLong(0) ===
      2000000L)
  }

  test("SQL surface: fakers, hashes, vectors callable from pure SQL") {
    registry.registerAll(spark)
    spark.read.parquet(sf() + "/customer.parquet").createOrReplaceTempView("sql_customer")
    val got = spark.sql("""
      SELECT c_custkey,
             fake_email(c_name) AS email,
             fake_email(c_name, 43) AS email_seed43,
             lang_id('the cat sat on the mat and it was happy') AS lang,
             simhash(c_name) AS sh,
             rolling_fingerprint(c_name) AS fp
      FROM sql_customer WHERE c_custkey < 3""").collect()
    assert(got(0).getString(1) == FakeGen.email("Customer#000000000", 42L))
    assert(got(0).getString(2) == FakeGen.email("Customer#000000000", 43L))
    assert(got(0).getString(2) != got(0).getString(1))
    assert(got(0).getString(3) == "en")
    val vec = spark.sql(
      "SELECT cosine_sim(array(1.0F, 0.0F), array(1.0F, 0.0F)) AS c, " +
      "vec_norm(array(3.0F, 4.0F)) AS n, " +
      "l2_distance(array(0.0F, 0.0F), array(3.0F, 4.0F)) AS d").first()
    assert(vec.getDouble(0) == 1.0 && vec.getDouble(1) == 5.0 && vec.getDouble(2) == 5.0)
    val mh = spark.sql(
      "SELECT sig_agreement(minhash('a b c d e'), minhash('a b c d e')) AS s").first()
    assert(mh.getDouble(0) == 1.0)
    // content-defined chunking from pure SQL: cuts -> exploded chunks
    // reconstruct the input (same pattern Chunking.contentDefined uses)
    val cc = spark.sql("""
      WITH d AS (SELECT 'the quick brown fox jumps over the lazy dog and keeps running onward' AS t),
      c AS (SELECT t, content_cuts(t, 8, 16) AS cuts FROM d)
      SELECT array_join(transform(cuts, (e, j) ->
        substr(t, IF(j = 0, 0, element_at(cuts, j)) + 1,
               e - IF(j = 0, 0, element_at(cuts, j)))), '') AS rebuilt, t
      FROM c""").first()
    assert(cc.getString(0) == cc.getString(1))
  }

  test("SQL surface: zorder_n matches the kernel; zorder2 equivalence at n=2") {
    registry.registerAll(spark)
    val r = spark.sql(
      "SELECT zorder_n(1L, 2L, 3L, 2) AS z3, " +
      "zorder_n(12345L, 67890L, 31) AS z2, zorder2(12345L, 67890L) AS z2ref")
      .collect()(0)
    assert(r.getLong(0) == 53L) // hand-computed in LayoutSpec
    assert(r.getLong(1) == r.getLong(2))
  }

  test("SQL surface: image_dhash + bit_count = hamming near-dup in pure SQL") {
    registry.registerAll(spark)
    // PNG recompression preserves pixels => identical hash, hamming 0
    val got = spark.sql(
      """SELECT bit_count(a.h.hi ^ b.h.hi) + bit_count(a.h.lo ^ b.h.lo) AS d,
        |       a.h.hi >= 0 AND a.h.lo >= 0 AS halves_non_negative
        |FROM (SELECT image_dhash(test_image(11L)) AS h) a,
        |     (SELECT image_dhash(test_image(11L)) AS h) b""".stripMargin)
      .as[(Long, Boolean)].head()
    assert(got == ((0L, true)))
  }

  test("SQL surface: remove_dup_grams matches removeDuplicatedNgrams row for row") {
    registry.registerAll(spark)
    val docs = spark.read.parquet(sf("sf0.001") + "/documents.parquet")
    val want = graft.operators.Dedup
      .removeDuplicatedNgrams(docs, "doc_id", "text", n = 5, minDocs = 2)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val got = SparkEntry.queries("q_substring_clean_sql")(spark, sf("sf0.001"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got.keySet == want.keySet)
    val diff = got.collect { case (k, v) if want(k) != v => k }
    assert(diff.isEmpty, s"SQL clean diverged on doc_ids: ${diff.take(5)}")
    // the clean actually removed something on this corpus (non-vacuous)
    val changed = docs.collect().map(r =>
      r.getAs[Long]("doc_id") -> r.getAs[String]("text")).toMap
    assert(got.exists { case (k, v) => v != changed(k) })
  }

  test("SQL surface: a full IVF ANN top-k in pure SQL matches the programmatic tier") {
    registry.registerAll(spark)
    import graft.operators.Ivf
    val emb = spark.read.parquet(sf("sf0.001") + "/embeddings.parquet")
    val queries = emb.filter(col("vec_id") < 5)
      .select((col("vec_id") + 200000).as("vec_id"),
        concat(array(element_at(col("embedding"), 1) + lit(0.02f)),
          slice(col("embedding"), 2, 100000)).as("embedding"))
    val cents = Ivf.train(emb, "vec_id", "embedding", nlist = 16, iters = 2)
    emb.createOrReplaceTempView("ann_corpus")
    queries.createOrReplaceTempView("ann_queries")
    cents.zipWithIndex.map { case (v, i) => (i, v.toSeq) }.toSeq
      .toDF("cluster", "vec").createOrReplaceTempView("ann_centroids")
    // the centroid table reaches the functions as a scalar subquery —
    // assembled DETERMINISTICALLY (array_sort over (cluster, vec)
    // structs), because the corpus-assign and query-probe subqueries
    // evaluate independently and must agree on cluster numbering
    val sqlOut = spark.sql("""
      WITH cent AS (
        SELECT transform(array_sort(collect_list(struct(cluster, vec))),
                         s -> s.vec) AS tab
        FROM ann_centroids),
      assigned AS (
        SELECT vec_id, embedding,
               nearest_centroid(embedding, (SELECT tab FROM cent)) AS cluster
        FROM ann_corpus),
      probes AS (
        SELECT vec_id, embedding,
               explode(nearest_centroids(embedding, (SELECT tab FROM cent), 2))
                 AS cluster
        FROM ann_queries),
      scored AS (
        SELECT p.vec_id AS query_id, c.vec_id AS corpus_id,
               cosine_sim(p.embedding, c.embedding) AS cos
        FROM probes p JOIN assigned c USING (cluster)
        WHERE p.vec_id != c.vec_id)
      SELECT query_id, corpus_id, cos, rank FROM (
        SELECT query_id, corpus_id, cos,
               ROW_NUMBER() OVER (PARTITION BY query_id
                                  ORDER BY cos DESC, corpus_id) AS rank
        FROM scored)
      WHERE rank <= 1""")
      .as[(Long, Long, Double, Int)].collect().toSet
    val prog = Ivf.topK(emb, queries, "vec_id", "embedding",
        k = 1, cents, nprobe = 2)
      .as[(Long, Long, Double, Int)].collect().toSet
    assert(sqlOut == prog, s"SQL ANN diverged from Ivf.topK:\n$sqlOut\nvs\n$prog")
    assert(sqlOut.size == 5, "every planted query must rank a neighbor")
  }

  test("DMS file-set: listing modes + snapshot reconstruction") {
    val dir = java.nio.file.Files.createTempDirectory("graft_dms").toString
    val orders = spark.read.parquet(sf() + "/orders.parquet")

    // two LOAD halves + one CDC batch with U and D ops
    orders.filter($"o_orderkey" % 2 === 0).coalesce(1)
      .write.parquet(s"$dir/tmp_load1")
    orders.filter($"o_orderkey" % 2 === 1).coalesce(1)
      .write.parquet(s"$dir/tmp_load2")
    val updates = orders.filter($"o_orderkey" % 5 === 0)
      .withColumn("o_totalprice", lit(0.0))
      .withColumn(CdcMerge.OpColumn, lit("U"))
      .withColumn(CdcMerge.TsColumn, lit(10L))
    val deletes = orders.filter($"o_orderkey" % 7 === 0)
      .withColumn(CdcMerge.OpColumn, lit("D"))
      .withColumn(CdcMerge.TsColumn, lit(20L))
    updates.unionByName(deletes).coalesce(1).write.parquet(s"$dir/tmp_cdc")

    def promote(tmp: String, name: String): Unit = {
      val src = new java.io.File(s"$dir/$tmp").listFiles()
        .find(_.getName.endsWith(".parquet")).get
      java.nio.file.Files.move(src.toPath, java.nio.file.Paths.get(dir, name))
    }
    promote("tmp_load1", "LOAD00000001.parquet")
    promote("tmp_load2", "LOAD00000002.parquet")
    promote("tmp_cdc", "20240102-000000001.parquet")

    val fullOnly = DmsFiles.list(spark, dir, DmsFiles.FullLoadOnly)
    assert(fullOnly.loadFiles.size == 2 && fullOnly.cdcFiles.isEmpty)
    val dated = DmsFiles.list(spark, dir, DmsFiles.DateAware(Some("20240101"), Some("20240103")))
    assert(dated.cdcFiles.size == 1)
    val outOfWindow = DmsFiles.list(spark, dir, DmsFiles.DateAware(Some("20240201"), None))
    assert(outOfWindow.cdcFiles.isEmpty)
    // datetime BOUNDS compare as their 8-digit DATE (pre-truncation,
    // the extra time digits lexicographically excluded in-window files)
    val datetimeBound = DmsFiles.list(spark, dir,
      DmsFiles.DateAware(Some("2024-01-01 09:15"), Some("2024-01-03 18:00")))
    assert(datetimeBound.cdcFiles.size == 1)

    val snap = DmsFiles.snapshot(spark, dir, pk = Seq("o_orderkey"))
    val total = orders.count()
    val deleted = orders.filter($"o_orderkey" % 7 === 0).count()
    assert(snap.count() == total - deleted)
    // updated (and not deleted) rows carry the new price
    assert(snap.filter($"o_orderkey" % 5 === 0).agg(max($"o_totalprice")).first().getDouble(0) == 0.0)
    // untouched rows unchanged
    val untouched = snap.filter($"o_orderkey" % 5 =!= 0 && $"o_orderkey" % 7 =!= 0)
    val expected = orders.filter($"o_orderkey" % 5 =!= 0 && $"o_orderkey" % 7 =!= 0)
    assert(untouched.exceptAll(expected).isEmpty && expected.exceptAll(untouched).isEmpty)
  }

  test("DMS snapshot: schema drift detected") {
    val dir = java.nio.file.Files.createTempDirectory("graft_dms2").toString
    val region = spark.read.parquet(sf() + "/region.parquet")
    region.coalesce(1).write.parquet(s"$dir/tmp")
    val src = new java.io.File(s"$dir/tmp").listFiles()
      .find(_.getName.endsWith(".parquet")).get
    java.nio.file.Files.move(src.toPath,
      java.nio.file.Paths.get(dir, "LOAD00000001.parquet"))
    intercept[IllegalStateException] {
      DmsFiles.snapshot(spark, dir, pk = Seq("r_regionkey"),
        expectedColumns = Some(Set("r_regionkey"))) // r_name is drift
    }
  }
}
