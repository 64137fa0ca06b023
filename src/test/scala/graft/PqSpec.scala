package graft

import graft.functions.{PqEncodeExpr, PqLutExpr, PqTable}
import graft.operators.{Pq, Similarity}

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.Bridge

class PqSpec extends SparkTestBase {
  import spark.implicits._

  private def emb = spark.read.parquet(sf("sf0.001") + "/embeddings.parquet")

  test("training is deterministic and layout-invariant") {
    val a = Pq.train(emb.repartition(7), "vec_id", "embedding", m = 4, k = 8, iters = 2)
    val b = Pq.train(emb.repartition(3), "vec_id", "embedding", m = 4, k = 8, iters = 2)
    assert(a == b, "codebooks diverged across partition layouts")
    assert(a.m == 4 && a.k == 8 && a.subDim == 16 && a.dim == 64)
  }

  test("encode/LUT kernel parity: ADC distance == directly-computed quantized L2") {
    val cb = Pq.train(emb, "vec_id", "embedding", m = 4, k = 8, iters = 1)
    val rows = emb.limit(10)
      .select(col("vec_id"), col("embedding").cast("array<float>").as("v"))
      .select(col("vec_id"), col("v"),
        Bridge.column(PqEncodeExpr(Bridge.expression(col("v")), cb)).as("codes"),
        Bridge.column(PqLutExpr(Bridge.expression(col("v")), cb)).as("lut"))
      .as[(Long, Seq[Float], Seq[Int], Seq[Double])].collect()
    rows.foreach { case (id, v, codes, lut) =>
      assert(codes.length == 4 && lut.length == 32)
      // the LUT entry selected by a vector's OWN code is its distance
      // to its assigned codeword — recompute directly from the table
      codes.zipWithIndex.foreach { case (code, s) =>
        val cw = cb.table(s)(code)
        val direct = (0 until cb.subDim).map { i =>
          val d = v(s * cb.subDim + i).toDouble - cw(i); d * d
        }.sum
        assert(math.abs(lut(s * cb.k + code) - direct) < 1e-12,
          s"LUT diverged from direct distance at vec $id sub $s")
        // ...and it is the MINIMUM over the subspace's codewords
        // (nearest-codeword assignment), with ties to the lowest index
        val best = (0 until cb.k).map(c => lut(s * cb.k + c)).min
        assert(lut(s * cb.k + code) == best,
          s"encode picked a non-nearest codeword at vec $id sub $s")
      }
    }
  }

  test("dimension mismatch fails loudly, not silently") {
    val cb = new PqTable(Array.fill(4, 8)(Array.fill(16)(0f)))
    val bad = Seq((1L, Seq.fill(60)(0f))).toDF("id", "v")
      .select(Bridge.column(PqEncodeExpr(
        Bridge.expression(col("v").cast("array<float>")), cb)).as("c"))
    val e = intercept[Exception] { bad.collect() }
    assert(e.getMessage != null)
    intercept[IllegalArgumentException] { Pq.adcTopK(emb, emb, "vec_id",
      "embedding", k = 8, cb, rerank = 4) } // rerank window < k
  }

  test("recall@1 vs brute force on planted near-copies, and the compressed scan carries no vectors") {
    val queries = emb.filter(col("vec_id") < 8)
      .select((col("vec_id") + 500000).as("vec_id"),
        concat(array(element_at(col("embedding"), 1) + lit(0.015f)),
          slice(col("embedding"), 2, 100000)).as("embedding"))
    val cb = Pq.train(emb, "vec_id", "embedding", m = 4, k = 8, iters = 2)
    val pq = Pq.adcTopK(emb, queries, "vec_id", "embedding", k = 1, cb,
      rerank = 32)
    val brute = Similarity.bruteForceTopK(emb, queries, "vec_id", "embedding", 1)
    val pqTop = pq.select($"query_id", $"corpus_id").as[(Long, Long)].collect().toMap
    val bruteTop = brute.select($"query_id", $"corpus_id").as[(Long, Long)].collect().toMap
    assert(pqTop.size == 8 && pqTop == bruteTop,
      s"PQ top-1 diverged from brute force: $pqTop vs $bruteTop")
    // scale contract: the ADC scan side projects only (corpus_id, codes)
    val plan = pq.queryExecution.executedPlan.toString
    assert(plan.contains("pq_encode"), plan)
  }
  test("trained-model memo: second codebook/centroid fetch launches zero jobs") {
    val dir = sf("sf0.001")
    // warm (may train: 2 Lloyd passes each)
    val cb1 = graft.SparkEntry.pqCodebookFor(spark, dir)
    val cen1 = graft.SparkEntry.ivfCentroidsFor(spark, dir)
    @volatile var jobs = 0
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          js: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        jobs += 1
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      val cb2 = graft.SparkEntry.pqCodebookFor(spark, dir)
      val cen2 = graft.SparkEntry.ivfCentroidsFor(spark, dir)
      // same driver object, not a retrained equal one
      assert(cb2 eq cb1)
      assert(cen2 eq cen1)
      Bridge.flushListenerBus(spark.sparkContext) // deterministic drain
      assert(jobs == 0, s"memoized fetch launched $jobs Spark jobs")
    } finally spark.sparkContext.removeSparkListener(listener)
  }
}
