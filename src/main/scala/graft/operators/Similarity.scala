package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.vectors

/** Approximate-nearest-neighbor search over an embedding column
  * (`array<float>`).
  *
  * Two tiers:
  *  - [[bruteForceTopK]]: exact cosine top-k; the correctness baseline.
  *    Query side is broadcast (queries << corpus), so the corpus is
  *    scanned once with NO shuffle of the vectors; only (queryId,
  *    corpusId, cos) tuples shuffle for the per-query top-k window.
  *  - [[lshTopK]]: random-hyperplane LSH bucketing; corpus hashed once,
  *    candidates only from matching buckets (multi-probe over all
  *    1-bit-flip neighbors for recall). The 100 TB path: bucket join
  *    instead of cross product.
  */
object Similarity {

  /** Rank the (already top-k-selected) candidates: selection happens in
    * the sort-free custom operator over ALL scored pairs; the window
    * then orders only queries x k rows — never the full score matrix. */
  private[operators] def selectAndRank(scored: DataFrame, k: Int): DataFrame = {
    val top = graft.plans.TopK.perKey(
      scored.select(col("query_id"), col("corpus_id"), col("cos")),
      Seq("query_id"), Seq(("cos", false), ("corpus_id", true)), k)
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("corpus_id").asc)
    top.withColumn("rank", row_number().over(w))
      .select(col("query_id"), col("corpus_id"), col("cos"), col("rank"))
  }

  /** Exact top-k neighbors per query vector by cosine similarity.
    * Deterministic: ties break on corpus id asc. Excludes self-matches
    * when ids collide. */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame,
                     idCol: String, vecCol: String, k: Int): DataFrame = {
    val c = corpus.select(col(idCol).as("corpus_id"), col(vecCol).as("cv"))
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"))
    val scored = c.join(broadcast(q), col("query_id") =!= col("corpus_id"))
      .withColumn("cos", vectors.cosine(col("qv"), col("cv")))
    selectAndRank(scored, k)
  }

  /** Hard-negative mining for contrastive training (the in-batch /
    * BM25-negative upgrade every dual-encoder recipe needs): per query
    * vector, the k most similar corpus vectors whose LABEL differs —
    * near the query in embedding space but semantically wrong, exactly
    * the negatives that sharpen a contrastive loss. Same brute exact
    * tier as [[bruteForceTopK]] (the label predicate rides the join),
    * same bounded-heap selection; for corpus scale swap the scored
    * join for the IVF probe and keep the label filter. */
  def hardNegatives(corpus: DataFrame, queries: DataFrame, idCol: String,
                    vecCol: String, labelCol: String, k: Int): DataFrame = {
    val c = corpus.select(col(idCol).as("corpus_id"), col(vecCol).as("cv"),
      col(labelCol).as("__cl"))
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"),
      col(labelCol).as("__ql"))
    val scored = c.join(broadcast(q),
        col("query_id") =!= col("corpus_id") && col("__cl") =!= col("__ql"))
      .withColumn("cos", vectors.cosine(col("qv"), col("cv")))
    selectAndRank(scored, k)
  }

  /** Exact top-k by INTEGER dot product over `scale`-clamped quantized
    * codes — the compressed-domain retrieval baseline whose quality
    * [[Eval.recallAtK]] measures against [[bruteForceTopK]]. Scoring is
    * all-BIGINT (dim terms of at most scale² each), so the ranking is
    * engine-bit-exact with ties broken by corpus id; at coarse scales
    * (e.g. 7 = int4-style) recall < 1 and the eval tier quantifies the
    * quantization cost. Same bounded-heap selection as the float tier. */
  def quantizedTopK(corpus: DataFrame, queries: DataFrame,
                    idCol: String, vecCol: String, k: Int,
                    scale: Int = 127): DataFrame = {
    val c = corpus.select(col(idCol).as("corpus_id"),
      vectors.quantize(vecCol, scale).as("ca"))
    val q = queries.select(col(idCol).as("query_id"),
      vectors.quantize(vecCol, scale).as("qa"))
    val scored = c.join(broadcast(q), col("query_id") =!= col("corpus_id"))
      .withColumn("dot", expr("aggregate(zip_with(qa, ca, (x, y) -> x * y), " +
        "CAST(0 AS BIGINT), (a, x) -> a + x)"))
    val top = graft.plans.TopK.perKey(
      scored.select(col("query_id"), col("corpus_id"), col("dot")),
      Seq("query_id"), Seq(("dot", false), ("corpus_id", true)), k)
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("dot").desc, col("corpus_id").asc)
    top.withColumn("rank", row_number().over(w))
      .select(col("query_id"), col("corpus_id"), col("dot"), col("rank"))
  }

  /** LSH-bucketed ANN top-k: corpus bucketed by `nBits` hyperplane sign
    * bits; each query probes its own bucket plus all single-bit-flip
    * neighbors (multi-probe), then exact cosine re-ranks candidates.
    * Recall < 1 by construction; compare against [[bruteForceTopK]] to
    * measure. */
  def lshTopK(corpus: DataFrame, queries: DataFrame,
              idCol: String, vecCol: String, k: Int,
              nBits: Int = 12, seed: Long = 42L,
              probeHamming: Int = 1): DataFrame = {
    val c = corpus.select(col(idCol).as("corpus_id"), col(vecCol).as("cv"),
      vectors.hyperplaneBucket(col(vecCol), nBits, seed).as("bucket"))
    // evaluate the bucket kernel ONCE per query; probe buckets are all
    // <=probeHamming-bit XOR flips of it (shared generator with the
    // pre-counted fan-out cap)
    val masks: Seq[Long] = ProbeMasks.masks(nBits, probeHamming)
    val q = queries
      .select(col(idCol).as("query_id"), col(vecCol).as("qv"),
        vectors.hyperplaneBucket(col(vecCol), nBits, seed).as("qbucket"))
      .select(col("query_id"), col("qv"),
        explode(array(masks.map(m => col("qbucket").bitwiseXOR(lit(m))): _*)).as("bucket"))
    // no pair dedup needed: distinct probe masks give distinct probe
    // buckets, and a corpus row lives in exactly ONE bucket, so each
    // (query, corpus) pair meets at most once — the dropDuplicates this
    // used to carry shuffled the full candidate set WITH both vectors
    // for zero removed rows (r4 review finding)
    val scored = c.join(q, Seq("bucket"))
      .filter(col("query_id") =!= col("corpus_id"))
      .withColumn("cos", vectors.cosine(col("qv"), col("cv")))
    selectAndRank(scored, k)
  }

  /** Label-outlier mining (Confident-Learning-style label-error
    * candidates): distance of every vector to its label's centroid, in
    * EXACT integer arithmetic over int8-quantized codes — centroid
    * division is avoided by scaling each code by the member count
    * (dist_sc = Σ_pos (code·n − Σcodes)²), so the ranking is
    * engine-bit-exact. The per-(label, pos) centroid table is tiny
    * (|labels|·dim rows) and broadcasts; everything else is linear in
    * rows·dim. Top-k per label by the (dist desc, id asc) total order. */
  def labelOutliers(df: DataFrame, idCol: String, labelCol: String,
      vecCol: String, k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val e = df
      .withColumn("__qq", graft.functions.vectors.quantizeInt8(vecCol))
      .select(col(idCol), col(labelCol),
        posexplode(col("__qq")).as(Seq("__pos", "__code")))
    val c = e.groupBy(col(labelCol), col("__pos"))
      .agg(sum(col("__code")).as("__csum"), count(lit(1)).as("__n"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(labelCol))
      .orderBy(col("dist_sc").desc, col(idCol).asc)
    e.join(broadcast(c), Seq(labelCol, "__pos"))
      .withColumn("__t", col("__code") * col("__n") - col("__csum"))
      .groupBy(col(idCol), col(labelCol))
      .agg(sum(col("__t") * col("__t")).as("dist_sc"))
      .withColumn("out_rank", rank().over(w).cast("long"))
      .filter(col("out_rank") <= k)
  }

  /** Filtered vector search — the vector-DB "filtered ANN" feature:
    * a metadata predicate pushed INSIDE the search, pruning the corpus
    * BEFORE any scoring work (never post-filtering a top-k, which
    * under-fills k). On this exact tier the filter cuts the scored
    * join; on the IVF path the same predicate rides the probe scan. */
  def filteredTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, pred: Column, k: Int): DataFrame =
    bruteForceTopK(corpus.filter(pred), queries, idCol, vecCol, k)

  /** Pairwise cosine similarity between per-label centroids, in ppm —
    * the corpus-mix geometry report (which label clusters sit close).
    *
    * Cosine is scale-invariant, so the centroid can be the exact
    * integer MEAN of the 1e6-quantized elements (floor(x·1e6 + 0.5)
    * is exact from float32 in any engine): the mean keeps every
    * element under ~1e6 in magnitude, so the dim-bounded dot products
    * stay BIGINT-exact at ANY corpus scale — the corpus-size-dependent
    * raw sums never meet a multiplication. The mean division is made
    * floor-vs-truncate-proof by shifting the numerator nonnegative
    * first (unit-scale elements, so +1e6·cnt suffices); positive
    * integer division agrees across engines.
    *
    * Scale shape: one map-side-combined (label, pos) aggregation
    * bounds everything at labels·dim rows; the pairwise stage is a
    * self-join of that tiny table (AQE broadcasts it). The final
    * cos_ppm is one same-order IEEE step over exact integers, so the
    * oracle replays it bit-for-bit. */
  /** Nearest-centroid classification confusion matrix — the "is the
    * embedding space linearly organized by label" health check a
    * labeled corpus gets before anyone trains on it. Every vector is
    * assigned to the label whose centroid is L2-closest (resubstitution:
    * each vector contributes to its own label's centroid), and the
    * (true_label, predicted_label, n) cells come back — |labels|² rows
    * at most. All-integer: the same scaled-mean centroid discipline as
    * [[labelCentroidCosine]] and EXACT BIGINT squared distances, so the
    * argmin (ties by label asc) is engine-bit-exact. Scale shape: the
    * centroid table is |labels|·dim rows (broadcasts); scoring is one
    * equi-join on the position key + a rows·dim·|labels| linear pass —
    * no pairwise vector join anywhere. */
  def nearestCentroidConfusion(df: DataFrame, idCol: String,
                               labelCol: String, vecCol: String): DataFrame =
    nearestCentroid(df, idCol, labelCol, vecCol)
      .groupBy(col("true_label"), col("clabel").as("predicted_label"))
      .agg(count(lit(1)).as("n"))

  /** Per-vector exact L2 distances to every label centroid:
    * (id, true_label, clabel, __dist). Shared engine of the confusion
    * matrix and the calibration curve. */
  private def centroidDistances(df: DataFrame, idCol: String,
                                labelCol: String,
                                vecCol: String): DataFrame = {
    val q = df.select(col(idCol).as("id"), col(labelCol).as("true_label"),
      posexplode(transform(col(vecCol),
        x => floor(x.cast("double") * 1e6 + 0.5).cast("long")))
        .as(Seq("pos", "qv")))
    val cent = q.groupBy(col("true_label"), col("pos"))
      .agg(sum(col("qv")).as("__s"), count(lit(1)).as("__cnt"))
      .withColumn("m",
        expr("(__s + 1000000 * __cnt) div __cnt - 1000000"))
      .select(col("true_label").as("clabel"), col("pos"), col("m"))
    q.join(broadcast(cent), Seq("pos"))
      .groupBy(col("id"), col("true_label"), col("clabel"))
      .agg(sum((col("qv") - col("m")) * (col("qv") - col("m"))).as("__dist"))
  }

  /** Each vector's nearest centroid: (id, true_label, clabel, __dist)
    * at rank 1 of the (dist asc, label asc) total order. */
  private def nearestCentroid(df: DataFrame, idCol: String,
                              labelCol: String, vecCol: String): DataFrame = {
    val w = Window.partitionBy(col("id"))
      .orderBy(col("__dist").asc, col("clabel").asc)
    centroidDistances(df, idCol, labelCol, vecCol)
      .withColumn("__rk", row_number().over(w))
      .filter(col("__rk") === 1)
      .drop("__rk")
  }

  /** Reliability curve of the nearest-centroid classifier: vectors
    * sorted by their top-1 distance (most-confident first) and split
    * into `bins` equal-count bins; per bin the accuracy in ppm plus
    * the distance range. A healthy label space shows accuracy
    * decaying with distance — a flat curve means the distance carries
    * no signal. The corpus-wide rank is DISTRIBUTED
    * ([[Analytics.bucketedGroupRank]] under a constant group), so no
    * corpus-sized window serializes into one task; bin boundaries are
    * exact-integer rank arithmetic ((rank-1)·bins div n), replayed
    * verbatim by the oracle.
    *
    * Eager + scope-bound: construction launches Spark jobs (Dedup.materializeShared
    * inside); when built inside a withCandidateScope, the terminal action must
    * run before scope exit or the materialized blocks are already freed. */
  def centroidCalibration(df: DataFrame, idCol: String, labelCol: String,
                          vecCol: String, bins: Int = 10): DataFrame = {
    require(bins >= 1, s"bins must be >= 1, got $bins")
    // bucketedGroupRank makes THREE passes over its input, and here
    // that input is the nearest-centroid distance kernel (a per-vector
    // scan over every centroid) — materialize it once so the kernel
    // runs once, not per pass. Call-site cut, not an operator-wide one:
    // the rank operator's other callers feed it cheap scans where a
    // write would cost more than the re-read (the r12/wave-4 A/Bs).
    val top = Dedup.materializeShared(
      nearestCentroid(df, idCol, labelCol, vecCol)
        .withColumn("__g", lit(0)))
    val ranked = Analytics.bucketedGroupRank(top, "__g", "__dist",
      tieCols = Seq("id"))
    ranked
      .withColumn("bin", expr(s"(__rank - 1) * $bins div __gn"))
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("n"),
        count(when(col("clabel") === col("true_label"), 1)).as("n_correct"),
        min(col("__dist")).as("lo_dist"),
        max(col("__dist")).as("hi_dist"))
      .withColumn("acc_ppm", expr("n_correct * 1000000 div n"))
  }

  def labelCentroidCosine(df: DataFrame, labelCol: String,
                          vecCol: String): DataFrame = {
    val q = df.select(col(labelCol).as("label"),
      posexplode(transform(col(vecCol),
        x => floor(x.cast("double") * 1e6 + 0.5).cast("long")))
        .as(Seq("pos", "qv")))
    val c = q.groupBy(col("label"), col("pos"))
      .agg(sum(col("qv")).as("__s"), count(lit(1)).as("__cnt"))
      .withColumn("m",
        expr("(__s + 1000000 * __cnt) div __cnt - 1000000"))
      .select(col("label"), col("pos"), col("m"))
    val a = c.select(col("label").as("label_a"), col("pos"),
      col("m").as("ma"))
    val b = c.select(col("label").as("label_b"), col("pos").as("pos_b"),
      col("m").as("mb"))
    a.join(b, col("pos") === col("pos_b") && col("label_a") < col("label_b"))
      .groupBy(col("label_a"), col("label_b"))
      .agg(sum(col("ma") * col("mb")).as("dot"),
        sum(col("ma") * col("ma")).as("na"),
        sum(col("mb") * col("mb")).as("nb"))
      .select(col("label_a"), col("label_b"),
        round(lit(1e6) * col("dot").cast("double") /
          (sqrt(col("na").cast("double")) * sqrt(col("nb").cast("double"))))
          .cast("long").as("cos_ppm"))
      .orderBy(col("label_a"), col("label_b"))
  }

  /** Mutual nearest neighbors over a scored candidate pair list
    * (columns id_a, id_b, cos — canonical id_a < id_b, e.g. from
    * [[Dedup.embeddingNearDupPairs]]): keep the pairs where each side
    * is the OTHER side's best-scoring neighbor (ties by min id). The
    * reciprocal-best-match criterion is the standard high-precision
    * alignment/dedup filter (a one-way top-1 keeps hub neighbors;
    * mutuality kills them).
    *
    * Scale shape: candidate-list-sized only — one symmetrize, one
    * per-id window top-1, one self-equi-join; the corpus-sized work
    * already happened in the (bucketed) candidate generator.
    *
    * Eager + scope-bound: construction launches Spark jobs (Dedup.materializeShared
    * inside); when built inside a withCandidateScope, the terminal action must
    * run before scope exit or the materialized blocks are already freed. */
  def mutualTopMatches(pairs: DataFrame): DataFrame = {
    // the scored candidate list feeds both symmetrize legs, and for the
    // wired caller it is the LSH-bucketed embedding verify — without a
    // cut that generator re-ran per leg (only its exchanges are shared).
    // Candidate-list-sized, scope-tracked, freed at scope exit.
    val pr = Dedup.materializeShared(
      pairs.select(col("id_a"), col("id_b"), col("cos")))
    val both = pr
      .unionByName(pr.select(col("id_b").as("id_a"),
        col("id_a").as("id_b"), col("cos")))
    val w = Window.partitionBy(col("id_a"))
      .orderBy(col("cos").desc, col("id_b").asc)
    val best = both.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .select(col("id_a").as("s"), col("id_b").as("t"), col("cos"))
    best.as("x")
      .join(best.as("y"),
        col("x.t") === col("y.s") && col("y.t") === col("x.s"))
      .filter(col("x.s") < col("x.t"))
      .select(col("x.s").as("id_a"), col("x.t").as("id_b"),
        col("x.cos").as("cos"))
  }
}
