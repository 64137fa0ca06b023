package graft.operators

import graft.functions.{PqEncodeExpr, PqLutExpr, PqTable}

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.Bridge

/** Product-quantization ANN: the memory axis of embedding search at
  * corpus scale. IVF ([[Ivf]]) prunes WHICH vectors a query inspects;
  * PQ compresses WHAT each inspection costs — a d-dim float vector
  * (4d bytes) becomes m small codes, so the compressed-domain scan
  * carries only (id, m codes) and a 100 TB raw corpus fits executor
  * memory. Scoring is asymmetric (ADC): the query precomputes an m*k
  * lookup table of sub-distances, each corpus row costs m adds, and an
  * exact cosine re-rank over the top candidates restores exact-metric
  * ordering at the end (the classic PQ + re-rank serving shape,
  * Jegou et al., "Product Quantization for Nearest Neighbor Search",
  * IEEE TPAMI 2011).
  *
  * Training is Lloyd's k-means per subspace, run as ONE distributed
  * pipeline for all m subspaces jointly (a subspace loop would pay m
  * full scans per iteration): encode under the current codebook, then
  * recompute every (subspace, code, position) mean in a single
  * aggregation. Means use exact decimal addition, not double avg() —
  * order-independent, so training is deterministic under any partition
  * layout (same contract as [[Ivf.train]]).
  */
object Pq {

  /** Train an m x k codebook. `iters` Lloyd rounds over the corpus;
    * seeds are the first k vectors in content-hash order (spread across
    * the corpus, layout-independent). The embedding dim must divide
    * evenly into m subspaces. */
  def train(corpus: DataFrame, idCol: String, vecCol: String,
            m: Int, k: Int, iters: Int = 2): PqTable = {
    require(m > 0 && k > 0 && iters >= 0, "m, k positive; iters >= 0")
    val vecs = corpus.select(col(idCol).as("__id"),
      col(vecCol).cast("array<float>").as("__v"))
    // deterministic seed rows without a global sort (same device as
    // Ivf.trainImpl: two-phase top-k on a hash spread)
    val seedRows = graft.plans.TopK.perKey(
        vecs.withColumn("__spread", pmod(hash(col("__id")), lit(1 << 30)))
          .withColumn("__g", lit(0)),
        Seq("__g"), Seq(("__spread", true), ("__id", true)), k)
      .orderBy(col("__spread"), col("__id"))
      .select(col("__v")).collect()
      .map(_.getSeq[Float](0).toArray)
    require(seedRows.length == k,
      s"corpus has ${seedRows.length} rows, need >= $k to seed PQ")
    val dim = seedRows(0).length
    require(dim % m == 0, s"dim $dim must divide into $m subspaces")
    val subDim = dim / m
    var cb = new PqTable(Array.tabulate(m, k) { (s, c) =>
      java.util.Arrays.copyOfRange(seedRows(c), s * subDim, (s + 1) * subDim)
    })
    for (_ <- 1 to iters) {
      // one pass: every row's m codes, then every (sub, code, pos) mean
      val means = vecs
        .select(Bridge.column(PqEncodeExpr(
            Bridge.expression(col("__v")), cb)).as("__codes"),
          posexplode(col("__v")).as(Seq("__pos", "__x")))
        .select((col("__pos") / subDim).cast("int").as("__sub"),
          element_at(col("__codes"), (col("__pos") / subDim).cast("int") + 1)
            .as("__code"),
          pmod(col("__pos"), lit(subDim)).as("__i"),
          col("__x"))
        .groupBy(col("__sub"), col("__code"), col("__i"))
        // exact decimal mean — order-independent (see module doc)
        .agg(avg(col("__x").cast("decimal(27,12)")).as("__mean"))
        .collect()
      val next = cb.table.map(_.map(_.clone()))
      means.foreach { r =>
        next(r.getInt(0))(r.getInt(1))(r.getInt(2)) =
          r.getDecimal(3).doubleValue.toFloat
      }
      cb = new PqTable(next)
    }
    cb
  }

  /** The compressed representation: (id, m codes). This is the ONLY
    * thing the ADC scan carries — raw vectors stay at the source until
    * the re-rank joins the few surviving candidates back. */
  /** Fixed sign-grid codebook: m subspaces of dim/m dims each, with
    * k = 2^subDim codewords = every ±h sign pattern (bit j of the code
    * → dim j sign; +h when set). Encoding under L2 then reduces to the
    * per-dim sign of the vector (ties at 0.0 fall to the cleared bit,
    * nearestL2's lowest-index rule), so encode AND the ADC distance
    * are closed-form — training-free, deterministic, and exactly
    * replayable in plain SQL. The parity-test twin of [[train]]:
    * q_ann_ivfpq_refine runs the real pipeline on it so the DuckDB
    * oracle can verify the whole probe/ADC/refine composition, not
    * just a planted top-1. */
  def signCodebook(dim: Int, m: Int, h: Float): PqTable = {
    require(m >= 1 && dim % m == 0, s"dim $dim must split into m=$m subspaces")
    val subDim = dim / m
    require(subDim <= 4, s"subDim $subDim > 4 would need 2^$subDim codes")
    require(h > 0f, s"grid half-step must be positive, got $h")
    val k = 1 << subDim
    new PqTable(Array.tabulate(m, k) { (_, c) =>
      Array.tabulate(subDim)(j => if (((c >> j) & 1) == 1) h else -h)
    })
  }

  def encode(corpus: DataFrame, idCol: String, vecCol: String,
             cb: PqTable): DataFrame =
    corpus.select(col(idCol).as("corpus_id"),
      Bridge.column(PqEncodeExpr(
        Bridge.expression(col(vecCol).cast("array<float>")), cb)).as("codes"))

  /** ADC accumulation over a stored LUT: m adds per row. Shared with
    * [[IvfPqIndex]], which scores PERSISTED codes. */
  private[operators] def adcScore(lut: Column, codes: Column, cb: PqTable): Column =
    (0 until cb.m).map { s =>
      element_at(lut, element_at(codes, s + 1) + lit(s * cb.k + 1))
    }.reduce(_ + _)

  /** IVF-PQ: the canonical composed index (coarse quantizer prunes
    * WHICH inverted lists a query scans; PQ compresses WHAT each
    * scanned row costs). The list scan is a cluster equi-join carrying
    * only (cluster, id, codes) — at 100 TB this is the shape that
    * fits: nprobe/nlist of the corpus touched, 4*dim/m less memory per
    * touched row, exact re-rank only on the survivors. Same output
    * contract as every ANN tier. */
  def ivfAdcTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
                 vecCol: String, k: Int, coarse: Array[Array[Float]],
                 cb: PqTable, nprobe: Int = 2, rerank: Int = 32,
                 refine: Boolean = true): DataFrame = {
    require(rerank >= k, s"rerank window $rerank must cover k=$k")
    val lists = corpus.select(col(idCol).as("corpus_id"),
      Ivf.assign(col(vecCol), coarse).as("cluster"),
      Bridge.column(PqEncodeExpr(
        Bridge.expression(col(vecCol).cast("array<float>")), cb)).as("codes"))
    val q = queries.select(col(idCol).as("query_id"),
        col(vecCol).cast("array<float>").as("qv"))
      .withColumn("lut", Bridge.column(PqLutExpr(
        Bridge.expression(col("qv")), cb)))
    val probed = q.select(col("query_id"), col("lut"),
      explode(Ivf.probes(col("qv"), coarse, nprobe)).as("cluster"))
    val scored = lists.join(broadcast(probed), Seq("cluster"))
      .filter(col("query_id") =!= col("corpus_id"))
      .select(col("query_id"), col("corpus_id"),
        adcScore(col("lut"), col("codes"), cb).as("adc"))
    val cands = graft.plans.TopK.perKey(scored,
      Seq("query_id"), Seq(("adc", true), ("corpus_id", true)), rerank)
    if (refine) rerankExact(corpus, idCol, vecCol, q, cands, k)
    else adcRankOnly(corpus, idCol, vecCol, q, cands, k)
  }

  /** The NO-refine serving path: rank by the compressed-domain
    * distance alone — the recall baseline the exact re-rank stage is
    * measured against (EvalSpec pins refined recall@k strictly above
    * this at equal nprobe). The exact cosine is still attached for the
    * shared ANN output contract, but the RANK is the ADC rank. */
  private def adcRankOnly(corpus: DataFrame, idCol: String, vecCol: String,
                          q: DataFrame, cands: DataFrame, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val top = graft.plans.TopK.perKey(cands,
      Seq("query_id"), Seq(("adc", true), ("corpus_id", true)), k)
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("adc").asc, col("corpus_id").asc)
    val ranked = top.withColumn("rank", row_number().over(w))
    corpus
      .select(col(idCol).as("corpus_id"), col(vecCol).cast("array<float>").as("cv"))
      .join(broadcast(ranked.select(col("query_id"), col("corpus_id"),
        col("rank"))), Seq("corpus_id"))
      .join(broadcast(q.select(col("query_id"), col("qv"))), Seq("query_id"))
      .select(col("query_id"), col("corpus_id"),
        graft.functions.vectors.cosine(col("qv"), col("cv")).as("cos"),
        col("rank"))
  }

  /** Exact-cosine re-rank of bounded candidates: broadcast them INTO
    * the vector source, attach raw vectors, rank through the shared ANN
    * contract. `q` must be one row per query_id. Shared with
    * [[IvfPqIndex]]. */
  private[operators] def rerankExact(corpus: DataFrame, idCol: String, vecCol: String,
                                     q: DataFrame, cands: DataFrame, k: Int): DataFrame = {
    val withVecs = corpus
      .select(col(idCol).as("corpus_id"), col(vecCol).cast("array<float>").as("cv"))
      .join(broadcast(cands.select(col("query_id"), col("corpus_id"))),
        Seq("corpus_id"))
      .join(broadcast(q.select(col("query_id"), col("qv"))), Seq("query_id"))
    Similarity.selectAndRank(
      withVecs.withColumn("cos", graft.functions.vectors.cosine(col("qv"), col("cv"))),
      k)
  }

  /** ANN top-k through the compressed domain: ADC-score every corpus
    * code against each broadcast query's lookup table, keep the
    * `rerank` best by approximate distance (two-phase top-k — no
    * global sort), then exact-cosine re-rank only those candidates.
    * Output contract matches [[Similarity.bruteForceTopK]]:
    * (query_id, corpus_id, cos, rank), ties on corpus id. */
  def adcTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
              vecCol: String, k: Int, cb: PqTable,
              rerank: Int = 32): DataFrame = {
    require(rerank >= k, s"rerank window $rerank must cover k=$k")
    val codes = encode(corpus, idCol, vecCol, cb)
    val q = queries.select(col(idCol).as("query_id"),
      col(vecCol).cast("array<float>").as("qv"))
      .withColumn("lut", Bridge.column(PqLutExpr(
        Bridge.expression(col("qv")), cb)))
    // compressed-domain scan: (id, codes) x broadcast queries — the
    // intentional brute-force shape, 4*dim/m times smaller than raw
    val scored = codes
      .join(broadcast(q.select(col("query_id"), col("lut"))),
        col("query_id") =!= col("corpus_id"))
      .select(col("query_id"), col("corpus_id"),
        adcScore(col("lut"), col("codes"), cb).as("adc"))
    val cands = graft.plans.TopK.perKey(scored,
      Seq("query_id"), Seq(("adc", true), ("corpus_id", true)), rerank)
    // re-rank: few candidates -> broadcast them INTO the corpus join,
    // attach raw vectors, exact cosine through the shared ANN ranking
    rerankExact(corpus, idCol, vecCol, q, cands, k)
  }
}
