package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** KMV (k-minimum-values) cardinality sketches (Bar-Yossef et al.
  * 2002): per group, the k smallest DISTINCT hash values of the keyed
  * column. Two properties make this the distinct-count sketch for a
  * 100 TB pipeline:
  *
  *   - the estimate replays EXACTLY in any engine (the hash is the
  *     first 52 bits of md5 and the estimator is one exact-double
  *     division — unlike HLL, whose packed registers are
  *     engine-specific and never comparable across systems);
  *   - sketches are MERGEABLE: union the hash sets, keep the k
  *     smallest — so per-shard/per-day sketches roll up without
  *     rescanning history ([[kmvMerge]]; merged ≡ whole-corpus sketch
  *     by construction, pinned in SketchSpec and by
  *     q_sketch_kmv_merge sharing q_sketch_kmv's oracle).
  *
  * Scale shape: one map-side-combined distinct of (group, hash) — the
  * only full pass — then the bounded-heap TopKPerKey physical operator
  * keeps k rows per group; nothing downstream exceeds k rows per
  * group. Groups with fewer than k distinct values report exact
  * counts (the sketch degenerates to exact, by design).
  */
object Sketch {

  /** 2^52 — hashes are 52-bit so the estimator's double division is
    * exact on both sides of the oracle. */
  private val HashSpace = 4503599627370496.0

  /** 52-bit md5 hash of a value's canonical string form. */
  def kmvHash(value: Column): Column =
    conv(substring(md5(value.cast("string").cast("binary")), 1, 13), 16, 10)
      .cast("long")

  /** Per-group sketch: (groupCols..., sketch ARRAY<BIGINT> ascending,
    * at most k entries). */
  def kmv(df: DataFrame, groupCols: Seq[String], valueCol: String,
          k: Int): DataFrame = {
    require(k > 1, s"k must exceed 1, got $k")
    val h = df.select(
        groupCols.map(col) :+ kmvHash(col(valueCol)).as("__h"): _*)
      .distinct()
    graft.plans.TopK.perKey(h, groupCols, Seq(("__h", true)), k)
      .groupBy(groupCols.map(col): _*)
      .agg(array_sort(collect_list(col("__h"))).as("sketch"))
  }

  /** Merge per-shard sketches (rows shaped like [[kmv]] output, same
    * k): union hash sets, keep the k smallest per group. The merge
    * never touches source data — input is ≤ k·shards rows per group. */
  def kmvMerge(sketches: DataFrame, groupCols: Seq[String],
               k: Int): DataFrame =
    sketches
      .select(groupCols.map(col) :+ explode(col("sketch")).as("__h"): _*)
      .distinct()
      .groupBy(groupCols.map(col): _*)
      .agg(slice(array_sort(collect_list(col("__h"))), 1, k).as("sketch"))

  /** Distinct-count estimate from a sketch column: exact size below
    * k, (k-1)/u_(k) at capacity. */
  def kmvEstimate(sketch: Column, k: Int): Column =
    when(size(sketch) < k, size(sketch).cast("long"))
      .otherwise(floor(lit((k - 1).toDouble * HashSpace) /
        element_at(sketch, k)).cast("long"))

  /** Per-group QUANTILE sketch: the k rows with the smallest 52-bit
    * content hashes of `idCol`, carrying their `valueCol` readings — a
    * deterministic bottom-k uniform row sample (Rosén's bottom-k /
    * order sampling). Same three properties as the KMV cardinality
    * sketch, for the distribution axis instead of the distinct axis:
    *
    *   - deterministic and engine-replayable (md5 order, not RNG — the
    *     oracle rebuilds the identical sample in SQL);
    *   - MERGEABLE and bounded: shard sketches union by hash, keep the
    *     k smallest — merged ≡ whole-corpus sketch, always ≤ k rows
    *     ([[quantileMerge]]);
    *   - exact below capacity: a group with ≤ k rows is sampled
    *     completely, so its quantiles are exact.
    *
    * Sketch shape: ARRAY<STRUCT<h BIGINT, v DOUBLE>> ascending by h.
    * `idCol` must identify rows uniquely (inclusion is decided per ROW;
    * hashing the value instead would drop duplicate readings and skew
    * every heavy-hitter distribution). Scale shape matches [[kmv]]:
    * one TopKPerKey bounded heap per group, nothing downstream exceeds
    * k rows per group. */
  def quantileSketch(df: DataFrame, groupCols: Seq[String], valueCol: String,
                     idCol: String, k: Int): DataFrame = {
    require(k > 1, s"k must exceed 1, got $k")
    val pairs = df.select(groupCols.map(col)
      :+ kmvHash(col(idCol)).as("__h")
      :+ col(valueCol).cast("double").as("__v"): _*)
    // secondary order on the value: a (vanishingly unlikely) hash tie
    // on the capacity boundary must still pick a deterministic winner,
    // and the oracle's ORDER BY (h, v) replay must agree with the heap
    graft.plans.TopK.perKey(pairs, groupCols,
        Seq(("__h", true), ("__v", true)), k)
      .groupBy(groupCols.map(col): _*)
      .agg(array_sort(collect_list(struct(col("__h").as("h"),
        col("__v").as("v")))).as("qsketch"))
  }

  /** Merge per-shard quantile sketches (same k): union the (h, v)
    * pairs — shards partition the rows, so the multisets are disjoint
    * — and keep the k smallest by hash. Never touches source data. */
  def quantileMerge(sketches: DataFrame, groupCols: Seq[String],
                    k: Int): DataFrame =
    sketches
      .select(groupCols.map(col) :+ explode(col("qsketch")).as("__p"): _*)
      .groupBy(groupCols.map(col): _*)
      .agg(slice(array_sort(collect_list(col("__p"))), 1, k).as("qsketch"))

  /** Linear-interpolated quantile estimate from a sketch column — the
    * same definition as Spark `percentile` / DuckDB `quantile_cont`,
    * applied to the sampled values. */
  def quantileEstimate(sketch: Column, q: Double): Column = {
    require(q >= 0.0 && q <= 1.0, s"q out of range: $q")
    val values = array_sort(transform(sketch, p => p.getField("v")))
    val n = size(values)
    val pos = (n - lit(1)).cast("double") * lit(q)
    val lo = floor(pos).cast("int")
    val frac = pos - lo.cast("double")
    val vlo = element_at(values, lo + lit(1))
    val vhi = element_at(values, least(lo + lit(2), n))
    when(n === 0, lit(null).cast("double"))
      .otherwise(vlo + (vhi - vlo) * frac)
  }

  /** The k smallest hashes of the UNION of two sketches — itself a
    * valid sketch of A ∪ B (the mergeability property, pairwise). */
  def kmvUnionK(a: Column, b: Column, k: Int): Column =
    slice(array_sort(array_union(a, b)), 1, k)

  // ---------------------------------------------------------------
  // HyperLogLog register sketches (Flajolet et al. 2007). The classic
  // objection to HLL — packed registers are engine-specific and never
  // comparable across systems — disappears when the registers derive
  // from the same md5 contract as [[kmvHash]]: bucket = top 8 of the
  // 52 hash bits (m = 256), rho = trailing-zero rank of the low 44
  // bits (uniform bits, so the reversed-bit convention is equally
  // valid and stays pure integer arithmetic both engines share). The
  // REGISTER TABLE is the artifact: engine-replayable, mergeable by
  // per-bucket max, and the estimate (with the standard linear-counting
  // small-range correction) is a driver-side function of its summary.
  // Scale shape mirrors [[kmv]]: one map-side-combined distinct, then
  // a bounded aggregation — never more than m rows per group.
  // ---------------------------------------------------------------

  /** 2^44 — the rho field width; bucket = hash div 2^44. */
  private val RemSpace = 17592186044416L

  /** Per-group HLL registers: (groupCols..., bucket, r) with at most
    * 256 rows per group, r = max rho observed in the bucket. */
  def hll(df: DataFrame, groupCols: Seq[String], valueCol: String): DataFrame = {
    val h = df.select(
        groupCols.map(col) :+ kmvHash(col(valueCol)).as("__h"): _*)
      .distinct()
    // the (group) partitioning of the distinct already clusters
    // (group, bucket) — no second exchange
    // ρ as a codegen'd CTZ intrinsic (SketchExprs.RhoExpr) — same
    // integer the oracle's 43-step mod chain replays, one instruction
    // per distinct value instead of 43 modulos
    val rho = org.apache.spark.sql.graftbridge.Bridge.column(
      graft.functions.RhoExpr(
        org.apache.spark.sql.graftbridge.Bridge.expression(
          expr(s"__h % $RemSpace")), width = 43))
    h.withColumn("bucket", expr(s"__h div $RemSpace"))
      .withColumn("__rho", rho)
      .groupBy((groupCols.map(col) :+ col("bucket")): _*)
      .agg(max(col("__rho")).as("r"))
  }

  /** Merge per-shard register tables: per-bucket max — merged ≡
    * whole-corpus registers by construction. Input is ≤ 256·shards
    * rows per group; source data is never touched. */
  def hllMerge(registers: DataFrame, groupCols: Seq[String]): DataFrame =
    registers.groupBy((groupCols.map(col) :+ col("bucket")): _*)
      .agg(max(col("r")).as("r"))

  /** Register-table summary: hit count, rho sum/max, and the exact
    * integer harmonic denominator Σ_buckets 2^(44 − M_b) (empty
    * buckets contribute 2^44; the whole sum is ≤ 2^52, BIGINT-safe).
    * The cardinality estimate is α_m·m²·2^44 / denom, linear-counting
    * below 2.5m — a driver-side double over these integers. */
  def hllSummary(registers: DataFrame, groupCols: Seq[String]): DataFrame =
    registers.groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("n_buckets"),
        sum(col("r")).as("sum_rho"),
        max(col("r")).as("max_rho"),
        ((lit(256L) - count(lit(1))) * lit(RemSpace) +
          sum(expr("shiftleft(CAST(1 AS BIGINT), CAST(44 - r AS INT))")))
          .as("denom"))

  /** |A ∩ B| estimate from two same-k sketches (Beyer et al. 2007:
    * ρ·|A∪B| where ρ = fraction of the union sketch's hashes present
    * in BOTH sets). Below capacity the union sketch enumerates both
    * sets completely, so the answer is exact. `k` must be a power of
    * two: the at-capacity estimate is then `(inter * unionEst) >> log2
    * (k)` — pure integer math that replays bit-for-bit in any engine
    * with floor division (the product stays under 2^63; a double
    * round-trip would lose ulps past 2^53 and drift off the oracle). */
  def kmvIntersectEstimate(a: Column, b: Column, k: Int): Column = {
    require(k > 1 && (k & (k - 1)) == 0, s"k must be a power of two, got $k")
    val shift = java.lang.Integer.numberOfTrailingZeros(k)
    val uk = kmvUnionK(a, b, k)
    val inter = size(array_intersect(array_intersect(uk, a), b)).cast("long")
    when(size(uk) < k, inter)
      .otherwise(shiftright(inter * kmvEstimate(uk, k), shift))
  }

  // ---------------------------------------------------------------
  // Count-min sketch (Cormode & Muthukrishnan 2005). Same md5
  // contract as [[kmvHash]]: row i's bucket for value v is the 52-bit
  // hash of "i:v" mod width — the row salt makes the depth rows
  // independent hash functions sharing one engine-portable primitive.
  // The counter TABLE is the artifact: (row, bucket, c) with at most
  // depth·width rows per group — engine-replayable, MERGEABLE by
  // per-cell SUM (shards partition the rows and cell counts are
  // additive, so summed shard tables ≡ the whole-corpus table), and
  // every point estimate min_row c[row][bucket_row(v)] upper-bounds
  // the true count (CMS never underestimates; the overestimate is
  // ≤ 2·corpus/width with probability 1 − 1/2^depth).
  //
  // Scale shape mirrors [[kmv]]: ONE map-side-combined aggregation
  // builds per-value counts (∝ distinct values, not corpus rows);
  // the depth-way expansion and the counter roll-up run on that
  // bounded table; nothing downstream exceeds depth·width rows.
  // ---------------------------------------------------------------

  /** CMS bucket of `value` under depth row `row`: 52-bit md5 of
    * "row:value" mod `width`. */
  def cmsBucket(row: Column, value: Column, width: Int): Column =
    kmvHash(concat(row.cast("string"), lit(":"), value.cast("string"))) %
      lit(width.toLong)

  /** Per-group CMS counter table over `valueCol` occurrences:
    * (groupCols..., row, bucket, c), ≤ depth·width rows per group. */
  def cms(df: DataFrame, groupCols: Seq[String], valueCol: String,
          depth: Int, width: Int): DataFrame = {
    require(depth > 0, s"depth must be positive, got $depth")
    require(width > 1, s"width must exceed 1, got $width")
    val tf = df
      .groupBy(groupCols.map(col) :+ col(valueCol).cast("string").as("__v"): _*)
      .agg(count(lit(1)).as("__n"))
    tf.select(groupCols.map(col) ++ Seq(
        explode(sequence(lit(0), lit(depth - 1))).as("row"),
        col("__v"), col("__n")): _*)
      .groupBy(groupCols.map(col) ++ Seq(col("row"),
        cmsBucket(col("row"), col("__v"), width).as("bucket")): _*)
      .agg(sum(col("__n")).as("c"))
  }

  /** Merge per-shard counter tables (shards partition the rows, so
    * cells ADD): drops the shard grouping, sums per cell. Merged ≡
    * whole-corpus table by construction; input is ≤ depth·width·shards
    * rows and source data is never touched. */
  def cmsMerge(tables: DataFrame): DataFrame =
    tables.groupBy(col("row"), col("bucket"))
      .agg(sum(col("c")).as("c"))

  /** Join/self-join SIZE estimation by correlated key sampling (the
    * sketch the reference's validator tier never had but every
    * cost-based planner wants): sample a deterministic 1/`mod` of the
    * DISTINCT keys by md5 (both sides agree on membership because the
    * hash is content-keyed — that's the "correlated" part, Vengerov
    * et al., VLDB 2015), sum the per-key frequency products over the
    * sample, scale by `mod`. One aggregation per side bounded by
    * distinct keys; no join is executed. Returns one row:
    * (exact_size, est_size, n_sampled, err_ppm) — exact is computed
    * alongside for the report; drop it at true scale and keep the
    * estimate. All-integer, oracle-exact. */
  def selfJoinSizeEstimate(df: DataFrame, keyCol: String,
                           mod: Int = 8): DataFrame = {
    require(mod >= 1, s"mod must be >= 1, got $mod")
    val f = df.groupBy(col(keyCol).as("k")).agg(count(lit(1)).as("c"))
    val ex = f.agg(sum(col("c") * col("c")).as("exact_size"))
    val s = f.filter(kmvHash(concat(lit("js:"), col("k").cast("string")))
      % mod === 0)
    val est = s.agg((coalesce(sum(col("c") * col("c")), lit(0L)) * mod)
        .as("est_size"),
      count(lit(1)).as("n_sampled"))
    ex.crossJoin(broadcast(est))
      .withColumn("err_ppm", expr(
        "CASE WHEN exact_size > 0 THEN " +
          "abs(est_size - exact_size) * 1000000 div exact_size END"))
  }

  /** Point estimates for `probes.valueCol` against a (group-free)
    * counter table: min over the depth cells each probe hashes to.
    * Probe and table sides are both bounded (probes are a top-k or a
    * watch-list; the table ≤ depth·width rows), so the join
    * broadcasts — corpus data is never rescanned. The counter table
    * stores only non-empty cells, so the join is LEFT and a missing
    * cell counts as zero — a watch-list probe absent from the corpus
    * estimates 0 (min over ALL depth cells), not min over whichever
    * cells happen to be occupied. */
  def cmsEstimate(table: DataFrame, probes: DataFrame, valueCol: String,
                  depth: Int, width: Int): DataFrame = {
    val probeCols = probes.columns.map(col).toSeq
    probes
      .select(probeCols :+
        explode(sequence(lit(0), lit(depth - 1))).as("__row"): _*)
      .withColumn("__bucket", cmsBucket(col("__row"), col(valueCol), width))
      .join(table, col("__row") === table("row") &&
        col("__bucket") === table("bucket"), "left")
      .groupBy(probeCols: _*)
      .agg(min(coalesce(col("c"), lit(0L))).as("est"))
  }
}
