package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.fakegen.FakeGen

/** Deterministic sampling & dataset-mixing operators for training-data
  * curation. Unlike `df.sample` (partition-order-dependent RNG), every
  * operator here keys its decision on row CONTENT + seed: stable across
  * runs, partitionings, task retries, and cluster sizes — a sample
  * drawn at 100 TB is reproducible bit-for-bit.
  */
object Sampling {

  /** The sampling decision value: first 15 hex chars of
    * md5("seed:domain:key"). 60 uniform bits, compared LEXICOGRAPHICALLY
    * against [[thresholdHex]] — string-vs-string on both sides, so the
    * boundary cannot drift through a float round-trip, and the whole
    * decision is portable to any engine with md5 (the contract that lets
    * a 100 TB sample drawn here be re-derived or audited elsewhere).
    * md5 on a short key costs ~0.1 µs/row — noise next to scan+decode.
    *
    * Null keys: the hex is null, so every `<` comparison is null and the
    * row is FILTERED OUT — standard SQL predicate semantics, and exactly
    * what the DuckDB oracles do, so the two engines agree. This is the
    * deliberate policy for the SAMPLING family (a null-key row has no
    * stable identity to sample on); [[shardAssign]] instead fails closed
    * because its contract (dense per-shard positions) would be silently
    * corrupted, not merely filtered. */
  def sampleHex(key: Column, domain: String = "",
                seed: Long = FakeGen.DefaultSeed): Column =
    substring(md5(concat(lit(s"$seed:$domain:"), key.cast("string"))), 1, 15)

  /** `fraction` as a 15-hex-digit threshold: floor(fraction * 16^15),
    * zero-padded. Exposed so oracles embed the IDENTICAL literal.
    * Defined for fraction < 1 only — at 1.0 the value needs 16 digits
    * and would compare lexicographically wrong; "keep everything" has
    * no threshold (hashSample simply skips the filter). */
  def thresholdHex(fraction: Double): String = {
    require(fraction >= 0.0 && fraction < 1.0,
      s"fraction $fraction not in [0,1); >=1 means no filter at all")
    f"${(fraction * math.pow(16, 15)).toLong}%015x"
  }

  /** Deterministic train/val/test assignment by content hash: one
    * [[sampleHex]] per key compared against two thresholds, so
    * membership is a pure function of (key, seed, domain) — stable
    * across runs, shards, partial reprocessing, and engines (the exact
    * SQL-replay property the sampling family shares). Null keys fail
    * closed like [[shardAssign]]: a row with no stable identity cannot
    * be promised a stable split, and silently dropping it from ALL
    * splits is how eval sets leak. */
  def splitAssign(df: DataFrame, keyCol: String, trainFrac: Double,
                  valFrac: Double, seed: Long = FakeGen.DefaultSeed,
                  domain: String = ""): DataFrame = {
    require(trainFrac > 0 && valFrac > 0 && trainFrac + valFrac < 1.0,
      s"need 0 < train, 0 < val, train+val < 1; got $trainFrac/$valFrac")
    val hex = sampleHex(col(keyCol), domain, seed)
    df.withColumn("split",
      when(col(keyCol).isNull, raise_error(lit(
          s"splitAssign: null $keyCol has no stable split identity")))
        .when(hex < lit(thresholdHex(trainFrac)), "train")
        .when(hex < lit(thresholdHex(trainFrac + valFrac)), "val")
        .otherwise("test"))
  }

  /** Deterministic per-GROUP sample: the k rows of each group with the
    * smallest content-keyed hash — the "pull 3 docs per source for
    * review" op, stable across runs and growth that doesn't touch a
    * group's k smallest hashes. Selection rides the bounded-heap top-k
    * operator (one partial+final pass, no per-group sort). */
  def samplePerGroup(df: DataFrame, groupCol: String, keyCol: String,
                     k: Int, seed: Long = FakeGen.DefaultSeed,
                     domain: String = "pergroup"): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val keyed = df.withColumn("__h", sampleHex(col(keyCol), domain, seed))
    graft.plans.TopK.perKey(keyed, Seq(groupCol),
      Seq(("__h", true), (keyCol, true)), k).drop("__h")
  }

  /** Deterministic per-epoch training order: every key gets a dense
    * global position 1..n from the rank of its content-keyed hash
    * under domain `epoch<e>` — a different, reproducible permutation
    * each epoch, the same on every rerun, resumable mid-epoch (skip
    * pos <= checkpoint). The corpus-wide rank is DISTRIBUTED
    * ([[Analytics.bucketedGroupRank]] under a constant group over the
    * hash value), so no global sort window serializes the corpus. */
  def epochOrder(df: DataFrame, keyCol: String, epoch: Int,
                 seed: Long = FakeGen.DefaultSeed): DataFrame = {
    require(epoch >= 0, s"epoch must be >= 0, got $epoch")
    val hv = conv(sampleHex(col(keyCol), s"epoch$epoch", seed), 16, 10)
      .cast("long")
    val keyed = df.withColumn("__hv", hv).withColumn("__g", lit(0))
    Analytics.bucketedGroupRank(keyed, "__g", "__hv", tieCols = Seq(keyCol))
      .select(col(keyCol), col("__rank").as("pos"))
  }

  /** Keep ~`fraction` of rows, decided by content (md5 of key + seed +
    * domain): stable across runs, partitionings, and task retries. */
  def hashSample(df: DataFrame, keyCol: String, fraction: Double,
                 seed: Long = FakeGen.DefaultSeed,
                 domain: String = ""): DataFrame =
    if (fraction >= 1.0) df
    else df.filter(sampleHex(col(keyCol), domain, seed) < lit(thresholdHex(fraction)))

  /** Exact modulo sample (oracle-friendly): keep rows where
    * key % 100 < pct. Deterministic but correlated with key structure —
    * use [[hashSample]] when keys aren't uniform. */
  def modSample(df: DataFrame, keyCol: String, pct: Int): DataFrame =
    df.filter(pmod(col(keyCol), lit(100)) < pct)

  /** At most `nPerClass` rows per class, deterministically chosen by
    * `orderCol` (ascending) — stratified downsampling (class
    * balancing), via the sort-free top-k operator. */
  def stratified(df: DataFrame, classCol: String, orderCol: String,
                 nPerClass: Int): DataFrame =
    graft.plans.TopK.perKey(df, Seq(classCol), Seq((orderCol, true)), nPerClass)

  /** Learning-curve levels: NESTED deterministic samples at increasing
    * fractions — every smaller level is a strict SUBSET of every larger
    * one by construction (one [[sampleHex]] per row, rising
    * thresholds), which is the property scaling-law experiments need
    * (the 1% run's data is literally inside the 10% run's). Per level:
    * n, exact cents sum, ppm mean — the per-level statistics that
    * accompany each curve point, replayable in any engine.
    *
    * Scale shape: one scan; the level explode multiplies map-side rows
    * by |fractions| but the map-side combine collapses the shuffle to
    * |fractions| rows per partition. */
  def nestedSamples(df: DataFrame, keyCol: String, centsCol: String,
                    fractions: Seq[Double] = Seq(0.01, 0.1, 0.5),
                    seed: Long = FakeGen.DefaultSeed,
                    domain: String = "curve"): DataFrame = {
    require(fractions.nonEmpty && fractions == fractions.sorted &&
      fractions.forall(f => f > 0 && f < 1),
      s"fractions must be ascending in (0,1), got $fractions")
    val levels = explode(array(fractions.map(f =>
      struct(lit((f * 1e6).toLong).as("fraction_ppm"),
        lit(thresholdHex(f)).as("__thr"))): _*))
    df.select(col(centsCol).cast("long").as("__c"),
        sampleHex(col(keyCol), domain, seed).as("__h"))
      .withColumn("__l", levels)
      .filter(col("__h") < col("__l.__thr"))
      .groupBy(col("__l.fraction_ppm").as("fraction_ppm"))
      .agg(count(lit(1)).as("n"), sum(col("__c")).as("sum_cents"))
      .select(col("fraction_ppm"), col("n"), col("sum_cents"),
        expr("sum_cents * 1000000L div n").as("mean_cents_ppm"))
  }

  /** EXACT budget-proportional stratified sample: group g contributes
    * max(1, floor(budget * n_g / N)) rows — its population share of
    * the budget, never zero for a nonempty group — chosen
    * deterministically as the group's LOWEST content hashes
    * (row_number over (sampleHex, key); the key tiebreak makes the
    * choice total). Fraction-threshold sampling ([[hashSample]]) only
    * lands NEAR its rate; this allocation is exact to the row, which
    * is what a fixed token/row budget per mixture slot actually needs.
    *
    * Group counts are one aggregate collected to the driver (bounded
    * by distinct groups — the same bounded-collect posture as the
    * mixing family) so the quota arithmetic runs in exact Long math;
    * quotas re-enter the plan as a broadcast-joined table. The scan
    * itself is one window per group partition — one exchange. */
  def proportionalSample(df: DataFrame, groupCol: String, keyCol: String,
                         budget: Long, seed: Long = FakeGen.DefaultSeed,
                         domain: String = ""): DataFrame = {
    require(budget > 0, s"budget: $budget")
    val counts = df.groupBy(col(groupCol))
      .agg(count(lit(1)).as("__n")).collect()
      .map(r => r.get(0) -> r.getLong(1))
    val total = counts.map(_._2).sum
    if (total == 0) return df
    val spark = df.sparkSession
    val quotas = spark.createDataFrame(
      spark.sparkContext.parallelize(counts.toIndexedSeq.map { case (g, n) =>
        org.apache.spark.sql.Row(g, math.max(1L, budget * n / total))
      }, 1),
      org.apache.spark.sql.types.StructType(Seq(
        df.schema(groupCol),
        org.apache.spark.sql.types.StructField("__quota",
          org.apache.spark.sql.types.LongType))))
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(groupCol))
      .orderBy(sampleHex(col(keyCol), domain, seed), col(keyCol))
    df.withColumn("__rn", row_number().over(w))
      .join(broadcast(quotas), Seq(groupCol))
      .filter(col("__rn") <= col("__quota"))
      .drop("__rn", "__quota")
  }

  /** Deterministic systematic WEIGHTED sample of ~k rows (Madow 1949's
    * systematic PPS selection, with the random start replaced by the
    * content-hash ordering — fully replayable): rows line up in md5
    * order, the integer cumulative weight rides
    * [[Analytics.distributedCumSum]] (no global-sort window), and a
    * row is picked once per stride boundary its weight interval
    * crosses (`stride = max(total div k, 1)`), so selection
    * probability is proportional to weight WITHOUT replacement and a
    * heavy row reports its multiplicity in `picks`. All arithmetic is
    * exact Long (weights are cents), so the sample replays bit-for-bit
    * in any engine. Zero/negative-weight rows are excluded by
    * contract (they carry no selection mass). */
  def systematicWeighted(df: DataFrame, keyCol: String, weightCol: String,
                         k: Int, seed: Long = FakeGen.DefaultSeed,
                         domain: String = "sys"): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val hv = conv(sampleHex(col(keyCol), domain, seed), 16, 10).cast("long")
    val keyed = df.select(col(keyCol), col(weightCol).cast("long").as("__w"))
      .filter(col("__w") > 0)
      .withColumn("__h", hv)
    val cum = Analytics.distributedCumSum(keyed, "__h", Seq("__w"),
      tieCols = Seq(keyCol))
    val tot = keyed.agg(sum(col("__w")).as("__t"))
    cum.crossJoin(broadcast(tot))
      .withColumn("__stride", greatest(expr(s"__t div ${k}L"), lit(1L)))
      .withColumn("picks",
        expr("cum___w div __stride - (cum___w - __w) div __stride"))
      .filter(col("picks") >= 1L)
      .select(col(keyCol), col("__w").as("w_cents"),
        col("cum___w").as("cum_cents"), col("picks").cast("long").as("picks"))
  }

  /** Weighted deterministic mix of datasets (a training mixture):
    * each source is hash-subsampled to its weight, then unioned with a
    * provenance column. Weights in [0, 1] are independent keep-rates
    * (not normalized shares). */
  def weightedMix(sources: Seq[(String, DataFrame, Double)], keyCol: String,
                  seed: Long = FakeGen.DefaultSeed): DataFrame = {
    require(sources.nonEmpty)
    sources.map { case (name, df, weight) =>
      // the source name domain-separates the md5 input, so the same key
      // draws independently in different sources
      hashSample(df, keyCol, weight, seed, domain = name)
        .withColumn("__source", lit(name))
    }.reduce(_ unionByName _)
  }

  /** Mix sources to per-source TOKEN budgets — the LLM data recipe is
    * "this many tokens from each source", not "this fraction of rows".
    * One aggregate scan per source measures its total tokens (column-
    * pruned: reads only `tokenCol`); keep-rate = budget/total (capped
    * at 1), then the standard content-keyed md5 sample applies at that
    * rate. Expected sampled tokens = budget ± binomial noise; the
    * decision stays engine-portable because the rate is derived from
    * an EXACT integer total, and the threshold math (floor(rate *
    * 16^15), compared as hex strings) replays identically in SQL —
    * which is what the q_mix_token_budget oracle does.
    */
  def mixByTokenBudget(sources: Seq[(String, DataFrame, Long)],
                       keyCol: String, tokenCol: String,
                       seed: Long = FakeGen.DefaultSeed): DataFrame = {
    require(sources.nonEmpty)
    require(sources.forall(_._3 >= 0), "token budgets must be >= 0")
    require(sources.map(_._1).distinct.size == sources.size,
      "source names must be unique (they domain-separate the draws)")
    // ONE Spark job measures every source's total (a union of tagged
    // single-row aggregates — the per-source scans run as parallel
    // stages, not S sequential driver round-trips)
    val totals: Map[String, Long] = sources.map { case (name, df, _) =>
        df.agg(sum(col(tokenCol)).cast("long").as("t"))
          .select(lit(name).as("n"), col("t"))
      }.reduce(_ unionByName _)
      .collect()
      .map(r => r.getString(0) -> (if (r.isNullAt(1)) 0L else r.getLong(1)))
      .toMap
    // rate-capped-at-1 keep-all branch lives in hashSample; the mix
    // semantics (domain separation, provenance column, union) are
    // weightedMix's — one implementation, two entry points
    weightedMix(sources.map { case (name, df, budget) =>
      val total = totals(name)
      (name, df, if (total <= budget) 1.0 else budget.toDouble / total)
    }, keyCol, seed)
  }

  /** Temperature-flattened mixture — the multilingual/web-corpus recipe
    * (sample source i with share ∝ total_i^(1/τ)): τ=1 keeps natural
    * proportions, τ→∞ approaches uniform across sources, in between it
    * up-samples the tail without letting the head dominate. Shares are
    * computed from EXACT per-source integer token totals (one Spark job,
    * like [[mixByTokenBudget]]), converted to per-source keep-rates
    * against `totalBudget`, then the standard content-keyed md5 draw
    * applies.
    *
    * Engine portability: at the default τ=2 the share power is
    * `sqrt`, which IEEE 754 requires to be CORRECTLY ROUNDED — so any
    * engine replays the rate bit-for-bit from the same integer totals
    * (the q_mix_temperature oracle does, in fixed operand order).
    * Generic τ uses `pow`, which is NOT correctly rounded and may
    * differ across math libraries in the last ulp; fine in production
    * (a ±1-ulp rate moves the md5 threshold by at most one row in
    * 2^60), but only the sqrt instance is oracle-exact. */
  def temperatureMix(sources: Seq[(String, DataFrame)], keyCol: String,
                     tokenCol: String, totalBudget: Long,
                     tau: Double = 2.0,
                     seed: Long = FakeGen.DefaultSeed): DataFrame = {
    require(sources.nonEmpty)
    require(tau > 0, s"temperature must be > 0, got $tau")
    require(totalBudget >= 0, "token budget must be >= 0")
    require(sources.map(_._1).distinct.size == sources.size,
      "source names must be unique (they domain-separate the draws)")
    val totals: Map[String, Long] = sources.map { case (name, df) =>
        df.agg(sum(col(tokenCol)).cast("long").as("t"))
          .select(lit(name).as("n"), col("t"))
      }.reduce(_ unionByName _)
      .collect()
      .map(r => r.getString(0) -> (if (r.isNullAt(1)) 0L else r.getLong(1)))
      .toMap
    def share(t: Double): Double =
      if (tau == 2.0) math.sqrt(t) else math.pow(t, 1.0 / tau)
    // fixed left-to-right source order, plain double ops — the exact
    // sequence an oracle replays
    val shares = sources.map { case (name, _) => share(totals(name).toDouble) }
    val denom = shares.sum
    weightedMix(sources.zip(shares).map { case ((name, df), p) =>
      val total = totals(name)
      val rate =
        if (total <= 0L || denom == 0.0) 0.0
        else p / denom * totalBudget.toDouble / total
      (name, df, math.min(1.0, rate))
    }, keyCol, seed)
  }

  /** Deterministic shard assignment for training-data export: shard =
    * (60-bit md5 value of the key) mod `nShards`, position = dense
    * 0-based rank within the shard ordered by (hash, key) — a
    * reproducible global shuffle + split, the last step before writing
    * training shards. Content-keyed like every operator here: the same
    * corpus shards identically on any cluster size or engine.
    *
    * Scale: one exchange on the shard id, then a per-shard sort for the
    * position — the honest cost of a DEFINED within-shard order. Size
    * `nShards` to the target shard size (thousands at 100 TB), not to
    * the cluster: shards are the output contract, cores just execute.
    * Skew-free by construction (md5 is uniform over keys). */
  def shardAssign(df: DataFrame, keyCol: String, nShards: Int,
                  seed: Long = FakeGen.DefaultSeed,
                  domain: String = "shard"): DataFrame = {
    require(nShards > 0, s"nShards must be positive, got $nShards")
    import org.apache.spark.sql.expressions.Window
    // FAIL CLOSED on null keys: md5(null) would propagate to a null
    // shard and an UNDEFINED within-shard order (every null-key row
    // lands in one window partition with no tiebreaker) — silently
    // nondeterministic shards. A row-level branch, free under codegen.
    val key = coalesce(col(keyCol),
      raise_error(lit(s"shardAssign: null $keyCol — shard keys must be " +
        "non-null (dedupe/validate upstream)")))
    val hex = sampleHex(key, domain, seed)
    // conv(hex, 16, 10): 60 bits, exact in a long; non-negative, so
    // `% nShards` == pmod — any engine agrees
    val v = conv(hex, 16, 10).cast("long")
    val w = Window.partitionBy(col("__shard")).orderBy(col("__hex"), col(keyCol))
    df.withColumn("__hex", hex)
      .withColumn("__shard", pmod(v, lit(nShards)).cast("int"))
      .withColumn("__pos", (row_number().over(w) - 1).cast("long"))
      .drop("__hex")
  }

  /** Class-balanced downsampling: every label keeps exactly
    * min-class-count rows, chosen by md5 hash order (content-keyed, so
    * the same corpus balances identically on any cluster or engine —
    * the [[hashSample]] determinism contract, applied to class
    * rebalancing before classifier training). The min count rides a
    * single-row broadcast; selection is one per-label window over the
    * hash order. */
  def balanceClasses(df: DataFrame, keyCol: String,
                     labelCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val minC = df.groupBy(col(labelCol)).agg(count(lit(1)).as("__c"))
      .agg(min(col("__c")).as("__min"))
    val w = Window.partitionBy(col(labelCol))
      .orderBy(md5(col(keyCol).cast("string")).asc, col(keyCol).asc)
    df.withColumn("__rn", row_number().over(w))
      .crossJoin(broadcast(minC))
      .filter(col("__rn") <= col("__min"))
      .drop("__rn", "__min")
  }

  /** Nucleus (top-p) selection by a quality score — keep the
    * best-scored documents until their tokens reach `pPpm` (parts per
    * million) of the corpus total, the data-mixing analogue of
    * top-p sampling: a hard quality cut whose budget is expressed as a
    * token SHARE, not a count. Selection order is the total order
    * (score desc, tie asc); the row that crosses the budget boundary is
    * kept (its prefix was still inside). Appends `__cum` (cumulative
    * tokens through the row, for provenance/debug).
    *
    * Scale shape: the naive form is one GLOBAL order-by window — a
    * single-partition serialization at 100 TB. Instead the cumsum is
    * two-phase: score-RANGE buckets (monotone in the score by
    * construction, so bucket asc ≡ score desc between buckets; floor
    * of a monotone double expression keeps equal scores together),
    * per-bucket token totals (tiny table) turned into bucket prefix
    * offsets by one small window, then a per-bucket PARALLEL cumsum
    * window; global cum = bucket prefix + local cum. The corpus total
    * rides a single-row broadcast (BM25 pattern) and the keep
    * predicate `(cum − tok)·1e6 < pPpm·total` is all-integer —
    * evaluated WITHOUT either 64-bit product: both `cum·1e6` and
    * `pPpm·total` overflow BIGINT past ~9.2e12 total tokens (real at
    * 100 TB), so the threshold is decomposed exactly as
    * `floor(pPpm·total/1e6) = pPpm·(total div 1e6) +
    * (pPpm·(total mod 1e6)) div 1e6`, with the remainder deciding the
    * strict-inequality tie. Safe for any token total up to Long.Max. */
  def nucleusTopP(df: DataFrame, scoreCol: String, tieCol: String,
                  tokenCol: String, pPpm: Long,
                  buckets: Int = 64): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(pPpm >= 0 && pPpm <= 1000000L, s"pPpm out of range: $pPpm")
    require(buckets >= 1)
    val bounds = df.agg(min(col(scoreCol)).cast("double").as("__lo"),
      max(col(scoreCol)).cast("double").as("__hi"))
    // bucket 0 = highest scores; equal scores always share a bucket
    val bucketed = df.crossJoin(broadcast(bounds))
      .withColumn("__b",
        when(col("__hi") === col("__lo"), lit(0))
          .otherwise(least(lit(buckets - 1), floor(
            (col("__hi") - col(scoreCol).cast("double")) /
              (col("__hi") - col("__lo")) * buckets).cast("int"))))
      .drop("__lo", "__hi")
    val prefixes = bucketed.groupBy(col("__b"))
      .agg(sum(col(tokenCol)).cast("long").as("__bt"))
      .withColumn("__prefix",
        coalesce(sum(col("__bt")).over(Window.orderBy(col("__b").asc)
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .drop("__bt")
    val total = df.agg(sum(col(tokenCol)).cast("long").as("__total"))
    val wLocal = Window.partitionBy(col("__b"))
      .orderBy(col(scoreCol).desc, col(tieCol).asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    bucketed
      .join(broadcast(prefixes), Seq("__b"))
      .crossJoin(broadcast(total))
      .withColumn("__cum",
        col("__prefix") + sum(col(tokenCol)).over(wLocal).cast("long"))
      // (cum − tok)·1e6 < pPpm·total, overflow-free: with
      // total = 1e6·q + r, floor(pPpm·total/1e6) = pPpm·q +
      // (pPpm·r) div 1e6 (≤ total ≤ Long.Max since pPpm ≤ 1e6), and
      // c < pPpm·total/1e6 ⟺ c < thr ∨ (c = thr ∧ remainder > 0)
      .withColumn("__thr", lit(pPpm) * expr("__total div 1000000") +
        expr(s"(${pPpm}L * (__total % 1000000)) div 1000000"))
      .withColumn("__rem", expr(s"(${pPpm}L * (__total % 1000000)) % 1000000"))
      .filter(col("__cum") - col(tokenCol) < col("__thr") ||
        (col("__cum") - col(tokenCol) === col("__thr") && col("__rem") > 0))
      .drop("__b", "__prefix", "__total", "__thr", "__rem")
  }

  /** Deterministic "reservoir" of k rows: rank every row by the md5 of a
    * salted key and keep the global top-k under that rank. Equivalent in
    * distribution to a seeded reservoir sample but content-keyed, so the
    * drawn set is reproducible across runs, partitionings, task retries,
    * and engines (the md5 contract above). Plan-wise this is a
    * TakeOrderedAndProject: each partition keeps a local k-heap and the
    * driver merges heads — never a global sort, so k bounds memory at
    * any input scale. */
  def reservoirByHash(df: DataFrame, keyCol: String, salt: String,
      k: Int): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    df.withColumn("__rk", md5(concat(lit(salt), col(keyCol).cast("string"))))
      .orderBy(col("__rk").asc, col(keyCol).asc)
      .limit(k)
      .drop("__rk")
  }
}
