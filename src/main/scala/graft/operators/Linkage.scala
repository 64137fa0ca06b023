package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Record-linkage scoring — the entity-resolution step after blocking
  * (Fellegi & Sunter 1969, "A theory for record linkage"): candidate
  * pairs inside a block score the SUM of per-field agreement weights
  * (+w_agree when the field comparator agrees, −w_disagree when it
  * does not), and pairs at or above the decision threshold are
  * declared links. Weights are ppm integer LITERALS supplied by the
  * caller (in production they come from EM-estimated m/u probabilities
  * as log-odds; fixing them as integers is what makes the decision
  * replay bit-for-bit in any engine — the same reason the DP tier
  * bakes its cutpoints).
  *
  * Scale shape: the block equi-join bounds the quadratic — pair work
  * is Σ_b |block_b|², never corpus², which is the standard ER posture
  * (choose block keys so the hottest block fits; the key-skew profile
  * operator is the audit for that). Per pair, scoring is a codegen'd
  * projection; the output is the LINKS, report-sized when the
  * threshold is meaningful.
  */
object Linkage {

  /** One field comparator: `col` is projected from both sides, `same`
    * builds the agreement predicate over (left, right). A NULL
    * comparison counts as disagreement (standard FS treatment of
    * missing fields: no evidence FOR the link).
    *
    * HARD CONTRACT: `same` must be SYMMETRIC — same(a, b) ≡ same(b, a)
    * for all inputs. [[scorePairs]] orients pairs id_a < id_b, but
    * [[linkIncremental]] scores cross pairs with the batch always on
    * the 'a' side regardless of id order; its bit-for-bit parity with
    * the full batch re-run holds ONLY for symmetric comparators.
    * [[eq]] and [[editBand]] are symmetric; a caller-supplied
    * asymmetric predicate (e.g. prefix-of) breaks the parity
    * silently. */
  final case class FieldRule(col: String, same: (Column, Column) => Column,
                             wAgreePpm: Long, wDisagreePpm: Long) {
    require(wAgreePpm > 0 && wDisagreePpm > 0,
      s"weights must be positive ppm, got +$wAgreePpm/-$wDisagreePpm")
  }

  /** Equality comparator — the common case. */
  def eq(col: String, wAgreePpm: Long, wDisagreePpm: Long): FieldRule =
    FieldRule(col, (a, b) => a === b, wAgreePpm, wDisagreePpm)

  /** GRADED string comparator: agreement = Levenshtein edit distance
    * within `maxDist` — the approximate-match rule real ER needs where
    * exact equality misses typo'd duplicates (Winkler's motivating
    * case). Spark's `levenshtein` and DuckDB's `levenshtein` compute
    * the same standard unit-cost DP, so the agreement bit replays
    * engine-exactly on ASCII; CAVEAT for non-ASCII fields: Spark
    * counts CODEPOINTS while DuckDB counts UTF-8 BYTES (probed:
    * DuckDB levenshtein('éa','ea') = 2, Spark = 1), so a multi-byte
    * typo can sit on different sides of the band — normalize to ASCII
    * first, or use [[dlBand]]/[[jwBand]], whose kernels are byte-based
    * like DuckDB's. NULL on either side is disagreement, per the
    * FieldRule contract. */
  def editBand(col: String, maxDist: Int, wAgreePpm: Long,
               wDisagreePpm: Long): FieldRule = {
    require(maxDist >= 1, s"maxDist must be >= 1, got $maxDist")
    FieldRule(col, (a, b) => levenshtein(a, b) <= lit(maxDist),
      wAgreePpm, wDisagreePpm)
  }

  /** Jaro–Winkler band comparator — THE standard name comparator
    * (Winkler 1990; the m/u weights of his 1988 EM estimator were
    * calibrated on exactly this similarity): agreement = jw ≥
    * minSimPpm/1e6. Engine-exact decision by construction: the kernel
    * ([[graft.functions.TextKernels.jaroWinklerSim]]) is pinned
    * BIT-IDENTICAL to DuckDB's `jaro_winkler_similarity` (live-DuckDB
    * fuzz in JwParitySpec), and the threshold double minSimPpm/1e6
    * equals the oracle's decimal literal (both are
    * correctly-rounded from exact inputs) — identical doubles compared
    * with ≥ give identical booleans, so there is no boundary case.
    * Symmetric (jw(a,b) = jw(b,a): the matching window and prefix are
    * side-symmetric), per the [[FieldRule]] contract. */
  def jwBand(col: String, minSimPpm: Long, wAgreePpm: Long,
             wDisagreePpm: Long): FieldRule = {
    require(minSimPpm >= 1 && minSimPpm <= 1000000L,
      s"minSimPpm must be in [1, 1e6], got $minSimPpm")
    FieldRule(col, (a, b) => graft.functions.text.jaroWinklerSim(a, b) >=
      lit(minSimPpm.toDouble / 1000000.0), wAgreePpm, wDisagreePpm)
  }

  /** TRUE Damerau–Levenshtein band comparator: agreement = DL distance
    * within `maxDist`. The transposition-aware [[editBand]] — a
    * swapped adjacent character pair ("10" → "01", the classic data-
    * entry error Damerau 1964 measured at >80% of misspellings
    * together with the single-char edits) costs 1 where levenshtein
    * charges 2. The kernel
    * ([[graft.functions.TextKernels.damerauLevenshtein]]) is pinned to
    * DuckDB's `damerau_levenshtein` (Lowrance–Wagner, byte-based) and
    * returns exact integers, so the band replays with no float
    * contract. Symmetric, per the [[FieldRule]] contract. */
  def dlBand(col: String, maxDist: Int, wAgreePpm: Long,
             wDisagreePpm: Long): FieldRule = {
    require(maxDist >= 1, s"maxDist must be >= 1, got $maxDist")
    FieldRule(col, (a, b) => graft.functions.text.damerauLevenshtein(a, b)
      <= lit(maxDist), wAgreePpm, wDisagreePpm)
  }

  /** One side's projection for the blocked pair join: the id (tagged),
    * the block keys (join columns), and the comparator fields (tagged
    * so both sides survive the join). */
  private def sideProj(df: DataFrame, tag: String, idCol: String,
      blockCols: Seq[String], cols: Seq[String]): DataFrame =
    df.select(
      (col(idCol).as(s"id_$tag") +: blockCols.map(col)) ++
        cols.map(c => col(c).as(s"__${tag}_$c")): _*)

  /** Per-field agreement predicates over a paired frame built from
    * [[sideProj]] sides. */
  private def agreeCols(cols: Seq[String],
      sames: Seq[(Column, Column) => Column]): Seq[Column] =
    cols.zip(sames).map { case (c, same) =>
      coalesce(same(col(s"__a_$c"), col(s"__b_$c")), lit(false)) }

  /** Blocked candidate pairs with their agreement pattern — the shared
    * front half of scoring and EM estimation. Pair work is Σ_b |b|². */
  private def pairedWithPattern(df: DataFrame, idCol: String,
      blockCols: Seq[String], cols: Seq[String],
      sames: Seq[(Column, Column) => Column]): (DataFrame, Seq[Column]) = {
    require(blockCols.nonEmpty, "linkage needs at least one block key")
    require(cols.nonEmpty, "linkage needs at least one field rule")
    // Gated parallelism repair (Repartitioning scaladoc): the block
    // join broadcasts one side and streams the other directly off the
    // scan, so a single-split input serializes EVERY comparator
    // evaluation (Σ_b |b|² levenshtein/jw/dl calls in one task). On a
    // healthy multi-split layout the gate declines and the plan is
    // unchanged.
    val src = Repartitioning.ensureParallelism(df, col(idCol))
    val paired = sideProj(src, "a", idCol, blockCols, cols)
      .join(sideProj(src, "b", idCol, blockCols, cols), blockCols)
      .filter(col("id_a") < col("id_b"))
    (paired, agreeCols(cols, sames))
  }

  def scorePairs(df: DataFrame, idCol: String, blockCols: Seq[String],
                 rules: Seq[FieldRule], thresholdPpm: Long): DataFrame = {
    val (paired, agrees) = pairedWithPattern(df, idCol, blockCols,
      rules.map(_.col), rules.map(_.same))
    scoreAndCut(paired, agrees, rules, thresholdPpm)
  }

  /** Shared scoring tail: agreement pattern + weight sum + threshold
    * cut over an already-paired frame. */
  private def scoreAndCut(paired: DataFrame, agrees: Seq[Column],
      rules: Seq[FieldRule], thresholdPpm: Long): DataFrame = {
    val score = rules.zip(agrees).map { case (r, ok) =>
      when(ok, lit(r.wAgreePpm)).otherwise(lit(-r.wDisagreePpm))
    }.reduce(_ + _)
    val pattern = concat(agrees.map(ok => when(ok, lit("A")).otherwise(lit("D"))): _*)
    paired
      .withColumn("pattern", pattern)
      .withColumn("score_ppm", score.cast("long"))
      .filter(col("score_ppm") >= thresholdPpm)
      .select(col("id_a"), col("id_b"), col("pattern"), col("score_ppm"))
  }

  /** MULTI-PASS (disjunctive) blocking (Christen 2012 ch. 4): run
    * SEVERAL blocking passes and score the UNION of their candidate
    * pairs — the production ER posture, because one conjunctive key's
    * pair completeness is never 1.0 on dirty data (a typo in the block
    * field hides the pair from that pass; a second key over different
    * fields recovers it). Each element of `blockKeys` is one pass's
    * conjunctive key. Candidate pairs are deduplicated on (id_a, id_b)
    * BEFORE scoring, so a pair found by two passes scores once; output
    * and semantics otherwise equal [[scorePairs]] — with a single pass
    * the result is identical.
    *
    * Scale shape: each pass is its own block equi-join producing only
    * (id_a, id_b) — Σ_pass Σ_b |b|², the same bound as running
    * scorePairs per pass; the dedup is one shuffle of the pair-id set
    * (blocked-bounded, never corpus²); comparator fields arrive AFTER
    * the dedup via two id-keyed equi-joins, so each comparator
    * evaluates once per unique pair, not once per pass. */
  def scorePairsMultiBlock(df: DataFrame, idCol: String,
      blockKeys: Seq[Seq[String]], rules: Seq[FieldRule],
      thresholdPpm: Long): DataFrame = {
    require(blockKeys.nonEmpty, "multi-block linkage needs at least one pass")
    require(rules.nonEmpty, "linkage needs at least one field rule")
    scoreIdPairs(df, idCol, multiBlockPairs(df, idCol, blockKeys), rules,
      thresholdPpm)
  }

  /** The deduplicated (id_a < id_b) candidate-pair union of a multi-pass
    * equality blocking scheme — the shared front of
    * [[scorePairsMultiBlock]], [[blockingQualityMulti]], and the hybrid
    * scheme. Σ_pass Σ_b |b|² pair work; the dedup shuffles only pair
    * ids. */
  private def multiBlockPairs(df: DataFrame, idCol: String,
      blockKeys: Seq[Seq[String]]): DataFrame =
    blockKeys.map { bk =>
      require(bk.nonEmpty, "every blocking pass needs at least one column")
      df.select(col(idCol).as("id_a") +: bk.map(col): _*)
        .join(df.select(col(idCol).as("id_b") +: bk.map(col): _*), bk)
        .filter(col("id_a") < col("id_b"))
        .select(col("id_a"), col("id_b"))
    }.reduce(_.unionByName(_)).distinct()

  /** Shared scoring tail over a bare (id_a, id_b) candidate frame:
    * comparator fields arrive via two id-keyed equi-joins (each
    * comparator evaluates once per unique pair), then the
    * [[scoreAndCut]] finish. */
  private def scoreIdPairs(df: DataFrame, idCol: String, pairs: DataFrame,
      rules: Seq[FieldRule], thresholdPpm: Long): DataFrame = {
    val cols = rules.map(_.col)
    val fa = df.select(col(idCol).as("id_a") +:
      cols.map(c => col(c).as(s"__a_$c")): _*)
    val fb = df.select(col(idCol).as("id_b") +:
      cols.map(c => col(c).as(s"__b_$c")): _*)
    val paired = pairs.join(fa, "id_a").join(fb, "id_b")
    scoreAndCut(paired, agreeCols(cols, rules.map(_.same)), rules,
      thresholdPpm)
  }

  /** Global dense row rank over `orderCols` (must be a total order —
    * append the id as tie-break) WITHOUT a single-task window: one
    * range-partitioned shuffle, per-partition counts rolled into
    * prefix offsets (a partition-count-sized window), rank = prefix +
    * local row_number. */
  private def globalRank(df: DataFrame, orderCols: Seq[String]): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val parts = df.repartitionByRange(orderCols.map(c => col(c).asc): _*)
      .withColumn("__pid", spark_partition_id())
    val prefix = parts.groupBy(col("__pid")).agg(count(lit(1)).as("__pn"))
      .withColumn("__prefix", coalesce(sum(col("__pn")).over(
        Window.orderBy(col("__pid").asc)
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .drop("__pn")
    val wLocal = Window.partitionBy(col("__pid"))
      .orderBy(orderCols.map(c => col(c).asc): _*)
    parts.join(broadcast(prefix), Seq("__pid"))
      .withColumn("__rank", col("__prefix") + row_number().over(wLocal))
      .drop("__pid", "__prefix")
  }

  /** SORTED-NEIGHBORHOOD blocking (Hernández & Stolfo 1998): order the
    * corpus by a sorting key and pair every record with its `window−1`
    * successors in that order. The classic complement to equality
    * blocking — a typo ANYWHERE after the first sort-key character
    * still lands near its original in the sorted order, where an
    * equality block key would send it to a different block entirely.
    * Candidate pairs ≤ n·(window−1) BY CONSTRUCTION — the knob bounds
    * pair work linearly in corpus size, with no hot-block quadratic.
    * Output and scoring semantics match [[scorePairs]], with id_a the
    * LOWER-RANKED record of each pair (comparators are symmetric per
    * the [[FieldRule]] contract, so orientation does not affect the
    * score; the oracle replays the same rank orientation).
    *
    * Scale shape: the global order is ONE range-partitioned shuffle
    * (rank = partition-prefix + local row_number — no single-task
    * window; the prefix roll-up window is partition-count-sized);
    * pairing is two rank-bucket equi-joins (bucket = rank div window:
    * a successor within window−1 ranks lives in the same bucket or the
    * next one), so each record meets ≤ 2·window candidates; comparator
    * fields arrive via two id-keyed joins after pair generation. */
  def scorePairsSortedNeighborhood(df: DataFrame, idCol: String,
      sortKey: Seq[String], window: Int, rules: Seq[FieldRule],
      thresholdPpm: Long): DataFrame = {
    require(sortKey.nonEmpty, "sorted-neighborhood needs a sort key")
    require(window >= 2, s"window must be >= 2, got $window")
    require(rules.nonEmpty, "linkage needs at least one field rule")
    scoreIdPairs(df, idCol,
      sortedNeighborhoodPairs(df, idCol, sortKey, window), rules,
      thresholdPpm)
  }

  /** The rank-oriented (id_a = lower-ranked) candidate pairs of a
    * sorted-neighborhood pass — the shared front of
    * [[scorePairsSortedNeighborhood]] and the hybrid scheme. Bucket ids
    * use INTEGER division (`div`, not the float `/`), so the
    * same-or-next-bucket invariant the pair join relies on is exact by
    * construction at any rank — a float floor is only guaranteed up to
    * ~2^52/window. ≤ n·(window−1) pairs by construction. */
  private def sortedNeighborhoodPairs(df: DataFrame, idCol: String,
      sortKey: Seq[String], window: Int): DataFrame =
    snPairsFromRanked(globalRank(
      df.select((idCol +: sortKey).distinct.map(col): _*),
      sortKey :+ idCol), idCol, window)

  /** The rank-bucket pair join over an ALREADY-ranked frame (idCol,
    * __rank) — split out so callers that need the rank frame for other
    * joins too ([[blockingQualityHybrid]]) can compute it once. */
  private def snPairsFromRanked(ranked: DataFrame, idCol: String,
      window: Int): DataFrame = {
    val a = ranked.select(col(idCol).as("id_a"), col("__rank").as("__ra"),
      expr(s"__rank div $window").as("__ba"))
    val b = ranked.select(col(idCol).as("id_b"), col("__rank").as("__rb"),
      expr(s"__rank div $window").as("__bb"))
    val near = (lo: Column, hi: Column) =>
      hi - lo >= 1 && hi - lo <= window - 1
    a.join(b, col("__ba") === col("__bb") &&
        near(col("__ra"), col("__rb")))
      .select(col("id_a"), col("id_b"))
      .unionByName(a.join(b, col("__ba") + 1 === col("__bb") &&
          near(col("__ra"), col("__rb")))
        .select(col("id_a"), col("id_b")))
  }

  /** HYBRID disjunctive candidate generation (Christen 2012 ch. 4's
    * recommendation to MIX scheme types): the union of a multi-pass
    * EQUALITY blocking's and a SORTED-NEIGHBORHOOD pass's candidate
    * pairs, deduplicated on (id_a, id_b) before scoring — the
    * production ER posture, because the two schemes' miss profiles are
    * complementary (a typo in the block field hides a pair from every
    * equality pass but leaves it near its original in the sorted order;
    * a typo in the sort key's first characters moves a record far in
    * the order but leaves other block fields intact). Candidate pairs
    * are CANONICALIZED to id_a < id_b before the union (the
    * sorted-neighborhood front orients by rank), so the cross-scheme
    * dedup is exact; scoring orientation is immaterial because field
    * comparators are symmetric per the [[FieldRule]] contract. With an
    * empty sortKey contribution this degrades to
    * [[scorePairsMultiBlock]]; output and semantics otherwise match
    * [[scorePairs]].
    *
    * Scale shape: Σ_pass Σ_b |b|² + n·(window−1) candidate pairs — each
    * front keeps its own bound; the dedup shuffles only pair ids;
    * comparator fields arrive once per unique pair via two id-keyed
    * joins ([[scoreIdPairs]]). */
  def scorePairsHybrid(df: DataFrame, idCol: String,
      blockKeys: Seq[Seq[String]], sortKey: Seq[String], window: Int,
      rules: Seq[FieldRule], thresholdPpm: Long): DataFrame = {
    require(blockKeys.nonEmpty, "hybrid linkage needs at least one equality pass")
    require(sortKey.nonEmpty, "hybrid linkage needs a sort key")
    require(window >= 2, s"window must be >= 2, got $window")
    require(rules.nonEmpty, "linkage needs at least one field rule")
    val sn = sortedNeighborhoodPairs(df, idCol, sortKey, window)
      .select(least(col("id_a"), col("id_b")).as("id_a"),
        greatest(col("id_a"), col("id_b")).as("id_b"))
    val pairs = multiBlockPairs(df, idCol, blockKeys)
      .unionByName(sn).distinct()
    scoreIdPairs(df, idCol, pairs, rules, thresholdPpm)
  }

  /** INCREMENTAL sorted-neighborhood candidate generation — the SN
    * analog of [[linkIncremental]]'s no-rescan posture: an ingest batch
    * inserts into the corpus's sort order and pairs ONLY with its
    * rank-neighbors in the MERGED order (both batch×existing and
    * batch×batch sides), never regenerating existing×existing pairs.
    * Returns the new candidate pairs (id_a = lower-ranked, every pair
    * has ≥ 1 batch side); ids must be disjoint across the two frames
    * (enforced loudly, the [[linkIncremental]] contract).
    *
    * UNLIKE [[linkIncremental]], exact batch-vs-full parity does NOT
    * carry here, and CANNOT: inserting a batch record into the order
    * shifts ranks, and a batch row that lands between two existing
    * records can push one past the other's window — the full re-run
    * then LOSES that existing×existing pair, while the incremental run
    * keeps whatever was already decided. What DOES hold, and what this
    * operator guarantees (spec-pinned with a divergence witness), is
    * CONTAINMENT: rank distances between existing records only GROW
    * under insertion, so every existing×existing pair of the full
    * re-run was already a pair of the prior run, and every other full
    * pair has a batch side and is generated here —
    *   fullPairs(existing ∪ batch) ⊆ priorPairs(existing) ∪ newPairs.
    * Union the scored new pairs with the retained prior links and the
    * incremental corpus is a SUPERSET of the full re-run's links — the
    * monotone "no decided link is forgotten on ingest" semantics, which
    * is the production curation posture (equality on append-only sort
    * keys, e.g. monotone ingest timestamps, where no squeeze can
    * occur). A curator wanting strict full-run semantics re-runs
    * [[scorePairsSortedNeighborhood]] over the union.
    *
    * LOUD CONTRACTS, both EAGER at DataFrame-construction time (two
    * bounded Spark jobs before any action on the result — the
    * documented price of failing at the call site instead of deep in a
    * downstream stage): (1) batch ids must be DISJOINT from existing
    * ids (left-semi emptiness probe, short-circuited at the first
    * hit); (2) batch ids must be UNIQUE (one single-row count vs
    * count-distinct aggregate over the batch) — a duplicated batch id
    * would silently enter the rank order twice and multiply its
    * candidate pairs, corrupting the scored output with no visible
    * symptom. [[linkIncrementalSortedNeighborhood]] re-triggers both
    * probes on every call.
    *
    * Scale shape: ONE [[globalRank]] pass over the union (rank only —
    * no pairing); the batch-sided cut happens on the bare pair-id
    * frame BEFORE comparator fields attach, so scoring work is
    * ~ |batch|·2(w−1), not corpus-sized; the anti-join cut is against
    * the batch id set (batch-sized broadcast). */
  def sortedNeighborhoodPairsIncremental(existing: DataFrame,
      batch: DataFrame, idCol: String, sortKey: Seq[String],
      window: Int): DataFrame = {
    require(sortKey.nonEmpty, "sorted-neighborhood needs a sort key")
    require(window >= 2, s"window must be >= 2, got $window")
    // BOTH loud contracts (batch∩existing = ∅; batch ids unique and
    // non-null) in ONE eager probe job — the old shape paid two
    // driver actions (a left-semi isEmpty + a count/countDistinct
    // agg), re-scanning the batch twice and existing once more per
    // call (r19 ADVICE perf note). Same contract, same construction-
    // time IllegalArgumentException, half the probe cost: one
    // side-tagged union, one id-keyed count, one roll-up.
    //   - a NULL batch id is a uniqueness violation (it can't be
    //     paired back), and NULLs are EXCLUDED from the collision
    //     count — the old left-semi join never matched NULLs, so a
    //     NULL-vs-NULL overlap stays a "unique" error, not "disjoint"
    val probe = batch.select(col(idCol).as("__id"), lit(1).as("__s"))
      .unionByName(existing.select(col(idCol).as("__id"), lit(2).as("__s")))
      .groupBy(col("__id"))
      .agg(sum(when(col("__s") === 1, 1L).otherwise(0L)).as("__nb"),
        sum(when(col("__s") === 2, 1L).otherwise(0L)).as("__ne"))
      .agg(
        sum(when(col("__nb") > 0 && col("__ne") > 0 &&
          col("__id").isNotNull, 1L).otherwise(0L)).as("colls"),
        sum(when(col("__nb") > 1, 1L).otherwise(0L)).as("dups"),
        sum(when(col("__id").isNull, col("__nb")).otherwise(0L)).as("nulls"))
      .head()
    require(probe.getLong(0) == 0L,
      "sortedNeighborhoodPairsIncremental: batch ids must be disjoint " +
      s"from existing ids (re-key the batch) — ${probe.getLong(0)} " +
      "colliding id(s)")
    require(probe.getLong(1) == 0L && probe.getLong(2) == 0L,
      "sortedNeighborhoodPairsIncremental: batch ids must be unique " +
      s"and non-null — got ${probe.getLong(1)} duplicated and " +
      s"${probe.getLong(2)} NULL id(s); a duplicated id multiplies its " +
      "candidate pairs silently (distinct the batch or re-key it)")
    val union = existing.select((idCol +: sortKey).distinct.map(col): _*)
      .unionByName(batch.select((idCol +: sortKey).distinct.map(col): _*))
    val batchIds = batch.select(col(idCol))
    // pairs in the merged order, cut to those touching a batch id:
    // drop pairs whose BOTH sides are existing (one anti-join per side
    // would mis-cut — a pair survives iff either side is in the batch)
    sortedNeighborhoodPairs(union, idCol, sortKey, window)
      .join(batchIds.select(col(idCol).as("id_a"))
          .withColumn("__ba", lit(true)), Seq("id_a"), "left")
      .join(batchIds.select(col(idCol).as("id_b"))
          .withColumn("__bb", lit(true)), Seq("id_b"), "left")
      .filter(coalesce(col("__ba"), lit(false)) ||
        coalesce(col("__bb"), lit(false)))
      .select(col("id_a"), col("id_b"))
  }

  /** [[linkIncremental]]'s decision tail over the SN front: score the
    * incremental candidate pairs with the field rules and return the
    * links — union with the retained prior links for the monotone
    * incremental corpus (see [[sortedNeighborhoodPairsIncremental]] for
    * the containment guarantee and the documented divergence from a
    * full re-run). Comparators must be symmetric per the [[FieldRule]]
    * contract (pairs arrive rank-oriented). */
  def linkIncrementalSortedNeighborhood(existing: DataFrame,
      batch: DataFrame, idCol: String, sortKey: Seq[String], window: Int,
      rules: Seq[FieldRule], thresholdPpm: Long): DataFrame = {
    require(rules.nonEmpty, "linkage needs at least one field rule")
    val cols = (idCol +: rules.map(_.col)).distinct
    val union = existing.select(cols.map(col): _*)
      .unionByName(batch.select(cols.map(col): _*))
    scoreIdPairs(union, idCol,
      sortedNeighborhoodPairsIncremental(existing, batch, idCol, sortKey,
        window), rules, thresholdPpm)
  }

  /** INCREMENTAL HYBRID candidate generation — the ingest-batch analog
    * of [[scorePairsHybrid]], unioning the two incremental fronts the
    * way the batch hybrid unions the two batch fronts:
    *   - the EQUALITY front ([[linkIncremental]]'s shape): per blocking
    *     pass, batch×existing block matches plus the batch-internal
    *     id_a < id_b triangle — never existing×existing;
    *   - the SORTED-NEIGHBORHOOD front:
    *     [[sortedNeighborhoodPairsIncremental]]'s rank-neighbor pairs
    *     in the merged order, every pair touching ≥ 1 batch id.
    * Both fronts are canonicalized to id_a < id_b and deduplicated on
    * the pair id BEFORE any scoring — one score per unique pair, the
    * [[scorePairsHybrid]] discipline.
    *
    * The CONTRACT is exactly the INTERSECTION of the two fronts'
    * guarantees, stated precisely:
    *   - EQUALITY side EXACT: an equality block never shifts under
    *     insertion, so every full-re-run equality pair with ≥ 1 batch
    *     side is generated here, and every existing×existing equality
    *     pair was already a prior-run pair (the [[linkIncremental]]
    *     quotient argument needs no window geometry);
    *   - SN side CONTAINMENT: rank distances between existing records
    *     only grow under insertion, so
    *       fullHybridPairs(existing ∪ batch)
    *         ⊆ priorHybridPairs(existing) ∪ thesePairs,
    *     with exact parity when the batch's sort keys are append-only
    *     (no squeeze — see [[sortedNeighborhoodPairsIncremental]] for
    *     the divergence witness); union with the retained prior links
    *     for the monotone "no decided link forgotten" corpus.
    * Inherits the SN front's loud eager contracts (batch ids disjoint
    * from existing, unique, non-null).
    *
    * Scale shape: equality pairs are Σ_pass (Σ_b |batch_b|·|existing_b|
    * + Σ_b |batch_b|²) — the batch-sided block join AQE broadcasts;
    * SN pairs ~ |batch|·2(window−1); the cross-front dedup shuffles
    * only pair ids; comparator fields attach once per unique pair. */
  def hybridPairsIncremental(existing: DataFrame, batch: DataFrame,
      idCol: String, blockKeys: Seq[Seq[String]], sortKey: Seq[String],
      window: Int): DataFrame = {
    require(blockKeys.nonEmpty, "hybrid linkage needs at least one equality pass")
    val eq = blockKeys.map { bk =>
      require(bk.nonEmpty, "every blocking pass needs at least one column")
      val cross = batch.select(col(idCol).as("id_a") +: bk.map(col): _*)
        .join(existing.select(col(idCol).as("id_b") +: bk.map(col): _*), bk)
        .select(col("id_a"), col("id_b"))
      val bb = batch.select(col(idCol).as("id_a") +: bk.map(col): _*)
        .join(batch.select(col(idCol).as("id_b") +: bk.map(col): _*), bk)
        .filter(col("id_a") < col("id_b"))
        .select(col("id_a"), col("id_b"))
      cross.unionByName(bb)
    }.reduce(_.unionByName(_))
    eq.unionByName(
        sortedNeighborhoodPairsIncremental(existing, batch, idCol,
          sortKey, window))
      .select(least(col("id_a"), col("id_b")).as("id_a"),
        greatest(col("id_a"), col("id_b")).as("id_b"))
      .distinct()
  }

  /** The decision tail over [[hybridPairsIncremental]]: score the
    * deduplicated incremental hybrid candidates with the field rules
    * over the union frame and return the links (same output row as
    * [[scorePairs]]). Comparators must be symmetric per the
    * [[FieldRule]] contract (pairs arrive canonicalized, not
    * rank-oriented). */
  def linkIncrementalHybrid(existing: DataFrame, batch: DataFrame,
      idCol: String, blockKeys: Seq[Seq[String]], sortKey: Seq[String],
      window: Int, rules: Seq[FieldRule], thresholdPpm: Long): DataFrame = {
    require(rules.nonEmpty, "linkage needs at least one field rule")
    val cols = (idCol +: rules.map(_.col)).distinct
    val union = existing.select(cols.map(col): _*)
      .unionByName(batch.select(cols.map(col): _*))
    scoreIdPairs(union, idCol,
      hybridPairsIncremental(existing, batch, idCol, blockKeys, sortKey,
        window), rules, thresholdPpm)
  }

  private val M = 1000000L
  private def clampPpm(x: Long): Long = math.max(1L, math.min(M - 1, x))

  /** Fixed-iteration EM over agreement-PATTERN counts (Winkler 1988's
    * estimator for the Fellegi–Sunter m/u probabilities under
    * conditional independence) in pure ppm-integer arithmetic: every
    * product is `a * b div 1e6` folded left in field order, every ratio
    * is a truncating integer division — so the whole trajectory replays
    * bit-for-bit in any engine with 64-bit integer division (the same
    * determinism contract as the DP cutpoint bake). The ×1000/÷1000
    * split in the M-step keeps `Σ n·w × 1e6` out of Int64 overflow up
    * to ~9e9 pairs at the cost of three trailing digits — identical
    * truncation on both sides, so still oracle-exact.
    *
    * Input: (patternString, count) rows, pattern = 'A'/'D' per field.
    * Returns (pPpm, mPpm per field, uPpm per field) after `iters`
    * iterations, each clamped to [1, 1e6-1] so no class degenerates.
    */
  def emEstimate(patternCounts: Seq[(String, Long)], k: Int, iters: Int,
                 initPPpm: Long = 100000L, initMPpm: Long = 900000L,
                 initUPpm: Long = 100000L): (Long, Array[Long], Array[Long]) = {
    require(patternCounts.nonEmpty, "EM needs at least one pattern row")
    require(patternCounts.forall(_._1.length == k), s"patterns must have $k fields")
    var p = initPPpm
    val m = Array.fill(k)(initMPpm)
    val u = Array.fill(k)(initUPpm)
    val bits = patternCounts.map { case (s, n) =>
      (s.map(c => if (c == 'A') 1 else 0).toArray, n) }
    for (_ <- 0 until iters) {
      val rows = bits.map { case (b, n) =>
        (b, n, posteriorPpm(b, p, m, u)) }
      val nTot = rows.map(_._2).sum
      val w = rows.map { case (_, n, wp) => n * wp }.sum
      val uDen = nTot * M - w
      val (m1, u1) = (0 until k).map { i =>
        val mNum = rows.collect { case (b, n, wp) if b(i) == 1 => n * wp }.sum
        val uNum = rows.collect { case (b, n, wp) if b(i) == 1 => n * (M - wp) }.sum
        (clampPpm(mNum * 1000L / math.max(w / 1000L, 1L)),
         clampPpm(uNum * 1000L / math.max(uDen / 1000L, 1L)))
      }.unzip
      p = clampPpm(w / nTot)
      (0 until k).foreach { i => m(i) = m1(i); u(i) = u1(i) }
    }
    (p, m, u)
  }

  /** Match posterior of one agreement pattern under (p, m, u), the same
    * ppm fold the EM E-step uses. */
  def posteriorPpm(patternBits: Array[Int], pPpm: Long,
                   mPpm: Array[Long], uPpm: Array[Long]): Long = {
    var pm = M; var pu = M
    for (i <- patternBits.indices) {
      pm = pm * (if (patternBits(i) == 1) mPpm(i) else M - mPpm(i)) / M
      pu = pu * (if (patternBits(i) == 1) uPpm(i) else M - uPpm(i)) / M
    }
    val num = pPpm * pm / M
    val alt = (M - pPpm) * pu / M
    num * M / math.max(num + alt, 1L)
  }

  /** The full Fellegi–Sunter THREE-WAY decision (the 1969 paper's
    * actual output): pairs at or above `upperPpm` are links, pairs in
    * [lowerPpm, upperPpm) go to CLERICAL REVIEW ("possible"), the rest
    * are non-links. Returns the triage summary — one row per
    * (pattern, decision) with the pair count and the pattern's score —
    * the report an ER operator reads to size the review queue before
    * committing thresholds.
    *
    * Scale shape: same blocked pair generation as [[scorePairs]],
    * then one map-side-combined groupBy over ≤ 2^k·3 rows. */
  def triage(df: DataFrame, idCol: String, blockCols: Seq[String],
             rules: Seq[FieldRule], lowerPpm: Long,
             upperPpm: Long): DataFrame = {
    require(lowerPpm <= upperPpm,
      s"triage thresholds out of order: $lowerPpm > $upperPpm")
    scorePairs(df, idCol, blockCols, rules, Long.MinValue + 1)
      .withColumn("decision",
        when(col("score_ppm") >= upperPpm, lit("link"))
          .when(col("score_ppm") >= lowerPpm, lit("possible"))
          .otherwise(lit("nonlink")))
      .groupBy(col("pattern"), col("decision"))
      .agg(count(lit(1)).as("n_pairs"), max(col("score_ppm")).as("score_ppm"))
  }

  /** Blocking-quality audit (Christen 2012, "Data Matching", ch. 4's
    * standard pair-level metrics): how good a blocking scheme is,
    * BEFORE any scoring runs —
    *   - reduction ratio = 1 − candidates / allPairs, the share of the
    *     quadratic the blocking prunes (allPairs = N(N−1)/2);
    *   - pair completeness = captured / |truth|, the share of TRUE
    *     pairs the blocking keeps reachable (a conjunctive block key
    *     captures a pair iff both sides agree on every block column).
    * All exact ppm integers. One output row: n_records,
    * n_candidate_pairs, n_true_pairs, n_captured, reduction_ppm,
    * completeness_ppm. `truePairs` is the planted/labelled truth set
    * (id_a, id_b) — CANONICALIZED here: each pair is reordered to
    * (least, greatest) and deduplicated, so reversed or repeated truth
    * rows cannot double-count (ids must be non-null). The reduction
    * ratio self-switches on overflow (the HHI CASE, identical in the
    * oracle), so candidate counts past 9e12 stay exact to the divisor
    * truncation; allPairs = N(N−1)/2 itself must fit Int64
    * (N ≤ ~4.3e9 records; shard the audit beyond).
    *
    * Scale shape: candidates come from one map-side-combined block
    * count (Σ_b c_b(c_b−1)/2 — never materializing the pairs);
    * completeness is two id-keyed equi-joins of the truth set (truth
    * is label-sized); the three single-row frames meet on broadcasts.
    *
    * Eager + scope-bound: construction launches Spark jobs (Dedup.materializeShared
    * inside); when built inside a withCandidateScope, the terminal action must
    * run before scope exit or the materialized blocks are already freed. */
  def blockingQuality(df: DataFrame, idCol: String, blockCols: Seq[String],
                      truePairs: DataFrame): DataFrame = {
    require(blockCols.nonEmpty, "blocking audit needs block columns")
    // the narrow (id, block-key) frame feeds four subtrees (the
    // candidate-count aggregate, the record count, and both truth
    // joins) — materialize once so the corpus derivation runs once
    // (scope-tracked eager checkpoint, the wedge-tier discipline)
    val keyed = Dedup.materializeShared(df.select(col(idCol).as("__id"),
      // struct, not string concat: two different column tuples can
      // concat to the same string, a struct cannot
      struct(blockCols.map(col): _*).as("__blk")))
    val cand = keyed.groupBy(col("__blk")).agg(count(lit(1)).as("__c"))
      .agg(coalesce(sum(expr("__c * (__c - 1) div 2")), lit(0L))
        .as("n_candidate_pairs"))
    val tot = keyed.agg(count(lit(1)).as("n_records"))
    val cap = canonicalTruth(truePairs)
      .join(keyed.select(col("__id").as("id_a"), col("__blk").as("__ba")),
        Seq("id_a"))
      .join(keyed.select(col("__id").as("id_b"), col("__blk").as("__bb")),
        Seq("id_b"))
      .agg(count(lit(1)).as("n_true_pairs"),
        count(when(col("__ba") === col("__bb"), 1)).as("n_captured"))
    qualityFinish(tot, cand, cap)
  }

  /** Canonicalize a truth-pair frame: (least, greatest) id order +
    * distinct, so reversed or repeated rows count once. */
  private def canonicalTruth(truePairs: DataFrame): DataFrame =
    truePairs.select(
      least(col("id_a"), col("id_b")).as("id_a"),
      greatest(col("id_a"), col("id_b")).as("id_b")).distinct()

  /** Shared ppm finish of the blocking audits: reduction ratio with
    * the self-switching overflow split, guarded completeness. */
  private def qualityFinish(tot: DataFrame, cand: DataFrame,
      cap: DataFrame): DataFrame =
    tot.crossJoin(broadcast(cand)).crossJoin(broadcast(cap))
      .select(col("n_records"), col("n_candidate_pairs"),
        col("n_true_pairs"), col("n_captured"),
        expr("CASE WHEN n_records < 2 THEN 1000000L " +
          "WHEN n_candidate_pairs <= 9000000000000L THEN " +
          "1000000L - n_candidate_pairs * 1000000L div " +
          "(n_records * (n_records - 1) div 2) " +
          "ELSE 1000000L - " +
          "((n_candidate_pairs div (n_records * (n_records - 1) div 2)) " +
          "* 1000000L + (n_candidate_pairs % " +
          "(n_records * (n_records - 1) div 2)) div " +
          "greatest((n_records * (n_records - 1) div 2) div 1000000L, 1L)) " +
          "END").as("reduction_ppm"),
        expr("CASE WHEN n_true_pairs = 0 THEN 1000000L ELSE " +
          "n_captured * 1000000L div n_true_pairs END")
          .as("completeness_ppm"))

  /** [[blockingQuality]] for a MULTI-PASS (disjunctive) scheme — the
    * audit that justifies adding a second blocking pass: candidates =
    * |union of the per-pass pair sets| (deduplicated, matching what
    * [[scorePairsMultiBlock]] actually scores), a truth pair is
    * captured iff ANY pass agrees on its full conjunctive key. Same
    * output row and ppm arithmetic as the single-pass audit; with one
    * pass the two are identical.
    *
    * Scale shape: unlike the single-pass audit (a map-side block-count
    * sum), the cross-pass dedup REQUIRES materializing the pair-id
    * union — the audit costs what the multi-block scorer's pair
    * generation costs (blocked-bounded, never corpus²); completeness
    * stays two label-sized equi-joins against the per-pass key
    * structs.
    *
    * Eager + scope-bound: construction launches Spark jobs (Dedup.materializeShared
    * inside); when built inside a withCandidateScope, the terminal action must
    * run before scope exit or the materialized blocks are already freed. */
  def blockingQualityMulti(df: DataFrame, idCol: String,
      blockKeys: Seq[Seq[String]], truePairs: DataFrame): DataFrame = {
    require(blockKeys.nonEmpty, "blocking audit needs at least one pass")
    val pairs = blockKeys.map { bk =>
      require(bk.nonEmpty, "every blocking pass needs at least one column")
      df.select(col(idCol).as("id_a") +: bk.map(col): _*)
        .join(df.select(col(idCol).as("id_b") +: bk.map(col): _*), bk)
        .filter(col("id_a") < col("id_b"))
        .select(col("id_a"), col("id_b"))
    }.reduce(_.unionByName(_)).distinct()
    val cand = pairs.agg(count(lit(1)).as("n_candidate_pairs"))
    val tot = df.agg(count(lit(1)).as("n_records"))
    // both truth joins read this narrow pass-key frame — materialize
    // once so the corpus derivation runs once
    val keyed = Dedup.materializeShared(
      df.select(col(idCol).as("__id") +:
        blockKeys.zipWithIndex.map { case (bk, i) =>
          struct(bk.map(col): _*).as(s"__blk$i") }: _*))
    val idxs = blockKeys.indices
    val cap = canonicalTruth(truePairs)
      .join(keyed.select(col("__id").as("id_a") +:
        idxs.map(i => col(s"__blk$i").as(s"__ba$i")): _*), Seq("id_a"))
      .join(keyed.select(col("__id").as("id_b") +:
        idxs.map(i => col(s"__blk$i").as(s"__bb$i")): _*), Seq("id_b"))
      .agg(count(lit(1)).as("n_true_pairs"),
        count(when(idxs.map(i => col(s"__ba$i") === col(s"__bb$i"))
          .reduce(_ || _), 1)).as("n_captured"))
    qualityFinish(tot, cand, cap)
  }

  /** [[blockingQuality]] for a SORTED-NEIGHBORHOOD scheme — the audit
    * that sizes `window` before [[scorePairsSortedNeighborhood]] runs:
    * candidates come from the CLOSED FORM (every record pairs with its
    * ≤ window−1 rank successors: n(w−1) − w(w−1)/2 for n ≥ w, else
    * n(n−1)/2 — never materialized), a truth pair is captured iff its
    * two records sit within window−1 GLOBAL RANKS of each other. Same
    * output row, truth canonicalization, and ppm arithmetic as the
    * blocking audits.
    *
    * Scale shape: one [[globalRank]] pass (range-partitioned shuffle,
    * no single-task window); completeness is two label-sized equi-joins
    * of the truth set against the rank frame; candidates are pure
    * arithmetic on the single-row count.
    *
    * Eager + scope-bound: construction launches Spark jobs (Dedup.materializeShared
    * inside); when built inside a withCandidateScope, the terminal action must
    * run before scope exit or the materialized blocks are already freed. */
  def blockingQualitySortedNeighborhood(df: DataFrame, idCol: String,
      sortKey: Seq[String], window: Int, truePairs: DataFrame): DataFrame = {
    require(sortKey.nonEmpty, "sorted-neighborhood needs a sort key")
    require(window >= 2, s"window must be >= 2, got $window")
    // the narrow (id, rank) frame feeds the record count and both
    // truth joins — materialize once so the range shuffle + rank
    // windows run once, not three times
    val ranked = Dedup.materializeShared(globalRank(
      df.select((idCol +: sortKey).distinct.map(col): _*),
      sortKey :+ idCol)
      .select(col(idCol).as("__id"), col("__rank")))
    val tot = ranked.agg(count(lit(1)).as("n_records"))
    val w = window
    val cand = tot.select(expr(
      s"CASE WHEN n_records >= $w THEN " +
      s"n_records * ($w - 1) - $w * ($w - 1) div 2 " +
      "ELSE n_records * (n_records - 1) div 2 END")
      .as("n_candidate_pairs"))
    val cap = canonicalTruth(truePairs)
      .join(ranked.select(col("__id").as("id_a"), col("__rank").as("__ra")),
        Seq("id_a"))
      .join(ranked.select(col("__id").as("id_b"), col("__rank").as("__rb")),
        Seq("id_b"))
      .agg(count(lit(1)).as("n_true_pairs"),
        count(when(abs(col("__ra") - col("__rb")) <= w - 1, 1))
          .as("n_captured"))
    qualityFinish(tot, cand, cap)
  }

  /** [[blockingQuality]] for the HYBRID scheme — the audit that
    * justifies [[scorePairsHybrid]]: candidates = |equality-pass pair
    * union ∪ sorted-neighborhood pairs| (deduplicated across schemes,
    * matching exactly what the hybrid scorer scores), a truth pair is
    * captured iff ANY equality pass agrees on its full conjunctive key
    * OR its two records sit within window−1 global ranks. On a fixture
    * where the two schemes miss complementary pair classes, hybrid
    * completeness is strictly above both single-scheme audits — the
    * Christen ch. 4 argument, spec-pinned. Same output row, truth
    * canonicalization, and ppm arithmetic as the other audits.
    *
    * Scale shape: the cross-scheme dedup requires materializing both
    * pair-id sets (blocked-bounded + n·(window−1) — what the hybrid
    * scorer's pair generation costs anyway); completeness is two
    * label-sized equi-joins carrying the pass keys and the rank.
    *
    * Eager + scope-bound: construction launches Spark jobs (Dedup.materializeShared
    * inside); when built inside a withCandidateScope, the terminal action must
    * run before scope exit or the materialized blocks are already freed. */
  def blockingQualityHybrid(df: DataFrame, idCol: String,
      blockKeys: Seq[Seq[String]], sortKey: Seq[String], window: Int,
      truePairs: DataFrame): DataFrame = {
    require(blockKeys.nonEmpty, "hybrid audit needs at least one equality pass")
    require(sortKey.nonEmpty, "hybrid audit needs a sort key")
    require(window >= 2, s"window must be >= 2, got $window")
    // ONE materialized global rank serves the SN candidate front (two
    // rank-bucket join sides) AND the capture joins' rank attach — the
    // old shape ran the range shuffle + rank windows twice (once
    // inside sortedNeighborhoodPairs, once for `ranked`) and re-ran
    // them per consumer on top
    val rankedAll = Dedup.materializeShared(globalRank(
      df.select((idCol +: sortKey).distinct.map(col): _*),
      sortKey :+ idCol))
    val sn = snPairsFromRanked(rankedAll, idCol, window)
      .select(least(col("id_a"), col("id_b")).as("id_a"),
        greatest(col("id_a"), col("id_b")).as("id_b"))
    val pairs = multiBlockPairs(df, idCol, blockKeys)
      .unionByName(sn).distinct()
    val cand = pairs.agg(count(lit(1)).as("n_candidate_pairs"))
    val tot = df.agg(count(lit(1)).as("n_records"))
    val ranked = rankedAll.select(col(idCol).as("__id"), col("__rank"))
    val keyed = df.select(col(idCol).as("__id") +:
      blockKeys.zipWithIndex.map { case (bk, i) =>
        struct(bk.map(col): _*).as(s"__blk$i") }: _*)
      .join(ranked, Seq("__id"))
    val idxs = blockKeys.indices
    val cap = canonicalTruth(truePairs)
      .join(keyed.select(col("__id").as("id_a") +: col("__rank").as("__ra") +:
        idxs.map(i => col(s"__blk$i").as(s"__ba$i")): _*), Seq("id_a"))
      .join(keyed.select(col("__id").as("id_b") +: col("__rank").as("__rb") +:
        idxs.map(i => col(s"__blk$i").as(s"__bb$i")): _*), Seq("id_b"))
      .agg(count(lit(1)).as("n_true_pairs"),
        count(when(idxs.map(i => col(s"__ba$i") === col(s"__bb$i"))
            .reduce(_ || _) ||
          abs(col("__ra") - col("__rb")) <= window - 1, 1))
          .as("n_captured"))
    qualityFinish(tot, cand, cap)
  }

  /** INCREMENTAL linkage — the continuous-curation shape: every ingest
    * batch links against the EXISTING resolved corpus without ever
    * regenerating existing×existing pairs (the [[Dedup.incrementalNearDup]]
    * posture applied to ER). `existing` is the accepted source rows
    * (the persistable block index: project it to idCol + blockCols +
    * rule fields and write it as parquet partitioned by block);
    * `existingEntities` is the prior (entity_id, id) assignment from
    * [[resolveEntities]] over those rows. Ids must be disjoint across
    * the two sides (same contract as the dedup tier) — ENFORCED here
    * by a left-semi probe of the batch ids against the existing ids
    * (one column-pruned pass over the index, short-circuited at the
    * first hit): a colliding id would silently corrupt the quotient
    * graph and the output labels. Entity ids are min member ids, so
    * the existing-id check covers entity-node collisions too. Field
    * comparators must be symmetric (the [[FieldRule]] contract) —
    * cross pairs are scored batch-on-'a' in whatever id order they
    * arrive.
    *
    * Exactly equal to the full batch re-run by the QUOTIENT argument:
    * contracting each existing entity to its representative node
    * (entity_id = the cluster's min member id) preserves component
    * structure, because existing-side links are already complete and
    * every new edge lands on a batch id or an entity node. The final
    * label = min over quotient nodes = min(entity mins, batch ids) =
    * the true min member id — bit-for-bit the batch answer, including
    * when one new record BRIDGES two existing entities (they merge via
    * their entity nodes). Output: (entity_id, id) for every linked
    * member, existing and new — directly comparable to
    * [[resolveEntities]] over the union (the parity the oracle pins).
    *
    * Scale shape: batch-internal pairs are Σ_b |batch_b|²; cross pairs
    * are a block equi-join of the batch-sized probe against the
    * existing index (AQE broadcasts the probe side); the component
    * pass rides [[Dedup.componentsAuto]] over link-rate-sized edges;
    * the relabel is one entity-keyed equi-join. Nothing rescans
    * existing×existing. */
  def linkIncremental(existing: DataFrame, existingEntities: DataFrame,
      batch: DataFrame, idCol: String, blockCols: Seq[String],
      rules: Seq[FieldRule], thresholdPpm: Long): DataFrame = {
    require(blockCols.nonEmpty, "linkage needs at least one block key")
    require(rules.nonEmpty, "linkage needs at least one field rule")
    require(batch.select(col(idCol))
      .join(existing.select(col(idCol)), Seq(idCol), "left_semi").isEmpty,
      "linkIncremental: batch ids must be disjoint from existing ids — " +
      "a colliding id corrupts the quotient graph (re-key the batch)")
    val cols = rules.map(_.col)
    // batch-internal links: the standard id_a < id_b triangle
    val bb = scorePairs(batch, idCol, blockCols, rules, thresholdPpm)
      .select(col("id_a"), col("id_b"))
    // batch × existing links: block equi-join ACROSS the two frames —
    // no ordering filter (the sides are disjoint), agreement is
    // symmetric so the score equals the union run's for either order
    val paired = sideProj(batch, "a", idCol, blockCols, cols)
      .join(sideProj(existing, "b", idCol, blockCols, cols), blockCols)
    val score = rules.zip(agreeCols(cols, rules.map(_.same)))
      .map { case (r, ok) =>
        when(ok, lit(r.wAgreePpm)).otherwise(lit(-r.wDisagreePpm)) }
      .reduce(_ + _).cast("long")
    val cross = paired.filter(score >= thresholdPpm)
      .select(col("id_a"), col("id_b"))
    // contract existing members to their ENTITY node (quotient graph);
    // an existing row never linked before is its own node
    val entOf = existingEntities.select(col("id").as("id_b"),
      col("entity_id").as("__ent"))
    val edges = bb.unionByName(
      cross.join(entOf, Seq("id_b"), "left")
        .select(col("id_a"), coalesce(col("__ent"), col("id_b")).as("id_b"))
        .distinct())
    val comp = graft.operators.Dedup.componentsAuto(edges)
    // existing members follow their entity's (possibly merged) label;
    // entities the batch never touched keep their label
    val relabel = comp.select(col("id").as("entity_id"),
      col("component").as("__new"))
    val existingOut = existingEntities.join(relabel, Seq("entity_id"), "left")
      .select(coalesce(col("__new"), col("entity_id")).as("entity_id"),
        col("id"))
    // comp's non-entity nodes are the NEW members: batch ids plus
    // existing singletons pulled into a cluster for the first time
    val entIds = existingEntities.select(col("entity_id").as("id")).distinct()
    val fresh = comp.join(entIds, Seq("id"), "left_anti")
      .select(col("component").as("entity_id"), col("id"))
    fresh.unionByName(existingOut)
  }

  /** STAR clusters over decided links — the over-merge-averse
    * alternative to [[resolveEntities]]' transitive closure: every
    * linked record takes the MINIMUM id over its CLOSED NEIGHBORHOOD
    * (itself + direct link partners) as its cluster label — one hop,
    * no closure — so two records share a cluster only through a
    * directly-shared hub, and a dirty chain a–b–c cannot pull a and c
    * into one entity the way connected components do (the classic ER
    * chain-merge failure, Christen 2012 §6.11; the one-hop min-id form
    * of star clustering, Aslam, Pelekhov & Rus 2004). Note the label
    * is an id, not a "center" guarantee: a hub can itself label lower
    * (in a–b–c, b labels a while c labels b) — the partition is by
    * LABEL EQUALITY, with cluster diameter ≤ 2 by construction.
    * Output: (cluster_id, id) for every id appearing in `links`.
    *
    * Scale shape: one symmetric edge union + one map-side-combined min
    * aggregation — no iteration, no closure frame, no driver state. */
  def starClusters(links: DataFrame): DataFrame = {
    val ud = links.select(col("id_a").as("__m"), col("id_b").as("__e"))
      .unionByName(links.select(col("id_b").as("__m"), col("id_a").as("__e")))
    ud.groupBy(col("__m"))
      .agg(min(col("__e")).as("__me"))
      .select(least(col("__me"), col("__m")).as("cluster_id"),
        col("__m").as("id"))
  }

  /** Entity resolution tail: linked pairs → entity clusters. Each
    * member maps to its entity id = the minimum reachable member id
    * (the canonical representative). Delegates to the hybrid
    * [[Dedup.componentsAuto]] — link sets are dup-rate-sized, so the
    * bounded driver union-find branch almost always applies; above the
    * bound the distributed min-label BSP runs unchanged. */
  def resolveEntities(links: DataFrame): DataFrame =
    graft.operators.Dedup.componentsAuto(links)
      .select(col("component").as("entity_id"), col("id"))

  /** Survivorship: one GOLDEN record per entity. Deterministic field
    * rules — the standard MDM policy set, each oracle-replayable:
    *   - `modalCols`: the entity's most frequent value, ties to the
    *     smallest value (per-entity window over entity-sized groups);
    *   - `maxCols`: the entity's maximum (as `<col>_max`);
    *   - `recencyCols`: (valueCol, tsCol) pairs — the LATEST NON-NULL
    *     value by the timestamp column (as `<col>_latest`), ties on the
    *     timestamp broken by the larger value — the third standard MDM
    *     rule ("most recent system wins"). Entities whose column is
    *     all-NULL report NULL (left join);
    *   - `n_members` always.
    * `members` is (entityCol, attribute columns…) — one row per
    * member, e.g. [[resolveEntities]] joined back to the source.
    *
    * Scale shape: every aggregate/window is keyed by entity — entity
    * groups are cluster-sized (bounded by the dedup rate), never
    * corpus-sized partitions. */
  def goldenRecords(members: DataFrame, entityCol: String,
                    modalCols: Seq[String],
                    maxCols: Seq[String],
                    recencyCols: Seq[(String, String)] = Nil): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val base = members.groupBy(col(entityCol)).agg(
      count(lit(1)).as("n_members"),
      maxCols.map(c => max(col(c)).as(s"${c}_max")): _*)
    val withModal = modalCols.foldLeft(base) { (acc, c) =>
      val w = Window.partitionBy(col(entityCol))
        .orderBy(col("__n").desc, col(c).asc)
      val pick = members.groupBy(col(entityCol), col(c))
        .agg(count(lit(1)).as("__n"))
        .withColumn("__rn", row_number().over(w))
        .filter(col("__rn") === 1)
        .select(col(entityCol), col(c))
      acc.join(pick, entityCol)
    }
    recencyCols.foldLeft(withModal) { case (acc, (c, ts)) =>
      val w = Window.partitionBy(col(entityCol))
        .orderBy(col(ts).desc, col(c).desc)
      val pick = members.filter(col(c).isNotNull)
        .withColumn("__rn", row_number().over(w))
        .filter(col("__rn") === 1)
        .select(col(entityCol), col(c).as(s"${c}_latest"))
      acc.join(pick, Seq(entityCol), "left")
    }
  }

  /** EM-estimated linkage over blocked pairs: computes the agreement
    * pattern frame (one distributed groupBy — ≤ 2^k rows), collects it
    * (driver-bounded by construction), runs [[emEstimate]], and returns
    * the pattern frame with each pattern's match posterior and its
    * threshold decision. The heavy work is the pair generation; EM
    * itself touches only the 2^k summary. */
  def emPatternWeights(df: DataFrame, idCol: String, blockCols: Seq[String],
      comparators: Seq[(String, (Column, Column) => Column)],
      iters: Int = 20, linkThresholdPpm: Long = 500000L): DataFrame = {
    // the pattern frame is collected to the driver BOUNDED BY 2^k —
    // that bound is a contract, not a hope (the maxDriverPairs
    // discipline): 20 comparators cap the collect at ~1e6 rows; a
    // 30-comparator caller would collect 2^30
    require(comparators.size <= 20,
      s"emPatternWeights collects the 2^k agreement-pattern frame to " +
      s"the driver; k = ${comparators.size} > 20 would collect up to " +
      s"2^${comparators.size} rows — reduce the comparator set")
    val (paired, agrees) = pairedWithPattern(df, idCol, blockCols,
      comparators.map(_._1), comparators.map(_._2))
    val pattern = concat(agrees.map(ok => when(ok, lit("A")).otherwise(lit("D"))): _*)
    val counts = paired.select(pattern.as("pattern"))
      .groupBy("pattern").count()
      .collect().map(r => (r.getString(0), r.getLong(1)))
      .sortBy(_._1).toSeq
    val k = comparators.size
    val (p, m, u) = emEstimate(counts, k, iters)
    val spark = df.sparkSession
    import spark.implicits._
    counts.map { case (s, n) =>
      val post = posteriorPpm(s.map(c => if (c == 'A') 1 else 0).toArray, p, m, u)
      (s, n, post, post >= linkThresholdPpm)
    }.toDF("pattern", "n_pairs", "posterior_ppm", "is_link")
  }
}
