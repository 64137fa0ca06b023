package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal operators Spark lacks natively.
  *
  * [[asofJoin]]: for every left row, attach the most recent right row
  * with `right.ts <= left.ts` within the same key (backward as-of; the
  * point-in-time join of feature stores and market data).
  *
  * Implementation follows the preference ladder (compose built-ins
  * before custom SparkStrategy): both sides union into one stream,
  * partitioned by key and ordered by (ts, side) with right rows first
  * at equal timestamps (inclusive <=); a running `last(ignoreNulls)`
  * carries the latest right payload forward; left rows then project it.
  *
  * Scale shape: ONE shuffle of (key, ts, payload) — same cost as the
  * sort-merge join a custom physical operator would do, with AQE and
  * codegen'd window execution for free. No per-key materialization:
  * the window is running state over a sorted partition stream.
  */
object Temporal {

  /** NOTE: right-payload columns participate in a window ORDERING (the
    * deterministic tie-break among right rows sharing (key, ts)), so
    * they must be orderable types — drop or pre-hash map-typed payload
    * columns before the join (Spark rejects them at analysis). */
  def asofJoin(left: DataFrame, right: DataFrame, keyCols: Seq[String],
               tsCol: String, rightPrefix: String = "r_"): DataFrame = {
    val rightPayloadCols = right.columns.filterNot(c =>
      keyCols.contains(c) || c == tsCol)
    val payload = struct(rightPayloadCols.map(col).toIndexedSeq: _*)

    val keyed = keyCols.map(col)
    val l = left.withColumn("__side", lit(1))
      .withColumn("__rp", lit(null).cast(
        right.select(payload).schema.head.dataType))
    val r = right
      .withColumn("__side", lit(0))
      .withColumn("__rp", payload)
      .select((keyed ++ Seq(col(tsCol), col("__side"), col("__rp"))): _*)
    // align schemas: right rows carry nulls for left-only columns
    val leftOnly = left.columns.filterNot(c =>
      keyCols.contains(c) || c == tsCol)
    val rAligned = leftOnly.foldLeft(r) { (df, c) =>
      df.withColumn(c, lit(null).cast(left.schema(c).dataType))
    }.select(l.columns.map(col).toIndexedSeq: _*)

    // __rp in the ordering: deterministic winner among right rows that
    // share (key, ts) — struct ordering is field-wise
    val w = Window.partitionBy(keyed: _*)
      .orderBy(col(tsCol).asc, col("__side").asc, col("__rp").asc_nulls_last)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val merged = l.unionByName(rAligned)
      .withColumn("__last_r", last(col("__rp"), ignoreNulls = true).over(w))

    val out = merged.filter(col("__side") === 1)
      .drop("__side", "__rp")
    rightPayloadCols.foldLeft(out) { (df, c) =>
      df.withColumn(rightPrefix + c, col("__last_r").getField(c))
    }.drop("__last_r")
  }

  /** Trailing-window distinct actives (the WAU/MAU series): for every
    * observed day, the distinct keys seen in the trailing `windowDays`
    * days. EXACT distinct over a sliding window without a range join
    * or a per-day re-scan: each distinct (key, day) observation
    * SUPPORTS the `windowDays` days it keeps the key active for (a
    * map-side explode — |observations|·window rows, linear), then one
    * distinct + count per day, restricted to days that exist in the
    * data. `dayCol` is an epoch-day BIGINT. */
  def rollingDistinct(df: DataFrame, dayCol: String, keyCol: String,
                      windowDays: Int): DataFrame = {
    require(windowDays >= 1, s"windowDays must be >= 1, got $windowDays")
    val ud = df.select(col(dayCol).as("__d"), col(keyCol).as("__k"))
      .distinct()
    val days = ud.select(col("__d").as("day")).distinct()
    val support = ud.select(col("__k"),
        explode(sequence(col("__d"), col("__d") + (windowDays - 1)))
          .as("day"))
      .distinct()
    support.join(days, Seq("day"), "left_semi")
      .groupBy(col("day"))
      .agg(count(lit(1)).as("active_keys"))
  }

  /** Gap-based sessionization: events within `gap` of the previous
    * event (per key) share a session; a larger gap starts a new one.
    * Emits one row per (key, session): index, event count, start/end.
    *
    * Classic two-window formulation — `lag` marks session starts,
    * a running sum numbers them — then an aggregate rolls sessions up.
    * Scale shape: ONE hash exchange on the key; the windows sort within
    * partitions, and the final groupBy(key, session_idx) reuses the
    * key partitioning (HashPartitioning(key) satisfies the clustered
    * distribution on (key, session_idx) — no second shuffle; asserted
    * in PlanAuditSpec).
    *
    * `tieCol` makes the ordering total when timestamps collide, so
    * session numbering is deterministic under retries.
    */
  def sessionize(events: DataFrame, keyCol: String, tsCol: String,
                 gap: Long, tieCol: String): DataFrame = {
    require(gap > 0, s"session gap must be positive, got $gap")
    val w = Window.partitionBy(col(keyCol)).orderBy(col(tsCol).asc, col(tieCol).asc)
    val isNew = when(
      col(tsCol) - lag(col(tsCol), 1).over(w) > gap, lit(1L)).otherwise(lit(0L))
    events
      .withColumn("session_idx",
        sum(isNew).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col(keyCol), col("session_idx"))
      .agg(
        count(lit(1)).as("n_events"),
        min(col(tsCol)).as("session_start"),
        max(col(tsCol)).as("session_end"))
  }

  /** Ordered event FUNNEL (the windowFunnel of product analytics):
    * per key, the completion times of an ordered step sequence — step
    * 1's time is the key's FIRST event matching `steps(0)`; step k's
    * time is the first event matching `steps(k-1)` STRICTLY AFTER step
    * k-1 and within `window` of step 1. Output: one row per key that
    * entered the funnel — (key, t1..tn nullable, steps_completed);
    * a null t_k nulls everything after it (times are strictly
    * increasing by construction).
    *
    * Shape at scale: step k is a filtered scan of the step's events
    * aggregated with the accumulated funnel frame — each stage is one
    * hash exchange on the key, the funnel frame is one row per
    * entered key, and the event side is pre-filtered to the step's
    * predicate before it shuffles. No per-key event materialization
    * (the ClickHouse-style sorted-list scan) — the iterated min-
    * aggregate form replays exactly in SQL, which is what the oracle
    * leans on. */
  def funnel(events: DataFrame, keyCol: String, tsCol: String,
             steps: Seq[Column], window: Long): DataFrame = {
    require(steps.size >= 2, s"a funnel needs >= 2 steps, got ${steps.size}")
    require(window > 0, s"funnel window must be positive, got $window")
    val s1 = events.filter(steps.head)
      .groupBy(col(keyCol)).agg(min(col(tsCol)).as("t1"))
    val full = steps.tail.zipWithIndex.foldLeft(s1) { case (acc, (pred, i)) =>
      val k = i + 2
      val carried = acc.columns.map(col).toIndexedSeq
      acc.join(
          events.filter(pred).select(col(keyCol), col(tsCol).as("__ts")),
          Seq(keyCol), "left")
        .groupBy(carried: _*)
        .agg(min(when(col("__ts") > col(s"t${k - 1}") &&
          col("__ts") <= col("t1") + window, col("__ts"))).as(s"t$k"))
    }
    full.withColumn("steps_completed",
      steps.indices.map(i =>
        when(col(s"t${i + 1}").isNotNull, 1).otherwise(0))
        .reduce(_ + _).cast("int"))
  }

  /** Rolling z-score ANOMALY flags: per key, each reading is tested
    * against the trailing `window` readings (EXCLUDING itself — the
    * anomaly must not dilute its own baseline): flag when
    * |x − mean| > z·stddev and at least `minPoints` of history exist.
    *
    * The test is evaluated in EXACT INTEGER arithmetic — readings
    * scale to milli-units, and |x−S/n| > z·σ is multiplied through by
    * n² into (n·x − S)² > z²·(n·Q − S²) with S = Σx, Q = Σx² over the
    * frame — so the flag replays bit-for-bit in any engine (a
    * double-arithmetic z-score drifts by evaluation order; an exact
    * one cannot). One hash exchange on the key; the rolling sums are
    * running window state over the sorted partition stream, never a
    * per-key materialization. `tieCol` totalizes the order so frames
    * are deterministic under retries. */
  def anomalies(events: DataFrame, keyCol: String, tsCol: String,
                valueCol: String, tieCol: String, window: Int = 20,
                z: Int = 3, minPoints: Int = 8): DataFrame = {
    require(window > 1, s"window must exceed 1, got $window")
    require(z > 0 && minPoints > 1, s"bad z/minPoints: $z/$minPoints")
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(tsCol).asc, col(tieCol).asc)
      .rowsBetween(-window, -1)
    val dev = col("__n") * col("__x") - col("__s")
    events
      .withColumn("__x", round(col(valueCol) * 1000).cast("long"))
      .withColumn("__n", count(col("__x")).over(w))
      .withColumn("__s", sum(col("__x")).over(w))
      .withColumn("__q", sum(col("__x") * col("__x")).over(w))
      .select(col(keyCol), col(tieCol), col(tsCol), col(valueCol),
        (col("__n") >= minPoints &&
          dev * dev > lit(z.toLong * z) *
            (col("__n") * col("__q") - col("__s") * col("__s")))
          .as("is_anomaly"))
  }

  /** Cohort RETENTION: bucket time into fixed periods, assign every
    * key to the cohort of its FIRST active period, and count, for
    * each (cohort, period offset), the distinct keys still active —
    * the table behind every retention curve. Integer period math
    * (`div`, not a double floor) so the bucketing replays exactly
    * cross-engine. Three bounded exchanges: the distinct of
    * (key, period), the per-key min, and the final (cohort, offset)
    * count — each carries at most one row per (key, period), never
    * the raw event stream. */
  def retention(events: DataFrame, keyCol: String, tsCol: String,
                periodLength: Long): DataFrame = {
    require(periodLength > 0, s"period must be positive, got $periodLength")
    val periods = events
      .select(col(keyCol),
        expr(s"`$tsCol` div ${periodLength}L").as("__p"))
      .distinct()
    val cohorts = periods.groupBy(col(keyCol)).agg(min(col("__p")).as("cohort"))
    periods.join(cohorts, Seq(keyCol))
      .groupBy(col("cohort"), (col("__p") - col("cohort")).as("offset"))
      .agg(count(lit(1)).as("n_active"))
  }

  /** Range (interval) join: pairs where `left.ts` falls in
    * `[right.start, right.end]`, equi-keyed on `keyCols`.
    *
    * Spark plans a bare band condition as a nested-loop join — O(n*m)
    * per key. Bucket blocking makes it an equi-join: both sides map to
    * fixed-width ts blocks (right intervals explode to every block they
    * overlap), join on (key, block), then the exact band predicate
    * filters. Each matching pair meets in EXACTLY one block (the one
    * containing left.ts), so no dedup is needed.
    *
    * `blockWidth` should be ~the typical interval length: wider means
    * fewer replicas per interval, narrower means fewer false candidates
    * per block.
    */
  def rangeJoin(left: DataFrame, right: DataFrame, keyCols: Seq[String],
                leftTs: String, rightStart: String, rightEnd: String,
                blockWidth: Long): DataFrame = {
    require(blockWidth > 0)
    val l = left.withColumn("__block", floor(col(leftTs) / blockWidth))
    val r = right.withColumn("__block", explode(sequence(
      floor(col(rightStart) / blockWidth), floor(col(rightEnd) / blockWidth))))
    l.join(r, keyCols :+ "__block")
      .filter(col(leftTs) >= col(rightStart) && col(leftTs) <= col(rightEnd))
      .drop("__block")
  }

  /** Truncated exponentially-weighted moving average with α = 1/2 —
    * the trend-smoothing signal, computed as the FINITE weighted sum
    * Σ_{k=0..lags} value_{t−k}·2^(−k) (missing history contributes 0).
    * The honest recursive EWMA needs running state; the truncated form
    * is a pure windowed projection, and at 2^-k weighting the dropped
    * tail is below 1/2^lags of the signal.
    *
    * Engine exactness: multiplying a double by 2^(−k) only shifts the
    * exponent (NO rounding), and the sum is a fixed left-to-right
    * chain, so both engines produce the same 64 bits — this is why α
    * is pinned to 1/2 rather than parameterized: an arbitrary α makes
    * every product a rounding site and the cross-engine compare a
    * last-ulp lottery.
    *
    * Scale shape: one exchange on the key; all lags ride one window
    * frame. */
  def ewmaHalfLife(events: DataFrame, keyCol: String, tsCol: String,
                   tieCol: String, valueCol: String,
                   lags: Int = 9): DataFrame = {
    require(lags >= 1 && lags <= 62, s"lags out of range: $lags")
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(tsCol).asc, col(tieCol).asc)
    val terms = (0 to lags).map { k =>
      val v = if (k == 0) col(valueCol).cast("double")
              else lag(col(valueCol).cast("double"), k).over(w)
      coalesce(v / lit(math.pow(2.0, k)), lit(0.0))
    }
    events.select(col(keyCol), col(tsCol), col(tieCol),
      terms.reduceLeft(_ + _).as("ewma"))
  }

  /** Gap-filled fixed-step resampling with last-observation-carried-
    * forward (LOCF) — the time-series regularization every downstream
    * model wants: one row per (key, step bucket) across the key's
    * observed span, holding the latest value at or before the bucket's
    * end. Buckets with no events inherit the previous bucket's value;
    * the first bucket always has one (the span starts at an event).
    *
    * Scale shape: bucket assignment is a projection (`ts div step`);
    * the per-bucket "last" is one row_number window; the grid comes
    * from exploding each key's [min,max] bucket span — distributed,
    * sized by time span not event count; the carry-forward is a
    * last(ignoreNulls) running window. Two partitionings are genuinely
    * needed — (key, bucket) for the in-bucket winner and the grid
    * join, (key) for the span and the carry — so the plan carries four
    * exchanges, each over grid-sized intermediates (∝ time span), not
    * the raw event stream. Output: (key, bucket_start, value) in
    * `tsCol` units. */
  def resampleLocf(events: DataFrame, keyCol: String, tsCol: String,
                   valueCol: String, tieCol: String, step: Long): DataFrame = {
    require(step > 0, s"step must be positive, got $step")
    val b = events
      .withColumn("__bkt", expr(s"`$tsCol` div ${step}L"))
      .withColumn("__rn", row_number().over(
        Window.partitionBy(col(keyCol), col("__bkt"))
          .orderBy(col(tsCol).desc, col(tieCol).desc)))
      .filter(col("__rn") === 1)
      .select(col(keyCol), col("__bkt"), col(valueCol).as("__v"))
    val grid = b.groupBy(col(keyCol))
      .agg(min(col("__bkt")).as("__lo"), max(col("__bkt")).as("__hi"))
      .select(col(keyCol),
        explode(sequence(col("__lo"), col("__hi"))).as("__bkt"))
    val wCarry = Window.partitionBy(col(keyCol)).orderBy(col("__bkt").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid.join(b, Seq(keyCol, "__bkt"), "left")
      .select(col(keyCol), (col("__bkt") * step).as("bucket_start"),
        last(col("__v"), ignoreNulls = true).over(wCarry).as("value"))
  }

  /** [[resampleLocf]]'s interpolating sibling: gap days get the LINEAR
    * blend of the surrounding observations instead of a carried-forward
    * value — `(pv·(nd−g) + nv·(g−pd)) div (nd−pd)` in exact integer
    * arithmetic over an integer `valueCol` (cents/micros — the caller
    * scales), so the blend is engine-exact with truncating division.
    * Observed days keep their own (last-per-bucket) reading verbatim.
    * The grid spans each key's [min, max] bucket, so both neighbors
    * always exist. Same scale shape as LOCF: one key shuffle, windows
    * and the final projection all ride the (key) partition. */
  def resampleInterpolate(events: DataFrame, keyCol: String, tsCol: String,
                          valueCol: String, tieCol: String,
                          step: Long): DataFrame = {
    require(step > 0, s"step must be positive, got $step")
    val b = events
      .withColumn("__bkt", expr(s"`$tsCol` div ${step}L"))
      .withColumn("__rn", row_number().over(
        Window.partitionBy(col(keyCol), col("__bkt"))
          .orderBy(col(tsCol).desc, col(tieCol).desc)))
      .filter(col("__rn") === 1)
      .select(col(keyCol), col("__bkt"), col(valueCol).as("__v"))
    val grid = b.groupBy(col(keyCol))
      .agg(min(col("__bkt")).as("__lo"), max(col("__bkt")).as("__hi"))
      .select(col(keyCol),
        explode(sequence(col("__lo"), col("__hi"))).as("__bkt"))
    val wBack = Window.partitionBy(col(keyCol)).orderBy(col("__bkt").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wFwd = Window.partitionBy(col(keyCol)).orderBy(col("__bkt").asc)
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    grid.join(b, Seq(keyCol, "__bkt"), "left")
      .withColumn("__pv", last(col("__v"), ignoreNulls = true).over(wBack))
      .withColumn("__pd", last(when(col("__v").isNotNull, col("__bkt")),
        ignoreNulls = true).over(wBack))
      .withColumn("__nv", first(col("__v"), ignoreNulls = true).over(wFwd))
      .withColumn("__nd", first(when(col("__v").isNotNull, col("__bkt")),
        ignoreNulls = true).over(wFwd))
      .select(col(keyCol), (col("__bkt") * step).as("bucket_start"),
        when(col("__v").isNotNull, col("__v"))
          .otherwise(expr(
            "(__pv * (__nd - __bkt) + __nv * (__bkt - __pd)) div (__nd - __pd)"))
          .as("interp_cents"))
  }

  /** Concurrency curve over an interval table: per time bucket, the
    * maximum number of simultaneously-open intervals and the boundary
    * count — the occupancy/peak-load report (concurrent sessions,
    * simultaneous jobs) done as the classic +1/−1 boundary sweep. At
    * equal timestamps starts order before ends, so a session starting
    * exactly when another ends counts as overlap (inclusive ends,
    * matching [[rangeJoin]]'s convention).
    *
    * BOUNDARY-DAY-ONLY semantics: the report has one row per bucket
    * that contains at least one boundary — a day on which sessions are
    * open but none starts or ends emits NO row (its occupancy is
    * constant and readable from the previous boundary's running sum).
    * Pinned by TemporalCurveSpec and the DuckDB oracle; emit-a-grid
    * variants can compose [[resampleLocf]] over this output.
    *
    * The running occupancy is a PREFIX SUM over all boundaries, which
    * would classically be one global sorted pass; here it rides
    * [[Analytics.distributedCumSum]], so the only partition-less
    * window is the 64-row bucket-prefix frame at any scale. */
  def concurrencyCurve(sessions: DataFrame, startCol: String,
                       endCol: String, tieCols: Seq[String],
                       bucketUs: Long): DataFrame = {
    require(bucketUs > 0, s"bucketUs must be positive, got $bucketUs")
    require(tieCols.nonEmpty,
      "tieCols must uniquely identify an interval (total sweep order)")
    val starts = sessions.select(
      col(startCol).as("__ts") +: lit(0).as("__kind") +:
        lit(1L).as("__d") +: tieCols.map(col): _*)
    val ends = sessions.select(
      col(endCol).as("__ts") +: lit(1).as("__kind") +:
        lit(-1L).as("__d") +: tieCols.map(col): _*)
    Analytics.distributedCumSum(starts.unionByName(ends), "__ts",
        Seq("__d"), tieCols = "__kind" +: tieCols)
      .groupBy(expr(s"__ts div ${bucketUs}L").as("day"))
      .agg(max(col("cum___d")).as("max_concurrency"),
        count(lit(1)).as("n_boundaries"))
  }

  /** First-order Markov transition matrix over per-key event sequences
    * — the behavioral-model primitive behind next-event prediction and
    * anomalous-flow detection (e.g. Ye 2000, "A Markov chain model of
    * temporal behavior for anomaly detection").
    *
    * Each key's events are ordered by (ts, tieCol); every adjacent
    * (state, next-state) pair is one observation. Output per ordered
    * pair: observation count and the transition probability as a
    * ppm-scaled BIGINT (`1e6·c(a→b) div c(a→*)` — integer division, so
    * the result is order-independent and engine-exact; ppm resolution
    * is plenty for flow modeling).
    *
    * Scale shape: ONE shuffle to sort each key's stream (window lead),
    * then a map-side-combined count aggregation whose cardinality is
    * |states|² — tiny regardless of corpus size. The per-state totals
    * re-derive from the pair counts themselves (sum over the row of the
    * matrix) instead of rescanning the events — a second window pass
    * avoided. */
  def transitions(events: DataFrame, keyCol: String, tsCol: String,
                  stateCol: String, tieCol: String,
                  step: Int = 1): DataFrame = {
    require(step >= 1, s"step must be >= 1, got $step")
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(tsCol).asc, col(tieCol).asc)
    val pairs = events
      .select(col(keyCol), col(tsCol), col(tieCol), col(stateCol))
      .withColumn("__next", lead(col(stateCol), step).over(w))
      .filter(col("__next").isNotNull)
      .groupBy(col(stateCol).as("from_state"), col("__next").as("to_state"))
      .agg(count(lit(1)).as("n"))
    val wFrom = Window.partitionBy(col("from_state"))
    pairs
      .withColumn("__tot", sum(col("n")).over(wFrom))
      .select(col("from_state"), col("to_state"), col("n"),
        expr("n * 1000000L div __tot").as("p_ppm"))
  }

  /** Top event-type PATHS: the most common length-3 subsequences of
    * each key's (ts, tie)-ordered stream — the flow-mining view one
    * step richer than [[transitions]]' pair matrix (which trigram of
    * screens/events dominates the corpus, the input to funnel design
    * and anomalous-flow review). Per trigram: count, plus its share of
    * all trigrams in exact ppm.
    *
    * Scale shape: ONE key shuffle (both leads ride the same window
    * frame), a map-side-combined count whose cardinality is at most
    * |states|³, a TakeOrderedAndProject for the topK and a single-row
    * total attach (structurally-benign broadcast). */
  def topPaths(events: DataFrame, keyCol: String, tsCol: String,
               stateCol: String, tieCol: String,
               topK: Int = 20): DataFrame = {
    require(topK >= 1, s"topK must be >= 1, got $topK")
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(tsCol).asc, col(tieCol).asc)
    val tri = events
      .select(col(keyCol), col(tsCol), col(tieCol), col(stateCol))
      .withColumn("__s2", lead(col(stateCol), 1).over(w))
      .withColumn("__s3", lead(col(stateCol), 2).over(w))
      .filter(col("__s3").isNotNull)
      .groupBy(col(stateCol).as("p1"), col("__s2").as("p2"),
        col("__s3").as("p3"))
      .agg(count(lit(1)).as("cnt"))
    val tot = tri.agg(sum(col("cnt")).as("n_paths"))
    tri.orderBy(col("cnt").desc, col("p1").asc, col("p2").asc,
        col("p3").asc)
      .limit(topK)
      .crossJoin(broadcast(tot))
      .select(col("p1"), col("p2"), col("p3"), col("cnt"),
        expr("cnt * 1000000L div n_paths").as("share_ppm"))
  }

  /** Per-key sliding aggregate over the closed time range
    * [ts − rangeUs, ts]: the rolling-activity feature primitive
    * (e.g. "events and spend in the last hour"). A RANGE frame on the
    * µs BIGINT axis — one sorted pass per key partition with a moving
    * frame, never a self-join; cost is the single (key) shuffle. */
  def slidingRangeAgg(df: DataFrame, partCol: String, tsCol: String,
      centsCol: String, rangeUs: Long, idCol: String = "event_id"): DataFrame = {
    val w = Window.partitionBy(col(partCol)).orderBy(col(tsCol).asc)
      .rangeBetween(-rangeUs, 0)
    df.select(col(idCol), col(partCol), col(tsCol).as("ts_us"),
      count(lit(1)).over(w).cast("long").as("w_cnt"),
      sum(col(centsCol)).over(w).cast("long").as("w_cents"))
  }

  /** Time-to-next-event (the discrete survival primitive): per-key lead
    * gap under the (ts, tie) total order, aggregated per event type.
    * The mean is an integer division of integer sums — engine-exact,
    * no float aggregation order to disagree on. */
  def timeToNextEvent(df: DataFrame, partCol: String, tsCol: String,
      tieCol: String, typeCol: String): DataFrame = {
    val w = Window.partitionBy(col(partCol))
      .orderBy(col(tsCol).asc, col(tieCol).asc)
    df.withColumn("__gap", lead(col(tsCol), 1).over(w) - col(tsCol))
      .filter(col("__gap").isNotNull)
      .groupBy(col(typeCol))
      .agg(count(lit(1)).as("n_gaps"), sum(col("__gap")).as("__s"))
      .select(col(typeCol), col("n_gaps"),
        expr("__s div n_gaps").as("avg_gap_us"))
  }

  /** Gaps-and-islands: collapse per-key activity days into maximal
    * consecutive runs. The classic day_idx − row_number() trick: within
    * a key, consecutive days share the difference, so one groupBy turns
    * runs into rows. Two exchanges total (distinct, then the window
    * reuses its partitioning for the groupBy). */
  def activityIslands(df: DataFrame, partCol: String, tsCol: String): DataFrame = {
    val d = df.select(col(partCol),
      expr(s"$tsCol div 86400000000").as("day_idx")).distinct()
    val w = Window.partitionBy(col(partCol)).orderBy(col("day_idx").asc)
    d.withColumn("__isl", col("day_idx") - row_number().over(w))
      .groupBy(col(partCol), col("__isl"))
      .agg(min(col("day_idx")).as("start_day"),
        max(col("day_idx")).as("end_day"),
        count(lit(1)).as("n_days"))
      .drop("__isl")
  }

  /** Last-touch attribution: stamp every conversion with the most
    * recent strictly-PRIOR marketing touch of the same key. One window
    * pass — last(ignoreNulls) over a rows-preceding frame — so the
    * whole attribution is a single (key) shuffle, no join against the
    * touch stream. Conversions with no prior touch are dropped (they
    * are unattributable, not zero-gap). */
  def lastTouch(df: DataFrame, partCol: String, tsCol: String, tieCol: String,
      typeCol: String, touchTypes: Seq[String], convType: String): DataFrame = {
    val w = Window.partitionBy(col(partCol))
      .orderBy(col(tsCol).asc, col(tieCol).asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val isTouch = col(typeCol).isin(touchTypes: _*)
    df.withColumn("__mkid", when(isTouch, col(tieCol)))
      .withColumn("__mkts", when(isTouch, col(tsCol)))
      .withColumn("attr_id", last(col("__mkid"), ignoreNulls = true).over(w))
      .withColumn("gap_us", col(tsCol) -
        last(col("__mkts"), ignoreNulls = true).over(w))
      .filter(col(typeCol) === convType && col("attr_id").isNotNull)
      .select(col(tieCol), col(partCol), col("attr_id"), col("gap_us"))
  }

  /** Backward as-of join with a match TOLERANCE: for every left row,
    * the latest right row with rightTs in (leftTs − tolUs, leftTs];
    * left rows with nothing inside the tolerance are dropped (they are
    * unmatched, not null-padded). The unbounded [[asofJoin]] carries
    * state across any gap; the tolerated form is the sensor/trade/
    * attribution variant AND the scale path — stale right rows never
    * become join candidates. Composed from the bucket-blocked
    * [[rangeJoin]] (each right row spans [rightTs, rightTs+tolUs−1],
    * µs-integer-exact, blockWidth = tolUs ⇒ ≤2 replicas per row) plus
    * one row_number pick per left row. Right columns must not collide
    * with left ones (pre-rename at the call site). */
  def asofJoinTolerance(left: DataFrame, right: DataFrame,
      keyCols: Seq[String], leftTs: String, leftTie: String,
      rightTs: String, rightTie: String, tolUs: Long): DataFrame = {
    require(tolUs > 0, s"tolUs must be positive, got $tolUs")
    val r = right.withColumn("__s", col(rightTs))
      .withColumn("__e", col(rightTs) + lit(tolUs - 1))
    val w = Window.partitionBy((keyCols.map(col) :+ col(leftTie)): _*)
      .orderBy(col(rightTs).desc, col(rightTie).desc)
    rangeJoin(left, r, keyCols, leftTs, "__s", "__e", blockWidth = tolUs)
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn", "__s", "__e")
  }

  /** OHLC resample (the candlestick downsample): per (key, step
    * bucket), the open/high/low/close of an integer measure under the
    * (ts, tie) total order. first/last ride two row_number windows that
    * share one exchange with the final aggregation. */
  def ohlcResample(df: DataFrame, keyCol: String, tsCol: String,
      tieCol: String, centsCol: String, stepUs: Long): DataFrame = {
    require(stepUs > 0, s"stepUs must be positive, got $stepUs")
    val e = df.withColumn("__bucket", expr(s"$tsCol div $stepUs"))
    val wAsc = Window.partitionBy(col(keyCol), col("__bucket"))
      .orderBy(col(tsCol).asc, col(tieCol).asc)
    val wDesc = Window.partitionBy(col(keyCol), col("__bucket"))
      .orderBy(col(tsCol).desc, col(tieCol).desc)
    e.withColumn("__ra", row_number().over(wAsc))
      .withColumn("__rd", row_number().over(wDesc))
      .groupBy(col(keyCol), col("__bucket").as("day_idx"))
      .agg(max(when(col("__ra") === 1, col(centsCol))).as("open_c"),
        max(col(centsCol)).as("high_c"),
        min(col(centsCol)).as("low_c"),
        max(when(col("__rd") === 1, col(centsCol))).as("close_c"),
        count(lit(1)).as("n_events"))
  }

  /** Top event-journey mining: the ordered sequence of the first
    * `maxLen` event types per (key, bucket), counted across the corpus
    * — "what do days/sessions actually look like", the path-analysis
    * staple. Paths above `minCount` survive. One window + two
    * key-partitioned aggregations; path strings are bounded by maxLen
    * so nothing downstream carries unbounded arrays. */
  def topPaths(df: DataFrame, keyCol: String, tsCol: String, tieCol: String,
      typeCol: String, stepUs: Long, maxLen: Int, minCount: Long): DataFrame = {
    require(stepUs > 0 && maxLen >= 1 && minCount >= 1)
    val d = df.withColumn("__bucket", expr(s"$tsCol div $stepUs"))
    val w = Window.partitionBy(col(keyCol), col("__bucket"))
      .orderBy(col(tsCol).asc, col(tieCol).asc)
    d.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= maxLen)
      .groupBy(col(keyCol), col("__bucket"))
      .agg(array_join(transform(array_sort(collect_list(struct(col(tsCol),
        col(tieCol), col(typeCol)))), s => s.getField(typeCol)), ">")
        .as("path"))
      .groupBy(col("path"))
      .agg(count(lit(1)).as("n_buckets"))
      .filter(col("n_buckets") >= minCount)
  }

  /** Discrete survival/hazard table over observed key lifetimes: for
    * each distinct lifetime k (in `dayCol` units, last − first per
    * key), the at-risk count (lifetime ≥ k), the churn count
    * (lifetime = k) and the hazard in exact ppm — the life-table
    * estimator at day grain (Kaplan–Meier's hazard column without the
    * float survival product; the cumulative product is derivable
    * downstream at whatever precision a consumer wants).
    *
    * Scale shape: one key-grain aggregate (map-side combined), then a
    * roll-up whose cardinality is the number of DISTINCT lifetimes —
    * bounded by the corpus's day span, not by keys — so the
    * reverse-cumulative at-risk window runs over a frame of at most a
    * few thousand rows at any corpus size (globalWindowAllowed). */
  def survivalHazard(df: DataFrame, keyCol: String,
                     dayCol: String): DataFrame = {
    val life = df.groupBy(col(keyCol))
      .agg((max(col(dayCol)) - min(col(dayCol))).as("__lt"))
    val byLt = life.groupBy(col("__lt").as("day_offset"))
      .agg(count(lit(1)).as("churned"))
    // at_risk(k) = Σ churned over lifetimes ≥ k: a reverse running sum
    // over the lifetime-grain frame
    val w = Window.orderBy(col("day_offset").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    byLt.withColumn("at_risk", sum(col("churned")).over(w))
      .select(col("day_offset"), col("at_risk"), col("churned"),
        expr("churned * 1000000L div at_risk").as("hazard_ppm"))
  }

  /** Per-key inter-arrival statistics: number of gaps, truncating mean
    * gap, min and max gap, all in whole seconds from the µs axis —
    * the cadence profile behind rate limiting, bot detection and
    * retention features. One key shuffle (the lag window), then a
    * key-grain aggregate that reuses the window's partitioning. */
  def interArrival(df: DataFrame, keyCol: String, tsCol: String,
                   tieCol: String): DataFrame = {
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(tsCol).asc, col(tieCol).asc)
    df.select(col(keyCol), col(tsCol), col(tieCol))
      .withColumn("__gap", col(tsCol) - lag(col(tsCol), 1).over(w))
      .filter(col("__gap").isNotNull)
      .groupBy(col(keyCol))
      .agg(count(lit(1)).as("n_gaps"),
        expr("sum(__gap) div (1000000L * count(1))").as("mean_gap_s"),
        expr("min(__gap) div 1000000L").as("min_gap_s"),
        expr("max(__gap) div 1000000L").as("max_gap_s"))
  }
}
