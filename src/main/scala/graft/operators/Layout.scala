package graft.operators

import graft.functions.ZOrderExpr

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.Bridge

/** Write-side layout optimization: cluster a table on the Z-order
  * curve of two filter columns so box predicates touch few files.
  * This is a WRITE-TIME lever — it costs one range exchange at write
  * and pays back on every subsequent scan via file/row-group min-max
  * pruning on EITHER dimension. LayoutSpec measures the property
  * directly: matching rows of a box query land in strictly fewer
  * files than under a single-column sort of the same file count.
  */
object Layout {

  /** `zorder2(x, y)` as a column (both pmod'd into the non-negative
    * 31-bit domain by the caller if needed). */
  def zorder2(x: Column, y: Column): Column =
    Bridge.column(ZOrderExpr(
      Bridge.expression(x.cast("long")), Bridge.expression(y.cast("long"))))

  /** `zorder_n(cols...)` as a column — the N-dimensional interleave
    * ([[zorder2]] is the n=2, bits=31 special case; LayoutSpec pins
    * the equality). Callers pick `bits` so n·bits ≤ 63 and pmod/bucket
    * each dim into [0, 2^bits) first — [[writeZOrderedN]] does both. */
  def zorderN(cols: Seq[Column], bits: Int): Column =
    Bridge.column(graft.functions.ZOrderNExpr(
      cols.map(c => Bridge.expression(c.cast("long"))), bits))

  /** Compact a parquet directory's many small files into about
    * `targetFiles` larger ones — the small-files problem is the top
    * operational pain of long-running ingest (every file costs a task,
    * an open, and a footer read; a directory of 100k tiny deliveries
    * makes every later scan metadata-bound). Content is preserved
    * exactly; within-file order is whatever the merge produces
    * (parquet scans promise none). `coalesce`, not `repartition`: the
    * merge is read-side with NO shuffle — each output task reads a few
    * input files and streams them out. Output lands in `outDir` so the
    * swap into place stays the caller's atomic-rename decision (the
    * same _SUCCESS-marker discipline as the CDC snapshot maintainer). */
  def compact(spark: org.apache.spark.sql.SparkSession, inDir: String,
              outDir: String, targetFiles: Int): Unit = {
    require(targetFiles > 0, s"targetFiles: $targetFiles")
    spark.read.parquet(inDir).coalesce(targetFiles)
      .write.mode("overwrite").parquet(outDir)
  }

  /** Write `df` as `nFiles` parquet files range-clustered on the
    * Z-order curve of (xCol, yCol). Range partitioning (not hash)
    * keeps curve-adjacent rows in the same file, which is what makes
    * the min-max envelopes tight.
    *
    * Both dimensions are first SCALED to the same `bitsPerDim`-bit
    * range (one distributed min/max aggregate, then linear bucketing).
    * Interleaving raw values instead would let the wider column's high
    * bits own the top of the curve and the layout degenerates to a
    * single-column sort — the standard z-order normalization step
    * (production implementations use per-column range ranks for the
    * same reason; linear min/max bucketing is the one-pass variant and
    * right for id-like columns). */
  /** Exact overflow-safe linear bucket of a named column into
    * [0, nb), in pure 64-bit integer arithmetic either way:
    *   - range ≤ nb (scale UP): (c − lo) · nb div range — the product
    *     is ≤ 2^62, exact, and fills the whole bit range so neither
    *     dim's high bits own the curve (the normalization the curve
    *     needs).
    *   - range > nb (scale DOWN): (c − lo) div ceil(range / nb) —
    *     divide-before-multiply, because the multiply-first form
    *     overflows Long past ~2^51 and Spark's `/` is double
    *     division, which can mis-bucket past 2^53; id-like wide
    *     columns hit both.
    * Dims whose span exceeds the Long envelope are rejected loudly
    * (pre-scale them). */
  private def linearBucket(c: String, lo: Long, hi: Long,
                           nb: Long): Column =
    if (hi <= lo) lit(0L)
    else {
      val range = BigInt(hi) - BigInt(lo) + 1
      require(range <= BigInt(Long.MaxValue),
        s"z-order dim `$c` spans $range distinct values — beyond the " +
        "exact 64-bit bucketing envelope; pre-scale the column")
      val b =
        if (range <= BigInt(nb))
          expr(s"(CAST(`$c` AS BIGINT) - (${lo}L)) * ${nb}L div ${range.toLong}L")
        else {
          val stride = ((range + nb - 1) / nb).toLong
          expr(s"(CAST(`$c` AS BIGINT) - (${lo}L)) div ${stride}L")
        }
      least(lit(nb - 1), b)
    }

  def writeZOrdered(df: DataFrame, xCol: String, yCol: String,
                    dir: String, nFiles: Int, bitsPerDim: Int = 12): Unit = {
    require(bitsPerDim > 0 && bitsPerDim <= 31, s"bitsPerDim: $bitsPerDim")
    val b = df.agg(
      min(col(xCol)).cast("long"), max(col(xCol)).cast("long"),
      min(col(yCol)).cast("long"), max(col(yCol)).cast("long")).head()
    val nb = 1L << bitsPerDim
    df.withColumn("__z", zorder2(
        linearBucket(xCol, b.getLong(0), b.getLong(1), nb),
        linearBucket(yCol, b.getLong(2), b.getLong(3), nb)))
      .repartitionByRange(nFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write.mode("overwrite").parquet(dir)
  }

  /** [[writeZOrdered]] generalized to N dimensions: one min/max
    * aggregate over ALL dims, linear bucketing into the shared
    * `bitsPerDim`-bit range, then range-clustering on the
    * [[zorderN]] curve. Same normalization rationale; bitsPerDim
    * shrinks as dims grow (n·bits ≤ 63), which is also the right
    * layout call — more clustered dimensions need fewer distinct
    * values per dim for the min-max envelopes to stay tight. */
  def writeZOrderedN(df: DataFrame, dims: Seq[String], dir: String,
                     nFiles: Int, bitsPerDim: Int = 12): Unit = {
    require(dims.size >= 2, s"need 2+ dims, got ${dims.size}")
    require(bitsPerDim > 0 && dims.size * bitsPerDim <= 63,
      s"n*bits must fit 63 bits: ${dims.size} x $bitsPerDim")
    val aggs = dims.flatMap(c =>
      Seq(min(col(c)).cast("long"), max(col(c)).cast("long")))
    val b = df.agg(aggs.head, aggs.tail: _*).head()
    val nb = 1L << bitsPerDim
    val keyed = dims.zipWithIndex.map { case (c, i) =>
      linearBucket(c, b.getLong(2 * i), b.getLong(2 * i + 1), nb)
    }
    df.withColumn("__z", zorderN(keyed, bitsPerDim))
      .repartitionByRange(nFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write.mode("overwrite").parquet(dir)
  }

  /** Column-encoding advisor: per column, the cardinality/null/width
    * profile and a deterministic storage-encoding suggestion —
    * `sparse` (mostly null), `constant`, `dict` (distinct ≤ 5% of
    * non-null — dictionary pages win), else `plain`. The profile a
    * 100 TB table gets before choosing parquet encodings and
    * bucketing columns. `sum_len` is byte length for STRING columns
    * and 0 otherwise (numeric width is known from the type; casting
    * doubles to strings for width is also an engine-portability trap).
    *
    * Scale shape: ONE scan — the multi-column distinct counts plan as
    * a single Expand aggregation (|cols|× map-side rows, the standard
    * price of multi-distinct), then a row-per-column stack of the
    * single result row. */
  def encodingAdvisor(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "encodingAdvisor needs at least one column")
    // Names are interpolated into the stack() SQL and into aggregate
    // aliases (__nn_$c), so restrict to safe identifiers — a quote,
    // backtick, dot or space would mis-parse the stack expression.
    cols.foreach(c => require(c.matches("[A-Za-z_][A-Za-z0-9_]*"),
      s"encodingAdvisor column name must be a plain identifier " +
        s"([A-Za-z_][A-Za-z0-9_]*), got: '$c'"))
    val types = df.schema.fields.map(f => f.name -> f.dataType).toMap
    val aggs = cols.flatMap { c =>
      val lenAgg =
        if (types(c) == org.apache.spark.sql.types.StringType)
          coalesce(sum(length(col(c))).cast("long"), lit(0L))
        else sum(lit(0L)).cast("long")
      Seq(count(col(c)).as(s"__nn_$c"),
        countDistinct(col(c)).as(s"__nd_$c"),
        lenAgg.as(s"__sl_$c"))
    }
    val one = df.agg(count(lit(1)).as("n"), aggs: _*)
    val stackExpr = s"stack(${cols.size}, " +
      cols.map(c => s"'$c', __nn_$c, __nd_$c, __sl_$c").mkString(", ") +
      ") as (column_name, n_nonnull, n_distinct, sum_len)"
    one.select(col("n"), expr(stackExpr))
      .select(col("column_name"), col("n"), col("n_nonnull"),
        col("n_distinct"), col("sum_len"),
        expr("(n - n_nonnull) * 1000000L div n").as("null_ppm"),
        expr("n_distinct * 1000000L div n").as("distinct_ppm"),
        expr("CASE WHEN n_nonnull * 10 <= n THEN 'sparse' " +
          "WHEN n_distinct <= 1 THEN 'constant' " +
          "WHEN n_distinct * 20 <= n_nonnull THEN 'dict' " +
          "ELSE 'plain' END").as("suggestion"))
  }
}
