package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Privacy-risk reports over anonymized outputs — the QA step after the
  * faker/nullify pipeline runs (Sweeney 2002, "k-anonymity: a model for
  * protecting privacy"; Machanavajjhala et al. 2007, "l-diversity").
  * The reference anonymizes; these operators measure whether the result
  * is actually safe to release.
  *
  * Both are one map-side-combined aggregation whose output is bounded
  * by the number of VIOLATING quasi-identifier groups — at 100 TB the
  * report stays small precisely when the data is safe, and when it is
  * not, the report is the work list.
  */
object Privacy {

  /** Right-to-be-forgotten audit: for each table that carries the
    * subject key, the total row count and how many rows a purge of
    * `keys` would remove — the report a deletion request gets BEFORE
    * (and the receipt it gets AFTER) the anti-join purge runs. Each
    * table is touched once by a semi-join-counted aggregate; the keys
    * side is request-sized and broadcast-able. The purge itself is the
    * same `left_anti` join ([[forgetPurge]]); running the report on
    * the purged output must show rows_matched 0 (spec-pinned). */
  def forgetReport(tables: Seq[(String, DataFrame, String)],
                   keys: DataFrame, keyCol: String): DataFrame = {
    require(tables.nonEmpty, "forgetReport needs at least one table")
    val k = keys.select(col(keyCol).cast("long").as("__k")).distinct()
    tables.map { case (name, df, c) =>
      df.select(col(c).cast("long").as("__k"))
        .join(k.withColumn("__hit", lit(1)), Seq("__k"), "left")
        .agg(lit(name).as("table_name"),
          count(lit(1)).as("rows_total"),
          count(col("__hit")).as("rows_matched"))
    }.reduce(_ unionByName _)
  }

  /** The purge half of [[forgetReport]]: drop every row whose key is
    * in the request set (null-keyed rows survive — they identify no
    * subject). */
  def forgetPurge(df: DataFrame, keyColName: String, keys: DataFrame,
                  keyCol: String): DataFrame =
    df.join(keys.select(col(keyCol).cast("long").as(keyColName)).distinct(),
      Seq(keyColName), "left_anti")

  /** Quasi-identifier groups smaller than k — each one a re-
    * identification risk (an attacker knowing the QI values pins the
    * individual to < k candidates). Returns (QI columns..., n) for
    * violating groups only. */
  def kAnonymityViolations(df: DataFrame, quasiCols: Seq[String],
                           k: Long): DataFrame = {
    require(quasiCols.nonEmpty && k >= 1)
    df.groupBy(quasiCols.map(col): _*)
      .agg(count(lit(1)).as("n"))
      .filter(col("n") < k)
  }

  /** Quasi-identifier groups whose SENSITIVE column takes fewer than l
    * distinct values — k-anonymous groups can still leak by value
    * homogeneity (everyone in the group shares the diagnosis). Returns
    * (QI columns..., n, n_distinct_sensitive) for violating groups. */
  def lDiversityViolations(df: DataFrame, quasiCols: Seq[String],
                           sensitiveCol: String, l: Long): DataFrame = {
    require(quasiCols.nonEmpty && l >= 1)
    df.groupBy(quasiCols.map(col): _*)
      .agg(count(lit(1)).as("n"),
        countDistinct(col(sensitiveCol)).as("n_distinct_sensitive"))
      .filter(col("n_distinct_sensitive") < l)
  }

  /** ppm CDF cutpoints of the TRUNCATED two-sided geometric ("discrete
    * Laplace") distribution on [-bound, bound] with α = exp(-eps):
    * P(k) ∝ α^|k|, renormalized over the truncated support. Returned
    * as (cutpoint_ppm, k) pairs — noise(u) = the first k whose
    * cutpoint exceeds u_ppm, a pure integer compare chain, so the
    * mechanism replays bit-for-bit in ANY engine once the constants
    * are baked (the float exp happens exactly once, here, at plan
    * build; both the Spark expression and the DuckDB oracle embed the
    * SAME integers). Shared single source of truth for
    * [[dpNoisyCounts]] and the Oracles replica. */
  def geometricCutpoints(eps: Double, bound: Int): Seq[(Long, Int)] = {
    require(eps > 0 && bound >= 1, s"bad eps=$eps bound=$bound")
    val alpha = math.exp(-eps)
    val ks = -bound to bound
    val weights = ks.map(k => math.pow(alpha, math.abs(k)))
    val z = weights.sum
    val cums = weights.scanLeft(0.0)(_ + _).tail
    // last cutpoint pinned to exactly 1e6 so the chain is total
    ks.zip(cums).map { case (k, c) =>
      (if (k == bound) 1000000L else math.floor(c / z * 1e6).toLong, k)
    }
  }

  /** The deterministic uniform driving the mechanism: ppm value from
    * the md5 of the group key + seed — the engine-portable hash the
    * sketch oracles already use (md5 hex is identical everywhere;
    * 13 hex chars = 52 bits, mod 1e6 → u_ppm). */
  private def uPpmExpr(keyExpr: String, seed: String): String =
    s"cast(conv(substr(md5(concat($keyExpr, ':', '$seed')), 1, 13), 16, 10) " +
    s"as bigint) % 1000000"

  /** Injective group-key encoding for the noise hash: per column,
    * escape '\' then '|' and map NULL to the sentinel "\N" (which no
    * escaped value can produce — a real backslash always doubles), so
    * distinct group tuples like ('a', NULL) vs (NULL, 'a') or
    * ('a|b','c') vs ('a','b|c') can never hash to the same u and draw
    * correlated noise. Identity on values without '\', '|' or NULLs,
    * so single simple-valued group columns keep their hash input. The
    * DuckDB oracle applies the same replace/coalesce chain. */
  private def encodedKey(groupCols: Seq[String]): org.apache.spark.sql.Column =
    concat_ws("|", groupCols.map { c =>
      coalesce(
        replace(replace(col(c).cast("string"),
          lit("\\"), lit("\\\\")), lit("|"), lit("\\|")),
        lit("\\N"))
    }: _*)

  private def noiseCase(uCol: String, eps: Double, bound: Int): String =
    geometricCutpoints(eps, bound).init.map { case (c, k) =>
      s"WHEN $uCol < ${c}L THEN ${k}L"
    }.mkString("CASE ", " ", s" ELSE ${bound}L END")

  /** ε-DP count release via the truncated geometric mechanism (Ghosh,
    * Roughgarden & Sundararajan 2009: the geometric mechanism is the
    * universally utility-maximizing ε-DP mechanism for count queries;
    * Dwork et al. 2006 for ε-DP itself). Per group: the exact count
    * plus integer noise drawn from [[geometricCutpoints]] at the
    * group's deterministic u, clamped at 0 for releasability. The
    * salted-hash randomness makes the release REPLAYABLE — the same
    * (data, eps, bound, seed) always produces the same noisy counts,
    * which is what makes the release auditable ([[dpNoiseAudit]]) and
    * oracle-checkable; rotate the seed per release period.
    *
    * Scale shape: ONE map-side-combined count aggregation; the noise
    * projection is per-GROUP (report-sized), stateless, codegen'd. */
  def dpNoisyCounts(df: DataFrame, groupCols: Seq[String], eps: Double,
                    bound: Int, seed: String): DataFrame = {
    require(groupCols.nonEmpty)
    df.groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("n_exact"))
      .withColumn("__key", encodedKey(groupCols))
      .withColumn("__u", expr(uPpmExpr("__key", seed)))
      .drop("__key")
      .withColumn("noise", expr(noiseCase("__u", eps, bound)))
      .withColumn("n_noisy", greatest(lit(0L), expr("n_exact + noise")))
  }

  /** The audit half: the released noisy count next to the exact one,
    * the drawn noise, the truncation-bound check, and the utility loss
    * in ppm of the true count — the report a DP release gets before
    * the exact side is discarded. Same single aggregation as the
    * release (it IS the release plus the audit columns). */
  def dpNoiseAudit(df: DataFrame, groupCols: Seq[String], eps: Double,
                   bound: Int, seed: String): DataFrame =
    dpNoisyCounts(df, groupCols, eps, bound, seed)
      .withColumn("noise_ok", abs(col("noise")) <= lit(bound.toLong))
      .withColumn("err_ppm",
        expr("abs(n_noisy - n_exact) * 1000000L div n_exact"))
      .drop("__u")

  /** t-closeness distance per quasi-identifier group (Li et al. 2007):
    * even an l-diverse group leaks when its sensitive-value
    * DISTRIBUTION skews far from the corpus — here measured as the
    * total-variation distance in exact integer ppm, ½·Σ|p_g − p_all|
    * over the categorical domain (equal-distance EMD reduces to TV).
    * Release gate: flag groups with tv_ppm above the policy's t.
    *
    * Scale shape: two bounded aggregations (group×category and global
    * category shares); the dense group×category frame is |groups|·
    * |domain| rows — report-sized, never corpus-sized — built by a
    * broadcast cross of the tiny category list. */
  def tClosenessDistances(df: DataFrame, quasiCols: Seq[String],
                          sensitiveCol: String): DataFrame = {
    require(quasiCols.nonEmpty)
    val grp = df.groupBy((quasiCols.map(col) :+ col(sensitiveCol)): _*)
      .agg(count(lit(1)).as("__n"))
    val gTot = grp.groupBy(quasiCols.map(col): _*)
      .agg(sum(col("__n")).as("__tot"))
    val all = df.groupBy(col(sensitiveCol))
      .agg(count(lit(1)).as("__n_all"))
    val allTot = all.agg(sum(col("__n_all")).as("__tot_all"))
    gTot.crossJoin(broadcast(all))
      .join(grp, quasiCols :+ sensitiveCol, "left")
      .na.fill(0L, Seq("__n"))
      .crossJoin(broadcast(allTot))
      .withColumn("__d", abs(expr("__n * 1000000 div __tot") -
        expr("__n_all * 1000000 div __tot_all")))
      .groupBy(quasiCols.map(col): _*)
      .agg(expr("sum(__d) div 2").cast("long").as("tv_ppm"))
  }
}
