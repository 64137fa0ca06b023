package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.Bridge

import graft.fakegen.FakeGen

/** Deterministic sampling & dataset-mixing operators for training-data
  * curation. Unlike `df.sample` (partition-order-dependent RNG), every
  * operator here keys its decision on row CONTENT + seed: stable across
  * runs, partitionings, task retries, and cluster sizes — a sample
  * drawn at 100 TB is reproducible bit-for-bit.
  */
object Sampling {

  /** Stable per-row uniform in [0, 1) derived from a key column + seed
    * (SplitMix64 finalizer => high-quality avalanche). */
  def uniform(key: Column, seed: Long = FakeGen.DefaultSeed): Column = {
    val mixed = Bridge.column(graft.functions.Mix64Expr(
      Bridge.expression(hash(key).cast("long")), seed))
    (mixed / lit(Long.MaxValue.toDouble)).cast("double") * 0.5 + 0.5
  }

  /** Keep ~`fraction` of rows, decided by hash(key, seed). */
  def hashSample(df: DataFrame, keyCol: String, fraction: Double,
                 seed: Long = FakeGen.DefaultSeed): DataFrame =
    df.filter(uniform(col(keyCol), seed) < fraction)

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

  /** Weighted deterministic mix of datasets (a training mixture):
    * each source is hash-subsampled to its weight, then unioned with a
    * provenance column. Weights in [0, 1] are independent keep-rates
    * (not normalized shares). */
  def weightedMix(sources: Seq[(String, DataFrame, Double)], keyCol: String,
                  seed: Long = FakeGen.DefaultSeed): DataFrame = {
    require(sources.nonEmpty)
    sources.map { case (name, df, weight) =>
      // domain-separate the seed per source so the same key draws
      // independently in different sources
      val s = FakeGen.mix64(seed ^ FakeGen.hash64(name))
      hashSample(df, keyCol, weight, s).withColumn("__source", lit(name))
    }.reduce(_ unionByName _)
  }
}
