package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted IVF index: the coarse quantizer's centroids plus the
  * pre-assigned inverted lists, written as plain parquet so ANY Spark
  * session (or engine) can query without retraining — build once on the
  * corpus, query many times. The missing piece between [[Ivf]] (which
  * trains per call) and a production ANN serving path.
  *
  * Layout under `dir`:
  *  - `centroids.parquet` — (cluster INT, vec ARRAY<FLOAT>), nlist rows.
  *    Floats round-trip parquet exactly, so a loaded quantizer assigns
  *    identically to the one that built the index.
  *  - `lists.parquet/cluster=<c>/` — `partitionBy("cluster")` directory
  *    layout, one directory per inverted list (bounded by nlist). This
  *    is what makes probing CHEAP: the probed cluster set is bounded by
  *    nlist (driver-safe by construction), so the query side collects
  *    it and reads ONLY those directories — partition pruning at the
  *    file listing, before any row is scanned. At 100 TB with
  *    nlist=4096 and nprobe=8, a query batch touching 64 lists reads
  *    64/4096 of the corpus instead of all of it.
  */
object IvfIndex {

  final case class Loaded(centroids: Array[Array[Float]], lists: DataFrame)

  /** Train the quantizer and write centroids + inverted lists. */
  def build(corpus: DataFrame, idCol: String, vecCol: String, dir: String,
            nlist: Int, iters: Int = 3, maxTrainRows: Long = 0L): Unit = {
    val centroids = Ivf.train(corpus, idCol, vecCol, nlist, iters, maxTrainRows)
    val spark = corpus.sparkSession
    import spark.implicits._
    centroids.zipWithIndex
      .map { case (v, i) => (i, v.toSeq) }.toSeq
      .toDF("cluster", "vec").coalesce(1)
      .write.mode("overwrite").parquet(s"$dir/centroids.parquet")
    corpus.select(
        Ivf.assign(col(vecCol), centroids).as("cluster"),
        col(idCol).as("id"), col(vecCol).cast("array<float>").as("vec"))
      // co-locate each list before the partitioned write: without this,
      // EVERY upstream task opens up to nlist writers (at 100 TB with
      // nlist=4096 that is millions of tiny files + per-task writer
      // churn); repartitioned, each list lands as ~one file
      .repartition(col("cluster"))
      .write.mode("overwrite").partitionBy("cluster")
      .parquet(s"$dir/lists.parquet")
  }

  def load(spark: SparkSession, dir: String): Loaded = {
    val centroids = spark.read.parquet(s"$dir/centroids.parquet")
      .orderBy("cluster").collect() // nlist rows — driver-bounded
      .map(_.getSeq[Float](1).toArray)
    val lists = spark.read.parquet(s"$dir/lists.parquet")
    Loaded(centroids, tombstonesOf(spark, dir) match {
      case Some(t) => lists.join(t, Seq("id"), "left_anti")
      case None => lists
    })
  }

  private def tombstonesOf(spark: SparkSession,
                           dir: String): Option[DataFrame] = {
    val p = new org.apache.hadoop.fs.Path(s"$dir/tombstones.parquet")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) Some(spark.read.parquet(p.toString).select(col("id")))
    else None
  }

  /** DELETE from the index without touching the inverted lists: append
    * the ids to a tombstone side file; [[load]] anti-joins it, so
    * every subsequent query treats the rows as gone. O(deletes) work —
    * the lists (corpus-scale) are not rewritten, the tombstone side
    * stays small between compactions and AQE broadcasts it into the
    * probe path. */
  def markDeleted(ids: DataFrame, idCol: String, dir: String): Unit =
    ids.select(col(idCol).cast("long").as("id")).distinct()
      .coalesce(1)
      .write.mode("append").parquet(s"$dir/tombstones.parquet")

  /** Fold tombstones into the lists (rewrite-and-swap, same
    * cluster-partitioned layout as [[build]]) and drop the side file.
    * Query results are identical before and after by construction —
    * compaction only reclaims space and removes the anti-join. */
  def compact(spark: SparkSession, dir: String): Unit =
    tombstonesOf(spark, dir).foreach { t =>
      val live = spark.read.parquet(s"$dir/lists.parquet")
        .join(t, Seq("id"), "left_anti")
      live.repartition(col("cluster"))
        .write.mode("overwrite").partitionBy("cluster")
        .parquet(s"$dir/lists.compacting.parquet")
      val conf = spark.sparkContext.hadoopConfiguration
      val old = new org.apache.hadoop.fs.Path(s"$dir/lists.parquet")
      val next = new org.apache.hadoop.fs.Path(s"$dir/lists.compacting.parquet")
      val fs = old.getFileSystem(conf)
      fs.delete(old, true)
      fs.rename(next, old)
      fs.delete(new org.apache.hadoop.fs.Path(s"$dir/tombstones.parquet"), true)
    }

  /** ANN top-k against the prebuilt lists: no retraining, no corpus
    * reassignment, and only the PROBED lists are read — the distinct
    * probed-cluster set (≤ nlist ints, driver-safe by construction) is
    * collected and pushed as a partition filter on the directory
    * layout. Same ranking contract as the other ANN tiers. */
  def topK(index: Loaded, queries: DataFrame, idCol: String,
           vecCol: String, k: Int, nprobe: Int = 4): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"),
        explode(Ivf.probes(col(vecCol), index.centroids, nprobe)).as("cluster"))
      .localCheckpoint(true) // probes feed the prune AND the join; one compute
    val probed = q.select(col("cluster")).distinct()
      .collect().map(_.getInt(0)) // ≤ nlist values
    val lists = index.lists
      .filter(col("cluster").isin(probed.toIndexedSeq: _*))
      .select(col("cluster"), col("id").as("corpus_id"), col("vec").as("cv"))
    Ivf.rankListCandidates(lists, q, k) // one scoring/tie-break contract
  }
}
