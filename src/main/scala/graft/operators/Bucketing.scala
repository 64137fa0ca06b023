package graft.operators

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed-table utilities — the co-located-join path for repeated big
  * joins on a stable key (orders⋈lineitem every day at 100 TB).
  *
  * Writing both sides bucketed by the join key with the same bucket
  * count lets Spark plan a SortMergeJoin with NO Exchange on either
  * side: the shuffle happens once at write time and is amortized over
  * every subsequent join (asserted in BucketingStreamSpec).
  */
object Bucketing {

  /** Persist `df` as a bucketed table in the session catalog's
    * warehouse. `sortBy` additionally pre-sorts within buckets so the
    * join skips its sort too. */
  def writeBucketed(df: DataFrame, table: String, bucketCol: String,
                    buckets: Int, sortCols: Seq[String] = Nil): Unit = {
    // the name reaches BOTH a SQL statement and a recursive filesystem
    // delete below — a '../'-bearing or quoted name must never get there
    require(table.matches("[A-Za-z_][A-Za-z0-9_]*"),
      s"table name must be a plain identifier, got: $table")
    val spark = df.sparkSession
    spark.sql(s"DROP TABLE IF EXISTS $table")
    // a stale location without a catalog entry (crashed run) blocks
    // managed-table creation; clear it through Hadoop FileSystem so a
    // non-local warehouse (hdfs://, s3a://) is handled too
    import org.apache.hadoop.fs.Path
    val warehouse = new Path(spark.conf.get("spark.sql.warehouse.dir"))
    val loc = new Path(warehouse, table)
    val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // fs.delete returns false for an already-gone path too: only a
    // STILL-existing location after a failed delete is an error
    if (fs.exists(loc) && !fs.delete(loc, true) && fs.exists(loc))
      throw new java.io.IOException(s"could not clear stale table location $loc")
    var w = df.write.mode(SaveMode.Overwrite)
      .format("parquet")
      .bucketBy(buckets, bucketCol)
    if (sortCols.nonEmpty) w = w.sortBy(sortCols.head, sortCols.tail: _*)
    w.saveAsTable(table)
  }

  /** Join two same-bucketed tables on the bucket key — plans without a
    * shuffle when bucket specs line up. */
  def coLocatedJoin(spark: SparkSession, left: String, right: String,
                    key: String): DataFrame =
    spark.table(left).join(spark.table(right), key)
}
