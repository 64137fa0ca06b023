package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.config._
import graft.fakegen.FakeGen
import graft.operators.{Filters, Transformators}

/** Pluggable whole-table transformation — the reference's open-source
  * build ships only NoOp (whole_table_transformator.rs:1-21); real
  * implementations register by name. */
trait WholeTableTransformator extends Serializable {
  def name: String
  def apply(df: DataFrame): DataFrame
}

object NoOpWholeTableTransformator extends WholeTableTransformator {
  val name = "noop"
  def apply(df: DataFrame): DataFrame = df
}

/** A real whole-table transformation (the reference ships only NoOp in
  * its open-source build; its production impl is private —
  * whole_table_transformator.rs:1-21): deterministically fake EVERY
  * string column, preserving all other types. The blanket-anonymization
  * hammer for tables with no per-column config. */
final class FakeAllStringsTransformator(seed: Long = graft.fakegen.FakeGen.DefaultSeed)
    extends WholeTableTransformator {
  val name = "fake_all_strings"
  def apply(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions.col
    import org.apache.spark.sql.types.StringType
    val outCols = df.schema.fields.map { f =>
      if (f.dataType == StringType)
        graft.functions.anon.fakeUuid(col(f.name), seed).as(f.name)
      else col(f.name)
    }
    df.select(outCols.toIndexedSeq: _*)
  }
}

/** Per-table plan builder — the Spark re-expression of the reference's
  * per-file dataflow (anonymization_dataframe_operator.rs:50-326):
  *
  *   scan -> [limit] -> [sanitize null bytes] -> [filter] -> transforms
  *
  * One declarative DataFrame plan per TABLE (not per file): Spark's
  * parquet source partitions the file set, so the reference's
  * file-at-a-time loop becomes partition parallelism for free, and
  * Catalyst pushes the filter into the scan ahead of the transforms.
  *
  * Scale notes (100 TB): the whole pipeline is narrow (scan->project),
  * zero shuffles; `limit(n)` plans as CollectLimit which stops scanning
  * remaining files once satisfied; filter pushdown prunes row groups
  * before decode. Nothing here is driver-bound — no collect().
  */
object TablePipeline {

  /** Built-in whole-table transformations; caller registries extend or
    * override. An anonymization tool must FAIL CLOSED: an unknown name
    * throws (like Transformators.custom) instead of silently passing
    * raw PII through as a NoOp. */
  def defaultWholeTableRegistry(seed: Long): Map[String, WholeTableTransformator] = {
    val fakeAll = new FakeAllStringsTransformator(seed)
    Map(
      NoOpWholeTableTransformator.name -> NoOpWholeTableTransformator,
      fakeAll.name -> fakeAll)
  }

  /** `keep_num_of_records` (§2.2): the reference slices the FIRST load
    * file and skips the rest; table-level `limit(n)` is the declared
    * Spark contract (a semantic superset — see SURVEY.md §2.2). When
    * `deterministic` ordering columns are given, the sample is stable
    * across runs/partitionings. */
  def build(df: DataFrame, cfg: TableConfig,
            seed: Long = FakeGen.DefaultSeed,
            orderForLimit: Seq[String] = Nil,
            wholeTableRegistry: Map[String, WholeTableTransformator] = Map.empty)
      : DataFrame = {
    var out = df
    cfg.keepNumOfRecords.foreach { n =>
      require(n > 0 && n <= Int.MaxValue,
        s"keep_num_of_records $n not in (0, ${Int.MaxValue}] — " +
        "limit(n.toInt) would silently wrap")
      out = if (orderForLimit.nonEmpty)
        out.orderBy(orderForLimit.map(col): _*).limit(n.toInt)
      else out.limit(n.toInt)
    }
    if (cfg.sanitizeNullBytes) out = Transformators.sanitizeNullBytes(out)
    cfg.filterType match {
      case FilterType.NoFilter => ()
      case f => out = out.filter(Filters.compile(f))
    }
    cfg.anonymizationType match {
      case AnonymizationType.Multi(transforms) =>
        out = Transformators.applyMulti(out, transforms, seed)
      case AnonymizationType.Single(name) =>
        val registry = defaultWholeTableRegistry(seed) ++ wholeTableRegistry
        val t = registry.getOrElse(name, throw new IllegalArgumentException(
          s"unknown whole-table transformation '$name' " +
          s"(registered: ${registry.keys.toSeq.sorted.mkString(", ")}); " +
          "refusing to silently pass the table through un-anonymized"))
        out = t(out)
    }
    out
  }

  /** Run a whole config against a directory of `<table>.parquet` inputs,
    * writing anonymized parquet per table. Tables NOT mentioned in the
    * config pass through via a filesystem copy without a Spark job — the
    * reference's server-side-copy fast path
    * (anonymization_dataframe_operator.rs:246-258, 369-394).
    *
    * Tables run concurrently on the driver (NUM_OF_BUFFERS analog,
    * cdc_operator.rs:352-357): each Spark action is submitted from its
    * own pool thread, so small tables don't serialize behind big ones.
    */
  def runAll(spark: SparkSession, config: AnonymizationConfig,
             inDir: String, outDir: String,
             tables: Seq[String],
             seed: Long = FakeGen.DefaultSeed,
             parallelism: Int = 8): Unit =
    foreachTableConcurrently(tables, parallelism) { table =>
      config.tableConfig(table) match {
        case Some(cfg) =>
          val df = spark.read.parquet(s"$inDir/$table.parquet")
          build(df, cfg, seed).write.mode("overwrite")
            .parquet(s"$outDir/$table.parquet")
        case None => // pass-through fast path: no decode, no Spark job
          copyRecursive(spark, s"$inDir/$table.parquet",
                        s"$outDir/$table.parquet")
      }
    }

  /** Shared driver-side concurrency scaffold (NUM_OF_BUFFERS analog):
    * run `work` per table on a bounded pool, propagate the first
    * failure, always shut the pool down. One implementation for every
    * table-parallel driver loop (runAll, the CLI's DMS branch). */
  def foreachTableConcurrently(tables: Seq[String], parallelism: Int)
                              (work: String => Unit): Unit = {
    import java.util.concurrent.Executors
    import scala.concurrent.{Await, ExecutionContext, Future}
    import scala.concurrent.duration.Duration
    val pool = Executors.newFixedThreadPool(parallelism)
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
    try Await.result(
      Future.sequence(tables.map(t => Future(work(t)))), Duration.Inf)
    finally pool.shutdown()
  }

  /** Byte copy through Hadoop FileSystem — works for file://, hdfs://,
    * s3a:// alike (java.nio would treat a URI as a relative local path),
    * mirroring the reference's server-side S3 copy. */
  private def copyRecursive(spark: SparkSession, src: String, dst: String): Unit = {
    import org.apache.hadoop.fs.{FileUtil, Path}
    val conf = spark.sparkContext.hadoopConfiguration
    val srcP = new Path(src)
    val dstP = new Path(dst)
    val srcFs = srcP.getFileSystem(conf)
    val dstFs = dstP.getFileSystem(conf)
    if (!FileUtil.copy(srcFs, srcP, dstFs, dstP,
        /* deleteSource = */ false, /* overwrite = */ true, conf))
      throw new java.io.IOException(s"pass-through copy failed: $src -> $dst")
  }
}
