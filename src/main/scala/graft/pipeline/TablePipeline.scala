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
        val t = wholeTableRegistry.getOrElse(name, NoOpWholeTableTransformator)
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
             parallelism: Int = 8): Unit = {
    import java.util.concurrent.Executors
    import scala.concurrent.{Await, ExecutionContext, Future}
    import scala.concurrent.duration.Duration

    val pool = Executors.newFixedThreadPool(parallelism)
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
    try {
      val futures = tables.map { table =>
        Future {
          config.tableConfig(table) match {
            case Some(cfg) =>
              val df = spark.read.parquet(s"$inDir/$table.parquet")
              build(df, cfg, seed).write.mode("overwrite")
                .parquet(s"$outDir/$table.parquet")
            case None => // pass-through fast path: no decode, no Spark job
              copyRecursive(java.nio.file.Paths.get(inDir, s"$table.parquet"),
                            java.nio.file.Paths.get(outDir, s"$table.parquet"))
          }
        }
      }
      Await.result(Future.sequence(futures), Duration.Inf)
    } finally pool.shutdown()
  }

  private def copyRecursive(src: java.nio.file.Path, dst: java.nio.file.Path): Unit = {
    import java.nio.file._
    if (Files.isDirectory(src)) {
      Files.createDirectories(dst)
      Files.list(src).forEach(p => copyRecursive(p, dst.resolve(p.getFileName)))
    } else {
      Files.createDirectories(dst.getParent)
      Files.copy(src, dst, StandardCopyOption.REPLACE_EXISTING)
    }
  }
}
