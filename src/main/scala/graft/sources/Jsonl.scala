package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.{StringType, StructField, StructType}

/** JSONL (newline-delimited JSON) source — the ingest format most
  * crawl / training-data deliveries arrive in. A thin, opinionated
  * layer over `spark.read.json` that pins the three decisions that
  * matter at corpus scale:
  *
  *   - an EXPLICIT schema, always: schema inference is a full extra
  *     pass over the data (a second 100 TB scan) and infers
  *     per-delivery types that drift batch to batch;
  *   - PERMISSIVE mode with a dedicated corrupt-record column: a
  *     crawl delivery always contains malformed lines, and a bad line
  *     must become a quarantine ROW (routed, counted, inspectable),
  *     never a failed 1000-executor stage;
  *   - the corrupt column is appended here, not left to callers, so
  *     every reader gets the same quarantine contract.
  *
  * The read is a streaming-friendly line scan: JSONL splits on line
  * boundaries, so it parallelizes like text (no multiline JSON, which
  * cannot split and serializes the file onto one task).
  */
object Jsonl {

  /** The quarantine column: null for clean rows, the raw malformed
    * line for corrupt ones. Spark caveat: a query whose referenced
    * columns are ONLY this one is rejected over raw JSON
    * (UNSUPPORTED_FEATURE.QUERY_ONLY_CORRUPT_RECORD_COLUMN) — carry a
    * payload column in the projection AND genuinely read it (column
    * pruning strips a merely-carried column under a bare count() and
    * re-triggers the error: aggregate over the payload, or collect
    * both), or cache the parsed frame first. Both escapes and the
    * caveat itself are pinned in JsonlSpec. */
  val CorruptColumn = "_corrupt_record"

  private def fullSchema(schema: StructType): StructType = {
    require(!schema.fieldNames.contains(CorruptColumn),
      s"schema must not predeclare $CorruptColumn — it is appended here")
    StructType(schema.fields :+ StructField(CorruptColumn, StringType))
  }

  /** Read newline-delimited JSON at `path` with the given DATA schema
    * (the corrupt column is appended internally — callers describe
    * only their payload). */
  def read(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read
      .schema(fullSchema(schema))
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", CorruptColumn)
      .json(path)

  /** The same contract as a STREAM: a drop directory of JSONL
    * deliveries consumed incrementally, each malformed line a
    * quarantine row in the same batch that read it — identical schema,
    * mode, and corrupt column as [[read]], so batch backfill and
    * streaming ingest agree row for row (parity pinned in JsonlSpec). */
  def readStream(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.readStream
      .schema(fullSchema(schema))
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", CorruptColumn)
      .json(path)

  /** The WRITE side of the same contract: emit `df` as newline-delimited
    * JSON at `path`, one file per partition (the parallel-write shape —
    * no coalesce here; a 100 TB export wants every executor writing).
    *
    * Two deliberate choices, both pinned in JsonlSpec:
    *   - a [[CorruptColumn]] present on `df` (e.g. a frame that came
    *     from [[read]]) is DROPPED: quarantine rows are diagnostics,
    *     not payload, and re-exporting them would smuggle malformed
    *     text back into a clean delivery as a quoted field;
    *   - null fields are written explicitly (`ignoreNullFields=false`),
    *     so a round-trip under the same explicit schema is exact and a
    *     consumer can distinguish "field is null" from "line truncated".
    */
  def write(df: DataFrame, path: String): Unit =
    df.drop(CorruptColumn)
      .write.mode("overwrite")
      .option("ignoreNullFields", "false")
      .json(path)
}
