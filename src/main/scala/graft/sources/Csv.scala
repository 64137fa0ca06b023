package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.{StringType, StructField, StructType}

/** CSV source/sink under the SAME delivery contract as [[Jsonl]] — the
  * second-most-common bulk hand-off format after JSONL. The three
  * pinned decisions are identical and for the same reasons:
  *
  *   - EXPLICIT schema always (inference = a second full pass, and CSV
  *     inference is even less stable than JSON's — everything is a
  *     string until proven otherwise);
  *   - PERMISSIVE with a dedicated corrupt-record column: a malformed
  *     line becomes a quarantine ROW (all-null payload + the raw
  *     line), never a failed stage;
  *   - the corrupt column is appended here so every reader shares one
  *     quarantine contract.
  *
  * CSV splits on line boundaries like JSONL (`multiLine` stays off —
  * a quoted embedded newline cannot split and serializes a file onto
  * one task; deliveries that need embedded newlines should be JSONL).
  * Headerless by convention: the schema IS the contract, and a header
  * row per part-file would inject a spurious quarantine row each.
  */
object Csv {

  /** Same name and semantics as [[Jsonl.CorruptColumn]], including the
    * QUERY_ONLY_CORRUPT_RECORD_COLUMN caveat documented there. */
  val CorruptColumn: String = Jsonl.CorruptColumn

  private def fullSchema(schema: StructType): StructType = {
    require(!schema.fieldNames.contains(CorruptColumn),
      s"schema must not predeclare $CorruptColumn — it is appended here")
    StructType(schema.fields :+ StructField(CorruptColumn, StringType))
  }

  def read(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read
      .schema(fullSchema(schema))
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", CorruptColumn)
      .option("header", "false")
      .csv(path)

  /** Streaming twin of [[read]] — batch backfill and incremental
    * ingest of a drop directory agree row for row. */
  def readStream(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.readStream
      .schema(fullSchema(schema))
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", CorruptColumn)
      .option("header", "false")
      .csv(path)

  /** Write side: headerless, standard double-quote escaping (the
    * default every CSV consumer speaks), one file per partition, a
    * stray [[CorruptColumn]] dropped — quarantine rows are
    * diagnostics, not payload. Round-trip exactness under the same
    * explicit schema is pinned by q_csv_roundtrip's oracle. */
  def write(df: DataFrame, path: String): Unit =
    df.drop(CorruptColumn)
      .write.mode("overwrite")
      .option("header", "false")
      .csv(path)
}
