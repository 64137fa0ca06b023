package graft.sources

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types._

/** Fixture-drift canary. The driver regenerates /root/testdata between
  * rounds and has already changed a column's physical type underneath
  * the repo once (r9: events.ts went TIMESTAMP(NANOS) → TIMESTAMP_MICROS
  * and silently broke seven queries plus six test suites). [[check]]
  * probes each table's Spark-read schema against the recorded
  * expectation and returns a one-line diff per drifted column —
  * "events.ts: STRING, expected one of BIGINT/TIMESTAMP_NTZ/TIMESTAMP" —
  * so the next silent environment shift becomes a named failure.
  *
  * Expectations are dtypes AS READ BY SPARK under the repo's standard
  * session config (`nanosAsLong=true`): the current µs fixture's naive
  * timestamp[us] surfaces as TIMESTAMP_NTZ; a regenerated
  * TIMESTAMP(NANOS) fixture would surface as BIGINT; a tz-adjusted
  * micros column would surface as TIMESTAMP. Timestamp columns list the
  * whole family the ingestion seam dispatches on (SparkEntry.events) —
  * any member is fine, anything else is drift.
  */
object FixtureCanary {

  private val tsFamily: Set[DataType] =
    Set(TimestampNTZType, TimestampType, LongType)
  private def one(d: DataType): Set[DataType] = Set(d)

  private val expected: Seq[(String, Seq[(String, Set[DataType])])] = Seq(
    "region" -> Seq(
      "r_regionkey" -> one(IntegerType), "r_name" -> one(StringType)),
    "nation" -> Seq(
      "n_nationkey" -> one(IntegerType), "n_name" -> one(StringType),
      "n_regionkey" -> one(IntegerType)),
    "customer" -> Seq(
      "c_custkey" -> one(LongType), "c_name" -> one(StringType),
      "c_nationkey" -> one(IntegerType), "c_acctbal" -> one(DoubleType),
      "c_mktsegment" -> one(StringType)),
    "supplier" -> Seq(
      "s_suppkey" -> one(LongType), "s_name" -> one(StringType),
      "s_nationkey" -> one(IntegerType), "s_acctbal" -> one(DoubleType)),
    "part" -> Seq(
      "p_partkey" -> one(LongType), "p_name" -> one(StringType),
      "p_brand" -> one(StringType), "p_type" -> one(StringType),
      "p_size" -> one(IntegerType), "p_retailprice" -> one(DoubleType)),
    "orders" -> Seq(
      "o_orderkey" -> one(LongType), "o_custkey" -> one(LongType),
      "o_orderstatus" -> one(StringType), "o_totalprice" -> one(DoubleType),
      "o_orderdate" -> tsFamily, "o_orderpriority" -> one(StringType)),
    "lineitem" -> Seq(
      "l_orderkey" -> one(LongType), "l_partkey" -> one(LongType),
      "l_suppkey" -> one(LongType), "l_linenumber" -> one(IntegerType),
      "l_quantity" -> one(DoubleType), "l_extendedprice" -> one(DoubleType),
      "l_discount" -> one(DoubleType), "l_tax" -> one(DoubleType),
      "l_returnflag" -> one(StringType), "l_linestatus" -> one(StringType),
      "l_shipdate" -> tsFamily),
    "events" -> Seq(
      "event_id" -> one(LongType), "ts" -> tsFamily,
      "user_id" -> one(LongType), "event_type" -> one(StringType),
      "value" -> one(DoubleType), "props" -> one(StringType)),
    "documents" -> Seq(
      "doc_id" -> one(LongType), "text" -> one(StringType),
      "lang" -> one(StringType), "source" -> one(StringType),
      "n_chars" -> one(LongType)),
    "embeddings" -> Seq(
      "vec_id" -> one(LongType),
      "embedding" -> Set[DataType](
        ArrayType(FloatType, true), ArrayType(FloatType, false)),
      "label" -> one(IntegerType)))

  /** Empty = fixture matches the recorded expectation; otherwise one
    * line per missing table / missing column / drifted dtype. */
  def check(spark: SparkSession, dir: String): Seq[String] =
    expected.flatMap { case (table, cols) =>
      val path = s"$dir/$table.parquet"
      if (!new java.io.File(path).exists())
        Seq(s"$table: table missing at $path")
      else {
        val byName = spark.read.parquet(path).schema
          .fields.map(f => f.name -> f.dataType).toMap
        cols.flatMap { case (name, allowed) =>
          byName.get(name) match {
            case None =>
              Some(s"$table.$name: column missing " +
                s"(have ${byName.keys.toSeq.sorted.mkString(", ")})")
            case Some(d) if !allowed(d) =>
              Some(s"$table.$name: ${d.sql}, expected one of " +
                allowed.map(_.sql).toSeq.sorted.mkString("/"))
            case _ => None
          }
        }
      }
    }
}
