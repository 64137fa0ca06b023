package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types.StructType

/** Streaming face of the CDC pipeline (SURVEY.md §7.6 extension): the
  * reference processes DMS files batch-at-a-time; the same semantics as
  * a Structured Streaming job make the engine incremental — new CDC
  * files appearing under a prefix are picked up, deduped per key, and
  * merged continuously.
  *
  * Scale notes: state is one row per PK (the latest version) in the
  * state store — bounded by entity count, not event count. The windowed
  * aggregate uses a watermark so state for closed windows is dropped;
  * without it a 100 TB stream would accumulate unbounded state.
  */
object CdcStream {

  /** File-based micro-batch source over a directory of parquet files —
    * the DMS prefix analog. `maxFilesPerTrigger` bounds per-batch work
    * (ingestion backpressure). */
  def readFiles(spark: SparkSession, path: String, schema: StructType,
                maxFilesPerTrigger: Int = 16): DataFrame =
    spark.readStream
      .schema(schema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .parquet(path)

  /** Event-time windowed aggregation with a watermark (counts + value
    * sums per event_type per window). Late data beyond the watermark is
    * dropped and its state reclaimed. */
  def windowedCounts(events: DataFrame, tsCol: String, watermark: String,
                     window_ : String): DataFrame =
    events
      .withWatermark(tsCol, watermark)
      .groupBy(window(col(tsCol), window_), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("total_value"))

  /** Streaming exact dedup: drops rows whose `keyCols` were already seen
    * within the watermark horizon — the streaming face of Dedup.exact
    * for continuous ingestion. State is bounded by the watermark (keys
    * older than the horizon are dropped from the store), which is what
    * makes it safe on an unbounded 100 TB/day feed. */
  def dedupWithinWatermark(events: DataFrame, tsCol: String, watermark: String,
                           keyCols: Seq[String]): DataFrame =
    events
      .withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark(keyCols.head, keyCols.tail: _*)

  /** Continuously-maintained latest-row-per-key via typed state
    * (KeyValueGroupedDataset.flatMapGroupsWithState): the streaming
    * equivalent of CdcMerge.latestPerKey. Emits the new latest row for
    * a key whenever it changes. */
  def latestPerKeyStream(events: DataFrame, keyCol: String, tsCol: String)
      : DataFrame = {
    import events.sparkSession.implicits._
    case class KV(key: Long, ts: Long, payload: String)
    val typed = events.select(
      col(keyCol).cast("long").as("key"),
      col(tsCol).cast("long").as("ts"),
      to_json(struct(events.columns.map(col).toIndexedSeq: _*)).as("payload"))
      .as[(Long, Long, String)]

    typed.groupByKey(_._1)
      .flatMapGroupsWithState[(Long, String), (Long, Long, String)](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (key: Long, rows: Iterator[(Long, Long, String)],
         state: GroupState[(Long, String)]) =>
          val incoming = rows.maxByOption(r => (r._2, r._3))
          incoming match {
            case Some((_, ts, payload)) =>
              val newer = !state.exists || ts > state.get._1
              if (newer) {
                state.update((ts, payload))
                Iterator.single((key, ts, payload))
              } else Iterator.empty
            case None => Iterator.empty
          }
      }
      .toDF("key", "ts", "payload")
  }
}
