package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** CDC (change-data-capture) semantics over DMS-shaped data
  * (SURVEY.md §2.9, §7.6; cdc_operator.rs:225-331).
  *
  * DMS exports: `LOAD*` full-load files (plain table schema) and CDC
  * delta files carrying an `Op` column ('I'|'U'|'D') and an ingestion
  * timestamp. The reference upserts file-at-a-time into Postgres; here
  * the same semantics are a deterministic DataFrame merge — one shuffle
  * by PK, AQE-friendly.
  *
  * Scale notes (100 TB): `latestPerKey` is a single hash-partition +
  * per-key top-1 (no global sort). Skewed PKs are impossible by
  * definition (PK is unique per entity); the shuffle is as balanced as
  * the key space. For a snapshot+delta merge the delta side is typically
  * <<1% of the snapshot — the union keeps partition-local work minimal
  * and AQE coalesces small post-shuffle partitions.
  */
object CdcMerge {

  val OpColumn = "Op"
  val TsColumn = "_dms_ingestion_timestamp"

  /** LOAD-file detection (dms_cdc_operator `is_load_file` analog):
    * per-row via input_file_name(), since Spark reads the whole file set
    * as one scan. */
  def isLoadFile(c: Column): Column = c.contains(lit("LOAD"))

  /** Latest row per key: max_by aggregate over (ts, tieBreakers) — a
    * CDC delta repeats hot PKs many times, and the aggregate's partial
    * (map-side) combine shrinks the PK shuffle to ~one row per
    * (partition, key) before the exchange. Tie-breakers make the winner
    * deterministic when timestamps collide — REQUIRED for reproducible
    * merges under retries. */
  def latestPerKey(df: DataFrame, pk: Seq[String], ts: String,
                   tieBreakers: Seq[String] = Nil): DataFrame =
    KeyedReduce.reduceByKey(df, pk, ts +: tieBreakers, largest = true)

  /** Apply a CDC delta batch onto a snapshot:
    *   1. within-batch dedup: latest op per PK wins;
    *   2. snapshot rows with a PK present in the delta are superseded;
    *   3. surviving delta rows with Op in (I, U) are the new versions;
    *      Op = 'D' deletes the key.
    * Result has the snapshot schema (Op/ts stripped).
    */
  def applyDelta(snapshot: DataFrame, delta: DataFrame, pk: Seq[String],
                 tieBreakers: Seq[String] = Nil): DataFrame = {
    val latest = latestPerKey(delta, pk, TsColumn, tieBreakers)
    val upserts = latest.filter(col(OpColumn).isin("I", "U"))
      .select(snapshot.columns.map(col).toIndexedSeq: _*)
    // left_anti: drop snapshot rows whose PK appears in the delta at all
    // (updated rows are replaced; deleted rows just disappear)
    val touched = latest.select(pk.map(col).toIndexedSeq: _*)
    snapshot.join(touched, pk, "left_anti").unionByName(upserts)
  }

  /** Reconstruct the table's state AS OF CDC ingestion timestamp
    * `asOfTs` (inclusive) — point-in-time recovery over an immutable
    * LOAD + CDC file trail. Because DMS deliveries are append-only,
    * every historical state is recoverable by replaying only the
    * deltas at or before the cut: filter is pushed into the delta scan
    * (ts is a leading sort/stats column in real deliveries, so file
    * and row-group pruning apply), then the ordinary one-shuffle merge
    * runs on the surviving — typically tiny — slice. At 100 TB this is
    * the audit/debug primitive: "what did the row look like before
    * Tuesday's batch" without restoring a backup. */
  def snapshotAsOf(load: DataFrame, cdc: DataFrame, pk: Seq[String],
                   asOfTs: Long, tieBreakers: Seq[String] = Nil): DataFrame =
    applyDelta(load, cdc.filter(col(TsColumn) <= asOfTs), pk, tieBreakers)

  /** [[applyDelta]] under ADDITIVE schema evolution: the delta batch
    * may carry columns the snapshot predates (upstream ADD COLUMN —
    * the one drift class that is safe to apply without a fresh full
    * load, and the common one). New columns extend the snapshot with
    * typed NULLs — exactly what the source table held before the
    * column existed — then the ordinary merge runs over the widened
    * schema. Anything NON-additive (a snapshot column missing from the
    * delta = upstream DROP/RENAME) still hard-errors via
    * [[checkSchemaDrift]]: silently nulling dropped columns would ship
    * corrupt reconstructions downstream. */
  def applyDeltaEvolved(snapshot: DataFrame, delta: DataFrame,
                        pk: Seq[String],
                        tieBreakers: Seq[String] = Nil): DataFrame = {
    val dataCols = delta.columns
      .filterNot(c => c == OpColumn || c == TsColumn)
    val dropped = snapshot.columns.filterNot(dataCols.contains)
    if (dropped.nonEmpty)
      throw new IllegalStateException("schema drift: snapshot columns " +
        s"missing from the delta: ${dropped.mkString(", ")} — only ADDITIVE " +
        "evolution applies safely; a new full load is required")
    val added = dataCols.filterNot(snapshot.columns.contains)
    val widened = added.foldLeft(snapshot)((df, c) =>
      df.withColumn(c, lit(null).cast(delta.schema(c).dataType)))
    applyDelta(widened, delta, pk, tieBreakers)
  }

  /** Schema-drift check (cdc_operator.rs:255-273): every data column
    * (minus Op/ts) must exist in the expected schema; extras => hard
    * error, forcing a fresh full load upstream. With `requireAll` the
    * check is symmetric — expected columns MISSING from the file (an
    * upstream DROP COLUMN) also abort. The reference checks extras
    * only; the CLI's --expect-cols path opts into the symmetric form
    * because its expected set IS the target catalog, and shipping a
    * reconstructed table silently missing a column is the same class
    * of drift. */
  def checkSchemaDrift(df: DataFrame, expectedColumns: Set[String],
                       requireAll: Boolean = false): Unit = {
    val present = df.schema.fieldNames
      .filterNot(c => c == OpColumn || c == TsColumn)
    val extra = present.filterNot(expectedColumns.contains)
    val missing = if (requireAll) (expectedColumns -- present).toSeq.sorted
                  else Nil
    // report BOTH directions in one error: a RENAME is one extra plus
    // one missing, and naming only the extra would cost a second round
    // trip to diagnose it
    if (extra.nonEmpty || missing.nonEmpty) {
      val parts = Seq(
        if (extra.nonEmpty)
          Some(s"unexpected columns ${extra.mkString(", ")}") else None,
        if (missing.nonEmpty)
          Some(s"expected columns missing: ${missing.mkString(", ")}") else None
      ).flatten
      throw new IllegalStateException(
        s"schema drift: ${parts.mkString("; ")}; a new full load is required")
    }
  }

  /** Snapshot diff — the audit/reconciliation primitive: classify every
    * primary key across two snapshot versions as `added`, `removed`, or
    * `changed` (unchanged keys are omitted; at 100 TB they are ~all of
    * the table and nobody wants them listed). Payload comparison is a
    * null-safe STRUCT compare over the common non-PK columns, so NULL
    * transitions count as changes and no hashing weakens the answer.
    *
    * Scale shape: one full-outer shuffle join on the PK — the minimum
    * possible for an exact diff of unsorted snapshots; with both sides
    * bucketed by PK on disk the exchange vanishes entirely. */
  def snapshotDiff(oldSnap: DataFrame, newSnap: DataFrame,
                   pk: Seq[String]): DataFrame = {
    val payload = oldSnap.columns.filterNot(pk.contains)
      .filter(newSnap.columns.contains)
    require(payload.nonEmpty, "snapshots share no non-PK columns")
    val o = oldSnap.select(pk.map(col) :+
      struct(payload.map(col): _*).as("__old"): _*)
    val n = newSnap.select(pk.map(col) :+
      struct(payload.map(col): _*).as("__new"): _*)
    o.join(n, pk, "full_outer")
      .withColumn("change",
        when(col("__new").isNull, lit("removed"))
          .when(col("__old").isNull, lit("added"))
          .when(!(col("__old") <=> col("__new")), lit("changed")))
      .filter(col("change").isNotNull)
      .select(pk.map(col) :+ col("change"): _*)
  }

  /** SCD Type 2 dimension build (Kimball's slowly-changing-dimension
    * pattern) from a change stream: per key, each surviving version row
    * carries a validity interval [effective_from, effective_to) and an
    * `is_current` flag; consecutive changes whose TRACKED attributes
    * are unchanged collapse into the earlier version (no-op updates —
    * CDC streams are full of them — must not open a new interval).
    * Null-safe attribute comparison, deterministic (ts, tie) ordering.
    *
    * Scale shape: one exchange on the key; the no-op-collapse lag and
    * the interval lead both ride that same partitioning (the
    * sessionize pattern), so adding SCD2 on top of a CDC ingest costs
    * one window stage, not a second shuffle. */
  def scd2(changes: DataFrame, pk: Seq[String], ts: String, tie: String,
           tracked: Seq[String]): DataFrame = {
    require(tracked.nonEmpty, "scd2 needs at least one tracked column")
    val keyCols = pk.map(col)
    val w = Window.partitionBy(keyCols: _*)
      .orderBy(col(ts).asc, col(tie).asc)
    // the first version must survive even when its tracked values are
    // all NULL: lag() yields NULL both for "no previous row" and for a
    // NULL attribute, and <=> would conflate them — so "a previous row
    // exists" is probed with a lagged constant, not the attributes
    val collapsed = changes
      .withColumn("__same",
        lag(lit(1), 1).over(w).isNotNull &&
          tracked.map(c => col(c) <=> lag(col(c), 1).over(w)).reduce(_ && _))
      .filter(!col("__same"))
      .drop("__same")
    collapsed
      .withColumn("effective_from", col(ts))
      .withColumn("effective_to", lead(col(ts), 1).over(w))
      .withColumn("is_current", col("effective_to").isNull)
  }

  /** Point-in-time (AS OF) join of a fact stream against an SCD2
    * dimension ([[scd2]] output): each fact row is paired with the
    * dimension VERSION in effect at its timestamp — the warehouse
    * "join facts to history, not to today" primitive. Because SCD2
    * intervals TILE per key (effective_to is the next version's
    * effective_from), "latest version with effective_from <= fact ts"
    * IS interval containment, so this rides [[Temporal.asofJoin]]'s
    * union + single-partitioned-window plan — one exchange on the key,
    * no range join, no interval multiplication. Dimension payload
    * lands under `prefix` (pre-renamed, so name collisions with fact
    * columns are impossible by construction). */
  def pointInTimeJoin(fact: DataFrame, dim: DataFrame, pk: Seq[String],
                      factTs: String, fromCol: String = "effective_from",
                      prefix: String = "dim_"): DataFrame = {
    val payload = dim.columns.filterNot(c => pk.contains(c) || c == fromCol)
    val d = payload.foldLeft(dim) { (df, c) =>
      df.withColumnRenamed(c, prefix + c)
    }.withColumnRenamed(fromCol, factTs)
    graft.operators.Temporal.asofJoin(fact, d, pk, factTs, rightPrefix = "")
  }
}
