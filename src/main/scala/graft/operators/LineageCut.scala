package graft.operators

import org.apache.spark.sql.DataFrame

/** Per-iteration lineage cuts for the BSP loops (PageRank, BFS depth,
  * the min-label components fixpoint): without a cut, iteration i's
  * plan nests all i-1 predecessors, so analysis time and recomputation
  * cost grow without bound.
  *
  * Two modes, selected per session by `spark.graft.bsp.checkpoint`:
  *
  *   - `local` (default): eager `localCheckpoint` — executor-local
  *     blocks, zero distributed-FS traffic. Right on a single machine,
  *     or when re-running the whole job after an executor loss is
  *     acceptable.
  *   - `reliable`: eager `checkpoint` to the context's checkpoint dir
  *     (the caller must `sparkContext.setCheckpointDir` to a
  *     cluster-visible path first — enforced with a clear error). On a
  *     1000-executor cluster a lost executor takes its localCheckpoint
  *     blocks with it, and with lineage truncated that kills the JOB;
  *     reliable mode survives executor loss at the cost of one DFS
  *     write per iteration. [[release]] deletes the superseded
  *     iteration's snapshot files (the GraphX PeriodicCheckpointer
  *     discipline), so the DFS footprint stays ~one snapshot, not
  *     `iters`. The FINAL iteration's files live until the consumer is
  *     done and the checkpoint dir is cleaned — by design.
  */
object LineageCut {
  /** Session conf key: "local" (default) | "reliable". */
  val ModeKey = "spark.graft.bsp.checkpoint"

  private def reliable(df: DataFrame): Boolean =
    df.sparkSession.conf.get(ModeKey, "local") == "reliable"

  /** Materialize `df` eagerly and cut its lineage per the session
    * mode. */
  def cut(df: DataFrame): DataFrame =
    if (reliable(df)) {
      require(df.sparkSession.sparkContext.getCheckpointDir.isDefined,
        s"$ModeKey=reliable requires sparkContext.setCheckpointDir to a " +
          "cluster-visible path")
      df.checkpoint(eager = true)
    } else {
      // layout-keeping variant: a plain localCheckpoint under AQE
      // forgets the materialized rows' partitioning/ordering (the
      // adaptive plan is a leaf reporting UnknownPartitioning), so the
      // NEXT iteration's same-keyed aggregation or window re-shuffles
      // rows that are already laid out right — once per BSP round. The
      // bridge re-reads both facts from the final adaptive plan, which
      // is what produced the checkpointed blocks — GATED on the layout
      // being at least defaultParallelism wide: keeping a coalesced
      // 1–4-partition local layout would pin every downstream same-key
      // stage to that width (measured +110 % on q_label_prop), while a
      // production-width layout keeps its per-round exchange elision.
      org.apache.spark.sql.graftbridge.Bridge.localCheckpointKeepingLayout(
        df, df.sparkSession.sparkContext.defaultParallelism)
    }

  /** Free a superseded cut — block-manager blocks always, plus the
    * snapshot files in reliable mode. The df must not be re-executed
    * afterwards (lineage is truncated; its data is gone by design). */
  def release(df: DataFrame): Unit = {
    org.apache.spark.sql.graftbridge.Bridge.releaseMaterialized(df)
    org.apache.spark.sql.graftbridge.Bridge.checkpointFileOf(df).foreach { p =>
      val path = new org.apache.hadoop.fs.Path(p)
      val fs = path.getFileSystem(
        df.sparkSession.sparkContext.hadoopConfiguration)
      fs.delete(path, true)
      ()
    }
  }
}
