package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Spark 4 removed the public `new Column(expr)` constructor; the
  * supported conversion lives in `private[sql]` ExpressionUtils. This
  * bridge (in the org.apache.spark.sql package on purpose) is the single
  * place the library crosses that boundary.
  */
/** Strict input-type declaration for graft expressions. Spark 4 made
  * `AbstractDataType` private[sql], so a library expression can't spell
  * the `inputTypes` signature of ExpectsInputTypes in its own package;
  * this trait (inside the sql package on purpose) adapts a plain
  * `Seq[DataType]` — DataType is public — to it. Gives SQL-registered
  * functions real analysis-time type checking (`fake_email(42)` fails
  * with a clear data-type mismatch instead of a runtime ClassCastException).
  */
trait DeclaredInputTypes
    extends org.apache.spark.sql.catalyst.expressions.ExpectsInputTypes {
  /** Concrete expected type per child, in order. */
  def declaredInputTypes: Seq[org.apache.spark.sql.types.DataType]
  override def inputTypes: Seq[org.apache.spark.sql.types.AbstractDataType] =
    declaredInputTypes
}

object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Convert a Column's node tree into a real catalyst Expression:
    * Column-DSL function calls become catalyst UnresolvedFunction
    * nodes the analyzer then resolves (lambdas included). Unlike
    * [[expression]], which only unwraps Columns that directly wrap an
    * Expression and otherwise leaves an opaque ColumnNodeExpression
    * the executor cannot codegen — the SQL-surface sketch functions
    * hit exactly that. */
  def toExpression(c: Column): Expression =
    org.apache.spark.sql.classic.ColumnNodeToExpressionConverter(c.node)

  /** DataFrame from a logical plan (custom operators' entry point). */
  def ofRows(spark: org.apache.spark.sql.SparkSession,
             plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)
      : org.apache.spark.sql.DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)

  /** Prefix comparator + computer for an external row sort, derived from
    * the leading sort column (the same machinery SortExec uses via
    * `private[sql]` SortPrefixUtils). A real prefix lets the sorter
    * resolve most comparisons on the cached 8-byte prefix instead of a
    * full row ordering call. Called executor-side, once per partition.
    */
  def rowPrefix(order: org.apache.spark.sql.catalyst.expressions.SortOrder,
                output: Seq[org.apache.spark.sql.catalyst.expressions.Attribute])
      : (org.apache.spark.util.collection.unsafe.sort.PrefixComparator,
         org.apache.spark.sql.execution.UnsafeExternalRowSorter.PrefixComputer) = {
    import org.apache.spark.sql.catalyst.InternalRow
    import org.apache.spark.sql.catalyst.expressions.{BindReferences, SortPrefix, UnsafeProjection}
    import org.apache.spark.sql.execution.{SortPrefixUtils, UnsafeExternalRowSorter}
    val bound = BindReferences.bindReference(order, output)
    val cmp = SortPrefixUtils.getPrefixComparator(bound)
    val proj = UnsafeProjection.create(Seq(SortPrefix(bound)))
    val computer = new UnsafeExternalRowSorter.PrefixComputer {
      private val result = new UnsafeExternalRowSorter.PrefixComputer.Prefix
      override def computePrefix(row: InternalRow)
          : UnsafeExternalRowSorter.PrefixComputer.Prefix = {
        val p = proj.apply(row)
        result.isNull = p.isNullAt(0)
        result.value = if (result.isNull) 0L else p.getLong(0)
        result
      }
    }
    (cmp, computer)
  }

  /** Drain the SparkListener event bus (private[spark]): lets tests
    * assert deterministically on listener-observed facts — e.g. "plan
    * construction launched zero jobs" — without sleeping. */
  def flushListenerBus(sc: org.apache.spark.SparkContext): Unit =
    sc.listenerBus.waitUntilEmpty()

  /** Free every storage footprint a materialized Dataset holds:
    * the CacheManager entry (if it was cache()/persist()ed) and the
    * block-manager blocks behind its (local)checkpoint leaves.
    * Dataset.unpersist only reaches the former; a localCheckpoint's
    * blocks live on a LogicalRDD whose RDD is reachable only through
    * `private[sql]` execution internals — hence this bridge. After the
    * call the Dataset must not be re-executed: a local checkpoint's
    * lineage is truncated, so its data is unrecoverable by design. */
  def releaseMaterialized(df: org.apache.spark.sql.Dataset[_]): Unit = {
    df.unpersist(blocking = false)
    df.queryExecution.analyzed.foreach {
      case lr: org.apache.spark.sql.execution.LogicalRDD =>
        val rdd = lr.rdd
        // NOT rdd.unpersist(): for a locally checkpointed RDD that
        // method WARNs (rightly, for general callers) that the data is
        // unrecoverable afterwards — but scope-exit release runs by
        // contract AFTER the terminal action, so on this path the
        // warning is pure noise, flooding every Verify/Bench log. The
        // context-level release frees the same blocks and clears the
        // persistentRdds bookkeeping without the per-RDD warning.
        rdd.sparkContext.unpersistRDD(rdd.id, blocking = false)
      case _ => ()
    }
  }

  /** The reliable-checkpoint file behind a checkpointed Dataset (None
    * for local checkpoints and uncheckpointed plans) — the handle the
    * BSP loops' reliable mode needs to delete a superseded iteration's
    * snapshot (the PeriodicCheckpointer discipline). Reachable only
    * through the same `private[sql]` LogicalRDD leaf as
    * [[releaseMaterialized]]. */
  def checkpointFileOf(df: org.apache.spark.sql.Dataset[_]): Option[String] = {
    var found: Option[String] = None
    df.queryExecution.analyzed.foreach {
      case lr: org.apache.spark.sql.execution.LogicalRDD if found.isEmpty =>
        found = lr.rdd.getCheckpointFile
      case _ => ()
    }
    found
  }

  /** Whether the session's CacheManager holds any cached plan — the
    * lifecycle assertion tests need (CacheManager is private[sql] and
    * exposes no public count). */
  def cacheIsEmpty(spark: org.apache.spark.sql.SparkSession): Boolean =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sharedState.cacheManager.isEmpty
}
