package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, Expression, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.codegen.GenerateOrdering
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode, UnsafeExternalRowSorter}
import org.apache.spark.sql.types.{StructField, StructType}
import org.apache.spark.sql.SparkSession

/** Custom whole-operator: top-k rows per key.
  *
  * The built-in formulation — `row_number().over(partitionBy(key)
  * .orderBy(o))` then `filter(rank <= k)` — fully SORTS every key group
  * (O(n log n) per partition, full spill surface) only to discard all
  * but k rows. This operator keeps a bounded k-heap per key:
  * O(n log k) time, O(keys x k) memory, no sort spill, same single hash
  * shuffle (`requiredChildDistribution` lets EnsureRequirements insert
  * the exchange exactly as it would for the window).
  *
  * Memory safety at unbounded key cardinality (exact dedup keys ~ rows;
  * CDC latest-per-key keys = PKs): the heap map's retained bytes are
  * tracked against `spillThresholdBytes` (session conf
  * `spark.graft.topk.maxHeapBytes`, default 64 MB per task). Past the
  * threshold the partition FALLS BACK to sort-based grouped
  * processing: retained rows and the rest of the stream go into
  * Spark's UnsafeExternalRowSorter — which spills to disk under
  * executor memory pressure exactly like SortExec — sorted by
  * (key, rank); a streaming grouped scan then emits the first k rows
  * per key. Bounded-key workloads never leave the O(keys x k) heap
  * fast path; worst-case degrades to the window plan's own sort, not
  * an OOM.
  *
  * Preference-ladder justification (SURVEY.md / build brief): this
  * semantics-preserving physical rewrite is NOT expressible by
  * composing DataFrame ops — it needs a physical operator. Logical
  * node + Strategy, injected per session (idempotent) via
  * `spark.experimental.extraStrategies`; also registered by
  * GraftExtensions.
  *
  * Row order within a key group is the `order` descending-rank order
  * (rows emit heap-sorted), matching the window formulation minus the
  * rank column.
  */
final case class TopKPerKeyPlan(keys: Seq[Expression], order: Seq[SortOrder],
                                k: Int, spillThresholdBytes: Long,
                                child: LogicalPlan) extends UnaryNode {
  require(k > 0, s"top-k requires k > 0, got $k")
  require(keys.nonEmpty && order.nonEmpty, "keys and order must be non-empty")
  require(spillThresholdBytes > 0, "spill threshold must be positive")
  override def output: Seq[Attribute] = child.output
  override def maxRows: Option[Long] = child.maxRows
  override protected def withNewChildInternal(newChild: LogicalPlan): TopKPerKeyPlan =
    copy(child = newChild)
}

/** Physical top-k-per-key. Runs in TWO PHASES, like an aggregate:
  * a `partial` instance (no distribution requirement) first reduces
  * each input partition to at most k rows per key seen there — the
  * map-side combine — and the final instance (ClusteredDistribution →
  * EnsureRequirements inserts the hash exchange above the partial)
  * merges the per-partition winners. Top-k selection under a total
  * order is a semigroup, so the split is lossless. On dup-heavy input
  * (CDC deltas, exact dedup of a crawl) the exchange now carries
  * ~keys-per-partition x k rows instead of ALL rows — the r2 scale
  * concern — while keys~rows input costs only one extra O(n) hash pass.
  */
final case class TopKPerKeyExec(keys: Seq[Expression], order: Seq[SortOrder],
                                k: Int, spillThresholdBytes: Long,
                                partial: Boolean,
                                child: SparkPlan) extends UnaryExecNode {
  override def output: Seq[Attribute] = child.output

  override def nodeName: String =
    if (partial) "TopKPerKeyPartial" else "TopKPerKey"

  override def requiredChildDistribution: Seq[Distribution] =
    if (partial) super.requiredChildDistribution
    else ClusteredDistribution(keys) :: Nil

  // rows stay in their key partitions: declare it, or every downstream
  // keyed operator re-shuffles the already-clustered (tiny) output
  override def outputPartitioning: org.apache.spark.sql.catalyst.plans.physical.Partitioning =
    child.outputPartitioning

  override protected def doExecute(): RDD[InternalRow] = {
    val keyExprs = keys
    val ordExprs = order
    val childOutput = child.output
    val kk = k
    val threshold = spillThresholdBytes
    child.execute().mapPartitions({ iter =>
      val keyProj = UnsafeProjection.create(keyExprs, childOutput)
      // ordering in RANK direction (best first); heap keeps the k best,
      // with the WORST retained row at its head for O(1) replacement
      val rankOrd = GenerateOrdering.generate(ordExprs, childOutput)
      val heapOrd = new java.util.Comparator[UnsafeRow] {
        def compare(a: UnsafeRow, b: UnsafeRow): Int = rankOrd.compare(b, a)
      }
      val heaps = new java.util.HashMap[UnsafeRow, java.util.PriorityQueue[UnsafeRow]]()
      // per-entry bookkeeping overhead (HashMap node + heap + refs); the
      // exact constant matters less than that growth is LINEAR in keys
      val perKeyOverhead = 64L
      var retained = 0L
      var overflowed = false
      while (iter.hasNext && !overflowed) {
        val row = iter.next().asInstanceOf[UnsafeRow]
        val key = keyProj(row)
        var heap = heaps.get(key)
        if (heap == null) {
          heap = new java.util.PriorityQueue[UnsafeRow](kk, heapOrd)
          val keyCopy = key.copy()
          heaps.put(keyCopy, heap)
          retained += keyCopy.getSizeInBytes + perKeyOverhead
        }
        if (heap.size() < kk) {
          val c = row.copy()
          heap.add(c)
          retained += c.getSizeInBytes
        } else if (rankOrd.compare(row, heap.peek()) < 0) {
          retained -= heap.poll().getSizeInBytes
          val c = row.copy()
          heap.add(c)
          retained += c.getSizeInBytes
        }
        overflowed = retained > threshold
      }

      if (!overflowed) {
        val out = scala.collection.mutable.ArrayBuffer.empty[UnsafeRow]
        val it = heaps.values().iterator()
        while (it.hasNext) {
          val heap = it.next()
          val group = new Array[UnsafeRow](heap.size())
          var i = group.length - 1
          while (i >= 0) { group(i) = heap.poll(); i -= 1 } // heap pops worst-first
          out ++= group
        }
        out.iterator
      } else {
        // sort-based fallback: (key asc, rank) external sort (disk spill
        // under memory pressure), then a streaming first-k-per-group scan
        val schema = StructType(childOutput.map(a =>
          StructField(a.name, a.dataType, a.nullable)))
        val keyOrders = keyExprs.map(SortOrder(_, Ascending))
        val fullOrd = GenerateOrdering.generate(keyOrders ++ ordExprs, childOutput)
        // real 8-byte prefix on the leading key column: the sorter settles
        // most comparisons on the cached prefix instead of a full-row
        // ordering call (radix stays off — the order has >1 column)
        val (prefixCmp, prefixComputer) =
          org.apache.spark.sql.graftbridge.Bridge.rowPrefix(keyOrders.head, childOutput)
        val sorter = UnsafeExternalRowSorter.create(
          schema, fullOrd, prefixCmp, prefixComputer,
          4L * 1024 * 1024, false)
        val hIt = heaps.values().iterator()
        while (hIt.hasNext) {
          val heap = hIt.next()
          while (!heap.isEmpty) sorter.insertRow(heap.poll())
        }
        heaps.clear()
        val sorted = sorter.sort(iter.map(_.asInstanceOf[UnsafeRow]))
        new Iterator[InternalRow] {
          private var curKey: UnsafeRow = null
          private var emitted = 0
          private var nextRow: InternalRow = null
          private def advance(): Unit = {
            nextRow = null
            while (nextRow == null && sorted.hasNext) {
              val row = sorted.next()
              val key = keyProj(row)
              if (curKey == null || !key.equals(curKey)) {
                curKey = key.copy()
                emitted = 0
              }
              // the sorter's iterator REUSES one UnsafeRow (repointed on
              // every next()); next() below prefetches before the consumer
              // reads the returned row, so emit a copy or the row mutates
              // under the consumer (r2 corruption bug)
              if (emitted < kk) { emitted += 1; nextRow = row.copy() }
            }
          }
          advance()
          override def hasNext: Boolean = nextRow != null
          override def next(): InternalRow = {
            val r = nextRow; advance(); r
          }
        }
      }
    }, preservesPartitioning = true)
  }

  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerKeyExec =
    copy(child = newChild)
}

object TopKStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerKeyPlan(keys, order, k, spill, child) =>
      TopKPerKeyExec(keys, order, k, spill, partial = false,
        TopKPerKeyExec(keys, order, k, spill, partial = true,
          planLater(child))) :: Nil
    case _ => Nil
  }
}

object TopK {
  val SpillThresholdConf = "spark.graft.topk.maxHeapBytes"
  val DefaultSpillThreshold: Long = 64L * 1024 * 1024

  /** Ensure the strategy + the window-idiom rewrite are active on this
    * session (idempotent). */
  def register(spark: SparkSession): Unit = {
    if (!spark.experimental.extraStrategies.contains(TopKStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ TopKStrategy
    if (!spark.experimental.extraOptimizations.contains(TopKRewrite))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ TopKRewrite
  }

  /** Top `k` rows per `keyCols`, ranked by `orderCols` (descending by
    * default). Drop-in replacement for the window row_number pattern. */
  def perKey(df: org.apache.spark.sql.DataFrame, keyCols: Seq[String],
             orderCols: Seq[(String, Boolean)], k: Int)
      : org.apache.spark.sql.DataFrame = {
    val spark = df.sparkSession
    register(spark)
    val spillThreshold = spark.conf.getOption(SpillThresholdConf)
      .map(_.toLong).getOrElse(DefaultSpillThreshold)
    val analyzed = df.queryExecution.analyzed
    def attr(name: String): Attribute = analyzed.output.find(_.name == name)
      .getOrElse(throw new IllegalArgumentException(
        s"column $name not in ${analyzed.output.map(_.name)}"))
    val order = orderCols.map { case (c, asc) =>
      SortOrder(attr(c), if (asc) org.apache.spark.sql.catalyst.expressions.Ascending
                         else org.apache.spark.sql.catalyst.expressions.Descending)
    }
    org.apache.spark.sql.graftbridge.Bridge.ofRows(spark,
      TopKPerKeyPlan(keyCols.map(attr), order, k, spillThreshold, analyzed))
  }
}
