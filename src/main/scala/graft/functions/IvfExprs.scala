package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Centroid-assignment kernels for IVF-style ANN. The coarse-quantizer
  * centroid table (nlist x dim floats, e.g. 256 x 64 = 64 KB) is
  * embedded in the expression and ships with the serialized plan to
  * every executor — no join, no broadcast variable plumbing.
  */
object IvfKernels {
  /** index of the centroid with max cosine similarity (ties: lowest id). */
  def nearest(v: ArrayData, centroids: Array[Array[Float]]): Int = {
    var best = 0
    var bestSim = Double.MinValue
    var c = 0
    while (c < centroids.length) {
      val sim = cosineTo(v, centroids(c))
      if (sim > bestSim) { bestSim = sim; best = c }
      c += 1
    }
    best
  }

  /** indices of the `nprobe` most-similar centroids, descending.
    * Allocation-free selection scan (O(nlist x nprobe), primitive
    * arrays, ties to the lowest index like the stable sort it
    * replaces): this runs once per CORPUS row in semantic dedup, so a
    * boxed sort of all nlist sims per row was pure GC pressure on the
    * hot path. */
  def nearestN(v: ArrayData, centroids: Array[Array[Float]], nprobe: Int): ArrayData = {
    val m = centroids.length
    val sims = new Array[Double](m)
    var c = 0
    while (c < m) { sims(c) = cosineTo(v, centroids(c)); c += 1 }
    val k = math.min(nprobe, m)
    val out = new Array[Int](k)
    val used = new Array[Boolean](m)
    var j = 0
    while (j < k) {
      var best = -1
      var bestSim = Double.NegativeInfinity
      var i = 0
      while (i < m) {
        if (!used(i) && sims(i) > bestSim) { bestSim = sims(i); best = i }
        i += 1
      }
      used(best) = true
      out(j) = best
      j += 1
    }
    new GenericArrayData(out)
  }

  private def cosineTo(v: ArrayData, c: Array[Float]): Double = {
    val n = v.numElements()
    if (n != c.length)
      throw new IllegalArgumentException(
        s"centroid dimension mismatch: vector $n vs centroid ${c.length}")
    var dot = 0.0; var nv = 0.0; var nc = 0.0
    var i = 0
    while (i < n) {
      val x = v.getFloat(i).toDouble
      val y = c(i).toDouble
      dot += x * y; nv += x * x; nc += y * y
      i += 1
    }
    if (nv == 0 || nc == 0) -2.0 else dot / (math.sqrt(nv) * math.sqrt(nc))
  }
}

/** Value wrapper for the plan-embedded centroid table: case-class
  * Array fields compare by REFERENCE, which defeats semanticEquals /
  * subexpression reuse for identical quantizers and prints as
  * `[[F@1a2b3c` in explain output. This gives deep equality and a
  * compact rendering. */
final class CentroidTable(val table: Array[Array[Float]]) extends Serializable {
  override def equals(o: Any): Boolean = o match {
    case t: CentroidTable => table.length == t.table.length &&
      table.indices.forall(i => java.util.Arrays.equals(table(i), t.table(i)))
    case _ => false
  }
  override def hashCode: Int = {
    var h = 17
    var i = 0
    while (i < table.length) { h = h * 31 + java.util.Arrays.hashCode(table(i)); i += 1 }
    h
  }
  override def toString: String =
    s"CentroidTable(${table.length}x${if (table.isEmpty) 0 else table(0).length})"
}

case class NearestCentroidExpr(child: Expression, centroids: CentroidTable)
    extends UnaryExpression with CodegenFallback
    with org.apache.spark.sql.graftbridge.DeclaredInputTypes {
  override def declaredInputTypes: Seq[DataType] = Seq(ArrayType(FloatType))
  override def dataType: DataType = IntegerType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "nearest_centroid"
  override def nullSafeEval(input: Any): Any =
    IvfKernels.nearest(input.asInstanceOf[ArrayData], centroids.table)
  // centroids are instance state => no static-call codegen; runs as a
  // non-codegen leaf inside the surrounding stage (assignment is one
  // pass per table, dominated by the k*dim flops either way)
  override protected def withNewChildInternal(newChild: Expression): NearestCentroidExpr =
    copy(child = newChild)
}

case class NearestCentroidsExpr(child: Expression, centroids: CentroidTable,
                                nprobe: Int) extends UnaryExpression with CodegenFallback
    with org.apache.spark.sql.graftbridge.DeclaredInputTypes {
  override def declaredInputTypes: Seq[DataType] = Seq(ArrayType(FloatType))
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "nearest_centroids"
  override def nullSafeEval(input: Any): Any =
    IvfKernels.nearestN(input.asInstanceOf[ArrayData], centroids.table, nprobe)
  override protected def withNewChildInternal(newChild: Expression): NearestCentroidsExpr =
    copy(child = newChild)
}

/** Runtime-table centroid kernels for the SQL surface: the table
  * arrives as a COLUMN value (array<array<float>> — typically a scalar
  * subquery over a centroids view, e.g. a persisted index's
  * `centroids.parquet`), not a plan-embedded [[CentroidTable]]. Same
  * assignment semantics as [[IvfKernels]] (max cosine, ties to the
  * lowest index), so the SQL and programmatic ANN tiers agree row for
  * row. The ArrayData -> Array[Array[Float]] conversion is memoized per
  * backing instance: a substituted scalar subquery is one shared value
  * per task, so conversion runs once per task, not once per row. */
object IvfSqlKernels {
  private val memo =
    new ThreadLocal[java.util.IdentityHashMap[ArrayData, Array[Array[Float]]]] {
      override def initialValue() =
        new java.util.IdentityHashMap[ArrayData, Array[Array[Float]]]()
    }

  private def toTable(cents: ArrayData): Array[Array[Float]] = {
    val m = memo.get()
    val hit = m.get(cents)
    if (hit != null) return hit
    // distinct literal tables per thread are bounded by distinct ANN
    // configs in the plan — clear defensively rather than grow forever
    if (m.size() > 64) m.clear()
    val n = cents.numElements()
    val t = new Array[Array[Float]](n)
    var i = 0
    while (i < n) { t(i) = cents.getArray(i).toFloatArray(); i += 1 }
    m.put(cents, t)
    t
  }

  def nearest(v: ArrayData, cents: ArrayData): Int =
    IvfKernels.nearest(v, toTable(cents))

  def nearestN(v: ArrayData, cents: ArrayData, nprobe: Int): ArrayData =
    IvfKernels.nearestN(v, toTable(cents), nprobe)
}

/** SQL `nearest_centroid(vec, centroids)` — cluster id under a
  * runtime centroid table. */
case class NearestCentroidSqlExpr(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression
    with org.apache.spark.sql.graftbridge.DeclaredInputTypes {
  override def declaredInputTypes: Seq[DataType] =
    Seq(ArrayType(FloatType), ArrayType(ArrayType(FloatType)))
  override def dataType: DataType = IntegerType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "nearest_centroid"
  override def nullSafeEval(v: Any, c: Any): Any =
    IvfSqlKernels.nearest(v.asInstanceOf[ArrayData], c.asInstanceOf[ArrayData])
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    defineCodeGen(ctx, ev, (v, c) =>
      s"graft.functions.IvfSqlKernels.nearest($v, $c)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}

/** SQL `nearest_centroids(vec, centroids, nprobe)` — the nprobe most
  * similar cluster ids, descending (the query-side probe set). */
case class NearestCentroidsSqlExpr(left: Expression, right: Expression,
                                   nprobe: Int)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression
    with org.apache.spark.sql.graftbridge.DeclaredInputTypes {
  override def declaredInputTypes: Seq[DataType] =
    Seq(ArrayType(FloatType), ArrayType(ArrayType(FloatType)))
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "nearest_centroids"
  override def nullSafeEval(v: Any, c: Any): Any =
    IvfSqlKernels.nearestN(v.asInstanceOf[ArrayData], c.asInstanceOf[ArrayData],
      nprobe)
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    defineCodeGen(ctx, ev, (v, c) =>
      s"graft.functions.IvfSqlKernels.nearestN($v, $c, $nprobe)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}
