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
