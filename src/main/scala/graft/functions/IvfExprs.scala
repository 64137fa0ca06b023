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

  /** indices of the `nprobe` most-similar centroids, descending. */
  def nearestN(v: ArrayData, centroids: Array[Array[Float]], nprobe: Int): ArrayData = {
    val sims = new Array[Double](centroids.length)
    var c = 0
    while (c < centroids.length) { sims(c) = cosineTo(v, centroids(c)); c += 1 }
    val order = sims.zipWithIndex.sortBy(-_._1).take(nprobe).map(_._2)
    new GenericArrayData(order)
  }

  private def cosineTo(v: ArrayData, c: Array[Float]): Double = {
    val n = math.min(v.numElements(), c.length)
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

case class NearestCentroidExpr(child: Expression, centroids: Array[Array[Float]])
    extends UnaryExpression with CodegenFallback
    with org.apache.spark.sql.graftbridge.DeclaredInputTypes {
  override def declaredInputTypes: Seq[DataType] = Seq(ArrayType(FloatType))
  override def dataType: DataType = IntegerType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "nearest_centroid"
  override def nullSafeEval(input: Any): Any =
    IvfKernels.nearest(input.asInstanceOf[ArrayData], centroids)
  // centroids are instance state => no static-call codegen; runs as a
  // non-codegen leaf inside the surrounding stage (assignment is one
  // pass per table, dominated by the k*dim flops either way)
  override protected def withNewChildInternal(newChild: Expression): NearestCentroidExpr =
    copy(child = newChild)
}

case class NearestCentroidsExpr(child: Expression, centroids: Array[Array[Float]],
                                nprobe: Int) extends UnaryExpression with CodegenFallback
    with org.apache.spark.sql.graftbridge.DeclaredInputTypes {
  override def declaredInputTypes: Seq[DataType] = Seq(ArrayType(FloatType))
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "nearest_centroids"
  override def nullSafeEval(input: Any): Any =
    IvfKernels.nearestN(input.asInstanceOf[ArrayData], centroids, nprobe)
  override protected def withNewChildInternal(newChild: Expression): NearestCentroidsExpr =
    copy(child = newChild)
}
