package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Codegen'd kernels for vector math over `array<float>` embeddings.
  *
  * Why not higher-order functions: `aggregate(zip_with(...))` lambdas
  * are interpreted per ELEMENT (non-codegen expression evaluation +
  * intermediate array allocation per row). On a 125k-pair cosine
  * self-join that measured 42s at sf0.1; this fused loop brings it under
  * a second. At 100 TB the difference is the job.
  *
  * Accumulation contract: elements are widened float->double and
  * accumulated left-to-right in doubles — bit-identical to DuckDB's
  * `list_cosine_similarity(CAST(x AS DOUBLE[]), ...)`, which the oracle
  * relies on.
  */
object VectorKernels {

  def cosine(a: ArrayData, b: ArrayData): Double = {
    val n = a.numElements()
    if (n != b.numElements())
      throw new IllegalArgumentException(
        s"cosine: dimension mismatch ${a.numElements()} vs ${b.numElements()}")
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val x = a.getFloat(i).toDouble
      val y = b.getFloat(i).toDouble
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    // zero-norm guard: the raw division yields NaN, and Spark orders
    // NaN ABOVE every real double — a zero vector would become every
    // query's rank-1 neighbor in a descending top-k. -2.0 sorts below
    // any true cosine (same sentinel as IvfKernels.cosineTo). Divergence
    // from DuckDB's list_cosine_similarity (NaN) is unreachable in the
    // oracle corpora, which contain no zero vectors.
    if (na == 0.0 || nb == 0.0) -2.0
    else dot / (math.sqrt(na) * math.sqrt(nb))
  }

  def dot(a: ArrayData, b: ArrayData): Double = {
    val n = a.numElements()
    if (n != b.numElements())
      throw new IllegalArgumentException(
        s"dot: dimension mismatch ${a.numElements()} vs ${b.numElements()}")
    var s = 0.0
    var i = 0
    while (i < n) { s += a.getFloat(i).toDouble * b.getFloat(i).toDouble; i += 1 }
    s
  }

  def norm(a: ArrayData): Double = {
    var s = 0.0
    var i = 0
    val n = a.numElements()
    while (i < n) { val x = a.getFloat(i).toDouble; s += x * x; i += 1 }
    math.sqrt(s)
  }

  def l2Distance(a: ArrayData, b: ArrayData): Double = {
    val n = a.numElements()
    if (n != b.numElements())
      throw new IllegalArgumentException(
        s"l2Distance: dimension mismatch ${a.numElements()} vs ${b.numElements()}")
    var s = 0.0
    var i = 0
    while (i < n) {
      val d = a.getFloat(i).toDouble - b.getFloat(i).toDouble
      s += d * d; i += 1
    }
    math.sqrt(s)
  }

  /** Rademacher hyperplane sign bits packed into a long; component
    * (bit, dim) = sign of a seeded hash — deterministic on every
    * executor with zero broadcast state. The sign table depends only on
    * (seed, nBits, dim), so it is computed once per executor and cached:
    * the per-row work is pure add/subtract accumulation instead of
    * nBits x dim mix64 calls per vector (the 100 TB ANN hot path). */
  private val signCache =
    new java.util.concurrent.ConcurrentHashMap[(Long, Int, Int), Array[Boolean]]()
  // single-entry fast path: (seed, nBits, dim) are constant within a
  // scan, so the per-row cost is three primitive compares — no tuple
  // allocation, no map probe. ONE volatile holding an immutable
  // (key, signs) pair: two separate volatiles could tear under
  // concurrent tasks with different configs — one config's key paired
  // with another's sign table silently corrupts every bucket (r4
  // review finding)
  private final class CachedSigns(val seed: Long, val nBits: Int,
                                  val dim: Int, val signs: Array[Boolean])
  @volatile private var last: CachedSigns = _

  private def signs(seed: Long, nBits: Int, dim: Int): Array[Boolean] = {
    val lk = last
    if (lk != null && lk.seed == seed && lk.nBits == nBits && lk.dim == dim)
      return lk.signs
    // ragged vector lengths / many configs could otherwise grow the
    // cache for the JVM's lifetime; the bound is far above any sane
    // number of simultaneous (seed, nBits, dim) configurations
    if (signCache.size() > 256) signCache.clear()
    val arr = signCache.computeIfAbsent((seed, nBits, dim), { key =>
      val (s, bits, n) = key
      val a = new Array[Boolean](bits * n)
      var b = 0
      while (b < bits) {
        var i = 0
        while (i < n) {
          val h = graft.fakegen.FakeGen.mix64(s ^ (b.toLong << 32) ^ i.toLong)
          a(b * n + i) = (h & 1L) == 0L
          i += 1
        }
        b += 1
      }
      a
    })
    last = new CachedSigns(seed, nBits, dim, arr)
    arr
  }

  def hyperplaneBucket(a: ArrayData, nBits: Int, seed: Long): Long = {
    val n = a.numElements()
    val sg = signs(seed, nBits, n)
    var bucket = 0L
    var b = 0
    while (b < nBits) {
      var proj = 0.0
      var i = 0
      val base = b * n
      while (i < n) {
        val x = a.getFloat(i).toDouble
        proj += (if (sg(base + i)) x else -x)
        i += 1
      }
      if (proj >= 0) bucket |= (1L << b)
      b += 1
    }
    bucket
  }
}

abstract class VectorBinaryExpr extends BinaryExpression
    with org.apache.spark.sql.graftbridge.DeclaredInputTypes {
  override def declaredInputTypes: Seq[DataType] =
    Seq(ArrayType(FloatType), ArrayType(FloatType))
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  protected def kernel: String
  override def nullSafeEval(a: Any, b: Any): Any = evalKernel(
    a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  protected def evalKernel(a: ArrayData, b: ArrayData): Double
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.VectorKernels.$kernel($a, $b)")
}

case class CosineSimExpr(left: Expression, right: Expression) extends VectorBinaryExpr {
  override def prettyName: String = "cosine_sim"
  protected def kernel = "cosine"
  protected def evalKernel(a: ArrayData, b: ArrayData): Double = VectorKernels.cosine(a, b)
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}

case class DotExpr(left: Expression, right: Expression) extends VectorBinaryExpr {
  override def prettyName: String = "vec_dot"
  protected def kernel = "dot"
  protected def evalKernel(a: ArrayData, b: ArrayData): Double = VectorKernels.dot(a, b)
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}

case class L2DistanceExpr(left: Expression, right: Expression) extends VectorBinaryExpr {
  override def prettyName: String = "l2_distance"
  protected def kernel = "l2Distance"
  protected def evalKernel(a: ArrayData, b: ArrayData): Double = VectorKernels.l2Distance(a, b)
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}

case class NormExpr(child: Expression) extends UnaryExpression
    with org.apache.spark.sql.graftbridge.DeclaredInputTypes {
  override def declaredInputTypes: Seq[DataType] = Seq(ArrayType(FloatType))
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "vec_norm"
  override def nullSafeEval(a: Any): Any = VectorKernels.norm(a.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.functions.VectorKernels.norm($a)")
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

case class HyperplaneBucketExpr(child: Expression, nBits: Int, seed: Long)
    extends UnaryExpression
    with org.apache.spark.sql.graftbridge.DeclaredInputTypes {
  // 1..63: 0 makes every row bucket 0 (a bucket join degenerates to a
  // cross join), >63 wraps the shift so planes alias. Guard HERE so
  // the unchecked SQL surface (hyperplane_bucket literal args) fails
  // at plan build, not with silent wrong buckets
  require(nBits >= 1 && nBits <= 63,
    s"hyperplane nBits must be in [1, 63], got $nBits")
  override def declaredInputTypes: Seq[DataType] = Seq(ArrayType(FloatType))
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "hyperplane_bucket"
  override def nullSafeEval(a: Any): Any =
    VectorKernels.hyperplaneBucket(a.asInstanceOf[ArrayData], nBits, seed)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a =>
      s"graft.functions.VectorKernels.hyperplaneBucket($a, $nBits, ${seed}L)")
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}
