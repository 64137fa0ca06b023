package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Product-quantization kernels for compressed-domain ANN. A vector is
  * split into `m` contiguous subspaces; each subspace is vector-
  * quantized against its own `k`-centroid codebook, so a d-dim float
  * vector (4d bytes) compresses to m small codes — the representation
  * that makes a 100 TB embedding corpus scannable in memory. Distances
  * decompose ADDITIVELY over subspaces under L2 (NOT cosine — which is
  * why these kernels are L2 while the IVF coarse quantizer is cosine):
  * ||q - x||^2 ~ sum_s ||q_s - c(s, code_s)||^2, so a query precomputes
  * one m*k lookup table and each corpus row costs m table adds.
  *
  * The codebook (m x k x subDim floats, e.g. 4x8x16 = 2 KB) is embedded
  * in the expressions and ships with the serialized plan — no join, no
  * broadcast plumbing (same design as [[CentroidTable]]).
  */
object PqKernels {

  /** index of the L2-nearest codeword (ties: lowest index). `off` is
    * the subspace's start offset into the full vector. */
  def nearestL2(v: ArrayData, codebook: Array[Array[Float]], off: Int): Int = {
    var best = 0
    var bestD = Double.MaxValue
    var c = 0
    while (c < codebook.length) {
      val cw = codebook(c)
      var d = 0.0
      var i = 0
      while (i < cw.length) {
        val x = v.getFloat(off + i).toDouble - cw(i)
        d += x * x
        i += 1
      }
      if (d < bestD) { bestD = d; best = c }
      c += 1
    }
    best
  }
}

/** Value wrapper for the plan-embedded PQ codebook (deep equality for
  * semanticEquals, compact explain rendering — see [[CentroidTable]]).
  * `table(sub)(code)` is the codeword for `code` in subspace `sub`;
  * all subspaces share `k` and `subDim`. */
final class PqTable(val table: Array[Array[Array[Float]]]) extends Serializable {
  require(table.nonEmpty && table.forall(_.length == table(0).length) &&
    table.forall(_.forall(_.length == table(0)(0).length)),
    "codebook must be rectangular: m x k x subDim")
  def m: Int = table.length
  def k: Int = table(0).length
  def subDim: Int = table(0)(0).length
  def dim: Int = m * subDim
  override def equals(o: Any): Boolean = o match {
    case t: PqTable => m == t.m && k == t.k &&
      table.indices.forall(s => table(s).indices.forall(c =>
        java.util.Arrays.equals(table(s)(c), t.table(s)(c))))
    case _ => false
  }
  override def hashCode: Int = {
    var h = 17
    var s = 0
    while (s < table.length) {
      var c = 0
      while (c < table(s).length) {
        h = h * 31 + java.util.Arrays.hashCode(table(s)(c)); c += 1
      }
      s += 1
    }
    h
  }
  override def toString: String = s"PqTable(${m}x${k}x$subDim)"
}

/** vector -> array<int> of m PQ codes (the compressed representation).
  * Null-intolerant; rejects dimension mismatches loudly (a silently
  * mis-sliced encode would corrupt every downstream distance). */
case class PqEncodeExpr(child: Expression, codebook: PqTable)
    extends UnaryExpression with CodegenFallback
    with org.apache.spark.sql.graftbridge.DeclaredInputTypes {
  override def declaredInputTypes: Seq[DataType] = Seq(ArrayType(FloatType))
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "pq_encode"
  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    if (v.numElements() != codebook.dim)
      throw new IllegalArgumentException(
        s"pq_encode: vector dim ${v.numElements()} != codebook dim ${codebook.dim}")
    val out = new Array[Int](codebook.m)
    var s = 0
    while (s < codebook.m) {
      out(s) = PqKernels.nearestL2(v, codebook.table(s), s * codebook.subDim)
      s += 1
    }
    new GenericArrayData(out)
  }
  override protected def withNewChildInternal(newChild: Expression): PqEncodeExpr =
    copy(child = newChild)
}

/** query vector -> flattened m*k asymmetric-distance lookup table:
  * entry s*k + c is ||q_s - codeword(s, c)||^2. Computed once per
  * query row; every corpus row then scores with m adds. */
case class PqLutExpr(child: Expression, codebook: PqTable)
    extends UnaryExpression with CodegenFallback
    with org.apache.spark.sql.graftbridge.DeclaredInputTypes {
  override def declaredInputTypes: Seq[DataType] = Seq(ArrayType(FloatType))
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "pq_lut"
  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    if (v.numElements() != codebook.dim)
      throw new IllegalArgumentException(
        s"pq_lut: vector dim ${v.numElements()} != codebook dim ${codebook.dim}")
    val out = new Array[Double](codebook.m * codebook.k)
    var s = 0
    while (s < codebook.m) {
      val off = s * codebook.subDim
      var c = 0
      while (c < codebook.k) {
        val cw = codebook.table(s)(c)
        var d = 0.0
        var i = 0
        while (i < cw.length) {
          val x = v.getFloat(off + i).toDouble - cw(i)
          d += x * x
          i += 1
        }
        out(s * codebook.k + c) = d
        c += 1
      }
      s += 1
    }
    new GenericArrayData(out)
  }
  override protected def withNewChildInternal(newChild: Expression): PqLutExpr =
    copy(child = newChild)
}
