package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._

/** Z-order (Morton) interleaving — the storage-layout key for
  * multi-dimensional scan locality. Sorting a 100 TB table by
  * `zorder2(a, b)` before writing clusters rows so a box predicate on
  * (a, b) touches O(perimeter) files instead of O(rows): min/max file
  * statistics on BOTH columns stay narrow, so format-level pruning
  * (parquet row groups, file skipping) works on either dimension —
  * the property a single-column sort gives only its leading column.
  *
  * Domain: non-negative inputs below 2^31 (ids, bucketed values,
  * dictionary codes — pmod anything wider into range first). Values
  * outside the domain raise rather than silently interleave a sign
  * bit into the middle of the curve.
  */
object ZOrderKernels {
  /** spread the low 31 bits of v to even bit positions (0,2,4,...). */
  private def spread(v: Long): Long = {
    var x = v & 0x7fffffffL
    x = (x | (x << 16)) & 0x0000ffff0000ffffL
    x = (x | (x << 8)) & 0x00ff00ff00ff00ffL
    x = (x | (x << 4)) & 0x0f0f0f0f0f0f0f0fL
    x = (x | (x << 2)) & 0x3333333333333333L
    x = (x | (x << 1)) & 0x5555555555555555L
    x
  }

  /** 62-bit Morton code: bit i of x at position 2i, of y at 2i+1. */
  def morton(x: Long, y: Long): Long = {
    if (x < 0 || y < 0 || x > 0x7fffffffL || y > 0x7fffffffL)
      throw new IllegalArgumentException(
        s"zorder2 domain is [0, 2^31): got ($x, $y)")
    spread(x) | (spread(y) << 1)
  }

  /** N-dimensional Morton code: bit i of dims(d) lands at position
    * i·n + d, interleaving the low `bits` bits of every dim — the
    * general curve zorder2 is the n=2, bits=31 special case of
    * (mortonN(Array(x, y), 31) == morton(x, y), spec-pinned). Each dim
    * must sit in [0, 2^bits) and n·bits ≤ 63, enforced loudly — a
    * silently truncated dim would interleave garbage into the middle
    * of the curve and destroy the locality the key exists for. */
  def mortonN(dims: Array[Long], bits: Int): Long = {
    val n = dims.length
    require(n >= 2 && bits >= 1 && n * bits <= 63,
      s"zorder_n needs 2+ dims and n*bits <= 63, got n=$n bits=$bits")
    val lim = 1L << bits
    var out = 0L
    var d = 0
    while (d < n) {
      val v = dims(d)
      if (v < 0 || v >= lim)
        throw new IllegalArgumentException(
          s"zorder_n domain is [0, 2^$bits) per dim: got $v in dim $d")
      var i = 0
      while (i < bits) {
        out |= ((v >> i) & 1L) << (i * n + d)
        i += 1
      }
      d += 1
    }
    out
  }
}

/** SQL/column `zorder2(x, y)` — the interleaved sort key. */
case class ZOrderExpr(left: Expression, right: Expression)
    extends BinaryExpression
    with org.apache.spark.sql.graftbridge.DeclaredInputTypes {
  override def declaredInputTypes: Seq[DataType] = Seq(LongType, LongType)
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "zorder2"
  override def nullSafeEval(x: Any, y: Any): Any =
    ZOrderKernels.morton(x.asInstanceOf[Long], y.asInstanceOf[Long])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (x, y) =>
      s"graft.functions.ZOrderKernels.morton($x, $y)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}

/** SQL/column `zorder_n(x1, ..., xn)` — the N-dimensional interleaved
  * sort key (bit i of dim d at position i·n + d, `bits` low bits per
  * dim). Null-intolerant like zorder2; evaluation is one pass of
  * integer bit math per row (interpreted — the key is computed once at
  * WRITE time to order a layout, never in a scan hot loop, so codegen
  * would buy nothing measurable). */
case class ZOrderNExpr(children: Seq[Expression], bits: Int)
    extends Expression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
    with org.apache.spark.sql.graftbridge.DeclaredInputTypes {
  require(children.size >= 2 && bits >= 1 && children.size * bits <= 63,
    s"zorder_n needs 2+ dims and n*bits <= 63, got n=${children.size} bits=$bits")
  override def declaredInputTypes: Seq[DataType] = children.map(_ => LongType)
  override def dataType: DataType = LongType
  override def nullable: Boolean = children.exists(_.nullable)
  override def prettyName: String = s"zorder_n$bits"
  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val dims = new Array[Long](children.size)
    var d = 0
    while (d < dims.length) {
      val v = children(d).eval(input)
      if (v == null) return null
      dims(d) = v.asInstanceOf[Long]
      d += 1
    }
    ZOrderKernels.mortonN(dims, bits)
  }
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): ZOrderNExpr =
    copy(children = newChildren)
}
