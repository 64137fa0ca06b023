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
