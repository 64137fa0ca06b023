package graft.functions

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._

/** Kernels for the HLL register build (Sketch.hll). */
object SketchKernels {
  /** Trailing-zero rank of a `width`-bit hash remainder: ρ = tz + 1,
    * with rem == 0 ranking `width + 1` (all bits zero). Semantically
    * identical to counting k ∈ [1, width] with rem % 2^k == 0 (the
    * form the DuckDB oracle replays) — one CTZ instruction instead of
    * `width` modulos per distinct value. */
  def rho(rem: Long, width: Int): Long =
    if (rem == 0L) width + 1L
    else math.min(java.lang.Long.numberOfTrailingZeros(rem), width) + 1L
}

/** Codegen'd ρ — keeps the HLL register build inside whole-stage
  * codegen with a single intrinsic, replacing the 43-element
  * higher-order `filter(sequence(...))` fold. */
case class RhoExpr(child: Expression, width: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with org.apache.spark.sql.graftbridge.DeclaredInputTypes {
  require(width >= 1 && width <= 62, s"width out of range: $width")
  override def declaredInputTypes: Seq[DataType] = Seq(LongType)
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "hll_rho"
  override def nullSafeEval(rem: Any): Any =
    SketchKernels.rho(rem.asInstanceOf[Long], width)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, rem =>
      s"graft.functions.SketchKernels.rho($rem, $width)")
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}
