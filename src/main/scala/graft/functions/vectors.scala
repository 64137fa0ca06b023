package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.graftbridge.Bridge

/** Vector math over `array<float>` embedding columns, backed by the
  * fused codegen kernels in [[VectorKernels]] (see VectorExprs.scala for
  * why higher-order functions were too slow here).
  *
  * Inputs are cast to `array<float>` (no-op for real embedding columns);
  * accumulation happens in double, left-to-right — bit-identical to
  * DuckDB's `list_*` functions over `CAST(x AS DOUBLE[])`, which the
  * correctness oracle depends on.
  */
object vectors {

  private def f(c: Column): Column = c.cast("array<float>")

  def dot(a: Column, b: Column): Column =
    Bridge.column(DotExpr(Bridge.expression(f(a)), Bridge.expression(f(b))))

  def norm(a: Column): Column =
    Bridge.column(NormExpr(Bridge.expression(f(a))))

  def cosine(a: Column, b: Column): Column =
    Bridge.column(CosineSimExpr(Bridge.expression(f(a)), Bridge.expression(f(b))))

  def l2Distance(a: Column, b: Column): Column =
    Bridge.column(L2DistanceExpr(Bridge.expression(f(a)), Bridge.expression(f(b))))

  /** Random-hyperplane LSH bucket id: sign bits of `nBits` deterministic
    * Rademacher projections packed into a long. High-cosine vectors
    * collide with high probability — the scale path for ANN (bucket
    * join instead of cross join). */
  def hyperplaneBucket(a: Column, nBits: Int, seed: Long): Column =
    Bridge.column(HyperplaneBucketExpr(Bridge.expression(f(a)), nBits, seed))

  /** Int8 scalar quantization of an embedding column — the 4× (fp32)
    * compression step before ANN serving. q_i = clamp(floor(x·127+0.5),
    * −127, 127) computed in double; both engines share the float→double
    * widening and the dyadic constants bit-for-bit, so the codes are
    * engine-exact. Stays a codegen'd higher-order `transform` (array in,
    * array out — the fused kernels above are scalar-reducers). */
  def quantizeInt8(vecCol: String): Column = quantize(vecCol, 127)

  /** Symmetric linear quantization to integer codes in [-scale, scale]
    * (scale 127 = int8, 7 = int4-style). Half-up rounding via
    * floor(x·scale + 0.5) so every engine rounds identically. */
  def quantize(vecCol: String, scale: Int): Column =
    org.apache.spark.sql.functions.expr(
      s"transform($vecCol, x -> CAST(greatest(CAST(-$scale AS BIGINT), " +
        s"least(CAST($scale AS BIGINT), " +
        s"CAST(floor(CAST(x AS DOUBLE) * ${scale}D + 0.5D) AS BIGINT))) AS BIGINT))")
}
