package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math over `array<float>` embedding columns, built from
  * codegen'd higher-order functions (`zip_with` + `aggregate`) — no
  * UDFs, no UDT. Inputs are cast to double first so accumulation is
  * double-precision and matches engines that do the same (DuckDB's
  * list_dot_product/list_cosine_similarity).
  */
object vectors {

  private def d(c: Column): Column = transform(c, x => x.cast("double"))

  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(d(a), d(b), (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  def norm(a: Column): Column =
    sqrt(aggregate(d(a), lit(0.0), (acc, x) => acc + x * x))

  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (norm(a) * norm(b))

  def l2Distance(a: Column, b: Column): Column =
    sqrt(aggregate(zip_with(d(a), d(b), (x, y) => (x - y) * (x - y)),
      lit(0.0), (acc, x) => acc + x))

  /** Random-hyperplane LSH bucket id: sign bits of `nBits` deterministic
    * pseudo-random hyperplane projections, packed into a long. Vectors
    * with high cosine similarity land in the same bucket with high
    * probability — the scale path for ANN (bucket-join instead of a
    * full cross-join). Hyperplane components are derived per (bit,
    * dimension) from a seeded hash: deterministic across executors with
    * no broadcast state.
    */
  def hyperplaneBucket(a: Column, nBits: Int, seed: Long): Column = {
    // component(b, i) in {-1, +1}: cheap Rademacher hyperplanes
    val bits = (0 until nBits).map { b =>
      val proj = aggregate(
        zip_with(d(a), sequence(lit(0), size(a) - 1), (x, i) => {
          val h = hash(lit(b), i, lit(seed))
          when(h % 2 === 0, x).otherwise(-x)
        }),
        lit(0.0), (acc, x) => acc + x)
      when(proj >= 0, shiftleft(lit(1L), b)).otherwise(lit(0L))
    }
    bits.reduce(_ bitwiseOR _)
  }
}
