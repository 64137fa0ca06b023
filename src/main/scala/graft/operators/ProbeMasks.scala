package graft.operators

/** Shared generator for multi-probe XOR masks: every pattern flipping
  * <= `maxFlips` of `nBits` bits. Used by the embedding LSH tier, the
  * simhash band prober, and ANN lshTopK — ONE implementation so the
  * fan-out guard can't drift between call sites.
  *
  * The count is computed arithmetically (BigInt, exact) BEFORE anything
  * is generated: materializing C(nBits, <=h) combinations first and
  * checking size after would OOM the driver for exactly the inputs the
  * guard exists to reject.
  */
private[operators] object ProbeMasks {

  /** C(nBits, <=maxFlips), exact. Sequential multiply-then-divide —
    * partial products of binomials are integers; per-factor division
    * truncates and is WRONG. */
  def count(nBits: Int, maxFlips: Int): BigInt =
    (0 to maxFlips).map { h =>
      (0 until h).foldLeft(BigInt(1))((acc, i) => acc * (nBits - i) / (i + 1))
    }.sum

  def masks(nBits: Int, maxFlips: Int, cap: Long = 65536L): Seq[Long] = {
    require(nBits >= 1 && nBits <= 63, s"nBits $nBits not in [1,63]")
    require(maxFlips >= 0 && maxFlips <= nBits,
      s"maxFlips $maxFlips not in [0,$nBits]")
    val n = count(nBits, maxFlips)
    require(n <= cap,
      s"probe fan-out $n (C($nBits, <=$maxFlips)) exceeds $cap; " +
      "lower the flip budget or the bit width")
    (0 to maxFlips).flatMap(h =>
      (0 until nBits).combinations(h)
        .map(_.foldLeft(0L)((m, b) => m | (1L << b))))
  }
}
