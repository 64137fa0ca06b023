package graft

import org.apache.spark.sql.functions._

/** Pins for the ε-DP geometric count-release mechanism
  * ([[graft.operators.Privacy.dpNoisyCounts]]/[[dpNoiseAudit]]): the
  * cutpoint table's shape, the truncation bound, replay determinism,
  * and the calibration property that larger ε (less privacy) means
  * less noise mass away from zero.
  */
class PrivacySpec extends SparkTestBase {
  import graft.operators.Privacy

  test("geometricCutpoints: monotone, total (ends at exactly 1e6), symmetric mass around zero") {
    val cuts = Privacy.geometricCutpoints(1.0, 8)
    assert(cuts.map(_._2) === (-8 to 8))
    assert(cuts.map(_._1) === cuts.map(_._1).sorted, "CDF must be monotone")
    assert(cuts.last._1 === 1000000L, "chain must be total")
    // two-sided symmetry: P(noise <= -1) == P(noise >= 1) <=> the mass
    // below -1's cutpoint equals 1e6 minus the mass through 0
    val below = cuts(7)._1            // CDF through k = -1
    val through0 = cuts(8)._1         // CDF through k = 0
    assert(math.abs(below - (1000000L - through0)) <= 1L,
      s"asymmetric: P(<=-1)=$below vs P(>=1)=${1000000L - through0}")
  }

  test("geometricCutpoints: larger eps concentrates mass at zero") {
    def massAtZero(eps: Double): Long = {
      val c = Privacy.geometricCutpoints(eps, 8)
      c(8)._1 - c(7)._1 // CDF(0) - CDF(-1)
    }
    assert(massAtZero(0.1) < massAtZero(1.0))
    assert(massAtZero(1.0) < massAtZero(5.0))
  }

  test("dpNoisyCounts: deterministic replay, bounded noise, non-negative release; seed rotation changes the draw") {
    val ev = eventsUs()
    def run(seed: String) =
      Privacy.dpNoiseAudit(ev, Seq("event_type"), eps = 1.0, bound = 8,
          seed = seed)
        .orderBy("event_type").collect()
        .map(r => (r.getAs[String]("event_type"), r.getAs[Long]("n_exact"),
          r.getAs[Long]("noise"), r.getAs[Long]("n_noisy")))
    val a = run("dp42")
    assert(a.sameElements(run("dp42")), "same seed must replay identically")
    assert(a.forall { case (_, _, noise, _) => math.abs(noise) <= 8L },
      "noise must respect the truncation bound")
    assert(a.forall { case (_, nExact, noise, nNoisy) =>
      nNoisy === math.max(0L, nExact + noise) }, "release must clamp at 0")
    val b = run("dp43")
    assert(!a.map(_._3).sameElements(b.map(_._3)),
      "rotating the seed must change at least one draw")
  }

  test("dpNoisyCounts: empirical noise distribution follows the cutpoints over many groups") {
    // 4096 single-row groups -> 4096 independent draws; the observed
    // mean |noise| must sit near the cutpoint-implied expectation
    // (E|noise| ~= 0.92 at eps=1, bound=8), a loose 3-sigma band
    val df = spark.range(4096).toDF("g")
    val out = Privacy.dpNoisyCounts(df, Seq("g"), eps = 1.0, bound = 8,
        seed = "sweep")
      .agg(avg(abs(col("noise")))).first().getDouble(0)
    val cuts = Privacy.geometricCutpoints(1.0, 8)
    val pmf = cuts.map(_._1).zip(0L +: cuts.map(_._1).init)
      .map { case (hi, lo) => (hi - lo) / 1e6 }
    val expAbs = cuts.map(_._2).zip(pmf)
      .map { case (k, p) => math.abs(k) * p }.sum
    assert(math.abs(out - expAbs) < 0.15,
      s"mean |noise| $out vs cutpoint expectation $expAbs")
  }
}
