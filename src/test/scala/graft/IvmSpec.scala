package graft

import org.apache.spark.sql.functions._

import graft.operators.Ivm

class IvmSpec extends SparkTestBase {
  import spark.implicits._

  private def aggOf(df: org.apache.spark.sql.DataFrame) =
    df.groupBy($"k").agg(count(lit(1)).as("n"), sum($"v").as("s"))

  test("mergeAdditive(base, delta) == full recompute, including delta-only keys") {
    val base = Seq(("a", 1L), ("a", 2L), ("b", 10L)).toDF("k", "v")
    val delta = Seq(("a", 5L), ("c", 7L)).toDF("k", "v")
    val merged = Ivm.mergeAdditive(aggOf(base), aggOf(delta), Seq("k"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val full = aggOf(base.unionByName(delta))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(merged == full)
    assert(merged == Set(("a", 3L, 8L), ("b", 1L, 10L), ("c", 1L, 7L)))
  }

  test("mergeAdditive folds CDC retractions as negated measures") {
    val view = Seq(("a", 2L, 8L), ("b", 1L, 10L)).toDF("k", "n", "s")
    // retract one (a, 5) row: n -1, s -5
    val retraction = Seq(("a", -1L, -5L)).toDF("k", "n", "s")
    val got = Ivm.mergeAdditive(view, retraction, Seq("k"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == Set(("a", 1L, 3L), ("b", 1L, 10L)))
  }

  test("quantizeInt8: floor(x*127+0.5) with clamping at both rails") {
    val df = Seq((1L, Array(0.0f, 1.0f, -1.0f, 2.5f, -3.0f, 0.004f)))
      .toDF("id", "embedding")
    val got = df.select(graft.functions.vectors.quantizeInt8("embedding")
      .as("q")).as[Seq[Long]].collect().head
    // 0 -> 0; 1 -> 127; -1 -> floor(-126.5) = -127; 2.5 -> clamp 127;
    // -3 -> clamp -127; 0.004*127+0.5 = 1.008 -> 1
    assert(got == Seq(0L, 127L, -127L, 127L, -127L, 1L))
  }

  test("labelOutliers: planted far vector ranks first in its label, exact integer distances") {
    // three 2-dim vectors in label "x": two at the centroid's corners,
    // one planted far away; the far one must rank 1
    val df = Seq(
      (1L, "x", Array(0.1f, 0.1f)), (2L, "x", Array(0.1f, 0.1f)),
      (3L, "x", Array(0.9f, 0.9f)),
      (4L, "y", Array(0.5f, 0.5f)))
      .toDF("vec_id", "label", "embedding")
    val got = graft.operators.Similarity.labelOutliers(df, "vec_id",
      "label", "embedding", k = 1)
      .collect().map(r => (r.getString(1), r.getLong(0), r.getLong(3)))
      .toSet
    // codes: 0.1 -> 13, 0.9 -> 114; label x centroid sum = 140 per dim
    // dist_sc(3) = 2*(114*3 - 140)^2 = 2*202^2; ids 1,2 tie below it
    assert(got == Set(("x", 3L, 1L), ("y", 4L, 1L)))
  }
}
