package graft

import org.apache.spark.sql.functions._

import graft.operators.Association
import graft.pipeline.Validator

class AssociationSpec extends SparkTestBase {
  import spark.implicits._

  test("frequentPairs: canonical orientation, per-basket dedup, support floor") {
    val rows = Seq(
      (1L, "a"), (1L, "b"), (1L, "b"),  // dup (1,b) counts once
      (2L, "b"), (2L, "a"),             // order inside basket irrelevant
      (3L, "a"), (3L, "c"))
      .toDF("basket", "item")
    val got = Association.frequentPairs(rows, "basket", "item",
      minSupport = 2)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
      .toSet
    assert(got == Set(("a", "b", 2L)))  // (a,c) support 1 filtered
  }

  test("ruleReport: per-rule violation counts; same-frame rules fuse into one scan") {
    val c = Seq((1L, -5L, "ok"), (2L, 3L, "ok"), (3L, 7L, "bad"))
      .toDF("id", "bal", "tag")
    val o = Seq((1L, 0L)).toDF("id", "price")
    val report = Validator.ruleReport(Seq(
      ("neg_bal", c, col("bal") < 0),
      ("bad_tag", c, col("tag") === "bad"),
      ("zero_price", o, col("price") <= 0)))
    val got = report.collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == Set(("neg_bal", 1L, 3L), ("bad_tag", 1L, 3L),
      ("zero_price", 1L, 1L)))
    // the two customer rules share one aggregate: two aggregate legs
    // in the optimized plan, not three
    val nAggs = report.queryExecution.optimizedPlan.collect {
      case a: org.apache.spark.sql.catalyst.plans.logical.Aggregate => a
    }.length
    assert(nAggs == 2, report.queryExecution.optimizedPlan.toString)
  }

  test("recommendPairs: lift demotes the universally popular item") {
    import graft.operators.Association
    // u appears in EVERY basket; a and b co-occur only with each other
    val rows = Seq(
      (1L, "a"), (1L, "b"), (1L, "u"),
      (2L, "a"), (2L, "b"), (2L, "u"),
      (3L, "u"), (4L, "u"))
      .toDF("basket", "item")
    val got = Association.recommendPairs(rows, "basket", "item",
      minSupport = 2, k = 1)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(3)))
      .map { case (a, b, l) => (a, b) -> l }.toMap
    // lift(a,b) = 2*4*1e6/(2*2) = 2e6; lift(a,u) = 2*4*1e6/(2*4) = 1e6
    // -> b outranks u as a's top rec
    assert(got.keySet.contains(("a", "b")))
    assert(got(("a", "b")) == 2000000L)
    assert(!got.keySet.contains(("a", "u")))
  }
}
