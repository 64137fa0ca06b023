package graft

import graft.operators.Linkage
import org.apache.spark.sql.functions._

/** Hand-computed fixtures for the Fellegi–Sunter scorer: weight sums
  * per agreement pattern, blocking isolation, NULL-as-disagreement. */
class LinkageSpec extends SparkTestBase {
  import spark.implicits._

  private val rules = Seq(
    Linkage.eq("seg", 280000L, 120000L),
    Linkage.FieldRule("bal", (a, b) => abs(a - b) <= lit(10L),
      350000L, 150000L),
    Linkage.eq("sfx", 370000L, 160000L))

  test("scorePairs: pattern weight sums, threshold cut, cross-block isolation") {
    val df = Seq(
      (1L, 0, "X", 100L, "01"),  // 1-2: AAA = 1000000
      (2L, 0, "X", 105L, "01"),
      (3L, 0, "Y", 9000L, "01"), // 1-3 / 2-3: DDA = 100000
      (4L, 1, "X", 100L, "01"))  // other block: never pairs with 1-3
      .toDF("id", "blk", "seg", "bal", "sfx")
    val all = Linkage.scorePairs(df, "id", Seq("blk"), rules,
      thresholdPpm = Long.MinValue + 1)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getString(2), r.getLong(3))).toMap
    assert(all === Map(
      (1L, 2L) -> (("AAA", 1000000L)),
      (1L, 3L) -> (("DDA", 100000L)),
      (2L, 3L) -> (("DDA", 100000L))))
    // the decision threshold keeps only the link
    val links = Linkage.scorePairs(df, "id", Seq("blk"), rules, 550000L)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(links === Set((1L, 2L)))
  }

  test("scorePairs: NULL field compares as disagreement, not NULL score") {
    val df = Seq(
      (1L, 0, Some("X"), 100L, "01"),
      (2L, 0, None: Option[String], 100L, "01")) // seg NULL -> D
      .toDF("id", "blk", "seg", "bal", "sfx")
    val got = Linkage.scorePairs(df, "id", Seq("blk"), rules,
      thresholdPpm = Long.MinValue + 1).collect()
    assert(got.length == 1 && got(0).getString(2) == "DAA" &&
      got(0).getLong(3) == -120000L + 350000L + 370000L)
  }
}
