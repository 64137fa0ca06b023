package graft

import graft.config._
import graft.pipeline.{FakeAllStringsTransformator, TablePipeline, Validator}

import org.apache.spark.sql.functions._

/** The SURVEY.md §7 "minimum end-to-end slice", verbatim: customer ->
  * StartsWith filter -> limit -> fake_email + Replace + Nullify ->
  * write parquet -> re-read -> Equals validation -> run twice,
  * byte-identical. */
class MinimumSliceSpec extends SparkTestBase {
  import spark.implicits._

  test("t1-smoke-shaped slice, twice, byte-identical") {
    val cfg = TableConfig(
      tableName = "customer",
      anonymizationType = AnonymizationType.Multi(Seq(
        ColumnTransformation("c_name", TransformationType.Custom("fake_email_transformation")),
        ColumnTransformation("c_mktsegment", TransformationType.Replace("SEGMENT")),
        ColumnTransformation("c_acctbal", TransformationType.Nullify))),
      keepNumOfRecords = Some(200),
      filterType = FilterType.StartsWith("c_name", "Customer#"),
      sanitizeNullBytes = true)

    def runOnce(out: String): Array[org.apache.spark.sql.Row] = {
      val df = spark.read.parquet(sf() + "/customer.parquet")
      TablePipeline.build(df, cfg, orderForLimit = Seq("c_custkey"))
        .write.mode("overwrite").parquet(out)
      spark.read.parquet(out).orderBy("c_custkey").collect()
    }
    val dir = java.nio.file.Files.createTempDirectory("graft_slice").toString
    val first = runOnce(s"$dir/a")
    val second = runOnce(s"$dir/b")
    assert(first.nonEmpty)
    assert(first.sameElements(second), "not byte-identical across runs")

    // validation via the framework
    spark.read.parquet(s"$dir/a").createOrReplaceTempView("slice_out")
    assert(Validator.runOrThrow(spark, Validations(Seq(
      Validation("SELECT c_mktsegment FROM slice_out", "c_mktsegment",
        ValueCheck.Equals("SEGMENT")),
      Validation("SELECT c_name FROM slice_out", "c_name",
        ValueCheck.Contains("@example."))))))
    assert(spark.table("slice_out").filter($"c_acctbal".isNotNull).count() == 0)
  }

  test("driver entry(): flagship pipeline yields rows on sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("queries and oracles are the SAME key set (no unverifiable query can land)") {
    // Round 13 ended red because three queries were registered with no
    // oracle — err: "no_oracle" in CORRECTNESS, invisible to sbt test.
    // The gate is bidirectional: an oracle without a query is dead SQL,
    // and a query without an oracle is UNVERIFIED surface — both fail
    // here, so neither can compile into a snapshot commit.
    val qs = SparkEntry.queries.keySet
    val os = SparkEntry.oracleSql.keySet
    assert((os -- qs).isEmpty, s"oracles without queries: ${os -- qs}")
    assert((qs -- os).isEmpty,
      s"queries with NO oracle (unverified surface): ${(qs -- os).toSeq.sorted}")
  }

  test("whole-table fake_all_strings transformator") {
    val cfg = TableConfig("supplier", AnonymizationType.Single("fake_all_strings"))
    val df = spark.read.parquet(sf() + "/supplier.parquet")
    val out = TablePipeline.build(df, cfg,
      wholeTableRegistry = Map("fake_all_strings" -> new FakeAllStringsTransformator()))
    val rows = out.collect()
    assert(rows.forall(r => r.getAs[String]("s_name")
      .matches("[0-9a-f-]{36}"))) // uuid shape
    assert(out.schema == df.schema)
    // non-string columns untouched
    assert(out.select(sum($"s_acctbal")).first().getDouble(0) ==
      df.select(sum($"s_acctbal")).first().getDouble(0))
  }
}
