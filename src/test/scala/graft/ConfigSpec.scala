package graft

import graft.config._

import org.scalatest.funsuite.AnyFunSuite

/** Mirrors the reference's config-deserialization tests
  * (rustic-anonymization-config/src/tests/mod.rs:9-147). */
class ConfigSpec extends AnyFunSuite {

  val multiToml = """
    [[tables]]
    table_name = "table1"
    keep_num_of_records = 10_000
    [tables.anonymization_type]
    type = "Multi"

    [[tables.anonymization_type.column_transformations]]
    column_name = "column1"
    [tables.anonymization_type.column_transformations.transformation_type]
    type = "Replace"
    replacement_value = "replacement_value"

    [[tables.anonymization_type.column_transformations]]
    column_name = "column2"
    retain_if_empty = true
    [tables.anonymization_type.column_transformations.transformation_type]
    type = "Custom"
    operation_type = "fake_email_transformation"
  """

  test("Multi config round-trip (reference tests/mod.rs:9-66)") {
    val cfg = ConfigLoader.parseAnonymization(multiToml)
    assert(cfg.tables.length == 1)
    val t = cfg.tables.head
    assert(t.tableName == "table1")
    assert(t.keepNumOfRecords.contains(10000L))
    val AnonymizationType.Multi(cols) = t.anonymizationType: @unchecked
    assert(cols.length == 2)
    assert(cols(0).transformationType == TransformationType.Replace("replacement_value"))
    assert(!cols(0).retainIfEmpty)
    assert(cols(1).transformationType == TransformationType.Custom("fake_email_transformation"))
    assert(cols(1).retainIfEmpty)
  }

  test("Single config (reference tests/mod.rs:68-97)") {
    val cfg = ConfigLoader.parseAnonymization("""
      [[tables]]
      table_name = "table1"
      [tables.anonymization_type]
      type = "Single"
      transformation = "fake_phone_transformation"
    """)
    assert(cfg.tables.head.anonymizationType ==
      AnonymizationType.Single("fake_phone_transformation"))
  }

  test("filter_type variants incl. arrays (reference tests/mod.rs:99-147)") {
    val cfg = ConfigLoader.parseAnonymization("""
      [[tables]]
      table_name = "t1"
      [tables.filter_type]
      type = "Contains"
      column = "column1"
      value = "foo"
      [tables.anonymization_type]
      type = "Single"
      transformation = "x"

      [[tables]]
      table_name = "t2"
      [tables.filter_type]
      type = "AnyOfInt"
      column = "k"
      values = [1, 2, 3]
      [tables.anonymization_type]
      type = "Multi"

      [[tables]]
      table_name = "t3"
      [tables.filter_type]
      type = "AnyOfString"
      column = "s"
      values = ["a", "b"]
      [tables.anonymization_type]
      type = "Multi"
    """)
    assert(cfg.tables(0).filterType == FilterType.Contains("column1", "foo"))
    assert(cfg.tables(1).filterType == FilterType.AnyOfInt("k", Seq(1, 2, 3)))
    assert(cfg.tables(2).filterType == FilterType.AnyOfString("s", Seq("a", "b")))
  }

  test("unknown filter type degrades to NoFilter (serde(other) analog)") {
    val cfg = ConfigLoader.parseAnonymization("""
      [[tables]]
      table_name = "t"
      [tables.filter_type]
      type = "SomethingNew"
      [tables.anonymization_type]
      type = "Multi"
    """)
    assert(cfg.tables.head.filterType == FilterType.NoFilter)
  }

  test("missing config file => empty config => pass-through") {
    val cfg = ConfigLoader.loadAnonymizationFor("/tmp/definitely-missing", "db", "s")
    assert(cfg == AnonymizationConfig.empty)
  }

  test("comments, escapes, bools") {
    val cfg = ConfigLoader.parseAnonymization("""
      # full-line comment
      [[tables]]
      table_name = "t" # trailing comment
      sanitize_null_bytes = true
      [tables.anonymization_type]
      type = "Multi"
      [[tables.anonymization_type.column_transformations]]
      column_name = "c"
      [tables.anonymization_type.column_transformations.transformation_type]
      type = "Replace"
      replacement_value = "with \"quotes\" and #hash"
    """)
    assert(cfg.tables.head.sanitizeNullBytes)
    val AnonymizationType.Multi(cols) = cfg.tables.head.anonymizationType: @unchecked
    assert(cols.head.transformationType ==
      TransformationType.Replace("with \"quotes\" and #hash"))
  }

  test("validations config (validation_struct.rs:7-12)") {
    val v = ConfigLoader.parseValidations("""
      [[validations]]
      query = "SELECT status FROM jobs"
      column_to_check = "status"
      [validations.value_check_type]
      type = "Equals"
      value = "done"
    """)
    assert(v.validations == Seq(
      Validation("SELECT status FROM jobs", "status", ValueCheck.Equals("done"))))
  }
}
