package graft

import graft.app.ConfigGen
import graft.config._

import org.scalatest.funsuite.AnyFunSuite

class TomlWriterSpec extends AnyFunSuite {

  val full = AnonymizationConfig(Seq(
    TableConfig("users",
      AnonymizationType.Multi(Seq(
        ColumnTransformation("email", TransformationType.Custom("fake_email_transformation"), retainIfEmpty = true),
        ColumnTransformation("note", TransformationType.Replace("with \"quotes\"")),
        ColumnTransformation("score", TransformationType.Nullify))),
      keepNumOfRecords = Some(500),
      filterType = FilterType.AnyOfString("status", Seq("a", "b")),
      sanitizeNullBytes = true),
    TableConfig("phones", AnonymizationType.Single("fake_phone_transformation"),
      filterType = FilterType.StartsAndEndsWith("num", "+", "9"))))

  test("write -> parse round-trips every shape") {
    val text = TomlWriter.write(full)
    assert(ConfigLoader.parseAnonymization(text) == full)
  }

  test("ConfigGen.merge: add, overwrite, preserve siblings") {
    val v1 = ConfigGen.merge(AnonymizationConfig.empty, "t",
      ColumnTransformation("a", TransformationType.Nullify))
    val v2 = ConfigGen.merge(v1, "t",
      ColumnTransformation("b", ConfigGen.parseOperation("replace:X")))
    val v3 = ConfigGen.merge(v2, "t",
      ColumnTransformation("a", ConfigGen.parseOperation("fake_email_transformation")))
    val AnonymizationType.Multi(cols) = v3.tableConfig("t").get.anonymizationType: @unchecked
    assert(cols.map(_.columnName).sorted == Seq("a", "b"))
    assert(cols.find(_.columnName == "a").get.transformationType ==
      TransformationType.Custom("fake_email_transformation"))
    // round-trip the merged config too
    assert(ConfigLoader.parseAnonymization(TomlWriter.write(v3)) == v3)
  }

  test("parseOperation validates against the registry") {
    assert(ConfigGen.parseOperation("nullify") == TransformationType.Nullify)
    assert(ConfigGen.parseOperation("replace:v") == TransformationType.Replace("v"))
    intercept[IllegalArgumentException](ConfigGen.parseOperation("fake_bogus"))
  }
}
