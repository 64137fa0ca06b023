package graft

import graft.config._

import org.scalacheck.{Gen, Prop}
import org.scalacheck.Test.{check, Parameters}
import org.scalatest.funsuite.AnyFunSuite

/** Property: TomlWriter.write andThen ConfigLoader.parseAnonymization is
  * the identity over the whole config space (names with quotes and
  * backslashes included). */
class TomlPropertySpec extends AnyFunSuite {

  private val name: Gen[String] = for {
    base <- Gen.nonEmptyListOf(Gen.alphaNumChar).map(_.mkString)
    // quotes, backslashes, comment chars, trailing backslash-before-
    // close, and control characters (escaped by the writer since r3)
    decoration <- Gen.oneOf("", "_x", " sp ", "\"q\"", "\\bs", "#h",
      "tail\\", "nl\nx", "tab\tx", "cr\rx", "ctl")
  } yield base + decoration

  private val transformationType: Gen[TransformationType] = Gen.oneOf(
    name.map(TransformationType.Replace(_)),
    Gen.oneOf(graft.operators.Transformators.operationTypes.toSeq)
      .map(TransformationType.Custom(_)),
    Gen.const(TransformationType.Nullify))

  private val columnTransformation: Gen[ColumnTransformation] = for {
    c <- name; tt <- transformationType; r <- Gen.oneOf(true, false)
  } yield ColumnTransformation(c, tt, r)

  private val filter: Gen[FilterType] = Gen.oneOf(
    Gen.const(FilterType.NoFilter),
    Gen.zip(name, name).map { case (c, v) => FilterType.Contains(c, v) },
    Gen.zip(name, name).map { case (c, v) => FilterType.StartsWith(c, v) },
    Gen.zip(name, name).map { case (c, v) => FilterType.EndsWith(c, v) },
    Gen.zip(name, name, name).map { case (c, s, e) =>
      FilterType.StartsAndEndsWith(c, s, e) },
    Gen.zip(name, name).map { case (c, v) => FilterType.Equals(c, v) },
    Gen.zip(name, Gen.listOf(Gen.chooseNum(-1000, 1000)))
      .map { case (c, vs) => FilterType.AnyOfInt(c, vs) },
    Gen.zip(name, Gen.listOf(name)).map { case (c, vs) =>
      FilterType.AnyOfString(c, vs) })

  private val table: Gen[TableConfig] = for {
    n <- name
    at <- Gen.oneOf(
      Gen.nonEmptyListOf(columnTransformation).map(AnonymizationType.Multi(_)),
      name.map(AnonymizationType.Single(_)))
    keep <- Gen.option(Gen.chooseNum(1L, 1000000L))
    f <- filter
    san <- Gen.oneOf(true, false)
  } yield TableConfig(n, at, keep, f, san)

  test("write -> parse == identity (300 random configs)") {
    val prop = Prop.forAll(Gen.listOf(table).map(AnonymizationConfig(_))) { cfg =>
      ConfigLoader.parseAnonymization(TomlWriter.write(cfg)) == cfg
    }
    val result = check(Parameters.default.withMinSuccessfulTests(300), prop)
    assert(result.passed, result.status.toString)
  }
}
