package graft.config

/** Config-as-plan model — the Scala mirror of the reference's TOML
  * schema (rustic-anonymization-config/src/config_structs/). A
  * parsed [[AnonymizationConfig]] IS the logical plan: the pipeline
  * builder compiles it to DataFrame transformations.
  */
final case class AnonymizationConfig(tables: Seq[TableConfig]) {
  def tableConfig(name: String): Option[TableConfig] =
    tables.find(_.tableName == name)
}

object AnonymizationConfig {
  val empty: AnonymizationConfig = AnonymizationConfig(Nil)
}

/** table_struct.rs:7-13 */
final case class TableConfig(
    tableName: String,
    anonymizationType: AnonymizationType,
    keepNumOfRecords: Option[Long] = None,
    filterType: FilterType = FilterType.NoFilter,
    sanitizeNullBytes: Boolean = false)

/** table_type_struct.rs:8-15 (serde tag = "type") */
sealed trait AnonymizationType
object AnonymizationType {
  final case class Multi(columnTransformations: Seq[ColumnTransformation])
      extends AnonymizationType
  /** Whole-table transformation by registry name; the open-source
    * reference ships only a NoOp implementation
    * (whole_table_transformator.rs:1-21). */
  final case class Single(transformation: String) extends AnonymizationType
}

/** column_transformation_struct.rs:8-12 */
final case class ColumnTransformation(
    columnName: String,
    transformationType: TransformationType,
    retainIfEmpty: Boolean = false)

/** transformation_type_struct.rs:6-10 */
sealed trait TransformationType
object TransformationType {
  final case class Replace(replacementValue: String) extends TransformationType
  final case class Custom(operationType: String) extends TransformationType
  case object Nullify extends TransformationType
}

/** filter_type_struct.rs:6-39 — single-table row predicates. */
sealed trait FilterType
object FilterType {
  final case class Contains(column: String, value: String) extends FilterType
  final case class StartsWith(column: String, value: String) extends FilterType
  final case class EndsWith(column: String, value: String) extends FilterType
  final case class StartsAndEndsWith(column: String, startValue: String,
                                     endValue: String) extends FilterType
  final case class Equals(column: String, value: String) extends FilterType
  /** NOT-IN: keep rows whose int column is NOT in the list; NULL is kept
    * (matches the reference's `is_in(..., nulls_equal=true).not()` with a
    * null-free list — anonymization_dataframe_operator.rs:194-211). */
  final case class AnyOfInt(column: String, values: Seq[Int]) extends FilterType
  /** NOT-IN for strings; same NULL semantics. */
  final case class AnyOfString(column: String, values: Seq[String]) extends FilterType
  case object NoFilter extends FilterType
}

/** Validation probe config (rustic-result-validator/src/config_structs/
  * validation_struct.rs:7-12, value_check_type_struct.rs:6-9). */
final case class Validations(validations: Seq[Validation])
final case class Validation(query: String, columnToCheck: String,
                            check: ValueCheck)
sealed trait ValueCheck
object ValueCheck {
  final case class Equals(value: String) extends ValueCheck
  final case class Contains(value: String) extends ValueCheck
}
