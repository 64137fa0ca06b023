package graft.config

/** Serializes an [[AnonymizationConfig]] back to the reference's TOML
  * shape (the format `rustic-config-generator-cli` emits) —
  * parse(write(cfg)) == cfg. */
object TomlWriter {

  def write(cfg: AnonymizationConfig): String = {
    val sb = new StringBuilder
    cfg.tables.foreach { t =>
      sb ++= "[[tables]]\n"
      sb ++= s"table_name = ${q(t.tableName)}\n"
      t.keepNumOfRecords.foreach(n => sb ++= s"keep_num_of_records = $n\n")
      if (t.sanitizeNullBytes) sb ++= "sanitize_null_bytes = true\n"
      filterLines(t.filterType).foreach(sb ++= _)
      t.anonymizationType match {
        case AnonymizationType.Single(name) =>
          sb ++= "[tables.anonymization_type]\n"
          sb ++= "type = \"Single\"\n"
          sb ++= s"transformation = ${q(name)}\n"
        case AnonymizationType.Multi(cols) =>
          sb ++= "[tables.anonymization_type]\n"
          sb ++= "type = \"Multi\"\n"
          cols.foreach { c =>
            sb ++= "[[tables.anonymization_type.column_transformations]]\n"
            sb ++= s"column_name = ${q(c.columnName)}\n"
            if (c.retainIfEmpty) sb ++= "retain_if_empty = true\n"
            sb ++= "[tables.anonymization_type.column_transformations.transformation_type]\n"
            c.transformationType match {
              case TransformationType.Replace(v) =>
                sb ++= "type = \"Replace\"\n"
                sb ++= s"replacement_value = ${q(v)}\n"
              case TransformationType.Custom(op) =>
                sb ++= "type = \"Custom\"\n"
                sb ++= s"operation_type = ${q(op)}\n"
              case TransformationType.Nullify =>
                sb ++= "type = \"Nullify\"\n"
            }
          }
      }
      sb ++= "\n"
    }
    sb.toString
  }

  private def filterLines(f: FilterType): Seq[String] = {
    def block(kind: String, kvs: (String, String)*): Seq[String] =
      "[tables.filter_type]\n" +: (s"type = ${q(kind)}\n" +:
        kvs.map { case (k, v) => s"$k = $v\n" })
    f match {
      case FilterType.NoFilter => Nil
      case FilterType.Contains(c, v) => block("Contains", "column" -> q(c), "value" -> q(v))
      case FilterType.StartsWith(c, v) => block("StartsWith", "column" -> q(c), "value" -> q(v))
      case FilterType.EndsWith(c, v) => block("EndsWith", "column" -> q(c), "value" -> q(v))
      case FilterType.StartsAndEndsWith(c, s, e) => block("StartsAndEndsWith",
        "column" -> q(c), "start_value" -> q(s), "end_value" -> q(e))
      case FilterType.Equals(c, v) => block("Equals", "column" -> q(c), "value" -> q(v))
      case FilterType.AnyOfInt(c, vs) => block("AnyOfInt",
        "column" -> q(c), "values" -> vs.mkString("[", ", ", "]"))
      case FilterType.AnyOfString(c, vs) => block("AnyOfString",
        "column" -> q(c), "values" -> vs.map(q).mkString("[", ", ", "]"))
    }
  }

  /** TOML basic-string quoting: escapes backslash/quote AND the control
    * characters (newline, tab, ...) — the line-based parser could never
    * re-read a raw multi-line value it wrote itself. */
  private def q(s: String): String = {
    val sb = new StringBuilder(s.length + 2)
    sb.append('"')
    s.foreach {
      case '\\' => sb.append("\\\\")
      case '"' => sb.append("\\\"")
      case '\n' => sb.append("\\n")
      case '\t' => sb.append("\\t")
      case '\r' => sb.append("\\r")
      case c if c < ' ' => sb.append(f"\\u${c.toInt}%04x")
      case c => sb.append(c)
    }
    sb.append('"')
    sb.toString
  }
}
