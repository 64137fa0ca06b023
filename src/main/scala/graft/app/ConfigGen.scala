package graft.app

import java.nio.file.{Files, Paths}

import graft.config._
import graft.operators.Transformators

/** Plan-authoring CLI — the non-interactive equivalent of the
  * reference's `rustic-config-generator-cli` (SURVEY.md §3.3): merge one
  * column operation into a sync TOML file.
  *
  * {{{
  * sbt "runMain graft.app.ConfigGen \
  *   --config-file conf/sync/mydb-public-sync.toml \
  *   --table users --column email \
  *   --operation fake_email_transformation   # or replace:VALUE | nullify
  *   [--retain-if-empty]"
  * }}}
  */
object ConfigGen {

  def merge(cfg: AnonymizationConfig, table: String,
            transformation: ColumnTransformation): AnonymizationConfig = {
    val existing = cfg.tableConfig(table)
    val updated = existing match {
      case Some(t) =>
        val cols = t.anonymizationType match {
          case AnonymizationType.Multi(cs) =>
            cs.filterNot(_.columnName == transformation.columnName) :+ transformation
          case AnonymizationType.Single(_) =>
            throw new IllegalArgumentException(
              s"table $table uses a Single whole-table transformation; " +
              "column operations don't apply")
        }
        t.copy(anonymizationType = AnonymizationType.Multi(cols))
      case None =>
        TableConfig(table, AnonymizationType.Multi(Seq(transformation)))
    }
    AnonymizationConfig(cfg.tables.filterNot(_.tableName == table) :+ updated)
  }

  def parseOperation(op: String): TransformationType = op match {
    case "nullify" => TransformationType.Nullify
    case r if r.startsWith("replace:") =>
      TransformationType.Replace(r.stripPrefix("replace:"))
    case custom =>
      require(Transformators.operationTypes.contains(custom),
        s"unknown operation '$custom'; one of: nullify, replace:VALUE, " +
        Transformators.operationTypes.toSeq.sorted.mkString(", "))
      TransformationType.Custom(custom)
  }

  def main(argv: Array[String]): Unit = {
    var file = ""; var table = ""; var column = ""; var op = ""
    var retain = false
    var rest = argv.toList
    while (rest.nonEmpty) rest match {
      case "--config-file" :: v :: t => file = v; rest = t
      case "--table" :: v :: t => table = v; rest = t
      case "--column" :: v :: t => column = v; rest = t
      case "--operation" :: v :: t => op = v; rest = t
      case "--retain-if-empty" :: t => retain = true; rest = t
      case other :: _ => throw new IllegalArgumentException(s"unknown arg $other")
      case Nil => ()
    }
    require(file.nonEmpty && table.nonEmpty && column.nonEmpty && op.nonEmpty,
      "--config-file, --table, --column, --operation are required")

    val current =
      if (Files.exists(Paths.get(file)))
        ConfigLoader.parseAnonymization(Files.readString(Paths.get(file)))
      else AnonymizationConfig.empty
    val merged = merge(current, table,
      ColumnTransformation(column, parseOperation(op), retain))
    Files.createDirectories(Paths.get(file).toAbsolutePath.getParent)
    Files.writeString(Paths.get(file), TomlWriter.write(merged))
    println(s"[configgen] wrote $file: table=$table column=$column op=$op")
  }
}
