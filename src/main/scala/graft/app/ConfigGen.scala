package graft.app

import java.nio.file.{Files, Paths}

import graft.config._
import graft.operators.Transformators

/** Plan-authoring CLI — the Spark-repo equivalent of the reference's
  * `rustic-config-generator-cli` (SURVEY.md §3.3): merge one column
  * operation into a sync TOML file.
  *
  * Non-interactive (scriptable) form:
  * {{{
  * sbt "runMain graft.app.ConfigGen \
  *   --config-file conf/sync/mydb-public-sync.toml \
  *   --table users --column email \
  *   --operation fake_email_transformation   # or replace:VALUE | nullify
  *   [--retain-if-empty]"
  * }}}
  *
  * Interactive form (the reference's prompt flow,
  * rustic-config-generator-cli/src/main.rs:15-187: pick a config from
  * the directory listing, name table + column, choose Replace vs a
  * Custom faker, then merge-and-write):
  * {{{
  * sbt "runMain graft.app.ConfigGen --interactive --config-dir conf/sync"
  * }}}
  * Prompts are line-based (number or name to select); invalid entries
  * re-prompt, like the reference's validated cliclack inputs. The I/O
  * streams are injectable so ConfigSpec scripts the whole dialogue.
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

  private def mergeIntoFile(file: String, table: String,
                            transformation: ColumnTransformation): Unit = {
    val current =
      if (Files.exists(Paths.get(file)))
        ConfigLoader.parseAnonymization(Files.readString(Paths.get(file)))
      else AnonymizationConfig.empty
    val merged = merge(current, table, transformation)
    Files.createDirectories(Paths.get(file).toAbsolutePath.getParent)
    Files.writeString(Paths.get(file), TomlWriter.write(merged))
  }

  /** The `-sync.toml` files directly under `dir`, as (display name,
    * full path), name-sorted — the reference's available-configurations
    * listing (main.rs:20-39). */
  def listConfigs(dir: String): Seq[(String, String)] = {
    val files = Option(new java.io.File(dir).listFiles()).getOrElse(
      throw new IllegalArgumentException(s"--config-dir '$dir' is not readable"))
    files.toSeq
      .filter(f => f.isFile && f.getName.endsWith("-sync.toml"))
      .map(f => f.getName.stripSuffix("-sync.toml") -> f.getPath)
      .sortBy(_._1)
  }

  /** The reference's interactive flow over plain line I/O. Returns the
    * path of the file written. Re-prompts on invalid input; EOF aborts
    * with an error (nothing written). */
  def interactive(configDir: String, in: java.io.BufferedReader,
                  out: java.io.PrintStream): String = {
    def prompt(msg: String): String = {
      out.println(msg)
      val line = in.readLine()
      require(line != null, s"input ended at: $msg")
      line.trim
    }
    /** Numbered menu select: accepts an index or an exact name. */
    @annotation.tailrec
    def select(msg: String, items: Seq[String]): String = {
      items.zipWithIndex.foreach { case (it, i) => out.println(s"  ${i + 1}) $it") }
      val ans = prompt(msg)
      val byIdx = ans.toIntOption.filter(i => i >= 1 && i <= items.size)
        .map(i => items(i - 1))
      byIdx.orElse(items.find(_ == ans)) match {
        case Some(v) => v
        case None => out.println(s"  '$ans' is not an option"); select(msg, items)
      }
    }
    @annotation.tailrec
    def nonEmptyInput(msg: String): String = {
      val v = prompt(msg)
      if (v.nonEmpty) v else { out.println("  (required)"); nonEmptyInput(msg) }
    }

    out.println(" Generate anonymization configuration! ")
    val configs = listConfigs(configDir)
    require(configs.nonEmpty, s"no *-sync.toml files under $configDir")
    val chosen = select("Select the configuration you want to use:", configs.map(_._1))
    val file = configs.toMap.apply(chosen)
    val table = nonEmptyInput("Which table do you want to generate config for?")
    val column = nonEmptyInput("Which column do you want to generate config for?")
    val opKind = select("Select the operation type you want to perform for the table:",
      Seq("replace", "custom"))
    val transformation = opKind match {
      case "custom" =>
        val op = select("Select the custom operation:",
          Transformators.operationTypes.toSeq.sorted)
        TransformationType.Custom(op)
      case _ =>
        TransformationType.Replace(prompt("Enter the replacement value:"))
    }
    mergeIntoFile(file, table, ColumnTransformation(column, transformation))
    out.println(s"[configgen] wrote $file: table=$table column=$column")
    file
  }

  def main(argv: Array[String]): Unit = {
    var file = ""; var table = ""; var column = ""; var op = ""
    var retain = false
    var inter = false; var configDir = ""
    var rest = argv.toList
    while (rest.nonEmpty) rest match {
      case "--config-file" :: v :: t => file = v; rest = t
      case "--table" :: v :: t => table = v; rest = t
      case "--column" :: v :: t => column = v; rest = t
      case "--operation" :: v :: t => op = v; rest = t
      case "--retain-if-empty" :: t => retain = true; rest = t
      case "--interactive" :: t => inter = true; rest = t
      case "--config-dir" :: v :: t => configDir = v; rest = t
      case other :: _ => throw new IllegalArgumentException(s"unknown arg $other")
      case Nil => ()
    }
    if (inter) {
      require(configDir.nonEmpty, "--interactive requires --config-dir")
      interactive(configDir,
        new java.io.BufferedReader(new java.io.InputStreamReader(System.in)),
        System.out)
      return
    }
    require(file.nonEmpty && table.nonEmpty && column.nonEmpty && op.nonEmpty,
      "--config-file, --table, --column, --operation are required")
    mergeIntoFile(file, table,
      ColumnTransformation(column, parseOperation(op), retain))
    println(s"[configgen] wrote $file: table=$table column=$column op=$op")
  }
}
