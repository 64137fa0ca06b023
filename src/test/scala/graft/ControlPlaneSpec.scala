package graft

import graft.controlplane.{ControlPlane, RecordingSqlExecutor, Shell}

import org.scalatest.funsuite.AnyFunSuite

class ControlPlaneSpec extends AnyFunSuite {

  test("SETVAL + ownership catalog SQL") {
    assert(ControlPlane.setvalSql("public", "users_id_seq", "users", "id") ==
      "SELECT SETVAL('\"public\".\"users_id_seq\"', " +
      "COALESCE((SELECT MAX(\"id\") FROM \"public\".\"users\"), 1))")
    val q = ControlPlane.sequenceOwnershipQuery("public")
    assert(q.contains("pg_depend") && q.contains("relkind = 'S'"))
  }

  test("DDL generation quotes identifiers and escapes literals") {
    // a quote-bearing password stays inside its literal
    val role = ControlPlane.createImportRoleSql(
      "importer", "p'w; DROP SCHEMA x; --", superuser = false)
    assert(role.head ==
      "CREATE ROLE \"importer\" WITH LOGIN PASSWORD 'p''w; DROP SCHEMA x; --'")
    // a quote-bearing schema name stays inside its identifier
    assert(ControlPlane.dropSchemaSql("we\"ird") ==
      "DROP SCHEMA IF EXISTS \"we\"\"ird\" CASCADE")
    // literal position in the catalog probe
    assert(ControlPlane.sequenceOwnershipQuery("o'hara")
      .contains("n.nspname = 'o''hara'"))
    intercept[IllegalArgumentException](ControlPlane.ident(""))
    intercept[IllegalArgumentException](ControlPlane.literal("a\u0000b"))
  }

  test("bucketed-table writer rejects non-identifier table names") {
    // the table name reaches a recursive warehouse delete: traversal
    // and SQL metacharacters must be rejected up front
    val df = graft.SparkTestBase.session.range(1).toDF("id")
    for (bad <- Seq("../etc", "t; DROP TABLE x", "a b", "\"q\""))
      intercept[IllegalArgumentException](
        graft.operators.Bucketing.writeBucketed(df, bad, "id", 2))
  }

  test("import role, grants, post-import splitting") {
    val role = ControlPlane.createImportRoleSql("importer", "pw", superuser = false)
    assert(role.exists(_.contains("session_replication_role = 'replica'")))
    assert(ControlPlane.grantSql("s", "app", owner = true)
      .exists(_.startsWith("ALTER DEFAULT PRIVILEGES")))
    assert(ControlPlane.grantSql("s", "ro", owner = false)
      .forall(sql => !sql.contains("ALL ON ALL TABLES")))
    assert(ControlPlane.postImportStatements(" A; B ;;C; ") == Seq("A", "B", "C"))
    assert(ControlPlane.postImportEnvKey("mydb", "public") ==
      "MYDB_PUBLIC_POST_IMPORT_SQL_QUERIES")
  }

  test("executor seam records in order") {
    val rec = new RecordingSqlExecutor
    rec.executeAll(ControlPlane.grantSql("s", "u", owner = false))
    assert(rec.statements.length == 3 && rec.statements.head.startsWith("GRANT USAGE"))
  }

  test("shell executor streams lines and reports exit codes") {
    val ok = Shell.run(Seq("sh", "-c", "echo out1; echo err1 1>&2; echo out2"))
    assert(ok.success && ok.stdout == Seq("out1", "out2") && ok.stderr == Seq("err1"))
    val bad = Shell.run(Seq("sh", "-c", "exit 3"))
    assert(bad.exitCode == 3)
    intercept[RuntimeException](Shell.runOrThrow(Seq("sh", "-c", "echo boom 1>&2; exit 1")))
  }

  test("ruleReport: declaration-order rows, stable across runs") {
    val spark = SparkTestBase.session
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val c = Seq((1L, -5L), (2L, 3L)).toDF("id", "bal")
    val o = Seq((1L, 0L)).toDF("id", "price")
    // frames deliberately interleaved (c, o, c): row order must follow
    // the DECLARATION order, not the frame-fusion grouping, and must
    // be identical on a second run
    val rules = Seq(
      ("neg_bal", c, col("bal") < 0),
      ("zero_price", o, col("price") <= 0),
      ("big_bal", c, col("bal") > 100))
    def run() = graft.pipeline.Validator.ruleReport(rules)
      .collect().map(_.getString(0)).toSeq
    val first = run()
    assert(first == Seq("neg_bal", "zero_price", "big_bal"))
    assert(run() == first)
  }

  test("bpe token count kernel") {
    import org.apache.spark.unsafe.types.UTF8String
    import graft.functions.TextKernels
    def n(s: String) = TextKernels.bpeTokenCount(UTF8String.fromString(s))
    assert(n("hello world") == 2)
    assert(n("hello, world!") == 4)   // hello , world !
    assert(n("abc123def") == 3)       // letters digits letters
    assert(n("") == 0)
    assert(n("   ") == 0)
    assert(n("price: $42.99") == 6)   // price :  $  42 . 99
  }
}
