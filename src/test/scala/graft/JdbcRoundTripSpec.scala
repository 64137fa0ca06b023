package graft

import java.sql.DriverManager
import java.util.Properties

import graft.sinks.{JdbcCatalog, JdbcSink}

/** Live round-trip of the JDBC seam against an embedded DuckDB database
  * (test-scope driver) — the reference's sink is Postgres, which the
  * offline env lacks; DuckDB exercises the same surfaces for real:
  * Spark's JDBC writer, the staged ON CONFLICT upsert statement, and the
  * information_schema catalog reads. Only the PK lookup is dialect
  * swapped (pg_index has no rows in DuckDB).
  */
class JdbcRoundTripSpec extends SparkTestBase {
  import spark.implicits._

  private def withDb(test: (String, Properties) => Unit): Unit = {
    val dbFile = java.nio.file.Files.createTempDirectory("graft_jdbc")
      .resolve("t.db").toString
    val url = s"jdbc:duckdb:$dbFile"
    val props = new Properties()
    // single writer: DuckDB is single-process; one JDBC partition
    props.setProperty("numPartitions", "1")
    try test(url, props)
    finally new java.io.File(dbFile).delete()
  }

  test("JdbcSink: full write then staged ON CONFLICT upsert round-trips") {
    withDb { (url, props) =>
      val conn = DriverManager.getConnection(url)
      try {
        conn.createStatement().execute(
          "CREATE TABLE users (id BIGINT PRIMARY KEY, name VARCHAR, score DOUBLE)")
        val sink = new JdbcSink(url, props, batchSize = 2)
        sink.writeFull(Seq((1L, "ann", 1.0), (2L, "bob", 2.0), (3L, "cyd", 3.0))
          .toDF("id", "name", "score"), "users")

        // upsert: update id=2, insert id=4 — one staged statement
        sink.upsert(Seq((2L, "BOB", 20.0), (4L, "dee", 4.0))
          .toDF("id", "name", "score"), "users", pk = Seq("id"))

        val rs = conn.createStatement()
          .executeQuery("SELECT id, name, score FROM users ORDER BY id")
        val got = Iterator.continually(rs)
          .takeWhile(_.next())
          .map(r => (r.getLong(1), r.getString(2), r.getDouble(3))).toList
        assert(got == List((1L, "ann", 1.0), (2L, "BOB", 20.0),
          (3L, "cyd", 3.0), (4L, "dee", 4.0)))

        // staging table dropped after the merge
        val st = conn.createStatement().executeQuery(
          "SELECT count(*) FROM information_schema.tables " +
          "WHERE table_name LIKE '%staging_graft'")
        st.next()
        assert(st.getLong(1) == 0L, "staging table must be dropped")
      } finally conn.close()
    }
  }

  test("JdbcCatalog: tables/columns/primaryKey against a live database") {
    withDb { (url, props) =>
      val conn = DriverManager.getConnection(url)
      try {
        conn.createStatement().execute(
          "CREATE TABLE orders2 (o_id BIGINT, line INT, total DOUBLE, " +
          "PRIMARY KEY (o_id, line))")
        conn.createStatement().execute("CREATE TABLE plain (x VARCHAR)")
        val duckPk = (schema: String, table: String) =>
          "SELECT unnest(constraint_column_names) AS attname " +
          s"FROM duckdb_constraints() WHERE constraint_type = 'PRIMARY KEY' " +
          s"AND schema_name = '$schema' AND table_name = '$table'"
        val cat = new JdbcCatalog(spark, url, props, duckPk)
        assert(cat.tables("main").contains("orders2"))
        assert(cat.columns("main", "orders2") ==
          Seq(("o_id", "BIGINT"), ("line", "INTEGER"), ("total", "DOUBLE")))
        assert(cat.primaryKey("main", "orders2") == Seq("o_id", "line"))
        assert(cat.primaryKey("main", "plain").isEmpty)
      } finally conn.close()
    }
  }
}
