package graft

import graft.app.Main
import graft.sinks.{JdbcSink, ParquetSink}
import graft.sources.DmsFiles

import org.apache.spark.sql.functions._

class SinksAppSpec extends SparkTestBase {
  import spark.implicits._

  test("ParquetSink: full write then PK upsert merges latest") {
    val dir = java.nio.file.Files.createTempDirectory("graft_sink").toString
    val sink = new ParquetSink(dir)
    val v1 = Seq((1L, "a"), (2L, "b")).toDF("id", "v")
    sink.writeFull(v1, "t")
    val delta = Seq((2L, "b2"), (3L, "c")).toDF("id", "v")
    sink.upsert(delta, "t", Seq("id"))
    val got = spark.read.parquet(s"$dir/t.parquet").orderBy("id")
      .as[(Long, String)].collect().toSeq
    assert(got == Seq((1L, "a"), (2L, "b2"), (3L, "c")))
  }

  test("ParquetSink upsert: within-batch duplicate PKs resolve by the tiebreaker") {
    val dir = java.nio.file.Files.createTempDirectory("graft_sink_tie").toString
    val sink = new ParquetSink(dir, tieBreakers = Seq("ver"))
    sink.writeFull(Seq((1L, 0L, "old")).toDF("id", "ver", "v"), "t")
    // two versions of id=1 in ONE batch: highest ver must win,
    // deterministically, regardless of partition order
    val delta = Seq((1L, 2L, "new2"), (1L, 1L, "new1")).toDF("id", "ver", "v")
      .repartition(4)
    sink.upsert(delta, "t", Seq("id"))
    val got = spark.read.parquet(s"$dir/t.parquet")
      .as[(Long, Long, String)].collect().toSeq
    assert(got == Seq((1L, 2L, "new2")))
  }

  test("catalog queries escape quote-bearing schema/table names") {
    val sql = graft.sinks.JdbcCatalog.postgresPkQuery("it's", "o''table")
    assert(sql.contains("n.nspname = 'it''s'"))
    assert(sql.contains("c.relname = 'o''''table'"))
  }

  test("JdbcSink upsert SQL shape") {
    val sql = JdbcSink.upsertSql("tgt", "stg", Seq("id", "a", "b"), Seq("id"))
    assert(sql ==
      "INSERT INTO tgt (id, a, b) SELECT id, a, b FROM stg " +
      "ON CONFLICT (id) DO UPDATE SET a = EXCLUDED.a, b = EXCLUDED.b")
    // pure link table: pk == all columns => DO NOTHING, not an empty SET
    assert(JdbcSink.upsertSql("rel", "stg", Seq("a_id", "b_id"), Seq("a_id", "b_id")) ==
      "INSERT INTO rel (a_id, b_id) SELECT a_id, b_id FROM stg " +
      "ON CONFLICT (a_id, b_id) DO NOTHING")
    // identifier quoting flows through every column position
    val quoted = JdbcSink.upsertSql("t", "s", Seq("id", "order"), Seq("id"),
      c => "\"" + c + "\"")
    assert(quoted ==
      "INSERT INTO t (\"id\", \"order\") SELECT \"id\", \"order\" FROM s " +
      "ON CONFLICT (\"id\") DO UPDATE SET \"order\" = EXCLUDED.\"order\"")
  }

  test("CLI --pk and --dms parsing") {
    val a = Main.parse(Seq("anonymize", "--dms",
      "--pk", "orders=o_orderkey;lineitem=l_orderkey,l_linenumber"))
    assert(a.dms)
    assert(a.pks == Map("orders" -> Seq("o_orderkey"),
      "lineitem" -> Seq("l_orderkey", "l_linenumber")))
  }

  test("ngram jaccard df-cap: hot shingles dropped, rare pairs survive") {
    val hot = "common common common" // one repeated shingle everywhere
    val df = Seq((1L, s"$hot alpha beta gamma delta"),
                 (2L, s"$hot alpha beta gamma delta"),
                 (3L, s"$hot x y z w")).toDF("id", "t")
    val uncapped = graft.operators.Dedup
      .ngramJaccardPairs(df, "id", "t", n = 2, threshold = 0.1)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val capped = graft.operators.Dedup
      .ngramJaccardPairs(df, "id", "t", n = 2, threshold = 0.1,
        maxShingleDocFreq = 2)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(uncapped.contains((1L, 2L)) && uncapped.contains((1L, 3L)))
    assert(capped.contains((1L, 2L)))      // rare shared shingles remain
    assert(!capped.contains((1L, 3L)))     // only hot shingles linked 1-3
  }

  test("CLI arg parsing incl. modes and lists") {
    val a = Main.parse(Seq("anonymize",
      "--input-dir", "/in", "--output-dir", "/out",
      "--db-name", "d", "--schema-name", "s",
      "--included-tables", "x,y", "--excluded-tables", "y",
      "--mode", "date-aware", "--start-date", "20240101",
      "--parallelism", "4"))
    assert(a.inputDir == "/in" && a.dbName == "d")
    assert(a.mode == DmsFiles.DateAware(Some("20240101"), None))
    assert(Main.resolveTables(a) == Seq("x"))
    intercept[IllegalArgumentException](Main.parse(Seq("--nope", "v")))
    intercept[IllegalArgumentException](
      Main.parse(Seq("--mode", "bogus")))
  }
}
