package graft

import graft.operators.Chunking

import org.apache.spark.sql.functions._

class ChunkingSpec extends SparkTestBase {
  import spark.implicits._

  private def chunks(texts: Seq[String], w: Int, s: Int)
      : Map[Long, Seq[(Int, String, Int)]] =
    Chunking.tokenWindows(
        texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "text"),
        "id", col("text"), w, s)
      .as[(Long, Int, String, Int)].collect().toSeq
      .groupBy(_._1)
      .map { case (id, rs) =>
        id -> rs.sortBy(_._2).map(r => (r._2, r._3, r._4)) }

  test("short doc yields exactly one whole-doc chunk") {
    val out = chunks(Seq("a b c"), w = 4, s = 3)
    assert(out(0L) == Seq((0, "a b c", 3)))
  }

  test("doc of exactly window size stays one chunk; one more token adds one") {
    val out = chunks(Seq("a b c d", "a b c d e"), w = 4, s = 3)
    assert(out(0L) == Seq((0, "a b c d", 4)))
    assert(out(1L) == Seq((0, "a b c d", 4), (1, "d e", 2)))
  }

  test("consecutive chunks overlap by window - stride tokens") {
    val toks = (1 to 10).map(i => s"t$i")
    val out = chunks(Seq(toks.mkString(" ")), w = 6, s = 4)
    assert(out(0L) == Seq(
      (0, toks.slice(0, 6).mkString(" "), 6),
      (1, toks.slice(4, 10).mkString(" "), 6)))
  }

  test("stride == window gives disjoint partition-style chunks") {
    val toks = (1 to 7).map(i => s"t$i")
    val out = chunks(Seq(toks.mkString(" ")), w = 3, s = 3)
    assert(out(0L) == Seq(
      (0, "t1 t2 t3", 3), (1, "t4 t5 t6", 3), (2, "t7", 1)))
  }

  test("coverage property: last window reaches the end, none starts past it") {
    for (n <- 1 to 40; (w, s) <- Seq((8, 5), (8, 8), (5, 1), (3, 2))) {
      val toks = (1 to n).map(i => s"x$i")
      val out = chunks(Seq(toks.mkString(" ")), w, s)(0L)
      val nc = out.size
      // chunk i holds tokens [i*s, min(i*s + w, n)) — dense, in order
      out.foreach { case (i, text, m) =>
        val expect = toks.slice(i * s, math.min(i * s + w, n))
        assert(text == expect.mkString(" "), s"n=$n w=$w s=$s chunk $i")
        assert(m == expect.size)
      }
      assert(out.map(_._1) == (0 until nc), "chunk_idx must be dense")
      // the final window covers the tail and is non-empty...
      assert((nc - 1) * s + w >= n, s"tail uncovered at n=$n w=$w s=$s")
      assert((nc - 1) * s < n, s"empty final window at n=$n w=$w s=$s")
      // ...and one fewer window would leave a gap (minimality)
      assert(nc == 1 || (nc - 2) * s + w < n, s"extra window at n=$n w=$w s=$s")
    }
  }

  test("empty and whitespace-only text yield one empty chunk (parity with split)") {
    // split("", ws) -> [""] on both engines: one chunk of the empty
    // token; the oracle mirrors this rather than special-casing it
    val out = chunks(Seq("", "   "), w = 4, s = 2)
    assert(out(0L) == Seq((0, "", 1)))
    assert(out(1L) == Seq((0, "", 1)))
  }

  test("invalid window/stride arguments are rejected") {
    val df = Seq((1L, "a")).toDF("id", "text")
    intercept[IllegalArgumentException](
      Chunking.tokenWindows(df, "id", col("text"), 0, 1))
    intercept[IllegalArgumentException](
      Chunking.tokenWindows(df, "id", col("text"), 4, 0))
    intercept[IllegalArgumentException](
      Chunking.tokenWindows(df, "id", col("text"), 4, 5))
  }

  private def contentChunks(texts: Seq[String]): Map[Long, Seq[String]] =
    Chunking.contentDefined(
        texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "text"),
        "id", col("text"), width = 16, divisor = 64)
      .as[(Long, Int, String, Int)].collect().toSeq
      .groupBy(_._1).map { case (id, rs) =>
        id -> rs.sortBy(_._2).map(_._3) }
      .withDefaultValue(Seq.empty)

  private val loremish: String = (1 to 60).map(i =>
    s"word$i item${i * 7 % 13} filler${i % 5}").mkString(" ")

  test("content chunks reconstruct the document exactly, in order") {
    val out = contentChunks(Seq(loremish))
    assert(out(0L).mkString("") == loremish)
    assert(out(0L).size > 1, "fixture long enough to produce several cuts")
    assert(out(0L).forall(_.nonEmpty))
  }

  test("content chunking is shift-invariant: a prefix edit cannot move distant boundaries") {
    // boundaries depend only on the trailing 16-char window, so in the
    // shared region every window — hence every cut decision — is
    // identical; only chunks overlapping the first 15 shared chars may
    // differ. A fixed-stride splitter fails this exact test.
    val prefix = "entirely different preamble text inserted upstream "
    val out = contentChunks(Seq(loremish, prefix + loremish))
    val shared = out(0L).drop(1).toSet
    val shifted = out(1L).drop(1).toSet
    assert(shared.nonEmpty && shared.subsetOf(shifted),
      s"distant chunks moved under a prefix edit:\n${shared.diff(shifted)}")
  }

  test("content chunking: empty text yields no rows; short text one whole chunk") {
    val out = contentChunks(Seq("", "tiny"))
    assert(out(0L).isEmpty)
    assert(out(1L) == Seq("tiny"))
  }
}
