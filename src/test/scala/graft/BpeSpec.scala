package graft

import graft.functions.{Bpe, BpeStatsExpr}

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.Bridge

class BpeSpec extends SparkTestBase {
  import spark.implicits._

  // ---- training --------------------------------------------------------

  test("train: hand-computed merge sequence on a tiny corpus") {
    // {"aaab" x3, "ab" x2}:
    //   round 1: (a,a)=6 > (a,b)=5            -> merge (a,a)
    //   round 2: (a,b)=5 > (aa,a)=3           -> merge (a,b)
    //   round 3: only (aa,ab)=3               -> merge (aa,ab)
    //   round 4: no pairs                     -> stop
    val m = Bpe.train(Map("aaab" -> 3L, "ab" -> 2L), 10)
    assert(m.merges.toSeq == Seq(("a", "a"), ("a", "b"), ("aa", "ab")))
  }

  test("train: deterministic tie-break and singleton stop") {
    // "ab" and "cd" once each: all pairs count 1 -> nothing repeats,
    // zero merges (merging singletons adds nothing)
    assert(Bpe.train(Map("ab" -> 1L, "cd" -> 1L), 5).merges.isEmpty)
    // (a,b) and (c,d) both count 2 -> lexicographic tie-break picks (a,b)
    val tie = Bpe.train(Map("ab" -> 2L, "cd" -> 2L), 1)
    assert(tie.merges.toSeq == Seq(("a", "b")))
  }

  // ---- encoding --------------------------------------------------------

  test("encodeWord: merges apply to whole symbols only (boundary integrity)") {
    val m = Bpe.Model(Array(("a", "a"), ("a", "b"), ("aa", "ab")))
    assert(Bpe.encodeWord(m, "aaab").toSeq == Seq("aaab"))
    assert(Bpe.encodeWord(m, "ab").toSeq == Seq("ab"))
    // "aab": (a,a) -> [aa, b]; then (a,b) must NOT fire — the symbol
    // "aa" merely ENDS in 'a'. An unwrapped delimiter representation
    // would match the suffix and corrupt this to ["aab"].
    assert(Bpe.encodeWord(m, "aab").toSeq == Seq("aa", "b"))
    // left-to-right non-overlap: "aaa" -> [aa, a], not [a, aa]
    assert(Bpe.encodeWord(m, "aaa").toSeq == Seq("aa", "a"))
    // chars never seen at training pass through as singletons
    assert(Bpe.encodeWord(m, "xyz").toSeq == Seq("x", "y", "z"))
  }

  test("encodeWord: in-rank-order contract (and where it differs from rescan)") {
    // The documented contract applies each merge ONCE in rank order.
    // A table whose rank-0 pair only becomes adjacent after a LATER
    // merge diverges from Sennrich's rescan apply: in-order leaves
    // [ab, c], rescan would continue to [abc]. Such tables cannot be
    // produced by this trainer (a merge's symbols always predate it),
    // so the contract is safe for trained models — this pins the
    // behavior on the pathological table so the choice is explicit.
    val pathological = Bpe.Model(Array(("ab", "c"), ("a", "b")))
    assert(Bpe.encodeWord(pathological, "abc").toSeq == Seq("ab", "c"))
  }

  test("statsRow: tokens tile the text's non-whitespace chars") {
    val m = Bpe.Model(Array(("a", "a"), ("a", "b")))
    // "aaab aab" -> [aa, ab] + [aa, b]: 4 tokens, 7 chars, max 2
    val r = Bpe.statsRow(m, "aaab aab")
    assert((r.getLong(0), r.getLong(1), r.getInt(2)) == ((4L, 7L, 2)))
    // empty and whitespace-only -> all zero
    val z = Bpe.statsRow(m, "  \n ")
    assert((z.getLong(0), z.getLong(1), z.getInt(2)) == ((0L, 0L, 0)))
    // control chars are stripped, not boundaries: "ab" is ONE word
    val c = Bpe.statsRow(Bpe.Model(Array.empty), "ab")
    assert((c.getLong(0), c.getLong(1)) == ((2L, 2L)))
  }

  // ---- the built-in model ---------------------------------------------

  test("default model: full 48 merges, compresses its own seed vocabulary") {
    assert(Bpe.default.merges.length == 48)
    assert(Bpe.default.merges.forall { case (a, b) => a.nonEmpty && b.nonEmpty })
    // the seed's dominant word must compress below char level
    assert(Bpe.encodeWord(Bpe.default, "the").length <= 2)
  }

  // ---- distributed apply ----------------------------------------------

  test("trainOnSample is invariant to partition layout") {
    val docs = spark.read.parquet(sf("sf0.001") + "/documents.parquet")
    val a = Bpe.trainOnSample(docs.repartition(7), "text", 24, 64)
    val b = Bpe.trainOnSample(docs.repartition(3), "text", 24, 64)
    assert(a.merges.toSeq == b.merges.toSeq)
    assert(a.merges.nonEmpty, "real corpus sample must yield merges")
  }

  test("expression parity: BpeStatsExpr equals the driver-side kernel on real docs") {
    val docs = spark.read.parquet(sf("sf0.001") + "/documents.parquet")
      .select(col("doc_id"), col("text")).limit(50)
    val viaExpr = docs.select(col("doc_id"),
        Bridge.column(BpeStatsExpr(Bridge.expression(col("text")), Bpe.default))
          .as("st"))
      .select(col("doc_id"), col("st.n_tokens"), col("st.sum_chars"),
        col("st.max_chars"))
      .as[(Long, Long, Long, Int)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    docs.as[(Long, String)].collect().foreach { case (id, text) =>
      val r = Bpe.statsRow(Bpe.default, text)
      assert(viaExpr(id) == ((r.getLong(0), r.getLong(1), r.getInt(2))),
        s"expression diverged from kernel at doc $id")
    }
  }
  test("Model equality is structural (Catalyst canonicalization contract)") {
    val a = Bpe.Model(Array(("a", "b"), ("ab", "c")))
    val b = Bpe.Model(Array(("a", "b"), ("ab", "c")))
    assert(a == b && a.hashCode == b.hashCode)
    assert(a != Bpe.Model(Array(("a", "b"))))
    // expressions embedding structurally equal models are semantically
    // equal => subexpression elimination / exchange reuse can fire
    // (plain Literal children: a Column-derived child wraps an Origin
    // with stack traces and never compares equal, masking the model)
    import org.apache.spark.sql.catalyst.expressions.Literal
    val e1 = BpeStatsExpr(Literal("x"), a)
    val e2 = BpeStatsExpr(Literal("x"), b)
    assert(e1.semanticEquals(e2))
    assert(!e1.semanticEquals(BpeStatsExpr(Literal("x"),
      Bpe.Model(Array(("a", "c"))))))
  }

  test("vertical tab separates words; other controls are stripped in-word") {
    // \u000B is whitespace in Java's \s but NOT in RE2's — the oracle
    // spells the class explicitly, and this pins the kernel side
    assert(Bpe.pretokenize("a\u000bb").toSeq == Seq("a", "b"))
    assert(Bpe.pretokenize("a\u0001b").toSeq == Seq("ab"))
    assert(Bpe.pretokenize("a \u0001 b").toSeq == Seq("a", "b"))
    assert(Bpe.pretokenize("\u000b\u000bx\u000b").toSeq == Seq("x"))
    assert(Bpe.pretokenize("  padded  ").toSeq == Seq("padded"))
  }
}
