package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.functions.{col, length => sqlLength, md5}

/** Real byte-pair-encoding tokenizer: deterministic training plus a
  * distributed, codegen'd apply — the token-accounting core of an LLM
  * data pipeline (`BpeTokenCountExpr` in TextKernels is the cheap
  * regex-run APPROXIMATION; this is the trained-merges real thing).
  *
  * The encoder is DEFINED as: pre-tokenize on whitespace, represent
  * each word with every symbol WRAPPED in an out-of-band delimiter
  * (US, 0x1F): `<US>c1<US><US>c2<US>...` — then apply the learned
  * merges in rank order, each as a LEFT-TO-RIGHT NON-OVERLAPPING
  * replace-all of `<US>a<US><US>b<US>` with `<US>ab<US>`. The
  * wrapping makes a pair pattern match ONLY whole adjacent symbols
  * (a bare `a<US>b` pattern could otherwise match the SUFFIX of a
  * previously-merged symbol, e.g. inside `aa<US>b`, corrupting
  * symbol integrity). That exact semantics is implementable
  * identically by `java.lang.String.replace` here and by SQL
  * `replace()` in the DuckDB oracle — so a trained model's full
  * tokenization is replayable cross-engine as a generated chain of
  * replaces, and the oracle genuinely checks the merge application,
  * not just shape. (Sennrich's reference apply instead re-scans for
  * the lowest-rank pair present each step; applying merges once in
  * rank order agrees except when a late merge re-creates an earlier
  * pair — the in-order definition is what both engines can replay
  * byte-identically, so it is the contract, and the divergence is
  * spec-pinned.)
  *
  * Scale design: training is a bounded-sample driver-side operation —
  * exactly how production pipelines train tokenizers (a tokenizer is
  * fit once on a capped sample, then applied at corpus scale); the
  * APPLY is the distributed part, a pure codegen'd projection with the
  * model embedded in the generated code via `addReferenceObj` (ships
  * with the plan, no executor-side registry or broadcast churn).
  */
object Bpe {

  /** US (unit separator): the in-word char delimiter. Out of band for
    * the printable corpus this engine processes; input chars below
    * 0x20 are stripped at pre-tokenization so a hostile document
    * cannot forge token boundaries. */
  final val Sep: Char = 31.toChar

  /** An ordered merge table; rank = position. Vocabulary is implicit
    * (all single chars plus one entry per merge).
    *
    * Deep equality over the merges array (a case class over Array
    * would compare by array IDENTITY): Catalyst canonicalization /
    * semanticEquals on an expression embedding a Model must see two
    * structurally identical models as equal, or subexpression
    * elimination and exchange reuse silently stop firing — same
    * reason [[PqTable]] implements deep equals. */
  final case class Model(merges: Array[(String, String)]) extends Serializable {
    /** The merged symbol for rank i. */
    def symbol(i: Int): String = merges(i)._1 + merges(i)._2

    override def equals(o: Any): Boolean = o match {
      case m: Model => merges.sameElements(m.merges)
      case _ => false
    }
    override def hashCode: Int =
      scala.util.hashing.MurmurHash3.seqHash(
        scala.collection.immutable.ArraySeq.unsafeWrapArray(merges))

    /** Word-level tokenization memo, the standard production-tokenizer
      * optimization: corpora are Zipf-distributed, so a small cache
      * absorbs most of the replace-chain work. Per-THREAD because one
      * plan-shipped Model instance is shared by every task of a stage
      * in an executor; bounded LRU so a high-cardinality corpus (hashes,
      * ids) cannot grow it without limit. @transient: rebuilt empty on
      * each executor after deserialization. */
    @transient private[functions] lazy val memo:
        ThreadLocal[java.util.LinkedHashMap[String, Array[String]]] =
      ThreadLocal.withInitial(() =>
        new java.util.LinkedHashMap[String, Array[String]](1024, 0.75f, true) {
          override protected def removeEldestEntry(
              e: java.util.Map.Entry[String, Array[String]]): Boolean =
            size() > 16384
        })
  }

  // ---- training --------------------------------------------------------

  /** Deterministic BPE training over a word-frequency map: repeatedly
    * merge the most frequent adjacent symbol pair (ties broken by the
    * pair's lexicographic order, so training is stable across map
    * iteration orders), up to `numMerges` or until no pair repeats. */
  def train(wordCounts: Map[String, Long], numMerges: Int): Model = {
    // words as symbol arrays
    var vocab: Vector[(Array[String], Long)] = wordCounts.toVector
      .sortBy(_._1) // deterministic processing order
      .map { case (w, c) => (w.map(_.toString).toArray, c) }
    val merges = Vector.newBuilder[(String, String)]
    var m = 0
    var done = false
    while (m < numMerges && !done) {
      val counts = scala.collection.mutable.HashMap.empty[(String, String), Long]
      vocab.foreach { case (syms, c) =>
        var i = 0
        while (i < syms.length - 1) {
          val p = (syms(i), syms(i + 1))
          counts(p) = counts.getOrElse(p, 0L) + c
          i += 1
        }
      }
      if (counts.isEmpty) done = true
      else {
        val (best, n) = counts.minBy { case ((a, b), c) => (-c, a, b) }
        if (n < 2) done = true // merging singletons adds nothing
        else {
          merges += best
          val sym = best._1 + best._2
          vocab = vocab.map { case (syms, c) =>
            val out = Array.newBuilder[String]
            var i = 0
            while (i < syms.length) {
              if (i < syms.length - 1 && syms(i) == best._1 && syms(i + 1) == best._2) {
                out += sym; i += 2
              } else { out += syms(i); i += 1 }
            }
            (out.result(), c)
          }
          m += 1
        }
      }
    }
    Model(merges.result().toArray)
  }

  /** Train from a corpus sample: words of the first `sampleDocs`
    * documents in a content-hash order (deterministic across partition
    * layouts and cluster sizes — NOT file order, which reshuffles with
    * the layout). The collect is bounded by `sampleDocs`; this is the
    * one intentionally driver-side step, per the module doc. */
  def trainOnSample(df: DataFrame, textCol: String, numMerges: Int,
                    sampleDocs: Int = 256): Model = {
    val sample = df.select(col(textCol).cast("string").as("t"))
      .where(col("t").isNotNull && sqlLength(col("t")) > 0)
      .orderBy(md5(col("t")), col("t"))
      .limit(sampleDocs)
      .collect()
    val counts = scala.collection.mutable.HashMap.empty[String, Long]
    sample.foreach { r =>
      pretokenize(r.getString(0)).foreach { w =>
        counts(w) = counts.getOrElse(w, 0L) + 1L
      }
    }
    train(counts.toMap, numMerges)
  }

  /** Whitespace pre-tokenizer. Non-whitespace control chars (incl. the
    * delimiter) are stripped so in-band bytes cannot forge token
    * boundaries; whitespace controls (\t \n \\u000B \f \r) stay — they
    * are word separators for the \s+ split (Java's \s = [ \t\n\x0B\f\r]
    * exactly). The oracle CANNOT use RE2's \s for parity — RE2's class
    * excludes \x0B — so the generated SQL spells the separator class
    * explicitly ([\x09-\x0D ]) and replays the control-strip with a
    * regexp_replace; both steps in the same order as here. That makes
    * the word boundary exact cross-engine for ANY input, not just
    * control-free corpora. */
  def pretokenize(text: String): Array[String] = {
    if (text == null) return Array.empty
    val cleaned = text.filter(c =>
      c >= ' ' || c == '\t' || c == '\n' || c == '\u000b' || c == '\f' || c == '\r')
    cleaned.split("\\s+").filter(_.nonEmpty)
  }

  /** Tokenize one word: Sep-wrapped symbol form, merges replayed in
    * rank order via String.replace (left-to-right non-overlapping —
    * the cross-engine contract; see the module doc for why symbols
    * are wrapped, not merely separated). */
  def encodeWord(model: Model, word: String): Array[String] = {
    val S = Sep.toString
    var s = S + word.toCharArray.mkString(S + S) + S
    val ms = model.merges
    var i = 0
    while (i < ms.length) {
      val (a, b) = ms(i)
      s = s.replace(S + a + S + S + b + S, S + a + b + S)
      i += 1
    }
    s.split(Sep).filter(_.nonEmpty)
  }

  /** Per-document stats of the tokenized form: (n_tokens, sum of token
    * chars, max token chars). sum_chars always equals the document's
    * non-whitespace printable char count — tokens tile words — which
    * is the model-free invariant the data-trained oracle row checks. */
  /** [[encodeWord]] through the model's per-thread word memo — the hot
    * path used by [[statsRow]]. */
  def encodeWordCached(model: Model, word: String): Array[String] = {
    val m = model.memo.get()
    val hit = m.get(word)
    if (hit != null) hit
    else {
      val toks = encodeWord(model, word)
      m.put(word, toks)
      toks
    }
  }

  def statsRow(model: Model, text: String): GenericInternalRow = {
    var n = 0L; var sum = 0L; var max = 0
    pretokenize(text).foreach { w =>
      val toks = encodeWordCached(model, w)
      n += toks.length
      var i = 0
      while (i < toks.length) {
        sum += toks(i).length
        if (toks(i).length > max) max = toks(i).length
        i += 1
      }
    }
    new GenericInternalRow(Array[Any](n, sum, max))
  }

  /** Codegen entry point: the model arrives as a plan-shipped
    * reference object (typed Object in the generated Java — Janino has
    * no use for the Scala nested type). */
  def statsRowUtf8(model: AnyRef,
                   text: org.apache.spark.unsafe.types.UTF8String): GenericInternalRow =
    statsRow(model.asInstanceOf[Model], text.toString)

  // ---- the built-in model ---------------------------------------------

  /** Fixed seed corpus for the default model (original text, written
    * for this repo): enough repeated English structure that the first
    * ~dozens of merges are linguistically meaningful (th/he/in/er...),
    * making the default model a realistic small tokenizer. */
  private val seedText: String =
    """the quick brown fox jumps over the lazy dog while the other
      |foxes watch the river run under the old stone bridge where
      |the miller and the fisher trade their morning catches and
      |the children chase the geese through the long wet grass
      |singing songs their mothers sang when the world was wider
      |and the winters colder and the summers slower than today
      |the train from the coast brings salt and silk and stories
      |of storms that swallowed ships whole and sailors who swam
      |for the shore with letters sealed in wax against the water
      |""".stripMargin

  /** The built-in model: 48 merges trained on the fixed seed corpus.
    * Deterministic at compile-level (the seed is a source literal), so
    * the oracle SQL generated from it is a stable artifact. */
  lazy val default: Model = {
    val counts = scala.collection.mutable.HashMap.empty[String, Long]
    pretokenize(seedText).foreach(w => counts(w) = counts.getOrElse(w, 0L) + 1L)
    train(counts.toMap, 48)
  }

  // ---- oracle SQL generation ------------------------------------------

  private def sqlQuote(s: String): String = "'" + s.replace("'", "''") + "'"

  /** The DuckDB expression replaying this model's tokenization of a
    * word column `w`: Sep-wrap every char, then one replace() per
    * merge in rank order (replace() is left-to-right non-overlapping
    * in both engines — the contract in the module doc). Returns the
    * wrapped token string; extract tokens with
    * `string_split(trim(<this>, chr(31)), chr(31) || chr(31))`. */
  def mergeChainSql(model: Model, wordExpr: String): String = {
    var e = "chr(31) || array_to_string(regexp_split_to_array(" +
      s"$wordExpr, ''), chr(31) || chr(31)) || chr(31)"
    model.merges.foreach { case (a, b) =>
      val from = "chr(31) || " + sqlQuote(a) + " || chr(31) || chr(31) || " +
        sqlQuote(b) + " || chr(31)"
      val to = "chr(31) || " + sqlQuote(a + b) + " || chr(31)"
      e = s"replace($e, $from, $to)"
    }
    e
  }
}
