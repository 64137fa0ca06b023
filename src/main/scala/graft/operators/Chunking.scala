package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.Bridge

/** Overlapping token-window chunking — the RAG / context-window prep
  * operator: split each document into windows of `windowTokens`
  * whitespace tokens advancing by `strideTokens`, so consecutive
  * chunks share `windowTokens - strideTokens` tokens of overlap and
  * no document content falls between windows.
  *
  * Chunk-count contract (pinned in ChunkingSpec and mirrored exactly
  * by the DuckDB oracle): a document of n tokens yields
  * `1` chunk when `n <= windowTokens`, else
  * `floor((n - windowTokens + strideTokens - 1) / strideTokens) + 1`
  * — i.e. the minimal number of stride steps whose last window
  * reaches the end; the final window may be shorter than
  * `windowTokens` but is never empty and never starts past the end.
  *
  * Scale: a pure per-row projection (split + one posexplode) — no
  * shuffle, no state, embarrassingly parallel; output size is
  * input size x (window/stride) overlap factor, which the caller
  * chose. Chunk text is re-joined with single spaces (the tokenizer
  * downstream re-splits anyway), so original inter-token whitespace
  * is NOT preserved — that is the documented lossy step, identical
  * on the oracle side.
  */
object Chunking {

  /** Explode `df` into (idCol, chunk_idx, chunk, n_chunk_tokens).
    * `chunk_idx` is 0-based and dense per document. */
  def tokenWindows(df: DataFrame, idCol: String, textCol: Column,
                   windowTokens: Int, strideTokens: Int): DataFrame = {
    require(windowTokens > 0, "windowTokens must be positive")
    require(strideTokens > 0 && strideTokens <= windowTokens,
      "strideTokens must be in [1, windowTokens]")
    val toks = split(trim(textCol), "\\s+")
    val n = size(toks)
    val w = lit(windowTokens)
    val s = lit(strideTokens)
    // minimal steps covering the tail; operands stay far below 2^53,
    // so floor(a / b) over doubles is the exact integer quotient on
    // both engines (the oracle uses DuckDB's native // instead)
    val nChunks = when(n <= w, lit(1))
      .otherwise(floor((n - w + s - lit(1)) / s) + lit(1))
      .cast("int")
    df.select(col(idCol), toks.as("__toks"), n.as("__n"), nChunks.as("__nc"))
      .select(col(idCol),
        posexplode(sequence(lit(0), col("__nc") - 1)).as(Seq("chunk_idx", "__i")),
        col("__toks"), col("__n"))
      .select(col(idCol), col("chunk_idx"),
        array_join(slice(col("__toks"), col("chunk_idx") * s + 1, w), " ")
          .as("chunk"),
        least(w, col("__n") - col("chunk_idx") * s).cast("int")
          .as("n_chunk_tokens"))
  }

  /** Content-defined chunking (rsync/FastCDC family): chunk boundaries
    * fall where a rolling hash of the trailing `width` code points is
    * ≡ 0 mod `divisor` (expected chunk length ≈ `divisor` code
    * points), so identical content regions produce identical chunks
    * even when shifted by unrelated edits upstream — the property
    * fixed-stride windows lack, and the basis of storage-level and
    * shifted-copy dedup.
    *
    * Plan shape: cut positions come from one codegen'd rolling-hash
    * pass ([[graft.functions.ContentCutsExpr]]); the (start, end]
    * segments are derived ARRAY-side (indexed `transform` over the
    * cut list — the previous cut is the start, no window function) and
    * exploded. Zero exchanges end to end: at 100 TB this is a pure
    * map over the scan, embarrassingly parallel.
    *
    * Emits (idCol, chunk_idx, chunk, n_chunk_chars); empty documents
    * yield no rows (there is no content to cut).
    */
  def contentDefined(df: DataFrame, idCol: String, textCol: Column,
                     width: Int = 16, divisor: Int = 64): DataFrame = {
    val cuts = Bridge.column(graft.functions.ContentCutsExpr(
      Bridge.expression(textCol), width, divisor))
    // seg j = (prev cut (0 for j=0), cut j]; element_at is 1-based so
    // element_at(cuts, j) IS the previous cut for 0-based index j —
    // the when() guard keeps ANSI element_at(_, 0) unevaluated
    val segs = transform(col("__cuts"), (end, j) => struct(
      when(j === 0, lit(0)).otherwise(element_at(col("__cuts"), j)).as("start"),
      end.as("end")))
    df.select(col(idCol), textCol.as("__text"), cuts.as("__cuts"))
      .select(col(idCol), col("__text"),
        posexplode(segs).as(Seq("chunk_idx", "__seg")))
      .select(col(idCol), col("chunk_idx"),
        col("__text").substr(col("__seg.start") + 1,
          col("__seg.end") - col("__seg.start")).as("chunk"),
        (col("__seg.end") - col("__seg.start")).cast("int")
          .as("n_chunk_chars"))
  }
}
