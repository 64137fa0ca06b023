package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

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
}
