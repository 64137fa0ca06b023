package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.Bridge

import graft.fakegen.FakeGen

/** Column-level text-analysis API for the training-data pipeline.
  *
  * Everything here that CAN be expressed in portable built-ins IS
  * (token counts, quality ratios, md5 fingerprints) — those stay
  * SQL-oracle-checkable and fully codegen'd. The hash-family operators
  * (minhash/simhash/rolling fingerprint/language-ID) are custom
  * codegen'd expressions over [[TextKernels]].
  */
object text {

  /** Whitespace token count; empty/blank => 0. Matches the oracle SQL
    * `CASE WHEN length(trim(x))=0 THEN 0 ELSE len(regexp_split_to_array(
    * trim(x),'\s+')) END`. */
  def tokenCount(c: Column): Column =
    when(length(trim(c)) === 0, lit(0))
      .otherwise(size(split(trim(c), "\\s+")))

  /** BPE-style pre-token count (letter runs / digit runs / symbol runs)
    * — the LLM-budgeting length signal; see TextKernels.bpeTokenCount. */
  def bpeTokenCount(c: Column): Column =
    Bridge.column(BpeTokenCountExpr(Bridge.expression(c.cast("string"))))

  /** One-pass [alpha, punct, nTokens, stopHits] — a single codegen'd
    * scan replacing four regex passes + an interpreted higher-order
    * filter (HOF lambdas evaluate per ELEMENT outside codegen).
    * Repeated references collapse via codegen subexpression
    * elimination. */
  private def qstats(c: Column): Column =
    Bridge.column(QualityStatsExpr(Bridge.expression(c.cast("string"))))

  /** Share of alphabetic characters. */
  def alphaRatio(c: Column): Column =
    when(length(c) === 0, lit(0.0))
      .otherwise(element_at(qstats(c), 1).cast("double") / length(c))

  /** Share of punctuation characters. */
  def punctRatio(c: Column): Column =
    when(length(c) === 0, lit(0.0))
      .otherwise(element_at(qstats(c), 2).cast("double") / length(c))

  /** Share of tokens that are common English stopwords — a standard
    * quality signal (natural prose has ~0.3-0.5; keyword soup ~0). */
  def stopwordRatio(c: Column): Column =
    when(length(trim(c)) === 0, lit(0.0))
      .otherwise(element_at(qstats(c), 4).cast("double") / element_at(qstats(c), 3))

  /** Composite document-quality score in [0,1]: rewards alphabetic
    * content, prose-like stopword share, reasonable length; penalizes
    * punctuation soup. Pure per-row double math => bit-identical across
    * engines given the same expression shape. */
  def qualityScore(c: Column): Column = {
    val lenScore = least(tokenCount(c).cast("double") / lit(100.0), lit(1.0))
    round(
      lit(0.35) * alphaRatio(c) +
      lit(0.25) * least(stopwordRatio(c) * 3.0, lit(1.0)) +
      lit(0.25) * lenScore +
      lit(0.15) * (lit(1.0) - least(punctRatio(c) * 5.0, lit(1.0))), 6)
  }

  /** One-pass [nTokens, nDistinct, nBigrams, maxBigramCount] over the
    * normalized token stream (see TextKernels.repetitionStats). */
  def repetitionStats(c: Column): Column =
    Bridge.column(RepetitionStatsExpr(Bridge.expression(c.cast("string"))))

  /** Gopher-style duplicate-word fraction: 1 - distinct/total tokens.
    * High values flag keyword-stuffed / looping documents. */
  def dupWordRatio(c: Column): Column = {
    val st = repetitionStats(c)
    round(when(element_at(st, 1) === 0, lit(0.0))
      .otherwise(lit(1.0) -
        element_at(st, 2).cast("double") / element_at(st, 1)), 6)
  }

  /** Fraction of word-bigrams occupied by the single most frequent
    * bigram — the "top 2-gram fraction" repetition signal. */
  def topBigramRatio(c: Column): Column = {
    val st = repetitionStats(c)
    round(when(element_at(st, 3) === 0, lit(0.0))
      .otherwise(element_at(st, 4).cast("double") / element_at(st, 3)), 6)
  }

  /** One-pass [nTokens, nDistinct, entropyScaled] lexical-diversity
    * stats (see TextKernels.diversityStats): unigram Shannon entropy as
    * order-free scaled-long nats plus the type-token-ratio inputs. */
  def diversityStats(c: Column): Column =
    Bridge.column(DiversityStatsExpr(Bridge.expression(c.cast("string"))))

  /** [nTokens, sumScaledLogProb] under a plan-embedded unigram
    * vocabulary — see Corpus.unigramScore for the full operator. */
  def unigramScore(c: Column, vocab: Map[String, Long], oovScaled: Long): Column =
    Bridge.column(UnigramScoreExpr(Bridge.expression(c.cast("string")),
      vocab, oovScaled))

  /** Normalized md5 content fingerprint — portable (md5 exists in every
    * engine), order-sensitive, exact-dedup key. */
  def fingerprintMd5(c: Column): Column =
    md5(lower(trim(regexp_replace(c, "\\s+", " "))))

  /** 64-bit rolling (Rabin-Karp) fingerprint, 16 hex chars; cheaper than
    * md5 at 100 TB scale (no digest allocation, pure codegen). */
  def rollingFingerprint(c: Column): Column =
    Bridge.column(RollingFingerprintExpr(Bridge.expression(c.cast("string"))))

  /** Distinct 64-bit word `w`-shingle hashes (sorted array<long>) —
    * the exact-jaccard set representation; see
    * TextKernels.shingleHashes for the collision bound. */
  def shingleHashes(c: Column, shingleWidth: Int = 3): Column =
    Bridge.column(ShingleHashesExpr(Bridge.expression(c.cast("string")),
      shingleWidth))

  /** MinHash signature (array<long>) over word `w`-shingles. */
  def minhash(c: Column, shingleWidth: Int = 3, numHashes: Int = 128,
              seed: Long = FakeGen.DefaultSeed): Column =
    Bridge.column(MinHashExpr(Bridge.expression(c.cast("string")),
      shingleWidth, numHashes, seed))

  /** Jaccard estimate between two minhash signatures (array<long>). */
  def sigAgreement(a: Column, b: Column): Column =
    Bridge.column(SigAgreementExpr(Bridge.expression(a), Bridge.expression(b)))

  /** 64-bit SimHash (long). */
  def simhash(c: Column, seed: Long = FakeGen.DefaultSeed): Column =
    Bridge.column(SimHashExpr(Bridge.expression(c.cast("string")), seed))

  /** Jaro similarity (double in [0,1]), bit-identical to DuckDB's
    * `jaro_similarity` — see TextKernels.jaroSim for the pinned
    * semantics (UTF-8 byte-based, either side empty ⇒ 0.0). */
  def jaroSim(a: Column, b: Column): Column =
    Bridge.column(JaroSimExpr(Bridge.expression(a.cast("string")),
      Bridge.expression(b.cast("string"))))

  /** Jaro–Winkler similarity (double in [0,1]), bit-identical to
    * DuckDB's `jaro_winkler_similarity`: prefix boost 0.1·ℓ (ℓ ≤ 4
    * bytes) applied when jaro > 0.7 — the standard ER name
    * comparator (Winkler 1990). */
  def jaroWinklerSim(a: Column, b: Column): Column =
    Bridge.column(JaroWinklerExpr(Bridge.expression(a.cast("string")),
      Bridge.expression(b.cast("string"))))

  /** True Damerau–Levenshtein distance (int), pinned to DuckDB's
    * `damerau_levenshtein` — adjacent transpositions cost 1. */
  def damerauLevenshtein(a: Column, b: Column): Column =
    Bridge.column(DamerauLevenshteinExpr(Bridge.expression(a.cast("string")),
      Bridge.expression(b.cast("string"))))

  /** Heuristic language ID: "en","de","fr","es","pt","it","nl","zh" or
    * "und". */
  def langId(c: Column): Column =
    Bridge.column(LangIdExpr(Bridge.expression(c.cast("string"))))

  /** Unicode ingest cleanup: NFC-compose, strip C0 controls + DEL,
    * collapse [ \t\n\r] runs, trim; case preserved. See
    * TextKernels.normalizeUnicode for the cross-engine contract. */
  def normalizeUnicode(c: Column): Column =
    Bridge.column(NormalizeUnicodeExpr(Bridge.expression(c.cast("string"))))
}
