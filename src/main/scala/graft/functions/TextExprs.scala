package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodegenFallback, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Catalyst expressions for the text-analysis kernels ([[TextKernels]]).
  * Same design as [[FakeExpr]]: `defineCodeGen` emits a direct static
  * call, keeping per-document hashing inside whole-stage codegen — these
  * run once per document over the entire corpus, so they ARE the hot
  * path of a 100 TB dedup.
  */
case class MinHashExpr(child: Expression, shingleWidth: Int, numHashes: Int,
                       seed: Long) extends UnaryExpression
    with org.apache.spark.sql.graftbridge.DeclaredInputTypes {
  require(shingleWidth > 0,
    s"shingle width must be positive, got $shingleWidth")
  require(numHashes > 0, s"numHashes must be positive, got $numHashes")
  override def declaredInputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "minhash"
  override def nullSafeEval(input: Any): Any =
    TextKernels.minHash(input.asInstanceOf[UTF8String], shingleWidth, numHashes, seed)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.TextKernels.minHash($c, $shingleWidth, $numHashes, ${seed}L)")
  override protected def withNewChildInternal(newChild: Expression): MinHashExpr =
    copy(child = newChild)
}

case class SimHashExpr(child: Expression, seed: Long) extends UnaryExpression
    with org.apache.spark.sql.graftbridge.DeclaredInputTypes {
  override def declaredInputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "simhash"
  override def nullSafeEval(input: Any): Any =
    TextKernels.simHash(input.asInstanceOf[UTF8String], seed)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextKernels.simHash($c, ${seed}L)")
  override protected def withNewChildInternal(newChild: Expression): SimHashExpr =
    copy(child = newChild)
}

case class BpeTokenCountExpr(child: Expression) extends UnaryExpression
    with org.apache.spark.sql.graftbridge.DeclaredInputTypes {
  override def declaredInputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = IntegerType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "bpe_token_count"
  override def nullSafeEval(input: Any): Any =
    TextKernels.bpeTokenCount(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextKernels.bpeTokenCount($c)")
  override protected def withNewChildInternal(newChild: Expression): BpeTokenCountExpr =
    copy(child = newChild)
}

case class NormalizeUnicodeExpr(child: Expression) extends UnaryExpression
    with org.apache.spark.sql.graftbridge.DeclaredInputTypes {
  override def declaredInputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "normalize_text"
  override def nullSafeEval(input: Any): Any =
    TextKernels.normalizeUnicode(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextKernels.normalizeUnicode($c)")
  override protected def withNewChildInternal(newChild: Expression): NormalizeUnicodeExpr =
    copy(child = newChild)
}

case class LangIdExpr(child: Expression) extends UnaryExpression
    with org.apache.spark.sql.graftbridge.DeclaredInputTypes {
  override def declaredInputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "lang_id"
  override def nullSafeEval(input: Any): Any =
    TextKernels.langId(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextKernels.langId($c)")
  override protected def withNewChildInternal(newChild: Expression): LangIdExpr =
    copy(child = newChild)
}

/** Fraction of positions where two equal-length minhash signatures agree
  * — the unbiased Jaccard estimate. Codegen'd (a zip_with/filter/size
  * chain interprets its lambdas per element). */
case class SigAgreementExpr(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression
    with org.apache.spark.sql.graftbridge.DeclaredInputTypes {
  override def declaredInputTypes: Seq[DataType] =
    Seq(ArrayType(LongType), ArrayType(LongType))
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "sig_agreement"
  override def nullSafeEval(a: Any, b: Any): Any =
    TextKernels.sigAgreement(
      a.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData],
      b.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.TextKernels.sigAgreement($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}

/** DuckDB-pinned Jaro similarity (TextKernels.jaroSim): the standard
  * name-comparator primitive, codegen'd so a blocked ER pair join
  * evaluates it inside whole-stage codegen like `levenshtein`. */
case class JaroSimExpr(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression
    with org.apache.spark.sql.graftbridge.DeclaredInputTypes {
  override def declaredInputTypes: Seq[DataType] = Seq(StringType, StringType)
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "jaro_sim"
  override def nullSafeEval(a: Any, b: Any): Any =
    TextKernels.jaroSim(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.TextKernels.jaroSim($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}

/** DuckDB-pinned TRUE Damerau–Levenshtein distance
  * (TextKernels.damerauLevenshtein): the transposition-aware edit
  * distance — a swapped adjacent pair costs 1, where plain
  * levenshtein charges 2. Exact integer, so band decisions replay in
  * the oracle with no float contract. */
case class DamerauLevenshteinExpr(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression
    with org.apache.spark.sql.graftbridge.DeclaredInputTypes {
  override def declaredInputTypes: Seq[DataType] = Seq(StringType, StringType)
  override def dataType: DataType = IntegerType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "damerau_levenshtein"
  override def nullSafeEval(a: Any, b: Any): Any =
    TextKernels.damerauLevenshtein(a.asInstanceOf[UTF8String],
      b.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.TextKernels.damerauLevenshtein($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}

/** DuckDB-pinned Jaro–Winkler similarity (TextKernels.jaroWinklerSim)
  * — Winkler's 0.1-weighted prefix boost above jaro 0.7, the
  * comparator his m/u weight calibration was built around. */
case class JaroWinklerExpr(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression
    with org.apache.spark.sql.graftbridge.DeclaredInputTypes {
  override def declaredInputTypes: Seq[DataType] = Seq(StringType, StringType)
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "jaro_winkler_sim"
  override def nullSafeEval(a: Any, b: Any): Any =
    TextKernels.jaroWinklerSim(a.asInstanceOf[UTF8String],
      b.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.TextKernels.jaroWinklerSim($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}

/** One-pass [alphaChars, punctChars, nTokens, stopwordHits] — see
  * TextKernels.qualityStats. Referenced several times inside the quality
  * projection; whole-stage codegen's subexpression elimination evaluates
  * it once per row. */
case class QualityStatsExpr(child: Expression) extends UnaryExpression
    with org.apache.spark.sql.graftbridge.DeclaredInputTypes {
  override def declaredInputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "quality_stats"
  override def nullSafeEval(input: Any): Any =
    TextKernels.qualityStats(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextKernels.qualityStats($c)")
  override protected def withNewChildInternal(newChild: Expression): QualityStatsExpr =
    copy(child = newChild)
}

/** [nTokens, sumScaledLogProb] under a plan-embedded unigram
  * vocabulary (token -> floor(1e6*ln(p)+0.5)); OOV tokens take the
  * floor value. The map travels as a codegen reference object — no
  * join, no shuffle: LM scoring is a projection. */
case class UnigramScoreExpr(child: Expression,
                            vocab: Map[String, Long], oovScaled: Long)
    extends UnaryExpression
    with org.apache.spark.sql.graftbridge.DeclaredInputTypes {
  override def declaredInputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "unigram_score"

  @transient private lazy val jmap: java.util.HashMap[String, java.lang.Long] = {
    val m = new java.util.HashMap[String, java.lang.Long](vocab.size * 2)
    vocab.foreach { case (k, v) => m.put(k, java.lang.Long.valueOf(v)) }
    m
  }
  override def nullSafeEval(input: Any): Any =
    TextKernels.unigramScore(input.asInstanceOf[UTF8String], jmap, oovScaled)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // raw type: janino (the codegen compiler) has no generics support
    val mapRef = ctx.addReferenceObj("unigramVocab", jmap, "java.util.HashMap")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.TextKernels.unigramScore($c, $mapRef, ${oovScaled}L)")
  }
  override protected def withNewChildInternal(newChild: Expression): UnigramScoreExpr =
    copy(child = newChild)
}

/** Distinct 64-bit word-shingle hashes (sorted array<long>) — the
  * shingle-set representation for the exact-jaccard tier; per-doc
  * dedupe inside the kernel saves the corpus-wide distinct exchange. */
case class ShingleHashesExpr(child: Expression, shingleWidth: Int)
    extends UnaryExpression
    with org.apache.spark.sql.graftbridge.DeclaredInputTypes {
  require(shingleWidth > 0,
    s"shingle width must be positive, got $shingleWidth")
  override def declaredInputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "shingle_hashes"
  override def nullSafeEval(input: Any): Any =
    TextKernels.shingleHashes(input.asInstanceOf[UTF8String], shingleWidth)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.TextKernels.shingleHashes($c, $shingleWidth)")
  override protected def withNewChildInternal(newChild: Expression): ShingleHashesExpr =
    copy(child = newChild)
}

/** Array<int> [nTokens, nDistinctTokens, nBigrams, maxBigramCount] from
  * TextKernels.repetitionStats — raw integers behind the repetition
  * ratios; subexpression elimination evaluates it once per row. */
case class RepetitionStatsExpr(child: Expression) extends UnaryExpression
    with org.apache.spark.sql.graftbridge.DeclaredInputTypes {
  override def declaredInputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "repetition_stats"
  override def nullSafeEval(input: Any): Any =
    TextKernels.repetitionStats(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextKernels.repetitionStats($c)")
  override protected def withNewChildInternal(newChild: Expression): RepetitionStatsExpr =
    copy(child = newChild)
}

/** Holder giving a Spark sketch BloomFilter a compact plan rendering
  * (the raw filter prints nothing useful in explain output). Reference
  * equality is correct here: two independently-built filters are never
  * interchangeable plan-wise. */
final class BloomRef(val bloom: org.apache.spark.util.sketch.BloomFilter,
                     val label: String) extends Serializable {
  override def toString: String = s"BloomRef($label)"
}

/** might-contain probe against a plan-embedded Bloom filter — the
  * pre-filter side of the bloom-join pattern (Dedup
  * .incrementalByFingerprintBloom). Probes binary UTF-8 bytes, matching
  * how DataFrameStatFunctions.bloomFilter puts string columns. False
  * positives possible (verified downstream), false negatives never. */
case class BloomMightContainExpr(child: Expression, bloomRef: BloomRef)
    extends UnaryExpression with CodegenFallback
    with org.apache.spark.sql.graftbridge.DeclaredInputTypes {
  override def declaredInputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = BooleanType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "bloom_might_contain"
  override def nullSafeEval(input: Any): Any =
    bloomRef.bloom.mightContainBinary(
      input.asInstanceOf[UTF8String].getBytes)
  override protected def withNewChildInternal(newChild: Expression): BloomMightContainExpr =
    copy(child = newChild)
}

/** Array<long> [nTokens, nDistinctTokens, entropyScaled(1e6 nats)] from
  * TextKernels.diversityStats — order-free integer entropy terms. */
case class DiversityStatsExpr(child: Expression) extends UnaryExpression
    with org.apache.spark.sql.graftbridge.DeclaredInputTypes {
  override def declaredInputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "diversity_stats"
  override def nullSafeEval(input: Any): Any =
    TextKernels.diversityStats(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextKernels.diversityStats($c)")
  override protected def withNewChildInternal(newChild: Expression): DiversityStatsExpr =
    copy(child = newChild)
}

case class RollingFingerprintExpr(child: Expression) extends UnaryExpression
    with org.apache.spark.sql.graftbridge.DeclaredInputTypes {
  override def declaredInputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "rolling_fingerprint"
  override def nullSafeEval(input: Any): Any =
    TextKernels.rollingFingerprint(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextKernels.rollingFingerprint($c)")
  override protected def withNewChildInternal(newChild: Expression): RollingFingerprintExpr =
    copy(child = newChild)
}

/** Trained-BPE tokenization stats ([[Bpe]]): string ->
  * struct(n_tokens, sum_chars, max_chars) under the model's merge
  * table. The model ships with the plan as a codegen reference object
  * — one tokenizer instance per generated class, no executor-side
  * registry or per-row setup. */
case class BpeStatsExpr(child: Expression, model: Bpe.Model)
    extends UnaryExpression
    with org.apache.spark.sql.graftbridge.DeclaredInputTypes {
  override def declaredInputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = StructType(Seq(
    StructField("n_tokens", LongType), StructField("sum_chars", LongType),
    StructField("max_chars", IntegerType)))
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "bpe_stats"
  override def nullSafeEval(input: Any): Any =
    Bpe.statsRow(model, input.asInstanceOf[UTF8String].toString)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val mRef = ctx.addReferenceObj("bpeModel", model, "Object")
    defineCodeGen(ctx, ev, c => s"graft.functions.Bpe.statsRowUtf8($mRef, $c)")
  }
  override protected def withNewChildInternal(newChild: Expression): BpeStatsExpr =
    copy(child = newChild)
}

/** Content-defined chunk cut positions ([[TextKernels.contentCuts]]):
  * one rolling-hash pass per document inside whole-stage codegen —
  * chunking never leaves the scan stage, so the whole operator is a
  * shuffle-free projection. */
case class ContentCutsExpr(child: Expression, width: Int, divisor: Int)
    extends UnaryExpression
    with org.apache.spark.sql.graftbridge.DeclaredInputTypes {
  require(width > 0, s"window width must be positive, got $width")
  require(divisor > 1, s"divisor must exceed 1, got $divisor")
  override def declaredInputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "content_cuts"
  override def nullSafeEval(input: Any): Any =
    TextKernels.contentCuts(input.asInstanceOf[UTF8String], width, divisor)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.TextKernels.contentCuts($c, $width, $divisor)")
  override protected def withNewChildInternal(newChild: Expression): ContentCutsExpr =
    copy(child = newChild)
}
