package graft.functions

import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.unsafe.types.UTF8String

import graft.fakegen.FakeGen

/** Static kernels for the text-analysis / dedup expressions. Called from
  * generated code (see [[TextExprs]]), so every method takes/returns
  * Catalyst-native types and allocates as little as possible.
  *
  * These are the scale-path primitives of the training-data pipeline:
  * a 100 TB dedup run evaluates minhash/simhash once per document inside
  * whole-stage codegen, then everything downstream (banding, bucket
  * joins) is plain shuffles on small fixed-width signatures.
  */
object TextKernels {

  /** Lowercase + collapse runs of whitespace to single spaces + trim.
    * The shared normalization for fingerprints, shingles, and token
    * kernels. Whitespace = the regex `\s` class ([[isWsRegex]]), NOT
    * Character.isWhitespace (which additionally matches \x1C-\x1F and
    * Unicode spaces): every oracle replica of these kernels is written
    * with `\s` regexes, and the two classes must agree or texts
    * containing the exotic separators silently diverge from the SQL
    * contract (r4 review finding). */
  def normalize(s: String): String = {
    val sb = new java.lang.StringBuilder(s.length)
    var pendingSpace = false
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (isWsRegex(c)) { if (sb.length > 0) pendingSpace = true }
      else {
        if (pendingSpace) { sb.append(' '); pendingSpace = false }
        sb.append(Character.toLowerCase(c))
      }
      i += 1
    }
    sb.toString
  }

  /** Split on whitespace runs; no empty tokens. */
  def tokens(s: String): Array[String] = {
    val n = normalize(s)
    if (n.isEmpty) Array.empty else n.split(' ')
  }

  /** Unicode cleanup for ingest: NFC-compose, strip C0 controls + DEL
    * (except \t \n \r, which count as whitespace), collapse runs of
    * [ \t\n\r] to single spaces, trim. Case is PRESERVED (unlike
    * [[normalize]], which is the matching-key normalization — this is
    * the content-cleaning one). The whitespace class is the explicit
    * 4-char set, not `\s`: \x0B/\x0C are stripped as controls before
    * collapsing, which sidesteps the Java-vs-RE2 `\s` divergence on
    * vertical tab entirely (the Bpe.scala:144 advisor class). NFC via
    * java.text.Normalizer — both it and DuckDB's utf8proc implement
    * the same Unicode composition tables, so composed output is
    * cross-engine stable for assigned codepoints. */
  def normalizeUnicode(value: UTF8String): UTF8String = {
    val composed = java.text.Normalizer.normalize(
      value.toString, java.text.Normalizer.Form.NFC)
    val sb = new java.lang.StringBuilder(composed.length)
    var pendingSpace = false
    var i = 0
    while (i < composed.length) {
      val c = composed.charAt(i)
      if (c == ' ' || c == '\t' || c == '\n' || c == '\r') {
        if (sb.length > 0) pendingSpace = true
      } else if (c < 0x20 || c == 0x7f) {
        // stripped control: no space, no output
      } else {
        if (pendingSpace) { sb.append(' '); pendingSpace = false }
        sb.append(c)
      }
      i += 1
    }
    UTF8String.fromString(sb.toString)
  }

  /** BPE-style pre-tokenization count: runs of letters, runs of digits,
    * runs of other non-space symbols each count as one token, with a
    * leading space attaching to the following run (the GPT-2 pattern's
    * shape, without the merge table — merges only split tokens further,
    * so this is a stable lower bound and a far better length signal for
    * LLM data budgeting than whitespace counts). */
  def bpeTokenCount(value: UTF8String): Int = {
    val s = value.toString
    var count = 0
    var i = 0
    val n = s.length
    while (i < n) {
      val c = s.charAt(i)
      if (isWsRegex(c)) i += 1
      else {
        val kind =
          if (Character.isLetter(c)) 0
          else if (Character.isDigit(c)) 1
          else 2
        count += 1
        i += 1
        while (i < n && !isWsRegex(s.charAt(i)) && {
          val cc = s.charAt(i)
          val k = if (Character.isLetter(cc)) 0
                  else if (Character.isDigit(cc)) 1 else 2
          k == kind
        }) i += 1
      }
    }
    count
  }

  /** English stopword list for the quality signal (shared with the
    * column API and the DuckDB oracle SQL — keep all three in sync). */
  private[graft] val enStopwords: Seq[String] = Seq("the", "a", "an", "and",
    "of", "to", "in", "is", "it", "that", "for", "on", "with", "as", "was",
    "at", "by")
  private val enStopwordSet: java.util.HashSet[String] = {
    val s = new java.util.HashSet[String]()
    enStopwords.foreach(s.add)
    s
  }

  /** Regex-\s equivalence (NOT Character.isWhitespace, which is broader
    * in Unicode) — the quality ratios must match the `split(x, "\\s+")`
    * oracle exactly. */
  @inline private def isWsRegex(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\u000b' || c == '\f' || c == '\r'

  /** One-pass quality stats: [alphaChars, punctChars, nTokens,
    * stopwordHits] — replaces four regex passes plus an interpreted
    * higher-order filter per document (HOF lambdas evaluate per ELEMENT
    * outside codegen; measured ~5x on the quality query). Semantics are
    * pinned to the Column/SQL formulation: alpha = \p{L} chars, punct =
    * [.,;:!?], tokens = \s+ runs of the trimmed text, stopword hits
    * counted on lowercased tokens. */
  def qualityStats(value: UTF8String): ArrayData = {
    val s = value.toString
    var alpha = 0
    var punct = 0
    var i = 0
    // iterate CODEPOINTS: Spark's length() counts codepoints and \p{L}
    // matches per codepoint, so supplementary-plane letters must count
    // once, not per surrogate half
    while (i < s.length) {
      val cp = s.codePointAt(i)
      if (Character.isLetter(cp)) alpha += 1
      else if (cp == '.' || cp == ',' || cp == ';' || cp == ':' || cp == '!' || cp == '?')
        punct += 1
      i += Character.charCount(cp)
    }
    // token semantics = size(split(trim(c), "\s+")) EXACTLY: trim strips
    // SPACES only (Spark trim), and Spark's split keeps leading/trailing
    // empty segments (limit -1), so segment count = \s+ runs + 1 on a
    // nonempty trimmed string. Stopword hits only ever come from
    // non-empty segments, counted from the non-ws runs.
    var lo = 0
    var hi = s.length
    while (lo < hi && s.charAt(lo) == ' ') lo += 1
    while (hi > lo && s.charAt(hi - 1) == ' ') hi -= 1
    var nTok = 0
    var hits = 0
    if (hi > lo) {
      var wsRuns = 0
      var inWs = false
      var start = -1
      var j = lo
      while (j <= hi) {
        val atEnd = j == hi
        val ws = !atEnd && isWsRegex(s.charAt(j))
        if (ws && !inWs) { wsRuns += 1; inWs = true }
        if (!ws) inWs = false
        if (!atEnd && !ws) { if (start < 0) start = j }
        else if (start >= 0) {
          if (enStopwordSet.contains(
              s.substring(start, j).toLowerCase(java.util.Locale.ROOT)))
            hits += 1
          start = -1
        }
        j += 1
      }
      nTok = wsRuns + 1
    }
    new GenericArrayData(Array(alpha, punct, nTok, hits))
  }

  /** One-pass repetition stats over the normalized token stream:
    * `[nTokens, nDistinctTokens, nBigrams, maxBigramCount]` — the raw
    * integers behind Gopher-style repetition filters (duplicate-word
    * fraction, most-common-bigram fraction). Integers on purpose: the
    * ratios are derived in the Column layer with the exact same double
    * expression the SQL oracle uses, so only one formulation exists.
    *
    * A per-row hash map is fine here: documents are KB-sized, and this
    * runs as a projection inside whole-stage codegen — no shuffle, no
    * state across rows, trivially parallel at 100 TB.
    */
  def repetitionStats(value: UTF8String): ArrayData = {
    val toks = tokens(value.toString)
    val n = toks.length
    val distinct = new java.util.HashSet[String]()
    var i = 0
    while (i < n) { distinct.add(toks(i)); i += 1 }
    val nBigrams = math.max(n - 1, 0)
    var maxBg = 0
    if (nBigrams > 0) {
      val counts = new java.util.HashMap[String, Int]()
      var j = 0
      while (j < nBigrams) {
        val bg = toks(j) + " " + toks(j + 1)
        val c = counts.merge(bg, 1, (a, b) => a + b)
        if (c > maxBg) maxBg = c
        j += 1
      }
    }
    new GenericArrayData(Array(n, distinct.size, nBigrams, maxBg))
  }

  /** One-pass lexical-diversity stats: `[nTokens, nDistinctTokens,
    * entropyScaled]` where entropyScaled is the unigram Shannon entropy
    * in nats, scaled to an exact long PER TERM: each distinct word
    * contributes `-floor(1e6 * (p * ln(p)) + 0.5)` with p = count/n.
    * Summing the per-term integers (not the doubles) makes the total
    * independent of hash-map iteration order. Cross-engine caveat:
    * unlike sqrt, `ln` is not IEEE-correctly-rounded, so another
    * engine's libm may differ by 1 ulp on a tie-adjacent term and flip
    * one floored unit — replication is near-certain but, as with pow
    * in Sampling.temperatureMix, not guaranteed bit-for-bit (the
    * driver oracle has matched every round; the residual risk is a
    * term landing within 1 ulp of a .5 boundary). Low entropy +
    * low type-token ratio flag TEMPLATED text that string-level dedup
    * misses (DataComp/Gopher-style diversity signals). */
  def diversityStats(value: UTF8String): ArrayData = {
    val toks = tokens(value.toString)
    val n = toks.length
    if (n == 0) return new GenericArrayData(Array(0L, 0L, 0L))
    val counts = new java.util.HashMap[String, Int]()
    var i = 0
    while (i < n) { counts.merge(toks(i), 1, (a, b) => a + b); i += 1 }
    var entropy = 0L
    val it = counts.values().iterator()
    while (it.hasNext) {
      val p = it.next().toDouble / n
      entropy -= math.floor(1e6 * (p * math.log(p)) + 0.5).toLong
    }
    new GenericArrayData(Array(n.toLong, counts.size.toLong, entropy))
  }

  /** Unigram-LM document score: `[nTokens, sumScaledLogProb]` where
    * each token contributes its vocabulary log-probability scaled to
    * an exact long (floor(1e6*ln(p)+0.5) — integer sums are
    * order-independent and engine-exact, the repo's scaled-long
    * aggregate trick applied to floats-from-logs). Tokens outside the
    * vocabulary contribute the precomputed OOV floor. One pass, no
    * allocation beyond the token array; the vocabulary rides the plan
    * as a reference object (driver-bounded: top-K tokens). */
  def unigramScore(value: UTF8String,
                   vocab: java.util.HashMap[String, java.lang.Long],
                   oovScaled: Long): ArrayData = {
    val toks = tokens(value.toString)
    var sum = 0L
    var i = 0
    while (i < toks.length) {
      val lp = vocab.get(toks(i))
      sum += (if (lp == null) oovScaled else lp.longValue())
      i += 1
    }
    new GenericArrayData(Array(toks.length.toLong, sum))
  }

  // ---- rolling fingerprint ---------------------------------------------

  /** 64-bit Rabin-Karp-style rolling fingerprint of the normalized text,
    * rendered as 16 hex chars. Cheaper than md5 (no digest allocation)
    * and order-sensitive, unlike a bag-of-words hash. */
  def rollingFingerprint(value: UTF8String): UTF8String = {
    val s = normalize(value.toString)
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < s.length) {
      h = h * 0x100000001b3L + s.charAt(i)
      i += 1
    }
    UTF8String.fromString(java.lang.Long.toHexString(FakeGen.mix64(h)))
  }

  // ---- minhash ----------------------------------------------------------

  /** Hash one word w-shingle (w consecutive tokens) starting at `from`. */
  private def shingleHash(toks: Array[String], from: Int, w: Int): Long = {
    var h = 0xcbf29ce484222325L
    var j = from
    while (j < from + w) {
      val t = toks(j)
      var k = 0
      while (k < t.length) { h = (h ^ t.charAt(k)) * 0x100000001b3L; k += 1 }
      h = (h ^ ' ') * 0x100000001b3L
      j += 1
    }
    h
  }

  /** Per-(seed, numHashes) permutation constants, `mix64(seed + p*phi)`
    * — invariant across rows, so computed once per executor instead of
    * once per shingle per permutation (the kernel's inner loop; caching
    * measured ~2x on signature computation, bit-identical output). Same
    * static-cache pattern as the hyperplane sign table. */
  private val permCache =
    new java.util.concurrent.ConcurrentHashMap[(Long, Int), Array[Long]]()
  private def permConstants(seed: Long, numHashes: Int): Array[Long] =
    permCache.computeIfAbsent((seed, numHashes), { case (s, n) =>
      Array.tabulate(n)(p => FakeGen.mix64(s + p * 0x9e3779b97f4a7c15L))
    })

  /** DISTINCT 64-bit hashes of the word `w`-shingles — the shingle-set
    * representation the exact-jaccard tier joins on. Deduped per doc
    * INSIDE the kernel, so the consumer needs no corpus-wide distinct
    * exchange, and set sizes are `size(...)` projections instead of an
    * aggregation. Same short-doc rule as [[minHash]] (docs with < w
    * tokens hash their whole token array as one shingle). Two docs
    * share a hash iff they share the shingle, up to 64-bit collisions
    * (~n_shingles^2 / 2^64 spurious pairs corpus-wide — at 10^12
    * shingles that is ~10^-5 of pairs, each perturbing one jaccard
    * count by 1; negligible against a 0.5 threshold). Sorted ascending
    * so output is deterministic. */
  def shingleHashes(value: UTF8String, w: Int): ArrayData = {
    val toks = tokens(value.toString)
    val nSh = math.max(toks.length - w + 1, if (toks.length > 0) 1 else 0)
    val set = new java.util.HashSet[java.lang.Long](math.max(nSh * 2, 16))
    var i = 0
    while (i < nSh) {
      set.add(FakeGen.mix64(shingleHash(toks, i, math.min(w, toks.length - i))))
      i += 1
    }
    val out = new Array[Long](set.size)
    val it = set.iterator()
    var j = 0
    while (it.hasNext) { out(j) = it.next(); j += 1 }
    java.util.Arrays.sort(out)
    new GenericArrayData(out)
  }

  /** MinHash signature: `numHashes` permutations approximated by
    * `mix64(shingleHash ^ perm-constant)`; entry i is the minimum over
    * all shingles. Docs with < w tokens hash their whole token array as
    * one shingle so short docs still get a signature. */
  def minHash(value: UTF8String, w: Int, numHashes: Int, seed: Long): ArrayData = {
    val toks = tokens(value.toString)
    val nSh = math.max(toks.length - w + 1, if (toks.length > 0) 1 else 0)
    val perms = permConstants(seed, numHashes)
    val sig = new Array[Long](numHashes)
    java.util.Arrays.fill(sig, Long.MaxValue)
    var i = 0
    while (i < nSh) {
      val h = shingleHash(toks, i, math.min(w, toks.length - i))
      var p = 0
      while (p < numHashes) {
        val v = FakeGen.mix64(h ^ perms(p))
        if (v < sig(p)) sig(p) = v
        p += 1
      }
      i += 1
    }
    new GenericArrayData(sig)
  }

  /** Fraction of agreeing positions between two signatures. */
  def sigAgreement(a: org.apache.spark.sql.catalyst.util.ArrayData,
                   b: org.apache.spark.sql.catalyst.util.ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    if (n == 0) return 0.0
    var eq = 0
    var i = 0
    while (i < n) { if (a.getLong(i) == b.getLong(i)) eq += 1; i += 1 }
    eq.toDouble / n
  }

  // ---- simhash ----------------------------------------------------------

  /** 64-bit SimHash over token hashes: near-identical documents differ in
    * few bits (hamming distance), enabling pigeonhole banding. */
  def simHash(value: UTF8String, seed: Long): Long = {
    val toks = tokens(value.toString)
    val counts = new Array[Int](64)
    var i = 0
    while (i < toks.length) {
      val h = FakeGen.mix64(FakeGen.hash64(toks(i)) ^ seed)
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) counts(b) += 1 else counts(b) -= 1
        b += 1
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) { if (counts(b) > 0) out |= (1L << b); b += 1 }
    out
  }

  // ---- language id ------------------------------------------------------

  private val langNames = Array("en", "de", "fr", "es", "pt", "it", "nl")
  private val rawLists: Array[String] = Array(
      /* en */ "the and of to in is you that it for was on are with as his they at be this have from or had by but not what all were when we there can an your which their said if do will each about how up out them then she many some so these would other into has more her two like him see time could no make than first been its who now people my made over did down only way find use may water long little very after words called just where most know get through back much before go good new write our used me man too any day same right look think also around another came come work three word must because does part even place well such here take why things help put years different away again off went old number great tell men say small every found still between name should home big give air line set own under read last never us left end along while might next sound below saw something thought both few those always looked show large often together asked house don't world going want school important until form food keep children feet land side without boy once animals life enough took sometimes four head above kind began almost live page got earth need far hand high year mother light parts country father let night following picture being study second eyes soon times story boys since white days ever paper hard near sentence better best across during today others however sure means knew it's try told young miles sun ways thing whole hear example heard several change answer room against top turned three learn point city play toward five using himself usually",
      /* de */ "der die das und ist nicht mit ein eine zu auf von den dem des sich auch als aber nach bei um noch wie wenn nur war sind oder aus so wir ich sie es an im für man hat dass war sein ihr ihre mein dein kein mehr sehr schon dann doch wird werden wurde kann könnte muss haben hatte gegen zwischen durch über unter vor hinter neben seit ohne",
      /* fr */ "le la les et est un une des que pour dans ce cette qui ne pas au aux avec sur son ses leur mais ou où donc car ni votre notre vous nous ils elles je tu il elle on du de en y a ont été être avoir fait faire plus moins très bien tout tous toute toutes comme si alors quand même aussi autre après avant chez entre jusque pendant",
      /* es */ "el la los las y es un una de que por para en no se su con como más pero sus le ya o fue este ha sí porque esta son entre cuando muy sin sobre también me hasta hay donde quien desde todo nos durante todos uno les ni contra otros ese eso ante ellos e esto mí antes algunos qué unos yo otro otras otra él tanto esa estos mucho quienes nada muchos cual poco ella estar estas algunas algo nosotros",
      /* pt */ "o a os as e é um uma de que por para em não se sua com como mas foi ao das dos nas nos pelo pela até isso ela ele eles elas nós eu tu você vocês seu seus suas minha meu teu tua já mais muito bem onde quando porque também sem sobre entre depois antes agora então",
      /* it */ "il lo la i gli le e è un uno una di che per in non si con come ma al del della dei delle nel nella più anche o se questo questa questi queste quello quella io tu lui lei noi voi loro mio tuo suo nostro vostro già molto bene dove quando perché anche senza sopra sotto dopo prima adesso allora",
      /* nl */ "de het een en is niet met van voor in op te dat die dit zijn haar hun ons onze je jij u wij ze zij ik hij maar of als dan nog wel geen meer zeer al naar bij uit over onder tussen door zonder tegen sinds"
    )
  /** Raw per-language stopword lists, in [[langNames]] order — exposed
    * so the driver oracle can be GENERATED from the same data the kernel
    * uses (one source of truth for the SQL replica of [[langId]]). */
  private[graft] def stopwordSource: Seq[(String, Seq[String])] =
    langNames.toSeq.zip(rawLists.toSeq.map(_.split(' ').toSeq))
  private val stopwordSets: Array[java.util.HashSet[String]] =
    rawLists.map { l =>
      val s = new java.util.HashSet[String]()
      l.split(' ').foreach(s.add)
      s
    }

  /** Heuristic language ID: CJK codepoint share first (=> "zh"), then
    * argmax of per-language stopword hit ratios; "und" when nothing
    * matches. Deterministic; ties break by the fixed language order. */
  def langId(value: UTF8String): UTF8String = {
    val s = value.toString
    var cjk = 0
    var letters = 0
    var i = 0
    while (i < s.length) {
      val c = s.codePointAt(i)
      if (Character.isLetter(c)) {
        letters += 1
        val block = Character.UnicodeScript.of(c)
        if (block == Character.UnicodeScript.HAN ||
            block == Character.UnicodeScript.HIRAGANA ||
            block == Character.UnicodeScript.KATAKANA ||
            block == Character.UnicodeScript.HANGUL) cjk += 1
      }
      i += Character.charCount(c)
    }
    if (letters > 0 && cjk * 2 > letters) return UTF8String.fromString("zh")
    val toks = tokens(s)
    if (toks.isEmpty) return UTF8String.fromString("und")
    var best = -1
    var bestHits = 0
    var li = 0
    while (li < stopwordSets.length) {
      var hits = 0
      var ti = 0
      while (ti < toks.length) {
        if (stopwordSets(li).contains(toks(ti))) hits += 1
        ti += 1
      }
      if (hits > bestHits) { bestHits = hits; best = li }
      li += 1
    }
    // require a minimal signal: >= 5% stopword hits
    if (best < 0 || bestHits * 20 < toks.length) UTF8String.fromString("und")
    else UTF8String.fromString(langNames(best))
  }

  /** Content-defined chunk cut points (rsync/FastCDC family): a cut
    * falls after code point i (1-based, i < n) whenever the Rabin
    * polynomial hash of the width-`k` code-point window ending at i
    * satisfies `hash % divisor == 0`; the final position n is always a
    * cut. Returned as the 1-based END positions of each chunk (empty
    * for empty input), so chunk j spans (cuts(j-1), cuts(j)].
    *
    * Boundaries depend only on the local window, so identical content
    * regions chunk identically regardless of what precedes them — the
    * property that makes the chunks dedup-able across shifted copies,
    * and the reason a fixed-stride splitter can't do this job.
    *
    * The hash is sum(cp_j * B^(k-1-j)) mod p with B=257, p=2^31-1,
    * computed ROLLING (O(1) per code point, one pass, no per-position
    * rehash) — exactly reproducible with plain integer SQL, which is
    * how the DuckDB oracle replays it (and why this is a polynomial
    * ring, not md5). Positions are CODE POINTS to match SQL substring
    * semantics on both engines.
    */
  def contentCuts(value: UTF8String, k: Int, divisor: Int): ArrayData = {
    val s = value.toString
    val n = s.codePointCount(0, s.length)
    if (n == 0) return new GenericArrayData(Array.empty[Int])
    val p = 2147483647L // 2^31 - 1
    val B = 257L
    var bk = 1L // B^k mod p, the outgoing-char weight
    var e = 0
    while (e < k) { bk = bk * B % p; e += 1 }
    val cp = new Array[Int](n)
    var ci = 0
    var si = 0
    while (si < s.length) {
      val c = s.codePointAt(si)
      cp(ci) = c
      ci += 1
      si += Character.charCount(c)
    }
    val cuts = new scala.collection.mutable.ArrayBuffer[Int]()
    var h = 0L
    var i = 0
    while (i < n) {
      h = (h * B + cp(i)) % p
      // h now spans [max(0, i-k+1) .. i] plus, once i >= k, one char
      // too many — evict cp(i-k)'s contribution (weight B^k after the
      // multiply above)
      if (i >= k) h = (h - cp(i - k) * bk % p + p) % p
      val pos = i + 1
      if (i >= k - 1 && pos < n && h % divisor == 0) cuts += pos
      i += 1
    }
    cuts += n
    new GenericArrayData(cuts.toArray)
  }

  /** Jaro similarity over UTF-8 BYTES, pinned BIT-IDENTICAL to
    * DuckDB's `jaro_similarity` (a RapidFuzz port — byte-based, which
    * is why this kernel deliberately does NOT decode codepoints):
    * match window = max(l1,l2)/2 − 1 clamped at 0; greedy
    * first-unmatched matching scanning the SECOND string's positions
    * left to right; transpositions = count of differing matched
    * positions, halved with integer floor; similarity =
    * (m/l1 + m/l2 + (m−t)/m) / 3.0 in exactly that double-operation
    * order (left-associated sum, then one division). Either side
    * empty ⇒ 0.0 (DuckDB's convention, including both-empty). The
    * bit-identity is empirically pinned by JwParitySpec's live-DuckDB
    * fuzz (230k+ adversarial pairs during development; a seeded
    * subset re-runs in CI via the DuckDB JDBC driver). */
  def jaroSim(a: UTF8String, b: UTF8String): Double =
    jaroCore(a.getBytes, b.getBytes)

  private def jaroCore(p: Array[Byte], t: Array[Byte]): Double = {
    val lp = p.length; val lt = t.length
    if (lp == 0 || lt == 0) return 0.0
    var bound = (if (lp > lt) lp else lt) / 2 - 1
    if (bound < 0) bound = 0
    val flagP = new Array[Boolean](lp)
    val flagT = new Array[Boolean](lt)
    var m = 0
    var i = 0
    while (i < lt) {
      val lo = if (i >= bound) i - bound else 0
      val hi = { val h = i + bound + 1; if (h < lp) h else lp }
      var j = lo
      var matched = false
      while (j < hi && !matched) {
        if (!flagP(j) && p(j) == t(i)) {
          flagP(j) = true; flagT(i) = true; m += 1; matched = true
        }
        j += 1
      }
      i += 1
    }
    if (m == 0) return 0.0
    var trans = 0
    var k = 0
    i = 0
    while (i < lt) {
      if (flagT(i)) {
        while (!flagP(k)) k += 1
        if (p(k) != t(i)) trans += 1
        k += 1
      }
      i += 1
    }
    val half = trans / 2
    (m.toDouble / lp + m.toDouble / lt + (m - half).toDouble / m) / 3.0
  }

  /** TRUE (unrestricted) Damerau–Levenshtein distance over UTF-8
    * BYTES, pinned to DuckDB's `damerau_levenshtein` (probed: the
    * Lowrance–Wagner 1975 algorithm with the last-occurrence frame —
    * `CA → ABC` = 2, distinguishing it from the restricted/OSA
    * variant's 3; byte-based like [[jaroSim]]). Exact integers, so the
    * oracle replay needs no float contract at all. Pinned by
    * JwParitySpec's live-DuckDB fuzz (60k pairs in development, a
    * seeded subset in CI). */
  /** Byte-length envelope of [[damerauLevenshtein]]: the Lowrance–
    * Wagner frame allocates a full (la+2)×(lt+2) Int matrix per
    * evaluated pair, so a pathological field (a 100 KB value reaching a
    * blocked join) would mean multi-GB per-row allocations and an
    * executor OOM — unlike the O(min) rolling-row levenshtein. 2048
    * bytes per side caps the matrix at ~16 MB and covers every
    * name/code/address field ER compares; longer values fail FAST with
    * a named error instead of OOMing the executor. DuckDB parity is
    * unaffected: within the envelope the kernel is pinned bit-identical
    * (JwParitySpec), and beyond it this side refuses loudly. */
  val MaxDamerauBytes = 2048

  def damerauLevenshtein(a: UTF8String, b: UTF8String): Int = {
    val p = a.getBytes; val t = b.getBytes
    val la = p.length; val lt = t.length
    if (la > MaxDamerauBytes || lt > MaxDamerauBytes)
      throw new IllegalArgumentException(
        s"damerau_levenshtein: input exceeds the $MaxDamerauBytes-byte " +
        s"envelope (got $la/$lt bytes) — the Lowrance-Wagner matrix is " +
        "quadratic per pair; truncate or pre-filter long fields")
    if (la == 0) return lt
    if (lt == 0) return la
    val maxd = la + lt
    val da = new Array[Int](256)
    val d = Array.ofDim[Int](la + 2, lt + 2)
    d(0)(0) = maxd
    var i = 0
    while (i <= la) { d(i + 1)(0) = maxd; d(i + 1)(1) = i; i += 1 }
    var j = 0
    while (j <= lt) { d(0)(j + 1) = maxd; d(1)(j + 1) = j; j += 1 }
    i = 1
    while (i <= la) {
      var db = 0
      j = 1
      while (j <= lt) {
        val k = da(t(j - 1) & 0xFF)
        val l = db
        var cost = 1
        if (p(i - 1) == t(j - 1)) { cost = 0; db = j }
        val sub = d(i)(j) + cost
        val ins = d(i + 1)(j) + 1
        val del = d(i)(j + 1) + 1
        val trn = d(k)(l) + (i - k - 1) + 1 + (j - l - 1)
        var best = sub
        if (ins < best) best = ins
        if (del < best) best = del
        if (trn < best) best = trn
        d(i + 1)(j + 1) = best
        j += 1
      }
      da(p(i - 1) & 0xFF) = i
      i += 1
    }
    d(la + 1)(lt + 1)
  }

  /** Jaro–Winkler similarity, pinned bit-identical to DuckDB's
    * `jaro_winkler_similarity`: [[jaroSim]] plus Winkler's prefix
    * boost `sim + ℓ·0.1·(1−sim)` applied ONLY when jaro > 0.7
    * (strict), ℓ = common prefix BYTES capped at 4, stopping at the
    * first mismatch. Same double-operation order as the reference
    * ((ℓ·0.1)·(1−sim), then one add). */
  def jaroWinklerSim(a: UTF8String, b: UTF8String): Double = {
    // extract bytes ONCE per pair (getBytes may copy): this runs per
    // candidate pair inside the blocked join's codegen
    val p = a.getBytes; val t = b.getBytes
    var sim = jaroCore(p, t)
    if (sim > 0.7) {
      val lim = { val n = if (p.length < t.length) p.length else t.length
        if (n < 4) n else 4 }
      var pref = 0
      while (pref < lim && p(pref) == t(pref)) pref += 1
      sim += pref * 0.1 * (1.0 - sim)
    }
    sim
  }
}
