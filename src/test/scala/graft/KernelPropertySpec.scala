package graft

import graft.functions.TextKernels

import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

/** Randomized-equivalence tests pinning the codegen'd kernels to
  * INDEPENDENT replicas (regex / BigInt formulations) — the fixed corpus
  * can't exercise every normalization edge; 500 seeded-random strings
  * per property do. Pure JVM, no Spark jobs, deterministic (fixed
  * seed). */
class KernelPropertySpec extends AnyFunSuite {

  // letters (incl. accented), digits, quality punct, symbols, regex-\s
  private val alphabet: Array[Char] =
    (('a' to 'z') ++ ('A' to 'Z') ++ "éüßñØ" ++ ('0' to '9') ++
     ".,;:!?" ++ "#$%&@-_/()" ++ " \t\n\f\r").toArray

  private def randomTexts(n: Int, seed: Long): Seq[String] = {
    val rnd = new scala.util.Random(seed)
    (1 to n).map { _ =>
      val len = rnd.nextInt(200)
      Array.fill(len)(alphabet(rnd.nextInt(alphabet.length))).mkString
    }
  }

  test("qualityStats == regex/split replica on 500 random strings") {
    val stops = TextKernels.enStopwords.toSet
    for (s <- randomTexts(500, 1L)) {
      val got = TextKernels.qualityStats(UTF8String.fromString(s))
      val alpha = s.replaceAll("[^\\p{L}]", "").length
      val punct = s.replaceAll("[^.,;:!?]", "").length
      // Spark semantics replica: trim() strips SPACES only; split() keeps
      // leading/trailing empty segments (limit -1)
      val t = s.dropWhile(_ == ' ').reverse.dropWhile(_ == ' ').reverse
      val toks = if (t.isEmpty) Array.empty[String] else t.split("\\s+", -1)
      val hits = toks.count(x =>
        x.nonEmpty && stops.contains(x.toLowerCase(java.util.Locale.ROOT)))
      assert(got.getInt(0) == alpha, s"alpha of ${s.take(40).replace("\n", "\\n")}")
      assert(got.getInt(1) == punct, s"punct of ${s.take(40).replace("\n", "\\n")}")
      assert(got.getInt(2) == toks.length, s"ntok of ${s.take(40).replace("\n", "\\n")}")
      assert(got.getInt(3) == hits, s"hits of ${s.take(40).replace("\n", "\\n")}")
    }
  }

  test("bpeTokenCount == independent span-scan replica") {
    // regex-\s separator class, matching the kernel (and the oracle's
    // '[^\sA-Za-z0-9]+' symbol-run exclusion) exactly
    def ws(c: Char): Boolean = c == ' ' || c == '\t' || c == '\n' || c == '\u000b' || c == '\f' || c == '\r'
    def replica(s: String): Int = {
      def kind(c: Char): Int =
        if (Character.isLetter(c)) 0
        else if (Character.isDigit(c)) 1 else 2
      var rest = s.dropWhile(ws)
      var n = 0
      while (rest.nonEmpty) {
        val k = kind(rest.head)
        rest = rest.dropWhile(c => !ws(c) && kind(c) == k)
          .dropWhile(ws)
        n += 1
      }
      n
    }
    for (s <- randomTexts(500, 2L))
      assert(TextKernels.bpeTokenCount(UTF8String.fromString(s)) == replica(s), s)
  }

  test("rollingFingerprint == BigInt mod-2^64 replica") {
    val M = BigInt(1) << 64
    def mix64(x0: BigInt): BigInt = {
      var x = x0
      x = x ^ (x >> 30); x = (x * BigInt("bf58476d1ce4e5b9", 16)) mod M
      x = x ^ (x >> 27); x = (x * BigInt("94d049bb133111eb", 16)) mod M
      x ^ (x >> 31)
    }
    def replica(s: String): String = {
      val n = TextKernels.normalize(s)
      var h = BigInt("cbf29ce484222325", 16)
      n.foreach { c => h = (h * BigInt("100000001b3", 16) + c.toInt) mod M }
      mix64(h).toString(16)
    }
    for (s <- randomTexts(300, 3L))
      assert(TextKernels.rollingFingerprint(UTF8String.fromString(s)).toString
        == replica(s), s)
  }

  test("thresholdHex: 15 hex chars, lexicographic order == numeric order") {
    import graft.operators.Sampling.thresholdHex
    assert(thresholdHex(0.0) == "0" * 15)
    assert(thresholdHex(0.25) == "4" + "0" * 14)
    assert(thresholdHex(0.5) == "8" + "0" * 14)
    val rnd = new scala.util.Random(4L)
    for (_ <- 1 to 500) {
      val (a, b) = (rnd.nextDouble(), rnd.nextDouble())
      val (lo, hi) = if (a <= b) (a, b) else (b, a)
      assert(thresholdHex(lo).length == 15)
      assert(thresholdHex(lo) <= thresholdHex(hi))
    }
  }

  test("cosine: zero-norm vectors get the -2.0 sentinel, never NaN") {
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    def arr(xs: Float*) = new GenericArrayData(xs.toArray)
    val zero = arr(0f, 0f, 0f)
    val v = arr(1f, 2f, 3f)
    // NaN would sort ABOVE every real cosine in a descending top-k and
    // make zero vectors everyone's nearest neighbor
    assert(graft.functions.VectorKernels.cosine(zero, v) == -2.0)
    assert(graft.functions.VectorKernels.cosine(v, zero) == -2.0)
    assert(graft.functions.VectorKernels.cosine(zero, zero) == -2.0)
    assert(math.abs(graft.functions.VectorKernels.cosine(v, v) - 1.0) < 1e-12)
  }

  test("multiEmail fails closed: non-braced values are faked, never passed through") {
    import graft.fakegen.FakeGen
    val bare = FakeGen.multiEmail("alice@corp.com", 42L)
    assert(bare != "alice@corp.com" && bare.nonEmpty)
    assert(bare == FakeGen.email("alice@corp.com", 42L)) // treated as one address
    val malformed = FakeGen.multiEmail("{a@x.com", 42L) // unclosed brace
    assert(malformed != "{a@x.com")
    // braced and length<=1 contracts unchanged
    assert(FakeGen.multiEmail("{a@x.com,b@y.com}", 42L).startsWith("{"))
    assert(FakeGen.multiEmail("", 42L) == "")
    assert(FakeGen.multiEmail("x", 42L) == "x")
  }

  test("multimodal frames: count and exact slicing vs replica") {
    val rnd = new scala.util.Random(5L)
    for (_ <- 1 to 300) {
      val arr = Array.fill(rnd.nextInt(64))(rnd.nextInt(256).toByte)
      val frame = 1 + rnd.nextInt(8)
      val stride = 1 + rnd.nextInt(8)
      val got = graft.operators.MultimodalKernels.frames(arr, frame, stride)
      val want = if (arr.length < frame) 0 else (arr.length - frame) / stride + 1
      assert(got.numElements() == want)
      (0 until got.numElements()).foreach { i =>
        assert(java.util.Arrays.equals(got.getBinary(i),
          java.util.Arrays.copyOfRange(arr, i * stride, i * stride + frame)))
      }
    }
  }

  test("repetitionStats == independent tokenize/count replica") {
    for (s <- randomTexts(500, 5L)) {
      val got = TextKernels.repetitionStats(UTF8String.fromString(s))
      val toks = TextKernels.tokens(s) // shared normalization on purpose:
      // the replica recounts independently, the tokenizer itself is
      // pinned by the qualityStats property above
      val bigrams = toks.sliding(2).filter(_.length == 2).map(_.mkString(" ")).toSeq
      assert(got.getInt(0) == toks.length)
      assert(got.getInt(1) == toks.distinct.length)
      assert(got.getInt(2) == math.max(toks.length - 1, 0))
      val maxBg = if (bigrams.isEmpty) 0
        else bigrams.groupBy(identity).values.map(_.size).max
      assert(got.getInt(3) == maxBg, s"maxBigram of ${s.take(40)}")
    }
  }

  test("diversityStats == independent replica; entropy bounds and invariances hold") {
    for (s <- randomTexts(500, 7L)) {
      val got = TextKernels.diversityStats(UTF8String.fromString(s))
      val (n, d, e) = (got.getLong(0), got.getLong(1), got.getLong(2))
      // independent replica: regex tokenize, Map-based counts
      // per-char lowercase like the kernel (locale-independent; a full
      // String.toLowerCase under tr_TR diverges on 'I')
      val toks = s.map(Character.toLowerCase)
        .split("\\s+").filter(_.nonEmpty)
      val counts = toks.groupBy(identity).view.mapValues(_.length)
      val expectE = -counts.values.map { c =>
        val p = c.toDouble / toks.length
        math.floor(1e6 * (p * math.log(p)) + 0.5).toLong
      }.sum
      assert(n == toks.length && d == counts.size)
      assert(e == (if (toks.isEmpty) 0L else expectE),
        s"entropy of '${s.take(40).replace("\n", "\\n")}'")
      // bounds: 0 <= H <= ln(distinct) (+1 ulp-per-term slack from rounding)
      assert(e >= -d && (d == 0 ||
        e <= math.ceil(1e6 * math.log(d.toDouble)).toLong + d))
      // invariance: extra surrounding/internal whitespace changes nothing
      val padded = "  " + s.replace(" ", "   ") + "\t"
      val again = TextKernels.diversityStats(UTF8String.fromString(padded))
      assert(again.getLong(2) == e && again.getLong(0) == n)
    }
  }

  test("shingleHashes: sorted, distinct, and == per-shingle hash set replica") {
    for ((s, idx) <- randomTexts(500, 6L).zipWithIndex; w <- Seq(1, 3, 5)) {
      val got = TextKernels.shingleHashes(UTF8String.fromString(s), w)
      val arr = got.toLongArray()
      assert(arr.sameElements(arr.sorted.distinct), s"not sorted-distinct at $idx")
      // independent replica: hash every w-shingle string through the
      // SAME shingle hash the minhash kernel uses (string -> FNV -> mix)
      val toks = TextKernels.tokens(s)
      val expected: Set[Long] =
        if (toks.isEmpty) Set.empty
        else {
          val n = math.max(toks.length - w + 1, 1)
          (0 until n).map { i =>
            val sh = toks.slice(i, math.min(i + w, toks.length))
            var h = 0xcbf29ce484222325L
            for (t <- sh) {
              for (k <- 0 until t.length) h = (h ^ t.charAt(k)) * 0x100000001b3L
              h = (h ^ ' ') * 0x100000001b3L
            }
            graft.fakegen.FakeGen.mix64(h)
          }.toSet
        }
      assert(arr.toSet == expected, s"shingle set of ${s.take(40)} w=$w")
      // parity with minhash: empty doc <=> empty signature source
      assert((arr.length == 0) == (toks.length == 0))
    }
  }
}
