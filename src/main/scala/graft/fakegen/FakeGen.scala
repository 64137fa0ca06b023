package graft.fakegen

/** Deterministic fake-data generators.
  *
  * Replicates the reference's load-bearing determinism contract
  * (rustic-transformator/src/transformator.rs:94-99,122-144): every fake
  * cell value is a pure function of `(original cell value, global seed)`.
  * Same input value + same seed => same fake output, across runs, columns,
  * partitions, and task retries. This preserves referential integrity for
  * anonymized join keys (e.g. an email used as an FK fakes identically in
  * every table) and makes the generators safe under Spark speculation.
  *
  * The reference seeds a SipHash-based RNG; the *contract* (stable
  * value->output mapping) is what matters, not the hash family
  * (SURVEY.md §7.2). We use FNV-1a 64 over UTF-8 bytes, finalized and
  * mixed with the global seed via SplitMix64 — stable, dependency-free,
  * and fast enough to live inside whole-stage codegen.
  *
  * Divergence (documented in SURVEY.md §7 hard-parts #1): the reference's
  * `fake_phone` and `fake_multi_email` draw from a *sequential* RNG so
  * their output depends on row order — unreproducible under partitioned
  * execution. Here they are value-seeded like every other generator
  * (strictly better: deterministic AND order-independent), while keeping
  * the per-digit "differs from original" guarantee
  * (fake_phone_transformator.rs:29-35).
  */
object FakeGen {

  /** Default global seed, matching the reference's RNG_SEED default
    * (anonymization_dataframe_operator.rs:442-447). */
  final val DefaultSeed = 42L

  // ---- seeding ----------------------------------------------------------

  private final val FnvOffset = 0xcbf29ce484222325L
  private final val FnvPrime = 0x100000001b3L

  /** FNV-1a 64-bit over UTF-8 bytes. Stable across JVMs/platforms. */
  def hash64(bytes: Array[Byte], offset: Int, len: Int): Long = {
    var h = FnvOffset
    var i = offset
    val end = offset + len
    while (i < end) {
      h ^= (bytes(i) & 0xffL)
      h *= FnvPrime
      i += 1
    }
    h
  }

  def hash64(s: String): Long = {
    val b = s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    hash64(b, 0, b.length)
  }

  /** SplitMix64 finalizer — strong 64-bit avalanche. */
  @inline def mix64(x0: Long): Long = {
    var x = x0
    x ^= (x >>> 30); x *= 0xbf58476d1ce4e5b9L
    x ^= (x >>> 27); x *= 0x94d049bb133111ebL
    x ^= (x >>> 31)
    x
  }

  /** Per-cell seed: combine the value hash with the global seed
    * (transformator.rs:128-144 analog). */
  @inline def cellSeed(value: String, globalSeed: Long): Long =
    mix64(hash64(value) ^ mix64(globalSeed))

  /** Tiny deterministic RNG stream (SplitMix64). Allocation-free usage:
    * callers hold the state as a local Long and call `next`. */
  @inline def next(state: Long): Long = mix64(state + 0x9e3779b97f4a7c15L)

  /** Bounded draw without modulo bias worth caring about at n<<2^32. */
  @inline def draw(r: Long, n: Int): Int = {
    val v = (r >>> 33).toInt % n
    if (v < 0) v + n else v
  }

  // ---- generator kernels ------------------------------------------------
  // Each takes the ORIGINAL cell value + global seed and returns the fake.
  // All are total functions (no exceptions) and null-intolerant (callers
  // handle null via expression null-propagation).

  def firstName(value: String, seed: Long): String = {
    val s = cellSeed(value, seed)
    Wordlists.firstNames(draw(s, Wordlists.firstNames.length))
  }

  def lastName(value: String, seed: Long): String = {
    // Domain-separate from firstName so fullName's parts look independent.
    val s = next(cellSeed(value, seed) ^ 0x1337L)
    Wordlists.lastNames(draw(s, Wordlists.lastNames.length))
  }

  def fullName(value: String, seed: Long): String =
    firstName(value, seed) + " " + lastName(value, seed)

  def companyName(value: String, seed: Long): String = {
    var s = cellSeed(value, seed) ^ 0xc0c0L
    s = next(s); val stem = Wordlists.companyStems(draw(s, Wordlists.companyStems.length))
    s = next(s); val suffix = Wordlists.companySuffixes(draw(s, Wordlists.companySuffixes.length))
    stem + " " + suffix
  }

  /** Safe fake email: first.last{NN}@example.{com|org|net} — never a real
    * deliverable domain (RFC 2606 reserved), like the reference's faker
    * `safe_email` (transformator.rs:31). */
  def email(value: String, seed: Long): String = {
    var s = cellSeed(value, seed) ^ 0xe4a11L
    s = next(s); val fn = Wordlists.firstNames(draw(s, Wordlists.firstNames.length)).toLowerCase
    s = next(s); val ln = Wordlists.lastNames(draw(s, Wordlists.lastNames.length)).toLowerCase
    s = next(s); val num = draw(s, 100)
    s = next(s); val dom = Wordlists.emailDomains(draw(s, Wordlists.emailDomains.length))
    val sb = new java.lang.StringBuilder(fn.length + ln.length + dom.length + 8)
    sb.append(fn).append('.').append(ln)
    if (num < 50) sb.append(num) // ~half get a numeric suffix, like faker
    sb.append('@').append(dom)
    sb.toString
  }

  /** Composite address: "<bldg> <street> <zip> <city> <postcode>" — the
    * reference assembles 4 faker parts (transformator.rs:33-39). */
  def address(value: String, seed: Long): String = {
    var s = cellSeed(value, seed) ^ 0xadd12L
    s = next(s); val bldg = 1 + draw(s, 9999)
    s = next(s); val street = Wordlists.streets(draw(s, Wordlists.streets.length))
    s = next(s); val zip = 10000 + draw(s, 89999)
    s = next(s); val city = Wordlists.cities(draw(s, Wordlists.cities.length))
    s = next(s); val postcode = 10000 + draw(s, 89999)
    s"$bldg $street $zip $city $postcode"
  }

  /** "fake_md5" in the reference actually emits a UUIDv4 string
    * (transformator.rs:40,60). Deterministic per cell here. */
  def uuid(value: String, seed: Long): String = {
    var s = cellSeed(value, seed) ^ 0x3d5L
    s = next(s); val hi0 = s
    s = next(s); val lo0 = s
    val hi = (hi0 & ~0x000000000000f000L) | 0x0000000000004000L // version 4
    val lo = (lo0 & ~0xc000000000000000L) | 0x8000000000000000L // variant 10
    new java.util.UUID(hi, lo).toString
  }

  /** Per-character digit scramble: every ASCII digit is replaced by a
    * *different* digit; non-digits (formatting: '+', spaces, dashes) kept;
    * strings of length <= 1 returned unchanged
    * (fake_phone_transformator.rs:14-62). Value-seeded (divergence above). */
  def phone(value: String, seed: Long): String = {
    if (value.length <= 1) return value
    var s = cellSeed(value, seed) ^ 0x9403eL
    val chars = value.toCharArray
    var i = 0
    while (i < chars.length) {
      val c = chars(i)
      if (c >= '0' && c <= '9') {
        s = next(s)
        // draw from the 9 digits != original => guaranteed different
        val d = draw(s, 9)
        val orig = c - '0'
        val repl = if (d >= orig) d + 1 else d
        chars(i) = ('0' + repl).toChar
      }
      i += 1
    }
    new String(chars)
  }

  /** Postgres-array-literal email rewrite: "{a,b,c}" -> "{f1,f2,f3}" with
    * each element faked independently (seeded by the ELEMENT value, so the
    * same address fakes identically here and in scalar email columns).
    * Length <= 1 returned unchanged (fake_multi_email_transformator.rs:15-54).
    * A longer NON-braced value is treated as one address and faked —
    * an anonymization primitive must FAIL CLOSED: passing a malformed
    * or bare scalar through verbatim would leak the original PII. */
  def multiEmail(value: String, seed: Long): String = {
    if (value.length <= 1) return value
    val inner =
      if (value.charAt(0) == '{' && value.charAt(value.length - 1) == '}')
        value.substring(1, value.length - 1)
      else return email(value, seed)
    if (inner.isEmpty) return value
    val parts = inner.split(",", -1)
    val sb = new java.lang.StringBuilder(value.length + 16)
    sb.append('{')
    var i = 0
    while (i < parts.length) {
      if (i > 0) sb.append(',')
      sb.append(email(parts(i).trim, seed))
      i += 1
    }
    sb.append('}')
    sb.toString
  }

  // ---- dispatch (called from generated code) ----------------------------

  final val KindFirstName = 0
  final val KindLastName = 1
  final val KindFullName = 2
  final val KindCompany = 3
  final val KindEmail = 4
  final val KindAddress = 5
  final val KindUuid = 6
  final val KindPhone = 7
  final val KindMultiEmail = 8

  /** Single static entry point used by the codegen'd Catalyst expression
    * (graft.functions.FakeExpr). Operates on UTF8String to stay inside
    * Tungsten's row format; the String hop happens once, here. */
  def dispatch(kind: Int, value: org.apache.spark.unsafe.types.UTF8String,
               seed: Long): org.apache.spark.unsafe.types.UTF8String = {
    val v = value.toString
    val out = (kind: @annotation.switch) match {
      case KindFirstName  => firstName(v, seed)
      case KindLastName   => lastName(v, seed)
      case KindFullName   => fullName(v, seed)
      case KindCompany    => companyName(v, seed)
      case KindEmail      => email(v, seed)
      case KindAddress    => address(v, seed)
      case KindUuid       => uuid(v, seed)
      case KindPhone      => phone(v, seed)
      case KindMultiEmail => multiEmail(v, seed)
    }
    org.apache.spark.unsafe.types.UTF8String.fromString(out)
  }
}
