package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.Expression

import graft.fakegen.FakeGen
import graft.operators.DecodeStubExpr

/** SQL-surface registration: every graft expression as a SQL function,
  * so `spark.sql("SELECT fake_email(c_name) FROM t")` works — the
  * library is usable from pure-SQL contexts (thrift server, notebooks)
  * with zero Scala imports.
  *
  * Two entry points:
  *  - [[registerAll]] on a live session (temp functions);
  *  - [[GraftExtensions]] via `spark.sql.extensions` config / builder
  *    `.withExtensions`, for sessions created by infra that owns the
  *    builder.
  */
object registry {

  /** Literal arg as a Long: integral literals and integer-shaped string
    * literals ('42' — long accepted on the SQL surface) both work; null
    * or non-numeric values get a clear analysis error, not an NPE. */
  private def longLiteral(args: Seq[Expression], at: Int, what: String): Option[Long] =
    if (args.length > at) args(at) match {
      case org.apache.spark.sql.catalyst.expressions.Literal(v, _) if v != null =>
        scala.util.Try(v.toString.toLong).toOption match {
          case some @ Some(_) => some
          case None => throw new IllegalArgumentException(
            s"$what argument must be an integer literal, got '$v'")
        }
      case other => throw new IllegalArgumentException(
        s"$what argument must be a non-null integer literal, got $other")
    } else None

  private def seedOf(args: Seq[Expression], at: Int): Long =
    longLiteral(args, at, "seed").getOrElse(FakeGen.DefaultSeed)

  /** (name, builder) for every SQL-exposed function. */
  val builders: Seq[(String, Seq[Expression] => Expression)] = {
    def fake(kind: Int): Seq[Expression] => Expression =
      args => FakeExpr(args.head, kind, seedOf(args, 1))
    Seq(
      "fake_first_name" -> fake(FakeGen.KindFirstName),
      "fake_last_name" -> fake(FakeGen.KindLastName),
      "fake_name" -> fake(FakeGen.KindFullName),
      "fake_company_name" -> fake(FakeGen.KindCompany),
      "fake_email" -> fake(FakeGen.KindEmail),
      "fake_address" -> fake(FakeGen.KindAddress),
      "fake_uuid" -> fake(FakeGen.KindUuid),
      "fake_phone" -> fake(FakeGen.KindPhone),
      "fake_multi_email" -> fake(FakeGen.KindMultiEmail),
      "lang_id" -> (args => LangIdExpr(args.head)),
      "normalize_text" -> (args => NormalizeUnicodeExpr(args.head)),
      "bpe_token_count" -> (args => BpeTokenCountExpr(args.head)),
      "rolling_fingerprint" -> (args => RollingFingerprintExpr(args.head)),
      "diversity_stats" -> (args => DiversityStatsExpr(args.head)),
      "minhash" -> (args => MinHashExpr(args.head,
        shingleWidth = intArg(args, 1, 3), numHashes = intArg(args, 2, 128),
        seed = seedOf(args, 3))),
      "simhash" -> (args => SimHashExpr(args.head, seedOf(args, 1))),
      "sig_agreement" -> (args => SigAgreementExpr(args(0), args(1))),
      // DuckDB-pinned string comparators (ER name matching)
      "jaro_sim" -> (args => JaroSimExpr(args(0), args(1))),
      "jaro_winkler_sim" -> (args => JaroWinklerExpr(args(0), args(1))),
      "damerau_levenshtein" -> (args =>
        DamerauLevenshteinExpr(args(0), args(1))),
      "cosine_sim" -> (args => CosineSimExpr(args(0), args(1))),
      "vec_dot" -> (args => DotExpr(args(0), args(1))),
      "vec_norm" -> (args => NormExpr(args.head)),
      "l2_distance" -> (args => L2DistanceExpr(args(0), args(1))),
      "hyperplane_bucket" -> (args => HyperplaneBucketExpr(args.head,
        intArg(args, 1, 12), seedOf(args, 2))),
      // ANN tier on the SQL surface: assignment/probing under a RUNTIME
      // centroid table (array<array<float>>, e.g. a scalar subquery
      // over a persisted index's centroids view) — an IVF top-k is
      // expressible in pure SQL (SqlAndDmsSpec)
      "nearest_centroid" -> (args => NearestCentroidSqlExpr(args(0), args(1))),
      "nearest_centroids" -> (args => NearestCentroidsSqlExpr(args(0), args(1),
        intArg(args, 2, 4))),
      "decode_stub" -> (args => DecodeStubExpr(args.head)),
      "image_stats" -> (args => graft.operators.ImageStatsExpr(args.head)),
      "image_resize" -> (args => graft.operators.ImageResizeExpr(args.head,
        intArg(args, 1, 16), intArg(args, 2, 16))),
      "test_image" -> (args => graft.operators.TestImageExpr(args.head)),
      // content-defined chunk cut positions (width, divisor literals);
      // pair with array/explode SQL to materialize the chunks
      "content_cuts" -> (args => ContentCutsExpr(args.head,
        intArg(args, 1, 16), intArg(args, 2, 64))),
      // Z-order (Morton) interleave — the multi-dimensional layout key
      "zorder2" -> (args => ZOrderExpr(args(0), args(1))),
      // N-dim curve: zorder_n(x1, ..., xn, bits) — the FINAL argument
      // is ALWAYS consumed as the per-dim bit width (n*bits <= 63,
      // enforced by the expr). Hazard guarded loudly: a non-literal or
      // out-of-range trailing arg means the caller put a dim column or
      // a data value in the bits position (e.g. zorder_n(a, b, c)
      // meaning 3 dims) — silently reinterpreting it would emit the
      // wrong curve, so it errors instead.
      "zorder_n" -> (args => {
        val bits = longLiteral(args, args.length - 1, "zorder_n bits")
          .getOrElse(throw new IllegalArgumentException(
            "zorder_n: the final argument is the per-dim bit width and " +
            "must be an integer LITERAL — zorder_n(x1, ..., xn, bits); " +
            "wrap a constant dim in an explicit extra dim instead"))
        require(bits >= 1 && bits <= 31,
          s"zorder_n: bits must be in [1, 31], got $bits — is a dim " +
          "value sitting in the trailing bits position?")
        ZOrderNExpr(args.init, bits.toInt)
      }),
      // perceptual hash as struct(hi, lo); pair with bit_count(a ^ b)
      // for hamming distance in pure SQL
      "image_dhash" -> (args => graft.operators.ImageDHashExpr(args.head)),
      // substring-dedup clean under a RUNTIME duplicated-gram table
      // (array<string> scalar subquery — the dup-set aggregate itself
      // is plain SQL); n must match the width the set was built with
      "remove_dup_grams" -> (args => RemoveDupGramsExpr(args(0), args(1),
        intArg(args, 2, 5))),
      // ---- sketch tier on the SQL surface: the estimator/merge
      // Column compositions from operators.Sketch re-exposed as SQL
      // functions (Bridge round-trips Column <-> Expression; the trees
      // are pure built-ins, so they stay codegen'd). Sketch BUILD is
      // plain SQL once kmv_hash exists:
      //   slice(array_sort(collect_set(kmv_hash(v))), 1, k)
      // k (and quantile q) are literals — they parameterize the
      // expression shape, exactly like the Scala signatures. ----------
      // Fellegi-Sunter linkage on the SQL surface: fs_pattern encodes
      // per-field agreement predicates as an 'A'/'D' string (NULL
      // counts as disagreement — the FS missing-field contract), and
      // fs_score(pattern, wA1, wD1, ..., wAk, wDk) sums the fixed ppm
      // log-odds weights — the blocked pair join itself is plain SQL
      "fs_pattern" -> (args => sketchCol(
        org.apache.spark.sql.functions.concat(args.map(e =>
          org.apache.spark.sql.functions.when(
            org.apache.spark.sql.functions.coalesce(colOf(e),
              org.apache.spark.sql.functions.lit(false)),
            "A").otherwise("D")): _*))),
      "fs_score" -> (args => {
        val k = (args.length - 1) / 2
        require(k >= 1 && args.length == 1 + 2 * k,
          "fs_score(pattern, wAgree1, wDisagree1, ..., wAgreeK, wDisagreeK)")
        import org.apache.spark.sql.functions.{lit, substring, when}
        val pat = colOf(args.head)
        val terms = (0 until k).map { i =>
          val wa = longLiteral(args, 1 + 2 * i, "fs_score wAgree")
            .getOrElse(throw new IllegalArgumentException(
              "fs_score weights must be integer ppm literals"))
          val wd = longLiteral(args, 2 + 2 * i, "fs_score wDisagree")
            .getOrElse(throw new IllegalArgumentException(
              "fs_score weights must be integer ppm literals"))
          require(wa > 0 && wd > 0,
            s"fs_score weights must be positive ppm, got +$wa/-$wd")
          when(substring(pat, i + 1, 1) === "A", lit(wa)).otherwise(lit(-wd))
        }
        sketchCol(terms.reduce(_ + _).cast("long"))
      }),
      // exact-ppm Herfindahl finish: hhi_ppm(sum_sq, n) over the
      // (Σ n_i², N) aggregates a plain GROUP BY produces — the same
      // self-switching overflow arithmetic as
      // Analytics.concentrationIndex, so the SQL surface shares the
      // operator query's oracle
      "hhi_ppm" -> (args => {
        require(args.length == 2, "hhi_ppm(sum_sq, n)")
        import org.apache.spark.sql.functions.{concat, greatest, lit,
          raise_error, when}
        val ss = colOf(args(0)).cast("long")
        val n = colOf(args(1)).cast("long")
        // n >= 1 is a LOUD contract, not a silent guard: a GROUP
        // BY-produced (Σ n_i², N) aggregate never emits N = 0 (a group
        // needs a member), so n <= 0 means a caller-supplied frame is
        // malformed — returning ss·1e6 (the old greatest(n², 1) path)
        // would be a garbage concentration the oracle can't match
        val n2 = n * n
        sketchCol(
          when(n <= lit(0L), raise_error(concat(
            lit("hhi_ppm: n must be >= 1 (GROUP BY aggregates never " +
              "emit an empty group), got "), n.cast("string"))))
            .when(n <= lit(3000000L), idiv(ss * lit(1000000L), n2))
            .otherwise(idiv(ss, n2) * lit(1000000L) +
              idiv(ss % n2, greatest(idiv(n2, lit(1000000L)), lit(1L)))))
      }),
      "kmv_hash" -> (args => sketchCol(graft.operators.Sketch.kmvHash(
        colOf(args.head)))),
      "kmv_estimate" -> (args => sketchCol(graft.operators.Sketch.kmvEstimate(
        colOf(args.head), intArg(args, 1, 32)))),
      "kmv_union" -> (args => sketchCol(graft.operators.Sketch.kmvUnionK(
        colOf(args(0)), colOf(args(1)), intArg(args, 2, 32)))),
      "kmv_intersect_estimate" -> (args =>
        sketchCol(graft.operators.Sketch.kmvIntersectEstimate(
          colOf(args(0)), colOf(args(1)), intArg(args, 2, 32)))),
      "quantile_estimate" -> (args =>
        sketchCol(graft.operators.Sketch.quantileEstimate(
          colOf(args.head), doubleArg(args, 1, 0.5)))))
  }

  private def colOf(e: Expression): org.apache.spark.sql.Column =
    org.apache.spark.sql.graftbridge.Bridge.column(e)
  private def sketchCol(c: org.apache.spark.sql.Column): Expression =
    org.apache.spark.sql.graftbridge.Bridge.toExpression(c)
  /** Integer division as a Column (the SQL `div` operator — the Column
    * DSL has no integral-divide method; `/` is float division). */
  private def idiv(a: org.apache.spark.sql.Column,
                   b: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    org.apache.spark.sql.graftbridge.Bridge.column(
      new org.apache.spark.sql.catalyst.expressions.IntegralDivide(
        org.apache.spark.sql.graftbridge.Bridge.toExpression(a),
        org.apache.spark.sql.graftbridge.Bridge.toExpression(b)))

  private def intArg(args: Seq[Expression], at: Int, default: Int): Int =
    longLiteral(args, at, s"argument $at").map(_.toInt).getOrElse(default)

  /** Literal arg as a Double (quantile q): numeric literals only. */
  private def doubleArg(args: Seq[Expression], at: Int, default: Double): Double =
    if (args.length > at) args(at) match {
      case org.apache.spark.sql.catalyst.expressions.Literal(v, _) if v != null =>
        scala.util.Try(v.toString.toDouble).getOrElse(
          throw new IllegalArgumentException(
            s"argument $at must be a numeric literal, got '$v'"))
      case other => throw new IllegalArgumentException(
        s"argument $at must be a non-null numeric literal, got $other")
    } else default

  /** Register as session temp functions on an existing session. */
  def registerAll(spark: SparkSession): Unit =
    builders.foreach { case (name, builder) =>
      spark.sessionState.functionRegistry
        .createOrReplaceTempFunction(name, builder, "built-in")
    }
}

/** `SparkSession.builder().withExtensions(new GraftExtensions)` or
  * `--conf spark.sql.extensions=graft.functions.GraftExtensions`. */
class GraftExtensions extends (org.apache.spark.sql.SparkSessionExtensions => Unit) {
  override def apply(ext: org.apache.spark.sql.SparkSessionExtensions): Unit = {
    registry.builders.foreach { case (name, builder) =>
      ext.injectFunction((
        new org.apache.spark.sql.catalyst.FunctionIdentifier(name),
        new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
          "graft.functions", name),
        builder))
    }
    ext.injectPlannerStrategy(_ => graft.plans.TopKStrategy)
    ext.injectOptimizerRule(_ => graft.plans.TopKRewrite)
  }
}
