package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Substring-dedup CLEAN kernel for the SQL surface.
  *
  * [[graft.operators.Dedup.removeDuplicatedNgrams]] is a multi-stage
  * plan (corpus-wide dup-gram aggregate, then a per-doc removal join) —
  * the aggregate half can never be a scalar function, but it IS pure
  * SQL (the same CTEs as the q_dedup_substring oracle). What the SQL
  * surface was missing is the removal half. `remove_dup_grams(text,
  * dup_grams, n)` applies it per row under a RUNTIME duplicated-gram
  * table (array<string>, typically a scalar subquery over the dup-set
  * aggregate), the same pattern as the ANN tier's `nearest_centroid`.
  *
  * Token semantics are bit-identical to the programmatic tier's
  * substrToks convention (trim → lower → \s+ split → drop empties; the
  * kernel runs the SAME UTF8String primitives Spark's trim()/lower()
  * evaluate to), so SQL and programmatic cleans agree row for row
  * (SqlAndDmsSpec pins this; q_substring_clean_sql pins it against the
  * DuckDB oracle).
  *
  * Scale posture: the dup-gram table ships to every task via the
  * scalar subquery's broadcast — right for moderate dup sets (the
  * contamination/boilerplate regime). A dup set too big to broadcast
  * is the programmatic tier's job, whose removal is a shuffle join.
  */
object SubstrSqlKernels {
  // ArrayData -> HashSet conversion memoized per backing instance: a
  // substituted scalar subquery is one shared value per task, so the
  // set builds once per task, not once per row (IvfSqlKernels pattern).
  private val memo =
    new ThreadLocal[java.util.IdentityHashMap[ArrayData, java.util.HashSet[UTF8String]]] {
      override def initialValue() =
        new java.util.IdentityHashMap[ArrayData, java.util.HashSet[UTF8String]]()
    }

  private def toSet(grams: ArrayData): java.util.HashSet[UTF8String] = {
    val m = memo.get()
    val hit = m.get(grams)
    if (hit != null) return hit
    if (m.size() > 64) m.clear() // bounded by distinct dup tables in the plan
    val n = grams.numElements()
    val s = new java.util.HashSet[UTF8String](math.max(16, n * 2))
    var i = 0
    while (i < n) {
      if (!grams.isNullAt(i)) s.add(grams.getUTF8String(i).clone())
      i += 1
    }
    m.put(grams, s)
    s
  }

  /** Delete every token covered by a width-`n` word gram present in
    * `dupGrams`; survivors re-join with single spaces (the normalized
    * token space of the programmatic tier). Fully-covered or empty
    * input yields ''. */
  def removeDupGrams(text: UTF8String, dupGrams: ArrayData, n: Int): UTF8String = {
    val set = toSet(dupGrams)
    // trim -> lower on UTF8String: the exact primitives Spark's
    // trim()/lower() expressions evaluate, so tokenization can't drift
    // from the column-function path
    val toks = text.trim().toLowerCase.toString
      .split("\\s+").filter(_.nonEmpty)
    val ntok = toks.length
    if (ntok == 0) return UTF8String.EMPTY_UTF8
    val covered = new Array[Boolean](ntok)
    if (!set.isEmpty && ntok >= n) {
      val sb = new java.lang.StringBuilder
      var p = 0
      while (p <= ntok - n) {
        sb.setLength(0)
        var i = 0
        while (i < n) {
          if (i > 0) sb.append(' ')
          sb.append(toks(p + i))
          i += 1
        }
        if (set.contains(UTF8String.fromString(sb.toString))) {
          var j = p
          while (j < p + n) { covered(j) = true; j += 1 }
        }
        p += 1
      }
    }
    val out = new java.lang.StringBuilder
    var i = 0
    while (i < ntok) {
      if (!covered(i)) {
        if (out.length > 0) out.append(' ')
        out.append(toks(i))
      }
      i += 1
    }
    UTF8String.fromString(out.toString)
  }
}

/** SQL `remove_dup_grams(text, dup_grams[, n=5])` — substring-dedup
  * clean under a runtime duplicated-gram table. */
case class RemoveDupGramsExpr(left: Expression, right: Expression, n: Int)
    extends BinaryExpression
    with org.apache.spark.sql.graftbridge.DeclaredInputTypes {
  require(n > 0, s"gram width must be positive, got $n")
  override def declaredInputTypes: Seq[DataType] =
    Seq(StringType, ArrayType(StringType))
  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "remove_dup_grams"
  override def nullSafeEval(t: Any, g: Any): Any =
    SubstrSqlKernels.removeDupGrams(
      t.asInstanceOf[UTF8String], g.asInstanceOf[ArrayData], n)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (t, g) =>
      s"graft.functions.SubstrSqlKernels.removeDupGrams($t, $g, $n)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}
