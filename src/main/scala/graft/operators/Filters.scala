package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

import graft.config.FilterType

/** FilterType => Column predicate compiler (SURVEY.md §2.3).
  *
  * Declarative on purpose: Catalyst pushes every one of these predicates
  * into the parquet scan (min/max row-group pruning + dictionary
  * filtering for Equals/isin) — strictly better than the reference,
  * which filters after fully decoding each file.
  *
  * NOT-IN null semantics, pinned (SURVEY.md §7 hard-parts #2): the
  * reference evaluates `is_in(values, nulls_equal=true).not()`; with a
  * null-free config list a NULL cell is "not in" => KEPT. Spark's bare
  * `!isin` would yield NULL => dropped, so we add `isNull ||` explicitly.
  */
object Filters {

  def compile(f: FilterType): Column = f match {
    case FilterType.Contains(c, v)   => col(c).contains(lit(v))
    case FilterType.StartsWith(c, v) => col(c).startsWith(lit(v))
    case FilterType.EndsWith(c, v)   => col(c).endsWith(lit(v))
    case FilterType.StartsAndEndsWith(c, s, e) =>
      col(c).startsWith(lit(s)) && col(c).endsWith(lit(e))
    case FilterType.Equals(c, v)     => col(c) === lit(v)
    case FilterType.AnyOfInt(c, vs)  =>
      col(c).isNull || !col(c).isin(vs: _*)
    case FilterType.AnyOfString(c, vs) =>
      col(c).isNull || !col(c).isin(vs: _*)
    case FilterType.NoFilter         => lit(true)
  }
}
