package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector and text helper columns built from codegen'd built-ins —
  * no Scala UDFs anywhere (SURVEY.md §7.4d: keep the hot path inside
  * whole-stage codegen).
  */
object VecText {

  /** Column names here are interpolated into SQL `expr(...)` strings
    * (the shapes below — CASE/transform chains — predate pure-Column
    * equivalents that don't double-evaluate their array arguments), so
    * a name needing backticks would silently parse as an EXPRESSION
    * fragment instead of erroring as a bad reference. Public API →
    * validate loudly (round-20 review). */
  private def checkName(name: String): String = {
    require(name.matches("[A-Za-z_][A-Za-z0-9_]*"),
      s"VecText: column name '$name' is not a plain identifier — " +
        "these helpers interpolate names into SQL expressions and " +
        "cannot safely quote qualified or exotic names; alias the " +
        "column to a simple name first")
    name
  }

  /** Sequential-fold dot product over two array columns, computed in
    * double. Mirrors DuckDB's `list_dot_product` evaluation order so the
    * oracle compare is bit-stable. Backed by the native codegen'd
    * [[HashExpressions.DotProduct]] (identical fp result to the
    * `aggregate(zip_with(...))` combinator form it replaced). */
  def dot(a: String, b: String): Column =
    HashExpressions.dot_product(col(a), col(b))

  def norm2(a: String): Column = dot(a, a)

  /** cosine(a,b) = dot/(sqrt(|a|)*sqrt(|b|)) — the exact formula the
    * oracle uses; do not "simplify" to sqrt(|a|*|b|) (different ulps). */
  def cosine(a: String, b: String): Column =
    dot(a, b) / (sqrt(norm2(a)) * sqrt(norm2(b)))

  /** Single-space tokenization — matches DuckDB `string_split(text, ' ')`.
    * The corpus is single-space separated; a regex split would diverge
    * from the oracle on empty tokens. */
  def tokens(text: String): Column = split(col(text), " ")

  /** Distinct word-3-gram shingles of a token-array column (0-based Spark
    * subscripts; empty array below 3 tokens). */
  def shingles3(toks: String): Column = {
    val t = checkName(toks)
    expr(s"CASE WHEN size($t) >= 3 THEN array_distinct(transform(sequence(0, size($t) - 3), i -> concat_ws(' ', $t[i], $t[i+1], $t[i+2]))) ELSE array() END")
  }

  /** Exact Jaccard similarity of two array columns (distinct semantics).
    * Two EMPTY arrays score NULL (via nullif), not 0/0 = NaN: Spark
    * orders NaN above every number, so the raw division would let a pair
    * of empty-shingle docs pass any `jaccard >= threshold` filter as a
    * bogus near-dup (the engine's dedup callers pre-filter empties, but
    * this helper is public API). nullif, not a CASE guard: a CASE
    * re-evaluates the array_union per branch, doubling the hot cost of
    * every candidate-pair scan (measured ~9× on the curation chain). */
  def jaccard(a: String, b: String): Column = {
    val (ca, cb) = (checkName(a), checkName(b))
    expr(s"CAST(size(array_intersect($ca, $cb)) AS DOUBLE) " +
      s"/ nullif(size(array_union($ca, $cb)), 0)")
  }
}
