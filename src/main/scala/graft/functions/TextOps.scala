package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text primitives shared by the dedup / text-analysis operators.
  * All codegen-friendly built-ins (split/filter/transform) — no UDFs —
  * with regexes pinned to ASCII classes that Java and RE2 agree on.
  */
object TextOps {
  /** Lowercase word tokens, empty strings removed. */
  def tokens(text: Column): Column =
    filter(split(lower(text), "[^a-z]+"), w => w =!= "")

  /** DuckDB equivalent of tokens(). */
  def sqlTokens(expr: String): String =
    s"list_filter(string_split_regex(lower($expr), '[^a-z]+'), w -> w <> '')"

  /** Distinct word n-gram shingles from an already-materialized token
    * array column — the native one-pass [[graft.expressions.WordNgrams]]
    * (codegen'd; the composed transform/slice/concat_ws chain is
    * CodegenFallback per window). Output is bit-identical to
    * `array_distinct(transform(sequence(1, greatest(size-(n-1), 1)),
    * i -> concat_ws(' ', slice(toks, i, n))))` — parity
    * property-asserted in CosineExpressionSpec. */
  def shinglesFromTokens(toks: Column, n: Int): Column =
    org.apache.spark.sql.graftbridge.ColumnBridge.column(
      graft.expressions.WordNgrams(
        org.apache.spark.sql.graftbridge.ColumnBridge.expression(toks),
        n, distinct = true, padShort = true))

  /** Strict sliding n-grams WITH multiplicity: [] when the input has
    * fewer than n tokens, else exactly size-n+1 full windows — the
    * native form of `transform(when(size >= n, sequence(1, size-n+1))
    * .otherwise(array()), i -> concat_ws(' ', slice(toks, i, n)))`. */
  def slidingNgrams(toks: Column, n: Int): Column =
    org.apache.spark.sql.graftbridge.ColumnBridge.column(
      graft.expressions.WordNgrams(
        org.apache.spark.sql.graftbridge.ColumnBridge.expression(toks),
        n, distinct = false, padShort = false))

  /** Convenience form over raw text — only for frames where the row
    * count is small or a tokens column can't be projected first. */
  def shingles(text: Column, n: Int): Column =
    shinglesFromTokens(tokens(text), n)

  /** DuckDB equivalent of shingles(). DuckDB list_slice uses inclusive
    * begin..end indexes (1-based) vs Spark slice(start, length). */
  def sqlShingles(expr: String, n: Int): String = {
    val toks = sqlTokens(expr)
    s"""list_distinct(list_transform(
       |  range(1, greatest(len($toks) - ${n - 1}, 1) + 1),
       |  i -> array_to_string(list_slice($toks, i, i + ${n - 1}), ' ')))"""
      .stripMargin
  }
}
