package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Building blocks shared by the text/dedup/similarity operators.
  *
  * Everything here is *portable*: the same value is computable in any
  * engine with md5 + IEEE-754 doubles (the DuckDB oracles reproduce them
  * exactly). Two hard rules keep cross-engine bit-parity (SURVEY.md §5):
  *
  *  1. hashes derive from md5 hex (identical everywhere) — never from
  *     engine-specific hash functions (Spark murmur3 ≠ DuckDB hash);
  *  2. float reductions fold LEFT-TO-RIGHT over array order
  *     (`aggregate`) — never via SUM over rows, whose accumulation order
  *     is nondeterministic in a distributed engine.
  *
  * All functions are codegen-friendly `Column` expressions (no UDFs).
  */
object Portable {

  /** Whitespace tokens (documents are single-space separated). */
  def tokens(text: Column): Column = split(text, " ")

  /** 32-bit hash from the first 8 md5 hex chars, as an unsigned long. */
  def md5Hash32(c: Column): Column =
    conv(substring(md5(c), 1, 8), 16, 10).cast("long")

  /** Seeded variant: independent hash family member `seed`. */
  def md5Hash32(seed: Int, c: Column): Column =
    md5Hash32(concat_ws(":", lit(seed), c))

  /** Deterministic [0, buckets) assignment from a seeded md5 of an id —
    * the reproducible split/sample/drift primitive. Oracle form:
    * `('0x' || substr(md5('<seed>:' || id), 1, 8))::BIGINT % buckets`. */
  def md5Bucket(seed: String, id: Column, buckets: Int): Column =
    md5Hash32(concat_ws(":", lit(seed), id.cast("string"))) % buckets

  /** Distinct word n-gram (shingle) md5 hashes of a token array — the
    * native one-pass [[org.apache.spark.sql.graft.WordShingles]]
    * expression, value-identical to the portable
    * `array_distinct(transform(sequence(...), i => md5(concat_ws(" ",
    * slice(toks, i, n)))))` composition that the DuckDB oracles
    * recompute (WordShinglesSpec pins the equivalence). */
  def shingles(toks: Column, n: Int): Column =
    org.apache.spark.sql.graft.WordShingles.ofColumn(toks, n, hashed = true)

  /** Cast a float array to doubles (exact). */
  def asDoubles(a: Column): Column = a.cast("array<double>")

  /** Left-to-right fold dot product over two double arrays — a native
    * codegen [[DotProduct]] expression, value-identical to the
    * `aggregate(zip_with(...))` HOF chain it replaces (same fold order,
    * same per-element multiply-add rounding). */
  def dot(a: Column, b: Column): Column =
    org.apache.spark.sql.graft.DotProduct.ofColumns(a, b)

  /** Distinct-count of left array elements present in the right array —
    * a native allocation-free [[org.apache.spark.sql.graft
    * .IntersectionSize]], value-identical to the portable
    * `size(array_intersect(a, b))` it replaces (the per-candidate-pair
    * inner loop of the exact set-similarity joins; equivalence pinned
    * in RewriteIntersectionSizeSpec). */
  def intersectionSize(a: Column, b: Column): Column =
    org.apache.spark.sql.graft.IntersectionSize.ofColumns(a, b)

  /** Count of tokens contained in a fixed vocabulary list. */
  def countIn(toks: Column, words: Seq[String]): Column =
    size(filter(toks, t => t.isin(words.map(w => w: Any): _*)))
}
