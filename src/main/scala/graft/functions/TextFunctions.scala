package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text primitives for the training-data pipeline operators, built purely
  * from codegen'd `org.apache.spark.sql.functions` (no UDFs) so they stay
  * inside whole-stage codegen and push work to the executors.
  *
  * Every definition has an exact DuckDB-SQL counterpart (documented inline)
  * so the operators built on top remain oracle-checkable.
  */
object TextFunctions {

  /** Whitespace tokens, lowercased. DuckDB: string_split_regex(lower(trim(x)), '\s+') */
  def tokens(c: Column): Column = split(lower(trim(c)), "\\s+")

  /** Token count as BIGINT without materializing the token array.
    * DuckDB: CAST(len(regexp_extract_all(x, '\S+')) AS BIGINT) */
  def tokenCount(c: Column): Column = regexp_count(c, lit("\\S+")).cast("long")

  /** Whitespace-normalized text (fingerprint input).
    * DuckDB: regexp_replace(lower(trim(x)), '\s+', ' ', 'g') */
  def normText(c: Column): Column =
    regexp_replace(lower(trim(c)), "\\s+", " ")

  /** Distinct word n-gram shingles ("a b c") from a token array.
    * DuckDB: list_distinct([array_to_string(toks[i:i+n-1], ' ')
    *                        FOR i IN generate_series(1, len(toks)-n+1)])
    * Guarded: Spark's sequence(1, 0) counts DOWN, so short docs must map to
    * an empty array explicitly. */
  def shingles(toks: Column, n: Int): Column =
    when(size(toks) >= n,
      array_distinct(transform(
        sequence(lit(1), size(toks) - (n - 1)),
        i => concat_ws(" ", slice(toks, i, lit(n))))))
      .otherwise(array().cast("array<string>"))

  /** Per-token 64-bit hashes for sketching (MinHash / SimHash input). */
  def tokenHashes(toks: Column): Column = transform(toks, t => xxhash64(t))
}
