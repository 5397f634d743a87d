package graft.llm

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Shared text primitives for the LLM-pipeline operators (SURVEY.md §2.10).
  *
  * The polynomial rolling hash is implemented in plain integer arithmetic
  * (mod 1e9+7) instead of Spark's murmur3 `hash()` so the SAME hash is
  * expressible in DuckDB SQL — engine-native hash functions differ and would
  * make every hash-derived operator un-oracle-able. All folds are
  * left-to-right over <=2^31 intermediate values: deterministic and
  * overflow-free in both engines.
  */
object TextUtil {
  val M = 1000000007L

  /** Whitespace tokens, empty strings dropped. */
  def tokens(text: Column): Column =
    filter(split(text, " "), t => length(t) > 0)

  /** Polynomial rolling hash of a string column: fold (acc*31 + code) mod M.
    * Empty strings short-circuit to the seed — Spark's sequence(1, 0) counts
    * DOWN, which would otherwise fold twice (diverging from sqlPolyHash and
    * the codegen'd PolyHash, which both return the seed). */
  def polyHash(t: Column, seed: Long): Column =
    when(length(t) === 0, lit(seed)).otherwise(
      aggregate(sequence(lit(1), length(t)), lit(seed),
        (acc, i) => pmod(acc * lit(31L) + ascii(t.substr(i, lit(1))), lit(M))))

  /** Distinct word 3-gram shingles joined with '_'. Guarded: Spark's
    * sequence(1, 0) counts DOWN, so short docs need the explicit empty. */
  def shingles3(toks: Column): Column =
    when(size(toks) < 3, array().cast("array<string>"))
      .otherwise(array_distinct(transform(sequence(lit(1), size(toks) - 2),
        i => concat_ws("_", element_at(toks, i), element_at(toks, i + 1),
          element_at(toks, i + 2)))))

  // --- DuckDB SQL mirrors (1:1 with the Column builders above) ---

  def sqlTokens(text: String): String =
    s"list_filter(string_split($text, ' '), t -> length(t) > 0)"

  def sqlPolyHash(t: String, seed: Long): String =
    s"list_reduce(list_prepend(CAST($seed AS BIGINT), " +
      s"list_transform(range(1, length($t)+1), " +
      s"i -> CAST(ascii($t[CAST(i AS INTEGER)]) AS BIGINT))), " +
      s"(acc, x) -> (acc*31 + x) % $M)"

  def sqlShingles3(toks: String): String =
    s"list_distinct(list_transform(range(1, greatest(len($toks)-2, 0)+1), " +
      s"i -> $toks[CAST(i AS INTEGER)] || '_' || $toks[CAST(i+1 AS INTEGER)] " +
      s"|| '_' || $toks[CAST(i+2 AS INTEGER)]))"
}
