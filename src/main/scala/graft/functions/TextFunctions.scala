package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis building blocks for training-data pipelines, all pure
  * Catalyst built-ins (codegen'd, no UDFs — every function here stays
  * inside whole-stage codegen and is embarrassingly parallel: narrow
  * transforms, no shuffle).
  *
  * Portability contract: every hash is derived from md5 (identical
  * across engines), so the DuckDB oracles replicate results bit-for-bit
  * rather than "approximately" — see queries/TextQueries.scala.
  */
object TextFunctions {

  /** Whitespace tokens (the baseline tokenizer). */
  def tokens(text: Column): Column = split(text, "\\s+")

  /** A BPE-ish subword count without a vocab: runs of letters, runs of
    * digits, and single other non-space chars each count as one token —
    * the standard pre-tokenization regex shape. */
  def subwordCount(text: Column): Column =
    size(regexp_extract_all(text, lit("[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 ]"), lit(0)))

  /** First 32 bits of md5 as a non-negative long — the portable hash
    * primitive used by fingerprinting / minhash / simhash. */
  def hash32(c: Column): Column =
    conv(substring(md5(c), 1, 8), 16, 10).cast("long")

  /** SQL expression string for character k-gram shingles (expr form:
    * `substring` with a column start position needs the lambda-SQL
    * shape, which also keeps the text aligned with the DuckDB oracle). */
  def shinglesExpr(textCol: String, k: Int): String =
    s"IF(length($textCol) >= $k, " +
      s"transform(sequence(1, length($textCol) - ${k - 1}), " +
      s"i -> substring($textCol, i, $k)), cast(array() as array<string>))"

  /** Hashes of the k-gram shingles (portable 32-bit md5-derived). */
  def shingleHashesExpr(textCol: String, k: Int): String =
    s"transform(${shinglesExpr(textCol, k)}, " +
      "s -> cast(conv(substring(md5(s), 1, 8), 16, 10) as bigint))"

  /** Winnowing fingerprints (Schleimer et al., SIGMOD'03 "local
    * algorithms for document fingerprinting"): slide a window of `w`
    * shingle hashes, keep each window's minimum, dedup. Robust to
    * insertions/reordering; output size ~ 2·len/(w+1). `hashesCol`
    * should be a projected column of [[shingleHashesExpr]] so the hash
    * array is computed once, not re-derived per sub-expression. */
  def winnowExpr(hashesCol: String, w: Int): String =
    s"IF(size($hashesCol) >= $w, " +
      s"array_distinct(transform(sequence(1, size($hashesCol) - ${w - 1}), " +
      s"i -> array_min(slice($hashesCol, i, $w)))), cast(array() as array<bigint>))"
}
