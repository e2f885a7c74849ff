package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/**
 * Text-analysis building blocks for LLM-data pipelines: tokenization,
 * shingling, and the deterministic hash family shared by the dedup
 * operators. Everything is a Catalyst column expression (codegen'd,
 * no UDFs) and has an exact SQL twin runnable in DuckDB — see
 * PipelineQueries for the paired oracles.
 */
object TextOps {

  /** Single-space tokenization (corpus is single-spaced lowercase). */
  def tokens(text: Column): Column = split(text, " ")

  /**
   * Distinct word n-gram shingles; documents shorter than n collapse to one
   * whole-text shingle (so every doc has ≥1 shingle and tiny docs can still
   * be near-dup candidates).
   */
  def shingles(toks: Column, n: Int = 5): Column = {
    // Built from n shifted slices zipped elementwise — O(tokens) per doc.
    // (The obvious transform(sequence(1, L-n+1), i => slice(toks, i, n))
    // re-slices per position: O(tokens²) per doc in the interpreted HOF
    // path, which dominated the whole dedup pipeline on long docs.)
    val m = size(toks) - (n - 1) // shingle count
    val shifted = (0 until n).map(o => slice(toks, lit(o + 1), m))
    when(size(toks) < n, array(concat_ws(" ", toks)))
      .otherwise(array_distinct(transform(
        arrays_zip(shifted: _*),
        s => concat_ws(" ", (0 until n).map(o => s.getField(o.toString)): _*))))
  }

  /**
   * Deterministic 32-bit hash family over strings: four members per md5
   * digest — member `i` is hex digits [1+8·(i%4), 8] of md5((i/4)+":"+s)
   * read base-16. One digest yields members 4i..4i+3, so a K=8 MinHash
   * signature costs TWO md5 evaluations per shingle instead of eight (md5
   * dominates the signature stage; the min-of-32-bit statistics are
   * unaffected — collisions within a document's shingle set are ~|S|²/2³³,
   * negligible at any real document size). Identical in DuckDB as
   * `CAST(('0x'||substr(md5((i//4)||':'||s), 1+8*(i%4), 8)) AS BIGINT)` —
   * md5 is the one hash both engines compute bit-identically.
   */
  def hashMember(i: Int, s: Column): Column =
    conv(substr(md5(concat(lit(s"${i / 4}:"), s)), lit(1 + 8 * (i % 4)), lit(8)),
      16, 10).cast("long")

  /** 60-bit token hash (no family index): native digest-prefix read
    * (functions/Md5HighBits — skips the hex-encode/substr/radix-parse
    * round trip on the hot per-shingle/per-gram paths). Value-identical
    * to `conv(substr(md5(s),1,15),16,10)` and to the DuckDB oracles'
    * `CAST(('0x'||substr(md5(s),1,15)) AS BIGINT)` (Md5HighBitsSpec). */
  def tokenHash(s: Column): Column =
    graft.functions.Md5HighBits.hash60(s)

  /** Canonical content fingerprint: md5 of the sorted distinct token set.
    * Word order and repetition are erased; exact-content clusters share it. */
  def fingerprint(text: Column): Column =
    md5(concat_ws(" ", array_sort(array_distinct(tokens(text)))))

  /** Deterministic 32-bit sampling gate: the first 8 hex digits of
    * md5(x) read base-16 — reproducible, partition-independent, and
    * engine-portable (`CAST('0x'||substr(md5(x),1,8) AS BIGINT)` in
    * DuckDB). One definition for every sampling/sharding operator
    * (pipe_sample, pipe_mix, pipe_shard) so the gate can never drift
    * between them. */
  def md5Gate(x: Column): Column =
    graft.functions.Md5HighBits.hash32(x.cast("string"))

  // --- PII redaction -------------------------------------------------------
  // Patterns restricted to constructs where Java regex (Spark) and RE2
  // (DuckDB) agree exactly: character classes + greedy quantifiers, no
  // backrefs/lookaround (RE2 implements Perl leftmost-greedy semantics for
  // this subset, so the matched spans are identical).
  val emailRe = "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}"
  val urlRe = "https?://[^ ]+"
  val phoneRe = "[0-9]{3}-[0-9]{3}-[0-9]{4}"

  /** Redact emails → [email], then URLs → [url], then phones → [phone].
    * Order matters only if spans could nest (they can't here: our URL
    * pattern stops at a space and carries no '@'); fixed order keeps the
    * operator deterministic regardless. Pure per-row column algebra —
    * a map over the corpus scan, zero shuffle at any scale. */
  def redact(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, emailRe, "[email]"),
        urlRe, "[url]"),
      phoneRe, "[phone]")
}
