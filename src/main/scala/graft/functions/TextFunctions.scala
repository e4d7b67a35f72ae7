package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Column-level text primitives for the training-data pipeline
  * operators (dedup, quality, lang-id, fingerprinting).
  *
  * Everything here is a Catalyst expression tree over built-in
  * higher-order functions — no UDFs — so the operators stay inside
  * whole-stage codegen and scale linearly per row with zero shuffle.
  * Each primitive has an exact DuckDB translation used by the
  * oracles (list_transform / list_reduce with a prepended init
  * mirrors Spark's transform / aggregate left-fold semantics).
  */
object TextFunctions {

  /** Fold modulus for fingerprints (fits 31-bit; products stay < 2^63). */
  val FpPrime: Long = 1000000007L

  /** Whitespace tokens; multi-space collapses, leading/trailing
    * trimmed. DuckDB: regexp_split_to_array(trim(x), '\s+').
    */
  def tokens(c: Column): Column = split(trim(c), "\\s+")

  /** Word 2-gram shingles (distinct), the dedup signature unit.
    * DuckDB: list_distinct(list_transform(range(1, len(t)), i -> t[i] || ' ' || t[i+1])).
    * Note Spark sequence(1, n) is INCLUSIVE while DuckDB range(1, n)
    * is exclusive — hence size-1 here vs len there.
    */
  def shingles2(toks: Column): Column =
    when(size(toks) >= 2,
      array_distinct(transform(
        sequence(lit(1), size(toks) - 1),
        i => concat_ws(" ", element_at(toks, i), element_at(toks, i + 1)))))
      .otherwise(array().cast(ArrayType(StringType)))

  /** Exact Jaccard over two distinct-element arrays. Both operands of
    * the division are exact ints, so the resulting double is
    * bit-identical across engines.
    */
  def jaccard(a: Column, b: Column): Column =
    size(array_intersect(a, b)).cast(DoubleType) /
      size(array_union(a, b)).cast(DoubleType)

  /** Order-sensitive rolling-hash document fingerprint: fold
    * h = (h*31 + len(tok)*131 + codepoint(tok[0])) mod p over tokens.
    * A content+structure signature cheap enough to compute inline at
    * ingest. DuckDB twin:
    * list_reduce(list_prepend(0, list_transform(toks, t ->
    *   length(t)*131 + ascii(t))), (a,x) -> (a*31 + x) % p)
    * — the prepended 0 replicates Spark aggregate's explicit zero.
    */
  def fingerprint(toks: Column): Column =
    aggregate(
      transform(toks, t =>
        length(t).cast(LongType) * lit(131L) + ascii(t).cast(LongType)),
      lit(0L),
      (acc, x) => (acc * lit(31L) + x) % lit(FpPrime))

  /** Ratio of characters matching a class (e.g. punctuation) —
    * length-difference trick, identical in DuckDB with the 'g' flag.
    */
  def charClassRatio(text: Column, clazz: String): Column =
    (length(text) - length(regexp_replace(text, clazz, "")))
      .cast(DoubleType) / length(text).cast(DoubleType)

  /** Tiny English stopword inventory for lang-id/quality heuristics.
    * Deliberately short — the point is the distributed shape
    * (array_intersect against a broadcast literal), not NLP quality.
    */
  val EnglishStopwords: Seq[String] = Seq(
    "the", "a", "of", "and", "to", "in", "is", "it", "for", "on",
    "with", "as", "at", "by", "from", "or", "an", "be", "this", "that")

  /** Count of distinct tokens that are English stopwords. */
  def stopwordHits(toks: Column): Column =
    size(array_intersect(array_distinct(toks),
      lit(EnglishStopwords.toArray)))
}
