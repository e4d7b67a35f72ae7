package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables
import graft.Catalog.Q

/** Edit-distance similarity join — the string-metric member of the
  * near-dup family (d2 minhash: set similarity, d3 simhash: hamming,
  * d4 ppjoin: n-gram jaccard, m8 phash: pixels; this is LEVENSHTEIN,
  * the metric that catches typos/OCR noise where token-level
  * signatures agree or miss entirely).
  *
  * Blocking is the FastSS / SymSpell deletion neighborhood (Bocek et
  * al. '07): if ed(s,t) ≤ k then the ≤k-deletion neighborhoods of s
  * and t intersect (delete the k edited positions from each side of
  * an optimal alignment and both collapse to a common subsequence) —
  * so an equi-join on neighborhood variants finds every true pair,
  * and an exact levenshtein verify kills the false positives the
  * converse direction allows. The whole derivation is higher-order
  * array functions (sequence/transform/flatten — codegen'd, no UDF).
  *
  * Scale shape at 100 TB: the join runs on the DEDUPLICATED string
  * vocabulary (names repeat across a fact table; dedupe first is
  * d1's move), and the neighborhood explode emits a BOUNDED
  * 1 + L + L(L−1)/2 ≈ 60 short variants per vocab entry, so the one
  * wide op is an equi-shuffle of O(V·L²) signature rows instead of
  * the O(V²) all-pairs a naive levenshtein join plans (the oracle
  * brute-forces exactly that — affordable only because it is the
  * oracle). Verify cost is bounded by candidate-bucket sizes, the
  * d2/d3/m8 candidate-then-verify contract.
  */
object FuzzyJoin {

  /** Edit-distance threshold: 2 covers the classic typo classes
    * (substitution, insertion, deletion, and adjacent pairs of them).
    */
  val K = 2

  /** All strings obtained by deleting exactly one character. */
  private def del1(s: Column): Column =
    transform(sequence(lit(1), length(s)),
      i => concat(s.substr(lit(1), i - lit(1)),
        s.substr(i + lit(1), length(s))))

  /** The ≤2-deletion neighborhood: the string itself, every
    * 1-deletion, every 2-deletion (dedup'd — deleting i then j and
    * j then i coincide).
    */
  private[graft] def neighborhood(s: Column): Column =
    array_distinct(concat(
      array(s), del1(s), flatten(transform(del1(s), v => del1(v)))))

  /** Core: distinct-pair edit-distance join of a one-column string
    * relation with itself, via neighborhood blocking + exact verify.
    */
  private[graft] def fuzzyPairs(names: DataFrame): DataFrame = {
    val sigs = names.select(col("name"),
      explode(neighborhood(col("name"))).as("sig"))
    sigs.as("a").join(sigs.as("b"),
        col("a.sig") === col("b.sig") && col("a.name") < col("b.name"))
      .select(col("a.name").as("name_a"), col("b.name").as("name_b"))
      .distinct()
      .withColumn("ed",
        levenshtein(col("name_a"), col("name_b")).cast("long"))
      .where(col("ed") <= K)
  }

  /** Judged fuzzy join on the part-name vocabulary: every distinct
    * pair of names within levenshtein 2, with the distance. The
    * oracle brute-forces all pairs; the engine never does.
    */
  def q101FuzzyJoin(s: SparkSession, d: String): DataFrame =
    fuzzyPairs(Tables.part(s, d).select(col("p_name").as("name")).distinct())
      .orderBy(col("name_a"), col("name_b"))

  val queries: Seq[Q] = Seq(
    Q("q101_fuzzy_join", q101FuzzyJoin, Some(s"""
      WITH d AS (SELECT DISTINCT p_name AS name FROM part)
      SELECT a.name AS name_a, b.name AS name_b,
             CAST(levenshtein(a.name, b.name) AS BIGINT) AS ed
      FROM d a, d b
      WHERE a.name < b.name AND levenshtein(a.name, b.name) <= $K
      ORDER BY 1, 2""")))
}
