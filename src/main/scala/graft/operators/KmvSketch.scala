package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Encoder, SparkSession}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.sources.Tables
import graft.Catalog.Q

/** KMV (k-minimum-values) distinct-count sketch — the member of the
  * approximate-aggregate family (HLL q22/q93, GK quantiles q32,
  * Misra-Gries q86) that supports set INTERSECTION, which HLL
  * structurally cannot (union-only; inclusion-exclusion explodes the
  * error for small overlaps). The Beyer et al. (PODS '07) estimator:
  * keep the k smallest distinct hash values seen; if fewer than k
  * exist the sketch IS the exact set, otherwise the k-th minimum
  * h_k estimates density and (k−1)·M / h_k estimates the distinct
  * count. Two sketches combine: the k smallest of the union estimate
  * the union, and the fraction of those present in both inputs
  * scales it down to the intersection.
  *
  * Scale shape at 100 TB: the sketch state is a BOUNDED sorted
  * vector (k longs), the Aggregator is map-combinable, so each
  * group's distinct-count costs one partial-agg shuffle of k-sized
  * buffers — never a shuffle of the keys themselves (the
  * countDistinct twin in the same query shows what it replaces: an
  * expand + full key shuffle, run here only as the judged error
  * witness). Every arithmetic step is exact-integer or a single
  * IEEE double op, and the hash is the catalog's SQL-replayable
  * multiplicative hash (q98 precedent; production would swap in
  * xxhash64 for a wider domain at the cost of oracle checkability),
  * so the whole sketch — estimates included — is deterministic under
  * any partitioning and the DuckDB oracle replays it hash-strict.
  */
object KmvSketch {

  /** Bounded k-minimum-distinct-values Aggregator. Buffer invariant:
    * sorted ascending, distinct, size ≤ k — so `last` is the current
    * k-th minimum and admission is a single comparison. Duplicate
    * hashes beyond the kept k are irrelevant by construction (they
    * exceed the current k-th min), which is why NO global distinct
    * is needed before this aggregator: one pass, bounded state.
    */
  final class MinKDistinct(k: Int)
      extends Aggregator[Long, Seq[Long], Seq[Long]] {
    override def zero: Seq[Long] = Vector.empty
    override def reduce(b: Seq[Long], h: Long): Seq[Long] =
      if (b.size < k)
        if (b.contains(h)) b else (b :+ h).sorted
      else if (h >= b.last || b.contains(h)) b
      else (b.init :+ h).sorted
    override def merge(a: Seq[Long], b: Seq[Long]): Seq[Long] =
      (a ++ b).distinct.sorted.take(k)
    override def finish(r: Seq[Long]): Seq[Long] = r
    override def bufferEncoder: Encoder[Seq[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
    override def outputEncoder: Encoder[Seq[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
  }

  /** Hash domain modulus, shared with the oracle. */
  val M: Long = 1000000007L

  /** (k−1)·M for k = 64, exact in a Long and in a double (< 2^53). */
  private val K = 64
  private val Scale = (K - 1).toLong * M

  /** Distinct-count estimate from a sorted-ascending KMV vector:
    * exact below saturation, (k−1)·M / h_k at it.
    */
  private def est(kmv: Column): Column =
    when(size(kmv) < K, size(kmv).cast(DoubleType))
      .otherwise(lit(Scale).cast(DoubleType) /
        element_at(kmv, K).cast(DoubleType))

  /** Core comparison over a prepared (f, h, key) input with exactly
    * two flag values `fa` and `fb`: one bounded-agg pass builds both
    * sketches and the exact distinct witnesses, one key-bitmap pass
    * builds the exact intersection witness, and the single output row
    * carries sketch estimates next to their exact counterparts.
    */
  private[graft] def kmvCompare(
      base: DataFrame, fa: String, fb: String): DataFrame = {
    val minK = udaf(new MinKDistinct(K))
    // 2 groups → 1 row via conditional max (arrays order lexically;
    // max over {null, v} picks v)
    val sk = base.groupBy(col("f"))
      .agg(minK(col("h")).as("kmv"),
        countDistinct(col("key")).as("exact"))
      .groupBy()
      .agg(
        max(when(col("f") === fa, col("kmv"))).as("kmv_a"),
        max(when(col("f") === fa, col("exact"))).as("xa"),
        max(when(col("f") === fb, col("kmv"))).as("kmv_b"),
        max(when(col("f") === fb, col("exact"))).as("xb"))
    // exact intersection: one key-bitmap aggregate, no self-join
    val inter = base.groupBy(col("key"))
      .agg(max(when(col("f") === fa, 1).otherwise(0)).as("ia"),
        max(when(col("f") === fb, 1).otherwise(0)).as("ib"))
      .where(col("ia") === 1 && col("ib") === 1)
      .groupBy().agg(count(lit(1)).as("exact_inter"))
    val ku = slice(array_sort(array_union(col("kmv_a"), col("kmv_b"))),
      1, K)
    val estU = est(ku)
    val matches =
      size(array_intersect(array_intersect(ku, col("kmv_a")), col("kmv_b")))
    // Combine the two singleton aggregates without ANY join (a 1×1
    // join of constant-key rows still plans as a nested-loop join
    // after constant folding): union the rows null-padded and take
    // the non-null value per column — the same 2-rows→1 conditional
    // max the sketch aggregate itself uses.
    val merged = sk
      .withColumn("exact_inter", lit(null).cast(LongType))
      .unionByName(inter.select(
        lit(null).cast(ArrayType(LongType)).as("kmv_a"),
        lit(null).cast(LongType).as("xa"),
        lit(null).cast(ArrayType(LongType)).as("kmv_b"),
        lit(null).cast(LongType).as("xb"),
        col("exact_inter")))
      .groupBy()
      .agg(max(col("kmv_a")).as("kmv_a"), max(col("xa")).as("xa"),
        max(col("kmv_b")).as("kmv_b"), max(col("xb")).as("xb"),
        max(col("exact_inter")).as("exact_inter"))
    merged
      .select(
        est(col("kmv_a")).as("est_a"),
        col("xa").as("exact_a"),
        est(col("kmv_b")).as("est_n"),
        col("xb").as("exact_n"),
        estU.as("est_union"),
        ((matches.cast(DoubleType) / size(ku).cast(DoubleType)) * estU)
          .as("est_inter"),
        col("exact_inter"))
  }

  /** Judged KMV comparison on lineitem: distinct order keys of the
    * 'A' and 'N' return-flag populations, their union, and their
    * intersection — each estimated from 64-value sketches AND
    * counted exactly in the same row, so the gate certifies the
    * estimator arithmetic while the spec bounds its error.
    */
  def q99KmvSketch(s: SparkSession, d: String): DataFrame =
    kmvCompare(
      Tables.lineitem(s, d)
        .where(col("l_returnflag").isin("A", "N"))
        .select(col("l_returnflag").as("f"),
          pmod(col("l_orderkey") * lit(2654435761L), lit(M)).as("h"),
          col("l_orderkey").as("key")),
      "A", "N")

  val queries: Seq[Q] = Seq(
    Q("q99_kmv_sketch", q99KmvSketch, Some(s"""
      WITH hs AS (
        SELECT DISTINCT l_returnflag AS f,
               CAST((l_orderkey * 2654435761) % $M AS BIGINT) AS h
        FROM lineitem WHERE l_returnflag IN ('A','N')),
      ka AS (SELECT h FROM hs WHERE f = 'A' ORDER BY h LIMIT $K),
      kb AS (SELECT h FROM hs WHERE f = 'N' ORDER BY h LIMIT $K),
      ku AS (SELECT DISTINCT h FROM
               (SELECT h FROM ka UNION ALL SELECT h FROM kb)
             ORDER BY h LIMIT $K),
      ex AS (SELECT
               count(DISTINCT CASE WHEN l_returnflag = 'A'
                                   THEN l_orderkey END) AS xa,
               count(DISTINCT CASE WHEN l_returnflag = 'N'
                                   THEN l_orderkey END) AS xb
             FROM lineitem),
      ei AS (SELECT count(*) AS exact_inter FROM
               (SELECT l_orderkey FROM lineitem WHERE l_returnflag = 'A'
                INTERSECT
                SELECT l_orderkey FROM lineitem WHERE l_returnflag = 'N') t),
      st AS (SELECT
               (SELECT count(*) FROM ka) AS ca, (SELECT max(h) FROM ka) AS ha,
               (SELECT count(*) FROM kb) AS cb, (SELECT max(h) FROM kb) AS hb,
               (SELECT count(*) FROM ku) AS cu, (SELECT max(h) FROM ku) AS hu,
               (SELECT count(*) FROM ku
                WHERE h IN (SELECT h FROM ka)
                  AND h IN (SELECT h FROM kb)) AS m),
      s2 AS (SELECT *,
               CASE WHEN cu < $K THEN CAST(cu AS DOUBLE)
                    ELSE CAST($Scale AS DOUBLE) / CAST(hu AS DOUBLE)
               END AS est_union
             FROM st)
      SELECT
        CASE WHEN ca < $K THEN CAST(ca AS DOUBLE)
             ELSE CAST($Scale AS DOUBLE) / CAST(ha AS DOUBLE) END AS est_a,
        ex.xa AS exact_a,
        CASE WHEN cb < $K THEN CAST(cb AS DOUBLE)
             ELSE CAST($Scale AS DOUBLE) / CAST(hb AS DOUBLE) END AS est_n,
        ex.xb AS exact_n,
        est_union,
        (CAST(m AS DOUBLE) / CAST(cu AS DOUBLE)) * est_union AS est_inter,
        ei.exact_inter
      FROM s2, ex, ei""")))
}
