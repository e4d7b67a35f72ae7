package graft.operators

import org.apache.spark.sql.{DataFrame, Encoder, SparkSession}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._
import graft.Catalog.Q
import graft.functions.TextFunctions
import graft.sources.Tables

/** Misra-Gries heavy hitters — the frequent-items member of the
  * approximate-aggregate family next to HLL (q22) and the GK
  * quantile sketch (q32), deployed in the TWO-PASS exact pattern:
  *
  *  pass 1: a bounded MG summary (≤ capacity counters) per partition,
  *          merged map-side like any partial aggregate — the
  *          mergeable-summaries result (Agarwal et al., PODS'12) is
  *          what makes the sketch shuffle-safe: merge-then-trim
  *          keeps the n/(capacity+1) error bound under ANY merge
  *          tree, so the candidate set is a SUPERSET of every item
  *          with true frequency > n/(capacity+1), regardless of how
  *          Spark partitions the data;
  *  pass 2: exact counts for the ≤ capacity candidates only
  *          (broadcast-friendly isin filter; the aggregate touches
  *          ≤ capacity distinct keys).
  *
  * The 100 TB point is what the naive plan would shuffle: a straight
  * `groupBy(word)` moves the ENTIRE vocabulary — billions of
  * distinct n-grams on a web corpus — across the wire to count items
  * of which only k matter. Here the only full-vocabulary structure
  * ever built is the per-task KB-scale MG map, the driver receives
  * one ≤ capacity summary (the model-artifact pattern, like e5's
  * centroids), and the second scan's aggregate is k-bounded.
  *
  * Determinism: the CANDIDATE set depends on merge order (any MG
  * implementation's does), but the JUDGED output does not — pass 2
  * filters candidates by exact count > n/k, and the superset
  * guarantee (capacity+1 > k) means every true heavy hitter is in
  * every possible candidate set. HeavyHittersSpec pins exactly this:
  * adversarial repartitionings change nothing.
  */
object HeavyHitters {

  /** MG summary with at most `capacity` counters. Immutable-map
    * buffer for encoder transparency at gate scale; a production
    * port would be an ImperativeAggregate over an open-addressing
    * long map (same algorithm, no per-row allocation).
    */
  final class MisraGries(capacity: Int)
      extends Aggregator[String, Map[String, Long], Map[String, Long]] {
    require(capacity >= 1)

    override def zero: Map[String, Long] = Map.empty

    override def reduce(b: Map[String, Long], w: String): Map[String, Long] =
      b.get(w) match {
        case Some(c) => b.updated(w, c + 1)
        case None if b.size < capacity => b.updated(w, 1L)
        case None =>
          // overflow: decrement every counter (amortized O(1)/item —
          // each decrement pays down one prior increment)
          b.flatMap { case (k, c) => if (c > 1) Some(k -> (c - 1)) else None }
      }

    /** Merge-then-trim: sum counters, then subtract the
      * (capacity+1)-th largest count from all and drop non-positive
      * — the summary-merge that preserves the error bound.
      */
    override def merge(b1: Map[String, Long], b2: Map[String, Long])
        : Map[String, Long] = {
      val combined = b2.foldLeft(b1) { case (acc, (k, c)) =>
        acc.updated(k, acc.getOrElse(k, 0L) + c)
      }
      if (combined.size <= capacity) combined
      else {
        val cut = combined.values.toIndexedSeq.sorted(
          Ordering[Long].reverse)(capacity)
        combined.flatMap { case (k, c) =>
          if (c > cut) Some(k -> (c - cut)) else None
        }
      }
    }

    override def finish(b: Map[String, Long]): Map[String, Long] = b
    override def bufferEncoder: Encoder[Map[String, Long]] = ExpressionEncoder()
    override def outputEncoder: Encoder[Map[String, Long]] = ExpressionEncoder()
  }

  /** Candidate words + total token count from one scan. Capacity 127
    * against the judged k = 50 leaves a 2.5× error margin
    * (n/128 ≪ n/50), so the superset guarantee is never marginal.
    */
  private[graft] def sketch(words: DataFrame, capacity: Int)
      : (Seq[String], Long) = {
    val mg = udaf(new MisraGries(capacity))
    val row = words.agg(
      mg(col("w")).as("cand"), count(lit(1)).as("n")).head()
    (row.getMap[String, Long](0).keys.toSeq, row.getLong(1))
  }

  /** Words appearing in more than 1/k of all token positions across
    * the corpus (k = 50 — the stopword band on natural text), exact
    * counts, via sketch-then-verify. Tokenization is the t1-t8
    * convention (whitespace split of trimmed text).
    */
  def q86HeavyHitters(s: SparkSession, d: String): DataFrame = {
    val k = 50
    val words = Tables.documents(s, d)
      .select(explode(TextFunctions.tokens(col("text"))).as("w"))
    val (cands, n) = sketch(words, capacity = 127)
    val threshold = n / k
    words.where(col("w").isin(cands: _*))
      .groupBy(col("w"))
      .agg(count(lit(1)).as("cnt"))
      .where(col("cnt") > threshold)
      .orderBy(col("cnt").desc, col("w"))
  }

  val queries: Seq[Q] = Seq(
    Q("q86_heavy_hitters", q86HeavyHitters, Some("""
      WITH w AS (SELECT unnest(regexp_split_to_array(trim(text), '\s+')) AS w
                 FROM documents),
           t AS (SELECT count(*) AS n FROM w)
      SELECT w, count(*) AS cnt
      FROM w, t
      GROUP BY w, t.n
      HAVING count(*) > n // 50
      ORDER BY cnt DESC, w""")))
}
