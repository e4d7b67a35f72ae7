package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Catalog.Q
import graft.sources.Tables

/** EXACT global quantiles without a global sort — the scale-correct
  * complement to q55 (Spark's `percentile_disc`, which buffers every
  * group's values in one aggregation buffer) and q32 (Greenwald-
  * Khanna, approximate by construction). The reference's own argmax
  * job (Job2.java:51-78) is the degenerate p=1.0 case of this
  * operator; here the selection generalizes to any rank.
  *
  * Algorithm: iterative histogram refinement (the classic
  * distributed k-th-smallest). Each round partitions the candidate
  * value range into ≤4096 equal-width buckets, runs ONE partial-agg
  * histogram pass (a 4096-row shuffle regardless of data size),
  * locates the bucket holding the target rank on the driver, and
  * recurses into it with the residual rank. When the candidate range
  * itself fits in one histogram (width-1 buckets), the bucket id IS
  * the answer — no final sort, no row ever collected. Convergence is
  * log₄₀₉₆(domain) full scans: 2 passes for any 24-bit domain, 3 up
  * to 68 billion distinct values — each pass a pushdown-friendly
  * range filter over the scan, so at 100 TB the refinement scans
  * shrink with the range instead of rereading the table.
  */
object ExactQuantile {

  private val Buckets = 4096L

  /** The k-th smallest (0-indexed) value of long-valued `c` in `df`.
    * Requires 0 <= k < df.count (callers derive k from the same
    * count; out-of-range k fails on the rank invariant below).
    */
  def kthSmallest(df: DataFrame, c: Column, k: Long): Long = {
    val b = df.agg(min(c).cast("long"), max(c).cast("long")).head()
    require(!b.isNullAt(0), "kthSmallest over an empty frame")
    var lo = b.getLong(0)
    var hi = b.getLong(1)
    var rank = k
    val v = c.cast("long")
    while (hi > lo) {
      // ceil width so ≤ Buckets buckets always cover [lo, hi]
      val width = ((hi - lo + 1) + Buckets - 1) / Buckets
      val hist = df
        .where(v >= lo && v <= hi)
        .groupBy(((v - lo) / width).cast("long").as("b"))
        .agg(count(lit(1)).as("n"))
        .collect()
        .map(r => (r.getLong(0), r.getLong(1)))
        .sortBy(_._1)
      var acc = 0L
      var i = 0
      var found = -1L
      while (found < 0 && i < hist.length) {
        val (bid, n) = hist(i)
        if (acc + n > rank) found = bid else { acc += n; i += 1 }
      }
      require(found >= 0, s"rank $rank exceeds rows in [$lo, $hi]")
      rank -= acc
      val newLo = lo + found * width
      hi = math.min(hi, newLo + width - 1)
      lo = newLo
      // width == 1 ⇒ every kept row equals lo ⇒ hi == lo ⇒ loop exits
    }
    lo
  }

  /** Judged exact median + p90 of lineitem's extended price in cents:
    * both ranks resolved by [[kthSmallest]] (two histogram passes
    * each for the ~24-bit cents domain), certified against the
    * oracle's row_number()-over-full-sort selection at the exact
    * same 0-indexed ranks ⌊n/2⌋ and ⌊9n/10⌋ — rank semantics pinned
    * by position, not by an engine's percentile law, so the two
    * engines cannot disagree on interpolation.
    */
  def q112ExactMedian(s: SparkSession, d: String): DataFrame = {
    val cents = round(col("l_extendedprice") * 100).cast("long")
    val li = Tables.lineitem(s, d).select(cents.as("cents"))
    val n = li.count()
    val med = kthSmallest(li, col("cents"), n / 2)
    val p90 = kthSmallest(li, col("cents"), 9 * n / 10)
    import s.implicits._
    Seq((n, med, p90)).toDF("n_rows", "median_cents", "p90_cents")
  }

  val queries: Seq[Q] = Seq(
    Q("q112_exact_median", q112ExactMedian, Some("""
      WITH ec AS (SELECT CAST(round(l_extendedprice * 100) AS BIGINT)
                    AS cents FROM lineitem),
      ranked AS (SELECT cents,
                        row_number() OVER (ORDER BY cents) AS rn,
                        count(*) OVER () AS n
                 FROM ec)
      SELECT max(n) AS n_rows,
             max(CASE WHEN rn = n // 2 + 1 THEN cents END) AS median_cents,
             max(CASE WHEN rn = (9 * n) // 10 + 1 THEN cents END)
               AS p90_cents
      FROM ranked""")))
}
