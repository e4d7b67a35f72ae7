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
  * distributed k-th-smallest). Each round partitions a candidate
  * value range into ≤4096 equal-width buckets, runs ONE partial-agg
  * histogram pass (a 4096-row shuffle regardless of data size),
  * locates each target rank's bucket on the driver, and recurses
  * with the residual ranks. When a candidate range itself fits in
  * one histogram (width-1 buckets), the bucket id IS the answer —
  * no final sort, no row ever collected. Convergence is
  * log₄₀₉₆(domain) full scans: 2 passes for any 24-bit domain, 3 up
  * to 68 billion distinct values — each pass a pushdown-friendly
  * range filter over the scan, so at 100 TB the refinement scans
  * shrink with the range instead of rereading the table.
  *
  * MULTI-RANK selection shares passes: all ranks still inside one
  * candidate range resolve from the SAME histogram job, and only
  * after ranks split into different buckets do their refinements
  * fan out — so a full decile profile costs ~the same scans as a
  * single median, not 9× (the spec pins the pass count).
  */
object ExactQuantile {

  private val Buckets = 4096L

  /** Bucket width covering [lo, hi] in ≤ Buckets+1 buckets, with the
    * full-domain overflow guarded: `hi - lo` can wrap for a frame
    * containing both extreme longs, and a wrapped width of 0 would
    * silently resolve every rank to lo.
    */
  private def widthFor(lo: Long, hi: Long): Long = {
    val span = hi - lo
    if (span < 0) Long.MaxValue / Buckets + 1 else span / Buckets + 1
  }

  /** Test hook: histogram passes run by the last `kthSmallests`. */
  private[graft] var lastPasses: Int = 0

  /** The k-th smallest (0-indexed) value of long-valued `c` in `df`.
    * Requires 0 <= k < df.count (callers derive k from the same
    * count; an out-of-range k fails the rank invariant loudly).
    */
  def kthSmallest(df: DataFrame, c: Column, k: Long): Long =
    kthSmallests(df, c, Seq(k)).head

  /** Batch rank selection: the i-th result is the ks(i)-th smallest.
    * `bounds` (inclusive lo/hi of the value domain) skips the
    * min/max probe when the caller already holds them.
    */
  def kthSmallests(df: DataFrame, c: Column, ks: Seq[Long],
      bounds: Option[(Long, Long)] = None): Seq[Long] = {
    require(ks.nonEmpty, "kthSmallests needs at least one rank")
    lastPasses = 0
    val (lo, hi) = bounds.getOrElse {
      val b = df.agg(min(c).cast("long"), max(c).cast("long")).head()
      require(!b.isNullAt(0), "kthSmallests over an empty frame")
      (b.getLong(0), b.getLong(1))
    }
    val v = c.cast("long")
    val answers = resolve(df, v, lo, hi, ks.distinct.map(k => k -> k).toMap)
    ks.map(answers)
  }

  /** Resolve `ranks` (original rank → residual rank within [lo, hi])
    * to their values; one histogram job per recursion level per
    * surviving range, shared by every rank still inside it.
    */
  private def resolve(df: DataFrame, v: Column, lo: Long, hi: Long,
      ranks: Map[Long, Long]): Map[Long, Long] = {
    if (hi <= lo) return ranks.map { case (orig, _) => orig -> lo }
    if (hi - lo < 0) {
      // the domain spans >= 2^63: the per-row offset `v - lo` would
      // overflow (ANSI mode throws; legacy mode wraps rows near hi
      // into negative bucket ids, counting the largest values as the
      // smallest). Split the range at zero — neither half can wrap —
      // and route each rank by the negative-side count.
      lastPasses += 1
      val negCount = df.where(v >= lo && v < 0).count()
      val (negR, posR) = ranks.partition { case (_, r) => r < negCount }
      return (if (negR.isEmpty) Map.empty[Long, Long]
              else resolve(df, v, lo, -1L, negR)) ++
        (if (posR.isEmpty) Map.empty[Long, Long]
         else resolve(df, v, 0L, hi,
           posR.map { case (o, r) => o -> (r - negCount) }))
    }
    val width = widthFor(lo, hi)
    lastPasses += 1
    // integer `div`, never `/`: Spark's Divide is DOUBLE division,
    // which mis-buckets boundary values once v - lo exceeds 2^53 —
    // fatal for an operator whose contract is EXACTNESS on longs
    val hist = df
      .where(v >= lo && v <= hi)
      .select((v - lo).as("__d"))
      .groupBy(expr(s"__d div $width").as("b"))
      .agg(count(lit(1)).as("n"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .sortBy(_._1)
    // cumulative counts below each bucket
    val cumBefore = hist.scanLeft(0L)(_ + _._2)
    val located = ranks.map { case (orig, rank) =>
      val i = {
        var j = 0
        while (j < hist.length && cumBefore(j + 1) <= rank) j += 1
        require(j < hist.length, s"rank $rank exceeds rows in [$lo, $hi]")
        j
      }
      (orig, hist(i)._1, rank - cumBefore(i))
    }
    located.groupBy(_._2).flatMap { case (bucket, group) =>
      val newLo = lo + bucket * width
      val newHi = math.min(hi, newLo + width - 1)
      val residual = group.map { case (orig, _, r) => orig -> r }.toMap
      if (width == 1) residual.map { case (orig, _) => orig -> newLo }
      else resolve(df, v, newLo, newHi, residual)
    }
  }

  /** GROUPED exact rank selection: one rank per group, every group
    * resolved in the SAME histogram passes — `groupBy(g, bucket)`
    * with group-specific bucket arithmetic joined in from a
    * broadcast per-group bounds table. Each refinement level is ONE
    * partial-agg job over all groups (≤ groups·4096 result rows),
    * and a group's candidate range shrinks independently until its
    * width hits 1. This is the scale answer to `percentile_disc`'s
    * per-group buffering (q55): G groups × N rows resolve in
    * log₄₀₉₆(domain) scans with O(G·4096) driver state, no group's
    * values ever materialized anywhere.
    *
    * `rankOf` maps each group's row count to its target rank
    * (0-indexed k-th smallest), e.g. `n => n / 2` for the lower
    * median.
    */
  def groupedKthSmallest(df: DataFrame, g: Column, c: Column,
      rankOf: Long => Long): DataFrame = {
    val s = df.sparkSession
    import s.implicits._
    lastPasses = 0
    val v = c.cast("long")
    // null group keys are excluded up front: they would survive the
    // count/bounds probe but silently vanish from the broadcast
    // bounds join (null never equi-joins), leaving a state entry no
    // histogram ever answers
    val keyed = df.select(g.cast("string").as("__g"), v.as("__v"))
      .where(col("__g").isNotNull)
    // one probe: per-group count + bounds (a partial agg, G rows)
    var state = keyed.groupBy(col("__g"))
      .agg(count(lit(1)).as("n"), min(col("__v")).as("lo"),
        max(col("__v")).as("hi"))
      .collect()
      .map(r => (r.getString(0),
        (r.getLong(1), r.getLong(2), r.getLong(3), rankOf(r.getLong(1)))))
      .toMap // group -> (n, lo, hi, residual rank)
    var resolved = Map.empty[String, Long]
    while (state.nonEmpty) {
      val (done, open) = state.partition { case (_, (_, lo, hi, _)) => hi <= lo }
      resolved ++= done.map { case (k, (_, lo, _, _)) => k -> lo }
      if (open.isEmpty) return toFrame(s, resolved)
      state = open
      // ANSI-safe wrap split (see resolve): a group whose range spans
      // >= 2^63 gets its candidate range cut at zero before the
      // histogram pass, rank routed by the group's negative-side
      // count — one bounded extra job, only when a wrapped group
      // exists (only ever the first pass: sub-ranges cannot wrap)
      val wrappedKeys = state.collect {
        case (k, (_, lo, hi, _)) if hi - lo < 0 => k
      }.toSet
      if (wrappedKeys.nonEmpty) {
        lastPasses += 1
        val negCounts = keyed
          .join(broadcast(wrappedKeys.toSeq.toDF("__g")), "__g")
          .where(col("__v") < 0)
          .groupBy(col("__g")).agg(count(lit(1)).as("__n"))
          .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
        state = state.map {
          case (k, (n, lo, hi, rank)) if wrappedKeys(k) =>
            val nc = negCounts.getOrElse(k, 0L)
            if (rank < nc) (k, (n, lo, -1L, rank))
            else (k, (n, 0L, hi, rank - nc))
          case other => other
        }
      }
      lastPasses += 1
      val widths: Map[String, Long] = state.map { case (k, (_, lo, hi, _)) =>
        k -> widthFor(lo, hi)
      }
      val bounds = state.map { case (k, (_, lo, hi, _)) =>
        (k, lo, hi, widths(k))
      }.toSeq.toDF("__g", "__lo", "__hi", "__w")
      val hist = keyed
        .join(broadcast(bounds), "__g")
        .where(col("__v") >= col("__lo") && col("__v") <= col("__hi"))
        .groupBy(col("__g"),
          expr("(__v - __lo) div __w").as("__b")) // integer div (see above)
        .agg(count(lit(1)).as("__n"))
        .collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
        .groupBy(_._1)
      state = state.map { case (k, (n, lo, hi, rank)) =>
        val width = widths(k)
        val bs = hist.getOrElse(k, throw new IllegalStateException(
          s"group '$k' produced no histogram rows in [$lo, $hi] — " +
            "rank/bounds invariant broken"))
          .map(t => (t._2, t._3)).sortBy(_._1)
        var acc = 0L; var i = 0; var found = -1L
        while (found < 0 && i < bs.length) {
          val (bid, cnt) = bs(i)
          if (acc + cnt > rank) found = bid else { acc += cnt; i += 1 }
        }
        require(found >= 0, s"rank $rank exceeds rows of group $k")
        val newLo = lo + found * width
        (k, (n, newLo, math.min(hi, newLo + width - 1), rank - acc))
      }
    }
    toFrame(s, resolved)
  }

  private def toFrame(s: SparkSession,
      resolved: Map[String, Long]): DataFrame = {
    import s.implicits._
    resolved.toSeq.toDF("group", "value")
  }

  /** Judged grouped exact median: per-returnflag lower median of
    * lineitem cents, all flags resolved in shared histogram passes,
    * against the oracle's per-group row_number selection at rank
    * ⌊n_g/2⌋. The q55 contrast made judgeable: same answer shape as
    * a percentile_disc, produced without buffering any group.
    */
  def q122GroupedMedian(s: SparkSession, d: String): DataFrame = {
    val li = Tables.lineitem(s, d).select(col("l_returnflag"),
      round(col("l_extendedprice") * 100).cast("long").as("cents"))
    val counts = li.groupBy(col("l_returnflag")).count()
    groupedKthSmallest(li, col("l_returnflag"), col("cents"), n => n / 2)
      .select(col("group").as("l_returnflag"),
        col("value").as("median_cents"))
      .join(broadcast(counts), Seq("l_returnflag"))
      .select(col("l_returnflag"), col("count").as("n_rows"),
        col("median_cents"))
      .orderBy(col("l_returnflag"))
  }

  /** Judged exact median + p90 of lineitem's extended price in cents:
    * one count/min/max probe, then both ranks resolve through
    * [[kthSmallests]] — the first (full-domain) histogram is SHARED,
    * and only the second-level refinements split. Certified against
    * the oracle's row_number()-over-full-sort selection at the exact
    * same 0-indexed ranks ⌊n/2⌋ and ⌊9n/10⌋ — rank semantics pinned
    * by position, not by an engine's percentile law, so the two
    * engines cannot disagree on interpolation.
    */
  def q112ExactMedian(s: SparkSession, d: String): DataFrame = {
    val cents = round(col("l_extendedprice") * 100).cast("long")
    val li = Tables.lineitem(s, d).select(cents.as("cents"))
    val probe = li.agg(count(lit(1)), min(col("cents")), max(col("cents")))
      .head()
    val n = probe.getLong(0)
    val Seq(med, p90) = kthSmallests(li, col("cents"),
      Seq(n / 2, 9 * n / 10), Some((probe.getLong(1), probe.getLong(2))))
    import s.implicits._
    Seq((n, med, p90)).toDF("n_rows", "median_cents", "p90_cents")
  }

  val queries: Seq[Q] = Seq(
    Q("q122_grouped_median", q122GroupedMedian, Some("""
      WITH ec AS (SELECT l_returnflag,
                         CAST(round(l_extendedprice * 100) AS BIGINT)
                           AS cents FROM lineitem),
      ranked AS (SELECT l_returnflag, cents,
                        row_number() OVER (PARTITION BY l_returnflag
                                           ORDER BY cents) AS rn,
                        count(*) OVER (PARTITION BY l_returnflag) AS n
                 FROM ec)
      SELECT l_returnflag, CAST(max(n) AS BIGINT) AS n_rows,
             max(CASE WHEN rn = n // 2 + 1 THEN cents END) AS median_cents
      FROM ranked
      GROUP BY l_returnflag
      ORDER BY l_returnflag""")),
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
