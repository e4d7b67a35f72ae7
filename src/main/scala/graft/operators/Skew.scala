package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.functions.Money
import graft.sources.Tables
import graft.Catalog.Q

/** Skew mitigation by salting: two-phase aggregation over an
  * artificial sub-key.
  *
  * A groupBy on a hot key sends every row of that key to one reduce
  * partition; with K distinct keys and N cores, N−K cores idle and
  * the hottest key sets the wall clock. Salting spreads each key
  * over `salts` partial groups (stage 1), then merges the partials
  * per real key (stage 2). Correct for any algebraic aggregate —
  * here SUM/COUNT, whose merge is SUM.
  *
  * The salt is a deterministic hash of the whole row, not rand():
  * results stay reproducible run to run (rand-based salting makes
  * retried tasks non-idempotent, which corrupts shuffle retries at
  * cluster scale).
  *
  * Note Spark's own partial (map-side) aggregation already handles
  * the pure-aggregation case well; explicit salting is the tool for
  * skewed JOIN keys and for aggregates whose partial states are too
  * big to combine map-side (large collect_set-style states). It is
  * judged here on the aggregate because that is oracle-checkable —
  * the operator is identical for the join case.
  */
object Skew {

  /** Two-phase salted SUM(cents)/COUNT per key.
    *
    * The salt is the per-partition row index (monotonically
    * increasing id = partition id << 33 | offset), NOT a hash of the
    * row: content-hash salting sends every copy of an identical row
    * to the same salted group, so a hot key whose volume is
    * duplicate rows — the common real-data skew — would still land
    * on one reducer. The row index spreads round-robin regardless of
    * content, and stays deterministic across task retries because a
    * parquet scan's partition contents and order are fixed by the
    * file splits (unlike rand(), which makes retried tasks
    * non-idempotent and corrupts shuffle retries).
    */
  def saltedSumCount(
      df: DataFrame, keys: Seq[String], cents: Column, salts: Int): DataFrame = {
    val keyCols = keys.map(col)
    val salted = df.withColumn("__salt",
      pmod(monotonically_increasing_id(), lit(salts.toLong)))
    salted
      .groupBy(keyCols :+ col("__salt"): _*)
      .agg(sum(cents).as("__c"), count(lit(1)).as("__n"))
      .groupBy(keyCols: _*)
      .agg(sum(col("__c")).as("cents"), sum(col("__n")).as("n"))
  }

  /** Judged query: totals per order priority (5 hot keys — exactly
    * the cardinality where an unsalted shuffle would idle 27 of 32
    * cores) via the salted path; the oracle is the plain GROUP BY,
    * proving the decomposition exact.
    */
  def q27SaltedAgg(s: SparkSession, d: String): DataFrame =
    saltedSumCount(
      Tables.orders(s, d), Seq("o_orderpriority"),
      Money.cents(col("o_totalprice")), 16)
      .select(col("o_orderpriority"),
        Money.toAmount(col("cents")).as("total_price"),
        col("n").as("n_orders"))
      .orderBy(col("o_orderpriority"))

  /** Salted shuffle JOIN — the skew tool for fact ⋈ dim joins too
    * big (or too mid-plan) to broadcast: a hot fact key floods one
    * sort-merge/shuffle-hash partition; salting splits each fact key
    * across `salts` sub-partitions and REPLICATES the matching dim
    * row into each (dim side explodes ×salts, so keep salts modest —
    * the cost is salts × |dim|). Result is identical to the plain
    * join: every fact row still meets its dim row exactly once, in
    * the sub-partition its salt selected.
    */
  def saltedJoin(
      fact: DataFrame, dim: DataFrame,
      factKey: String, dimKey: String, salts: Int): DataFrame = {
    val saltedFact = fact.withColumn("__salt",
      pmod(monotonically_increasing_id(), lit(salts.toLong)))
    val saltedDim = dim
      .withColumn("__salt", explode(sequence(lit(0L), lit(salts.toLong - 1))))
    saltedFact
      // force a shuffle join: broadcast would make the salt a no-op
      .join(saltedDim.hint("shuffle_hash"),
        saltedFact(factKey) === saltedDim(dimKey) &&
          saltedFact("__salt") === saltedDim("__salt"))
      .drop("__salt")
  }

  /** Judged query: events ⋈ customer through the salted join; the
    * oracle is the plain inner join, proving the salt-and-replicate
    * decomposition exact row-for-row.
    */
  def q30SaltedJoin(s: SparkSession, d: String): DataFrame =
    saltedJoin(Tables.events(s, d), Tables.customer(s, d),
      "user_id", "c_custkey", 8)
      .select(col("event_id"), col("user_id"), col("c_name"),
        col("event_type"))
      .orderBy(col("event_id"))

  /** Judged AQE skew join — the RUNTIME half of the skew story next
    * to q27/q30's manual salting. Salting is what you write when you
    * know the hot key in advance; AQE's skew-join rule is what saves
    * the 100 TB job when you don't: at shuffle time the engine sees
    * one reduce partition dwarfing the median, splits it into
    * sub-partitions, and replicates the matching build-side rows —
    * same result, no straggler. The fixture funnels ~30% of lineitem
    * onto one manufactured key; conf is scoped to a cloned session
    * (q64 precedent): broadcast disabled to pin the SMJ shape, and
    * the skew/advisory thresholds lowered from their 256 MB/64 MB
    * production defaults so test-scale partitions trip the same
    * rule. SkewSpec executes the plan and asserts `skew=true` on the
    * final AQE sort-merge join; the oracle is the plain join +
    * GROUP BY, certifying the runtime split as a pure optimization.
    *
    * Fixture subtlety worth keeping: skew detection reads COMPRESSED
    * map-output sizes, and a hot partition whose key column is
    * constant RLE-compresses far better than its even siblings — a
    * first cut with a 30% key and narrow rows measured UNDER the
    * byte threshold while being 5× the rows. The fixture therefore
    * gives the hot key half the rows and ships a high-entropy
    * multiplicative-hash payload (SQL-replayable, unlike xxhash64)
    * so shuffled bytes track row counts the way real payloads do.
    */
  def q98AqeSkewJoin(s: SparkSession, d: String): DataFrame = {
    val ss = s.newSession()
    ss.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    ss.conf.set("spark.sql.adaptive.enabled", "true")
    ss.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    ss.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2.0")
    ss.conf.set(
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "16KB")
    ss.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8KB")
    // forceOptimizeSkewedJoin: the judged aggregate ADDS a shuffle
    // after the join, and by default AQE refuses a skew split that
    // would insert extra shuffles — the production flag for exactly
    // this shape
    ss.conf.set("spark.sql.adaptive.forceOptimizeSkewedJoin", "true")
    // AQE splits a skewed reduce partition along MAPPER boundaries
    // (a slice is a contiguous run of map outputs), so a one-file
    // test-scale scan — one map task — makes every partition
    // unsplittable no matter how skewed (measured: 35 KB vs 7 KB
    // median, detection met, zero splits). The round-robin
    // repartition stands in for the thousands of scan tasks a real
    // cluster feeds the join shuffle with.
    // Second shape requirement, learned from the bytecode:
    // OptimizeSkewedJoin's ShuffleStage extractor only matches a
    // shuffle whose origin is ENSURE_REQUIREMENTS — an exchange the
    // PLANNER inserted to satisfy the join. A build side whose
    // partitioning is reused from a groupBy(k) (no exchange under
    // the sort at all), or re-exposed via an explicit
    // repartition(k) (origin REPARTITION_BY_NUM — AQE honors user
    // partition counts and won't rewrite them), silently
    // disqualifies the WHOLE join: detection thresholds met (47 KB
    // hot vs 5 KB median, measured), zero splits. So the fixture's
    // build side is a plain projected table — the planner inserts
    // both exchanges itself, and the join is the genuine large-
    // large shape where the skew rule applies. At 100 TB the lesson
    // generalizes: hand-placed repartitions and partitioning reuse
    // opt that join OUT of runtime skew handling.
    val li = Tables.lineitem(ss, d).repartition(8).select(
      col("l_returnflag"),
      round(col("l_quantity")).cast(LongType).as("qty"),
      pmod(col("l_orderkey") * lit(2654435761L), lit(1000000007L))
        .as("pay"),
      when(col("l_orderkey") % 2 === 0, lit(0L))
        .otherwise(pmod(col("l_orderkey"), lit(997L))).as("k"))
    val o = Tables.orders(ss, d).select(
      pmod(col("o_orderkey"), lit(997L)).as("k"),
      pmod(col("o_custkey"), lit(1000L)).as("ocode"))
    li.join(o, "k")
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n_rows"), sum(col("qty")).as("sum_qty"),
        sum(col("pay")).as("sum_pay"), sum(col("ocode")).as("sum_oc"))
      .orderBy(col("l_returnflag"))
  }

  val queries: Seq[Q] = Seq(
    Q("q98_aqe_skew_join", q98AqeSkewJoin, Some("""
      WITH l AS (SELECT l_returnflag,
                        CAST(round(l_quantity) AS BIGINT) AS qty,
                        (l_orderkey * 2654435761) % 1000000007 AS pay,
                        CASE WHEN l_orderkey % 2 = 0 THEN 0
                             ELSE l_orderkey % 997 END AS k
                 FROM lineitem),
      o AS (SELECT o_orderkey % 997 AS k, o_custkey % 1000 AS ocode
            FROM orders)
      SELECT l_returnflag, count(*) AS n_rows,
             CAST(sum(qty) AS BIGINT) AS sum_qty,
             CAST(sum(pay) AS BIGINT) AS sum_pay,
             CAST(sum(ocode) AS BIGINT) AS sum_oc
      FROM l JOIN o USING (k)
      GROUP BY l_returnflag
      ORDER BY l_returnflag""")),
    Q("q27_salted_agg", q27SaltedAgg, Some("""
      SELECT o_orderpriority,
             CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS DOUBLE) / 100.0 AS total_price,
             count(*) AS n_orders
      FROM orders
      GROUP BY o_orderpriority
      ORDER BY o_orderpriority""")),
    Q("q30_salted_join", q30SaltedJoin, Some("""
      SELECT e.event_id, e.user_id, c.c_name, e.event_type
      FROM events e
      JOIN customer c ON e.user_id = c.c_custkey
      ORDER BY e.event_id"""))
  )
}
