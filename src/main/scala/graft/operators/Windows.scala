package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.functions.Money
import graft.sources.Tables
import graft.Catalog.Q

/** Frame-based window functions — absent from the reference, whose
  * only "windows" are calendar-bucket string keys (SURVEY.md §2.2).
  * Window execution shuffles once on partitionBy keys and sorts
  * within partitions; at 100 TB the partition key (nation / custkey)
  * must be the high-cardinality dimension so no single partition
  * explodes — both queries below satisfy that.
  */
object Windows {

  /** Top-3 customers by balance per nation: row_number over a
    * fully-deterministic ordering (balance desc, key asc tie-break).
    */
  def q11WindowRank(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("c_nationkey"))
      .orderBy(col("c_acctbal").desc, col("c_custkey").asc)
    Tables.customer(s, d)
      .withColumn("rk", row_number().over(w))
      .where(col("rk") <= 3)
      .select(col("c_nationkey"), col("rk"), col("c_custkey"), col("c_acctbal"))
      .orderBy(col("c_nationkey"), col("rk"))
  }

  /** Per-nation monthly revenue with LAG and a 3-month moving
    * average. The moving average is computed over integer cents
    * (windowed SUM of longs, then one division) — a windowed
    * AVG(double) is NOT portable because engines associate the
    * frame summation differently (DuckDB uses segment trees).
    */
  def q12WindowLagMa(s: SparkSession, d: String): DataFrame = {
    val o = Tables.orders(s, d)
    val c = Tables.customer(s, d)
    val n = Tables.nation(s, d)
    val monthly = o
      .join(c, o("o_custkey") === c("c_custkey"))
      .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .groupBy(n("n_name"), date_format(o("o_orderdate"), "yyyy-MM").as("ym"))
      .agg(Money.sumCents(o("o_totalprice")).as("cents"))
    val w = Window.partitionBy(col("n_name")).orderBy(col("ym"))
    val w3 = w.rowsBetween(-2, 0)
    monthly
      .select(
        col("n_name"), col("ym"),
        Money.toAmount(col("cents")).as("revenue"),
        (lag(col("cents"), 1).over(w).cast(DoubleType) / 100.0).as("prev_revenue"),
        (sum(col("cents")).over(w3).cast(DoubleType) / 100.0 /
          count(lit(1)).over(w3)).as("ma3"))
      .orderBy(col("n_name"), col("ym"))
  }

  /** Running totals + global rank without any partition key on the
    * rank — demonstrates ntile/percent_rank-class analytics but
    * sticks to deterministic members. Partitioned by customer to
    * keep the sort distributed.
    */
  def q19RunningTotal(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey")).orderBy(col("o_orderdate"), col("o_orderkey"))
    Tables.orders(s, d)
      .select(
        col("o_custkey"), col("o_orderkey"),
        Money.toAmount(Money.sumCents(col("o_totalprice"))
          .over(w.rowsBetween(Window.unboundedPreceding, 0))).as("running_spend"),
        row_number().over(w).as("order_seq"))
      .orderBy(col("o_custkey"), col("order_seq"))
  }

  /** Distribution window functions — ntile buckets, percent_rank,
    * cume_dist — per nation over customer balances. All three are
    * rank-arithmetic (ints, and int ratios computed identically by
    * both engines from the same operands), so unlike windowed
    * AVG(double) they ARE cross-engine exact. Tie-break on c_custkey
    * makes every rank deterministic.
    */
  def q35WindowDistribution(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("c_nationkey"))
      .orderBy(col("c_acctbal").asc, col("c_custkey").asc)
    Tables.customer(s, d)
      .select(col("c_nationkey"), col("c_custkey"), col("c_acctbal"),
        ntile(4).over(w).as("balance_quartile"),
        percent_rank().over(w).as("pct_rank"),
        cume_dist().over(w).as("cume"))
      .orderBy(col("c_nationkey"), col("c_custkey"))
  }

  /** Time-RANGE window frame: trailing 1-hour event count + exact
    * revenue per user, per event — the value-based frame (`RANGE
    * BETWEEN <interval> PRECEDING`) that rows-based frames (q12/q19)
    * cannot express: the frame holds however many events fall in the
    * trailing hour, not a fixed row count. Ordering column is integer
    * epoch-microseconds so the frame bound is exact arithmetic on
    * both engines, and the windowed money stays in cents per the
    * engine convention. RANGE frames include ORDER-BY peers (ties) —
    * identically on both engines. Scale: one shuffle on user_id, one
    * in-partition sort; frame eviction is O(1) per row (sliding sum).
    */
  def q53RangeFrame(s: SparkSession, d: String): DataFrame = {
    val hourUs = 3600L * 1000000
    val w = Window.partitionBy(col("user_id")).orderBy(col("t_us"))
      .rangeBetween(-(hourUs - 1), Window.currentRow)
    Tables.events(s, d)
      .where(col("value").isNotNull)
      .select(col("user_id"), col("event_id"),
        unix_micros(col("ts")).as("t_us"),
        Money.cents(col("value")).as("cents"))
      .select(col("user_id"), col("event_id"), col("t_us"),
        count(lit(1)).over(w).as("n_last_hour"),
        Money.toAmount(sum(col("cents")).over(w)).as("total_last_hour"))
      .orderBy(col("user_id"), col("t_us"), col("event_id"))
  }

  val queries: Seq[Q] = Seq(
    Q("q53_range_frame", q53RangeFrame, Some("""
      SELECT user_id, event_id, epoch_us(ts) AS t_us,
             count(*) OVER w AS n_last_hour,
             CAST(sum(CAST(round(value * 100) AS BIGINT)) OVER w AS DOUBLE)
               / 100.0 AS total_last_hour
      FROM events
      WHERE value IS NOT NULL
      WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
                   RANGE BETWEEN 3599999999 PRECEDING AND CURRENT ROW)
      ORDER BY user_id, t_us, event_id""")),
    Q("q35_window_distribution", q35WindowDistribution, Some("""
      SELECT c_nationkey, c_custkey, c_acctbal,
             ntile(4) OVER w AS balance_quartile,
             percent_rank() OVER w AS pct_rank,
             cume_dist() OVER w AS cume
      FROM customer
      WINDOW w AS (PARTITION BY c_nationkey
                   ORDER BY c_acctbal ASC, c_custkey ASC)
      ORDER BY c_nationkey, c_custkey""")),
    Q("q11_window_rank", q11WindowRank, Some("""
      SELECT c_nationkey, rk, c_custkey, c_acctbal FROM (
        SELECT c_nationkey, c_custkey, c_acctbal,
               row_number() OVER (PARTITION BY c_nationkey
                                  ORDER BY c_acctbal DESC, c_custkey ASC) AS rk
        FROM customer)
      WHERE rk <= 3
      ORDER BY c_nationkey, rk""")),
    Q("q12_window_lag_ma", q12WindowLagMa, Some("""
      WITH monthly AS (
        SELECT n_name, strftime(o_orderdate, '%Y-%m') AS ym,
               sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS cents
        FROM orders
        JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
        GROUP BY n_name, ym)
      SELECT n_name, ym,
             CAST(cents AS DOUBLE) / 100.0 AS revenue,
             CAST(lag(cents, 1) OVER w AS DOUBLE) / 100.0 AS prev_revenue,
             CAST(sum(cents) OVER w3 AS DOUBLE) / 100.0 / count(*) OVER w3 AS ma3
      FROM monthly
      WINDOW w AS (PARTITION BY n_name ORDER BY ym),
             w3 AS (PARTITION BY n_name ORDER BY ym ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
      ORDER BY n_name, ym""")),
    Q("q19_running_total", q19RunningTotal, Some("""
      SELECT o_custkey, o_orderkey,
             CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
                  OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) / 100.0
               AS running_spend,
             row_number() OVER (PARTITION BY o_custkey
                                ORDER BY o_orderdate, o_orderkey) AS order_seq
      FROM orders
      ORDER BY o_custkey, order_seq"""))
  )
}
