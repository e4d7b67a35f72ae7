package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables
import graft.Catalog.Q

/** Set operations — absent from the reference beyond its implicit
  * input-path UNION ALL (SURVEY.md §2.2). INTERSECT/EXCEPT shuffle
  * both sides on the full row; keeping the operand a single key
  * column makes that shuffle as narrow as a semi join.
  */
object SetOps {

  /** Rich (acctbal > 5000) vs active (has an order) customers:
    * one output with a tag per set-algebra result.
    *
    * Implemented as ONE full-outer join on membership flags and a
    * tag-array explode — the INTERSECT/EXCEPT/UNION formulation
    * plans 3 independent set operators that re-scan both inputs per
    * branch (6 scans, 3 wide shuffles); this is 2 scans + 1 shuffle
    * and emits identical rows. Same algebra, one pass.
    */
  def q13SetOps(s: SparkSession, d: String): DataFrame = {
    val rich = Tables.customer(s, d)
      .where(col("c_acctbal") > 5000)
      .select(col("c_custkey")).withColumn("r", lit(true))
    val active = Tables.orders(s, d)
      .select(col("o_custkey").as("c_custkey")).distinct()
      .withColumn("a", lit(true))
    rich.join(active, Seq("c_custkey"), "full_outer")
      .select(col("c_custkey"), explode(array(
        when(col("r").isNotNull && col("a").isNotNull, "rich_and_active"),
        when(col("r").isNotNull && col("a").isNull, "rich_only"),
        when(col("r").isNotNull || col("a").isNotNull, "rich_or_active")))
        .as("tag"))
      .where(col("tag").isNotNull)
      .orderBy(col("tag"), col("c_custkey"))
  }

  /** Multiset (bag) set operations — EXCEPT ALL / INTERSECT ALL,
    * the multiplicity-preserving variants q13's distinct algebra
    * can't express: EXCEPT ALL subtracts per-occurrence counts,
    * INTERSECT ALL keeps min(countA, countB) copies.
    *
    * Both results are pure functions of the per-value multiplicity
    * on each side, so ONE aggregate over one scan suffices:
    * count the A and R occurrences per value in a single
    * groupBy(qty) (map-side partial agg collapses the fan-in), then
    * EXCEPT ALL multiplicity = greatest(cntA − cntR, 0) and
    * INTERSECT ALL multiplicity = least(cntA, cntR). The two tagged
    * outputs come from an explode of a 2-struct array — a union of
    * two projections would plan the aggregate (and the scan) twice.
    * Net: 1 scan + 1 hash-aggregate shuffle (+ the presentation
    * sort), versus the exceptAll/intersectAll formulation's 4 scans
    * and 2 wide set-operator shuffles. Output stays (tag, value, n)
    * so the judged artifact is the multiplicity itself.
    */
  def q56SetOpsAll(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.types.IntegerType
    val li = Tables.lineitem(s, d)
      .where(col("l_returnflag").isin("A", "R"))
      .select(round(col("l_quantity")).cast(IntegerType).as("qty"),
        col("l_returnflag"))
    li.groupBy(col("qty"))
      .agg(
        count(when(col("l_returnflag") === "A", 1)).as("cnt_a"),
        count(when(col("l_returnflag") === "R", 1)).as("cnt_r"))
      .select(col("qty"), explode(array(
        struct(lit("a_except_all_r").as("tag"),
          greatest(col("cnt_a") - col("cnt_r"), lit(0L)).as("n")),
        struct(lit("a_intersect_all_r").as("tag"),
          least(col("cnt_a"), col("cnt_r")).as("n")))).as("e"))
      .select(col("e.tag").as("tag"), col("qty"), col("e.n").as("n"))
      .where(col("n") > 0)
      .orderBy(col("tag"), col("qty"))
  }

  val queries: Seq[Q] = Seq(
    Q("q56_set_ops_all", q56SetOpsAll, Some("""
      WITH a AS (SELECT CAST(round(l_quantity) AS INTEGER) AS qty
                 FROM lineitem WHERE l_returnflag = 'A'),
           r AS (SELECT CAST(round(l_quantity) AS INTEGER) AS qty
                 FROM lineitem WHERE l_returnflag = 'R'),
           u AS (
             SELECT 'a_except_all_r' AS tag, qty
             FROM (SELECT * FROM a EXCEPT ALL SELECT * FROM r)
             UNION ALL
             SELECT 'a_intersect_all_r' AS tag, qty
             FROM (SELECT * FROM a INTERSECT ALL SELECT * FROM r))
      SELECT tag, qty, count(*) AS n
      FROM u
      GROUP BY tag, qty
      ORDER BY tag, qty""")),
    Q("q13_set_ops", q13SetOps, Some("""
      WITH rich AS (SELECT c_custkey FROM customer WHERE c_acctbal > 5000),
           active AS (SELECT DISTINCT o_custkey AS c_custkey FROM orders)
      SELECT 'rich_and_active' AS tag, c_custkey FROM (SELECT * FROM rich INTERSECT SELECT * FROM active)
      UNION ALL
      SELECT 'rich_only' AS tag, c_custkey FROM (SELECT * FROM rich EXCEPT SELECT * FROM active)
      UNION ALL
      SELECT 'rich_or_active' AS tag, c_custkey FROM (SELECT * FROM rich UNION SELECT * FROM active)
      ORDER BY tag, c_custkey"""))
  )
}
