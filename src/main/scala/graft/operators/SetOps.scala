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

  val queries: Seq[Q] = Seq(
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
