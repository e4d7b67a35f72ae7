package graft

import org.apache.spark.sql.functions._
import graft.operators.SetOps

/** q56's contract: the single-pass multiplicity aggregate must emit
  * exactly the rows of the textbook EXCEPT ALL / INTERSECT ALL
  * formulation, from ONE scan of lineitem and at most two shuffles
  * (the aggregate + the presentation sort) — the 4-scan set-operator
  * plan it replaced is the anti-pattern SetOps.scala's header warns
  * against.
  */
class SetOpsSpec extends SparkTestBase {

  private val dir = sf("sf0.001")

  test("q56 matches the exceptAll/intersectAll reference formulation") {
    import org.apache.spark.sql.types.IntegerType
    val li = graft.sources.Tables.lineitem(spark, dir)
      .select(round(col("l_quantity")).cast(IntegerType).as("qty"),
        col("l_returnflag"))
    val a = li.where(col("l_returnflag") === "A").select("qty")
    val r = li.where(col("l_returnflag") === "R").select("qty")
    val reference = a.exceptAll(r).withColumn("tag", lit("a_except_all_r"))
      .union(a.intersectAll(r).withColumn("tag", lit("a_intersect_all_r")))
      .groupBy(col("tag"), col("qty"))
      .agg(count(lit(1)).as("n"))
      .select("tag", "qty", "n")
    val got = SetOps.q56SetOpsAll(spark, dir).select("tag", "qty", "n")
    assert(got.exceptAll(reference).isEmpty && reference.exceptAll(got).isEmpty,
      "single-pass multiplicity aggregate diverges from EXCEPT/INTERSECT ALL")
    assert(got.count() > 0)
  }

  test("q56 plans one lineitem scan and at most two shuffles") {
    val plan = SetOps.q56SetOpsAll(spark, dir)
      .queryExecution.executedPlan.toString
    val scans = "Scan parquet".r.findAllIn(plan).length
    assert(scans == 1, s"q56 scans lineitem $scans times:\n$plan")
    val exchanges = "Exchange (hash|range)partitioning".r
      .findAllIn(plan).length
    assert(exchanges <= 2, s"q56 shuffles $exchanges times:\n$plan")
  }
}
