package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** As-of (point-in-time) join — an operator Spark lacks natively
  * (SURVEY.md §2.2 "joins beyond inner equi: no as-of").
  *
  * For each left row, attach the latest right row with the same key
  * and `rightTime <= leftTime` (inclusive, matching DuckDB/kdb ASOF
  * semantics). LEFT-outer: unmatched left rows keep a NULL struct.
  *
  * Implementation is the scalable union-scan formulation, not a
  * range join: tag both inputs, union, then one window pass per key
  * ordered by (time, side) carrying the last non-null right payload
  * forward. Cost = ONE shuffle on the key + a per-key sort —
  * exactly a merge scan, state O(1) per key. A range-join
  * formulation (`l.key = r.key AND r.t <= l.t` + max) explodes to
  * |matches| intermediate rows and re-aggregates; at 100 TB the
  * union-scan is the only shape that holds. Right rows sort before
  * left rows at equal timestamps, which is what makes the join
  * inclusive.
  *
  * Right-side duplicates at the same (key, time) are the caller's
  * responsibility to resolve (dedupe first) — any as-of engine is
  * otherwise nondeterministic there.
  */
object AsOfJoin {

  def asOf(
      left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String,
      leftTime: String, rightTime: String,
      asOfCol: String = "asof"): DataFrame = {
    val lCols = left.columns.toSeq
    val rPayload = right.columns.filterNot(c => c == rightKey || c == rightTime).toSeq
    val rStructT = StructType(rPayload.map(c =>
      right.schema(c).copy(nullable = true)))

    val lU = left.select(
      Seq(col(leftKey).as("__k"), col(leftTime).as("__t"),
        lit(1).as("__side"), lit(null).cast(rStructT).as("__r")) ++
        lCols.map(col): _*)
    val rU = right.select(
      Seq(col(rightKey).as("__k"), col(rightTime).as("__t"),
        lit(0).as("__side"), struct(rPayload.map(col): _*).as("__r")) ++
        lCols.map(c => lit(null).cast(left.schema(c).dataType).as(c)): _*)

    val w = Window.partitionBy(col("__k"))
      .orderBy(col("__t").asc, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, 0)

    lU.unionByName(rU)
      .withColumn(asOfCol, last(col("__r"), ignoreNulls = true).over(w))
      .where(col("__side") === 1)
      .select(lCols.map(col) :+ col(asOfCol): _*)
  }
}
