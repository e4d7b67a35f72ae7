package graft

import org.apache.spark.sql.Observation
import org.apache.spark.sql.functions._
import graft.functions.Money
import graft.sources.Tables

/** The Observation API — data-quality metrics collected in the SAME
  * pass as the consuming action, the engine-level answer to "count
  * nulls and totals without a second scan". At 100 TB a separate
  * metrics query doubles the I/O bill; observe() piggybacks on
  * whatever action already runs.
  */
class ObservabilitySpec extends SparkTestBase {

  test("observe() collects row metrics in the consuming action's single pass") {
    val obs = Observation("quality")
    val df = Tables.lineitem(spark, sf("sf0.001"))
      .observe(obs,
        count(lit(1)).as("n_rows"),
        sum(when(col("l_quantity").isNull, 1L).otherwise(0L)).as("null_qty"),
        Money.sumCents(col("l_extendedprice")).as("total_cents"))
    val n = df.count() // the one and only action
    val m = obs.get
    assert(m("n_rows") === n)
    assert(m("null_qty") === 0L)
    // cross-check against an independent aggregation
    val expected = Tables.lineitem(spark, sf("sf0.001"))
      .agg(Money.sumCents(col("l_extendedprice"))).collect()(0).getLong(0)
    assert(m("total_cents") === expected)
  }
}
