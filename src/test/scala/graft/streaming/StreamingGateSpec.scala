package graft.streaming

import graft.SparkTestBase

/** The judged streaming gate must be EXACTLY the batch twin: same
  * rows, same schema, same values — the backfill-vs-live parity
  * claim q41 puts under the driver's hash gate, checked here at
  * sf0.001 so a divergence fails fast in-repo too.
  */
class StreamingGateSpec extends SparkTestBase {

  test("q41 streaming sessionize == q26 batch twin, row for row") {
    val streamed = StreamingGate.q41StreamSessionize(spark, sf("sf0.001"))
    val batch = graft.operators.Sessionize.q26Sessionize(spark, sf("sf0.001"))
    assert(streamed.schema.fieldNames.toSeq === batch.schema.fieldNames.toSeq)
    val a = streamed.collect().toSeq
    val b = batch.collect().toSeq
    assert(a.nonEmpty, "bounded stream emitted no sessions")
    assert(a === b)
  }

  test("q51 streaming windowed agg == batch GROUP BY twin, row for row") {
    import org.apache.spark.sql.functions._
    val streamed = StreamingGate.q51StreamWindow(spark, sf("sf0.001"))
    val batch = graft.sources.Tables.events(spark, sf("sf0.001"))
      .where(col("value").isNotNull)
      .groupBy(col("user_id"), date_trunc("hour", col("ts")).as("window_start"))
      .agg(count(lit(1)).as("n_events"),
        graft.functions.Money.exactSum(col("value")).as("total"))
      .orderBy(col("user_id"), col("window_start"))
    assert(streamed.schema.fieldNames.toSeq === batch.schema.fieldNames.toSeq)
    val a = streamed.collect().toSeq
    val b = batch.collect().toSeq
    assert(a.nonEmpty, "bounded stream emitted no windows")
    // no sentinel leakage: every emitted row is a real user
    assert(a.forall(_.getLong(0) >= 0L), "sentinel user leaked into output")
    assert(a === b)
  }
}
