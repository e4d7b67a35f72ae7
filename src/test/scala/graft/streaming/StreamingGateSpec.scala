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
}
