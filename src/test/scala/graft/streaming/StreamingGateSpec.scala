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

  test("q54's replay batch is processed, not lost: novel rows in batch 2 emit") {
    // the judged q54 can't distinguish "duplicates suppressed" from
    // "second batch silently dropped" — both produce the identity.
    // This harness plants one NOVEL event among the batch-2 replays:
    // it must emit (batch 2 processed) while the replays must not.
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.functions._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val base = (1L to 50L).map(i => DedupEvent(i, i % 7,
      java.sql.Timestamp.valueOf(s"2024-01-01 00:00:${i % 60}"), Some(i * 1.0)))
    val novel = DedupEvent(999L, 1L,
      java.sql.Timestamp.valueOf("2024-01-01 00:01:00"), Some(9.9))
    val mem = MemoryStream[DedupEvent]
    val q = StreamingDedup.dedupExact(
        mem.toDF().withColumn("payload", col("event_id").cast("string")),
        "payload", "ts", "40 days")
      .writeStream.format("memory").queryName("q54_replay_probe")
      .outputMode("append").start()
    try {
      mem.addData(base)
      q.processAllAvailable()
      mem.addData(base :+ novel) // replays + one novel row
      q.processAllAvailable()
    } finally q.stop()
    val ids = spark.table("q54_replay_probe")
      .select(col("event_id")).collect().map(_.getLong(0)).sorted
    assert(ids.length === 51, "replays leaked or batch 2 was dropped")
    assert(ids.contains(999L), "novel batch-2 row missing — batch 2 not processed")
  }

  test("q74's parquet sink writes a _spark_metadata commit log the batch read trusts") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.SaveMode
    val root = java.nio.file.Files.createTempDirectory("q74_probe").toString
    val (src, sink, chk) = (s"$root/src", s"$root/data", s"$root/chk")
    val rows = spark.range(0, 5).select(col("id"))
    rows.coalesce(1).write.mode(SaveMode.Overwrite).parquet(src)
    val q = spark.readStream.schema(rows.schema).parquet(src)
      .writeStream.format("parquet")
      .option("path", sink).option("checkpointLocation", chk)
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      spark.range(5, 9).select(col("id"))
        .coalesce(1).write.mode(SaveMode.Append).parquet(src)
      q.processAllAvailable()
    } finally q.stop()
    // the exactly-once mechanism: committed files are recorded in
    // _spark_metadata and the batch read resolves the file set from
    // that log — an orphaned file dropped into the directory is
    // invisible because no commit references it
    assert(new java.io.File(s"$sink/_spark_metadata").exists(),
      "parquet sink did not write its commit log")
    spark.range(100, 105).select(col("id"))
      .coalesce(1).write.mode(SaveMode.Append).parquet(s"$root/orphan")
    val orphan = new java.io.File(s"$root/orphan").listFiles()
      .filter(_.getName.endsWith(".parquet")).head
    java.nio.file.Files.copy(orphan.toPath,
      java.nio.file.Paths.get(s"$sink/${orphan.getName}"))
    val got = spark.read.parquet(sink)
      .select(col("id")).collect().map(_.getLong(0)).sorted
    assert(got.toSeq === (0L until 9L),
      s"batch read must trust the commit log, not the listing; got ${got.toSeq}")
  }

  test("q97 left-outer stream-stream join == batch left join: matches AND watermark-flushed nulls") {
    import org.apache.spark.sql.functions._
    val streamed = StreamingGate.q97StreamOuterJoin(spark, sf("sf0.001"))
    val d = sf("sf0.001")
    val e = graft.sources.Tables.events(spark, d)
      .where(col("event_type").isin("click", "purchase"))
    val batch = StreamingJoin.attribute(
      e.where(col("event_type") === "click"),
      e.where(col("event_type") === "purchase"),
      "2 hours", joinType = "left_outer")
      .orderBy(col("imp_id"), col("conv_id"))
    assert(streamed.schema.fieldNames.toSeq === batch.schema.fieldNames.toSeq)
    val a = streamed.collect().toSeq
    val b = batch.collect().toSeq
    // the fixture must exercise BOTH emission paths: on-match rows
    // and deferred null rows an advancing watermark flushed
    assert(a.exists(!_.isNullAt(2)), "no matched rows — fixture degenerate")
    assert(a.exists(_.isNullAt(2)), "no unmatched rows — the outer half never ran")
    // neither side's sentinel may surface (click sentinel user -2
    // must stay in state; purchase sentinels are right-side only)
    assert(a.forall(_.getLong(0) >= 0L), "sentinel leaked into output")
    assert(a === b)
  }

  test("q188 full-outer stream-stream join == batch full join: " +
      "matches, unconverted clicks, AND orphan purchases all emit; " +
      "sentinels never surface") {
    import org.apache.spark.sql.functions._
    val streamed = StreamingGate.q188StreamFullOuterJoin(spark, sf("sf0.001"))
    val d = sf("sf0.001")
    val e = graft.sources.Tables.events(spark, d)
      .where(col("event_type").isin("click", "purchase"))
    val batch = StreamingJoin.attribute(
      e.where(col("event_type") === "click"),
      e.where(col("event_type") === "purchase"),
      "2 hours", joinType = "full_outer")
      .orderBy(col("imp_id"), col("conv_id"))
    assert(streamed.schema.fieldNames.toSeq === batch.schema.fieldNames.toSeq)
    val a = streamed.collect().toSeq
    val b = batch.collect().toSeq
    // the fixture must exercise ALL THREE emission paths
    assert(a.exists(r => !r.isNullAt(1) && !r.isNullAt(2)),
      "no matched rows — fixture degenerate")
    assert(a.exists(_.isNullAt(2)),
      "no unconverted clicks — the left-outer half never ran")
    assert(a.exists(_.isNullAt(1)),
      "no orphan purchases — the right-outer half never ran")
    // no sentinel id (left or right) may survive the judged filter
    assert(a.forall(r => (r.isNullAt(1) || r.getLong(1) >= 0L) &&
      (r.isNullAt(2) || r.getLong(2) >= 0L)), "sentinel leaked")
    assert(a === b)
  }

  test("q89 restart recovery: no loss, no duplicates, and a third restart emits nothing") {
    import org.apache.spark.sql.functions._
    val got = StreamingGate.q89StreamRestart(spark, sf("sf0.001"))
      .select(col("event_id")).collect().map(_.getLong(0)).toSeq
    val expect = graft.sources.Tables.events(spark, sf("sf0.001"))
      .select(col("event_id")).collect().map(_.getLong(0)).sorted.toSeq
    assert(got === expect, "restart lost or duplicated events")
  }

  test("resuming a drained checkpoint with no new input emits zero rows") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.SaveMode
    val root = java.nio.file.Files.createTempDirectory("q89_probe").toString
    val (src, sink, chk) = (s"$root/src", s"$root/data", s"$root/chk")
    val rows = spark.range(0, 7).select(col("id"))
    rows.coalesce(1).write.mode(SaveMode.Overwrite).parquet(src)
    def run(): Unit = {
      val q = spark.readStream.schema(rows.schema).parquet(src)
        .writeStream.format("parquet")
        .option("path", sink).option("checkpointLocation", chk)
        .outputMode("append").start()
      try q.processAllAvailable() finally q.stop()
    }
    run(); run(); run() // two idempotent recoveries after the first drain
    assert(spark.read.parquet(sink).count() === 7L,
      "re-resumed checkpoint re-emitted already-committed input")
  }

  test("q95 transformWithState totals == batch GROUP BY, with real cross-batch state") {
    import org.apache.spark.sql.functions._
    val streamed = StreamingGate.q95TransformWithState(spark, sf("sf0.001"))
      .collect().toSeq
    val batch = graft.sources.Tables.events(spark, sf("sf0.001"))
      .groupBy(col("user_id")).agg(
        count(lit(1)).as("n_events"),
        sum(coalesce(round(col("value") * 100).cast("long"), lit(0L)))
          .as("sum_cents"))
      .orderBy(col("user_id")).collect().toSeq
    assert(streamed.nonEmpty)
    assert(streamed === batch)
    // the equality above is only evidence of cross-batch state if the
    // midpoint split put most users in BOTH micro-batches — i.e. a
    // state-losing implementation would have failed. Verify the split
    // is non-degenerate: users span both halves of the time range.
    val ev = graft.sources.Tables.events(spark, sf("sf0.001"))
    val mm = ev.agg(min(col("ts")), max(col("ts"))).head
    val mid = new java.sql.Timestamp(
      (mm.getTimestamp(0).getTime + mm.getTimestamp(1).getTime) / 2)
    val both = ev.groupBy(col("user_id"))
      .agg(max(col("ts") < lit(mid)).as("inA"), max(col("ts") >= lit(mid)).as("inB"))
      .where(col("inA") && col("inB")).count()
    assert(both > 0, "no user spans both micro-batches — the gate proves nothing")
  }

  test("q87 stream-static join == batch join twin, and runs STATELESS") {
    import org.apache.spark.sql.functions._
    val streamed = StreamingGate.q87StreamStaticJoin(spark, sf("sf0.001"))
    val batch = graft.sources.Tables.events(spark, sf("sf0.001"))
      .join(graft.sources.Tables.customer(spark, sf("sf0.001"))
        .select(col("c_custkey"), col("c_mktsegment")),
        col("user_id") === col("c_custkey"))
      .select(col("event_id"), col("user_id"),
        col("c_mktsegment").as("segment"), col("ts"), col("value"))
      .orderBy(col("event_id"))
    val a = streamed.collect().toSeq
    val b = batch.collect().toSeq
    assert(a.nonEmpty, "bounded stream enriched no events")
    assert(a === b)
  }

  test("a stream-static join holds no state store and broadcasts the dim per batch") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.SaveMode
    val root = java.nio.file.Files.createTempDirectory("q87_probe").toString
    val rows = spark.range(0, 20).select(col("id"), (col("id") % 5).as("k"))
    rows.coalesce(1).write.mode(SaveMode.Overwrite).parquet(root)
    val dim = spark.range(0, 5).select(col("id").as("k2"),
      concat(lit("g"), col("id")).as("grp"))
    val q = spark.readStream.schema(rows.schema).parquet(root)
      .join(broadcast(dim), col("k") === col("k2"))
      .writeStream.format("memory").queryName("graft_q87_probe")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      // no stateful operators: the join keeps nothing between batches
      assert(q.lastProgress.stateOperators.isEmpty,
        s"stream-static join must be stateless: ${q.lastProgress.json}")
    } finally q.stop()
    assert(spark.table("graft_q87_probe").count() === 20L)
  }
}
