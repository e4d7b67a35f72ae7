package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.sources._
import graft.sources.{SeriesQueries, SeriesScan, SeriesScanBuilder}

/** The custom DSv2 connector: pushdown MECHANISM gates (the range
  * must actually tighten generation and the columns must actually
  * prune — not merely be reported), residual-filter preservation,
  * and the builder's predicate algebra on every accepted shape.
  */
class SeriesSourceSpec extends SparkTestBase {

  test("q78's scan shows the tightened range and pruned columns; residual filter survives") {
    val df = SeriesQueries.q78CustomSource(spark, sf("sf0.001"))
    val plan = df.queryExecution.executedPlan.toString
    // the pushed seq_id range narrowed generation to [250000, 750000)
    assert(plan.contains("range=[250000, 750000)"),
      s"pushed range not reflected in the scan:\n$plan")
    // pruning dropped seq_id: only the referenced columns are emitted
    assert(plan.contains("cols=[sensor_id,reading_centi]"),
      s"column pruning did not reach the scan:\n$plan")
    // the sensor filter is NOT pushable — Spark must keep a Filter
    assert(plan.contains("Filter"), s"residual filter missing:\n$plan")
  }

  test("scan builder tightens [lo, hi) for every accepted predicate shape") {
    def built(filters: Filter*): (SeriesScan, Array[Filter]) = {
      val b = new SeriesScanBuilder(1000L)
      val residual = b.pushFilters(filters.toArray)
      (b.build().asInstanceOf[SeriesScan], residual)
    }
    assert(built(GreaterThanOrEqual("seq_id", 10L))._1.lo === 10L)
    assert(built(GreaterThan("seq_id", 10L))._1.lo === 11L)
    assert(built(LessThan("seq_id", 10L))._1.hi === 10L)
    assert(built(LessThanOrEqual("seq_id", 10L))._1.hi === 11L)
    val (eq, eqRes) = built(EqualTo("seq_id", 42L))
    assert(eq.lo === 42L && eq.hi === 43L && eqRes.isEmpty)
    // unsupported shapes come back as residuals and leave the range
    val (full, res) = built(EqualTo("sensor_id", 3L), IsNotNull("seq_id"))
    assert(full.lo === 0L && full.hi === 1000L && res.length === 2)
    // contradictory predicates collapse to an EMPTY range, never negative
    val (empty, _) =
      built(GreaterThanOrEqual("seq_id", 900L), LessThan("seq_id", 100L))
    assert(empty.lo === empty.hi)
    // Long.MaxValue literals would overflow the v+1 tightening to
    // Long.MinValue while still being reported handled — they must
    // stay RESIDUAL (Spark re-checks them) and leave the range alone
    val max = Long.MaxValue
    for (f <- Seq(EqualTo("seq_id", max), GreaterThan("seq_id", max),
        LessThanOrEqual("seq_id", max))) {
      val (scan, res) = built(f)
      assert(res.toSeq === Seq(f), s"$f must be residual")
      assert(scan.lo === 0L && scan.hi === 1000L,
        s"$f must not touch the range: [${scan.lo}, ${scan.hi})")
    }
    // the non-arithmetic >= shape at MaxValue is still safely pushable
    val (geMax, geRes) = built(GreaterThanOrEqual("seq_id", max))
    assert(geRes.isEmpty && geMax.lo === geMax.hi)
  }

  test("a contradictory pushed range returns zero rows end to end") {
    val n = spark.read.format("graft.sources.SeriesSource")
      .option("n", "1000").load()
      .where(col("seq_id") >= 900 && col("seq_id") < 100)
      .count()
    assert(n === 0L)
  }

  test("pushdown never changes results: pushed range == full scan + post-filter") {
    // the end-to-end guarantee the mechanism gates imply but don't
    // state: for a sweep of range shapes (inside, straddling, empty,
    // single-point), reading WITH pushdown equals scanning the whole
    // table and filtering afterwards
    val full = spark.read.format("graft.sources.SeriesSource")
      .option("n", "10000").load().collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val cases = Seq(
      (col("seq_id") >= 100 && col("seq_id") < 200,
        (s: Long) => s >= 100 && s < 200),
      (col("seq_id") > 9990, (s: Long) => s > 9990),
      (col("seq_id") <= 5, (s: Long) => s <= 5),
      (col("seq_id") === 4242, (s: Long) => s == 4242),
      (col("seq_id") >= 500 && col("seq_id") <= 400, (_: Long) => false))
    cases.foreach { case (pred, expect) =>
      val got = spark.read.format("graft.sources.SeriesSource")
        .option("n", "10000").load().where(pred).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(got === full.filter(t => expect(t._1)).toSet,
        s"pushdown diverged for predicate $pred")
    }
  }

  test("the generated table matches its closed form on a sample") {
    val rows = spark.read.format("graft.sources.SeriesSource")
      .option("n", "100000").load()
      .where(col("seq_id").isin(0L, 1L, 63L, 64L, 99999L))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(rows === Set(
      (0L, 0L, 0L),
      (1L, 1L, 9973L),
      (63L, 63L, 63L * 9973 % 100000),
      (64L, 0L, 64L * 9973 % 100000),
      (99999L, 99999L % 64, 99999L * 9973 % 100000)))
  }

  test("micro-batch stream paces by batchRows and delivers each offset once") {
    val ss = spark.newSession()
    ss.conf.set("spark.sql.shuffle.partitions", "4")
    val q = ss.readStream.format("graft.sources.SeriesSource")
      .option("n", "100000").option("batchRows", "30000").load()
      .writeStream.format("memory").queryName("series_stream")
      .outputMode("append").start()
    try q.processAllAvailable() finally q.stop()
    // 100k rows in ≤30k-row batches = at least 4 micro-batches
    val withData = q.recentProgress.count(_.numInputRows > 0)
    assert(withData >= 4, s"expected ≥4 paced batches, got $withData")
    assert(q.recentProgress.map(_.numInputRows).filter(_ > 0).max <= 30000L)
    import ss.implicits._
    val ids = ss.table("series_stream").select("seq_id").as[Long].collect()
    assert(ids.length === 100000)
    assert(ids.toSet.size === 100000, "offset ranges overlapped or gapped")
  }

  test("Trigger.AvailableNow drains the sequence in paced batches, then terminates") {
    // AvailableNow composes the source's default limit with its own
    // snapshot bound (a CompositeReadLimit) — the path rowsFor() must
    // unwrap; a source ignoring the engine-supplied limit either
    // over-reads past the snapshot or never terminates
    val ss = spark.newSession()
    ss.conf.set("spark.sql.shuffle.partitions", "4")
    val q = ss.readStream.format("graft.sources.SeriesSource")
      .option("n", "90000").option("batchRows", "40000").load()
      .writeStream.format("memory").queryName("series_avnow")
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    assert(q.awaitTermination(120000), "AvailableNow query did not terminate")
    // drained fully, still paced: no batch exceeded batchRows
    import ss.implicits._
    val ids = ss.table("series_avnow").select("seq_id").as[Long].collect()
    assert(ids.length === 90000)
    assert(ids.toSet.size === 90000, "offset ranges overlapped or gapped")
    assert(q.recentProgress.map(_.numInputRows).filter(_ > 0).max <= 40000L)
    assert(q.recentProgress.count(_.numInputRows > 0) >= 3)
  }

  test("restarted stream resumes from the checkpoint offset, never re-emitting") {
    val df = graft.sources.SeriesQueries
      .q104StreamCustomSource(spark, sf("sf0.001"))
    val rows = df.collect()
    assert(rows.length === 64)
    // closed-form check on one sensor: ids ≡ 5 (mod 64) in [0, 200000)
    val r5 = rows.find(_.getLong(0) == 5L).get
    val ids5 = (5L until 200000L by 64L)
    assert(r5.getLong(1) === ids5.length.toLong)
    assert(r5.getLong(2) === ids5.map(i => i * 9973 % 100000).sum)
  }
}
