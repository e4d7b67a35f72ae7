package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions.{col, expr}

import graft.sources.Tables

/** Schema-drift guard for the event-time query family.
  *
  * The round-6 driver silently regenerated `events.parquet` with a
  * different parquet timestamp physical type and 14 queries errored
  * at the driver before any in-repo check could catch it. This spec
  * re-runs every events-consuming judged query against a fixture
  * whose `ts` is the OTHER physical shape (epoch-nanos long — the
  * legacy TIMESTAMP(NANOS) surface), with the remaining tables
  * symlinked from sf0.001. If a query ever grows a path that touches
  * the raw parquet type instead of going through `Tables.events`'s
  * normalization, it fails here first.
  */
class EventsDriftSpec extends SparkTestBase {

  // every judged query that reads the events table (batch + stream)
  private val eventsQueries = Seq(
    "q26_sessionize", "q41_stream_sessionize", "q51_stream_window",
    "q53_range_frame", "q54_stream_dedup", "q57_funnel",
    "q65_stream_join", "q73_session_window", "q74_stream_to_lake",
    "q75_session_window_overlap", "q87_stream_static_join",
    "q89_stream_restart", "q95_transform_with_state",
    "q96_zorder_skipping", "q97_stream_outer_join",
    "q188_stream_full_outer")

  test("events consumers survive the legacy nanos-long events shape") {
    val dir = Files.createTempDirectory("graft_drift").toString
    Tables.names.filterNot(_ == "events").foreach { t =>
      Files.createSymbolicLink(
        Paths.get(s"$dir/$t.parquet"),
        Paths.get(s"${sf("sf0.001")}/$t.parquet"))
    }
    // same rows, legacy physical shape: ts as epoch-nanos LongType
    Tables.events(spark, sf("sf0.001"))
      .withColumn("ts", expr("unix_micros(ts) * 1000L"))
      .coalesce(1)
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    assert(Tables.events(spark, dir).schema("ts").dataType ===
      org.apache.spark.sql.types.TimestampType)

    val byName = Catalog.all.map(q => q.name -> q).toMap
    val missing = eventsQueries.filterNot(byName.contains)
    assert(missing.isEmpty, s"stale drift list: $missing not in catalog")
    eventsQueries.foreach { name =>
      val n = byName(name).fn(spark, dir).count()
      assert(n > 0, s"$name returned 0 rows on the legacy events shape")
    }
  }
}
