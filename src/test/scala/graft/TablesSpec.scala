package graft

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types._

import graft.sources.Tables

/** Loader-contract spec for `Tables.events`: the driver has shipped
  * `events.ts` in two different parquet physical types across rounds
  * (TIMESTAMP(NANOS), then µs TIMESTAMP_NTZ — the pandas/pyarrow
  * default `isAdjustedToUTC=false`), and a silent change broke 14
  * queries at the round-6 driver run. This spec writes both shapes as
  * fixtures and asserts the single normalization point yields
  * `TimestampType` with the right instants, so the next testdata
  * drift fails here before the driver sees it.
  */
class TablesSpec extends SparkTestBase {

  private def writeFixture(schemaTs: DataType, rows: Seq[Row]): String = {
    val dir = Files.createTempDirectory("graft_events_fix").toString
    val schema = StructType(Seq(
      StructField("event_id", LongType),
      StructField("ts", schemaTs),
      StructField("user_id", LongType)))
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 1), schema)
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  test("events loader casts µs TIMESTAMP_NTZ (current testdata shape) to TimestampType") {
    // 2021-06-01T12:34:56.789Z as naive wall-clock micros
    val ntz = java.time.LocalDateTime.of(2021, 6, 1, 12, 34, 56, 789000000)
    val dir = writeFixture(TimestampNTZType,
      Seq(Row(1L, ntz, 10L), Row(2L, ntz.plusSeconds(30), 11L)))
    val df = Tables.events(spark, dir)
    assert(df.schema("ts").dataType === TimestampType)
    // session TZ is pinned UTC, so the naive wall clock must read
    // back as the identical UTC instant
    val got = df.orderBy("event_id").select(col("ts").cast(LongType)).collect().map(_.getLong(0))
    val want = ntz.toInstant(java.time.ZoneOffset.UTC).getEpochSecond
    assert(got.toSeq === Seq(want, want + 30))
  }

  test("events loader converts epoch-nanos long (legacy TIMESTAMP(NANOS) shape) to TimestampType") {
    // nanosAsLong surfaces parquet TIMESTAMP(NANOS) as LongType; a
    // plain long column is indistinguishable at read time, so it
    // exercises the same branch.
    val base = 1622551496789000000L // 2021-06-01T12:44:56.789Z in ns
    val dir = writeFixture(LongType, Seq(Row(1L, base, 10L), Row(2L, base + 7L, 11L)))
    val df = Tables.events(spark, dir)
    assert(df.schema("ts").dataType === TimestampType)
    val got = df.orderBy("event_id").select(col("ts")).collect().map(_.getTimestamp(0))
    assert(got(0) === Timestamp.from(java.time.Instant.ofEpochSecond(1622551496L, 789000000L)))
    // +7 ns truncates away at µs granularity
    assert(got(1) === got(0))
  }

  test("events loader passes native TimestampType through unchanged") {
    val t = Timestamp.from(java.time.Instant.parse("2021-06-01T12:34:56.789Z"))
    val dir = writeFixture(TimestampType, Seq(Row(1L, t, 10L)))
    val df = Tables.events(spark, dir)
    assert(df.schema("ts").dataType === TimestampType)
    assert(df.select("ts").head().getTimestamp(0) === t)
  }

  test("driver testdata events load as TimestampType at every SF") {
    Seq("sf0.001", "sf0.01").foreach { s =>
      val df = Tables.events(spark, sf(s))
      assert(df.schema("ts").dataType === TimestampType, s"$s ts type drifted")
      assert(df.limit(1).count() === 1)
    }
  }
}
