package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated parquet tables (TESTDATA.md).
  *
  * The reference engine's only source is positional-schema CSV text
  * (reference `Job1.java:143-144`, `Job2.java:102`); here the judged
  * tables are parquet, read through Spark's vectorized DSv2 parquet
  * source so that column pruning and filter pushdown reach the scan.
  * At 100 TB these reads are partitioned by parquet row groups; no
  * driver-side materialization ever happens in this module.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = load(s, d, "lineitem")
  /** `events.ts` normalization. The driver has generated this column in
    * two parquet physical shapes over time, and a robust loader accepts
    * both plus the plain case:
    *
    *  - `TIMESTAMP(isAdjustedToUTC=false, µs)` (pandas/pyarrow default,
    *    the current testdata): Spark 4 reads this as `TIMESTAMP_NTZ`.
    *    The session timezone is pinned to UTC ([[graft.GraftSession]]),
    *    so casting NTZ → `TimestampType` is semantics-preserving: the
    *    wall-clock fields are reinterpreted as UTC instants, which is
    *    exactly what the oracle (DuckDB, also TZ-naive here) computes.
    *  - `TIMESTAMP(NANOS)`: with `spark.sql.legacy.parquet.nanosAsLong`
    *    it surfaces as epoch-nanos `LongType`; truncate to µs.
    *  - already `TimestampType`: pass through.
    *
    * All downstream event-time consumers (sessionize, watermarked
    * streaming state, range frames over ts) require `TimestampType`;
    * this is the single normalization point.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.functions.{col, expr}
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    val raw = load(s, d, "events")
    raw.schema("ts").dataType match {
      case LongType =>
        raw.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      case TimestampNTZType =>
        raw.withColumn("ts", col("ts").cast(TimestampType))
      case _ => raw
    }
  }
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}
