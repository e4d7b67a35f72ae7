package graft

import org.apache.spark.sql.SparkSession

/** One place for engine session tuning, shared by Verify/Bench/tests.
  *
  * - AQE on: runtime shuffle-partition coalescing + skew-join
  *   splitting + dynamic broadcast — the knobs that keep the same
  *   plan viable from sf0.001 local runs to a 1000-executor cluster.
  * - shuffle.partitions defaults to the local core count (the 200
  *   default just makes tiny-partition overhead at test scale; on a
  *   real cluster AQE coalesces from a deliberately high initial
  *   number instead).
  * - nanosAsLong: the driver's `events.ts` is parquet
  *   TIMESTAMP(NANOS), which Spark 4 otherwise refuses to read
  *   (PARQUET_TYPE_ILLEGAL); we read it as a long and convert in
  *   `Tables.events` (ns → µs truncation, see TESTDATA.md).
  */
object GraftSession {
  def builder(cpus: String): SparkSession.Builder =
    SparkSession.builder()
      .master(s"local[$cpus]")
      .withExtensions(_.injectFunction(graft.plans.CosineSimilarity.description))
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.warehouse.dir", "/tmp/graft_warehouse")
      .config("spark.ui.enabled", "false")

  def get(cpus: String = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")): SparkSession = {
    val spark = builder(cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }
}
