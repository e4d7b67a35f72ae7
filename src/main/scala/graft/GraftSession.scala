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
  * - nanosAsLong: robustness for parquet TIMESTAMP(NANOS) inputs,
  *   which Spark 4 otherwise refuses to read (PARQUET_TYPE_ILLEGAL);
  *   `Tables.events` converts the surfaced long (ns → µs truncation).
  *   The current driver testdata writes `ts` as µs TIMESTAMP_NTZ
  *   instead (see TESTDATA.md), which `Tables.events` casts to
  *   TimestampType under the pinned UTC session timezone; the legacy
  *   flag stays so older ns-shaped data still loads.
  */
object GraftSession {
  def builder(cpus: String): SparkSession.Builder =
    SparkSession.builder()
      .master(s"local[$cpus]")
      .withExtensions { e =>
        e.injectFunction(graft.plans.CosineSimilarity.description)
        // fuse size(array_intersect(a,b)) on array<long> — the
        // Jaccard verify stages count the intersection, twice per
        // row; no reason to materialize it (plans/IntersectionSize)
        e.injectOptimizerRule(_ => graft.plans.FuseIntersectionSize)
        // whole-operator extension tier: plans graft.plans.
        // IntervalJoin (non-equi containment/overlap) into the
        // broadcast sorted-search exec instead of the O(n·m)
        // BroadcastNestedLoopJoin stock Spark would be forced into
        e.injectPlannerStrategy(_ => graft.plans.RangeJoinStrategy)
      }
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      // Coalesce small shuffles down to the data size, not the core
      // count: parallelismFirst=true (the default) keeps ~1 partition
      // per core even when the whole shuffle is a few MB, so test-
      // scale runs pay 32 task launches per stage for microseconds of
      // work each. Size-first with a modest advisory target keeps
      // cluster-scale behavior (big shuffles still fan out) while
      // letting sf0.1 stages collapse to a handful of tasks.
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "16m")
      // storage-partitioned joins: let the planner use the lake
      // scan's KeyGroupedPartitioning (zero-shuffle joins of
      // co-partitioned lake tables); pushPartValues tolerates a
      // missing partition value on one side
      .config("spark.sql.sources.v2.bucketing.enabled", "true")
      .config("spark.sql.sources.v2.bucketing.pushPartValues.enabled",
        "true")
      // join keys may be a SUPERSET of the partition keys (join on
      // (bucket, id) over bucket-partitioned tables): co-partition
      // compatibility checks the partition-key subset
      .config("spark.sql.requireAllClusterKeysForCoPartition", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.warehouse.dir", "/tmp/graft_warehouse")
      .config("spark.ui.enabled", "false")

  /** Default parallelism = the machine's cores (the driver runs
    * local[32] but does not export SPARK_GRAFT_CPUS; a hardcoded
    * small default would quietly run the bench at 1/8 capacity).
    */
  def get(cpus: String = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)): SparkSession = {
    val spark = builder(cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }
}
