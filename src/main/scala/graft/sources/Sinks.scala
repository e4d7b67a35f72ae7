package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.functions.Money
import graft.Catalog.Q

/** Write-side breadth (the reference's only sink is tab-separated
  * text, SURVEY.md §2.1 O13). Two layouts that matter at 100 TB:
  *
  * - Hive-style partitioned parquet: the standard lake layout —
  *   partition pruning turns predicates on the partition column into
  *   directory skips, so a month-scoped query over a 100 TB table
  *   reads one directory.
  * - Bucketed tables: pre-shuffled on the join/agg key at write time;
  *   two tables co-bucketed on the same key join with ZERO exchange —
  *   the write-once-shuffle-never pattern for fact-to-fact joins.
  *
  * Plus the ORC leg of the sources claim (q40): columnar like
  * parquet, same pushdown/pruning properties through the DSv2 scan.
  */
object Sinks {

  /** Partition-pruned lake layout. Cardinality warning applies: the
    * partition column must be low-cardinality (dates, regions), never
    * an id — each value becomes a directory.
    */
  def writePartitioned(df: DataFrame, path: String, partitionCols: String*): Unit =
    df.write.mode(SaveMode.Overwrite).partitionBy(partitionCols: _*).parquet(path)

  /** Bucketed managed table (in-memory catalog / warehouse dir).
    * `numBuckets` should match the cluster's target parallelism for
    * the downstream join, not the current core count.
    */
  def writeBucketed(df: DataFrame, table: String, bucketCol: String,
      numBuckets: Int, sortCol: Option[String] = None): Unit = {
    val w = df.write.mode(SaveMode.Overwrite)
      .format("parquet").bucketBy(numBuckets, bucketCol)
    sortCol.fold(w)(c => w.sortBy(c)).saveAsTable(table)
  }

  /** Explicit read schema for the ORC roundtrip — same contract as
    * the JSON/CSV sources: no inference pass, declared types only.
    */
  val supplierOrcSchema: StructType = StructType(Seq(
    StructField("s_suppkey", LongType),
    StructField("s_name", StringType),
    StructField("s_nationkey", IntegerType),
    StructField("s_acctbal", DoubleType)))

  /** Judged ORC source query (the fourth source format under the
    * gate, after parquet/JSON/CSV): write supplier to ORC, read it
    * back through the DSv2 ORC scan with the explicit schema, then
    * aggregate per nation with exact money sums. The roundtrip is
    * lossless for these types, so the DuckDB oracle runs on the
    * ORIGINAL parquet table — certifying the ORC write+read as a
    * true identity, not just that some ORC file parsed.
    */
  def q40OrcSource(s: SparkSession, d: String): DataFrame = {
    // fresh per-invocation directory: a fixed path keyed by
    // d.hashCode raced (Overwrite deletes files a concurrent run's
    // scan may still be reading) and an Int collision across dataset
    // dirs would silently cross-wire data. Housekeeping retires the
    // previous invocation's dir and sweeps the last at JVM exit — the
    // returned DataFrame is lazy, so the files must outlive this
    // call until the caller's action has run.
    val dir = Housekeeping.tempDir("q40_orc")
    Tables.supplier(s, d).write.mode(SaveMode.Overwrite).orc(dir)
    s.read.schema(supplierOrcSchema).orc(dir)
      .groupBy(col("s_nationkey"))
      .agg(count(lit(1)).as("n_suppliers"),
        Money.exactSum(col("s_acctbal")).as("total_acctbal"),
        max(col("s_acctbal")).as("max_acctbal"))
      .orderBy(col("s_nationkey"))
  }

  /** Judged partitioned-lake query: write orders Hive-partitioned by
    * year, read back with a partition predicate, aggregate. The
    * predicate on the partition column becomes a DIRECTORY SKIP (the
    * scan's PartitionFilters — SinksSpec asserts the mechanism), so
    * at 100 TB a year-scoped query reads one directory, not the
    * table. The oracle runs the same aggregate on the ORIGINAL table
    * with a WHERE — certifying the partition write+prune as an exact
    * identity on the selected slice.
    */
  def q44PartitionedSource(s: SparkSession, d: String): DataFrame = {
    val dir = Housekeeping.tempDir("q44_part")
    Tables.orders(s, d)
      .withColumn("o_year", year(col("o_orderdate")))
      .write.mode(SaveMode.Overwrite).partitionBy("o_year").parquet(dir)
    s.read.parquet(dir)
      .where(col("o_year") === 1995)
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n_orders"),
        Money.exactSum(col("o_totalprice")).as("total_price"))
      .orderBy(col("o_orderstatus"))
  }

  /** Judged parquet aggregate-pushdown query: MIN/MAX/COUNT answered
    * from ROW-GROUP FOOTER STATISTICS — the scan ships one stats
    * tuple per row group and never materializes a data page. At
    * 100 TB this is the difference between a full-table scan and a
    * metadata read (seconds vs hours for a table-level
    * count/min/max, the first query every profiling pass runs).
    * Requires the DSv2 parquet scan (the v1 path has no aggregate
    * pushdown), so the conf is scoped to a cloned session; the
    * no-filter/no-group-by shape is exactly what the pushdown rule
    * supports, plus a partition-column GROUP BY leg on the q44-style
    * layout would also qualify. SinksSpec asserts `PushedAggregation`
    * in the scan. Oracle = the same aggregates computed from data —
    * certifying the footer stats against an engine that reads pages.
    */
  def q67AggPushdown(s: SparkSession, d: String): DataFrame = {
    val ss = s.newSession()
    ss.conf.set("spark.sql.parquet.aggregatePushdown", "true")
    ss.conf.set("spark.sql.sources.useV1SourceList", "")
    Tables.lineitem(ss, d)
      .agg(count(lit(1)).as("n_rows"),
        min(col("l_quantity")).as("min_qty"),
        max(col("l_quantity")).as("max_qty"),
        min(col("l_extendedprice")).as("min_price"),
        max(col("l_extendedprice")).as("max_price"),
        min(col("l_orderkey")).as("min_orderkey"),
        max(col("l_orderkey")).as("max_orderkey"))
  }

  /** Judged dynamic-partition-pruning query — the runtime half of the
    * partition story. q44 prunes on a LITERAL predicate (static,
    * known at plan time); here the partitions worth reading are only
    * known after filtering a dimension at runtime. The fact is
    * orders⋈customer written nation-partitioned (25 directories);
    * the dim is nation filtered on n_regionkey — a NON-join column,
    * so constraint propagation cannot rewrite the predicate onto the
    * fact statically. Spark's DPP reuses the dim's broadcast exchange
    * as a partition filter on the fact scan (the default
    * reuseBroadcastOnly mode: the pruning subquery is free because
    * the broadcast already exists for the join), so the scan reads
    * the 5 matching directories, not 25. At 100 TB fact scale this is
    * the standard star-schema access path: scan the slice the dim
    * selects, never the lake. SinksSpec asserts
    * `dynamicpruningexpression` in the fact scan's partition filters
    * and that the static-prune plan (q44's shape) is NOT what runs.
    * The oracle joins the ORIGINAL tables — certifying the
    * partitioned write + runtime prune as an exact identity.
    */
  def q63DppJoin(s: SparkSession, d: String): DataFrame = {
    val dir = Housekeeping.tempDir("q63_dpp")
    val o = Tables.orders(s, d)
    val c = Tables.customer(s, d)
    o.join(c, o("o_custkey") === c("c_custkey"))
      .select(col("o_orderkey"), col("o_totalprice"), col("c_nationkey"))
      .write.mode(SaveMode.Overwrite).partitionBy("c_nationkey").parquet(dir)
    val fact = s.read.parquet(dir)
    val dim = Tables.nation(s, d).where(col("n_regionkey") === 2)
    fact.join(dim, fact("c_nationkey") === dim("n_nationkey"))
      .groupBy(col("c_nationkey"))
      .agg(count(lit(1)).as("n_orders"),
        Money.exactSum(col("o_totalprice")).as("total_price"))
      .orderBy(col("c_nationkey"))
  }

  /** Bin-pack a small-file directory into ~targetBytes output files
    * WITHOUT a shuffle: coalesce merges input splits in place, so
    * compaction is a read+write, never a repartition of the lake.
    * (An OPTIMIZE that also re-clusters belongs to Layout.zorderWrite
    * — clustering pays the shuffle on purpose; plain compaction must
    * not.) File count derives from actual on-disk bytes, floored at
    * one.
    */
  def compact(s: SparkSession, srcDir: String, outDir: String,
      targetBytes: Long): Int = {
    val bytes = new java.io.File(srcDir).listFiles()
      .filter(f => f.getName.endsWith(".parquet")).map(_.length).sum
    val nFiles = math.max(1, math.ceil(bytes.toDouble / targetBytes).toInt)
    s.read.parquet(srcDir).coalesce(nFiles)
      .write.mode(SaveMode.Overwrite).parquet(outDir)
    nFiles
  }

  /** Judged compaction query: fragment orders into 64 small files
    * (the streaming-ingest small-file problem: per-trigger commits
    * leave a file per micro-batch per partition), compact to
    * target-size files with [[compact]], and aggregate the COMPACTED
    * copy. The oracle aggregates the ORIGINAL table — certifying
    * compaction as a pure layout change, bit-identical content. The
    * spec asserts the mechanism: file count collapses to the
    * bytes-derived target and the write plans NO exchange (coalesce,
    * not repartition). At 100 TB the no-shuffle property is the
    * operator: compaction streams each output file from a handful of
    * inputs, cost O(bytes touched), not O(table shuffled).
    */
  def q68Compaction(s: SparkSession, d: String): DataFrame = {
    val dir = Housekeeping.tempDir("q68_compact")
    Tables.orders(s, d).repartition(64)
      .write.mode(SaveMode.Overwrite).parquet(s"$dir/small")
    compact(s, s"$dir/small", s"$dir/compacted", 4L << 20)
    s.read.parquet(s"$dir/compacted")
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n_orders"),
        Money.exactSum(col("o_totalprice")).as("total_price"))
      .orderBy(col("o_orderstatus"))
  }

  /** Judged bucketed-join query — the write-once-shuffle-never
    * pattern under the gate: customer and orders are both written
    * bucket-by-custkey (8 buckets, sorted), then joined and
    * aggregated. Because the bucket layouts agree, the JOIN runs
    * with ZERO exchange — the only shuffle in the whole plan is the
    * final per-nation aggregate (SinksSpec asserts exactly that: ≤ 1
    * Exchange where the unbucketed plan has 3). At 100 TB this is
    * the difference between shuffling two fact tables per join and
    * paying one shuffle at ingest, forever. Fresh per-invocation
    * table names: managed-table Overwrite against a stale warehouse
    * dir from a dead JVM fails with LOCATION_ALREADY_EXISTS, and
    * concurrent runs must not cross-read half-written buckets.
    * Housekeeping drops the previous invocation's pair (catalog entry
    * + warehouse files) on re-invocation and the last pair at JVM
    * exit, so the warehouse doesn't grow across bench passes. The
    * oracle joins the ORIGINAL tables — certifying the bucketed
    * write+join as an exact identity.
    */
  def q52BucketedJoin(s: SparkSession, d: String): DataFrame = {
    val tag = java.util.UUID.randomUUID().toString.replace("-", "").take(12)
    val (tc, to) = (s"graft_q52_cust_$tag", s"graft_q52_ord_$tag")
    Housekeeping.tables(s, "q52_bucketed", Seq(tc, to))
    writeBucketed(Tables.customer(s, d).select(col("c_custkey"), col("c_nationkey")),
      tc, "c_custkey", 8, Some("c_custkey"))
    writeBucketed(
      Tables.orders(s, d).select(col("o_custkey").as("c_custkey"), col("o_totalprice")),
      to, "c_custkey", 8, Some("c_custkey"))
    s.table(tc).join(s.table(to), "c_custkey")
      .groupBy(col("c_nationkey"))
      .agg(count(lit(1)).as("n_orders"),
        Money.exactSum(col("o_totalprice")).as("total_price"))
      .orderBy(col("c_nationkey"))
  }

  /** Judged schema-evolution query: a lake table whose schema grew a
    * column mid-life. Slice A (even order keys) is written WITHOUT
    * `o_orderpriority` — the legacy files; slice B (odd keys) is
    * written WITH it — the evolved files. `mergeSchema=true`
    * reconciles the footers at read time: legacy rows surface the
    * new column as NULL, no rewrite of history. That no-rewrite
    * property is the whole point at 100 TB — adding a column must
    * not touch existing files — with the documented trade that
    * mergeSchema LISTS EVERY FOOTER to infer the union schema; a
    * production lake stores the evolved schema in a metastore and
    * reads with it explicitly (same NULL-fill semantics, no listing
    * pass). The aggregate buckets by the new column, so the NULL
    * group IS the legacy slice — the oracle rebuilds the same
    * NULL-for-legacy view from the original table with a CASE,
    * certifying the merge as an exact identity.
    */
  def q71SchemaEvolution(s: SparkSession, d: String): DataFrame = {
    val dir = Housekeeping.tempDir("q71_evo")
    val o = Tables.orders(s, d)
    o.where(col("o_orderkey") % 2 === 0)
      .select(col("o_orderkey"), col("o_totalprice"))
      .write.mode(SaveMode.Overwrite).parquet(s"$dir/legacy")
    o.where(col("o_orderkey") % 2 === 1)
      .select(col("o_orderkey"), col("o_totalprice"), col("o_orderpriority"))
      .write.mode(SaveMode.Overwrite).parquet(s"$dir/evolved")
    s.read.option("mergeSchema", "true").parquet(s"$dir/legacy", s"$dir/evolved")
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_orders"),
        Money.exactSum(col("o_totalprice")).as("total_price"))
      .orderBy(col("o_orderpriority"))
  }

  /** Judged idempotent-backfill query: dynamic partition overwrite,
    * the verb behind every partition-scoped restatement. The table
    * is written priority-partitioned; a corrected URGENT slice
    * (orders ≥ 50k only — a dedup/correction restatement) is then
    * written with `partitionOverwriteMode=dynamic` + Overwrite,
    * which replaces ONLY the partitions present in the incoming
    * DataFrame. Static overwrite mode would TRUNCATE THE TABLE first
    * — the classic lost-lake accident this mode exists to prevent;
    * at 100 TB the difference is rewriting one day's directory vs
    * deleting the table. The final aggregate shows the restated
    * URGENT bucket next to untouched siblings; SinksSpec asserts the
    * mechanism (untouched partitions keep their exact file sets, the
    * target partition's files are replaced). The oracle rebuilds the
    * post-backfill state from the original table with a CASE filter.
    * Conf scoped to a cloned session (q67 precedent).
    */
  def q72DynamicOverwrite(s: SparkSession, d: String): DataFrame = {
    val ss = s.newSession()
    ss.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    val dir = Housekeeping.tempDir("q72_dynover")
    val o = Tables.orders(ss, d)
      .select(col("o_orderkey"), col("o_totalprice"), col("o_orderpriority"))
    o.write.mode(SaveMode.Overwrite)
      .partitionBy("o_orderpriority").parquet(dir)
    o.where(col("o_orderpriority") === "1-URGENT" &&
        col("o_totalprice") >= 50000)
      .write.mode(SaveMode.Overwrite)
      .partitionBy("o_orderpriority").parquet(dir)
    ss.read.parquet(dir)
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_orders"),
        Money.exactSum(col("o_totalprice")).as("total_price"))
      .orderBy(col("o_orderpriority"))
  }

  val queries: Seq[Q] = Seq(
    Q("q71_schema_evolution", q71SchemaEvolution, Some("""
      SELECT CASE WHEN o_orderkey % 2 = 0 THEN NULL
                  ELSE o_orderpriority END AS o_orderpriority,
             count(*) AS n_orders,
             CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS DOUBLE) / 100.0
               AS total_price
      FROM orders
      GROUP BY 1
      ORDER BY 1""")),
    Q("q72_dynamic_overwrite", q72DynamicOverwrite, Some("""
      SELECT o_orderpriority,
             count(*) AS n_orders,
             CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS DOUBLE) / 100.0
               AS total_price
      FROM orders
      WHERE o_orderpriority <> '1-URGENT' OR o_totalprice >= 50000
      GROUP BY o_orderpriority
      ORDER BY o_orderpriority""")),
    Q("q52_bucketed_join", q52BucketedJoin, Some("""
      SELECT c_nationkey,
             count(*) AS n_orders,
             CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS DOUBLE) / 100.0
               AS total_price
      FROM customer c JOIN orders o ON o.o_custkey = c.c_custkey
      GROUP BY c_nationkey
      ORDER BY c_nationkey""")),
    Q("q68_compaction", q68Compaction, Some("""
      SELECT o_orderstatus,
             count(*) AS n_orders,
             CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS DOUBLE) / 100.0
               AS total_price
      FROM orders
      GROUP BY o_orderstatus
      ORDER BY o_orderstatus""")),
    Q("q67_agg_pushdown", q67AggPushdown, Some("""
      SELECT count(*) AS n_rows,
             min(l_quantity) AS min_qty,
             max(l_quantity) AS max_qty,
             min(l_extendedprice) AS min_price,
             max(l_extendedprice) AS max_price,
             min(l_orderkey) AS min_orderkey,
             max(l_orderkey) AS max_orderkey
      FROM lineitem""")),
    Q("q63_dpp_join", q63DppJoin, Some("""
      SELECT c.c_nationkey AS c_nationkey,
             count(*) AS n_orders,
             CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS DOUBLE) / 100.0
               AS total_price
      FROM orders o
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN nation n ON c.c_nationkey = n.n_nationkey
      WHERE n.n_regionkey = 2
      GROUP BY 1
      ORDER BY 1""")),
    Q("q44_partitioned_source", q44PartitionedSource, Some("""
      SELECT o_orderstatus,
             count(*) AS n_orders,
             CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS DOUBLE) / 100.0
               AS total_price
      FROM orders
      WHERE year(o_orderdate) = 1995
      GROUP BY o_orderstatus
      ORDER BY o_orderstatus""")),
    Q("q40_orc_source", q40OrcSource, Some("""
      SELECT s_nationkey,
             count(*) AS n_suppliers,
             CAST(sum(CAST(round(s_acctbal * 100) AS BIGINT)) AS DOUBLE) / 100.0
               AS total_acctbal,
             max(s_acctbal) AS max_acctbal
      FROM supplier
      GROUP BY s_nationkey
      ORDER BY s_nationkey""")))
}
