package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.sources.{Sinks, Tables}

class SinksSpec extends SparkTestBase {

  test("partitioned write prunes partitions on read") {
    val out = Files.createTempDirectory("part_out").toString
    val orders = Tables.orders(spark, sf("sf0.001"))
      .withColumn("ym", date_format(col("o_orderdate"), "yyyy-MM"))
    Sinks.writePartitioned(orders, out, "ym")
    // directory layout is hive-style
    val dirs = new java.io.File(out).listFiles().map(_.getName).filter(_.startsWith("ym="))
    assert(dirs.nonEmpty, "no ym= partition directories written")
    // a month predicate must reach the scan as a partition filter
    val q = spark.read.parquet(out).where(col("ym") === dirs.head.stripPrefix("ym="))
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(ym"), s"no partition pruning:\n$plan")
    assert(q.count() > 0)
  }

  test("orc roundtrip preserves schema and rows (source breadth)") {
    val out = Files.createTempDirectory("orc_out").toString + "/nation"
    val n = Tables.nation(spark, sf("sf0.001"))
    n.write.orc(out)
    val back = spark.read.orc(out)
    assert(back.schema === n.schema)
    assert(back.orderBy("n_nationkey").collect()
      === n.orderBy("n_nationkey").collect())
  }

  test("q40 ORC scan prunes to the aggregate's columns") {
    // explicit 4-column schema, 3-column aggregate: the DSv2 ORC
    // scan must read only what the plan touches — a scan shipping
    // s_name for a count/sum/max query is the wrong plan at 100 TB
    val plan = Sinks.q40OrcSource(spark, sf("sf0.001"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("ReadSchema"), s"no file scan in plan:\n$plan")
    assert(!plan.contains("s_name"), s"ORC scan reads pruned column:\n$plan")
    assert(plan.contains("s_nationkey") && plan.contains("s_acctbal"))
  }

  test("q44's year predicate reaches the scan as a partition filter") {
    val plan = Sinks.q44PartitionedSource(spark, sf("sf0.001"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(o_year"),
      s"q44 does not prune partitions:\n$plan")
    // the predicate must NOT survive as a post-scan data filter
    assert(!plan.contains("PushedFilters: [IsNotNull(o_year"),
      s"o_year treated as a data column, not a partition column:\n$plan")
  }

  test("q52's bucketed join shuffles only for the final aggregate") {
    val q = graft.sources.Sinks.q52BucketedJoin(spark, sf("sf0.001"))
    val plan = q.queryExecution.executedPlan.toString
    val exchanges = "Exchange (hash|range)partitioning".r
      .findAllIn(plan).length
    // unbucketed: 2 join-input exchanges + 1 agg exchange (+1 sort
    // range). Bucketed: the join reads pre-shuffled buckets, so at
    // most the agg + presentation-sort exchanges survive.
    assert(exchanges <= 2, s"bucketed join still shuffles its inputs:\n$plan")
    assert(q.count() > 0)
  }

  test("csv datasource read applies explicit schema with header") {
    val fx = graft.sources.JsonSource.fx(spark)
    assert(fx.schema.map(_.dataType).toSeq ===
      Seq(org.apache.spark.sql.types.StringType,
        org.apache.spark.sql.types.LongType))
    val rows = fx.collect()
    assert(rows.length === 8)
    assert(rows.exists(r => r.getString(0) == "USD" && r.getLong(1) == 1000000L))
  }

  test("co-bucketed tables join with zero exchange") {
    val c = Tables.customer(spark, sf("sf0.001"))
    val o = Tables.orders(spark, sf("sf0.001"))
    // unique names: a stale warehouse dir from a previous JVM fails
    // CREATE TABLE with LOCATION_ALREADY_EXISTS even in overwrite mode
    val (tc, to) = (s"cust_b_${System.nanoTime}", s"ord_b_${System.nanoTime}")
    Sinks.writeBucketed(c, tc, "c_custkey", 8, Some("c_custkey"))
    Sinks.writeBucketed(o.withColumnRenamed("o_custkey", "c_custkey"),
      to, "c_custkey", 8, Some("c_custkey"))
    val j = spark.table(tc).join(spark.table(to), "c_custkey")
    // bucketed sides must not re-shuffle; disable AQE broadcast demotion
    // noise by checking for shuffle exchanges specifically
    val plan = j.queryExecution.executedPlan.toString
    assert(!plan.contains("ShuffleExchange") && !plan.contains("Exchange hashpartitioning"),
      s"bucketed join still shuffles:\n$plan")
    assert(j.count() > 0)
  }

  test("compaction bin-packs to the bytes-derived file count with no shuffle") {
    val out = Files.createTempDirectory("compact_out").toString
    val orders = Tables.orders(spark, sf("sf0.001"))
    orders.repartition(16).write.parquet(s"$out/small")
    def parquets(p: String) = new java.io.File(p).listFiles()
      .filter(_.getName.endsWith(".parquet"))
    assert(parquets(s"$out/small").length === 16)
    val totalBytes = parquets(s"$out/small").map(_.length).sum
    val target = 64L * 1024
    val expect = math.max(1, math.ceil(totalBytes.toDouble / target).toInt)
    val n = Sinks.compact(spark, s"$out/small", s"$out/compacted", target)
    assert(n === expect)
    assert(parquets(s"$out/compacted").length === n,
      "output file count must equal the bytes-derived target")
    // content identity: same multiset of orderkeys
    val back = spark.read.parquet(s"$out/compacted")
    assert(back.count() === orders.count())
    assert(back.select("o_orderkey").exceptAll(
      orders.select("o_orderkey")).count() === 0)
    // the no-shuffle property IS the operator: coalesce plans no exchange
    val plan = spark.read.parquet(s"$out/small").coalesce(n)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"),
      s"compaction must not shuffle the table:\n$plan")
  }

  test("mergeSchema surfaces the evolved column as NULL on legacy files") {
    val out = Files.createTempDirectory("evo_out").toString
    val o = Tables.orders(spark, sf("sf0.001"))
    o.where(col("o_orderkey") % 2 === 0)
      .select(col("o_orderkey"), col("o_totalprice"))
      .write.parquet(s"$out/legacy")
    o.where(col("o_orderkey") % 2 === 1)
      .select(col("o_orderkey"), col("o_totalprice"), col("o_orderpriority"))
      .write.parquet(s"$out/evolved")
    val merged = spark.read.option("mergeSchema", "true")
      .parquet(s"$out/legacy", s"$out/evolved")
    assert(merged.columns.contains("o_orderpriority"),
      "union schema must include the evolved column")
    // legacy rows: NULL priority, exactly the even keys; evolved keep theirs
    assert(merged.where(col("o_orderpriority").isNull)
      .agg(sum(col("o_orderkey") % 2)).head.getLong(0) === 0L)
    assert(merged.where(col("o_orderpriority").isNull).count() ===
      o.where(col("o_orderkey") % 2 === 0).count())
    assert(merged.where(col("o_orderpriority").isNotNull).count() ===
      o.where(col("o_orderkey") % 2 === 1).count())
  }

  test("dynamic partition overwrite replaces only the partitions in the incoming frame") {
    val ss = spark.newSession()
    ss.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    val out = Files.createTempDirectory("dynover_out").toString
    val o = graft.sources.Tables.orders(ss, sf("sf0.001"))
      .select(col("o_orderkey"), col("o_totalprice"), col("o_orderpriority"))
    o.write.mode("overwrite").partitionBy("o_orderpriority").parquet(out)
    def files(p: String): Set[String] = {
      val f = new java.io.File(p)
      if (!f.exists()) Set.empty
      else f.listFiles().map(_.getName).filter(_.endsWith(".parquet")).toSet
    }
    val partDirs = new java.io.File(out).listFiles()
      .map(_.getName).filter(_.startsWith("o_orderpriority=")).toSeq
    assert(partDirs.length === 5, s"expected 5 priority partitions, got $partDirs")
    val target = "o_orderpriority=1-URGENT"
    val before = partDirs.map(p => p -> files(s"$out/$p")).toMap
    o.where(col("o_orderpriority") === "1-URGENT" && col("o_totalprice") >= 50000)
      .write.mode("overwrite").partitionBy("o_orderpriority").parquet(out)
    // untouched partitions keep their EXACT file sets; the target's
    // files are replaced (part file names are unique per write)
    partDirs.filterNot(_ == target).foreach { p =>
      assert(files(s"$out/$p") === before(p),
        s"partition $p was rewritten by a backfill that did not include it")
    }
    assert(files(s"$out/$target").nonEmpty)
    assert(files(s"$out/$target").intersect(before(target)).isEmpty,
      "target partition must hold the restated write's files")
    // and the restatement is the only change in content
    val back = spark.read.parquet(out)
    assert(back.where(col("o_orderpriority") === "1-URGENT" &&
      col("o_totalprice") < 50000).count() === 0L)
    assert(back.where(col("o_orderpriority") =!= "1-URGENT").count() ===
      o.where(col("o_orderpriority") =!= "1-URGENT").count())
  }
}
