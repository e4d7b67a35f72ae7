package graft

import graft.sources.Views

/** The engine's SQL surface: registered views + injected functions
  * must make the judged semantics reachable from plain spark.sql.
  */
class SqlSurfaceSpec extends SparkTestBase {

  test("reference queries run as plain SQL over registered views") {
    Views.register(spark, sf("sf0.001"))
    // Q1 analog in SQL
    val q1 = spark.sql("""
      SELECT n_name, date_format(o_orderdate, 'yyyy-MM') AS ym,
             count(*) AS n
      FROM orders
      JOIN customer ON o_custkey = c_custkey
      JOIN nation ON c_nationkey = n_nationkey
      GROUP BY n_name, ym""")
    assert(q1.count() > 0)
    // Q2 analog in SQL over the normalized events view (ts usable as
    // a real timestamp despite the parquet nanos encoding)
    val q2 = spark.sql("""
      SELECT date_format(ts, 'yyyy-MM') AS ym, sum(value) AS total
      FROM events WHERE value IS NOT NULL
      GROUP BY ym ORDER BY total DESC, ym ASC LIMIT 1""")
    assert(q2.count() === 1)
    // engine-native function reachable from SQL
    val cn = spark.sql("""
      SELECT cosine_native(a.embedding, b.embedding) AS c
      FROM embeddings a JOIN embeddings b ON a.vec_id = 0 AND b.vec_id = 1""")
      .collect()(0).getDouble(0)
    assert(cn >= -1.0 && cn <= 1.0)
  }

  test("time travel composes in pure SQL: version-pinned tables over one lake") {
    import org.apache.spark.sql.functions._
    import graft.sources.{Housekeeping, SnapshotLake}
    val root = Housekeeping.tempDir("sql_asof")
    val ev = spark.range(0, 1000).selectExpr(
      "id AS event_id", "id * 7 AS cents")
    SnapshotLake.commit(spark, root,
      ev.where(col("event_id") < 500), "event_id") // v0
    SnapshotLake.commit(spark, root,
      ev.where(col("event_id") >= 500), "event_id") // v1
    SnapshotLake.commit(spark, root,
      ev.where(col("event_id") % 2 === 0), "event_id",
      overwrite = true) // v2: logical replace
    val tbls = Seq("sql_lake_v0", "sql_lake_v1", "sql_lake_head")
    tbls.foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
    Housekeeping.tables(spark, "sql_asof_tbls", tbls)
    // the as-of pin is a table OPTION — a versioned read is just
    // another table name, so any SQL shape composes with it
    spark.sql(s"""CREATE TABLE sql_lake_v0 USING graft.sources.GraftLakeSource
                  OPTIONS (path '$root', version '0')""")
    spark.sql(s"""CREATE TABLE sql_lake_v1 USING graft.sources.GraftLakeSource
                  OPTIONS (path '$root', version '1')""")
    spark.sql(s"""CREATE TABLE sql_lake_head USING graft.sources.GraftLakeSource
                  OPTIONS (path '$root')""")
    val got = spark.sql("""
      SELECT 'v0' AS snap, count(*) AS n, sum(cents) AS s FROM sql_lake_v0
      UNION ALL
      SELECT 'v1', count(*), sum(cents) FROM sql_lake_v1
      UNION ALL
      SELECT 'head', count(*), sum(cents) FROM sql_lake_head
      ORDER BY snap""").collect().map(r =>
        (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    def s(lo: Long, hi: Long) = (lo until hi).map(_ * 7).sum
    assert(got === Seq(
      ("head", 500L, (0L until 1000L by 2).map(_ * 7).sum),
      ("v0", 500L, s(0, 500)),
      ("v1", 1000L, s(0, 1000))))
    // pinned tables are frozen; the head table follows new commits —
    // including ones arriving through the SQL WRITE path
    spark.sql("INSERT INTO sql_lake_head VALUES (2000, 1)")
    assert(spark.table("sql_lake_head").count() === 501L)
    assert(spark.table("sql_lake_v0").count() === 500L)
    assert(spark.table("sql_lake_v1").count() === 1000L)
    // and a versioned table still prunes: predicate reaches the
    // manifest through the pinned snapshot
    val pruned = spark.sql(
      "SELECT count(*) AS n FROM sql_lake_v1 WHERE event_id < 250")
    assert(pruned.head().getLong(0) === 250L)
  }
}
