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
}
