package graft.sources

import org.apache.spark.sql.SparkSession

/** SQL surface: register every judged table as a temp view so users
  * run plain `spark.sql(...)` — the interface the reference's Hive
  * and Spark-on-YARN tasks imply (SURVEY.md §3.3: the same two
  * queries were meant to run as SQL; no .hql survives). Together
  * with the session-extension function registrations
  * (cosine_native), this makes the whole engine reachable from SQL.
  */
object Views {
  def register(spark: SparkSession, sfDir: String): Unit =
    Tables.names.foreach { t =>
      val df = t match {
        case "events" => Tables.events(spark, sfDir) // ns→µs normalization
        case _ => Tables.load(spark, sfDir, t)
      }
      df.createOrReplaceTempView(t)
    }
}
