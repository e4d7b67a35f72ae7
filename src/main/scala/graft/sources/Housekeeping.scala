package graft.sources

import java.nio.file.{Files, Path}
import java.util.concurrent.ConcurrentHashMap
import org.apache.spark.sql.SparkSession

/** JVM-lifetime housekeeping for per-invocation scratch artifacts —
  * temp directories and managed tables created by judged queries
  * (q40/q44's roundtrip dirs, q52's bucketed tables, the streaming
  * gates' file-source dirs).
  *
  * Two rules, one shutdown hook:
  *
  *  - Re-invocation under the same tag RETIRES the previous
  *    invocation's artifact immediately, so repeated bench/verify
  *    passes hold at most one live artifact per tag instead of
  *    accumulating dirs/tables (and one hook Thread each) for the
  *    JVM lifetime.
  *  - One hook sweeps whatever is still registered at exit.
  *
  * The deferred-retire contract assumes per-tag invocations are
  * sequential and the previous invocation's consuming action has run
  * before the next invocation starts — true for Verify, Bench, and
  * the specs, which drive each judged query to completion before
  * re-invoking it. (A still-lazy DataFrame from invocation N loses
  * its files when invocation N+1 registers; that was already the
  * contract of the old per-invocation Overwrite scheme.)
  */
object Housekeeping {

  private val liveDirs = new ConcurrentHashMap[String, Path]()
  private val liveTables =
    new ConcurrentHashMap[String, (SparkSession, Seq[String])]()

  private def rm(f: java.io.File): Unit = {
    Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
  }

  private def drop(s: SparkSession, table: String): Unit =
    try s.sql(s"DROP TABLE IF EXISTS $table")
    catch {
      // session already stopping (shutdown ordering): fall back to
      // removing the managed location directly so the warehouse dir
      // doesn't grow across JVMs
      case _: Throwable =>
        val wh = s.conf.get("spark.sql.warehouse.dir", "/tmp/graft_warehouse")
          .stripPrefix("file:")
        rm(new java.io.File(s"$wh/${table.toLowerCase}"))
    }

  // exactly ONE hook for the whole JVM, registered at first use
  sys.addShutdownHook {
    liveDirs.values.forEach(p => rm(p.toFile))
    liveTables.values.forEach { case (s, names) => names.foreach(drop(s, _)) }
  }

  /** Fresh scratch dir for `tag`; deletes the previous one. */
  def tempDir(tag: String): String = {
    val p = Files.createTempDirectory(s"graft_${tag}_")
    Option(liveDirs.put(tag, p)).foreach(old => rm(old.toFile))
    p.toString
  }

  /** Register `names` as tag's live managed tables; drops the
    * previous set (catalog entry + warehouse files).
    */
  def tables(s: SparkSession, tag: String, names: Seq[String]): Unit =
    Option(liveTables.put(tag, (s, names))).foreach { case (os, olds) =>
      olds.foreach(drop(os, _))
    }
}
