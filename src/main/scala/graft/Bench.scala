package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main: one JSON line with per-query seconds.
  *
  * Methodology: each query's FIRST run is its SETUP run — it pays
  * JVM/codegen/classloading and, for the I/O-fixture queries (lake
  * commits, stream checkpoints), the cold-cache fixture build that
  * made past driver records swing 18× on identical code. Then THREE
  * measured passes, reporting the median — a single pass at test
  * scale is dominated by GC and sandbox-neighbor noise. The stdout
  * line keeps the driver contract (queries = medians); the
  * BENCH_FULL.json artifact of record additionally carries the
  * per-query "setup" map so round-over-round comparisons can
  * separate steady-state plan cost from first-touch I/O weather.
  * A failing query contributes an "err" entry and is EXCLUDED from
  * the total rather than silently counted as a fast run.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    // optional subset for local iteration: comma-separated query names;
    // subset runs skip the artifact-of-record write below
    val only: Option[Set[String]] =
      sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").map(_.trim).toSet)
    val spark = GraftSession.get()
    val selected = SparkEntry.queries.filter { case (n, _) =>
      only.forall(_.contains(n))
    }
    def timeWith(s: SparkSession, label: String = "")(
        fn: (SparkSession, String) => org.apache.spark.sql.DataFrame)
        : Either[String, Double] = {
      // §1.5 of the optimization guide: label the jobs so UI/event-log
      // forensics can attribute time per query. Thread-local, free.
      if (label.nonEmpty) s.sparkContext.setJobDescription(label)
      val t0 = System.nanoTime()
      try { fn(s, sfDir).count(); Right((System.nanoTime() - t0) / 1e9) }
      catch { case e: Throwable =>
        Left(Option(e.getMessage).getOrElse(e.getClass.getName).take(200)) }
      finally if (label.nonEmpty) s.sparkContext.setJobDescription(null)
    }
    def timeOnce(label: String)(
        fn: (SparkSession, String) => org.apache.spark.sql.DataFrame)
        : Either[String, Double] = timeWith(spark, label)(fn)
    // setup pass: per-query first-touch cost, measured and reported
    // separately rather than folded into (or silently excluded from)
    // the medians
    val setups: Map[String, Double] = selected.toSeq.sortBy(_._1).flatMap {
      case (name, fn) => timeOnce(s"setup:$name")(fn).toOption.map(name -> _)
    }.toMap
    // true median for even lengths too: with only 2 of 3 runs
    // succeeding, times(len/2) would report the MAX of the pair
    def median(ts: Seq[Double]): Double =
      if (ts.length % 2 == 1) ts(ts.length / 2)
      else (ts(ts.length / 2 - 1) + ts(ts.length / 2)) / 2
    val results: Seq[(String, Either[String, Double])] =
      selected.toSeq.sortBy(_._1).map { case (name, fn) =>
        val runs = (1 to 3).map(i => timeOnce(s"bench:$name:run$i")(fn))
        val times = runs.collect { case Right(t) => t }.sorted
        name -> (if (times.nonEmpty) Right(median(times))
                 else runs.head)
      }
    def jq(s: String): String =
      "\"" + s.flatMap {
        case '"' => "\\\""; case '\\' => "\\\\"
        case c if c < ' ' => f"\\u${c.toInt}%04x"; case c => c.toString
      } + "\""
    // driver contract: "queries" is name -> seconds (numbers only);
    // failures go to a parallel "errors" map instead of a fake timing.
    // 3-decimal seconds: full-precision doubles made the 112-entry
    // line outgrow the driver's stdout tail capture (BENCH_r05 was
    // head-truncated and unparseable); ms resolution is below the
    // run-to-run noise floor anyway.
    val qs = results.collect { case (k, Right(t)) => f"${jq(k)}:$t%.3f" }
      .mkString("{", ",", "}")
    val errs = results.collect { case (k, Left(e)) => s"${jq(k)}:${jq(e)}" }
      .mkString("{", ",", "}")
    val total = results.collect { case (_, Right(t)) => t }.sum
    val line = f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qs,"errors":$errs,"sf":"$sfDir"}"""
    // NOTE: the driver-contract stdout line prints at the very END of
    // main, AFTER the last SparkSession has stopped — round 14's
    // artifact lost the line entirely because streaming-shutdown WARN
    // spew after it pushed it out of the driver's 2000-char tail
    // capture. Nothing can log once the session is down.
    // artifact of record: the driver captures stdout with a tail, which
    // has truncated the head of the per-query map in past rounds — also
    // write the full line to a file it can pick up whole (full runs
    // only — a subset run must not clobber the catalog-wide record).
    // The file carries the extra "setup" map (first-touch seconds per
    // query); the stdout line stays at the driver-contract size.
    val st = setups.toSeq.sorted.map { case (k, t) => f"${jq(k)}:$t%.3f" }
      .mkString("{", ",", "}")
    val setupTotal = setups.values.sum
    // ISOLATED medians for the 10 slowest queries, in a FRESH
    // SparkSession: the full-catalog window reads 1.3-1.5x hot across
    // unrelated queries (GC + neighbor contention), and the
    // end-of-pass session additionally carries a catalog full of
    // registered streams, scratch lake roots and shuffle dirs —
    // round 14's in-session isolated medians read ~2x over a manual
    // fresh-session SPARK_GRAFT_ONLY re-measure of the identical
    // plans. Stopping the catalog session and re-running the slow
    // tail in a new one (one setup pass + 3 measured, same shape as
    // a manual re-measure) converges the two methodologies; the
    // artifact stamps the method so readers don't have to guess.
    // Record runs only: a subset iteration run discards the artifact,
    // so paying 40 extra executions would just slow the loop the env
    // var exists to speed up.
    if (only.isEmpty) {
      val slowest = results.collect { case (k, Right(t)) => (k, t) }
        .sortBy(-_._2).take(10).map(_._1)
      spark.stop()
      val fresh = GraftSession.get()
      val isolated: Seq[(String, Double)] = slowest.flatMap { name =>
        val fn = selected(name)
        timeWith(fresh, s"iso-setup:$name")(fn): Unit // first-touch I/O + codegen
        val ts = (1 to 3).flatMap(i =>
          timeWith(fresh, s"iso:$name:run$i")(fn).toOption).sorted
        if (ts.isEmpty) None else Some(name -> median(ts))
      }
      fresh.stop()
      val iso = isolated.sortBy(_._1)
        .map { case (k, t) => f"${jq(k)}:$t%.3f" }
        .mkString("{", ",", "}")
      val full = line.dropRight(1) +
        f""","setup":$st,"setup_total":$setupTotal%.3f""" +
        f""","isolated":$iso,"isolated_method":"fresh_session"}"""
      java.nio.file.Files.write(
        java.nio.file.Paths.get("/root/repo/BENCH_FULL.json"),
        (full + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    } else spark.stop()
    // the driver-contract line, printed into a quiet JVM (see above)
    println(line)
  }
}
