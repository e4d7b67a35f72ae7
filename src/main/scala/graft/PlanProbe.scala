package graft

/** Dev utility: print a catalog query's executed plan at sf0.001.
  * Usage: `sbt "runMain graft.PlanProbe q66_lateral_join"` — the
  * iterate-on-the-plan loop the build discipline calls for, without
  * writing a throwaway spec per inspection.
  */
object PlanProbe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.get()
    val df = Catalog.queryMap(args(0))(spark, "/root/testdata/sf0.001")
    println("=====PLAN=====")
    println(df.queryExecution.executedPlan.toString)
    spark.stop()
  }
}

/** Dev utility: dump `.explain("formatted")` for EVERY catalog query
  * to one file per query — the plan corpus the optimization rounds
  * grep for Exchange counts, join strategies and pushdown evidence.
  * Usage: `sbt "runMain graft.PlanDump <outDir> [sfDir] [q1,q2,...]"`.
  * Construction (not execution) cost only; a query whose constructor
  * throws gets an `ERROR` file instead of killing the sweep.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val out = java.nio.file.Paths.get(args(0))
    java.nio.file.Files.createDirectories(out)
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.001"
    val only: Option[Set[String]] =
      if (args.length > 2) Some(args(2).split(",").map(_.trim).toSet)
      else None
    val spark = GraftSession.get()
    val names = Catalog.all.map(_.name).filter(n => only.forall(_.contains(n)))
    names.foreach { name =>
      val txt =
        try {
          val df = Catalog.queryMap(name)(spark, dir)
          // "formatted" via the public API (captures the string
          // instead of printing): same text explain("formatted") shows
          df.queryExecution.explainString(
            org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
        } catch { case e: Throwable =>
          s"ERROR constructing $name: ${e.getClass.getName}: ${e.getMessage}"
        }
      java.nio.file.Files.write(out.resolve(s"$name.txt"),
        txt.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      println(s"[plandump] $name")
    }
    spark.stop()
  }
}

/** Dev utility: run one (or more) catalog queries at a given SF with
  * a StreamingQueryListener attached and print every micro-batch's
  * duration breakdown (triggerExecution / getBatch / addBatch /
  * walCommit / commitOffsets / stateStore metrics) plus the wall
  * clock of the whole invocation — the measurement §1 of the
  * optimization guide asks for before touching a streaming gate.
  * Usage: `sbt "runMain graft.StreamProbe q188_stream_full_outer [sfDir]"`.
  */
class ProbeListener
    extends org.apache.spark.sql.streaming.StreamingQueryListener {
  import org.apache.spark.sql.streaming.StreamingQueryListener._
  override def onQueryStarted(e: QueryStartedEvent): Unit =
    println(s"[probe] started ${e.name} wall=${System.currentTimeMillis()}")
  override def onQueryProgress(e: QueryProgressEvent): Unit = {
    val p = e.progress
    println(s"[probe] ${p.name} batch=${p.batchId} rows=${p.numInputRows} " +
      s"wall=${System.currentTimeMillis()} durations=${p.durationMs} " +
      s"state=${p.stateOperators.map(s =>
        s"(rows=${s.numRowsTotal},commitMs=${s.commitTimeMs})").mkString}")
  }
  override def onQueryTerminated(e: QueryTerminatedEvent): Unit =
    println(s"[probe] terminated wall=${System.currentTimeMillis()}")
}

object StreamProbe {
  def main(args: Array[String]): Unit = {
    val names = args(0).split(",").map(_.trim).toSeq
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    // conf-registered (not addListener): the gates run on CLONED
    // sessions, whose own StreamingQueryManagers instantiate the
    // listener from the inherited conf
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val spark = GraftSession.builder(cpus)
      .config("spark.sql.streaming.streamingQueryListeners",
        "graft.ProbeListener")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    names.foreach { name =>
      (1 to 2).foreach { i =>
        val (c0, s0) = graft.sources.SnapshotLake.statsAccounting
        val t0 = System.nanoTime()
        val n = Catalog.queryMap(name)(spark, dir).count()
        val dt = (System.nanoTime() - t0) / 1e9
        val (c1, s1) = graft.sources.SnapshotLake.statsAccounting
        println(f"[probe] $name run$i: $dt%.2f s ($n rows) " +
          f"statsPass=${c1 - c0} calls ${s1 - s0}%.2f s")
      }
    }
    spark.stop()
  }
}

/** Dev utility: measure d7's two EXACT plans against each other on a
  * given fixture — the r15/r16 verdict ask ("verify with one
  * experiment whether an exact length/df bound prunes pairs before
  * the count-agg without touching recall"). Both plans ARE the exact
  * bounds in question: the size filter (J ≥ τ ⇒ min ≥ τ·max) rides
  * both joins, and the prefix plan is the df-rank bound (PPJoin's
  * prefix theorem — the only exact df-based prune there is). Usage:
  * `sbt "runMain graft.D7Ablation [sfDir]"` (default sf0.1).
  */
object D7Ablation {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.get()
    val docs = graft.operators.Dedup.docShingles(
      graft.sources.Tables.documents(spark, dir))
    val share = graft.operators.Dedup.hotShingleShare(docs)
    println(f"[d7ablation] hotShingleShare=$share%.4f " +
      s"(threshold ${graft.operators.Dedup.HotShareThreshold})")
    def time(tag: String)(df: => org.apache.spark.sql.DataFrame): Unit = {
      val n = df.count() // warmup: codegen + file listing
      val runs = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); df.count(); (System.nanoTime() - t0) / 1e9
      }.sorted
      println(f"[d7ablation] $tag: median ${runs(1)}%.2f s ($n rows; " +
        s"runs ${runs.map(t => f"$t%.2f").mkString(", ")})")
    }
    val tau = graft.operators.Dedup.D7Tau
    time("count-agg")(graft.operators.Dedup.d7CountAgg(docs, tau))
    time("prefix-filtered")(graft.operators.Dedup.d7Prefix(docs, tau))
    spark.stop()
  }
}

/** Dev utility: measure q70's native broadcast range join against the
  * stock BroadcastNestedLoopJoin formulation of the identical query
  * (same fixture, same aggregate) — the ablation behind the custom
  * operator's existence. Usage:
  * `sbt "runMain graft.RangeJoinAblation [sfDir]"` (default sf0.1).
  */
object RangeJoinAblation {
  def main(args: Array[String]): Unit = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types.LongType
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.get()
    def time(tag: String)(df: => org.apache.spark.sql.DataFrame): Unit = {
      df.count() // warmup: codegen + file listing
      val runs = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); df.count(); (System.nanoTime() - t0) / 1e9
      }.sorted
      println(f"[ablation] $tag: median ${runs(1)}%.2f s " +
        s"(runs ${runs.map(t => f"$t%.2f").mkString(", ")})")
    }
    val iv = spark.range(0, 4096).select(
      col("id").as("interval_id"),
      (col("id") * 9973 % 100000 * 100).as("lo_cents"),
      ((col("id") * 9973 % 100000 + 10 + col("id") % 200) * 100).as("hi_cents"))
    def probe = graft.sources.Tables.lineitem(spark, dir)
      .select(round(col("l_extendedprice") * 100).cast(LongType).as("cents"))
    time("native-range-join")(
      graft.operators.Joins.q70RangeJoinNative(spark, dir))
    time("stock-broadcast-nlj")(
      probe.join(broadcast(iv),
          col("cents") >= col("lo_cents") && col("cents") < col("hi_cents"))
        .groupBy(col("interval_id"))
        .agg(count(lit(1)).as("n_items"), sum(col("cents")).as("sum_cents"))
        .orderBy(col("interval_id")))
    spark.stop()
  }
}
