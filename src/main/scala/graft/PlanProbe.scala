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
