package graft

/** Perf probe for the q41 bounded streaming harness: repeated runs in
  * one JVM, per-run wall time — distinguishes per-run accumulation
  * (times grow with run index) from environment noise (random).
  * Run: sbt> Test/runMain graft.Q41Probe
  */
object Q41Probe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.get()
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    (1 to 6).foreach { i =>
      val t0 = System.nanoTime()
      val n = graft.streaming.StreamingGate.q41StreamSessionize(spark, d).count()
      println(f"[q41probe] run $i: ${(System.nanoTime() - t0) / 1e9}%.2fs rows=$n")
    }
    spark.stop()
  }
}
