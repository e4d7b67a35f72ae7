package graft

import org.apache.spark.sql.functions._
import graft.operators.ExactQuantile

/** Histogram-refinement k-th-smallest: exact at every rank, on
  * duplicate-heavy, negative, and wide-domain data — including
  * domains wide enough to force multiple refinement rounds.
  */
class ExactQuantileSpec extends SparkTestBase {
  import spark.implicits._

  private def check(values: Seq[Long], ranks: Seq[Long]): Unit = {
    val sorted = values.sorted
    val df = values.toDF("x").repartition(7)
    ranks.foreach { k =>
      assert(ExactQuantile.kthSmallest(df, col("x"), k) === sorted(k.toInt),
        s"rank $k over ${values.size} values")
    }
  }

  test("exact at every rank on a small duplicate-heavy set") {
    val vs = Seq.tabulate(200)(i => (i * 37 % 11).toLong - 3)
    check(vs, vs.indices.map(_.toLong))
  }

  test("extreme ranks, negatives, and a single distinct value") {
    check(Seq.fill(50)(42L), Seq(0L, 25L, 49L))
    val vs = Seq.tabulate(101)(i => (i - 50).toLong * 1000)
    check(vs, Seq(0L, 50L, 100L))
  }

  test("wide domain forces multi-round refinement and stays exact") {
    // domain ~ 1e9 >> 4096^1, so at least two histogram rounds run
    val vs = Seq.tabulate(500)(i => (i % 7 + 1).toLong * i * 1999993L)
    check(vs, Seq(0L, 123L, 250L, 377L, 499L))
  }

  test("out-of-range rank fails the invariant loudly") {
    val df = Seq(1L, 2L, 3L).toDF("x")
    intercept[IllegalArgumentException] {
      ExactQuantile.kthSmallest(df, col("x"), 3L)
    }
  }
}
