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

  test("multi-rank selection shares histogram passes") {
    // dense small domain: one width-1 histogram answers ALL nine
    // deciles in a single pass
    val dense = Seq.tabulate(1000)(i => (i % 100).toLong).toDF("x")
    val ks = (1 to 9).map(_ * 100L - 1)
    val sorted = Seq.tabulate(1000)(i => (i % 100).toLong).sorted
    val got = graft.operators.ExactQuantile.kthSmallests(dense, col("x"), ks)
    assert(got === ks.map(k => sorted(k.toInt)))
    assert(graft.operators.ExactQuantile.lastPasses === 1,
      s"dense deciles should share one histogram, ran ${
        graft.operators.ExactQuantile.lastPasses}")
    // wide sparse domain: ranks split after the shared first pass;
    // total passes stay ≤ 1 + ranks·(levels-1), far under
    // ranks·levels independent runs
    val wide = Seq.tabulate(500)(i => i.toLong * 2000003L).toDF("x")
    val ksW = (1 to 9).map(_ * 50L - 1)
    val gotW = graft.operators.ExactQuantile.kthSmallests(wide, col("x"), ksW)
    assert(gotW === ksW.map(k => k * 2000003L))
    assert(graft.operators.ExactQuantile.lastPasses <= 1 + 9 * 2,
      s"sparse deciles ran ${graft.operators.ExactQuantile.lastPasses} passes")
  }

  test("grouped selection resolves every group exactly in shared passes") {
    val rows =
      Seq.tabulate(300)(i => ("dense", (i % 100).toLong)) ++
        Seq.tabulate(200)(i => ("sparse", i.toLong * 2000003L)) ++
        Seq.fill(7)(("const", 42L))
    val df = rows.toDF("g", "x").repartition(5)
    val got = graft.operators.ExactQuantile
      .groupedKthSmallest(df, col("g"), col("x"), n => n / 2)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    def expected(vs: Seq[Long]): Long = vs.sorted.apply(vs.size / 2)
    assert(got === Map(
      "dense" -> expected(rows.filter(_._1 == "dense").map(_._2)),
      "sparse" -> expected(rows.filter(_._1 == "sparse").map(_._2)),
      "const" -> 42L))
    // passes = the DEEPEST group's refinement depth, not the sum:
    // dense needs 1 (width-1 first histogram), sparse ~3, const 0
    assert(graft.operators.ExactQuantile.lastPasses <= 3,
      s"grouped passes not shared: ${graft.operators.ExactQuantile.lastPasses}")
  }

  test("full-2^64-span domain: the zero-split keeps every rank exact") {
    // Long.MinValue..Long.MaxValue wraps hi - lo; the per-row offset
    // v - lo would overflow (throw under ANSI). The zero-split path
    // must route ranks across the negative/positive halves exactly.
    val vs = Seq(Long.MinValue, Long.MinValue + 7, -5L, -1L, 0L, 3L,
      Long.MaxValue - 2, Long.MaxValue)
    check(vs, vs.indices.map(_.toLong))
  }

  test("grouped: wrapped-domain group resolves next to normal groups") {
    val rows =
      Seq(("wide", Long.MinValue), ("wide", -3L), ("wide", 10L),
        ("wide", Long.MaxValue), ("wide", 99L)) ++
        Seq.tabulate(50)(i => ("norm", (i % 10).toLong))
    val df = rows.toDF("g", "x").repartition(3)
    val got = graft.operators.ExactQuantile
      .groupedKthSmallest(df, col("g"), col("x"), n => n / 2)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got === Map("wide" -> 10L, "norm" -> 5L))
  }

  test("grouped: null group keys are excluded, not a crash") {
    val rows: Seq[(String, Long)] =
      Seq((null, 1L), (null, 2L), ("a", 5L), ("a", 6L), ("a", 7L))
    val df = rows.toDF("g", "x")
    val got = graft.operators.ExactQuantile
      .groupedKthSmallest(df, col("g"), col("x"), n => n / 2)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got === Map("a" -> 6L))
  }

  test("out-of-range rank fails the invariant loudly") {
    val df = Seq(1L, 2L, 3L).toDF("x")
    intercept[IllegalArgumentException] {
      ExactQuantile.kthSmallest(df, col("x"), 3L)
    }
  }
}
