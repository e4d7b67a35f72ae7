package graft

import org.apache.spark.sql.functions._
import graft.operators.KmvSketch
import graft.operators.KmvSketch.MinKDistinct

/** KMV sketch: aggregator invariants, estimator branches on a
  * hand-built population, partitioning determinism, and the error
  * bound the k=64 estimator owes (σ ≈ 1/√(k−2) ≈ 12.7% relative).
  */
class KmvSketchSpec extends SparkTestBase {
  import spark.implicits._

  private def h(x: Long): Long =
    java.lang.Math.floorMod(x * 2654435761L, KmvSketch.M)

  /** (f, h, key) rows: `na` keys only in A, `nb` only in B, `nc` in
    * both. Key spaces disjoint by construction.
    */
  private def pop(na: Int, nb: Int, nc: Int) = {
    val a = (1 to na).map(i => ("A", h(i.toLong), i.toLong))
    val b = (1 to nb).map(i => ("B", h(1000000L + i), 1000000L + i))
    val c = (1 to nc).flatMap { i =>
      val k = 2000000L + i
      Seq(("A", h(k), k), ("B", h(k), k))
    }
    (a ++ b ++ c).toDF("f", "h", "key")
  }

  test("MinKDistinct buffer: sorted, distinct, bounded, order-free") {
    val agg = new MinKDistinct(4)
    val r = Seq(9L, 3L, 9L, 7L, 1L, 5L, 3L, 2L)
      .foldLeft(agg.zero)(agg.reduce)
    assert(r === Seq(1L, 2L, 3L, 5L))
    // merge of partial buffers = reduce of the concatenated stream
    val xs = Seq(9L, 3L, 9L, 7L)
    val ys = Seq(1L, 5L, 3L, 2L)
    val m = agg.merge(
      xs.foldLeft(agg.zero)(agg.reduce), ys.foldLeft(agg.zero)(agg.reduce))
    assert(m === r)
    // below saturation the buffer IS the distinct set
    val small = Seq(5L, 5L, 2L).foldLeft(agg.zero)(agg.reduce)
    assert(small === Seq(2L, 5L))
  }

  test("below saturation every estimate is exact (sketch = set)") {
    // 40 distinct in A, 25 in B, 55 union, 10 intersect — every
    // population INCLUDING the union stays under k = 64, so each
    // sketch is its exact hash set (the union of two sub-k sketches
    // can still saturate: 50 ∪ 40 would be 80 ≥ k and estimate)
    val row = KmvSketch.kmvCompare(pop(30, 15, 10), "A", "B")
      .collect().head
    assert(row.getAs[Double]("est_a") === 40.0)
    assert(row.getAs[Long]("exact_a") === 40L)
    assert(row.getAs[Double]("est_n") === 25.0)
    assert(row.getAs[Long]("exact_n") === 25L)
    assert(row.getAs[Double]("est_union") === 55.0)
    // ρ·est_union replayed with the same IEEE ops, not assumed to
    // round-trip to the integer
    assert(row.getAs[Double]("est_inter") === (10.0 / 55.0) * 55.0)
    assert(row.getAs[Long]("exact_inter") === 10L)
  }

  test("saturated estimates land within the k=64 error envelope") {
    val row = KmvSketch.kmvCompare(pop(2000, 1500, 800), "A", "B")
      .collect().head
    def rel(est: Double, exact: Double) = math.abs(est - exact) / exact
    // 4 σ ≈ 51% — loose enough to never flake, tight enough that a
    // broken estimator (off by a factor) fails
    assert(rel(row.getAs[Double]("est_a"), 2800.0) < 0.51)
    assert(rel(row.getAs[Double]("est_n"), 2300.0) < 0.51)
    assert(rel(row.getAs[Double]("est_union"), 4300.0) < 0.51)
    assert(row.getAs[Long]("exact_a") === 2800L)
    assert(row.getAs[Long]("exact_n") === 2300L)
    assert(row.getAs[Long]("exact_inter") === 800L)
    // intersection: wider noise (ratio of two estimates) but must be
    // positive and nowhere near the union
    val ei = row.getAs[Double]("est_inter")
    assert(ei > 0.0 && ei < row.getAs[Double]("est_union"))
  }

  test("output is bit-identical under adversarial repartitioning") {
    val base = pop(2000, 1500, 800)
    val a = KmvSketch.kmvCompare(base.repartition(13), "A", "B")
      .collect().head.toSeq
    val b = KmvSketch.kmvCompare(base.coalesce(1), "A", "B")
      .collect().head.toSeq
    assert(a === b)
  }

  test("judged q99 runs on lineitem with coherent estimates") {
    val row = KmvSketch.q99KmvSketch(spark, sf("sf0.001")).collect().head
    assert(row.getAs[Long]("exact_a") > 64L) // saturation regime
    assert(row.getAs[Double]("est_a") > 0.0)
    assert(row.getAs[Double]("est_union") >=
      math.max(row.getAs[Double]("est_a"), row.getAs[Double]("est_n")) * 0.49)
  }
}
