package graft

import org.apache.spark.sql.functions._
import graft.operators.Layout

/** Z-order layout: the interleave must be bit-exact against an
  * independent reference implementation, and the clustering must
  * actually buy the pruning it claims — per-file bounding boxes
  * narrow in BOTH dimensions, vs a single-column sort that leaves
  * the non-sort dimension unpruned.
  */
class LayoutSpec extends SparkTestBase {

  // independent reference: bit-by-bit interleave, no mask tricks
  private def mortonRef(x: Long, y: Long): Long =
    (0 until 16).foldLeft(0L) { (acc, i) =>
      acc | (((x >> i) & 1L) << (2 * i)) | (((y >> i) & 1L) << (2 * i + 1))
    }

  test("zValue16 matches the bit-by-bit reference on edge and random keys") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val keys = Seq((0L, 0L), (65535L, 65535L), (65535L, 0L), (0L, 65535L),
      (1L, 2L), (43690L, 21845L)) ++ // 0b1010.., 0b0101..
      Seq.fill(200)((rnd.nextInt(65536).toLong, rnd.nextInt(65536).toLong))
    val got = keys.toDF("x", "y")
      .select(col("x"), col("y"),
        Layout.zValue16(col("x"), col("y")).as("zv"))
      .as[(Long, Long, Long)].collect()
    got.foreach { case (x, y, zv) =>
      assert(zv === mortonRef(x, y), s"interleave($x, $y)")
    }
    // interleave is a bijection on the sampled set → no collisions
    assert(got.map(_._3).distinct.length === got.map(t => (t._1, t._2)).distinct.length)
  }

  test("z-clustering bounds BOTH dimensions per partition; a 1-D sort does not") {
    import spark.implicits._
    // uniform 256x256 grid, 64k rows, 16 output "files"
    val grid = spark.range(65536).select(
      (col("id") % 256).as("x"), expr("id DIV 256").as("y"))
    def boxes(df: org.apache.spark.sql.DataFrame): Seq[(Long, Long, Long, Long)] =
      df.withColumn("p", spark_partition_id())
        .groupBy(col("p"))
        .agg(min(col("x")).as("x0"), max(col("x")).as("x1"),
          min(col("y")).as("y0"), max(col("y")).as("y1"))
        .select(col("x0"), col("x1"), col("y0"), col("y1"))
        .as[(Long, Long, Long, Long)].collect().toSeq
    val zBoxes = boxes(
      Layout.zCluster(grid, col("x"), col("y"), 16).drop("zv"))
    val xSorted = boxes(
      grid.repartitionByRange(16, col("x")).sortWithinPartitions(col("x")))
    // 16 z-files over a 2^16 z-space → each is a run of ~4096
    // z-values ≈ a 64x64 tile. Sampled range boundaries are NOT
    // tile-aligned, and a run crossing a HIGH z-bit boundary unions
    // tiles from distant grid corners (the big Z jump), so a couple
    // of straddler files are legitimately wide — the claim that must
    // hold is that MOST files are tight in BOTH dims (the x-sort
    // leaves y at ~full width in every file). The judged q62 cells
    // are z-aligned by construction, so they carry the strict <64
    // bound.
    val tight = zBoxes.count { case (x0, x1, y0, y1) =>
      x1 - x0 <= 128 && y1 - y0 <= 128 }
    assert(tight >= zBoxes.length - 3,
      s"only $tight/${zBoxes.length} z-file boxes tight: $zBoxes")
    assert(xSorted.forall(b => b._4 - b._3 >= 250),
      "1-D sort unexpectedly bounded the non-sort dimension")
    // THE pruning claim — total bounding area is the same for any
    // partition of the domain, so the metric that separates layouts
    // is files READ under a single-dimension predicate: a y-only
    // predicate prunes z-files by their y stats but must read every
    // x-sorted file (y unbounded there). x-predicates prune both
    // layouts, so z-order trades nothing it doesn't win back.
    def filesRead(bs: Seq[(Long, Long, Long, Long)], y: Long): Int =
      bs.count { case (_, _, y0, y1) => y0 <= y && y <= y1 }
    val probes = Seq(10L, 60L, 130L, 200L, 250L)
    val zReads = probes.map(filesRead(zBoxes, _)).sum
    val sReads = probes.map(filesRead(xSorted, _)).sum
    assert(sReads === probes.length * xSorted.length,
      "x-sorted layout should read every file for a y predicate")
    assert(zReads * 2 < sReads,
      s"z layout read $zReads file-probes vs $sReads for the sort — no pruning win")
  }

  test("q62 cells partition the rows and carry consistent stats") {
    val out = Layout.q62ZorderLayout(spark, sf("sf0.001")).collect()
    assert(out.nonEmpty)
    val total = out.map(_.getAs[Long]("n_rows")).sum
    val liRows = graft.sources.Tables.lineitem(spark, sf("sf0.001")).count()
    assert(total === liRows, "cells must partition lineitem exactly")
    out.foreach { r =>
      assert(r.getAs[Long]("x_min") <= r.getAs[Long]("x_max"))
      assert(r.getAs[Long]("y_min") <= r.getAs[Long]("y_max"))
      // a 2^12 z-run is a 64x64 tile: footer stats must stay inside
      assert(r.getAs[Long]("x_max") - r.getAs[Long]("x_min") < 64)
      assert(r.getAs[Long]("y_max") - r.getAs[Long]("y_min") < 64)
    }
  }
}
