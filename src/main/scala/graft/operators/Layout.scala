package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables
import graft.Catalog.Q

/** Data-layout operators — the write-side half of scan pruning.
  *
  * At 100 TB the cheapest predicate is the one that never reads the
  * file: parquet min/max footer stats prune whole files, but only if
  * the writer CLUSTERED the data so each file covers a narrow range.
  * A single-column sort gives that for one dimension and destroys it
  * for every other; Z-ORDER (Morton) interleaving the bits of two
  * bucket keys gives locality in BOTH dimensions at once — each
  * contiguous z-range is a small rectangle-ish region of the (x, y)
  * grid, so per-file min/max stays narrow on x AND y and either
  * predicate prunes (the technique behind Delta/Iceberg OPTIMIZE
  * ZORDER; Morton, 1966).
  *
  * Everything here is exact integer bit arithmetic on built-in
  * expressions (shifts/masks — whole-stage-codegen friendly, no
  * UDF), which also makes the judged query fully oracle-checkable:
  * DuckDB reproduces the interleave bit-for-bit.
  */
object Layout {

  /** Spread the low 16 bits of `c` so bit i lands at position 2i —
    * the classic 4-step mask doubling (x | x<<8 & m8, …). Input must
    * already be < 2^16; outputs fit in 32 bits, BIGINT throughout.
    */
  private[graft] def spread16(c: Column): Column = {
    val m = Seq(
      (8, 0x00FF00FFL),
      (4, 0x0F0F0F0FL),
      (2, 0x33333333L),
      (1, 0x55555555L))
    m.foldLeft(c.cast("bigint").bitwiseAND(lit(0xFFFFL))) {
      case (acc, (sh, mask)) =>
        acc.bitwiseOR(shiftleft(acc, sh)).bitwiseAND(lit(mask))
    }
  }

  /** Morton z-value of two 16-bit bucket keys: x bits at even
    * positions, y bits at odd — 32 bits total.
    */
  private[graft] def zValue16(x: Column, y: Column): Column =
    spread16(x).bitwiseOR(shiftleft(spread16(y), 1))

  /** The judged artifact: lineitem bucketed on two independent keys
    * (orderkey, partkey — the two a real workload filters by),
    * z-valued, and aggregated per z-RANGE cell (the file-sized
    * contiguous z-run a writer would emit): row count plus the
    * min/max footer stats of BOTH dimensions. These rows ARE the
    * pruning index the layout buys — the LayoutSpec quantifies that
    * their per-cell bounding boxes cover a fraction of the domain a
    * single-column sort leaves uncovered on its non-sort dimension.
    * One scan + one hash aggregate; the z-value is row-local.
    */
  def q62ZorderLayout(s: SparkSession, d: String): DataFrame = {
    val dims = Tables.lineitem(s, d).select(
      (col("l_orderkey") % 4096).cast("bigint").as("x"),
      (col("l_partkey") % 4096).cast("bigint").as("y"))
    dims
      .withColumn("zv", zValue16(col("x"), col("y")))
      // 24-bit z-space / 2^12 → 4096 cells ≈ 64×64 rectangles
      .groupBy(shiftright(col("zv"), 12).as("z_cell"))
      .agg(count(lit(1)).as("n_rows"),
        min(col("x")).as("x_min"), max(col("x")).as("x_max"),
        min(col("y")).as("y_min"), max(col("y")).as("y_max"))
      .orderBy(col("z_cell"))
  }

  /** Cluster `df` for writing: range-partition on the z-value and
    * sort within partitions, so every output file covers one narrow
    * z-run (= small x AND y bounding box). The write-side verb the
    * judged aggregate's stats assume; LayoutSpec drives it and
    * measures per-partition bounding boxes directly.
    *
    * Caveat a deployment should know: sampled range boundaries are
    * not z-aligned, and a file whose z-run crosses a HIGH bit of the
    * curve unions tiles from distant grid corners (the big Z jump),
    * so a few straddler files carry wide min/max stats. Writers that
    * need every file tight align file cuts to z prefixes (cut at
    * multiples of a tile size) at the cost of uneven file sizes.
    */
  private[graft] def zCluster(df: DataFrame, x: Column, y: Column,
      numFiles: Int): DataFrame =
    df.withColumn("zv", zValue16(x, y))
      .repartitionByRange(numFiles, col("zv"))
      .sortWithinPartitions(col("zv"))

  // DuckDB twin of spread16/zValue16 — same 4 mask-doubling steps,
  // bit-for-bit
  private def spreadSql(e: String): String = {
    val s0 = s"(($e) & 65535)"
    val s1 = s"((($s0 | ($s0 << 8)) & 16711935))"
    val s2 = s"((($s1 | ($s1 << 4)) & 252645135))"
    val s3 = s"((($s2 | ($s2 << 2)) & 858993459))"
    s"((($s3 | ($s3 << 1)) & 1431655765))"
  }

  val queries: Seq[Q] = Seq(
    Q("q62_zorder_layout", q62ZorderLayout, Some(s"""
      WITH dims AS (
        SELECT CAST(l_orderkey % 4096 AS BIGINT) AS x,
               CAST(l_partkey % 4096 AS BIGINT) AS y
        FROM lineitem),
      z AS (
        SELECT x, y,
               (${spreadSql("x")} | (${spreadSql("y")} << 1)) AS zv
        FROM dims)
      SELECT zv >> 12 AS z_cell,
             count(*) AS n_rows,
             min(x) AS x_min, max(x) AS x_max,
             min(y) AS y_min, max(y) AS y_max
      FROM z
      GROUP BY z_cell
      ORDER BY z_cell""")))
}
