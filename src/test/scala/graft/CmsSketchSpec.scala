package graft

import org.apache.spark.sql.functions._
import graft.operators.CmsSketch
import graft.operators.CmsSketch.{CountMin, D, W, cell}

/** CMS: counter-matrix invariants, the one-sided error guarantee,
  * merge/reduce agreement, partitioning determinism, and the judged
  * q100 shape.
  */
class CmsSketchSpec extends SparkTestBase {
  import spark.implicits._

  test("CountMin matrix: total mass per hash row = stream length") {
    val agg = new CountMin
    val xs = Seq(3L, 7L, 3L, 11L, 3L, 7L)
    val m = xs.foldLeft(agg.zero)(agg.reduce)
    (0 until D).foreach { i =>
      assert(m.slice(i * W, (i + 1) * W).sum === xs.length.toLong)
    }
    // the exact cells carry the exact counts (collisions only add)
    assert(m(0 * W + cell(0, 3L)) >= 3L)
    assert(m(1 * W + cell(1, 7L)) >= 2L)
  }

  test("merge of partial matrices = reduce of the concatenated stream") {
    val agg = new CountMin
    val xs = Seq(1L, 2L, 3L, 2L)
    val ys = Seq(3L, 3L, 9L)
    val merged = agg.merge(
      xs.foldLeft(agg.zero)(agg.reduce), ys.foldLeft(agg.zero)(agg.reduce))
    val direct = (xs ++ ys).foldLeft(agg.zero)(agg.reduce)
    assert(merged.toSeq === direct.toSeq)
  }

  test("estimates never underestimate, and are exact without collisions") {
    // 2000 keys over a domain of 40 → heavy collisions per cell are
    // possible but the one-sided guarantee must hold for every probe
    val keys = (1L to 2000L).map(i => i % 40L + 1L).toDF("key")
    val rows = CmsSketch.cmsEstimate(keys, 1L to 8L).collect()
    assert(rows.length === 8)
    rows.foreach { r =>
      assert(r.getAs[Long]("cms_est") >= r.getAs[Long]("exact_cnt"),
        s"CMS underestimated key ${r.getAs[Long]("key")}")
    }
    // 40 distinct keys into 512 cells x 4 rows: at least one hash row
    // is overwhelmingly likely collision-free per probe; with the
    // fixed seeds this is deterministic — pin exactness outright
    rows.foreach { r =>
      assert(r.getAs[Long]("cms_est") === r.getAs[Long]("exact_cnt"))
    }
  }

  test("output is bit-identical under adversarial repartitioning") {
    val keys = (1L to 3000L).map(i => i % 97L + 1L).toDF("key")
    val a = CmsSketch.cmsEstimate(keys.repartition(17), 1L to 8L)
      .collect().map(_.toSeq).toSeq
    val b = CmsSketch.cmsEstimate(keys.coalesce(1), 1L to 8L)
      .collect().map(_.toSeq).toSeq
    assert(a === b)
  }

  test("judged q100 runs on lineitem with the one-sided guarantee") {
    val rows = CmsSketch.q100CmsFreq(spark, sf("sf0.001")).collect()
    assert(rows.length === 8)
    rows.foreach { r =>
      assert(r.getAs[Long]("exact_cnt") > 0L)
      assert(r.getAs[Long]("cms_est") >= r.getAs[Long]("exact_cnt"))
    }
  }
}
