package graft.props

import org.scalacheck.{Gen, Prop, Properties, Test}
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import graft.GraftSession
import graft.plans.RangeJoinApi

/** Randomized parity for the custom broadcast range join: against a
  * driver-side brute-force containment check over arbitrary interval
  * sets — heavy overlap, duplicates, empty/NULL intervals, points on
  * every boundary. The sorted-search + running-max-cutoff algorithm
  * has exactly the kind of off-by-one/cutoff edge cases random
  * fixtures find and hand-picked ones miss.
  */
object RangeJoinProps extends Properties("rangejoin") {

  // each check runs a real Spark job on a local session
  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(8)

  private lazy val spark = GraftSession.get("4")

  // small value domain on purpose: forces dense overlap and exact
  // boundary hits (p == lo, p == hi, lo == hi)
  private val bound = Gen.chooseNum(-20L, 20L)
  private val interval: Gen[(Option[Long], Option[Long])] = for {
    lo <- Gen.option(bound)
    width <- Gen.chooseNum(0L, 15L)
    hiDefined <- Gen.oneOf(true, true, true, false)
  } yield (lo, if (hiDefined) Some(lo.getOrElse(0L) + width) else None)
  private val intervals = Gen.listOfN(12, interval)
  private val points = Gen.listOfN(15, Gen.option(bound))

  private def ivDf(iv: Seq[(Option[Long], Option[Long])]) =
    spark.createDataFrame(
      spark.sparkContext.parallelize(iv.zipWithIndex.map { case ((l, h), i) =>
        Row(i.toLong, l.orNull, h.orNull)
      }, numSlices = 2),
      StructType(Seq(
        StructField("iv_id", LongType, nullable = false),
        StructField("lo", LongType, nullable = true),
        StructField("hi", LongType, nullable = true))))

  private def ptDf(ps: Seq[Option[Long]]) =
    spark.createDataFrame(
      spark.sparkContext.parallelize(ps.zipWithIndex.map { case (p, i) =>
        Row(i.toLong, p.orNull)
      }, numSlices = 3),
      StructType(Seq(
        StructField("pt_id", LongType, nullable = false),
        StructField("p", LongType, nullable = true))))

  property("matches brute-force containment on arbitrary interval sets") =
    Prop.forAll(intervals, points) { (iv, ps) =>
      val expected = (for {
        (p, pi) <- ps.zipWithIndex
        pv <- p.toSeq
        ((l, h), ii) <- iv.zipWithIndex
        lv <- l.toSeq; hv <- h.toSeq
        if lv <= pv && pv < hv
      } yield (pi.toLong, ii.toLong)).toSet
      val got = RangeJoinApi
        .pointInRange(ptDf(ps), "p", ivDf(iv), "lo", "hi")
        .select("pt_id", "iv_id")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      Prop(got == expected) :| s"got $got expected $expected"
    }

  private def probeDf(iv: Seq[(Option[Long], Option[Long])]) =
    spark.createDataFrame(
      spark.sparkContext.parallelize(iv.zipWithIndex.map { case ((l, h), i) =>
        Row(i.toLong, l.orNull, h.orNull)
      }, numSlices = 3),
      StructType(Seq(
        StructField("p_id", LongType, nullable = false),
        StructField("p_lo", LongType, nullable = true),
        StructField("p_hi", LongType, nullable = true))))

  property("matches brute-force overlap on arbitrary interval-pair sets") =
    Prop.forAll(intervals, intervals) { (build, probes) =>
      val expected = (for {
        ((pl, ph), pi) <- probes.zipWithIndex
        plv <- pl.toSeq; phv <- ph.toSeq
        ((l, h), ii) <- build.zipWithIndex
        lv <- l.toSeq; hv <- h.toSeq
        // set intersection: the raw two-term range predicate plus
        // BOTH intervals non-empty (an empty [x,x) meets nothing)
        if plv < phv && lv < hv && plv < hv && lv < phv
      } yield (pi.toLong, ii.toLong)).toSet
      val got = RangeJoinApi
        .intervalOverlap(probeDf(probes), "p_lo", "p_hi", ivDf(build), "lo", "hi")
        .select("p_id", "iv_id")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      Prop(got == expected) :| s"got $got expected $expected"
    }
}
