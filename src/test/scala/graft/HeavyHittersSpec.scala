package graft

import org.apache.spark.sql.functions._
import graft.operators.HeavyHitters

/** Misra-Gries heavy hitters: the superset guarantee under
  * adversarial partitionings (the property that makes the sketch
  * shuffle-safe), judged-output determinism, and the error bound on
  * a planted Zipfian fixture.
  */
class HeavyHittersSpec extends SparkTestBase {
  import spark.implicits._

  // planted Zipf-ish corpus: word i appears ~1000/i times, i in 1..60
  // — a known frequency ladder crossing any n/k threshold mid-range
  private def planted = (1 to 60).flatMap(i =>
    Seq.fill(1000 / i)(s"w$i")).toDF("w")

  test("candidates are a superset of every item above n/(capacity+1), for every partitioning") {
    val n = planted.count()
    val exact = planted.groupBy("w").count().as[(String, Long)]
      .collect().toMap
    for (parts <- Seq(1, 3, 7, 32); cap <- Seq(10, 25, 60)) {
      val (cands, total) =
        HeavyHitters.sketch(planted.repartition(parts), cap)
      assert(total === n)
      val mustHave = exact.filter(_._2 > n / (cap + 1)).keySet
      assert(mustHave.subsetOf(cands.toSet),
        s"cap=$cap parts=$parts lost ${mustHave.diff(cands.toSet)}")
      assert(cands.length <= cap, s"summary exceeded capacity: ${cands.length}")
    }
  }

  test("judged output is exact and partitioning-independent even though candidates are not") {
    spark.catalog.clearCache()
    val k = 8
    val n = planted.count()
    val expect = planted.groupBy("w").count()
      .where(col("count") > n / k)
      .as[(String, Long)].collect().sortBy(r => (-r._2, r._1)).toSeq
    for (parts <- Seq(1, 5, 32)) {
      val words = planted.repartition(parts)
      val (cands, total) = HeavyHitters.sketch(words, capacity = 31)
      val got = words.where(col("w").isin(cands: _*))
        .groupBy("w").agg(count(lit(1)).as("cnt"))
        .where(col("cnt") > total / k)
        .as[(String, Long)].collect().sortBy(r => (-r._2, r._1)).toSeq
      assert(got === expect, s"parts=$parts diverged")
    }
  }

  test("q86 equals the exact full-groupBy formulation on real documents") {
    val words = graft.sources.Tables.documents(spark, sf("sf0.001"))
      .select(explode(graft.functions.TextFunctions.tokens(col("text"))).as("w"))
    val n = words.count()
    val exact = words.groupBy("w").agg(count(lit(1)).as("cnt"))
      .where(col("cnt") > n / 50)
      .orderBy(col("cnt").desc, col("w"))
      .as[(String, Long)].collect().toSeq
    val got = HeavyHitters.q86HeavyHitters(spark, sf("sf0.001"))
      .as[(String, Long)].collect().toSeq
    assert(got.nonEmpty, "fixture corpus should have stopword-band hitters")
    assert(got === exact)
  }
}
