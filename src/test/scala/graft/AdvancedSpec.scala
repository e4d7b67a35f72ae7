package graft

import org.apache.spark.sql.functions._
import graft.operators.{Advanced, Aggregates, AsOfJoin}

class AdvancedSpec extends SparkTestBase {

  test("q93 HLL algebra: merged estimate obeys the bound, row is deterministic") {
    val rows = (1 to 3).map { _ =>
      Aggregates.q93HllAlgebra(spark, sf("sf0.001")).head()
    }
    // the sketch is an order-insensitive function of the value set:
    // repeated runs (different task interleavings) give the same row
    assert(rows.distinct.length === 1, rows.toString)
    val r = rows.head
    assert(r.getBoolean(1) && r.getBoolean(2),
      s"estimate outside 5%: exact=${r.getLong(0)}")
    // RAW estimates (out of the judged certificate): the union really
    // merged all nations — the merged estimate sees the whole domain
    val c = graft.sources.Tables.customer(spark, sf("sf0.001"))
      .select(col("c_custkey"), col("c_nationkey"))
    val merged = c.groupBy(col("c_nationkey"))
      .agg(hll_sketch_agg(col("c_custkey"), lit(12)).as("sk"))
      .agg(hll_sketch_estimate(hll_union_agg(col("sk"), lit(false))))
      .head().getLong(0)
    val exact = c.agg(countDistinct(col("c_custkey"))).head().getLong(0)
    assert(merged > exact / 2, s"merged=$merged vs exact=$exact")
  }

  test("approx_count_distinct stays within 15% of exact") {
    // the judged q22 certificate computes both sides; this re-derives
    // the RAW sketch values and checks the bound the boolean encodes
    val exact = graft.sources.Tables.lineitem(spark, sf("sf0.001"))
      .groupBy(col("l_returnflag"))
      .agg(countDistinct(col("l_partkey")).as("exact_parts"))
      .collect().map(r => r.getString(0) -> r.getLong(1).toDouble).toMap
    graft.sources.Tables.lineitem(spark, sf("sf0.001"))
      .groupBy(col("l_returnflag"))
      .agg(approx_count_distinct(col("l_partkey")).as("approx"))
      .collect().foreach { r =>
        val approx = r.getLong(1).toDouble
        val e = exact(r.getString(0))
        assert(math.abs(approx - e) / e < 0.15,
          s"flag=${r.getString(0)} approx=$approx exact=$e")
      }
    // and the judged certificate's verdicts are green
    Advanced.q22ApproxDistinct(spark, sf("sf0.001")).collect().foreach(r =>
      assert(r.getBoolean(2), s"flag=${r.getString(0)} bound violated"))
  }

  test("approx quantiles stay within 1% rank error of exact percentiles") {
    import graft.sources.Tables
    val ps = operators.Aggregates.QuantilePs
    // value-level check against the RAW sketch (the judged query now
    // emits the bound verdict, so the spec re-derives the values):
    // the sketch's p-quantile must sit between the exact (p±1%)
    // quantiles — the actual G-K guarantee; tighter value-error
    // assertions would be distribution-dependent
    val approx = Tables.lineitem(spark, sf("sf0.001"))
      .groupBy(col("l_returnflag"))
      .agg(percentile_approx(col("l_extendedprice"),
        typedLit(ps), lit(10000)).as("pq"))
      .collect().map(r => r.getString(0) -> r.getSeq[Double](1)).toMap
    val bounds = Tables.lineitem(spark, sf("sf0.001"))
      .groupBy(col("l_returnflag"))
      .agg(expr("percentile(l_extendedprice, array(0.24, 0.49, 0.74, 0.94))").as("lo"),
        expr("percentile(l_extendedprice, array(0.26, 0.51, 0.76, 0.96))").as("hi"))
      .collect().map(r => r.getString(0) -> (r.getSeq[Double](1), r.getSeq[Double](2))).toMap
    bounds.foreach { case (flag, (lo, hi)) =>
      ps.indices.foreach { i =>
        val a = approx(flag)(i)
        assert(a >= lo(i) && a <= hi(i),
          s"$flag q${ps(i)}: $a outside [${lo(i)}, ${hi(i)}]")
      }
    }
    // and the judged wrapper reports exactly that verdict per row
    val judged = operators.Aggregates.q32ApproxQuantiles(spark, sf("sf0.001"))
      .collect()
    assert(judged.length === bounds.size * ps.length)
    judged.foreach { r =>
      assert(r.getBoolean(3),
        s"${r.getString(0)} q${r.getDouble(1)}: in_bounds=false")
    }
  }

  test("as-of join picks latest at-or-before match, inclusive, left-outer") {
    import spark.implicits._
    val left = Seq((1L, 5L), (1L, 10L), (1L, 15L), (2L, 100L), (3L, 7L))
      .toDF("k", "t")
    val right = Seq((1L, 10L, "a"), (1L, 12L, "b"), (2L, 50L, "c"))
      .toDF("rk", "rt", "v")
    val out = AsOfJoin.asOf(left, right, "k", "rk", "t", "rt")
      .select(col("k"), col("t"), col("asof.v").as("v"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> Option(r.getString(2)))
      .toMap
    assert(out((1L, 5L)) === None)          // before any right row
    assert(out((1L, 10L)) === Some("a"))    // inclusive at equal time
    assert(out((1L, 15L)) === Some("b"))    // latest of two matches
    assert(out((2L, 100L)) === Some("c"))
    assert(out((3L, 7L)) === None)          // key with no right rows
  }

  test("as-of join plan shuffles once on the key (no range-join blowup)") {
    import spark.implicits._
    val left = Seq((1L, 5L)).toDF("k", "t")
    val right = Seq((1L, 3L, "x")).toDF("rk", "rt", "v")
    val plan = AsOfJoin.asOf(left, right, "k", "rk", "t", "rt")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), s"as-of must not plan a join:\n$plan")
    assert(plan.contains("Window"), s"expected window scan:\n$plan")
  }

  test("q50's top-k aggregates partially map-side, with no window sort") {
    val q = Advanced.q50TopkPerGroup(spark, sf("sf0.001"))
    val plan = q.queryExecution.executedPlan.toString
    // the Aggregator must plan as a two-phase aggregate: a partial
    // pass before the group-key exchange (each map task ships ≤ k
    // rows per group) and a final merge after it — the whole point
    // vs the window-rank formulation, which would sort everything
    assert(plan.contains("partial_topkbyqty"),
      s"no map-side partial top-k:\n$plan")
    assert(plan.contains("topkbyqty"), s"aggregator missing:\n$plan")
    assert(!plan.contains("Window"), s"q50 must not plan a window sort:\n$plan")
    // exactly k rows per group, rank sequence intact
    val rows = q.collect()
    assert(rows.map(_.getString(0)).distinct.length === 3)
    assert(rows.groupBy(_.getString(0)).forall(_._2.map(_.getInt(1)).toSeq
      == Seq(1, 2, 3)))
  }
}
