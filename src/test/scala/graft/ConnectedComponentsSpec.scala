package graft

import org.apache.spark.sql.functions._
import graft.operators.Dedup

/** Unit coverage for the component builder itself — the judged d5
  * corpus only ever produces near-clique components (diameter ~1-2),
  * so chain-shaped graphs, multi-component splits, and the
  * non-convergence guard are pinned here.
  */
class ConnectedComponentsSpec extends SparkTestBase {

  private def edges(pairs: (Long, Long)*) = {
    import spark.implicits._
    pairs.toDF("a", "b")
  }

  private def run(df: org.apache.spark.sql.DataFrame, maxIters: Int = 50) =
    Dedup.connectedComponents(df, maxIters)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("chain graph (diameter 5) converges to the chain minimum") {
    // 1-2-3-4-5-6: min label must travel 5 hops
    val got = run(edges((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (5L, 6L)))
    assert(got === (1L to 6L).map(_ -> 1L).toMap)
  }

  test("disjoint components keep separate minima") {
    val got = run(edges((10L, 11L), (11L, 12L), (20L, 21L), (30L, 31L)))
    assert(got === Map(10L -> 10L, 11L -> 10L, 12L -> 10L,
      20L -> 20L, 21L -> 20L, 30L -> 30L, 31L -> 30L))
  }

  test("cycle and cross edges converge (not just trees)") {
    // cycle 1-2-3-1 plus a bridge 3-4
    val got = run(edges((1L, 2L), (2L, 3L), (3L, 1L), (3L, 4L)))
    assert(got === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L))
  }

  test("non-convergence within maxIters fails loudly, not silently wrong") {
    // a 5-hop chain cannot converge in 1 round
    val chain = edges((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (5L, 6L))
    intercept[IllegalStateException] {
      Dedup.connectedComponents(chain, maxIters = 1).collect()
    }
  }

  test("reliable checkpoint path is exact on the chain graph") {
    // same result as the localCheckpoint default; state goes through
    // a reliable checkpoint() each round (the judged d5 path)
    val got = Dedup.connectedComponents(
        edges((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (5L, 6L)),
        reliable = true)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === (1L to 6L).map(_ -> 1L).toMap)
    assert(spark.sparkContext.getCheckpointDir.nonEmpty)
  }

  test("alternating large/small-star agrees with propagation on all shapes") {
    val shapes: Seq[Seq[(Long, Long)]] = Seq(
      Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (5L, 6L)), // chain
      Seq((10L, 11L), (11L, 12L), (20L, 21L), (30L, 31L)),   // forest
      Seq((1L, 2L), (2L, 3L), (3L, 1L), (3L, 4L)),           // cycle+bridge
      { // seeded random multigraph: dups, both orientations, hubs
        val rnd = new scala.util.Random(7)
        Seq.fill(40)((rnd.nextInt(30).toLong + 1, rnd.nextInt(30).toLong + 1))
          .filter(p => p._1 != p._2)
      })
    shapes.foreach { es =>
      val plain = run(edges(es: _*))
      val alt = Dedup.connectedComponentsAlternating(edges(es: _*))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(alt === plain, s"disagreement on edge set $es")
    }
  }

  test("alternating converges on a 64-hop chain in far fewer than diameter rounds") {
    // plain propagation needs 64 rounds here (1 hop per round); the
    // star contraction must land well inside O(log² n)
    val chain = edges((1L to 64L).sliding(2).map(s => (s(0), s(1))).toSeq: _*)
    val got = Dedup.connectedComponentsAlternating(chain, maxIters = 12)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === (1L to 64L).map(_ -> 1L).toMap)
    intercept[IllegalStateException] { // propagation provably can't
      Dedup.connectedComponents(chain, maxIters = 12).collect()
    }
  }

  test("probe cadence k halves driver round-trips and stays exact") {
    val chain = edges((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (5L, 6L))
    // per-round probing: label propagation needs 5 rounds + 1
    // no-change round to detect the fixpoint
    val (l1, s1) = Dedup.connectedComponentsWithStats(chain, probeEvery = 1)
    assert(l1.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap ===
      (1L to 6L).map(_ -> 1L).toMap)
    assert(s1.rounds === 6 && s1.probes === 6)
    // k=2: same labels, half the blocking probes (extra rounds past
    // the fixpoint are harmless — propagation is monotone)
    val (l2, s2) = Dedup.connectedComponentsWithStats(chain, probeEvery = 2)
    assert(l2.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap ===
      (1L to 6L).map(_ -> 1L).toMap)
    assert(s2.rounds === 6 && s2.probes === 3)
  }
}
