package graft

import org.apache.spark.sql.functions._
import graft.operators.SemanticDedup

/** SemDeDup (d11): exact-integer two-iteration k-means + within-
  * cluster cosine prune — clustering quality (inertia never rises
  * across the Lloyd iterations, every doc assigned exactly once),
  * the keep rule (every dropped doc has a lower-id in-cluster
  * near-dup; no kept doc does), and determinism across runs.
  */
class SemanticDedupSpec extends SparkTestBase {
  import spark.implicits._

  private val d = "/root/testdata/sf0.001"

  test("every vector is assigned exactly once and the certificate is " +
      "internally consistent") {
    val out = SemanticDedup.d11SemanticDedup(spark, d).collect()
    val n = graft.sources.Tables.embeddings(spark, d).count()
    assert(out.map(_.getLong(1)).sum === n) // members cover the corpus
    out.foreach { r =>
      assert(r.getLong(3) === r.getLong(1) - r.getLong(2)) // kept = m - d
      assert(r.getLong(2) >= 0 && r.getLong(3) >= 1)
    }
    // the prune path is exercised (non-vacuous certificate)
    assert(out.map(_.getLong(2)).sum > 0)
  }

  test("two-iteration Lloyd: inertia is non-increasing and " +
      "assignments are deterministic across runs") {
    // run twice: byte-identical output (no float nondeterminism,
    // ordering pinned)
    val a = SemanticDedup.d11SemanticDedup(spark, d).collect().toSeq
    val b = SemanticDedup.d11SemanticDedup(spark, d).collect().toSeq
    assert(a === b)
    // inertia via the public pieces: recompute both iterations'
    // total within-cluster squared distance on the quantized corpus
    val e = graft.sources.Tables.embeddings(spark, d).select(
      col("vec_id"),
      transform(col("embedding"),
        x => round(x.cast("double") * 100).cast("long")).as("qv"))
    def inertiaOf(assignTo: org.apache.spark.sql.DataFrame): Long = {
      // assignTo: (cid, cv); charge each doc its min distance
      val d2 = org.apache.spark.sql.functions.aggregate(
        zip_with(col("qv"), col("cv"), (x, y) => (x - y) * (x - y)),
        lit(0L), (acc, v) => acc + v)
      e.join(broadcast(assignTo))
        .select(col("vec_id"), d2.as("d2"))
        .groupBy(col("vec_id")).agg(min(col("d2")).as("m"))
        .agg(sum(col("m"))).head.getLong(0)
    }
    val anchors = e.orderBy(col("vec_id")).limit(8)
      .select(col("vec_id").as("cid"), col("qv").as("cv"))
    val c2 = SemanticDedup.centroidsAfterOneIteration(spark, d)
    assert(inertiaOf(c2) <= inertiaOf(anchors),
      "Lloyd update increased inertia")
  }

  test("keep rule: dropped docs have a lower-id in-cluster near-dup; " +
      "kept docs have none") {
    val (assigned, droppedIds) = SemanticDedup.assignmentAndDrops(spark, d)
    val rows = assigned.select("cluster", "vec_id", "qv")
      .as[(Long, Long, Seq[Long])].collect()
    def dot(a: Seq[Long], b: Seq[Long]): Long =
      a.zip(b).map { case (x, y) => x * y }.sum
    def near(a: Seq[Long], b: Seq[Long]): Boolean = {
      val dp = dot(a, b)
      dp > 0 && dp * dp * 100 >= dot(a, a) * dot(b, b) * 16
    }
    val byCluster = rows.groupBy(_._1)
    val expectDropped = byCluster.values.flatMap { ms =>
      ms.filter(m => ms.exists(o => o._2 < m._2 && near(o._3, m._3)))
        .map(_._2)
    }.toSet
    assert(droppedIds === expectDropped)
    assert(expectDropped.nonEmpty)
  }

  test("cluster-size cap: an adversarial one-cluster corpus shards " +
      "to a pinned candidate-pair ceiling; a within-cap corpus is " +
      "bit-identical to the uncapped prune") {
    // 40 near-identical vectors — the degenerate crawl shape: every
    // row lands in ONE cluster, and the uncapped prune would run all
    // C(40,2) = 780 pairs
    val one = (0L until 40L)
      .map(i => (0L, i, Seq(100L + (i % 3), 100L, 100L)))
      .toDF("cluster", "vec_id", "qv")
    val uncapped = SemanticDedup.candidatePairs(one, cap = 4096L)
    assert(uncapped.count() === 780L)
    // cap 10 ⇒ ceil(40/10) = 4 shards by pmod(xxhash64(id), 4) — a
    // HASH, deliberately: ids 0,2,4,… (a strided re-fetch pattern)
    // under pmod(id, 2) would all share one shard and re-quadratize.
    // The exact ceiling is Σ C(size_s, 2) over the hash's shard
    // sizes, recomputed here with the same function
    val sizes = one.select(
      pmod(xxhash64(col("vec_id")), lit(4L)).as("s"))
      .groupBy(col("s")).count().collect().map(_.getLong(1))
    val expected = sizes.map(n => n * (n - 1) / 2).sum
    val capped = SemanticDedup.candidatePairs(one, cap = 10L)
    assert(capped.count() === expected)
    assert(expected < 780L) // the cap really cut the pair space
    // every candidate respects its shard: both sides agree on
    // pmod(xxhash64(id), 4)
    assert(capped.where(
      pmod(xxhash64(col("a_id")), lit(4L)) =!=
        pmod(xxhash64(col("b_id")), lit(4L)))
      .count() === 0L)
    // the strided adversary itself: 40 EVEN ids, cap 20 ⇒ 2 shards —
    // id-residue sharding would put all 780 pairs in shard 0
    val strided = (0L until 80L by 2)
      .map(i => (0L, i, Seq(100L, 100L, 100L)))
      .toDF("cluster", "vec_id", "qv")
    val ssizes = strided.select(
      pmod(xxhash64(col("vec_id")), lit(2L)).as("s"))
      .groupBy(col("s")).count().collect().map(_.getLong(1))
    assert(ssizes.length === 2 && ssizes.forall(_ < 40L),
      s"hash sharding left a strided cluster unsplit: ${ssizes.toSeq}")
    assert(SemanticDedup.candidatePairs(strided, cap = 20L).count() ===
      ssizes.map(n => n * (n - 1) / 2).sum)
    // a corpus whose clusters all fit the cap is untouched by it:
    // same pair set either way
    val multi = (0L until 60L)
      .map(i => (i % 6, i, Seq(10L * (i % 6), 7L, 3L)))
      .toDF("cluster", "vec_id", "qv")
    val a = SemanticDedup.candidatePairs(multi, cap = 4096L)
      .select("cluster", "a_id", "b_id").collect().map(_.toSeq).toSet
    val b = SemanticDedup.candidatePairs(multi, cap = 10L)
      .select("cluster", "a_id", "b_id").collect().map(_.toSeq).toSet
    assert(a === b)
    assert(a.size === 6 * 45) // 6 clusters of 10 ⇒ C(10,2) each
  }
}
