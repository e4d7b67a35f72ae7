package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.expressions.Window
import graft.sources.Tables
import graft.Catalog.Q

/** SEMANTIC DEDUPLICATION (the SemDeDup recipe): cluster the corpus
  * by embedding, then prune near-duplicates WITHIN clusters only —
  * clustering is what keeps the pairwise step from going quadratic
  * in the corpus. Here: a deterministic two-iteration Lloyd k-means
  * (anchors = the K lowest-id vectors; centroid update = elementwise
  * floored mean) followed by a within-cluster cosine near-dup prune
  * that drops every member with a more-canonical (lower-id) close
  * neighbor in its cluster.
  *
  * Exactness discipline: embeddings QUANTIZE to integers
  * (`round(x · 100)`) up front, so every distance, dot product, and
  * threshold test is 64-bit integer arithmetic — bit-identical in
  * Spark and the DuckDB oracle (float reductions would disagree in
  * summation order and flip argmins at boundaries). The cosine
  * threshold tests as `dot > 0 ∧ 100·dot² ≥ θ²·100·|a|²·|b|²` — no
  * sqrt, no division. θ = 0.4 here: the synthetic corpus's max pair
  * cosine is ~0.51 (no planted duplicates), so the judged threshold
  * sits inside the corpus's real similarity band and the prune path
  * is exercised non-vacuously; a production corpus would run the
  * same algebra at θ ≈ 0.9. Magnitudes: |qv|∞ ≤ ~300, dim 64 ⇒
  * dot² ≤ ~10¹⁵, safely inside Long.
  *
  * Scale shape: K centroids broadcast (KB-scale); assignment is one
  * map-side pass per iteration; the centroid update is one shuffle
  * keyed (cluster, dim) with map-side partial sums; the pairwise
  * prune shuffles once on (cluster, shard) and is quadratic only
  * WITHIN a block — bounded UNCONDITIONALLY by [[ClusterCap]], not
  * just by the SemDeDup hope that K scales with the corpus (a
  * one-mode corpus collapses into one cluster; the cap shards it).
  * No driver-side loops: two unrolled iterations are two plan
  * stages, not a collect-and-resubmit.
  */
object SemanticDedup {

  private val K = 8
  private val Quant = 100
  // θ² · 100 for θ = 0.4 — the prune test is
  // 100·dot² ≥ ThetaSqTimes100 · |a|² · |b|² (integer, no sqrt)
  private val ThetaSqTimes100 = 16L
  // Within-cluster pairwise work is quadratic in cluster size. The
  // SemDeDup contract assumes K scales so clusters stay bounded —
  // but nothing guarantees it: a skewed corpus (one dominant mode,
  // common in crawl data) can collapse into one cluster and
  // re-quadratize the prune. Clusters over the cap shard
  // deterministically (pmod of the id) and the prune runs within
  // (cluster, shard): ≤ ~cap² candidates per shard, always. At or
  // under the cap every row lands in shard 0, so the judged result
  // is bit-identical to the uncapped prune on any well-clustered
  // corpus; missed cross-shard pairs in a degenerate cluster are the
  // documented approximation — the same blocking trade d2's bands
  // and e3's hyperplane buckets make.
  private val ClusterCap = 4096L

  private def dotL(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0L), (acc, v) => acc + v)

  private def dist2(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)),
      lit(0L), (acc, v) => acc + v)

  /** Quantized corpus: (vec_id, qv: array<long>). */
  private def quantized(s: SparkSession, d: String): DataFrame =
    Tables.embeddings(s, d).select(col("vec_id"),
      transform(col("embedding"),
        x => round(x.cast(DoubleType) * Quant).cast(LongType)).as("qv"))

  /** One Lloyd assignment pass: nearest centroid by exact integer
    * squared distance, ties to the lowest centroid id.
    */
  private def assign(docs: DataFrame, centroids: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("vec_id"))
      .orderBy(col("d2").asc, col("cid").asc)
    docs.join(broadcast(centroids))
      .select(col("vec_id"), col("qv"), col("cid"),
        dist2(col("qv"), col("cv")).as("d2"))
      .withColumn("rk", row_number().over(w))
      .where(col("rk") === 1)
      .select(col("vec_id"), col("qv"), col("cid").as("cluster"))
  }

  /** Centroid update: elementwise FLOORED mean per surviving cluster
    * (integer again, so the next assignment stays exact). One
    * shuffle keyed (cluster, dim); arrays reassemble by position.
    */
  private def update(assigned: DataFrame): DataFrame =
    assigned
      .select(col("cluster"), posexplode(col("qv")).as(Seq("dim", "v")))
      .groupBy(col("cluster"), col("dim"))
      .agg(floor(sum(col("v")) / count(lit(1))).cast(LongType).as("m"))
      .groupBy(col("cluster"))
      .agg(transform(array_sort(collect_list(struct(col("dim"), col("m")))),
        x => x.getField("m")).as("cv"))
      .select(col("cluster").as("cid"), col("cv"))

  /** Anchors → two Lloyd iterations: the final assignment frame
    * (vec_id, qv, cluster) every surface shares.
    */
  private def finalAssignment(s: SparkSession, d: String): DataFrame = {
    val docs = quantized(s, d)
    val anchors = docs.orderBy(col("vec_id")).limit(K)
      .select(col("vec_id").as("cid"), col("qv").as("cv"))
    assign(docs, update(assign(docs, anchors)))
  }

  /** The size-capped candidate pair set (pre-threshold): members
    * join within (cluster, shard), where clusters over `cap` shard
    * by `pmod(xxhash64(vec_id), ceil(size/cap))`. Cluster sizes are
    * a K-row aggregate — broadcast, never shuffled onto the corpus. Each
    * member's squared norm precomputes ONCE before the self-join —
    * recomputing it per pair would redo an O(dim) fold m times per
    * member. Test-visible so the cap's cost ceiling pins exactly.
    */
  private[graft] def candidatePairs(it2: DataFrame,
      cap: Long): DataFrame = {
    val shards = it2.groupBy(col("cluster"))
      .agg(count(lit(1)).as("n"))
      .select(col("cluster"),
        expr(s"(n + ${cap - 1}) DIV $cap").as("n_shards"))
    // shard on a HASH of the id, not the id itself: crawl ids
    // correlate with residues (every k-th row a re-fetch), and
    // pmod(vec_id, n) would pile a strided cluster into one shard,
    // silently defeating the cap. xxhash64 is deterministic, so the
    // shard assignment still replays bit-identically.
    val withN = it2.join(broadcast(shards), Seq("cluster"))
      .withColumn("shard", pmod(xxhash64(col("vec_id")), col("n_shards")))
      .withColumn("n2", dotL(col("qv"), col("qv")))
    val a = withN.select(col("cluster"), col("shard"),
      col("vec_id").as("a_id"), col("qv").as("a_qv"),
      col("n2").as("a_n2"))
    val b = withN.select(col("cluster"), col("shard"),
      col("vec_id").as("b_id"), col("qv").as("b_qv"),
      col("n2").as("b_n2"))
    a.join(b, Seq("cluster", "shard"))
      .where(col("a_id") < col("b_id"))
      .withColumn("dp", dotL(col("a_qv"), col("b_qv")))
  }

  /** The within-cluster prune: (cluster, b_id) rows for every member
    * with a lower-id near-dup in its (cluster, shard) block.
    */
  private def droppedPairs(it2: DataFrame,
      cap: Long = ClusterCap): DataFrame =
    candidatePairs(it2, cap)
      .where(col("dp") > 0 &&
        col("dp") * col("dp") * 100 >=
          col("a_n2") * col("b_n2") * ThetaSqTimes100)
      .select(col("cluster"), col("b_id")).distinct()

  /** Test hook: the centroid set after one Lloyd update — the
    * inertia-monotonicity pin measures against it.
    */
  private[graft] def centroidsAfterOneIteration(
      s: SparkSession, d: String): DataFrame = {
    val docs = quantized(s, d)
    val anchors = docs.orderBy(col("vec_id")).limit(K)
      .select(col("vec_id").as("cid"), col("qv").as("cv"))
    update(assign(docs, anchors))
  }

  /** Test hook: the final assignment frame plus the dropped-id set —
    * the keep-rule pin recomputes the rule locally against these.
    */
  private[graft] def assignmentAndDrops(
      s: SparkSession, d: String): (DataFrame, Set[Long]) = {
    val it2 = finalAssignment(s, d)
    (it2, droppedPairs(it2).select(col("b_id")).distinct()
      .collect().map(_.getLong(0)).toSet)
  }

  /** Judged SemDeDup: two exact Lloyd iterations from lowest-id
    * anchors, then the within-cluster θ=0.4 cosine prune (drop every
    * member with a lower-id near-dup in its cluster). Per-cluster
    * certificate: member/dropped/kept counts and the kept-id
    * checksum — any drift in clustering, the threshold algebra, or
    * the keep rule flips a row.
    */
  def d11SemanticDedup(s: SparkSession, d: String): DataFrame = {
    val it2 = finalAssignment(s, d)
    // GUARD the judged path: the operator API shards clusters over
    // ClusterCap by pmod(xxhash64(id), …) — a bound the DuckDB oracle
    // cannot replicate (no xxhash64). If a judged corpus ever grows a
    // cluster past the cap, fail HERE, loudly, instead of letting the
    // capped prune silently diverge from the oracle's uncapped join.
    // coalesce: max over zero groups is NULL (empty corpus), and the
    // guard must degrade to "within cap", not NPE. (This aggregate
    // re-executes the assignment pipeline once — the same cost shape
    // as the two consumers below, which also each recompute it2.)
    val maxCluster = it2.groupBy(col("cluster"))
      .agg(count(lit(1)).as("n"))
      .agg(coalesce(max(col("n")), lit(0L))).head.getLong(0)
    require(maxCluster <= ClusterCap,
      s"d11 judged fixture grew a cluster of $maxCluster members " +
        s"(> ClusterCap=$ClusterCap): the capped shard prune would " +
        "diverge from the uncapped DuckDB oracle — re-fixture or " +
        "raise the cap for the judged query")
    val dropped = droppedPairs(it2)
    val drops = dropped.groupBy(col("cluster"))
      .agg(count(lit(1)).as("n_dropped"),
        sum(col("b_id")).as("dropped_id_sum"))
    it2.groupBy(col("cluster"))
      .agg(count(lit(1)).as("n_members"),
        sum(col("vec_id")).as("member_id_sum"))
      .join(drops, Seq("cluster"), "left")
      .select(col("cluster"),
        col("n_members"),
        coalesce(col("n_dropped"), lit(0L)).as("n_dropped"),
        (col("n_members") - coalesce(col("n_dropped"), lit(0L)))
          .as("n_kept"),
        (col("member_id_sum") - coalesce(col("dropped_id_sum"), lit(0L)))
          .as("kept_id_sum"))
      .orderBy(col("cluster"))
  }

  val queries: Seq[Q] = Seq(
    Q("d11_semantic_dedup", d11SemanticDedup, Some("""
      WITH q AS (
        SELECT vec_id,
               list_transform(embedding,
                 x -> CAST(round(x * 100) AS BIGINT)) AS qv
        FROM embeddings
      ),
      anch AS (
        SELECT vec_id AS cid, qv AS cv FROM q ORDER BY vec_id LIMIT 8
      ),
      it1 AS (
        SELECT vec_id, qv, cid AS cluster FROM (
          SELECT q.vec_id, q.qv, a.cid,
                 row_number() OVER (PARTITION BY q.vec_id ORDER BY
                   CAST(list_sum(list_transform(list_zip(q.qv, a.cv),
                     p -> (p[1] - p[2]) * (p[1] - p[2])))
                     AS BIGINT) ASC, a.cid ASC) AS rk
          FROM q CROSS JOIN anch a) t
        WHERE rk = 1
      ),
      cent2 AS (
        SELECT cluster AS cid,
               list(CAST(floor(s * 1.0 / n) AS BIGINT) ORDER BY dim) AS cv
        FROM (
          SELECT cluster, dim, sum(v) AS s, count(*) AS n
          FROM (SELECT cluster, generate_subscripts(qv, 1) AS dim,
                       unnest(qv) AS v FROM it1) e
          GROUP BY cluster, dim) m
        GROUP BY cluster
      ),
      it2 AS (
        SELECT vec_id, qv, cid AS cluster FROM (
          SELECT q.vec_id, q.qv, c.cid,
                 row_number() OVER (PARTITION BY q.vec_id ORDER BY
                   CAST(list_sum(list_transform(list_zip(q.qv, c.cv),
                     p -> (p[1] - p[2]) * (p[1] - p[2])))
                     AS BIGINT) ASC, c.cid ASC) AS rk
          FROM q CROSS JOIN cent2 c) t
        WHERE rk = 1
      ),
      dup AS (
        SELECT DISTINCT x.cluster, y.vec_id AS b_id
        FROM it2 x JOIN it2 y
          ON x.cluster = y.cluster AND x.vec_id < y.vec_id
        WHERE CAST(list_sum(list_transform(list_zip(x.qv, y.qv),
                p -> p[1] * p[2])) AS BIGINT) > 0
          AND CAST(list_sum(list_transform(list_zip(x.qv, y.qv),
                p -> p[1] * p[2])) AS BIGINT)
              * CAST(list_sum(list_transform(list_zip(x.qv, y.qv),
                p -> p[1] * p[2])) AS BIGINT) * 100
            >= CAST(list_sum(list_transform(list_zip(x.qv, x.qv),
                p -> p[1] * p[2])) AS BIGINT)
              * CAST(list_sum(list_transform(list_zip(y.qv, y.qv),
                p -> p[1] * p[2])) AS BIGINT) * 16
      ),
      drops AS (
        SELECT cluster, count(*) AS n_dropped,
               sum(b_id) AS dropped_id_sum
        FROM dup GROUP BY cluster
      )
      SELECT m.cluster,
             m.n_members,
             COALESCE(d.n_dropped, 0) AS n_dropped,
             m.n_members - COALESCE(d.n_dropped, 0) AS n_kept,
             CAST(m.member_id_sum - COALESCE(d.dropped_id_sum, 0)
               AS BIGINT) AS kept_id_sum
      FROM (SELECT cluster, count(*) AS n_members,
                   sum(vec_id) AS member_id_sum
            FROM it2 GROUP BY cluster) m
      LEFT JOIN drops d ON m.cluster = d.cluster
      ORDER BY m.cluster""")))
}
