package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Encoder, SparkSession}
import org.apache.spark.sql.expressions.{Aggregator, Window}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.sources.Tables
import graft.Catalog.Q

/** Input/buffer element for [[TopKByDist]]: a candidate vector and
  * its distance (smaller = better; pass a negated similarity for
  * descending-similarity rankings).
  */
final case class ScoredVec(vec_id: Long, dist: Double)

/** Bounded per-group top-k by (dist asc, vec_id asc) — the ANN
  * rerank shape of q50's [[TopKByQty]]: the buffer never exceeds k
  * elements, so ranking N·Q scored candidates costs a map-side
  * partial aggregate (each task keeps k per query) plus a k-sized
  * merge per query, instead of shuffling every scored row into a
  * per-query window sort. At 100 TB the window plan moves the whole
  * scored corpus; this moves Q·k rows.
  */
final class TopKByDist(k: Int)
    extends Aggregator[ScoredVec, Seq[ScoredVec], Seq[ScoredVec]] {
  private val ord: Ordering[ScoredVec] =
    Ordering.by((r: ScoredVec) => (r.dist, r.vec_id))
  override def zero: Seq[ScoredVec] = Vector.empty
  override def reduce(b: Seq[ScoredVec], a: ScoredVec): Seq[ScoredVec] =
    if (b.lengthCompare(k) >= 0 && ord.lteq(b.last, a)) b
    else ((b :+ a).sorted(ord)).take(k)
  override def merge(x: Seq[ScoredVec], y: Seq[ScoredVec]): Seq[ScoredVec] =
    (x ++ y).sorted(ord).take(k)
  override def finish(b: Seq[ScoredVec]): Seq[ScoredVec] = b
  override def bufferEncoder: Encoder[Seq[ScoredVec]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
  override def outputEncoder: Encoder[Seq[ScoredVec]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
}

/** Similarity search over the `embeddings` table (64-dim float
  * vectors).
  *
  * - e1: brute-force cosine top-k — the exact baseline. Query set is
  *   broadcast, so the scan side never shuffles: at 100 TB this is
  *   one pass over the corpus with a per-partition top-k
  *   (window + filter collapses to partial ranking under the
  *   broadcast join).
  * - e2: random-hyperplane LSH (8 tables × 6 bits) — the scale path.
  *   Signatures are literal-matrix dot products computed inline per
  *   row; the candidate join is an equi-join on (table, signature),
  *   so the quadratic step shrinks to same-bucket collisions only.
  * - e3: embedding-cosine near-dup pairs with label blocking, the
  *   dedup-by-embedding operator, oracle-checked.
  *
  * All dot products fold left in index order over doubles —
  * bit-identical to DuckDB's list_sum over the same zip (proven by
  * the e1/e3 oracle hash-match on raw doubles).
  */
object Similarity {

  /** Left-fold dot product of a float-vector column with another. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast(DoubleType) * y.cast(DoubleType)),
      lit(0.0), (acc, v) => acc + v)

  def norm(a: Column): Column =
    sqrt(aggregate(transform(a, x => x.cast(DoubleType) * x.cast(DoubleType)),
      lit(0.0), (acc, v) => acc + v))

  /** Composable HOF baseline — three array traversals via built-in
    * higher-order functions; bit-identical to [[cosineNative]].
    */
  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Fused single-pass native expression (graft.plans.CosineSimilarity,
    * whole-stage codegen). Used on the hot pairwise paths; certified
    * against the DuckDB oracle through e3.
    */
  def cosineNative(a: Column, b: Column): Column =
    org.apache.spark.sql.graft.Bridge.column(
      graft.plans.CosineSimilarity(
        org.apache.spark.sql.graft.Bridge.expression(a),
        org.apache.spark.sql.graft.Bridge.expression(b)))

  private val NumQueries = 8
  private val TopK = 10

  /** Exact brute-force cosine top-k for a broadcast query set. */
  def e1AnnBruteForce(s: SparkSession, d: String): DataFrame = {
    val e = Tables.embeddings(s, d)
    val q = e.where(col("vec_id") < NumQueries)
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("vec_id").asc)
    e.join(broadcast(q), col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"),
        cosine(col("qv"), col("embedding")).as("cos"))
      .withColumn("rk", row_number().over(w))
      .where(col("rk") <= TopK)
      .select(col("query_id"), col("rk"), col("vec_id"), col("cos"))
      .orderBy(col("query_id"), col("rk"))
  }

  /** e8: FILTERED exact search — top-k under a metadata predicate
    * (same-label candidates only), the retrieval contract behind
    * "search within this tenant / license / language shard". The
    * predicate applies at CANDIDATE GENERATION (the join condition),
    * never after ranking: post-filtering a plain top-k returns
    * FEWER than k rows whenever the unfiltered neighborhood is
    * label-mixed — the classic filtered-ANN correctness trap. Plan
    * shape: label equality narrows the broadcast-join fan-out to the
    * query's shard, scores reduce through the bounded [[TopKByDist]]
    * map-side (no window over the scored corpus), so at 100 TB the
    * cost is one corpus pass and a Q·k-row shuffle — and the label
    * predicate composes with partition pruning when the corpus is
    * label-partitioned (q44's layout).
    */
  def e8AnnFiltered(s: SparkSession, d: String): DataFrame = {
    val e = Tables.embeddings(s, d)
    val q = e.where(col("vec_id") < NumQueries)
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"),
        col("label").as("qlabel"))
    val topCos = udaf(new TopKByDist(TopK))
    e.join(broadcast(q),
        col("label") === col("qlabel") && col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"),
        cosineNative(col("qv"), col("embedding")).as("cos"))
      .groupBy(col("query_id"))
      .agg(topCos(col("vec_id"), -col("cos")).as("top"))
      .select(col("query_id"), posexplode(col("top")))
      .select(col("query_id"), (col("pos") + 1).cast(IntegerType).as("rk"),
        col("col.vec_id").as("vec_id"), (-col("col.dist")).as("cos"))
      .orderBy(col("query_id"), col("rk"))
  }

  // -- LSH ANN ---------------------------------------------------------

  // 8 tables × 6 bits: 64 buckets/table, so each query scans ~1/64 of
  // the corpus per table (~12% total) — measured recall@10 ≈ 40-60% on
  // the fixture, the intended accuracy/cost point for a first-stage
  // retriever. Raising bits cuts cost and recall together (8 bits
  // measured at 7.5% recall on 2k vectors — too coarse a candidate set).
  //
  // Scale claim, scoped honestly: the bits rule below holds CANDIDATE
  // COST constant as N grows (expected bucket stays ~TargetBucket),
  // but per-table collision probability for a fixed cosine falls as
  // p^bits, so recall at a FIXED table count degrades with corpus
  // size — at the 2B-vector example (26 bits), holding recall at 0.9
  // for cos 0.5 needs ~LshParams.hyperplaneTables(26, 0.5, 0.9) ≈
  // tens of thousands of tables, which is not a deployable knob.
  // Hyperplane LSH is therefore the CHEAP first-stage retriever whose
  // recall target must be re-validated per deployment
  // (LshParams.hyperplaneRecall is the calculator); when the recall
  // bar survives scale-up, the answer is e5's IVF (probe lists scale
  // with sqrt(N), recall holds) — that trade-off is why both judged
  // queries exist.
  private val NumTables = 8
  private val TargetBucket = 32L
  private val Dim = 64

  /** Corpus size, counted ONCE per dataset dir and cached — the N
    * every sizing rule below re-derives from. Previously a hardcoded
    * FixtureN=2000 leaked into e2's bucket-width derivation and e5's
    * seed stride regardless of the dataset actually passed at
    * runtime, so at any other SF the "derived, never copied" rules
    * silently used the wrong N. One count() per dir is the price of
    * making them true; a production deployment reads this from table
    * metadata instead.
    *
    * Contract notes (Catalog.scala documents the general rule): this
    * makes BUILDING the e2/e5 plan run one scalar Spark job, and the
    * per-dir cache assumes the data under a dir is immutable for the
    * JVM lifetime — true for the committed test datasets; a
    * deployment that rewrites a dir in place must key the cache by
    * snapshot/version instead.
    */
  private val nCache = scala.collection.concurrent.TrieMap.empty[String, Long]
  private[graft] def corpusN(s: SparkSession, d: String): Long =
    nCache.getOrElseUpdate(d, Tables.embeddings(s, d).count())

  /** Bits per table at corpus size n: the bucket-width rule
    * ⌈log₂(n/32)⌉ (LshParamsSpec pins it) — 6 at the 2k fixture, 26
    * at 2B vectors.
    */
  private[graft] def e2BitsFor(n: Long): Int =
    LshParams.hyperplaneBits(math.max(n, TargetBucket), TargetBucket)

  /** Deterministic pseudo-Gaussian hyperplanes (seeded sum-of-12
    * uniforms), derived per bit-width and cached — the equivalent of
    * a persisted model artifact, regenerated when the sizing rule
    * picks a different width for a different corpus size.
    */
  private val planeCache =
    scala.collection.concurrent.TrieMap.empty[Int, IndexedSeq[IndexedSeq[Array[Double]]]]
  private def hyperplanesFor(bits: Int): IndexedSeq[IndexedSeq[Array[Double]]] =
    planeCache.getOrElseUpdate(bits, {
      val rnd = new scala.util.Random(42)
      def gaussian(): Double = (1 to 12).map(_ => rnd.nextDouble()).sum - 6.0
      IndexedSeq.fill(NumTables)(
        IndexedSeq.fill(bits)(Array.fill(Dim)(gaussian())))
    })

  /** All `tables` signatures in one fused native pass
    * (graft.plans.HyperplaneSigs, whole-stage codegen) — the HOF
    * formulation it replaces did 48 interpreted lambda-bound dot
    * products per row and was the last interpreted hot kernel in
    * the repo. Bit-identical arithmetic (float→double cast,
    * index-order accumulate), so signatures are unchanged.
    */
  private def hyperplaneSigsCol(
      vec: Column, planes: IndexedSeq[IndexedSeq[Array[Double]]]): Column =
    org.apache.spark.sql.graft.Bridge.column(
      graft.plans.HyperplaneSigs(
        org.apache.spark.sql.graft.Bridge.expression(vec),
        planes.flatten.flatten.toIndexedSeq,
        planes.length, planes.head.length, Dim))

  /** LSH-bucketed approximate cosine top-k: union the query's
    * same-bucket candidates across tables, dedup, rank exactly.
    */
  def e2AnnLsh(s: SparkSession, d: String): DataFrame = {
    val e = Tables.embeddings(s, d)
    val hyperplanes = hyperplanesFor(e2BitsFor(corpusN(s, d)))
    // all 8 table signatures in one scan + posexplode — a union of 8
    // branches would re-scan (and re-dot) the corpus per table
    val sigs = e.select(col("vec_id"), col("embedding"),
        posexplode(hyperplaneSigsCol(col("embedding"), hyperplanes))
          .as(Seq("tbl", "sig")))
    val qsigs = sigs.where(col("vec_id") < NumQueries)
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"),
        col("tbl"), col("sig"))
    val cand = sigs.join(broadcast(qsigs), Seq("tbl", "sig"))
      .where(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("qv"), col("vec_id"), col("embedding"))
      .dropDuplicates("query_id", "vec_id")
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("vec_id").asc)
    cand
      .select(col("query_id"), col("vec_id"),
        cosineNative(col("qv"), col("embedding")).as("cos"))
      .withColumn("rk", row_number().over(w))
      .where(col("rk") <= TopK)
      .select(col("query_id"), col("rk"), col("vec_id"), col("cos"))
      .orderBy(col("query_id"), col("rk"))
  }

  /** Embedding-cosine near-duplicates: label-blocked pairwise cosine
    * above threshold (0.35 sits just above this corpus's same-label
    * tail, so the result is small but non-vacuous).
    */
  def e3EmbeddingNearDup(s: SparkSession, d: String): DataFrame = {
    val e = Tables.embeddings(s, d)
      .select(col("vec_id"), col("label"), col("embedding"))
    e.as("x").join(e.as("y"),
        col("x.label") === col("y.label") &&
          col("x.vec_id") < col("y.vec_id"))
      .select(col("x.vec_id").as("vec_a"), col("y.vec_id").as("vec_b"),
        cosineNative(col("x.embedding"), col("y.embedding")).as("cos"))
      .where(col("cos") >= 0.35)
      .orderBy(col("vec_a"), col("vec_b"))
  }

  // -- LSH-blocked near-dup (the scale path for e3) --------------------

  /** Amplification for the near-dup blocker: 32 tables × 4 bits.
    * Hyperplane LSH catches a pair of cosine s in one table with
    * p(s)^bits where p(s) = 1 − arccos(s)/π; at this corpus's low
    * emitted threshold (0.35 — the same-label cosine ceiling here
    * is ~0.5) that is 0.614⁴ ≈ 0.14 per table, so 32 tables give
    * per-pair recall ≈ 1−0.86³² ≈ 0.993 (PipelineOpsSpec proves
    * e4 ⊇ e3 on the fixture). At production near-dup thresholds
    * (cosine ≥ 0.9, p ≈ 0.86/bit) the same 0.99 recall takes 28
    * tables of 12 bits (LshParams.hyperplaneTables — LshParamsSpec
    * pins it), but each bucket is 2¹² vs 2⁴ selective, so expected
    * candidate work per vector falls ~300× — bits per table should
    * be sized as ~log₂(N / target bucket width) at the deployed N.
    */
  // 32 ≥ the 31 the calculator demands for recall 0.99 at τ=0.35
  // with 4-bit tables (LshParams.hyperplaneTables — LshParamsSpec
  // asserts the margin, and that measured amplification recall
  // 1−0.86³² ≈ 0.993 clears the target)
  private val NdTables = 32
  private val NdBits = 4
  private[graft] val NdTau = 0.35
  private[graft] def ndTablesRequired: Int =
    LshParams.hyperplaneTables(NdBits, NdTau, 0.99)
  private[graft] def ndConfig: (Int, Int) = (NdTables, NdBits)
  private[graft] def e2Config(n: Long): (Int, Int) = (NumTables, e2BitsFor(n))

  private val ndPlanes: IndexedSeq[IndexedSeq[Array[Double]]] = {
    val rnd = new scala.util.Random(7)
    def gaussian(): Double = (1 to 12).map(_ => rnd.nextDouble()).sum - 6.0
    IndexedSeq.fill(NdTables)(
      IndexedSeq.fill(NdBits)(Array.fill(Dim)(gaussian())))
  }

  /** e3's scale path: hyperplane-bucket blocking instead of label
    * blocking, exact cosine verify on candidates. e3's label-blocked
    * all-pairs is O(N²/labels) — fine as the oracle twin, quadratic
    * at corpus scale; here the only pairwise work is within
    * (table, signature) buckets, and the verify (one fused cosine
    * per candidate) runs BEFORE the distinct so false candidates
    * die row-locally without shuffling.
    */
  def e4NearDupLsh(s: SparkSession, d: String): DataFrame = {
    val e = Tables.embeddings(s, d)
    val sigs = e.select(col("vec_id"), col("embedding"),
        posexplode(hyperplaneSigsCol(col("embedding"), ndPlanes))
          .as(Seq("tbl", "sig")))
    sigs.as("x").join(sigs.as("y"),
        col("x.tbl") === col("y.tbl") && col("x.sig") === col("y.sig") &&
          col("x.vec_id") < col("y.vec_id"))
      .select(col("x.vec_id").as("vec_a"), col("y.vec_id").as("vec_b"),
        cosineNative(col("x.embedding"), col("y.embedding")).as("cos"))
      .where(col("cos") >= NdTau)
      .distinct()
      .orderBy(col("vec_a"), col("vec_b"))
  }

  // -- IVF ANN (coarse-quantizer variant of the scale path) ------------

  /** IVF parameters: K coarse cells, probe the nprobe nearest cells
    * per query. Sizing: K ≈ √N keeps cells ≈ √N wide, so a probe
    * scans nprobe·N/K vectors (~3% of the corpus here) — at the
    * deployed N, K is re-derived, never copied.
    */
  private val IvfK = 16
  private val IvfProbes = 3
  private val IvfLloydRounds = 2

  /** Squared-L2 distances of a vector column to every centroid, as a
    * K-element double array (index = cell id) — the fused native
    * kernel (graft.plans.CentroidDists, whole-stage codegen). The
    * HOF formulation (K × aggregate(zip_with(...)) literal folds)
    * evaluated interpreted and measured ~30s for the judged e5 at
    * sf0.1 — the same trap every other per-element kernel in this
    * repo already escaped — vs sub-second fused.
    */
  private def centroidDistArray(
      vec: Column, centroids: Array[(Int, Array[Double])]): Column =
    org.apache.spark.sql.graft.Bridge.column(
      graft.plans.CentroidDists(
        org.apache.spark.sql.graft.Bridge.expression(vec),
        centroids.sortBy(_._1).flatMap(_._2).toIndexedSeq,
        centroids.length, Dim))

  /** Nearest-cell id: argmin over the distance array.
    * array_position takes the FIRST occurrence, so an exact-tie
    * (essentially impossible on real-valued centroids) breaks to the
    * lower cell id deterministically.
    */
  private def cellCol(vec: Column, cs: Array[(Int, Array[Double])]): Column = {
    val d = centroidDistArray(vec, cs)
    (array_position(d, array_min(d)) - 1).cast(IntegerType)
  }

  /** Deterministic coarse quantizer trained inline: seed centroids =
    * an id-strided sample, refined by [[IvfLloydRounds]] Lloyd
    * iterations run as DataFrame jobs — assign via the same
    * [[cellCol]] expression the serving path uses, update = per-cell
    * per-dimension mean (one groupBy over the posexploded corpus).
    * Only the centroids themselves are ever collected: they are the
    * MODEL (K·dim doubles, a few KB), not data — a production system
    * persists them like any artifact. A cell that loses all members
    * keeps its previous centroid (K stays fixed).
    */
  private def trainIvfCentroids(e: DataFrame, n: Long): Array[(Int, Array[Double])] = {
    // seed stride derived from the ACTUAL corpus size so the K seeds
    // span the full vec_id range at any SF (a fixed stride drew them
    // only from the fixture's id range)
    var centroids: Array[(Int, Array[Double])] = e
      .where(col("vec_id") % lit(math.max(1L, n / IvfK)) === 0)
      .orderBy(col("vec_id")).limit(IvfK)
      .select(col("embedding")).collect()
      .map(_.getSeq[Float](0).toArray.map(_.toDouble)).zipWithIndex
      .map { case (v, i) => (i, v) }
    (1 to IvfLloydRounds).foreach { _ =>
      val means = e
        .select(cellCol(col("embedding"), centroids).as("cell"),
          posexplode(col("embedding")).as(Seq("pos", "x")))
        .groupBy(col("cell"), col("pos"))
        .agg(avg(col("x").cast(DoubleType)).as("m"))
        .collect()
        .groupBy(_.getInt(0))
        .map { case (cell, rows) =>
          val v = new Array[Double](Dim)
          rows.foreach(r => v(r.getInt(1)) = r.getDouble(2))
          cell -> v
        }
      centroids = centroids.map { case (i, old) => (i, means.getOrElse(i, old)) }
    }
    centroids
  }

  /** IVF approximate top-k: assign the corpus to its nearest cell
    * (one broadcast-argmin pass), probe each query's nprobe nearest
    * cells, rank candidates by exact cosine. The inverted-file twin
    * of e2's LSH: same candidate-then-verify shape, but buckets are
    * LEARNED cells, which track the data distribution instead of
    * random hyperplane slices. Rows-only judged (cell assignment has
    * no SQL twin); the recall floor vs exact e1 is pinned in
    * PipelineOpsSpec.
    */
  def e5AnnIvf(s: SparkSession, d: String): DataFrame = {
    val e = Tables.embeddings(s, d)
    val centroids = trainIvfCentroids(e, corpusN(s, d))
    // nprobe nearest cells: sort the distances, map each of the
    // nprobe smallest back to its index. An exact distance tie maps
    // both to the first index — the duplicate probe is collapsed by
    // the dropDuplicates below, costing one probe, never correctness
    def probeCells(vec: Column): Column = {
      val dist = centroidDistArray(vec, centroids)
      transform(slice(array_sort(dist), 1, IvfProbes),
        v => (array_position(dist, v) - 1).cast(IntegerType))
    }
    val corpus = e.select(col("vec_id"), col("embedding"),
      cellCol(col("embedding"), centroids).as("cell"))
    val queries = e.where(col("vec_id") < NumQueries)
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"),
        explode(probeCells(col("embedding"))).as("cell"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("vec_id").asc)
    corpus.join(broadcast(queries), Seq("cell"))
      .where(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("qv"), col("vec_id"), col("embedding"))
      .dropDuplicates("query_id", "vec_id")
      .select(col("query_id"), col("vec_id"),
        cosineNative(col("qv"), col("embedding")).as("cos"))
      .withColumn("rk", row_number().over(w))
      .where(col("rk") <= TopK)
      .select(col("query_id"), col("rk"), col("vec_id"), col("cos"))
      .orderBy(col("query_id"), col("rk"))
  }

  // -- e6: product quantization ---------------------------------------

  private val PqM = 8 // subspaces of Dim/PqM dims each
  private val PqSubDim = Dim / PqM
  private val PqK = 16 // 4-bit codes: 8 codes = 8 small ints per vector
  private val PqLloydRounds = 2
  private val PqRerank = 50

  /** Squared-L2 distances of subspace `m`'s slice to that subspace's
    * codebook — the same fused [[graft.plans.CentroidDists]] kernel
    * as IVF, at dim = [[PqSubDim]].
    */
  private def pqDistArray(emb: Column, book: Array[Array[Double]]): Column =
    org.apache.spark.sql.graft.Bridge.column(
      graft.plans.CentroidDists(
        org.apache.spark.sql.graft.Bridge.expression(emb),
        book.flatten.toIndexedSeq, book.length, PqSubDim))

  private def pqCellCol(emb: Column,
      books: Array[Array[Array[Double]]], m: Int): Column = {
    val d = pqDistArray(
      slice(emb, m * PqSubDim + 1, PqSubDim), books(m))
    (array_position(d, array_min(d)) - 1).cast(IntegerType)
  }

  /** Per-subspace codebooks (PqM × PqK × PqSubDim), trained like the
    * IVF quantizer — strided seeds + Lloyd rounds — but ALL subspaces
    * refine in a single job per round (explode the subspace axis,
    * assign, per-(m, cell, pos) mean). Only the codebooks are
    * collected: PqM·PqK·PqSubDim doubles, the model artifact.
    */
  private def trainPqCodebooks(e: DataFrame,
      n: Long): Array[Array[Array[Double]]] = {
    val seeds = e.where(col("vec_id") % lit(math.max(1L, n / PqK)) === 0)
      .orderBy(col("vec_id")).limit(PqK)
      .select(col("embedding")).collect()
      .map(_.getSeq[Float](0).toArray.map(_.toDouble))
    var books: Array[Array[Array[Double]]] = Array.tabulate(PqM)(m =>
      seeds.map(v => v.slice(m * PqSubDim, (m + 1) * PqSubDim)))
    (1 to PqLloydRounds).foreach { _ =>
      val subs = (0 until PqM).map(m => struct(
        lit(m).as("m"),
        pqCellCol(col("embedding"), books, m).as("cell"),
        slice(col("embedding"), m * PqSubDim + 1, PqSubDim).as("sv")))
      val byMc = e.select(explode(array(subs: _*)).as("s"))
        .select(col("s.m").as("m"), col("s.cell").as("cell"),
          posexplode(col("s.sv")).as(Seq("pos", "x")))
        .groupBy(col("m"), col("cell"), col("pos"))
        .agg(avg(col("x").cast(DoubleType)).as("mu"))
        .collect()
        .groupBy(r => (r.getInt(0), r.getInt(1)))
      books = Array.tabulate(PqM)(m => Array.tabulate(PqK) { c =>
        byMc.get((m, c)).map { rows =>
          val v = new Array[Double](PqSubDim)
          rows.foreach(r => v(r.getInt(2)) = r.getDouble(3))
          v
        }.getOrElse(books(m)(c))
      })
    }
    books
  }

  /** Product-quantization ANN — the COMPRESSED-corpus member of the
    * family (e1 exact / e2 LSH / e5 IVF / e6 PQ): each vector is
    * encoded as 8 four-bit codebook cells (8 small ints vs 64
    * floats, a ~32× footprint cut), and the approximate scan reads
    * ONLY the codes column — the original embeddings are touched
    * again just for the bounded re-rank pool. Asymmetric distance
    * computation (Jégou et al., TPAMI 2011): per query, the
    * query-to-codebook distance table (PqM×PqK doubles) is computed
    * driver-side from the collected query vectors (broadcast-sized,
    * e1's contract) and shipped as a column; a corpus row's
    * approximate distance is 8 table lookups summed in index order —
    * deterministic. Top-[[PqRerank]] by ADC then exact-cosine
    * re-rank to top-10, the candidate-then-verify shape shared with
    * e2/e5. The deliberate BroadcastNestedLoopJoin of codes ×
    * 8-query-table rows IS the ADC scan (every code row scores
    * against every query — same whitelist rationale as e1).
    * Rows-only judged; PipelineOpsSpec pins the recall floor vs e1
    * and determinism.
    */
  def e6AnnPq(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val e = Tables.embeddings(s, d)
    val books = trainPqCodebooks(e, corpusN(s, d))
    val codes = e.select(col("vec_id"),
      array((0 until PqM).map(m =>
        pqCellCol(col("embedding"), books, m)): _*).as("codes"))
    val qvecs = e.where(col("vec_id") < NumQueries)
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray.map(_.toDouble)))
    val qtab = qvecs.map { case (qid, qv) =>
      val flat = new Array[Double](PqM * PqK)
      for (m <- 0 until PqM; c <- 0 until PqK) {
        var s2 = 0.0
        var j = 0
        while (j < PqSubDim) {
          val diff = qv(m * PqSubDim + j) - books(m)(c)(j)
          s2 += diff * diff
          j += 1
        }
        flat(m * PqK + c) = s2
      }
      (qid, flat.toSeq)
    }.toSeq.toDF("query_id", "dtable")
    val adist = aggregate(
      zip_with(col("codes"), sequence(lit(0), lit(PqM - 1)),
        (c, m) => element_at(col("dtable"), m * PqK + c + 1)),
      lit(0.0), (acc, v) => acc + v)
    // Candidate selection via the bounded TopKByDist aggregate, NOT a
    // per-query window: the N·Q ADC scores reduce map-side to ≤
    // PqRerank rows per (task, query) before any shuffle, so the
    // exchange moves Q·k·tasks rows instead of the scored corpus.
    val topAdc = udaf(new TopKByDist(PqRerank))
    val cand = codes.crossJoin(broadcast(qtab))
      .where(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"), adist.as("dist"))
      .groupBy(col("query_id"))
      .agg(topAdc(col("vec_id"), col("dist")).as("pool"))
      .select(col("query_id"), explode(col("pool")).as("c"))
      .select(col("query_id"), col("c.vec_id").as("vec_id"))
    rerankExact(e, cand)
  }

  /** Exact-cosine re-rank of a bounded (query_id, vec_id) candidate
    * pool to the final top-[[TopK]], via the bounded [[TopKByDist]]
    * aggregate with dist = −cos so (dist asc, vec_id asc) ≡
    * (cos desc, vec_id asc). Shared by the candidate-generating
    * approximate paths (e6 PQ, e7 IVFPQ).
    */
  private def rerankExact(e: DataFrame, cand: DataFrame): DataFrame = {
    val qdf = e.where(col("vec_id") < NumQueries)
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"))
    val topCos = udaf(new TopKByDist(TopK))
    cand.join(e, "vec_id").join(broadcast(qdf), "query_id")
      .select(col("query_id"), col("vec_id"),
        cosineNative(col("qv"), col("embedding")).as("cos"))
      .groupBy(col("query_id"))
      .agg(topCos(col("vec_id"), -col("cos")).as("top"))
      .select(col("query_id"), posexplode(col("top")))
      .select(col("query_id"),
        (col("pos") + 1).cast(IntegerType).as("rk"),
        col("col.vec_id").as("vec_id"),
        (-col("col.dist")).as("cos"))
      .orderBy(col("query_id"), col("rk"))
  }

  // -- e7: IVF + PQ (the FAISS IVFPQ composition) ---------------------

  /** IVFPQ — the composition FAISS ships as its standard
    * billion-scale index (Jégou et al., TPAMI 2011, §V): the coarse
    * quantizer (e5's IVF cells) bounds WHICH rows are scored, and
    * product-quantization codes (e6's ADC) bound WHAT is read per
    * row. The ADC scan is an equi-join of the coded corpus against
    * the broadcast (query × probed-cell) table — only nprobe/K of
    * the corpus is scored per query, vs e6's full-corpus scan — and
    * both ranking stages run through the bounded [[TopKByDist]]
    * aggregate, so no full sort or window ever materializes. Probe
    * cells and distance tables are computed driver-side from the
    * collected query vectors (bounded by e1's broadcast-query
    * contract) against the KB-scale model artifacts. Encoded on raw
    * vectors, not residuals (FAISS `by_residual=false`): residual
    * encoding adds recall at the same code budget but needs a
    * per-cell re-centering pass — the structural scale properties
    * are identical. Rows-only judged; recall floor + determinism +
    * plan shape pinned in PipelineOpsSpec.
    */
  def e7AnnIvfPq(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val e = Tables.embeddings(s, d)
    val n = corpusN(s, d)
    val centroids = trainIvfCentroids(e, n)
    val books = trainPqCodebooks(e, n)
    val corpus = e.select(col("vec_id"),
      cellCol(col("embedding"), centroids).as("cell"),
      array((0 until PqM).map(m =>
        pqCellCol(col("embedding"), books, m)): _*).as("codes"))
    val sorted = centroids.sortBy(_._1)
    val qrows = e.where(col("vec_id") < NumQueries)
      .select(col("vec_id"), col("embedding")).collect()
      .flatMap { r =>
        val qid = r.getLong(0)
        val qv = r.getSeq[Float](1).toArray.map(_.toDouble)
        // ADC distance table: query to every (subspace, code) pair
        val dtable = new Array[Double](PqM * PqK)
        for (m <- 0 until PqM; c <- 0 until PqK) {
          var s2 = 0.0
          var j = 0
          while (j < PqSubDim) {
            val diff = qv(m * PqSubDim + j) - books(m)(c)(j)
            s2 += diff * diff
            j += 1
          }
          dtable(m * PqK + c) = s2
        }
        // nprobe nearest coarse cells, ties to the lower cell id —
        // the driver-side twin of e5's probeCells expression
        val cellDists = sorted.map { case (i, cv) =>
          var s2 = 0.0
          var j = 0
          while (j < Dim) {
            val diff = qv(j) - cv(j); s2 += diff * diff; j += 1
          }
          (s2, i)
        }
        cellDists.sortBy(identity).take(IvfProbes).map { case (_, cell) =>
          (qid, cell, dtable.toSeq)
        }
      }.toSeq
    val qtab = qrows.toDF("query_id", "cell", "dtable")
    val adist = aggregate(
      zip_with(col("codes"), sequence(lit(0), lit(PqM - 1)),
        (c, m) => element_at(col("dtable"), m * PqK + c + 1)),
      lit(0.0), (acc, v) => acc + v)
    val topAdc = udaf(new TopKByDist(PqRerank))
    val cand = corpus.join(broadcast(qtab), Seq("cell"))
      .where(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"), adist.as("dist"))
      .groupBy(col("query_id"))
      .agg(topAdc(col("vec_id"), col("dist")).as("pool"))
      .select(col("query_id"), explode(col("pool")).as("c"))
      .select(col("query_id"), col("c.vec_id").as("vec_id"))
    rerankExact(e, cand)
  }

  // -- judged quality certificates for the approximate family ----------

  /** q82's files-read discipline applied to retrieval quality: the
    * judged output of an approximate ANN path is a per-query
    * CERTIFICATE row — the EXACT top-k pool's id checksum (which the
    * oracle replays independently via e1's brute-force SQL) next to
    * an overall recall@k-vs-e1 floor check computed from the live
    * approximate result. The driver's hash gate now goes red if
    * either side drifts: a broken exact ranking changes
    * `exact_pool_sum`, and an approximate path whose recall falls
    * below its engineered floor flips `recall_ok` — so retrieval
    * quality is certified per round by the driver, not only by sbt
    * (the specs keep pinning determinism and the tighter plan
    * shapes). Floors are the spec-pinned ones (e2/e5 0.25, e7 0.3,
    * e6 0.4) expressed as hit counts over the N_queries·k pool.
    */
  private def recallCertificate(exact: DataFrame, approx: DataFrame,
      floorHits: Long): DataFrame = {
    val hits = approx.select(col("query_id"), col("vec_id"))
      .join(exact.select(col("query_id"), col("vec_id")),
        Seq("query_id", "vec_id"), "left_semi")
      .agg(count(lit(1)).as("n_hits"))
    exact.groupBy(col("query_id"))
      .agg(count(lit(1)).as("k"), sum(col("vec_id")).as("exact_pool_sum"))
      .crossJoin(broadcast(hits))
      .select(col("query_id"), col("k"), col("exact_pool_sum"),
        (col("n_hits") >= floorHits).as("recall_ok"))
      .orderBy(col("query_id"))
  }

  def e2AnnLshJudged(s: SparkSession, d: String): DataFrame =
    recallCertificate(e1AnnBruteForce(s, d), e2AnnLsh(s, d),
      floorHits = (NumQueries * TopK) / 4) // recall >= 0.25
  def e5AnnIvfJudged(s: SparkSession, d: String): DataFrame =
    recallCertificate(e1AnnBruteForce(s, d), e5AnnIvf(s, d),
      floorHits = (NumQueries * TopK) / 4) // recall >= 0.25
  def e6AnnPqJudged(s: SparkSession, d: String): DataFrame =
    recallCertificate(e1AnnBruteForce(s, d), e6AnnPq(s, d),
      floorHits = (NumQueries * TopK) * 2 / 5) // recall >= 0.4
  def e7AnnIvfPqJudged(s: SparkSession, d: String): DataFrame =
    recallCertificate(e1AnnBruteForce(s, d), e7AnnIvfPq(s, d),
      floorHits = (NumQueries * TopK) * 3 / 10) // recall >= 0.3

  /** e4's graduation to the hash gate — the e2/e5/e6/e7 certificate
    * pattern applied to PAIR MINING. The judged output is a
    * per-vec_a summary of e3, the label-blocked EXACT twin the
    * oracle replays independently, plus two engine-measured
    * booleans: `recall_ok` (zero e3 pairs missed by the LSH-blocked
    * path — the 32×4-bit amplification engineers ≈0.993 per-pair
    * recall and the fixture's full containment is spec-pinned) and
    * `precision_ok` (zero same-label e4 pairs OUTSIDE e3 — the
    * verify step's exact-cosine threshold makes any spurious pair a
    * broken verify, not an LSH artifact). A recall regression, a
    * precision break, or drift in the exact pair checksums now goes
    * red at the driver, not only in sbt.
    */
  def e4NearDupLshJudged(s: SparkSession, d: String): DataFrame = {
    val exact = e3EmbeddingNearDup(s, d).select(col("vec_a"), col("vec_b"))
    val approx = e4NearDupLsh(s, d).select(col("vec_a"), col("vec_b"))
    val labels = Tables.embeddings(s, d).select(col("vec_id"), col("label"))
    val sameLabel = approx
      .join(labels.select(col("vec_id").as("vec_a"), col("label").as("la")),
        Seq("vec_a"))
      .join(labels.select(col("vec_id").as("vec_b"), col("label").as("lb")),
        Seq("vec_b"))
      .where(col("la") === col("lb"))
      .select(col("vec_a"), col("vec_b"))
    val missed = exact.join(approx, Seq("vec_a", "vec_b"), "left_anti")
      .agg(count(lit(1)).as("n_missed"))
    val spurious = sameLabel.join(exact, Seq("vec_a", "vec_b"), "left_anti")
      .agg(count(lit(1)).as("n_spurious"))
    exact.groupBy(col("vec_a"))
      .agg(count(lit(1)).as("n_pairs"), sum(col("vec_b")).as("pair_sum"))
      .crossJoin(broadcast(missed))
      .crossJoin(broadcast(spurious))
      .select(col("vec_a"), col("n_pairs"), col("pair_sum"),
        (col("n_missed") === 0L).as("recall_ok"),
        (col("n_spurious") === 0L).as("precision_ok"))
      .orderBy(col("vec_a"))
  }

  /** The oracle's half of [[recallCertificate]]: replay e1's exact
    * top-k in SQL, emit each query's pool checksum, and pin the
    * literal `recall_ok = TRUE` the engine must have measured.
    */
  private def recallOracle: String = s"""
      WITH exact AS (
        SELECT query_id, vec_id FROM (
          SELECT q.vec_id AS query_id, e.vec_id AS vec_id,
                 row_number() OVER (PARTITION BY q.vec_id
                                    ORDER BY ${cosSql.format("q.embedding",
                                      "e.embedding", "q.embedding",
                                      "e.embedding")} DESC,
                                             e.vec_id ASC) AS rk
          FROM embeddings e
          JOIN (SELECT vec_id, embedding FROM embeddings
                WHERE vec_id < $NumQueries) q
            ON e.vec_id <> q.vec_id)
        WHERE rk <= $TopK)
      SELECT query_id, count(*) AS k,
             CAST(sum(vec_id) AS BIGINT) AS exact_pool_sum,
             TRUE AS recall_ok
      FROM exact
      GROUP BY query_id
      ORDER BY query_id"""

  private val cosSql =
    """list_sum(list_transform(list_zip(%s, %s),
      |        p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE))) /
      |      (sqrt(list_sum(list_transform(%s, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) *
      |       sqrt(list_sum(list_transform(%s, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))))""".stripMargin

  val queries: Seq[Q] = Seq(
    Q("e1_ann_brute_force", e1AnnBruteForce, Some(s"""
      SELECT query_id, rk, vec_id, cos FROM (
        SELECT q.vec_id AS query_id, e.vec_id AS vec_id,
               ${cosSql.format("q.embedding", "e.embedding", "q.embedding", "e.embedding")} AS cos,
               row_number() OVER (PARTITION BY q.vec_id
                                  ORDER BY ${cosSql.format("q.embedding", "e.embedding", "q.embedding", "e.embedding")} DESC,
                                           e.vec_id ASC) AS rk
        FROM embeddings e
        JOIN (SELECT vec_id, embedding FROM embeddings WHERE vec_id < $NumQueries) q
          ON e.vec_id <> q.vec_id)
      WHERE rk <= $TopK
      ORDER BY query_id, rk""")),
    Q("e8_ann_filtered", e8AnnFiltered, Some(s"""
      SELECT query_id, rk, vec_id, cos FROM (
        SELECT q.vec_id AS query_id, e.vec_id AS vec_id,
               ${cosSql.format("q.embedding", "e.embedding", "q.embedding", "e.embedding")} AS cos,
               row_number() OVER (PARTITION BY q.vec_id
                                  ORDER BY ${cosSql.format("q.embedding", "e.embedding", "q.embedding", "e.embedding")} DESC,
                                           e.vec_id ASC) AS rk
        FROM embeddings e
        JOIN (SELECT vec_id, embedding, label FROM embeddings
              WHERE vec_id < $NumQueries) q
          ON e.label = q.label AND e.vec_id <> q.vec_id)
      WHERE rk <= $TopK
      ORDER BY query_id, rk""")),
    // the approximate paths judge their recall CERTIFICATE (exact
    // pool checksum + floor check) — the raw top-k remains the
    // spec-gated surface (PipelineOpsSpec: recall, determinism, plan)
    Q("e2_ann_lsh", e2AnnLshJudged, Some(recallOracle)),
    Q("e5_ann_ivf", e5AnnIvfJudged, Some(recallOracle)),
    Q("e6_ann_pq", e6AnnPqJudged, Some(recallOracle)),
    Q("e7_ann_ivfpq", e7AnnIvfPqJudged, Some(recallOracle)),
    // e4 judges its containment CERTIFICATE vs e3 (the exact twin the
    // oracle replays) — the raw pair list stays spec-gated
    Q("e4_near_dup_lsh", e4NearDupLshJudged, Some(s"""
      WITH exact AS (
        SELECT x.vec_id AS vec_a, y.vec_id AS vec_b
        FROM embeddings x
        JOIN embeddings y ON x.label = y.label AND x.vec_id < y.vec_id
        WHERE ${cosSql.format("x.embedding", "y.embedding",
          "x.embedding", "y.embedding")} >= 0.35)
      SELECT vec_a, count(*) AS n_pairs,
             CAST(sum(vec_b) AS BIGINT) AS pair_sum,
             TRUE AS recall_ok, TRUE AS precision_ok
      FROM exact
      GROUP BY vec_a
      ORDER BY vec_a""")),
    Q("e3_embedding_near_dup", e3EmbeddingNearDup, Some(s"""
      SELECT x.vec_id AS vec_a, y.vec_id AS vec_b,
             ${cosSql.format("x.embedding", "y.embedding", "x.embedding", "y.embedding")} AS cos
      FROM embeddings x
      JOIN embeddings y ON x.label = y.label AND x.vec_id < y.vec_id
      WHERE ${cosSql.format("x.embedding", "y.embedding", "x.embedding", "y.embedding")} >= 0.35
      ORDER BY vec_a, vec_b"""))
  )
}
