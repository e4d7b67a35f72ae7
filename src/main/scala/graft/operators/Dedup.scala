package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.sources.Tables
import graft.functions.TextFunctions._
import graft.Catalog.Q
import org.apache.spark.sql.graft.Bridge

/** Deduplication operators over `documents` — exact, MinHash+LSH,
  * SimHash, exact n-gram Jaccard, and embedding-cosine near-dup.
  *
  * Scale design: every variant is blocked so the pairwise step never
  * goes quadratic in the corpus —
  *  - exact: hash groupBy (one shuffle on the digest, map-side partial);
  *  - MinHash: banding turns near-dup search into an equi-join on
  *    (band, band_hash); only same-bucket pairs are verified;
  *  - SimHash: 7-bit chunk banding (9 chunks — pigeonhole-exact for
  *    Hamming ≤ 8), Hamming verify on candidates;
  *  - Jaccard / cosine: explicit blocking keys (source / label).
  * At 100 TB the only quadratic blowup possible is within a bucket;
  * bucket width is controlled by the signature parameters, and AQE
  * skew-join handles pathological buckets.
  */
object Dedup {

  /** Exact dedup by content digest: one hash-aggregate, emitting the
    * canonical (minimum) doc per group and the group size. Output
    * covers all groups so the result is non-vacuous even on a corpus
    * without exact dups.
    */
  def d1ExactDedup(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .groupBy(md5(col("text").cast(BinaryType)).as("content_hash"))
      .agg(min(col("doc_id")).as("keep_id"),
        count(lit(1)).as("n_copies"))
      .orderBy(col("content_hash"))

  /** Sorted distinct hashed word n-grams via the fused native kernel
    * (graft.plans.NgramHashes) — the string-HOF shingle chain
    * (split/sequence/element_at/concat_ws/array_distinct) evaluated
    * interpreted at ~6s per pass over 5k docs; this is ~0.2s, and
    * long shingles make every downstream set op integer-cheap.
    */
  private def ngramHashes(text: Column, n: Int): Column =
    Bridge.column(graft.plans.NgramHashes(Bridge.expression(text), n))

  /** Exact Jaccard from hashed shingle sets: |A∩B| / (|A|+|B|−|A∩B|).
    * Equal to the string-set Jaccard barring 64-bit hash collisions
    * (P ≈ |vocab|²/2⁶⁴ — negligible; the oracle cross-checks it).
    */
  private def hashedJaccard(a: Column, b: Column): Column = {
    val inter = size(array_intersect(a, b)).cast(DoubleType)
    inter / (size(a).cast(DoubleType) + size(b).cast(DoubleType) - inter)
  }

  // -- MinHash + LSH ---------------------------------------------------

  /** 32 permutation hashes over 31-bit shingle hashes; 16 bands × 2.
    * The banding is pointed BELOW the emitted threshold: with b
    * bands of r rows the S-curve midpoint is (1/b)^(1/r) =
    * (1/16)^(1/2) = 0.25, so a pair at the emitted Jaccard cutoff
    * of 0.5 is caught with probability 1-(1-0.5²)¹⁶ ≈ 0.990 (the
    * earlier 8×4 design had its midpoint at 0.59 — ABOVE the
    * cutoff — catching boundary pairs only ~40% of the time).
    * Narrower bands admit more false candidates; those die in the
    * exact-Jaccard verify, which is the right trade at scale
    * because a missed pair is unrecoverable while a false
    * candidate costs one row-local set intersection.
    */
  private val MinhashP = 2147483647L // 2^31 - 1 (Mersenne)
  private val NumHashes = 32
  private val MinhashTau = 0.5
  // (16, 2) — derived, not hand-picked: largest rows-per-band whose
  // S-curve still catches >= 98% of pairs at the emitted threshold
  // (LshParamsSpec pins the derivation and the r1-bug midpoint rule)
  private val BandingDerived = LshParams.minhashBanding(NumHashes, MinhashTau)
  private val NumBands = BandingDerived._1
  private val BandSize = BandingDerived._2
  private val seeds: Seq[(Long, Long)] = {
    val rnd = new scala.util.Random(42)
    Seq.fill(NumHashes)((math.abs(rnd.nextLong()) % (MinhashP - 1) + 1,
      math.abs(rnd.nextLong()) % MinhashP))
  }

  /** 32-element MinHash signature via the native fused kernel
    * (graft.plans.MinHashSig): one pass over the shingles updating
    * all 32 minima. The equivalent HOF formulation (32 ×
    * array_min(transform(...))) runs interpreted per element and
    * measured ~20s at sf0.1 vs sub-second for the kernel.
    */
  private def minhashSig(hashedShingles: Column): Column =
    Bridge.column(graft.plans.MinHashSig(
      Bridge.expression(hashedShingles),
      seeds.map(_._1), seeds.map(_._2), MinhashP))

  /** Candidate pairs via LSH banding + exact Jaccard verification.
    * Signature/banding is linear per doc; the equi-join on
    * (band_id, band_hash) is the only shuffle; verified pairs carry
    * exact 2-gram Jaccard >= 0.5.
    */
  def d2MinhashLsh(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
      .select(col("doc_id"), ngramHashes(col("text"), 2).as("sh"))
      .where(size(col("sh")) > 0)
    val withSig = docs.select(col("doc_id"), minhashSig(col("sh")).as("sig"))
    // one explode, not a union of 16 branches — a branch-per-band
    // union makes Spark recompute the whole signature pipeline per
    // band per join side (measured 52s at sf0.1; ~3s this way)
    val bands = withSig.select(col("doc_id"),
        explode(array((0 until NumBands).map { bnd =>
          struct(lit(bnd).as("band_id"),
            hash((0 until BandSize).map(i =>
              element_at(col("sig"), bnd * BandSize + i + 1)): _*)
              .as("band_hash"))
        }: _*)).as("bd"))
      .select(col("doc_id"), col("bd.band_id").as("band_id"),
        col("bd.band_hash").as("band_hash"))
    // distinct, not d3-style first-match emission: measured at sf0.1
    // the duplicate factor here is low (few pairs collide in >1
    // band), so a dedup shuffle of the small candidate set beats
    // recomputing 16 band hashes per probe and carrying the 32-long
    // signature through the exploded frame (4.4s vs 2.9s).
    val cand = bands.as("x").join(bands.as("y"),
        col("x.band_id") === col("y.band_id") &&
          col("x.band_hash") === col("y.band_hash") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
      .distinct()
    cand
      .join(docs.select(col("doc_id").as("doc_a"), col("sh").as("sh_a")), "doc_a")
      .join(docs.select(col("doc_id").as("doc_b"), col("sh").as("sh_b")), "doc_b")
      .select(col("doc_a"), col("doc_b"),
        hashedJaccard(col("sh_a"), col("sh_b")).as("jaccard"))
      .where(col("jaccard") >= MinhashTau)
      .orderBy(col("doc_a"), col("doc_b"))
  }

  // -- SimHash ---------------------------------------------------------

  /** 63-bit SimHash (63, not 64: the bit-pack stays inside a signed
    * long so ANSI overflow checking never fires). Majority vote per
    * bit over XXH64 token hashes, packed MSB-first — the native
    * fused kernel (graft.plans.SimHash63); the HOF formulation
    * (aggregate + zip_with over 63 whens per token) ran interpreted
    * and measured ~10s at sf0.1 vs sub-second for the kernel.
    */
  def simhash63(text: Column): Column =
    Bridge.column(graft.plans.SimHash63(
      Bridge.expression(ngramHashes(text, 1))))

  /** SimHash chunk count. 9 chunks of 7 bits over the 63-bit
    * signature: a pair at Hamming distance d differs in at most d
    * chunks, so with 9 chunks every pair at distance <= 8 has at
    * least one chunk equal — the pigeonhole guarantee is EXACT for
    * the emitted threshold (c chunks guarantee distance <= c-1).
    * The earlier 4x16-bit parameterization claimed the same bound
    * falsely: 8 bits spread 2+2+2+2 leave no equal 16-bit chunk.
    * PipelineOpsSpec proves recall == 1.0 vs the unblocked
    * all-pairs Hamming ground truth.
    *
    * Scale note: 7-bit chunks mean only 128 buckets per chunk
    * index, so at extreme corpus sizes candidate generation is
    * bounded by bucket width, not selectivity — the inherent cost
    * of an exact-recall guarantee at distance 8 over 63 bits
    * (Manku et al., WWW'07: guaranteed blocks for distance d need
    * d+1 blocks). The Hamming verify runs BEFORE the distinct
    * shuffle, so false candidates die row-locally; corpora needing
    * tighter buckets should lower the distance (fewer, wider
    * chunks) rather than silently losing recall.
    */
  private val SimhashMaxHamming = 8
  // 9 chunks × 7 bits — derived from the pigeonhole rule (d+1 chunks
  // for exact recall at distance d over the 63-bit signature)
  private val SimhashChunks = LshParams.simhashChunks(SimhashMaxHamming)
  private val SimhashChunkBits = LshParams.simhashChunkBits(63, SimhashMaxHamming)

  /** Per-doc SimHash plus near-dup pairs at Hamming distance <= 8,
    * candidates blocked on any equal 7-bit chunk (see
    * [[SimhashChunks]] for the exactness argument).
    */
  def d3Simhash(s: SparkSession, d: String): DataFrame = {
    val sigs = Tables.documents(s, d)
      // guard like d2: token-less docs would all hash to signature 0
      // and pair up quadratically as bogus hamming-0 near-dups
      .where(trim(col("text")) =!= "")
      .select(col("doc_id"), simhash63(col("text")).as("simhash"))
    // explode, not union-of-9: the union recomputes the (expensive)
    // simhash fold once per chunk per join side
    val chunks = sigs.select(col("doc_id"), col("simhash"),
        explode(array((0 until SimhashChunks).map { k =>
          struct(lit(k).as("chunk_id"),
            shiftright(col("simhash"), k * SimhashChunkBits)
              .bitwiseAND((1 << SimhashChunkBits) - 1).as("chunk"))
        }: _*)).as("ck"))
      .select(col("doc_id"), col("simhash"),
        col("ck.chunk_id").as("chunk_id"), col("ck.chunk").as("chunk"))
    // first-match emission: a pair sharing several chunks would match
    // in several buckets; requiring that no EARLIER chunk also
    // matches (checkable row-locally — both sides carry the full
    // signature) emits each pair exactly once, replacing a
    // dedup shuffle of the whole candidate set with 8 integer
    // compares per probe. On this dense corpus that distinct was the
    // single most expensive exchange in the catalog.
    def chunkOf(sig: Column, j: Int): Column =
      shiftright(sig, j * SimhashChunkBits)
        .bitwiseAND((1 << SimhashChunkBits) - 1)
    val firstMatch = (0 until SimhashChunks).map { j =>
      (col("x.chunk_id") <= j) ||
        (chunkOf(col("x.simhash"), j) =!= chunkOf(col("y.simhash"), j))
    }.reduce(_ && _)
    chunks.as("x").join(chunks.as("y"),
        col("x.chunk_id") === col("y.chunk_id") &&
          col("x.chunk") === col("y.chunk") &&
          col("x.doc_id") < col("y.doc_id") && firstMatch)
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"),
        bit_count(col("x.simhash").bitwiseXOR(col("y.simhash"))).as("hamming"))
      // row-local verify; no distinct needed — first-match emission
      // already made pairs unique
      .where(col("hamming") <= SimhashMaxHamming)
      .orderBy(col("doc_a"), col("doc_b"))
  }

  /** d2's graduation to the hash gate — the e2/e4 certificate
    * pattern. The judged output is a per-doc_a summary of d4, the
    * EXACT same-source Jaccard twin the oracle replays independently
    * on raw string shingles, plus two engine-measured booleans:
    * `recall_ok` (the banded LSH path missed ZERO exact pairs — the
    * 16×2 banding engineers ≈0.99 per-pair catch probability at the
    * threshold and this corpus's full containment is what the probe
    * measured at all three SFs) and `precision_ok` (every same-source
    * LSH pair lies inside the exact set — the exact-Jaccard verify
    * step makes a spurious pair a broken verify, not an LSH
    * artifact). Cross-source pairs — d2 blocks globally, d4 by
    * source — stay covered by the spec's boundary-pair invariants.
    * A recall regression now goes red at the driver, not only in sbt.
    */
  def d2MinhashLshJudged(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    // both pair sets are OUTPUT-scale (bounded by the corpus's real
    // near-dup density — hundreds of rows, not data): pull each once
    // and do the certificate's set algebra driver-side, instead of
    // paying the full shingle/signature pipeline once per aggregate
    // action (the naive 4-action form re-ran d4 twice and the LSH
    // twice — measured 8.9 s vs ~3 s at sf0.1)
    val exact = d4Pairs(s, d).select(col("doc_a"), col("doc_b"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val pPairs = d2MinhashLsh(s, d).select(col("doc_a"), col("doc_b"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val pSet = pPairs.toSet
    val exactSet = exact.toSet
    val missed = exact.count(e => !pSet(e))
    // spurious same-source LSH pairs: one tiny lookup of the found
    // pairs' sources against the documents dim (the found frame
    // broadcasts; the pipeline is NOT recomputed)
    val src = Tables.documents(s, d).select(col("doc_id"), col("source"))
    val spurious = pPairs.toDF("doc_a", "doc_b")
      .join(src.select(col("doc_id").as("doc_a"),
        col("source").as("src_a")), "doc_a")
      .join(src.select(col("doc_id").as("doc_b"),
        col("source").as("src_b")), "doc_b")
      .where(col("src_a") === col("src_b"))
      .select(col("doc_a"), col("doc_b"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .count(x => !exactSet(x))
    exact.groupBy(_._1).toSeq.sortBy(_._1)
      .map { case (a, ps) =>
        (a, ps.length.toLong, ps.map(_._2).sum,
          missed == 0, spurious == 0) }
      .toDF("doc_a", "n_pairs", "pair_sum", "recall_ok", "precision_ok")
  }

  /** d3's graduation to the hash gate: SimHash (hamming ≤ 3 on the
    * 63-bit signature) approximates NEAR-IDENTITY, so its exact
    * reference is the tight tail of d4 — same-source pairs at raw
    * 2-gram Jaccard ≥ 0.9, every one of which a working SimHash must
    * bucket together (measured: zero missed at all three SFs; a
    * near-identical pair differing in ≤ a few tokens lands within
    * the hamming budget by construction). The judged row is the
    * oracle-replayable summary of that exact tail plus the measured
    * `recall_ok`; d3's own (hash-derived) pair set stays pinned by
    * the spec's boundary-pair invariants.
    */
  def d3SimhashJudged(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    // the exact near-identity tail is a handful of pairs: pull it
    // once, then probe d3's (large) pair stream ONCE with a pushed
    // IN-filter on the encoded pair key — one d4 pass + one SimHash
    // pass total, vs recomputing each per aggregate action
    val exact = d4Pairs(s, d).where(col("jaccard") >= 0.9)
      .select(col("doc_a"), col("doc_b"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val missed =
      if (exact.isEmpty) 0
      else {
        // per-side doc_id IN filters push through the chunk join all
        // the way into the documents scan, so the probe hashes ONLY
        // the exact pairs' docs (sound: d3's emission of a pair is
        // row-local in the two docs' signatures). The single-key
        // encoded form instead lands in the join CONDITION, evaluated
        // per band-collision candidate — measured +3.7 s at sf0.1.
        val found = d3Simhash(s, d)
          .where(col("doc_a").isin(exact.map(_._1).distinct: _*) &&
            col("doc_b").isin(exact.map(_._2).distinct: _*))
          .select(col("doc_a"), col("doc_b"))
          .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
        exact.count(e => !found(e))
      }
    exact.groupBy(_._1).toSeq.sortBy(_._1)
      .map { case (a, ps) =>
        (a, ps.length.toLong, ps.map(_._2).sum, missed == 0) }
      .toDF("doc_a", "n_pairs", "pair_sum", "recall_ok")
  }

  // -- Exact n-gram Jaccard (oracle-checked) ---------------------------

  /** Exact 2-gram Jaccard near-dup pairs at threshold 0.5, blocked by
    * source (the pipeline's natural shard key). The ground-truth twin
    * of d2, and oracle-checked.
    *
    * Routed like d7 (same probe, same threshold, same argument — a
    * deployment shouldn't pick the plan by reading comments):
    *  - flat vocabulary → [[d4PairsCountAgg]], the inverted join
    *    whose fan-out collapses into a map-side partial count
    *    aggregate (the measured winner on this no-rare-tail corpus;
    *    d7's plan note has the 20s → 7s history);
    *  - Zipfian (one shingle in > 25% of docs) → [[d4PairsPrefix]],
    *    the PPJoin prefix-filtered plan whose cost rides the RARE
    *    tail (a plain inverted index degenerates on hot shingles —
    *    measured 140M join rows / 33s at sf0.1; naive pairwise
    *    arrays 51s).
    * Both plans are exact (PipelineOpsSpec pins edge-set identity);
    * the probe is cached per dataset dir ([[hotShingleShareFor]]),
    * so repeated constructions (Bench's warmup + 3 passes) pay it
    * once.
    */
  def d4NgramJaccard(s: SparkSession, d: String): DataFrame =
    d4Pairs(s, d).orderBy(col("doc_a"), col("doc_b"))

  /** d4 pair derivation without the presentation sort — consumers
    * that immediately re-shuffle (d5's component builder) would pay
    * the range exchange + sort for nothing.
    */
  private[graft] def d4Pairs(s: SparkSession, d: String): DataFrame = {
    val docs = docShingles(Tables.documents(s, d))
    if (hotShingleShareFor(s, d) > HotShareThreshold) d4PairsPrefix(docs)
    else d4PairsCountAgg(docs)
  }

  /** d4's PPJoin-style prefix-filtered plan — the Zipfian route:
    *  1. global document frequency per shingle (one groupBy);
    *  2. each doc's shingles ranked rarest-first (window over doc_id);
    *  3. only the prefix (|sh| − ⌈τ·|sh|⌉ + 1 rarest shingles — the
    *     Jaccard prefix-filter bound) is indexed;
    *  4. candidates = equi-join on (source, prefix shingle);
    *  5. exact Jaccard verification on the candidates' full sets.
    * A pair with Jaccard ≥ τ must share a prefix element under any
    * global total order (here: df asc, shingle asc), so recall is
    * exact and cost is driven by RARE shingles only.
    */
  private[graft] def d4PairsPrefix(docs: DataFrame): DataFrame = {
    val tau = 0.5
    val exploded = docs.select(col("doc_id"), col("source"),
      size(col("sh")).as("n_sh"), explode(col("sh")).as("shingle"))
    val dfreq = exploded.groupBy(col("shingle"))
      .agg(count(lit(1)).as("df"))
    val ranked = exploded.join(dfreq, "shingle")
      .withColumn("rnk", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col("doc_id"))
          .orderBy(col("df").asc, col("shingle").asc)))
    val prefix = ranked.where(
      col("rnk") <= col("n_sh") - ceil(col("n_sh") * tau) + 1)
    val cand = prefix.as("x").join(prefix.as("y"),
        col("x.source") === col("y.source") &&
          col("x.shingle") === col("y.shingle") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
      .distinct()
    cand
      .join(docs.select(col("doc_id").as("doc_a"), col("sh").as("sh_a")), "doc_a")
      .join(docs.select(col("doc_id").as("doc_b"), col("sh").as("sh_b")), "doc_b")
      .select(col("doc_a"), col("doc_b"),
        hashedJaccard(col("sh_a"), col("sh_b")).as("jaccard"))
      .where(col("jaccard") >= tau)
  }

  /** Incremental NEAR-dup: delta documents that are ≥ τ 2-gram
    * Jaccard similar to some corpus document — d6's production shape
    * lifted from exact to near duplicates, and still EXACT-recall:
    * the cross-set PPJoin prefix-filter theorem (a pair at Jaccard ≥
    * τ must share an element within each side's (|s|−⌈τ|s|⌉+1)-rarest
    * prefix under any shared global order) holds between sets just as
    * within one, so unlike an LSH variant this is oracle-checkable.
    * Corpus side ships only (prefix shingle → doc, shingle set); at
    * scale that index is built once and reused per ingest while the
    * delta stays small. Same corpus/delta split as d6 (even- vs
    * odd-numbered sources; the corpus's planted near-dups are
    * cross-source, so real ≥τ pairs span the boundary).
    */
  def d7IncrementalNearDup(s: SparkSession, d: String): DataFrame = {
    val docs = docShingles(Tables.documents(s, d))
    // DATA-DRIVEN plan routing, not a comment a deployment has to
    // read: both plans below are exact (identical rows), but their
    // cost profiles are mirror images. The count-agg plan's join
    // fan-out on one shingle is dfX·dfY — a shingle hitting a
    // constant fraction of the corpus makes it quadratic, which is
    // exactly what Zipfian stop-bigrams do; the prefix plan's cost
    // rides the RARE tail instead and shrugs at hot heads. The probe
    // (max shingle document-frequency share) is two scalar
    // aggregates at plan-construction time — the same pass a
    // production ingest would compute once per corpus profile and
    // cache, priced at far less than one wrong plan.
    val plan =
      if (hotShingleShareFor(s, d) > HotShareThreshold) d7Prefix(docs, D7Tau)
      else d7CountAgg(docs, D7Tau)
    plan.orderBy(col("delta_id"), col("corpus_id"))
  }

  private[graft] val D7Tau = 0.5

  /** Route to the prefix-filtered plan once ONE shingle hits > 25%
    * of documents: its solo fan-out contribution is then ≥ (n/4)²/4
    * pairs — quadratic in the corpus — while the synthetic fixture's
    * flat ~50-word vocabulary tops out near 4%. The margin between
    * those two regimes is wide; anything inside it is fine either
    * way. Shared by d4 and d7 — both route over the same 2-gram
    * shingle frame, so one probe answers both.
    */
  private[graft] val HotShareThreshold = 0.25

  /** (doc_id, source, text) → (doc_id, source, sh): the shared
    * shingle derivation for the routed Jaccard plans (and their
    * specs).
    */
  private[graft] def docShingles(raw: DataFrame): DataFrame =
    raw.select(col("doc_id"), col("source"),
      ngramHashes(col("text"), 2).as("sh"))
      .where(size(col("sh")) > 0)

  /** [[hotShingleShare]] memoized per dataset dir: d4 and d7 probe
    * the identical shingle frame, and Bench constructs each judged
    * query four times (warmup + 3 measured passes) — without the
    * cache that is 8+ probe jobs per bench run for one scalar. Same
    * immutability contract as Similarity's corpus-count cache: test
    * datasets never change under a dir within one JVM; a deployment
    * that rewrites in place must key by snapshot/version instead.
    */
  private val hotShareCache =
    scala.collection.concurrent.TrieMap.empty[String, Double]
  private[graft] def hotShingleShareFor(s: SparkSession, d: String): Double =
    hotShareCache.getOrElseUpdate(d,
      hotShingleShare(docShingles(Tables.documents(s, d))))

  /** The routing probe: max shingle document frequency as a share of
    * the document count. ngramHashes is per-doc distinct, so the
    * exploded count per shingle IS its document frequency.
    */
  private[graft] def hotShingleShare(docs: DataFrame): Double = {
    val n = docs.count()
    if (n == 0) return 0.0
    val top = docs.select(explode(col("sh")).as("shingle"))
      .groupBy(col("shingle")).agg(count(lit(1)).as("df"))
      .agg(max(col("df"))).head
    if (top.isNullAt(0)) 0.0 else top.getLong(0).toDouble / n
  }

  /** COUNT-AGGREGATION plan — the flat-vocabulary winner.
    * ngramHashes is per-doc DISTINCT, so counting matched shingles
    * per (delta, corpus) pair IS the exact set overlap — Jaccard
    * falls out of the counts with no array intersection at all.
    *
    * The earlier PPJoin shape (df-ranked prefix index →
    * positional/size-pruned candidate join → distinct → join the
    * full sets back → verify) admitted 1.77M distinct candidates for
    * 120 true pairs at sf0.1 — this corpus's ~50-word vocabulary has
    * no rare tail, so the prefix filter's selectivity collapses (its
    * documented worst case; measured 8.3M prefix-join rows vs 14M
    * unfiltered) and the verify stage (two array joins + an O(|sh|)
    * intersection per candidate) made this the most expensive query
    * in the suite (20s local, 72s in the contended driver r3 run).
    * Here the inverted-index join's fan-out feeds STRAIGHT into a
    * partial hash aggregate in the same stage — the overlap count
    * collapses map-side before the one pair-keyed shuffle, and the
    * exact Jaccard ovl/(nx+ny−ovl) is filtered from counts alone: no
    * distinct shuffle, no join-back, no per-candidate set
    * intersection (measured 20s → 7s at sf0.1, same rows).
    * The size filter (J ≥ τ ⇒ min ≥ τ·max) stays: it is exact and
    * drops a pair's every matched row inside the join.
    */
  private[graft] def d7CountAgg(docs: DataFrame, tau: Double): DataFrame = {
    val exploded = docs.select(col("doc_id"), col("source"),
      size(col("sh")).as("n_sh"), explode(col("sh")).as("shingle"))
    val xs = exploded.where(!isCorpusSource(col("source")))
    val ys = exploded.where(isCorpusSource(col("source")))
    xs.as("x").join(ys.as("y"),
        col("x.shingle") === col("y.shingle") &&
          col("x.n_sh") * tau <= col("y.n_sh") &&
          col("y.n_sh") * tau <= col("x.n_sh"))
      .groupBy(col("x.doc_id").as("delta_id"), col("y.doc_id").as("corpus_id"),
        col("x.n_sh").as("nx"), col("y.n_sh").as("ny"))
      .agg(count(lit(1)).as("ovl"))
      .select(col("delta_id"), col("corpus_id"),
        (col("ovl").cast(DoubleType) /
          (col("nx") + col("ny") - col("ovl")).cast(DoubleType)).as("jaccard"))
      .where(col("jaccard") >= tau)
  }

  /** PREFIX-FILTERED plan — the Zipfian winner: d4's PPJoin shape
    * lifted cross-set. Document frequency over the UNION of both
    * sides gives the shared global order the prefix theorem needs;
    * each side indexes only its (|s|−⌈τ|s|⌉+1)-rarest shingles, so a
    * stop-bigram in every document lands in nobody's prefix and the
    * candidate join never sees it. Exact recall (the theorem holds
    * between sets exactly as within one); the verify stage recomputes
    * full Jaccard on candidates, so false candidates cost one
    * row-local intersection each.
    */
  private[graft] def d7Prefix(docs: DataFrame, tau: Double): DataFrame = {
    val exploded = docs.select(col("doc_id"), col("source"),
      size(col("sh")).as("n_sh"), explode(col("sh")).as("shingle"))
    val dfreq = exploded.groupBy(col("shingle")).agg(count(lit(1)).as("df"))
    val ranked = exploded.join(dfreq, "shingle")
      .withColumn("rnk", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col("doc_id"))
          .orderBy(col("df").asc, col("shingle").asc)))
    val prefix = ranked.where(
      col("rnk") <= col("n_sh") - ceil(col("n_sh") * tau) + 1)
    val cand = prefix.where(!isCorpusSource(col("source"))).as("x")
      .join(prefix.where(isCorpusSource(col("source"))).as("y"),
        col("x.shingle") === col("y.shingle") &&
          col("x.n_sh") * tau <= col("y.n_sh") &&
          col("y.n_sh") * tau <= col("x.n_sh"))
      .select(col("x.doc_id").as("delta_id"), col("y.doc_id").as("corpus_id"))
      .distinct()
    cand
      .join(docs.select(col("doc_id").as("delta_id"), col("sh").as("sh_x")),
        "delta_id")
      .join(docs.select(col("doc_id").as("corpus_id"), col("sh").as("sh_y")),
        "corpus_id")
      .select(col("delta_id"), col("corpus_id"),
        hashedJaccard(col("sh_x"), col("sh_y")).as("jaccard"))
      .where(col("jaccard") >= tau)
  }

  // -- incremental dedup -----------------------------------------------

  /** Corpus/delta split shared by d6/d7: even-numbered sources are
    * the standing corpus, odd-numbered the incoming delta. (An
    * earlier revision split on a literal 'srcA' shard that does not
    * exist in the fixture — the "corpus" was empty, so the anti-join
    * and the cross-set near-dup search were vacuous; the planted
    * near-dups are cross-source, so this split puts real pairs
    * across the boundary.)
    */
  private def isCorpusSource(source: Column): Column =
    substring(source, 4, 10).cast(IntegerType) % 2 === 0

  /** Incremental dedup: admit only delta documents that are not
    * exact duplicates of the existing corpus OR of an earlier delta
    * row — the production shape of dedup (a daily batch dedups
    * against the corpus digest index; nobody re-dedups 100 TB per
    * ingest). Corpus membership is only ever touched as a digest:
    * one LEFT ANTI join on the hash (the corpus side ships only its
    * digest column), then a first-wins pass within the delta.
    * Fixture note: the synthetic corpus has no exact duplicates at
    * all (d1 shows every group at size 1), so the anti-join drops
    * nothing here — the oracle still certifies the join semantics
    * on both engines, and d7 is the variant with non-vacuous hits.
    */
  def d6IncrementalDedup(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
      .select(col("doc_id"), col("source"),
        md5(col("text").cast(BinaryType)).as("h"))
    val corpus = docs.where(isCorpusSource(col("source")))
    val delta = docs.where(!isCorpusSource(col("source")))
    delta
      .join(corpus.select(col("h")), Seq("h"), "left_anti")
      .groupBy(col("h"))
      .agg(min(col("doc_id")).as("admit_id"),
        count(lit(1)).as("n_delta_copies"))
      .orderBy(col("admit_id"))
  }

  // -- dedup clusters (connected components) ---------------------------

  /** Connected components by iterative min-label propagation: each
    * node starts labeled with itself; every round each node takes
    * the min of its own and its neighbors' labels; stop at fixpoint.
    * The driver loop carries only a scalar convergence count per
    * round — the label state itself never leaves the cluster, and
    * each round is one shuffle join (Pregel shape). Converges in
    * ≤ diameter rounds; dedup-graph components are near-cliques
    * (diameter ~1-2), so the cap is generous. At extreme scale the
    * round count is cut further by the alternating large-star/
    * small-star contraction (Kiveris et al., "Connected Components
    * in MapReduce and Beyond"); plain propagation keeps the judged
    * plan simple and is exact regardless.
    */
  /** Loop telemetry for [[connectedComponentsWithStats]]: rounds run
    * and convergence probes issued (each probe is a blocking driver
    * round-trip — the spec pins the cadence).
    */
  private[graft] final case class CcStats(rounds: Int, probes: Int)

  def connectedComponents(edges: DataFrame, maxIters: Int = 50,
      probeEvery: Int = 2, reliable: Boolean = false): DataFrame =
    connectedComponentsWithStats(edges, maxIters, probeEvery, reliable)._1

  /** See [[connectedComponents]]; also returns loop telemetry.
    *
    * `reliable = true` switches the loop-carried state from
    * `localCheckpoint` to a RELIABLE `checkpoint()` on the configured
    * checkpoint dir (a temp dir is installed if none is set — a
    * cluster profile points it at the cluster FS). localCheckpoint
    * blocks are unreplicated and non-recomputable, so on a real
    * cluster any executor loss mid-loop kills the job; reliable
    * checkpoints survive executor loss at the cost of a FS write per
    * round. The judged d5 runs the reliable path — it is the shape
    * that survives at 100 TB, and it keeps the bench log free of
    * Spark's "cannot be recomputed after unpersisting" warning.
    *
    * `probeEvery` sets the convergence-probe cadence: min-label
    * propagation is monotone, so running an extra round past the
    * fixpoint is harmless, and probing every k-th round trades at
    * most k−1 cheap extra joins for k× fewer blocking driver
    * round-trips — a win on any graph whose diameter is not tiny.
    */
  private[graft] def connectedComponentsWithStats(
      edges: DataFrame, maxIters: Int = 50,
      probeEvery: Int = 2, reliable: Boolean = false): (DataFrame, CcStats) = {
    require(probeEvery >= 1, s"probeEvery must be >= 1, got $probeEvery")
    // Materializing each round truncates lineage: without it labels_i
    // references labels_{i-1} up to three times (neighbor join, left
    // join, probe), the logical plan doubles per round, and every
    // probe re-executes the whole upstream edge pipeline.
    val sc = edges.sparkSession.sparkContext
    if (reliable && sc.getCheckpointDir.isEmpty)
      sc.setCheckpointDir(
        java.nio.file.Files.createTempDirectory("graft-cc-ckpt").toString)
    // local path: track each checkpoint's storage blocks so superseded
    // rounds can be freed deterministically (otherwise blocks live
    // until nondeterministic GC and a deep chain holds every round's
    // label table at once). Reliable path: rounds live as checkpoint
    // FILES, cleaned with the checkpoint dir / by the context cleaner
    // — nothing to unpersist, which is also what silences the
    // localCheckpoint unpersist warning.
    def checkpointTracked(df: DataFrame): (DataFrame, Set[Int]) =
      if (reliable) (df.checkpoint(), Set.empty)
      else {
        val before = sc.getPersistentRDDs.keySet.toSet
        val ck = df.localCheckpoint()
        (ck, sc.getPersistentRDDs.keySet.toSet -- before)
      }
    def free(ids: Set[Int]): Unit =
      ids.foreach(id => sc.getPersistentRDDs.get(id).foreach(_.unpersist(false)))
    val (undirected, undirectedIds) = checkpointTracked(
      edges.select(col("a").as("src"), col("b").as("dst"))
        .union(edges.select(col("b").as("src"), col("a").as("dst"))))
    val nodes = undirected.select(col("src").as("node")).distinct()
    var (labels, labelIds) = checkpointTracked(
      nodes.select(col("node"), col("node").as("lbl")))
    var iter = 0
    var probes = 0
    var converged = false
    while (!converged && iter < maxIters) {
      val nbrMin = undirected.join(labels, col("src") === col("node"))
        .groupBy(col("dst")).agg(min(col("lbl")).as("nbr_min"))
      val (next, nextIds) = checkpointTracked(
        labels.join(nbrMin, col("node") === col("dst"), "left")
          .select(col("node"),
            least(col("lbl"), coalesce(col("nbr_min"), col("lbl"))).as("lbl")))
      // scalar convergence probe — O(1) driver traffic, issued only on
      // the cadence (and always on the final permitted round, so the
      // non-convergence guard can't be skipped past)
      if (iter % probeEvery == probeEvery - 1 || iter == maxIters - 1) {
        converged = next.as("n").join(labels.as("o"),
          col("n.node") === col("o.node") && col("n.lbl") =!= col("o.lbl"))
          .isEmpty
        probes += 1
      }
      // the previous round is fully consumed (next materialized,
      // probe done) — free its blocks; at most 2 label copies live
      free(labelIds)
      labels = next
      labelIds = nextIds
      iter += 1
    }
    free(undirectedIds) // labels is materialized; edges no longer needed
    // silent non-convergence would return wrong cluster ids; a graph
    // needing > maxIters rounds must fail loudly instead
    if (!converged)
      throw new IllegalStateException(
        s"connectedComponents did not converge in $maxIters rounds")
    (labels, CcStats(iter, probes))
  }

  /** Alternating large-star/small-star connected components (Kiveris
    * et al., "Connected Components in MapReduce and Beyond",
    * SoCC'14) — the extreme-scale alternative to plain min-label
    * propagation: converges in O(log² n) rounds on ANY graph
    * (propagation needs diameter rounds, fatal on a 10⁶-hop chain),
    * because each round contracts whole stars instead of moving
    * labels one hop.
    *
    * Round shape: per node u with neighborhood Γ(u),
    * m = min(Γ(u) ∪ {u});
    *  - large-star rewires every LARGER neighbor to m:
    *    {(v, m) : v ∈ Γ(u), v > u};
    *  - small-star rewires the smaller-or-equal ones:
    *    {(v, m) : v ∈ Γ(u) ∪ {u}, v ≤ u, v ≠ m}.
    * Both are one groupBy over the edge list (the min is a window
    * over the grouped neighborhood — here a join against the per-node
    * min), and the edge list is the ONLY loop-carried state. At
    * fixpoint every surviving edge is (node → component root).
    *
    * The same checkpoint-per-round / probe-cadence regime as the
    * propagation builder applies; `reliable` has the same meaning.
    * d5 keeps plain propagation (dedup graphs are near-cliques,
    * diameter ≲ 2 — propagation is fewer shuffles there); this
    * builder is for graphs whose diameter is unknown or large, and
    * ConnectedComponentsSpec proves the two agree on every shape.
    */
  private[graft] def connectedComponentsAlternating(
      edges: DataFrame, maxIters: Int = 50,
      reliable: Boolean = false): DataFrame = {
    val sc = edges.sparkSession.sparkContext
    if (reliable && sc.getCheckpointDir.isEmpty)
      sc.setCheckpointDir(
        java.nio.file.Files.createTempDirectory("graft-cc-ckpt").toString)
    def materialize(df: DataFrame): (DataFrame, Set[Int]) =
      if (reliable) (df.checkpoint(), Set.empty)
      else {
        val before = sc.getPersistentRDDs.keySet.toSet
        val ck = df.localCheckpoint()
        (ck, sc.getPersistentRDDs.keySet.toSet -- before)
      }
    def free(ids: Set[Int]): Unit =
      ids.foreach(id => sc.getPersistentRDDs.get(id).foreach(_.unpersist(false)))
    // per-node symmetrized neighborhood min: m(u) = min(Γ(u) ∪ {u})
    def sym(e: DataFrame): DataFrame =
      e.select(col("u"), col("v"))
        .union(e.select(col("v").as("u"), col("u").as("v")))
    def withMin(e: DataFrame): DataFrame = {
      val se = sym(e)
      se.join(
        se.groupBy(col("u")).agg(min(col("v")).as("nmin"))
          .select(col("u"), least(col("nmin"), col("u")).as("m")),
        "u")
    }
    var (cur, curIds) = materialize(
      edges.select(col("a").as("u"), col("b").as("v")).distinct())
    var iter = 0
    var converged = false
    while (!converged && iter < maxIters) {
      // large-star: every neighbor LARGER than u hooks onto m(u)
      val jl = withMin(cur)
      val large = jl.where(col("v") > col("u"))
        .select(col("v").as("u"), col("m").as("v"))
        .union(jl.select(col("u"), least(col("u"), col("m")).as("v"))) // keep u alive
        .distinct()
      val (largeCk, largeIds) = materialize(large)
      // NOTE cur's blocks stay live here: the convergence probe below
      // still reads them (freeing before a read of a localCheckpoint
      // is the non-recomputable-lineage trap)
      // small-star: the smaller-or-equal neighbors (and u itself)
      // hook onto m(u)
      val js = withMin(largeCk)
      val small = js.where(col("v") <= col("u"))
        .select(col("v").as("u"), col("m").as("v"))
        .union(js.select(col("u"), col("m").as("v")))
        .distinct()
      val (next, nextIds) = materialize(small)
      free(largeIds)
      // fixpoint = the (set-valued) edge list is unchanged
      converged = next.as("n").join(cur.as("o"),
          col("n.u") === col("o.u") && col("n.v") === col("o.v"), "full_outer")
        .where(col("n.u").isNull || col("o.u").isNull)
        .isEmpty
      free(curIds) // probe done — previous round's blocks now dead
      cur = next
      curIds = nextIds
      iter += 1
    }
    if (!converged)
      throw new IllegalStateException(
        s"connectedComponentsAlternating did not converge in $maxIters rounds")
    // at fixpoint the graph is a union of stars rooted at each
    // component min: label = min over the symmetrized neighborhood
    withMin(cur).select(col("u").as("node"), col("m").as("lbl")).distinct()
  }

  /** d4's pair set via the d7 count-aggregation plan — IDENTICAL
    * rows to [[d4PairsPrefix]] (PipelineOpsSpec asserts edge-set
    * equality), different physics: the same-source inverted join
    * feeds a partial count aggregate, exact Jaccard from counts, no
    * distinct/join-back/intersection. The flat-vocabulary route of
    * [[d4Pairs]] (see d7's plan note for the cost mirror-image).
    */
  private[graft] def d4PairsCountAgg(docs: DataFrame): DataFrame = {
    val tau = 0.5
    val exploded = docs.select(col("doc_id"), col("source"),
      size(col("sh")).as("n_sh"), explode(col("sh")).as("shingle"))
    exploded.as("x").join(exploded.as("y"),
        col("x.source") === col("y.source") &&
          col("x.shingle") === col("y.shingle") &&
          col("x.doc_id") < col("y.doc_id") &&
          col("x.n_sh") * tau <= col("y.n_sh") &&
          col("y.n_sh") * tau <= col("x.n_sh"))
      .groupBy(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"),
        col("x.n_sh").as("nx"), col("y.n_sh").as("ny"))
      .agg(count(lit(1)).as("ovl"))
      .select(col("doc_a"), col("doc_b"),
        (col("ovl").cast(DoubleType) /
          (col("nx") + col("ny") - col("ovl")).cast(DoubleType)).as("jaccard"))
      .where(col("jaccard") >= tau)
  }

  /** Near-dup clusters: exact-duplicate pairs (same content hash) ∪
    * 2-gram-Jaccard pairs (d4), collapsed into components; cluster
    * id = the minimum doc_id in the component — the canonical-doc
    * choice a dedup pipeline keeps. Oracle: the same edge set fed
    * through a DuckDB recursive CTE doing the same min-label
    * reachability — two independent component algorithms agreeing.
    */
  def d5DedupClusters(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
      .select(col("doc_id"), md5(col("text").cast(BinaryType)).as("h"))
    // STAR edges, not the clique self-join: identical-text groups of
    // size k would emit k²/2 edges (one 100k-copy boilerplate doc —
    // the exact case exact-dedup exists for — is ~5e9 rows from one
    // hash group, and the blowup is output cardinality, beyond AQE's
    // help). Connecting every member to the group minimum gives k
    // edges and the identical connected components.
    val hubs = docs.groupBy(col("h")).agg(min(col("doc_id")).as("hub"))
    val exactPairs = docs.join(hubs, "h")
      .where(col("doc_id") =!= col("hub"))
      .select(col("hub").as("a"), col("doc_id").as("b"))
    val jacPairs = d4Pairs(s, d)
      .select(col("doc_a").as("a"), col("doc_b").as("b"))
      // (jaccard dropped — d5 needs only the edge set; the routed
      // plan picks the cheap physics for the corpus profile)
    val edges = exactPairs.union(jacPairs).distinct()
    // reliable state: the judged plan is the one that survives
    // executor loss at cluster scale (see connectedComponentsWithStats)
    connectedComponents(edges, reliable = true)
      .select(col("node").as("doc_id"), col("lbl").as("cluster_id"))
      .orderBy(col("doc_id"))
  }

  /** d8: cluster canonicalization — the decision step that ENDS a
    * dedup pipeline: for every near-dup cluster (d5's components),
    * keep exactly one representative — the longest text, ties to the
    * smallest doc_id — and count what gets dropped. The argmax is one
    * `max(struct(len, -doc_id))` per cluster (partial-agg friendly,
    * no window sort); at 100 TB the expensive part is d5's component
    * labels, and this adds one broadcast-size join + one hash
    * aggregate on top. Deterministic by construction: the struct
    * ordering is total because doc_id is unique.
    */
  def d8ClusterCanonicalize(s: SparkSession, d: String): DataFrame = {
    val lens = Tables.documents(s, d)
      .select(col("doc_id"), length(col("text")).as("text_len"))
    d5DedupClusters(s, d)
      .join(lens, "doc_id")
      .groupBy(col("cluster_id"))
      .agg(
        max(struct(col("text_len"), (-col("doc_id")).as("neg_id"))).as("best"),
        count(lit(1)).as("n_members"))
      .select(col("cluster_id"),
        (-col("best.neg_id")).as("kept_id"),
        col("best.text_len").as("kept_len"),
        col("n_members"),
        (col("n_members") - 1L).as("n_dropped"))
      .orderBy(col("cluster_id"))
  }

  // -- substring-level dedup (duplicated passages) ---------------------

  /** d9: cross-document duplicated-PASSAGE detection at k-token
    * granularity (Lee et al. 2022, "Deduplicating Training Data
    * Makes Language Models Better" — the ~50-token span dedup every
    * large curation run applies after document-level dedup, because
    * boilerplate passages recur inside otherwise-distinct documents).
    * k = 8 tokens here so the synthetic corpus's planted overlapping
    * passages surface.
    *
    * Shape, all shuffle-bounded by REAL duplication, never the
    * corpus:
    *  1. hashed k-gram index: per doc, one 64-bit hash per token
    *     position (positions kept — unlike d4's set semantics, span
    *     coalescing needs them);
    *  2. hot-gram guard (the Lee et al. recipe, IMPLEMENTED, not
    *     assumed): per-gram posting counts via one partial-agg
    *     count, then grams above `maxPostings` corpus-wide
    *     occurrences drop from the index BEFORE the join — a
    *     super-frequent boilerplate gram ("all rights reserved...")
    *     otherwise fans out df² candidate rows and the self-join
    *     explodes quadratically on exactly the corpora this
    *     operator exists for. Spans through a dropped gram split —
    *     a conservative under-count, the trade Lee et al. make;
    *  3. candidate hits = self equi-join on the gram hash (the only
    *     corpus-wide shuffle; per-gram fan-out now ≤ maxPostings²
    *     by construction);
    *  4. span coalescing: hits on one (pair, DIAGONAL pa−pb) with
    *     consecutive positions are one duplicated span — a lag
    *     window per (pair, diag) partition, whose state is bounded
    *     by the longer document's token count (KB), never the
    *     corpus;
    *  5. per-pair rollup: span count, duplicated gram count, longest
    *     span in tokens.
    * No suffix array is ever materialized. Oracle: DuckDB replays
    * the whole pipeline — INCLUDING the posting cap — on gram
    * STRINGS (hash-collision probability |grams|²/2⁶⁴ — negligible,
    * and the hash gate would catch it).
    */
  def d9SubstringDedup(s: SparkSession, d: String): DataFrame =
    substringSpans(
      Tables.documents(s, d).select(col("doc_id"), col("text")), 8,
      D9MaxPostings)
      .orderBy(col("doc_a"), col("doc_b"))

  /** d9's judged posting cap: a gram occurring in more than this
    * many positions corpus-wide is boilerplate, not a passage worth
    * attributing — mirrored verbatim in the DuckDB oracle.
    */
  private[graft] val D9MaxPostings = 16

  /** d9's span pipeline on any (doc_id, text) frame — shared with the
    * spec's blocked-vs-brute-force equivalence proof and the
    * hot-gram fan-out spec. `maxPostings` bounds the candidate join:
    * a gram's posting list longer than this drops entirely (its
    * cross-doc fan-out would be quadratic in the list length).
    */
  /** The shared candidate stage of d9/d10: hot-gram-capped positional
    * k-gram hits, one row per (doc_a < doc_b, pa, diag). `pb` (the
    * gram's start in doc_b) = pa − diag.
    */
  private def substringHits(docs: DataFrame, k: Int,
      maxPostings: Int): DataFrame = {
    val toks = split(trim(col("text")), "\\s+")
    val grams = docs
      .select(col("doc_id"), toks.as("toks"))
      .where(size(col("toks")) >= k)
      .select(col("doc_id"),
        posexplode(transform(sequence(lit(0), size(col("toks")) - k),
          p => xxhash64(concat_ws(" ", slice(col("toks"), p + 1, lit(k))))))
          .as(Seq("p", "gh")))
    // hot-gram guard: one count aggregate (partial-agg friendly — the
    // map side collapses each partition's repeats before the shuffle),
    // anti-join the rare survivors. NOT a broadcast hint: the hot set
    // is usually tiny but adversarially unbounded (every gram of a
    // pathological corpus could be hot), so the plan must stay a
    // shuffle join when it is not — AQE picks broadcast at runtime
    // when the measured size allows.
    val hot = grams.groupBy(col("gh"))
      .agg(count(lit(1)).as("postings"))
      .where(col("postings") > maxPostings)
      .select(col("gh"))
    val kept = grams.join(hot, Seq("gh"), "left_anti")
    kept.as("x").join(kept.as("y"),
        col("x.gh") === col("y.gh") && col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"),
        col("x.p").as("pa"), (col("x.p") - col("y.p")).as("diag"))
  }

  private[graft] def substringSpans(docs: DataFrame, k: Int,
      maxPostings: Int): DataFrame = {
    val hits = substringHits(docs, k, maxPostings)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_a"), col("doc_b"), col("diag"))
      .orderBy(col("pa"))
    hits
      .withColumn("is_start",
        when(lag(col("pa"), 1).over(w) === col("pa") - 1, lit(0L))
          .otherwise(lit(1L)))
      .withColumn("span_id", sum(col("is_start")).over(w))
      .groupBy(col("doc_a"), col("doc_b"), col("diag"), col("span_id"))
      .agg(count(lit(1)).as("len"))
      .groupBy(col("doc_a"), col("doc_b"))
      .agg(count(lit(1)).as("n_spans"),
        sum(col("len")).as("n_dup_grams"),
        (max(col("len")) + (k - 1)).as("max_span_tokens"))
  }

  /** d10: duplicated-passage REMOVAL — the decision step d9's
    * detection exists for (Lee et al. 2022 cut one copy of every
    * duplicated ~50-token span; keeping both is the training-data
    * bug). Policy: the LATER document (higher doc_id, d1/d8's
    * keep-the-first convention) loses every token covered by a
    * duplicated gram occurrence; the earlier copy survives intact.
    * A document that is doc_a in one pair and doc_b in another loses
    * only its doc_b-side coverage.
    *
    * Shape: the d9 candidate stage (hot-gram-capped hits) →
    * doc_b-side gram starts (pb = pa − diag), distinct → explode the
    * k covered offsets, distinct again (rows ∝ REAL duplication × k,
    * never the corpus) → per-doc sorted coverage array (bounded by
    * one document's tokens — KB) → one higher-order `filter` drops
    * covered tokens in place, preserving order. No window over the
    * corpus, no driver-side text.
    *
    * Judged output: per affected doc, token counts before/after/
    * removed and the md5 of the cleaned text — the oracle rebuilds
    * the cleaned text independently in SQL, so a removal that cut
    * the wrong tokens (or reassembled out of order) flips the hash.
    */
  def d10SpanRemoval(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d).select(col("doc_id"), col("text"))
    val k = 8
    val covered = substringHits(docs, k, D9MaxPostings)
      .select(col("doc_b").as("doc_id"),
        (col("pa") - col("diag")).as("pb"))
      .distinct()
      .select(col("doc_id"),
        explode(sequence(col("pb"), col("pb") + (k - 1))).as("pos"))
      .distinct()
      .groupBy(col("doc_id"))
      .agg(array_sort(collect_list(col("pos"))).as("covered"))
    docs.join(covered, Seq("doc_id")) // inner: only affected docs
      .select(col("doc_id"),
        split(trim(col("text")), "\\s+").as("toks"), col("covered"))
      .select(col("doc_id"),
        size(col("toks")).cast("long").as("n_tokens"),
        size(col("covered")).cast("long").as("n_removed"),
        // a FULLY covered doc (an exact duplicate on the losing side)
        // cleans to nothing: null hash, matching SQL's empty string_agg
        when(size(col("covered")) === size(col("toks")), lit(null))
          .otherwise(md5(concat_ws(" ",
            zip_with(col("toks"),
              sequence(lit(0), size(col("toks")) - 1),
              (t, i) => when(array_contains(col("covered"), i), lit(null))
                .otherwise(t))))).as("cleaned_hash"))
      .withColumn("n_kept", col("n_tokens") - col("n_removed"))
      .select(col("doc_id"), col("n_tokens"), col("n_removed"),
        col("n_kept"), col("cleaned_hash"))
      .orderBy(col("doc_id"))
  }

  /** d5's component labels as reusable oracle SQL (no ORDER BY):
    * exact + Jaccard edges through a recursive-CTE reachability —
    * an independent CC algorithm. d5 judges it directly; d8 wraps it.
    */
  private val d5LabelsSql: String = """
      WITH RECURSIVE pairs AS (
        SELECT x.doc_id AS a, y.doc_id AS b
        FROM documents x JOIN documents y
          ON md5(x.text) = md5(y.text) AND x.doc_id < y.doc_id
        UNION
        SELECT a, b FROM (
          WITH t AS (
            SELECT doc_id, source,
                   regexp_split_to_array(trim(text), '\s+') AS toks
            FROM documents),
          s AS (
            SELECT doc_id, source,
                   list_distinct(list_transform(range(1, len(toks)),
                     i -> toks[i] || ' ' || toks[i+1])) AS sh
            FROM t WHERE len(toks) >= 2)
          SELECT p.doc_id AS a, q.doc_id AS b
          FROM s p JOIN s q ON p.source = q.source AND p.doc_id < q.doc_id
          WHERE CAST(len(list_intersect(p.sh, q.sh)) AS DOUBLE) /
                  CAST(len(p.sh) + len(q.sh) - len(list_intersect(p.sh, q.sh)) AS DOUBLE) >= 0.5)),
      edges AS (
        SELECT a AS src, b AS dst FROM pairs
        UNION ALL
        SELECT b AS src, a AS dst FROM pairs),
      walk(node, lbl) AS (
        SELECT src, src FROM edges
        UNION
        SELECT e.dst, w.lbl FROM walk w JOIN edges e ON e.src = w.node)
      SELECT node AS doc_id, min(lbl) AS cluster_id
      FROM walk
      GROUP BY node"""

  val queries: Seq[Q] = Seq(
    Q("d10_span_removal", d10SpanRemoval, Some("""
      WITH t AS (
        SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS toks
        FROM documents),
      g AS (
        SELECT doc_id, unnest(range(0, len(toks) - 7)) AS p, toks
        FROM t WHERE len(toks) >= 8),
      g2 AS (
        SELECT doc_id, p, array_to_string(toks[p+1:p+8], ' ') AS gram
        FROM g),
      g3 AS (
        SELECT doc_id, p, gram FROM (
          SELECT *, count(*) OVER (PARTITION BY gram) AS postings
          FROM g2)
        WHERE postings <= 16),
      starts AS (
        SELECT b.doc_id AS doc_id, b.p AS pb
        FROM g3 a JOIN g3 b
          ON a.gram = b.gram AND a.doc_id < b.doc_id
        GROUP BY 1, 2),
      cov AS (
        SELECT DISTINCT doc_id, pb + o.o AS pos
        FROM starts, (SELECT unnest(range(0, 8)) AS o) o),
      tokpos AS (
        SELECT doc_id, unnest(range(0, len(toks))) AS pos, toks
        FROM t
        WHERE doc_id IN (SELECT doc_id FROM cov)),
      kept AS (
        SELECT tp.doc_id, tp.pos, tp.toks[tp.pos + 1] AS tok
        FROM tokpos tp
        WHERE NOT EXISTS (SELECT 1 FROM cov
                          WHERE cov.doc_id = tp.doc_id
                            AND cov.pos = tp.pos)),
      cleaned AS (
        SELECT doc_id,
               md5(string_agg(tok, ' ' ORDER BY pos)) AS cleaned_hash,
               count(*) AS n_kept
        FROM kept GROUP BY doc_id),
      nrem AS (
        SELECT doc_id, count(*) AS n_removed FROM cov GROUP BY doc_id)
      SELECT t.doc_id,
             CAST(len(t.toks) AS BIGINT) AS n_tokens,
             CAST(n.n_removed AS BIGINT) AS n_removed,
             CAST(COALESCE(c.n_kept, 0) AS BIGINT) AS n_kept,
             c.cleaned_hash
      FROM t JOIN nrem n USING (doc_id) LEFT JOIN cleaned c USING (doc_id)
      ORDER BY t.doc_id""")),
    Q("d9_substring_dedup", d9SubstringDedup, Some("""
      WITH t AS (
        SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS toks
        FROM documents),
      g AS (
        SELECT doc_id, unnest(range(0, len(toks) - 7)) AS p, toks
        FROM t WHERE len(toks) >= 8),
      g2 AS (
        SELECT doc_id, p, array_to_string(toks[p+1:p+8], ' ') AS gram
        FROM g),
      g3 AS (
        SELECT doc_id, p, gram FROM (
          SELECT *, count(*) OVER (PARTITION BY gram) AS postings
          FROM g2)
        WHERE postings <= 16),
      hits AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
               a.p AS pa, a.p - b.p AS diag
        FROM g3 a JOIN g3 b
          ON a.gram = b.gram AND a.doc_id < b.doc_id),
      st AS (
        SELECT *, CASE WHEN lag(pa) OVER (PARTITION BY doc_a, doc_b, diag
                                          ORDER BY pa) = pa - 1
                       THEN 0 ELSE 1 END AS is_start
        FROM hits),
      sp AS (
        SELECT *, sum(is_start) OVER (PARTITION BY doc_a, doc_b, diag
                                      ORDER BY pa) AS span_id
        FROM st),
      spans AS (
        SELECT doc_a, doc_b, diag, span_id, count(*) AS len
        FROM sp GROUP BY 1, 2, 3, 4)
      SELECT doc_a, doc_b,
             count(*) AS n_spans,
             CAST(sum(len) AS BIGINT) AS n_dup_grams,
             CAST(max(len) + 7 AS BIGINT) AS max_span_tokens
      FROM spans
      GROUP BY doc_a, doc_b
      ORDER BY doc_a, doc_b""")),
    Q("d8_cluster_canonicalize", d8ClusterCanonicalize, Some(s"""
      WITH labels AS (SELECT * FROM ($d5LabelsSql) d5),
      j AS (
        SELECT l.cluster_id, l.doc_id,
               CAST(length(doc.text) AS INTEGER) AS text_len
        FROM labels l JOIN documents doc USING (doc_id)),
      r AS (
        SELECT *, row_number() OVER (PARTITION BY cluster_id
                 ORDER BY text_len DESC, doc_id) AS rk
        FROM j)
      SELECT cluster_id,
             max(CASE WHEN rk = 1 THEN doc_id END) AS kept_id,
             max(CASE WHEN rk = 1 THEN text_len END) AS kept_len,
             count(*) AS n_members,
             count(*) - 1 AS n_dropped
      FROM r
      GROUP BY cluster_id
      ORDER BY cluster_id""")),
    Q("d6_incremental_dedup", d6IncrementalDedup, Some("""
      WITH corpus AS (
        SELECT md5(text) AS h FROM documents
        WHERE CAST(substr(source, 4) AS INTEGER) % 2 = 0),
      delta AS (
        SELECT doc_id, md5(text) AS h FROM documents
        WHERE CAST(substr(source, 4) AS INTEGER) % 2 = 1)
      SELECT h, min(doc_id) AS admit_id, count(*) AS n_delta_copies
      FROM delta
      WHERE NOT EXISTS (SELECT 1 FROM corpus WHERE corpus.h = delta.h)
      GROUP BY h
      ORDER BY admit_id""")),
    Q("d5_dedup_clusters", d5DedupClusters,
      Some(s"$d5LabelsSql\n      ORDER BY doc_id")),
    Q("d1_exact_dedup", d1ExactDedup, Some("""
      SELECT md5(text) AS content_hash,
             min(doc_id) AS keep_id,
             count(*) AS n_copies
      FROM documents
      GROUP BY 1
      ORDER BY content_hash""")),
    Q("d7_incremental_neardup", d7IncrementalNearDup, Some("""
      WITH t AS (
        SELECT doc_id, source,
               regexp_split_to_array(trim(text), '\s+') AS toks
        FROM documents),
      s AS (
        SELECT doc_id, source,
               list_distinct(list_transform(range(1, len(toks)),
                 i -> toks[i] || ' ' || toks[i+1])) AS sh
        FROM t
        WHERE len(toks) >= 2)
      SELECT d.doc_id AS delta_id, c.doc_id AS corpus_id,
             CAST(len(list_intersect(d.sh, c.sh)) AS DOUBLE) /
               CAST(len(d.sh) + len(c.sh) - len(list_intersect(d.sh, c.sh)) AS DOUBLE) AS jaccard
      FROM s d JOIN s c
        ON CAST(substr(d.source, 4) AS INTEGER) % 2 = 1
       AND CAST(substr(c.source, 4) AS INTEGER) % 2 = 0
      WHERE CAST(len(list_intersect(d.sh, c.sh)) AS DOUBLE) /
              CAST(len(d.sh) + len(c.sh) - len(list_intersect(d.sh, c.sh)) AS DOUBLE) >= 0.5
      ORDER BY delta_id, corpus_id""")),
    // d2/d3 raw signatures depend on Spark's xxhash64 — not SQL
    // expressible — so their judged faces are recall/precision
    // CERTIFICATES against d4's exact set, which DuckDB replays on
    // raw string shingles (the e2/e4 graduation pattern).
    Q("d2_minhash_lsh", d2MinhashLshJudged, Some("""
      WITH t AS (
        SELECT doc_id, source,
               regexp_split_to_array(trim(text), '\s+') AS toks
        FROM documents),
      s AS (
        SELECT doc_id, source,
               list_distinct(list_transform(range(1, len(toks)),
                 i -> toks[i] || ' ' || toks[i+1])) AS sh
        FROM t
        WHERE len(toks) >= 2),
      exact AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
        FROM s a JOIN s b ON a.source = b.source AND a.doc_id < b.doc_id
        WHERE CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE) /
                CAST(len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))
                  AS DOUBLE) >= 0.5)
      SELECT doc_a, count(*) AS n_pairs,
             CAST(sum(doc_b) AS BIGINT) AS pair_sum,
             TRUE AS recall_ok, TRUE AS precision_ok
      FROM exact GROUP BY doc_a ORDER BY doc_a""")),
    Q("d3_simhash", d3SimhashJudged, Some("""
      WITH t AS (
        SELECT doc_id, source,
               regexp_split_to_array(trim(text), '\s+') AS toks
        FROM documents),
      s AS (
        SELECT doc_id, source,
               list_distinct(list_transform(range(1, len(toks)),
                 i -> toks[i] || ' ' || toks[i+1])) AS sh
        FROM t
        WHERE len(toks) >= 2),
      exact AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
        FROM s a JOIN s b ON a.source = b.source AND a.doc_id < b.doc_id
        WHERE CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE) /
                CAST(len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))
                  AS DOUBLE) >= 0.9)
      SELECT doc_a, count(*) AS n_pairs,
             CAST(sum(doc_b) AS BIGINT) AS pair_sum,
             TRUE AS recall_ok
      FROM exact GROUP BY doc_a ORDER BY doc_a""")),
    Q("d4_ngram_jaccard", d4NgramJaccard, Some("""
      WITH t AS (
        SELECT doc_id, source,
               regexp_split_to_array(trim(text), '\s+') AS toks
        FROM documents),
      s AS (
        SELECT doc_id, source,
               list_distinct(list_transform(range(1, len(toks)),
                 i -> toks[i] || ' ' || toks[i+1])) AS sh
        FROM t
        WHERE len(toks) >= 2)
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
             CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE) /
               CAST(len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh)) AS DOUBLE) AS jaccard
      FROM s a JOIN s b ON a.source = b.source AND a.doc_id < b.doc_id
      WHERE CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE) /
              CAST(len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh)) AS DOUBLE) >= 0.5
      ORDER BY doc_a, doc_b"""))
  )
}
