package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.sources.Tables
import graft.functions.TextFunctions._
import graft.Catalog.Q
import org.apache.spark.sql.graft.Bridge

/** Corpus-curation operators — the selection/hygiene stages of a
  * training-data pipeline that sit between per-row text analysis
  * (t1-t7) and dedup (d1-d7):
  *
  *  - c1: benchmark decontamination — flag training documents whose
  *    n-grams overlap a held-out evaluation set (the standard
  *    pre-training hygiene step: eval text leaking into training data
  *    inflates benchmark scores). The eval set is TINY relative to
  *    the corpus, so its distinct n-gram set broadcasts and the scan
  *    side never shuffles — at 100 TB this is one map-side pass plus
  *    one count aggregate keyed by doc.
  *  - s1: deterministic stratified sampling — an exact per-stratum
  *    fraction selected by content-hash rank, so the sample is
  *    reproducible across runs/engines and unbiased w.r.t. ingest
  *    order. One window per stratum (the shuffle key is the stratum
  *    — the same key a sharded corpus is already partitioned by).
  *  - s2: deterministic global shuffle — the training-order step.
  *    Position is (bucket, pos-within-bucket), NOT a single global
  *    row_number: a global window serializes onto one task, while
  *    bucketing by a hash prefix keeps the sort fully parallel and
  *    the reader contract (consume buckets in order) preserves
  *    determinism. This is how production pipelines shard epochs.
  */
object Curation {

  /** Sorted distinct hashed word n-grams (graft.plans.NgramHashes —
    * same kernel as d2-d7, so overlap counts are set-exact).
    */
  private def ngramHashes(text: org.apache.spark.sql.Column, n: Int) =
    Bridge.column(graft.plans.NgramHashes(Bridge.expression(text), n))

  /** Benchmark source: src0 plays the held-out eval set; everything
    * else is the training corpus under decontamination check.
    */
  private val BenchmarkSource = "src0"
  private val ContamNgram = 3

  /** c1: per training doc, the number of its distinct 3-grams that
    * appear anywhere in the benchmark set, and the contamination
    * flag. Exact (hashed 3-gram sets are per-doc distinct; the only
    * error source is 64-bit hash collision, which the string-space
    * oracle cross-checks). The benchmark n-gram set is broadcast:
    * eval suites are KBs-to-MBs while the corpus is the 100 TB side,
    * so the join adds no shuffle to the corpus scan; the one shuffle
    * is the per-doc hit count aggregate.
    */
  def c1Contamination(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
      .select(col("doc_id"), col("source"),
        ngramHashes(col("text"), ContamNgram).as("sh"))
    val bench = docs.where(col("source") === BenchmarkSource)
      .select(explode(col("sh")).as("g")).distinct()
    val train = docs.where(col("source") =!= BenchmarkSource)
    val hits = train
      .select(col("doc_id"), explode(col("sh")).as("g"))
      .join(broadcast(bench), Seq("g"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_contaminated"))
    train.select(col("doc_id"), size(col("sh")).as("n_ngrams"))
      .join(hits, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_ngrams"),
        coalesce(col("n_contaminated"), lit(0L)).as("n_contaminated"))
      .withColumn("contaminated", col("n_contaminated") > 0)
      .orderBy(col("doc_id"))
  }

  private val SampleFraction = 0.2

  /** s1: exact 20% per source stratum, chosen by md5(text) rank.
    * Content-hash ordering makes the sample a deterministic function
    * of the DATA (re-runs, re-partitions, and both engines agree),
    * and uncorrelated with ingest order or doc_id assignment. The
    * ceil guarantees every non-empty stratum contributes at least
    * one row, so rare domains are never silently dropped.
    */
  /** s5: deterministic train/val/test split — the assignment every
    * training pipeline needs to be a PURE FUNCTION of the document,
    * never of partitioning, row order, or a seed file: bucket =
    * content-derived hash mod 10 → 8/1/1 split. Membership is
    * row-local (one md5 per row, no shuffle beyond the per-split
    * aggregate), reproducible across engines (the oracle replays the
    * same md5 arithmetic), and STABLE UNDER APPENDS — a new document
    * lands in its split without moving any existing one, which is
    * what keeps eval sets frozen as a 100 TB corpus grows. The
    * hash is over doc_id, not text, so near-identical revisions of
    * one document stay in one split (no train/test leakage through
    * dedup-adjacent copies).
    */
  def s5HashSplit(s: SparkSession, d: String): DataFrame = {
    val bucket = conv(substring(
      md5(col("doc_id").cast("string").cast(BinaryType)), 1, 6), 16, 10)
      .cast(LongType) % 10
    val split = when(bucket < 8, "train")
      .when(bucket === 8, "val").otherwise("test")
    Tables.documents(s, d)
      .select(split.as("split"), col("doc_id"), col("n_chars"))
      .groupBy(col("split"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("doc_id")).as("sum_ids"),
        sum(col("n_chars")).as("sum_chars"))
      .orderBy(col("split"))
  }

  def s1StratifiedSample(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("source")).orderBy(col("h"), col("doc_id"))
    val wc = Window.partitionBy(col("source"))
    Tables.documents(s, d)
      .select(col("source"), col("doc_id"),
        md5(col("text").cast(BinaryType)).as("h"))
      .withColumn("samp_rank", row_number().over(w).cast(LongType))
      .withColumn("n_stratum", count(lit(1)).over(wc))
      .where(col("samp_rank") <= ceil(col("n_stratum") * SampleFraction))
      .select(col("source"), col("doc_id"), col("samp_rank"), col("n_stratum"))
      .orderBy(col("source"), col("samp_rank"))
  }

  /** s3: weighted domain mixing — the "data recipe" step: given
    * per-domain sampling weights (here: high-quality sources get 2×
    * the weight of the rest — any published mix table plugs in), take
    * a deterministic per-source quota proportional to weight, chosen
    * by the same content-hash rank as s1. This is how a 100 TB corpus
    * is rebalanced to a target mixture without a global shuffle: one
    * window per source shard, quota arithmetic broadcast as literals.
    * Weights are DATA (a tiny dim table at scale); here a literal map
    * keyed on the source's numeric suffix parity keeps the judged
    * query self-contained.
    */
  def s3DomainMix(s: SparkSession, d: String): DataFrame = {
    val baseFraction = 0.1
    // even-numbered sources are the "high-quality" domains: 2x weight
    val weight = when(substring(col("source"), 4, 10)
      .cast(IntegerType) % 2 === 0, 2.0).otherwise(1.0)
    val w = Window.partitionBy(col("source")).orderBy(col("h"), col("doc_id"))
    val wc = Window.partitionBy(col("source"))
    Tables.documents(s, d)
      .select(col("source"), col("doc_id"),
        md5(col("text").cast(BinaryType)).as("h"), weight.as("wt"))
      .withColumn("samp_rank", row_number().over(w).cast(LongType))
      .withColumn("n_stratum", count(lit(1)).over(wc))
      .where(col("samp_rank") <= ceil(col("n_stratum") * col("wt") * baseFraction))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_sampled"), max(col("n_stratum")).as("n_stratum"),
        max(col("wt")).as("weight"))
      .orderBy(col("source"))
  }

  private val AresM = 2147483647L // 2^31 − 1: hash modulus
  private val AresK = 100

  /** s4: weighted reservoir sampling (Efraimidis & Spirakis 2006,
    * A-Res) — sample [[AresK]] documents WITHOUT replacement with
    * inclusion probability ∝ weight, the principled form of "sample
    * more from the high-quality domains" (s3 rebalances per-domain
    * quotas; this draws one global weighted sample). Each doc gets
    * priority key u^(1/w) with u uniform in (0,1); the top-k keys
    * ARE the weighted sample. Scale shape: the key is row-local
    * arithmetic and top-k is a bounded TakeOrdered (per-partition
    * k-heaps, then one k-row merge) — one pass, no global sort, no
    * shuffle of the corpus, which is exactly why A-Res is the
    * distributed-sampling algorithm of record.
    *
    * Cross-engine exactness: u derives from the catalog's
    * SQL-replayable multiplicative hash, and weights are restricted
    * to {1, 2} so u^(1/w) is u or sqrt(u) — IEEE sqrt is correctly
    * rounded (bit-identical in every engine) where libm pow is not,
    * so the emitted keys hash-match DuckDB exactly. An arbitrary-
    * weight deployment would use pow and drop the key column from
    * the judged output.
    */
  def s4WeightedSample(s: SparkSession, d: String): DataFrame = {
    val u = (((col("doc_id") * lit(2654435761L)) % AresM + 1)
      .cast(DoubleType)) / lit((AresM + 1).toDouble)
    val wgt = when(substring(col("source"), 4, 10)
      .cast(IntegerType) % 2 === 0, 2L).otherwise(1L)
    Tables.documents(s, d)
      .select(col("doc_id"), col("source"), wgt.as("w"), u.as("u"))
      .select(col("doc_id"), col("source"), col("w"),
        when(col("w") === 2, sqrt(col("u"))).otherwise(col("u"))
          .as("ares_key"))
      .orderBy(col("ares_key").desc, col("doc_id"))
      .limit(AresK)
  }

  private val ShuffleBuckets = 64
  private val ShuffleSeed = "shuf42:"

  /** s2: deterministic global shuffle for training-epoch ordering.
    * Every doc gets a content-seeded shuffle key (md5 over seed ++
    * text), a bucket from the key's leading 16 bits, and a position
    * within its bucket. The reader consumes buckets 0..63 in order —
    * the total order is fully determined by (seed, data), and the
    * within-bucket sort parallelizes across the cluster instead of
    * funnelling a global row_number through one task. Reshuffling an
    * epoch = changing the seed literal.
    */
  def s2GlobalShuffle(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("bucket")).orderBy(col("shuffle_key"), col("doc_id"))
    Tables.documents(s, d)
      .select(col("doc_id"),
        md5(concat(lit(ShuffleSeed), col("text")).cast(BinaryType)).as("shuffle_key"))
      .withColumn("bucket",
        conv(substring(col("shuffle_key"), 1, 4), 16, 10).cast(LongType) % ShuffleBuckets)
      .withColumn("pos", row_number().over(w).cast(LongType))
      .select(col("bucket"), col("pos"), col("doc_id"), col("shuffle_key"))
      .orderBy(col("bucket"), col("pos"))
  }

  // 3-gram string shingles in DuckDB — the string-space twin of the
  // hashed NgramHashes sets (same tokenization: trim + \s+ split)
  private val sh3Sql = """
    list_distinct(list_transform(
      range(1, len(regexp_split_to_array(trim(text), '\s+')) - 1),
      i -> regexp_split_to_array(trim(text), '\s+')[i] || ' ' ||
           regexp_split_to_array(trim(text), '\s+')[i+1] || ' ' ||
           regexp_split_to_array(trim(text), '\s+')[i+2]))"""

  /** The CAPSTONE composition: four pipeline stages — quality filter
    * (t2's score), exact dedup (d1's min-id keep rule), stratified
    * sample (s1's content-hash rank), sequence packing (t5's
    * window-cumsum chunking) — chained into ONE judged frame with
    * the DuckDB oracle replaying the identical chain. Stage ORDER is
    * load-bearing and is what the oracle certifies: sample ranks are
    * computed over the filtered-and-deduped survivors, the pack
    * cumsum over the sampled set — so any cross-stage
    * nondeterminism, tie-break drift, or boundary disagreement
    * anywhere in the chain breaks the hash. (The dedup stage is a
    * certified pass-through on this corpus — it plants near-dups,
    * not exact ones — which the oracle proves rather than assumes.)
    * Plan shape: one documents scan; the dup-rank window shuffles on
    * the content hash, then the sample and pack windows SHARE the
    * source-key exchange; the final per-chunk aggregate is
    * partial-agg friendly. Nothing touches the driver.
    */
  def q80PipelineE2e(s: SparkSession, d: String): DataFrame = {
    val toks = tokens(col("text"))
    val scored = Tables.documents(s, d)
      .select(col("doc_id"), col("source"), col("text"))
      .withColumn("n_tokens", size(toks).cast(LongType))
      .withColumn("punct_ratio", charClassRatio(col("text"), "[.,;:!?]"))
      .withColumn("stopword_ratio",
        stopwordHits(toks).cast(DoubleType) /
          size(array_distinct(toks)).cast(DoubleType))
      .withColumn("quality_score",
        least(lit(1.0), col("stopword_ratio") * 4.0) *
          (lit(1.0) - least(lit(1.0), col("punct_ratio") * 10.0)))
      .where(col("quality_score") >= 0.25)
    val deduped = scored
      .withColumn("h", md5(col("text").cast(BinaryType)))
      .withColumn("dup_rank", row_number().over(
        Window.partitionBy(col("h")).orderBy(col("doc_id"))))
      .where(col("dup_rank") === 1)
    val wSamp = Window.partitionBy(col("source")).orderBy(col("h"), col("doc_id"))
    val wCnt = Window.partitionBy(col("source"))
    val sampled = deduped
      .withColumn("samp_rank", row_number().over(wSamp).cast(LongType))
      .withColumn("n_stratum", count(lit(1)).over(wCnt))
      .where(col("samp_rank") <= ceil(col("n_stratum") * 0.5))
    val wPack = Window.partitionBy(col("source")).orderBy(col("doc_id"))
    sampled
      .withColumn("cum_tokens", sum(col("n_tokens")).over(wPack))
      .withColumn("chunk_id", expr("(cum_tokens - n_tokens) div 256"))
      .groupBy(col("source"), col("chunk_id"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("chunk_tokens"))
      .orderBy(col("source"), col("chunk_id"))
  }

  val queries: Seq[Q] = Seq(
    Q("q80_pipeline_e2e", q80PipelineE2e, Some(s"""
      WITH scored AS (
        SELECT doc_id, source, text,
               CAST(len(regexp_split_to_array(trim(text), '\\s+')) AS BIGINT) AS n_tokens,
               CAST(length(text) - length(regexp_replace(text, '[.,;:!?]', '', 'g')) AS DOUBLE) /
                 CAST(length(text) AS DOUBLE) AS punct_ratio,
               CAST(len(list_intersect(list_distinct(regexp_split_to_array(trim(text), '\\s+')),
                    ['the','a','of','and','to','in','is','it','for','on',
                     'with','as','at','by','from','or','an','be','this','that'])) AS DOUBLE) /
                 CAST(len(list_distinct(regexp_split_to_array(trim(text), '\\s+'))) AS DOUBLE)
                 AS stopword_ratio
        FROM documents),
      filtered AS (
        SELECT doc_id, source, text, n_tokens FROM scored
        WHERE least(1.0, stopword_ratio * 4.0) *
              (1.0 - least(1.0, punct_ratio * 10.0)) >= 0.25),
      deduped AS (
        SELECT * FROM (
          SELECT doc_id, source, n_tokens, md5(text) AS h,
                 row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id)
                   AS dup_rank
          FROM filtered)
        WHERE dup_rank = 1),
      sampled AS (
        SELECT * FROM (
          SELECT doc_id, source, n_tokens,
                 row_number() OVER (PARTITION BY source ORDER BY h, doc_id)
                   AS samp_rank,
                 count(*) OVER (PARTITION BY source) AS n_stratum
          FROM deduped)
        WHERE samp_rank <= ceil(n_stratum * 0.5)),
      packed AS (
        SELECT source, n_tokens,
               (CAST(sum(n_tokens) OVER (PARTITION BY source ORDER BY doc_id)
                  AS BIGINT) - n_tokens) // 256 AS chunk_id
        FROM sampled)
      SELECT source, chunk_id,
             count(*) AS n_docs,
             CAST(sum(n_tokens) AS BIGINT) AS chunk_tokens
      FROM packed
      GROUP BY source, chunk_id
      ORDER BY source, chunk_id""")),
    Q("c1_contamination", c1Contamination, Some(s"""
      WITH s AS (
        SELECT doc_id, source, $sh3Sql AS sh
        FROM documents),
      b AS (
        SELECT DISTINCT unnest(sh) AS g FROM s WHERE source = '$BenchmarkSource'),
      hits AS (
        SELECT doc_id, count(*) AS n_contaminated
        FROM (SELECT doc_id, unnest(sh) AS g FROM s
              WHERE source <> '$BenchmarkSource') e
        JOIN b USING (g)
        GROUP BY 1)
      SELECT s.doc_id,
             CAST(len(s.sh) AS INTEGER) AS n_ngrams,
             CAST(coalesce(h.n_contaminated, 0) AS BIGINT) AS n_contaminated,
             coalesce(h.n_contaminated, 0) > 0 AS contaminated
      FROM s LEFT JOIN hits h ON s.doc_id = h.doc_id
      WHERE s.source <> '$BenchmarkSource'
      ORDER BY s.doc_id""")),
    Q("s5_hash_split", s5HashSplit, Some("""
      WITH b AS (
        SELECT doc_id, n_chars,
               CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 6))
                 AS BIGINT) % 10 AS bucket
        FROM documents)
      SELECT CASE WHEN bucket < 8 THEN 'train'
                  WHEN bucket = 8 THEN 'val' ELSE 'test' END AS split,
             count(*) AS n_docs,
             CAST(sum(doc_id) AS BIGINT) AS sum_ids,
             CAST(sum(n_chars) AS BIGINT) AS sum_chars
      FROM b
      GROUP BY 1
      ORDER BY 1""")),
    Q("s1_stratified_sample", s1StratifiedSample, Some(s"""
      WITH r AS (
        SELECT source, doc_id,
               row_number() OVER (PARTITION BY source
                                  ORDER BY md5(text), doc_id) AS rk,
               count(*) OVER (PARTITION BY source) AS n_stratum
        FROM documents)
      SELECT source, doc_id,
             CAST(rk AS BIGINT) AS samp_rank,
             CAST(n_stratum AS BIGINT) AS n_stratum
      FROM r
      WHERE rk <= ceil(n_stratum * $SampleFraction)
      ORDER BY source, samp_rank""")),
    Q("s3_domain_mix", s3DomainMix, Some("""
      WITH r AS (
        SELECT source, doc_id,
               -- CAST to DOUBLE: bare literals type as DECIMAL(2,1)
               -- in DuckDB, the catalog's last non-plain oracle
               -- output type (the q64/q69 HUGEINT lesson: exotic
               -- oracle types risk driver-side canonicalization
               -- drift that local fetchall masks)
               CAST(CASE WHEN CAST(substr(source, 4) AS INTEGER) % 2 = 0
                    THEN 2.0 ELSE 1.0 END AS DOUBLE) AS wt,
               row_number() OVER (PARTITION BY source
                                  ORDER BY md5(text), doc_id) AS rk,
               count(*) OVER (PARTITION BY source) AS n_stratum
        FROM documents)
      SELECT source,
             count(*) AS n_sampled,
             CAST(max(n_stratum) AS BIGINT) AS n_stratum,
             max(wt) AS weight
      FROM r
      WHERE rk <= ceil(n_stratum * wt * 0.1)
      GROUP BY source
      ORDER BY source""")),
    Q("s4_weighted_sample", s4WeightedSample, Some(s"""
      WITH k AS (
        SELECT doc_id, source,
               CASE WHEN CAST(substr(source, 4) AS INTEGER) % 2 = 0
                    THEN CAST(2 AS BIGINT) ELSE CAST(1 AS BIGINT) END AS w,
               CAST((doc_id * 2654435761) % $AresM + 1 AS DOUBLE)
                 / ${(AresM + 1).toDouble} AS u
        FROM documents)
      SELECT doc_id, source, w,
             CASE WHEN w = 2 THEN sqrt(u) ELSE u END AS ares_key
      FROM k
      ORDER BY ares_key DESC, doc_id
      LIMIT $AresK""")),
    Q("s2_global_shuffle", s2GlobalShuffle, Some(s"""
      WITH k AS (
        SELECT doc_id, md5('$ShuffleSeed' || text) AS shuffle_key
        FROM documents),
      b AS (
        SELECT doc_id, shuffle_key,
               CAST(CAST(('0x' || substr(shuffle_key, 1, 4)) AS INTEGER)
                    % $ShuffleBuckets AS BIGINT) AS bucket
        FROM k)
      SELECT bucket,
             CAST(row_number() OVER (PARTITION BY bucket
                                     ORDER BY shuffle_key, doc_id) AS BIGINT) AS pos,
             doc_id, shuffle_key
      FROM b
      ORDER BY bucket, pos"""))
  )
}
