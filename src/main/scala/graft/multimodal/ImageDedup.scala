package graft.multimodal

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables
import graft.Catalog.Q

/** Image near-duplicate detection by perceptual hash — the multimodal
  * member of the dedup family (d1–d8 are text, e3/e4 embeddings; this
  * is the pixel tier): decode → 64-bit average-hash → pigeonhole
  * chunk blocking → exact Hamming verify, re-using d3's banding
  * discipline on a signature computed from DECODED PIXELS, so
  * re-encoded/slightly-noisy copies of the same image match even when
  * their bytes (and so d1's md5) differ completely.
  *
  * Average hash (the classic aHash): decode the raster, reduce to an
  * 8×8 grid of integer block sums (grayscale as r+g+b, so the whole
  * signature is exact integer arithmetic — no float rounding in the
  * judged path), emit bit k = blockSum·64 > rasterTotal. Small pixel
  * noise moves a handful of block sums slightly → Hamming distance
  * stays near 0; different images give independent bits → expected
  * distance ~32. Blocking: 8 chunks × 8 bits guarantee every pair at
  * distance ≤ 7 shares a chunk (pigeonhole, d3's argument); emitted
  * threshold 6 keeps a margin. First-match emission makes pairs
  * unique without a distinct shuffle, and the Hamming verify runs
  * row-locally before anything wide.
  *
  * Scale shape: decode+hash is map-only via mapPartitions (codec
  * state amortized per partition; payload bytes pruned the moment
  * the 8-byte signature exists — bytes never cross a shuffle); the
  * join is candidate-bounded by 8-bit buckets like d3.
  *
  * The judged fixture synthesizes one 16×16 P6 PPM per document id
  * (deterministic splitmix pixels; odd ids are a +1-noise variant of
  * the even base below them) and runs the REAL PPM parser
  * ([[MediaCodecs.parsePpm]]) — the decode in the judged path is the
  * same code the committed media fixtures gate. Rows-only (the
  * pipeline is not SQL-expressible); ImageDedupSpec pins exact
  * planted-pair recovery and the hash's noise/identity margins.
  */
object ImageDedup {

  private def mix(x0: Long): Long = { // splitmix64 finalizer
    var x = x0 + 0x9e3779b97f4a7c15L
    x = (x ^ (x >>> 30)) * 0xbf58476d1ce4e5b9L
    x = (x ^ (x >>> 27)) * 0x94d049bb133111ebL
    x ^ (x >>> 31)
  }

  /** Deterministic 16×16 P6 image for `docId`: base raster from
    * docId/2; odd ids perturb every 37th byte by +1 (clamped) — a
    * near-duplicate whose bytes differ but whose perceptual hash
    * barely moves.
    */
  def synthPpm(docId: Long): Array[Byte] = {
    val g = docId / 2
    val noisy = docId % 2 == 1
    val header = "P6\n16 16\n255\n".getBytes("US-ASCII")
    val out = new Array[Byte](header.length + 768)
    System.arraycopy(header, 0, out, 0, header.length)
    var i = 0
    while (i < 768) {
      var v = (mix(g * 1000003L + i) & 0xffL).toInt
      if (noisy && i % 37 == 0) v = math.min(255, v + 1)
      out(header.length + i) = v.toByte
      i += 1
    }
    out
  }

  /** 64-bit average hash of a P6 payload: 8×8 grid of block sums over
    * r+g+b, bit k set iff blockSum·64 > rasterTotal. Exact integer
    * arithmetic throughout. None for undecodable payloads (the
    * corrupt-input path drops rows, never throws — the MediaCodecs
    * contract).
    */
  def aHash(payload: Array[Byte]): Option[Long] =
    MediaCodecs.parsePpm(payload).collect {
      case (w, h, off) if w >= 8 && h >= 8 =>
        val sums = new Array[Long](64)
        var y = 0
        while (y < h) {
          val by = y * 8 / h
          var x = 0
          while (x < w) {
            val bx = x * 8 / w
            val p = off + (y * w + x) * 3
            sums(by * 8 + bx) +=
              (payload(p) & 0xff) + (payload(p + 1) & 0xff) +
                (payload(p + 2) & 0xff)
            x += 1
          }
          y += 1
        }
        val total = sums.sum
        var bits = 0L
        var k = 0
        while (k < 64) {
          if (sums(k) * 64 > total) bits |= (1L << k)
          k += 1
        }
        bits
    }

  private val MaxHamming = 6
  private val Chunks = 8 // 8 × 8-bit chunks: exact for Hamming ≤ 7
  private val ChunkBits = 8

  /** Signatures for the synthetic per-document images: synthesize,
    * decode with the real parser, hash — all in one map-only pass.
    */
  private def signatures(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, d).select(col("doc_id")).as[Long]
      .mapPartitions(_.flatMap { id =>
        aHash(synthPpm(id)).map(h => (id, h))
      })
      .toDF("doc_id", "ahash")
  }

  /** Judged query: every near-duplicate image pair at Hamming ≤ 6,
    * d3's chunk-blocked first-match join over the 64-bit signature.
    */
  def m8ImagePhashDedup(s: SparkSession, d: String): DataFrame = {
    val sigs = signatures(s, d)
    val chunks = sigs.select(col("doc_id"), col("ahash"),
      explode(array((0 until Chunks).map { k =>
        struct(lit(k).as("chunk_id"),
          shiftright(col("ahash"), k * ChunkBits)
            .bitwiseAND(0xff).as("chunk"))
      }: _*)).as("ck"))
      .select(col("doc_id"), col("ahash"),
        col("ck.chunk_id").as("chunk_id"), col("ck.chunk").as("chunk"))
    def chunkOf(sig: org.apache.spark.sql.Column, j: Int) =
      shiftright(sig, j * ChunkBits).bitwiseAND(0xff)
    val firstMatch = (0 until Chunks).map { j =>
      (col("x.chunk_id") <= j) ||
        (chunkOf(col("x.ahash"), j) =!= chunkOf(col("y.ahash"), j))
    }.reduce(_ && _)
    chunks.as("x").join(chunks.as("y"),
        col("x.chunk_id") === col("y.chunk_id") &&
          col("x.chunk") === col("y.chunk") &&
          col("x.doc_id") < col("y.doc_id") && firstMatch)
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"),
        bit_count(col("x.ahash").bitwiseXOR(col("y.ahash"))).as("hamming"))
      .where(col("hamming") <= MaxHamming)
      .orderBy(col("doc_a"), col("doc_b"))
  }

  /** The DuckDB twin of the whole pixel pipeline — synthPpm's
    * splitmix64 raster, the +1 noise, the 8×8 block aHash and the
    * Hamming pairs, re-derived in pure SQL so m8 rides the
    * rows+schema+hash gate like every text query. 64-bit wrapping
    * arithmetic runs on HUGEINT mod 2^64 with xor/mul done in 32-bit
    * limbs (DuckDB errors on BIGINT overflow and `**` is float);
    * `4294967296 = 2^32`, `18446744073709551616 = 2^64`, and the
    * three decimal constants are splitmix64's 0x9e3779b97f4a7c15,
    * 0xbf58476d1ce4e5b9, 0x94d049bb133111eb. The oracle emits ALL
    * distinct pairs at Hamming ≤ 6 from an open self-join — exactly
    * the Spark side's output, whose chunk blocking is lossless below
    * Hamming 8 by pigeonhole (first-match emission makes pairs
    * unique, so the sets coincide). MATERIALIZED keeps DuckDB from
    * re-expanding the stage chain exponentially.
    */
  private val m8Oracle: String = """
    WITH px0 AS MATERIALIZED (
      SELECT doc_id, (doc_id // 2) AS g, (doc_id % 2 = 1) AS noisy, i
      FROM documents
      CROSS JOIN (SELECT unnest(generate_series(0, 767)) AS i)
    ),
    st1 AS MATERIALIZED (
      SELECT doc_id, noisy, i,
        (CAST(g AS HUGEINT) * 1000003 + i + 11400714819323198485)
          % 18446744073709551616 AS s1
      FROM px0
    ),
    st2 AS MATERIALIZED ( -- s1 xor (s1 >> 30)
      SELECT doc_id, noisy, i,
        (CAST(xor(CAST(s1 // 4294967296 AS BIGINT),
                  CAST((s1 // 1073741824) // 4294967296 AS BIGINT))
              AS HUGEINT) * 4294967296
         + xor(CAST(s1 % 4294967296 AS BIGINT),
               CAST((s1 // 1073741824) % 4294967296 AS BIGINT))) AS a
      FROM st1
    ),
    st3 AS MATERIALIZED ( -- (a * C2) mod 2^64, 32-bit limb product
      SELECT doc_id, noisy, i,
        ((a % 4294967296) * 13787848793156543929
         + (((a // 4294967296) * 13787848793156543929) % 4294967296)
           * 4294967296) % 18446744073709551616 AS s2
      FROM st2
    ),
    st4 AS MATERIALIZED ( -- s2 xor (s2 >> 27)
      SELECT doc_id, noisy, i,
        (CAST(xor(CAST(s2 // 4294967296 AS BIGINT),
                  CAST((s2 // 134217728) // 4294967296 AS BIGINT))
              AS HUGEINT) * 4294967296
         + xor(CAST(s2 % 4294967296 AS BIGINT),
               CAST((s2 // 134217728) % 4294967296 AS BIGINT))) AS b
      FROM st3
    ),
    st5 AS MATERIALIZED ( -- (b * C3) mod 2^64
      SELECT doc_id, noisy, i,
        ((b % 4294967296) * 10723151780598845931
         + (((b // 4294967296) * 10723151780598845931) % 4294967296)
           * 4294967296) % 18446744073709551616 AS s3
      FROM st4
    ),
    vals AS MATERIALIZED ( -- v = (s3 xor (s3>>31)) & 0xff, +1 noise
      SELECT doc_id, i,
        CASE WHEN noisy AND i % 37 = 0
             THEN least(255, CAST(xor(CAST(s3 % 4294967296 AS BIGINT),
                    CAST((s3 // 2147483648) % 4294967296 AS BIGINT))
                    % 256 AS BIGINT) + 1)
             ELSE CAST(xor(CAST(s3 % 4294967296 AS BIGINT),
                    CAST((s3 // 2147483648) % 4294967296 AS BIGINT))
                    % 256 AS BIGINT)
        END AS v
      FROM st5
    ),
    blocks AS MATERIALIZED ( -- 8x8 block sums over r+g+b, pixel=i//3
      SELECT doc_id,
             ((i // 3) // 16 // 2) * 8 + ((i // 3) % 16 // 2) AS blk,
             sum(v) AS s
      FROM vals GROUP BY 1, 2
    ),
    sigs AS MATERIALIZED ( -- pack bit k = s*64 > total, two halves
      SELECT doc_id,
        CAST(raw - CASE WHEN raw >= 9223372036854775808
                        THEN 18446744073709551616 ELSE 0 END
             AS BIGINT) AS sig
      FROM (
        SELECT doc_id,
          CAST(sum(CASE WHEN s * 64 > total AND blk >= 32
                        THEN (CAST(1 AS BIGINT) << (blk - 32))
                        ELSE 0 END) AS HUGEINT) * 4294967296
          + sum(CASE WHEN s * 64 > total AND blk < 32
                     THEN (CAST(1 AS BIGINT) << blk) ELSE 0 END) AS raw
        FROM (
          SELECT doc_id, blk, s,
                 sum(s) OVER (PARTITION BY doc_id) AS total
          FROM blocks)
        GROUP BY doc_id)
    )
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           CAST(bit_count(xor(a.sig, b.sig)) AS INTEGER) AS hamming
    FROM sigs a JOIN sigs b ON a.doc_id < b.doc_id
    WHERE bit_count(xor(a.sig, b.sig)) <= 6"""

  val queries: Seq[Q] = Seq(
    Q("m8_image_phash_dedup", m8ImagePhashDedup, Some(m8Oracle)))
}
