package graft.operators

/** Sizing calculator for the LSH family — the in-code prose rules
  * (bands vs τ, bits ≈ log₂(N/bucket), chunks vs distance) as
  * executable arithmetic, so a 100 TB deployment re-derives operator
  * parameters from (threshold, corpus size, recall target) instead of
  * by hand. LshParamsSpec pins the published formulas (S-curve,
  * arccos collision model, pigeonhole) and their monotonicity, and
  * asserts the shipped d2/d3/e2/e4 parameters agree with it.
  */
object LshParams {

  // -- MinHash banding (d2) --------------------------------------------

  /** P[some band collides] for a pair at Jaccard j under b bands × r
    * rows: 1 − (1 − j^r)^b — the standard S-curve.
    */
  def minhashRecall(bands: Int, rows: Int, jaccard: Double): Double =
    1.0 - math.pow(1.0 - math.pow(jaccard, rows), bands)

  /** S-curve midpoint (1/b)^(1/r): the Jaccard at which catch
    * probability ≈ 1 − 1/e. Must sit BELOW the emitted threshold or
    * boundary pairs are probabilistically missed (the round-1 d2 bug).
    */
  def minhashMidpoint(bands: Int, rows: Int): Double =
    math.pow(1.0 / bands, 1.0 / rows)

  /** Choose (bands, rows) for a signature of `numHashes`: the LARGEST
    * rows-per-band (widest bands admit the fewest false candidates —
    * verify cost falls with r) that still meets `targetRecall` at the
    * emitted threshold. Throws if no divisor qualifies: silently
    * shipping a lossy parameterization is the failure mode this
    * calculator exists to prevent.
    */
  def minhashBanding(numHashes: Int, tau: Double,
      targetRecall: Double = 0.98): (Int, Int) = {
    val ok = (1 to numHashes)
      .filter(numHashes % _ == 0)
      .map(r => (numHashes / r, r))
      .filter { case (b, r) => minhashRecall(b, r, tau) >= targetRecall }
    require(ok.nonEmpty,
      s"no (bands, rows) split of $numHashes hashes reaches recall " +
        s"$targetRecall at tau=$tau — add hashes or lower the target")
    ok.maxBy(_._2)
  }

  // -- random-hyperplane LSH (e2 / e4) ---------------------------------

  /** P[one hyperplane bit agrees] for a pair at cosine s:
    * 1 − arccos(s)/π (Goemans-Williamson / Charikar).
    */
  def hyperplaneCollisionProb(cos: Double): Double =
    1.0 - math.acos(cos) / math.Pi

  /** P[some table collides] for a pair at cosine s under
    * `tables` × `bits`: 1 − (1 − p(s)^bits)^tables.
    */
  def hyperplaneRecall(tables: Int, bits: Int, cos: Double): Double =
    1.0 - math.pow(1.0 - math.pow(hyperplaneCollisionProb(cos), bits), tables)

  /** Tables needed to reach `targetRecall` at cosine threshold `cos`
    * with `bits` hyperplanes per table.
    */
  def hyperplaneTables(bits: Int, cos: Double, targetRecall: Double): Int = {
    val pTable = math.pow(hyperplaneCollisionProb(cos), bits)
    require(pTable > 0.0 && pTable < 1.0, s"degenerate per-table prob $pTable")
    math.ceil(math.log1p(-targetRecall) / math.log1p(-pTable)).toInt
  }

  /** Bits per table sized so the EXPECTED bucket holds about
    * `targetBucket` vectors out of `n`: ⌈log₂(n / targetBucket)⌉.
    * Candidate-scan cost per query scales with bucket width, so this
    * is the knob that must be re-derived at the deployed N — 6 bits
    * is right for 2k vectors and catastrophically coarse for 2B.
    */
  def hyperplaneBits(n: Long, targetBucket: Long): Int = {
    require(n > 0 && targetBucket > 0 && n >= targetBucket,
      s"need n >= targetBucket > 0, got n=$n targetBucket=$targetBucket")
    math.max(1, math.ceil(math.log(n.toDouble / targetBucket) / math.log(2.0)).toInt)
  }

  // -- SimHash chunking (d3) -------------------------------------------

  /** Chunks for an EXACT recall guarantee at Hamming distance ≤ d:
    * d+1 (pigeonhole — d differing bits cannot touch all d+1 chunks;
    * Manku et al., WWW'07). Fewer chunks silently lose recall — the
    * round-1 d3 bug.
    */
  def simhashChunks(maxHamming: Int): Int = maxHamming + 1

  /** Bits per chunk for a `sigBits`-bit signature: ⌊sigBits/(d+1)⌋.
    * Also the bucket-width bound: candidate generation scans
    * 2^(bits) buckets per chunk index — the inherent cost of the
    * exact guarantee; tighten by LOWERING d, never by dropping
    * chunks below d+1.
    */
  def simhashChunkBits(sigBits: Int, maxHamming: Int): Int = {
    val bits = sigBits / simhashChunks(maxHamming)
    require(bits >= 1,
      s"$sigBits-bit signature cannot guarantee distance $maxHamming")
    bits
  }
}
