package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{LshParams, Similarity}

/** Pins the SHIPPED operator parameters to the calculator — the
  * sizing rules are executable, so a parameter drifting away from its
  * derivation (the round-1 d2/d3 failure mode: hand-picked constants
  * with a false recall claim) breaks the build, not the recall.
  * Pure math, no Spark.
  */
class LshParamsSpec extends AnyFunSuite {

  test("d2: 32 hashes at tau=0.5 derive to 16 bands x 2 rows") {
    assert(LshParams.minhashBanding(32, 0.5) === ((16, 2)))
    // the r1-bug rule: the S-curve midpoint must sit BELOW the
    // emitted threshold, and recall at the threshold must clear 98%
    assert(LshParams.minhashMidpoint(16, 2) < 0.5)
    assert(LshParams.minhashRecall(16, 2, 0.5) >= 0.98)
    // the rejected r1 parameterization fails exactly this gate
    assert(LshParams.minhashMidpoint(8, 4) > 0.5)
    assert(LshParams.minhashRecall(8, 4, 0.5) < 0.5)
  }

  test("d3: exact Hamming<=8 over 63 bits derives to 9 chunks x 7 bits") {
    assert(LshParams.simhashChunks(8) === 9)
    assert(LshParams.simhashChunkBits(63, 8) === 7)
    // a 63-bit signature cannot guarantee distance 63 (0 bits/chunk)
    intercept[IllegalArgumentException] {
      LshParams.simhashChunkBits(63, 63)
    }
  }

  test("e2: bits per table = bucket rule, re-derived at the deployed N") {
    assert(LshParams.hyperplaneBits(2000L, 32L) === 6)
    assert(Similarity.e2Config(2000L) === ((8, 6)))
    // smaller corpora derive fewer bits (wider buckets, higher recall)
    assert(Similarity.e2Config(500L) === ((8, 4)))
    // degenerate corpora (n <= bucket target) clamp to 1 bit instead
    // of tripping the calculator's n >= targetBucket requirement
    assert(Similarity.e2Config(8L)._2 === 1)
    // the knob moves with N: 2B vectors at the same bucket width
    // need 26 bits, not 6 — why the rule is code, not prose
    assert(LshParams.hyperplaneBits(2L * 1000 * 1000 * 1000, 32L) === 26)
  }

  test("e4: 32 x 4-bit tables clear the 0.99 recall target at tau=0.35") {
    val (tables, bits) = Similarity.ndConfig
    assert(tables >= Similarity.ndTablesRequired,
      s"shipped $tables tables < required ${Similarity.ndTablesRequired}")
    assert(LshParams.hyperplaneRecall(tables, bits, Similarity.NdTau) >= 0.99)
    // documented production point (cosine >= 0.9, 12-bit tables):
    // MORE tables than the low-tau config (28 vs 32 is comparable),
    // but each bucket is 2^12 vs 2^4 selective, so expected candidate
    // work per vector (tables × N/2^bits) falls ~300×. This assertion
    // replaced a falsified "only a few 12-bit tables" guess — the
    // reason the sizing rule is executable, not prose.
    val prodTables = LshParams.hyperplaneTables(12, 0.9, 0.99)
    assert(prodTables === 28)
    val prodCost = prodTables / math.pow(2, 12)
    val fixtureCost = tables / math.pow(2, bits)
    assert(prodCost < fixtureCost / 100)
  }
}
