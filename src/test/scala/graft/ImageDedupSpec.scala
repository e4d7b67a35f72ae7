package graft

import graft.multimodal.ImageDedup

/** Perceptual-hash image dedup: the planted near-dup structure is
  * fully known (odd ids are +1-noise variants of the even base below
  * them), so recall, precision, and the hash's margins are all exact
  * assertions, not statistical ones.
  */
class ImageDedupSpec extends SparkTestBase {
  import spark.implicits._

  test("judged m8 recovers exactly the planted variant pairs") {
    val got = ImageDedup.m8ImagePhashDedup(spark, sf("sf0.001"))
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    val nDocs = graft.sources.Tables.documents(spark, sf("sf0.001")).count()
    val want = (0L until nDocs / 2).map(g => (2 * g, 2 * g + 1)).toSet
    assert(got === want,
      s"missing=${(want -- got).take(5)} spurious=${(got -- want).take(5)}")
  }

  test("hash margins: noise moves the hash by <= 6 bits, different images by far more") {
    val hashes = (0L until 100L)
      .map(id => id -> ImageDedup.aHash(ImageDedup.synthPpm(id)).get).toMap
    // noise margin: every variant within the emitted threshold
    (0L until 50L).foreach { g =>
      val d = java.lang.Long.bitCount(hashes(2 * g) ^ hashes(2 * g + 1))
      assert(d <= 6, s"variant pair $g at hamming $d")
    }
    // identity margin: distinct bases never under (or near) the
    // threshold — the worst cross-base pair stays well above it
    val cross = for {
      a <- 0L until 50L; b <- (a + 1) until 50L
    } yield java.lang.Long.bitCount(hashes(2 * a) ^ hashes(2 * b))
    assert(cross.min > 10, s"cross-base minimum hamming ${cross.min}")
  }

  test("undecodable payloads drop row-wise, never throw") {
    assert(ImageDedup.aHash(Array[Byte](1, 2, 3)).isEmpty)
    assert(ImageDedup.aHash("P6\n16 16\n255\n".getBytes("US-ASCII")).isEmpty)
    // too small to hold an 8x8 grid: rejected, not mis-hashed
    val tiny = "P6\n4 4\n255\n".getBytes("US-ASCII") ++ Array.fill(48)(7.toByte)
    assert(ImageDedup.aHash(tiny).isEmpty)
  }
}
