package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.operators.Dedup

/** The data-driven plan routing shared by d4 and d7: the probe must
  * send flat vocabularies to the count-aggregation plan and Zipfian
  * ones (a stop-bigram in a constant fraction of documents) to the
  * prefix-filtered plan — and the two plans must be EXACT twins,
  * byte-for-byte identical pairs, or routing would change answers.
  * (d4's plan pair is pinned the same way in PipelineOpsSpec.)
  */
class D7RoutingSpec extends SparkTestBase {

  private def shingled(rows: Seq[(Long, String, String)]): DataFrame = {
    import spark.implicits._
    Dedup.docShingles(rows.toDF("doc_id", "source", "text"))
  }

  // sources: substring(source, 4) % 2 — src1/src3 delta, src2/src4 corpus
  private val zipfFixture = shingled(Seq(
    // three planted cross-boundary near-dups (last word differs:
    // 5 shingles each, 4 shared, J = 4/6 = 0.667 >= 0.5)
    (1L, "src1", "the of red green blue yellow"),
    (2L, "src2", "the of red green blue purple"),
    (3L, "src1", "the of cyan teal navy white"),
    (4L, "src2", "the of cyan teal navy black"),
    (5L, "src3", "the of one two three four"),
    (6L, "src4", "the of one two three five"),
    // unrelated docs: share only the stop-bigram chain (J << 0.5)
    (7L, "src1", "the of aa bb cc dd"),
    (8L, "src2", "the of ee ff gg hh"),
    (9L, "src3", "the of ii jj kk ll"),
    (10L, "src4", "the of mm nn oo pp"),
    (11L, "src1", "the of qq rr ss tt"),
    (12L, "src2", "the of uu vv ww xx")))

  test("probe: flat vocabulary scores low, a stop-bigram corpus scores 1.0") {
    val flat = shingled((1L to 8L).map(i =>
      (i, s"src${i % 4 + 1}", s"w${i}a w${i}b w${i}c w${i}d")))
    assert(Dedup.hotShingleShare(flat) <= 0.2,
      "fully-distinct shingles must not look Zipfian")
    // "the of" appears in every document -> share 1.0
    assert(Dedup.hotShingleShare(zipfFixture) > Dedup.HotShareThreshold)
  }

  test("the judged corpus routes to count-agg (the measured plan)") {
    val docs = Dedup.docShingles(
      graft.sources.Tables.documents(spark, sf("sf0.001")))
    val share = Dedup.hotShingleShare(docs)
    assert(share <= Dedup.HotShareThreshold,
      s"fixture corpus now looks Zipfian (share $share) — the bench " +
        "plan changed; recalibrate SURVEY §8.6 if this is intended")
  }

  test("count-agg and prefix plans are exact twins on the Zipfian fixture") {
    def rows(df: DataFrame): Set[(Long, Long, Double)] =
      df.collect().map(r =>
        (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val a = rows(Dedup.d7CountAgg(zipfFixture, Dedup.D7Tau))
    val b = rows(Dedup.d7Prefix(zipfFixture, Dedup.D7Tau))
    assert(a === b, "routed plans diverge")
    // the three planted pairs, exactly — non-vacuous by construction
    assert(a.map(t => (t._1, t._2)) === Set((1L, 2L), (3L, 4L), (5L, 6L)))
    a.foreach { case (_, _, j) => assert(math.abs(j - 4.0 / 6.0) < 1e-12) }
  }

  test("prefix plan never joins on the hot shingle (the Zipfian guard's point)") {
    // with tau = 0.5 and 5 shingles per doc, each prefix holds the
    // ceil(5 - 2.5) + 1 = 3 RAREST shingles; "the of" (df = 12, the
    // max) can only be in a prefix if a doc has fewer rarer ones —
    // here every doc has 4 rarer shingles, so the hot shingle is
    // indexed nowhere and the candidate join stays linear
    val exploded = zipfFixture.select(col("doc_id"),
      size(col("sh")).as("n_sh"), explode(col("sh")).as("shingle"))
    val dfreq = exploded.groupBy(col("shingle")).agg(count(lit(1)).as("df"))
    val ranked = exploded.join(dfreq, "shingle")
      .withColumn("rnk", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col("doc_id"))
          .orderBy(col("df").asc, col("shingle").asc)))
    val prefix = ranked.where(
      col("rnk") <= col("n_sh") - ceil(col("n_sh") * Dedup.D7Tau) + 1)
    val hotInPrefix = prefix.join(
      dfreq.orderBy(desc("df")).limit(1).select(col("shingle")), "shingle")
    assert(hotInPrefix.count() === 0,
      "the hottest shingle leaked into a prefix index")
  }
}
