package graft

import org.apache.spark.sql.functions._
import graft.operators.{Aggregates, Curation, TextAnalysis}

/** Behavioral gates for the curation/sampling operators and the new
  * scalar/statistical queries — the properties the oracle hash can't
  * express (planted-case recovery, permutation/partition laws,
  * closed-form vs builtin agreement).
  */
class CurationSpec extends SparkTestBase {

  private val dir = sf("sf0.001")

  private def writeDocs(rows: Seq[(Long, String, String, String, Long)]): String = {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("curation").toString
    rows.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    tmp
  }

  test("c1 flags exactly the doc sharing a 3-gram with the benchmark set") {
    import spark.implicits._
    // src0 = benchmark. doc 2 embeds a verbatim benchmark 3-gram
    // ("alpha beta gamma"); doc 3 shares only single words (every
    // 3-gram differs); doc 4 is disjoint.
    val tmp = writeDocs(Seq(
      (1L, "alpha beta gamma delta epsilon", "en", "src0", 30L),
      (2L, "intro words alpha beta gamma outro", "en", "src1", 34L),
      (3L, "alpha only beta solo gamma apart", "en", "src1", 32L),
      (4L, "totally unrelated content here", "en", "src2", 30L)))
    val got = Curation.c1Contamination(spark, tmp)
      .select("doc_id", "n_contaminated", "contaminated")
      .as[(Long, Long, Boolean)].collect()
      .map { case (k, v, f) => k -> ((v, f)) }.toMap
    assert(got(2L) === ((1L, true)), s"doc 2 should hit on 1 shared 3-gram: $got")
    assert(got(3L) === ((0L, false)), s"word overlap alone must not flag: $got")
    assert(got(4L) === ((0L, false)), got.toString)
    assert(!got.contains(1L), "benchmark docs must not appear in the output")
  }

  test("c1 is non-vacuous on the fixture and the benchmark set broadcasts") {
    val out = Curation.c1Contamination(spark, dir)
    val n = out.count()
    assert(n > 0, "no training docs scored")
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"benchmark n-gram set must broadcast:\n$plan")
  }

  test("s1 takes exactly ceil(20%) per stratum, deterministically") {
    import spark.implicits._
    val out = Curation.s1StratifiedSample(spark, dir)
    val perSource = out.groupBy("source")
      .agg(count(lit(1)).as("k"), max("n_stratum").as("n"))
      .as[(String, Long, Long)].collect()
    assert(perSource.nonEmpty)
    perSource.foreach { case (src, k, n) =>
      assert(k === math.ceil(n * 0.2).toLong, s"$src: took $k of $n")
    }
    // deterministic: a second run returns the identical sample
    val a = out.select("source", "doc_id").as[(String, Long)].collect().toSet
    val b = Curation.s1StratifiedSample(spark, dir)
      .select("source", "doc_id").as[(String, Long)].collect().toSet
    assert(a === b)
  }

  test("s2 is a permutation: every doc exactly once, buckets dense-ranked") {
    import spark.implicits._
    val docs = graft.sources.Tables.documents(spark, dir)
    val out = Curation.s2GlobalShuffle(spark, dir).cache()
    try {
      assert(out.count() === docs.count(), "shuffle must emit every doc once")
      assert(out.select("doc_id").distinct().count() === docs.count())
      // positions within each bucket are 1..k with no gaps
      val bad = out.groupBy("bucket")
        .agg(count(lit(1)).as("k"), max("pos").as("mx"), min("pos").as("mn"))
        .where(col("mx") =!= col("k") || col("mn") =!= 1)
        .count()
      assert(bad === 0, "per-bucket positions must be gap-free from 1")
      val range = out.agg(min("bucket"), max("bucket"))
        .as[(Long, Long)].head()
      assert(range._1 >= 0 && range._2 < 64)
    } finally { out.unpersist(); () }
  }

  test("s4 A-Res: top-k matches local recomputation; weights bias inclusion") {
    val df = graft.operators.Curation.s4WeightedSample(spark, dir)
    val got = df.collect().map(r =>
      (r.getLong(0), r.getString(1), r.getLong(2), r.getDouble(3))).toSeq
    assert(got.length === 100)
    // plan: bounded TakeOrdered, never a global sort of the corpus
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), s"global sort:\n$plan")
    // local recomputation with identical arithmetic must agree exactly
    val m = 2147483647L
    val docs = graft.sources.Tables.documents(spark, dir)
      .select("doc_id", "source").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val local = docs.map { case (id, src) =>
      val w = if (src.drop(3).toInt % 2 == 0) 2L else 1L
      val u = ((id * 2654435761L) % m + 1).toDouble / (m + 1).toDouble
      val key = if (w == 2) math.sqrt(u) else u
      (id, src, w, key)
    }.sortBy(t => (-t._4, t._1)).take(100).toSeq
    assert(got === local, "A-Res draw diverged from local recomputation")
    // the 2× weights must actually bias the draw: doubled-weight docs
    // (sqrt lifts u toward 1) should dominate the sample relative to
    // their corpus share
    val heavyShare = got.count(_._3 == 2L).toDouble / got.length
    val corpusShare = docs.count(d => d._2.drop(3).toInt % 2 == 0)
      .toDouble / docs.length
    assert(heavyShare > corpusShare,
      f"weighting had no effect: sample $heavyShare%.2f vs corpus $corpusShare%.2f")
  }

  test("s5 split is a pure row-local function: append-stable, ~80/10/10") {
    val full = Curation.s5HashSplit(spark, sf("sf0.001"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val n = full.values.sum
    // proportions track 8/1/1 within binomial noise on 1k docs
    assert(full("train").toDouble / n > 0.7 && full("train").toDouble / n < 0.9)
    assert(full.keySet === Set("train", "val", "test"))
    // membership depends on doc_id alone — recompute one doc's split
    // locally from the same md5 arithmetic and check it agrees with
    // the engine's assignment under a corpus-wide count identity
    import java.security.MessageDigest
    def local(id: Long): String = {
      val hex = MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.substring(0, 6)
      val b = java.lang.Long.parseLong(hex, 16) % 10
      if (b < 8) "train" else if (b == 8) "val" else "test"
    }
    val expect = (0L until n).map(local).groupBy(identity).map {
      case (k, v) => k -> v.size.toLong
    }
    assert(full === expect, "engine split disagrees with the pure function")
  }

  test("t7 separates a planted repetitive doc from a diverse one") {
    import spark.implicits._
    val tmp = writeDocs(Seq(
      (1L, Seq.fill(30)("spam ham").mkString(" "), "en", "src0", 240L),
      (2L, (1 to 60).map(i => s"w$i").mkString(" "), "en", "src0", 240L)))
    val got = TextAnalysis.t7Repetition(spark, tmp)
      .select("doc_id", "repetitive").as[(Long, Boolean)].collect().toMap
    assert(got(1L), "60 tokens over a 2-word vocabulary must flag")
    assert(!got(2L), "60 distinct tokens must not flag")
  }

  test("t12 bigram perplexity: hand-computed NLL on a 3-doc corpus; " +
      "a repeated phrase scores more likely than a novel one") {
    val dir2 = writeDocs(Seq(
      (1L, "a b a b", "en", "w", 7L),
      (2L, "a b a b", "en", "w", 7L),
      (3L, "a c", "en", "w", 3L)))
    val got = TextAnalysis.t12LmPerplexity(spark, dir2).collect()
    assert(got.map(_.getLong(0)).toSeq === Seq(1L, 2L, 3L))
    // corpus: unigrams a=5, b=4, c=1 -> V=3; positional bigrams:
    // (a,b)x4, (b,a)x2, (a,c)x1
    // doc1 positions: ab, ba, ab ->
    //   -ln(5/8) - ln(3/7) - ln(5/8), mean over 3
    val nllAb = -math.log((4 + 1.0) / (5 + 3))
    val nllBa = -math.log((2 + 1.0) / (4 + 3))
    val nllAc = -math.log((1 + 1.0) / (5 + 3))
    val d1 = got(0)
    assert(d1.getLong(1) === 3L)
    assert(math.abs(d1.getDouble(2) - (nllAb * 2 + nllBa) / 3) < 1e-12)
    val d3 = got(2)
    assert(d3.getLong(1) === 1L)
    assert(math.abs(d3.getDouble(2) - nllAc) < 1e-12)
    // the phrase the corpus repeats is more likely than the novel one
    assert(d1.getDouble(2) < d3.getDouble(2))
  }

  test("q43 closed form agrees with Spark's builtin corr/regr aggregates") {
    import spark.implicits._
    val ours = Aggregates.q43CorrRegression(spark, dir)
      .select("l_returnflag", "corr_xy", "slope", "intercept")
      .as[(String, Double, Double, Double)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4)).toMap
    val builtin = graft.sources.Tables.lineitem(spark, dir)
      .select(col("l_returnflag"),
        round(col("l_quantity")).cast("long").cast("double").as("x"),
        round(col("l_discount") * 100).cast("long").cast("double").as("y"))
      .groupBy("l_returnflag")
      .agg(corr(col("x"), col("y")).as("c"),
        regr_slope(col("y"), col("x")).as("m"),
        regr_intercept(col("y"), col("x")).as("b"))
      .as[(String, Double, Double, Double)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4)).toMap
    assert(ours.keySet === builtin.keySet)
    ours.foreach { case (flag, (c, m, b)) =>
      val (c2, m2, b2) = builtin(flag)
      assert(math.abs(c - c2) < 1e-9, s"$flag corr: $c vs $c2")
      assert(math.abs(m - m2) < 1e-9, s"$flag slope: $m vs $m2")
      assert(math.abs(b - b2) < 1e-9, s"$flag intercept: $b vs $b2")
    }
    // sanity: correlations are inside (-1, 1) and non-degenerate
    assert(ours.values.forall { case (c, _, _) => c.abs < 1.0 })
  }

  test("t9 BM25: self-retrieval tops, rare terms beat common, ties break on doc_id") {
    import spark.implicits._
    // doc 100 is the query (first 5 distinct tokens). zebra/fox/jumps
    // are rare; quick/brown appear in the six filler docs, whose
    // structurally-identical scores exercise the doc_id tie-break.
    val tmp = writeDocs(
      Seq(
        (100L, "zebra quick brown fox jumps", "en", "src0", 27L),
        (1L, "zebra lazy dog", "en", "src0", 14L)) ++
        (1 to 6).map(i =>
          (200L + i, s"quick brown pad$i", "en", "src1", 16L)))
    val got = TextAnalysis.t9Bm25Retrieval(spark, tmp)
      .select("query_id", "rank", "doc_id")
      .as[(Long, Long, Long)].collect().toSeq
    // query doc matches all 5 terms -> rank 1; the rare-zebra doc
    // beats every common-terms-only doc; the identical filler docs
    // come back in doc_id order
    assert(got === Seq(
      (100L, 1L, 100L), (100L, 2L, 1L),
      (100L, 3L, 201L), (100L, 4L, 202L), (100L, 5L, 203L)))
  }
}
