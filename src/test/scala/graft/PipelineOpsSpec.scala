package graft

import org.apache.spark.sql.functions._
import graft.operators.{Dedup, Similarity}
import graft.functions.TextFunctions
import graft.multimodal.Multimodal

/** Quality/semantics tests for the training-data pipeline operators —
  * the properties an oracle hash can't express (LSH recall floors,
  * signature invariances, stub-decode plumbing).
  */
class PipelineOpsSpec extends SparkTestBase {

  private val dir = sf("sf0.001")

  test("d2 MinHash-LSH achieves full recall on exact >=0.5 Jaccard pairs") {
    import spark.implicits._
    // unblocked exact ground truth (feasible at sf0.001: 500 docs)
    val docs = graft.sources.Tables.documents(spark, dir)
      .select(col("doc_id"),
        TextFunctions.shingles2(TextFunctions.tokens(col("text"))).as("sh"))
      .where(size(col("sh")) > 0)
    val truth = docs.as("x").join(docs.as("y"), col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("a"), col("y.doc_id").as("b"),
        TextFunctions.jaccard(col("x.sh"), col("y.sh")).as("j"))
      .where(col("j") >= 0.5)
      .select("a", "b").as[(Long, Long)].collect().toSet
    val foundRows = Dedup.d2MinhashLsh(spark, dir)
      .select("doc_a", "doc_b").as[(Long, Long)].collect()
    val found = foundRows.toSet
    // first-match emission must yield each pair exactly once — a Set
    // comparison alone would mask duplicate rows
    assert(foundRows.length === found.size,
      s"d2 emitted ${foundRows.length - found.size} duplicate pairs")
    assert(truth.nonEmpty, "fixture has no near-dup pairs — test is vacuous")
    // measured recall floor, not a guaranteed property: 16 bands x 2
    // rows catches a pair AT the 0.5 boundary with p ≈ 0.990, so
    // full recall over all >=0.5 pairs is expected but not certain
    // under fixture drift
    val recall = truth.intersect(found).size.toDouble / truth.size
    info(f"d2 recall over >=0.5 pairs = $recall%.3f (${truth.size} true pairs)")
    assert(recall >= 0.9,
      s"LSH missed ${truth.diff(found).size} of ${truth.size} true pairs")
    // precision: everything reported really is >= 0.5 — truth is the
    // complete unblocked pair set, so found must be a subset of it
    assert(found.subsetOf(truth),
      s"d2 reported ${found.diff(truth).size} pairs below threshold")
  }

  test("d2 banding catches boundary pairs (Jaccard in [0.5, 0.6))") {
    import spark.implicits._
    // 16x2 banding has its S-curve midpoint at 0.25, so pairs just
    // above the emitted 0.5 cutoff must be found — the regime the
    // old 8x4 design (midpoint 0.59) caught only ~40% of the time.
    // 12-shingle docs differing in 4 trailing shingles: J = 8/16 = 0.5.
    val base = (1 to 13).map(i => s"w$i").mkString(" ")
    val variant = ((1 to 9).map(i => s"w$i") ++ (1 to 4).map(i => s"v$i")).mkString(" ")
    val tmp = java.nio.file.Files.createTempDirectory("d2boundary").toString
    Seq((1L, base, "en", "srcA", base.length.toLong),
        (2L, variant, "en", "srcA", variant.length.toLong))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val found = Dedup.d2MinhashLsh(spark, tmp)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(found === Set((1L, 2L)),
      s"boundary pair (J=0.5) not caught by 16x2 banding: $found")
  }

  test("d4's PPJoin and count-agg plans emit the identical edge set") {
    import spark.implicits._
    // two physics, one semantics: d4/d5 route between them by corpus
    // profile — they must agree exactly (jaccard doubles included) or
    // routing would change answers and the cluster oracle would drift
    val docs = Dedup.docShingles(
      graft.sources.Tables.documents(spark, dir))
    val ppjoin = Dedup.d4PairsPrefix(docs)
      .select("doc_a", "doc_b", "jaccard")
      .as[(Long, Long, Double)].collect().toSet
    val countAgg = Dedup.d4PairsCountAgg(docs)
      .select("doc_a", "doc_b", "jaccard")
      .as[(Long, Long, Double)].collect().toSet
    assert(countAgg === ppjoin,
      "the two d4 plans disagree (pairs or jaccard doubles)")
    assert(ppjoin.nonEmpty, "no pairs at this SF — test is vacuous")
    // the judged corpus routes to count-agg (flat vocabulary); the
    // judged rows must be the routed plan's rows
    assert(Dedup.hotShingleShareFor(spark, dir) <= Dedup.HotShareThreshold)
  }

  test("d7 finds exactly the cross-boundary near-dup (corpus/delta split)") {
    import spark.implicits._
    // src0 = corpus (even), src1 = delta (odd). One planted near-dup
    // crossing the boundary, one corpus-internal pair (must NOT
    // appear — d7 is delta-vs-corpus only), one dissimilar delta doc.
    val a = (1 to 13).map(i => s"w$i").mkString(" ")
    val aNear = ((1 to 12).map(i => s"w$i") :+ "zz").mkString(" ")
    val aTwin = ((1 to 12).map(i => s"w$i") :+ "yy").mkString(" ")
    val other = (1 to 13).map(i => s"q$i").mkString(" ")
    val tmp = java.nio.file.Files.createTempDirectory("d7split").toString
    Seq((1L, a, "en", "src0", a.length.toLong),         // corpus
        (2L, aTwin, "en", "src0", aTwin.length.toLong), // corpus (internal pair w/ 1)
        (3L, aNear, "en", "src1", aNear.length.toLong), // delta near-dup of 1 and 2
        (4L, other, "en", "src1", other.length.toLong)) // delta, no match
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val got = Dedup.d7IncrementalNearDup(spark, tmp)
      .select("delta_id", "corpus_id").as[(Long, Long)].collect().toSet
    assert(got === Set((3L, 1L), (3L, 2L)),
      s"expected delta 3 matching corpus 1 and 2, got $got")
  }

  test("d3 SimHash blocking has exact recall vs unblocked Hamming ground truth") {
    import spark.implicits._
    // all-pairs ground truth at sf0.001 (500 docs -> 125k pairs):
    // every pair at Hamming <= 8, no blocking anywhere
    val sigs = graft.sources.Tables.documents(spark, dir)
      .where(trim(col("text")) =!= "")
      .select(col("doc_id"), Dedup.simhash63(col("text")).as("s"))
    val truth = sigs.as("x").join(sigs.as("y"), col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("a"), col("y.doc_id").as("b"),
        bit_count(col("x.s").bitwiseXOR(col("y.s"))).as("h"))
      .where(col("h") <= 8)
      .select("a", "b").as[(Long, Long)].collect().toSet
    val foundRows = Dedup.d3Simhash(spark, dir)
      .select("doc_a", "doc_b").as[(Long, Long)].collect()
    val found = foundRows.toSet
    assert(foundRows.length === found.size,
      s"d3 emitted ${foundRows.length - found.size} duplicate pairs")
    assert(truth.nonEmpty, "fixture has no Hamming<=8 pairs — test is vacuous")
    // 9 chunks of 7 bits: a distance-8 pair differs in at most 8
    // chunks, so at least one chunk matches — recall is GUARANTEED,
    // and the Hamming verify makes precision exact, so the sets are
    // equal, not merely overlapping
    assert(found === truth,
      s"missed=${truth.diff(found).size} spurious=${found.diff(truth).size} of ${truth.size}")
  }

  test("d3 SimHash: identical docs get identical signatures; sigs are 63-bit") {
    import spark.implicits._
    val df = Seq("the quick brown fox", "the quick brown fox", "totally different words here")
      .toDF("text")
      .select(Dedup.simhash63(col("text")).as("s"))
    val sigs = df.collect().map(_.getLong(0))
    assert(sigs(0) === sigs(1))
    assert(sigs(0) !== sigs(2))
    assert(sigs.forall(s => s >= 0L), "63-bit signatures must be non-negative")
  }

  test("e2 LSH ANN recall@10 >= 0.25 against e1 brute force") {
    import spark.implicits._
    val exact = Similarity.e1AnnBruteForce(spark, dir)
      .select("query_id", "vec_id").as[(Long, Long)].collect().toSet
    val approx = Similarity.e2AnnLsh(spark, dir)
      .select("query_id", "vec_id").as[(Long, Long)].collect().toSet
    val recall = exact.intersect(approx).size.toDouble / exact.size
    info(f"LSH ANN recall@10 = $recall%.2f (${approx.size} approx rows)")
    assert(recall >= 0.25, f"recall $recall%.2f below floor")
  }

  test("e5 IVF ANN recall@10 >= 0.25 against e1 brute force") {
    import spark.implicits._
    val exact = Similarity.e1AnnBruteForce(spark, dir)
      .select("query_id", "vec_id").as[(Long, Long)].collect().toSet
    val approx = Similarity.e5AnnIvf(spark, dir)
      .select("query_id", "vec_id").as[(Long, Long)].collect().toSet
    val recall = exact.intersect(approx).size.toDouble / exact.size
    info(f"IVF ANN recall@10 = $recall%.2f (${approx.size} approx rows)")
    assert(recall >= 0.25, f"recall $recall%.2f below floor")
    // determinism: training is seeded + order-free, so a second run
    // returns the identical candidate set
    val again = Similarity.e5AnnIvf(spark, dir)
      .select("query_id", "vec_id").as[(Long, Long)].collect().toSet
    assert(again === approx, "IVF result not deterministic across runs")
    // plan shape: the probe join must broadcast the (queries × cells)
    // side — a sort-merge join would shuffle the whole corpus
    val plan = Similarity.e5AnnIvf(spark, dir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"no broadcast join:\n$plan")
    assert(!plan.contains("SortMergeJoin"), s"corpus-shuffling join:\n$plan")
  }

  test("e6 PQ ANN recall@10 >= 0.4 against e1 brute force, deterministic") {
    import spark.implicits._
    val exact = Similarity.e1AnnBruteForce(spark, dir)
      .select("query_id", "vec_id").as[(Long, Long)].collect().toSet
    val approx = Similarity.e6AnnPq(spark, dir)
      .select("query_id", "vec_id").as[(Long, Long)].collect().toSet
    val recall = exact.intersect(approx).size.toDouble / exact.size
    info(f"PQ ANN recall@10 = $recall%.2f (${approx.size} approx rows)")
    // the 50-candidate exact re-rank should clear a higher floor than
    // the bucketing-only paths (e2/e5)
    assert(recall >= 0.4, f"recall $recall%.2f below floor")
    val again = Similarity.e6AnnPq(spark, dir)
      .select("query_id", "vec_id").as[(Long, Long)].collect().toSet
    assert(again === approx, "PQ result not deterministic across runs")
    // both ranking stages go through the bounded TopKByDist partial
    // aggregate — a per-query window here would shuffle-sort every
    // ADC-scored corpus row, the plan that dies at 100 TB
    val plan = Similarity.e6AnnPq(spark, dir)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"window over scored candidates:\n$plan")
  }

  test("e7 IVFPQ recall@10 >= 0.3 against e1, deterministic, cell-bounded plan") {
    import spark.implicits._
    val exact = Similarity.e1AnnBruteForce(spark, dir)
      .select("query_id", "vec_id").as[(Long, Long)].collect().toSet
    val approx = Similarity.e7AnnIvfPq(spark, dir)
      .select("query_id", "vec_id").as[(Long, Long)].collect().toSet
    val recall = exact.intersect(approx).size.toDouble / exact.size
    info(f"IVFPQ recall@10 = $recall%.2f (${approx.size} approx rows)")
    // cell pruning (3 of 16 probed) costs recall vs e6's full ADC
    // scan; the floor sits between e2/e5's bucketing-only paths and
    // e6's scan-everything path
    assert(recall >= 0.3, f"recall $recall%.2f below floor")
    val again = Similarity.e7AnnIvfPq(spark, dir)
      .select("query_id", "vec_id").as[(Long, Long)].collect().toSet
    assert(again === approx, "IVFPQ result not deterministic across runs")
    // the ADC scan must be an equi-join on cell (nprobe/K of the
    // corpus), never a cross join, and ranking stays aggregate-bounded
    val plan = Similarity.e7AnnIvfPq(spark, dir)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"window over scored candidates:\n$plan")
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"IVFPQ lost its cell equi-join:\n$plan")
  }

  test("e4 LSH-blocked near-dup finds every e3 (label-blocked exact) pair") {
    import spark.implicits._
    val exact = Similarity.e3EmbeddingNearDup(spark, dir)
      .select("vec_a", "vec_b").as[(Long, Long)].collect().toSet
    val lsh = Similarity.e4NearDupLsh(spark, dir)
      .select("vec_a", "vec_b").as[(Long, Long)].collect().toSet
    assert(exact.nonEmpty, "fixture has no e3 pairs — test is vacuous")
    // e3 blocks by label, e4 by LSH bucket: every e3 pair must be
    // rediscovered (32x4 amplification: per-pair p ≈ 0.993 at the
    // 0.35 floor), and e4 may legitimately add cross-label pairs
    assert(exact.subsetOf(lsh),
      s"e4 missed ${exact.diff(lsh).size} of ${exact.size} e3 pairs")
    // precision: every e4 pair really is >= 0.35 (verify step), so
    // restricting e4 to same-label pairs must give exactly e3
    val labels = graft.sources.Tables.embeddings(spark, dir)
      .select("vec_id", "label").as[(Long, Int)].collect().toMap
    val sameLabel = lsh.filter { case (a, b) => labels(a) == labels(b) }
    assert(sameLabel.subsetOf(exact),
      s"e4 emitted ${sameLabel.diff(exact).size} same-label pairs e3 lacks")
  }

  test("cosine is exactly 1.0 on identical vectors and symmetric") {
    import spark.implicits._
    val e = graft.sources.Tables.embeddings(spark, dir).limit(5)
    val self = e.select(Similarity.cosine(col("embedding"), col("embedding")).as("c"))
      .as[Double].collect()
    self.foreach(c => assert(math.abs(c - 1.0) < 1e-12))
  }

  test("multimodal stub decode preserves payload bytes and partition shape") {
    val media = Multimodal.mediaFromDocuments(spark, dir)
    val meta = Multimodal.decodeAll(media)
    // byte_len must equal the source n_chars (ASCII corpus)
    val joined = meta.toDF().join(
      graft.sources.Tables.documents(spark, dir), "doc_id")
    assert(joined.where(col("byte_len") =!= col("n_chars")).count() === 0)
    // decode is map-only: no shuffle in the plan
    val plan = meta.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"decode plan shuffles:\n$plan")
  }

  test("d9 planted passages coalesce to exact spans") {
    import spark.implicits._
    // doc 1 embeds doc 0's tokens a..j (10 tokens => 3 eight-grams on
    // one diagonal = ONE span of 10 tokens); doc 2 shares nothing
    val docs = Seq(
      (0L, "a b c d e f g h i j k2 l2 m2 n2 o2 p2"),
      (1L, "z y a b c d e f g h i j x w v u t s"),
      (2L, "q r s t u v w x y0 z0 a1 b1 c1 d1 e1 f1")).toDF("doc_id", "text")
    val got = graft.operators.Dedup.substringSpans(docs, 8,
        graft.operators.Dedup.D9MaxPostings)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    assert(got.toSeq === Seq((0L, 1L, 1L, 3L, 10L)))
  }

  test("d10 removes exactly the later copy's covered tokens, in order") {
    import spark.implicits._
    // doc 1 embeds doc 0's 10-token passage at offset 2: its grams
    // 2..4 are duplicated, covering tokens 2..11; doc 0 (the earlier
    // copy) must be untouched — absent from the output entirely
    val dir = java.nio.file.Files.createTempDirectory("d10_").toString
    Seq(
      (0L, "a b c d e f g h i j k2 l2 m2 n2 o2 p2"),
      (1L, "z y a b c d e f g h i j x w v u t s"),
      (2L, "q r s t u v w x y0 z0 a1 b1 c1 d1 e1 f1"))
      .toDF("doc_id", "text").write.parquet(s"$dir/documents.parquet")
    val got = graft.operators.Dedup.d10SpanRemoval(spark, dir).collect()
    assert(got.length === 1, s"expected only doc 1 affected: ${got.toSeq}")
    val r = got(0)
    assert(r.getLong(0) === 1L)
    assert((r.getLong(1), r.getLong(2), r.getLong(3)) === ((18L, 10L, 8L)))
    // the cleaned text is the ORIGINAL minus positions 2..11, order kept
    val want = "z y x w v u t s"
    assert(r.getString(4) ===
      java.security.MessageDigest.getInstance("MD5")
        .digest(want.getBytes("UTF-8")).map("%02x".format(_)).mkString)
  }

  test("d10 cleans an exact duplicate to nothing (null hash, zero kept)") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("d10x_").toString
    Seq(
      (0L, "p q r s t u v w x y"),
      (1L, "p q r s t u v w x y"))
      .toDF("doc_id", "text").write.parquet(s"$dir/documents.parquet")
    val got = graft.operators.Dedup.d10SpanRemoval(spark, dir).collect()
    assert(got.length === 1 && got(0).getLong(0) === 1L)
    assert(got(0).getLong(3) === 0L, "exact dup should clean to nothing")
    assert(got(0).isNullAt(4))
  }

  test("d9 hot-gram guard drops super-frequent grams before the candidate join") {
    import spark.implicits._
    val cap = graft.operators.Dedup.D9MaxPostings
    // boilerplate: an 8-token footer planted in MANY docs — its gram
    // posting count is 2·cap, far over the cap, so it must generate
    // ZERO candidate pairs (fan-out would be (2·cap)² = 1024 rows
    // from one gram). docs 1000/1001 share a genuine rare passage
    // that must still surface as one exact span.
    val footer = "f1 f2 f3 f4 f5 f6 f7 f8"
    val boiler = (0 until 2 * cap).map(i =>
      (i.toLong, s"u$i v$i w$i x$i $footer"))
    val rare = Seq(
      (1000L, "p1 p2 p3 p4 p5 p6 p7 p8 p9 p10 tail1000"),
      (1001L, "head1001 p1 p2 p3 p4 p5 p6 p7 p8 p9 p10"))
    val docs = (boiler ++ rare).toDF("doc_id", "text")
    val got = graft.operators.Dedup.substringSpans(docs, 8, cap)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    // only the rare passage survives: 10 tokens = 3 eight-grams on
    // one diagonal = one span; every footer-only pair is gone
    assert(got.toSeq === Seq((1000L, 1001L, 1L, 3L, 10L)),
      s"hot gram leaked into candidates: ${got.toSeq}")
    // and with the cap lifted the same corpus DOES pair the footer
    // docs — proving the guard, not the fixture, removed them
    val uncapped = graft.operators.Dedup.substringSpans(docs, 8, Int.MaxValue)
      .where(col("doc_a") < 1000L).count()
    assert(uncapped === (2L * cap) * (2L * cap - 1L) / 2L)
  }

  test("d9 index-join spans equal a brute-force per-pair diagonal scan") {
    // ground truth: all-pairs driver-side scan of the real corpus —
    // no hashing, no join, just token comparison per diagonal run,
    // with the SAME posting cap the judged operator applies
    val k = 8
    val cap = graft.operators.Dedup.D9MaxPostings
    val raw = graft.sources.Tables.documents(spark, dir)
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1).trim.split("\\s+").toSeq)
      .sortBy(_._1)
    def rawGramsOf(toks: Seq[String]): Map[Seq[String], Seq[Int]] =
      if (toks.size < k) Map.empty
      else toks.sliding(k).zipWithIndex.toSeq.groupMap(_._1)(_._2)
    // corpus-wide posting counts → the hot set the guard drops
    val postings = scala.collection.mutable.Map.empty[Seq[String], Int]
    raw.foreach { case (_, toks) =>
      rawGramsOf(toks).foreach { case (g, ps) =>
        postings(g) = postings.getOrElse(g, 0) + ps.size } }
    val hot = postings.collect { case (g, n) if n > cap => g }.toSet
    def gramsOf(toks: Seq[String]): Map[Seq[String], Seq[Int]] =
      rawGramsOf(toks).filterNot { case (g, _) => hot(g) }
    val truth = (for {
      i <- raw.indices; j <- (i + 1) until raw.length
      (ida, ta) = raw(i); (idb, tb) = raw(j)
      ga = gramsOf(ta); gb = gramsOf(tb)
      hits = ga.keySet.intersect(gb.keySet).toSeq.flatMap(g =>
        for (pa <- ga(g); pb <- gb(g)) yield (pa, pb))
      if hits.nonEmpty
    } yield {
      val runs = hits.groupBy { case (pa, pb) => pa - pb }.toSeq.flatMap {
        case (_, ps) =>
          val sorted = ps.map(_._1).sorted
          sorted.foldLeft(List.empty[List[Int]]) {
            case (run :: rest, p) if p == run.head + 1 => (p :: run) :: rest
            case (acc, p) => List(p) :: acc
          }.map(_.size)
      }
      (ida, idb) -> ((runs.size.toLong, runs.map(_.toLong).sum,
        runs.max.toLong + (k - 1)))
    }).toMap
    val got = graft.operators.Dedup.substringSpans(
      graft.sources.Tables.documents(spark, dir)
        .select(col("doc_id"), col("text")), k, cap)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(truth.nonEmpty, "fixture has no duplicated passages — vacuous")
    assert(got === truth,
      s"missing=${truth.keySet.diff(got.keySet)} spurious=${got.keySet.diff(truth.keySet)}")
  }

  test("fingerprint is order-sensitive (permuted tokens differ)") {
    import spark.implicits._
    val fps = Seq("alpha beta gamma", "gamma beta alpha")
      .toDF("text")
      .select(TextFunctions.fingerprint(TextFunctions.tokens(col("text"))).as("f"))
      .as[Long].collect()
    assert(fps(0) !== fps(1))
  }
}
