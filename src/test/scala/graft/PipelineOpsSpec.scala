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
    val found = Dedup.d2MinhashLsh(spark, dir)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(truth.nonEmpty, "fixture has no near-dup pairs — test is vacuous")
    assert(truth.subsetOf(found),
      s"LSH missed ${truth.diff(found).size} of ${truth.size} true pairs")
    // precision: everything reported really is >= 0.5 — truth is the
    // complete unblocked pair set, so found must be a subset of it
    assert(found.subsetOf(truth),
      s"d2 reported ${found.diff(truth).size} pairs below threshold")
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

  test("fingerprint is order-sensitive (permuted tokens differ)") {
    import spark.implicits._
    val fps = Seq("alpha beta gamma", "gamma beta alpha")
      .toDF("text")
      .select(TextFunctions.fingerprint(TextFunctions.tokens(col("text"))).as("f"))
      .as[Long].collect()
    assert(fps(0) !== fps(1))
  }
}
