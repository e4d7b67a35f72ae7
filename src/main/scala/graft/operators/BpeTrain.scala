package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.sources.Tables
import graft.functions.TextFunctions.tokens
import graft.Catalog.Q

/** Distributed BPE (byte-pair-encoding) merge training — learning a
  * subword tokenizer vocabulary from the corpus, the step that sits
  * before every token-counting/packing stage of an LLM data pipeline
  * (t1/t5 estimate with a fixed heuristic; this learns the real merge
  * table).
  *
  * The classic algorithm (Sennrich et al., ACL 2016) iterates: count
  * adjacent symbol pairs, merge the most frequent pair everywhere,
  * repeat. The distributed shape that survives 100 TB:
  *
  *  - The corpus collapses to a WORD-FREQUENCY table first (one
  *    hash-aggregate shuffle — Zipf-bounded output, ~10^8 rows at
  *    web scale, never collected). Every subsequent iteration runs
  *    on the vocab table, not the corpus: pair counting is
  *    explode + partial-agg (map-side combine collapses the fan-out),
  *    and the per-iteration argmax ships exactly ONE row to the
  *    driver (`TakeOrdered(1)`) — the growing merge table is a
  *    KB-scale model artifact, the e5-centroid contract.
  *  - Applying a merge is row-local (a left-to-right greedy fold over
  *    each word's symbol array — a codegen'd higher-order function,
  *    no UDF, no shuffle).
  *  - Each iteration's vocab is checkpointed to cut the
  *    8-fold-deep lineage (localCheckpoint here; a production run
  *    on a real cluster would use reliable checkpoints, the d5
  *    connected-components discipline).
  *
  * Ties on pair count break lexicographically on (left, right) so
  * the learned table is deterministic under any partitioning.
  */
object BpeTrain {

  /** One learned merge: adjacent pair (left, right) and its weighted
    * occurrence count at the iteration it was chosen.
    */
  final case class Merge(left: String, right: String, count: Long)

  /** Left-to-right greedy application of merge (l, r) to a symbol
    * array: fold symbols into an accumulator, fusing when the
    * accumulator's last symbol is `l` and the incoming one is `r`.
    * Non-overlapping by construction ("aaa" + (a,a) → ["aa","a"]),
    * matching the reference algorithm's scan.
    */
  private[graft] def applyMerge(syms: Column, l: String, r: String): Column =
    aggregate(
      syms,
      array().cast(ArrayType(StringType)),
      (acc, x) =>
        when(size(acc) > 0 &&
            element_at(acc, -1) === lit(l) && x === lit(r),
          concat(slice(acc, lit(1), size(acc) - 1), array(lit(l + r))))
          .otherwise(concat(acc, array(x))))

  /** Learn `n` merges from a (syms: array<string>, cnt: long)
    * word-frequency table. Stops early if no adjacent pair remains.
    */
  def learnMerges(vocab0: DataFrame, n: Int): Seq[Merge] = {
    var vocab = vocab0.select(col("syms"), col("cnt")).localCheckpoint()
    val merges = scala.collection.mutable.ArrayBuffer.empty[Merge]
    var exhausted = false
    for (_ <- 1 to n if !exhausted) {
      val pairs = vocab
        .where(size(col("syms")) >= 2)
        .select(col("cnt"), explode(zip_with(
          slice(col("syms"), lit(1), size(col("syms")) - 1),
          slice(col("syms"), lit(2), size(col("syms")) - 1),
          (a, b) => struct(a.as("l"), b.as("r")))).as("p"))
        .groupBy(col("p.l").as("l"), col("p.r").as("r"))
        .agg(sum(col("cnt")).as("c"))
      val best = pairs
        .orderBy(col("c").desc, col("l"), col("r"))
        .limit(1).collect()
      if (best.isEmpty) exhausted = true
      else {
        val (l, r, c) = (best(0).getString(0), best(0).getString(1),
          best(0).getLong(2))
        merges += Merge(l, r, c)
        vocab = vocab
          .withColumn("syms", applyMerge(col("syms"), l, r))
          .localCheckpoint()
      }
    }
    merges.toSeq
  }

  /** Judged BPE training: 8 merges learned from the documents table
    * (whitespace words → character symbols). Output is the learned
    * merge table — deterministic, but the iterative argmax is not
    * SQL-expressible, so the driver checks rows-only; BpeTrainSpec
    * pins the full algorithm against a hand-computed classic corpus.
    */
  def t10BpeTrain(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val vocab = Tables.documents(s, d)
      .select(explode(tokens(col("text"))).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("cnt"))
      .select(split(col("w"), "").as("syms"), col("cnt"))
    val merges = learnMerges(vocab, 8)
    merges.zipWithIndex
      .map { case (m, i) => (i + 1L, m.left, m.right, m.count) }
      .toDF("rank", "left", "right", "pair_count")
  }

  val queries: Seq[Q] = Seq(
    Q("t10_bpe_train", t10BpeTrain, None))
}
