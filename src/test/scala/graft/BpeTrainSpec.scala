package graft

import org.apache.spark.sql.functions._
import graft.operators.BpeTrain

/** BPE merge learning against a hand-computed run of the classic
  * low/lower/newest/widest corpus (Sennrich et al.'s example shape):
  * every rank, pair, and weighted count derived by hand, including
  * two count ties that must break lexicographically.
  */
class BpeTrainSpec extends SparkTestBase {
  import spark.implicits._

  private def vocab(words: (String, Long)*) =
    words.toSeq.toDF("w", "cnt")
      .select(split(col("w"), "").as("syms"), col("cnt"))

  test("learnMerges reproduces the hand-computed classic run, ties lexical") {
    // low×5, lower×2, newest×6, widest×3. By hand:
    //  1 (e,s)=9   ties (s,t)=9 -> ("e","s") wins lexically
    //  2 (es,t)=9
    //  3 (l,o)=7   ties (o,w)=7 -> ("l","o") wins
    //  4 (lo,w)=7
    //  5 (e,w)=6   ties (n,e),(w,est) -> ("e","w") smallest
    //  6 (ew,est)=6  ties (n,ew) -> "ew" < "n"
    //  7 (n,ewest)=6
    //  8 (d,est)=3 ties (i,d),(w,i) -> ("d","est") smallest
    val got = BpeTrain.learnMerges(
      vocab("low" -> 5L, "lower" -> 2L, "newest" -> 6L, "widest" -> 3L), 8)
      .map(m => (m.left, m.right, m.count))
    assert(got === Seq(
      ("e", "s", 9L), ("es", "t", 9L), ("l", "o", 7L), ("lo", "w", 7L),
      ("e", "w", 6L), ("ew", "est", 6L), ("n", "ewest", 6L),
      ("d", "est", 3L)))
  }

  test("merge application is greedy left-to-right and non-overlapping") {
    val df = Seq("aaa", "baa", "aab").toDF("w")
      .select(col("w"), BpeTrain.applyMerge(split(col("w"), ""), "a", "a").as("m"))
    val got = df.as[(String, Seq[String])].collect().toMap
    assert(got("aaa") === Seq("aa", "a"))
    assert(got("baa") === Seq("b", "aa"))
    assert(got("aab") === Seq("aa", "b"))
  }

  test("learning stops early when no adjacent pair remains") {
    // single-char words only: zero mergeable pairs
    val got = BpeTrain.learnMerges(vocab("a" -> 3L, "b" -> 2L), 8)
    assert(got === Seq.empty)
  }

  test("result is invariant under repartitioning (deterministic ties)") {
    val v = vocab("low" -> 5L, "lower" -> 2L, "newest" -> 6L, "widest" -> 3L)
    val a = BpeTrain.learnMerges(v.repartition(7), 4)
    val b = BpeTrain.learnMerges(v.coalesce(1), 4)
    assert(a === b)
  }

  test("bpeTokens matches the applyMerge fold on adversarial words") {
    // Two independent implementations of the same greedy scan: the
    // t11 replace-chain over a delimiter-encoded string vs t10's
    // array-fold applyMerge. Words chosen to hit the traps the
    // encoding must survive: runs of a repeated pair (consecutive
    // occurrences sharing a boundary), merged-symbol adjacency
    // ("summer" → m+er), r prefixing the next symbol, and merges
    // that must NOT fire across earlier merge results.
    val merges = BpeTrain.PretrainedMerges
    val words = Seq(
      "erer", "ererer", "errrr", "inin", "stow", "lulu", "atat",
      "summer", "merer", "mermer", "winter", "stowing", "luster",
      "rrrr", "in", "x", "owow", "orator", "instat", "merluin")
    val df = words.toDF("w").select(
      col("w"),
      BpeTrain.bpeTokens(col("w"), merges).as("viaReplace"),
      merges.foldLeft(split(col("w"), "")) { case (c, (l, r)) =>
        BpeTrain.applyMerge(c, l, r)
      }.as("viaFold"))
    df.as[(String, Seq[String], Seq[String])].collect().foreach {
      case (w, a, b) =>
        assert(a === b, s"divergence on '$w'")
        assert(a.mkString === w, s"tokens of '$w' must concat back")
    }
  }

  test("judged t11 token frequencies: exact, positive, ordered") {
    val got = BpeTrain.t11BpeTokenize(spark, sf("sf0.001"))
      .as[(String, Long)].collect()
    // sf0.001's corpus alphabet yields fewer than 40 distinct
    // tokens; LIMIT caps, it doesn't pad
    assert(got.nonEmpty && got.length <= 40)
    assert(got.forall(_._2 > 0))
    // total order: count desc, token asc
    val resorted = got.sortBy { case (t, n) => (-n, t) }.toSeq
    assert(got.toSeq === resorted)
    // the frozen merges really fire: at least one multi-char token
    // from the table's closure appears in the top-40
    assert(got.exists(_._1.length > 1))
  }

  test("judged t10 runs on the corpus and emits a well-formed merge table") {
    val got = BpeTrain.t10BpeTrain(spark, sf("sf0.001"))
      .as[(Long, String, String, Long)].collect()
    assert(got.length === 8)
    assert(got.map(_._1).toSeq === (1L to 8L))
    // counts are positive and the learned merges are all distinct
    assert(got.forall(_._4 > 0))
    assert(got.map(m => (m._2, m._3)).distinct.length === 8)
    // a rank-k merge can only reference symbols buildable from
    // earlier merges: every non-single-char side must be a
    // concatenation seen earlier
    val known = scala.collection.mutable.Set.empty[String]
    got.sortBy(_._1).foreach { case (_, l, r, _) =>
      for (s <- Seq(l, r) if s.length > 1)
        assert(known(s), s"merge side $s not built by an earlier merge")
      known += (l + r)
    }
  }
}
