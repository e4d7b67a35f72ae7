package graft

import org.apache.spark.sql.functions._
import graft.operators.FuzzyJoin

/** Fuzzy join: the deletion-neighborhood blocking theorem on each
  * edit class, no-false-negative vs the brute-force join, pair
  * uniqueness, and the judged q101 shape.
  */
class FuzzyJoinSpec extends SparkTestBase {
  import spark.implicits._

  private def pairs(names: Seq[String]) =
    FuzzyJoin.fuzzyPairs(names.toDF("name"))
      .collect().map(r => (r.getString(0), r.getString(1))).toSet

  test("blocking finds every edit class at distance 1 and 2") {
    // substitution, deletion, insertion, and two stacked edits —
    // each pair must surface despite no shared prefix requirement
    val found = pairs(Seq(
      "widget", "wadget",      // substitution (ed 1)
      "bolt", "bot",           // deletion (ed 1)
      "gear", "gears",         // insertion (ed 1)
      "anvil", "unvil",        // first-char substitution (ed 1)
      "plate", "lathe",        // delete-head + insert-mid (ed 2)
      "goose"                  // far from everything — no pairs
    ))
    assert(found.contains(("wadget", "widget")))
    assert(found.contains(("bolt", "bot")))
    assert(found.contains(("gear", "gears")))
    assert(found.contains(("anvil", "unvil")))
    assert(found.contains(("lathe", "plate")))
    assert(!found.exists(p => p._1 == "goose" || p._2 == "goose"))
  }

  test("no false negatives vs brute force on the real vocabulary") {
    val names = graft.sources.Tables.part(spark, sf("sf0.001"))
      .select(col("p_name").as("name")).distinct()
    val blocked = FuzzyJoin.fuzzyPairs(names)
      .select("name_a", "name_b").collect().map(r => (r.getString(0), r.getString(1))).toSet
    val brute = names.as("a").crossJoin(names.as("b"))
      .where(col("a.name") < col("b.name") &&
        levenshtein(col("a.name"), col("b.name")) <= FuzzyJoin.K)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(blocked === brute)
    assert(brute.nonEmpty) // the gate is not vacuous
  }

  test("candidate pairs are unique — no duplicate emissions") {
    val df = FuzzyJoin.fuzzyPairs(Seq("bolt", "bot", "boat", "colt").toDF("name"))
    val rows = df.select("name_a", "name_b").collect().map(_.toSeq)
    assert(rows.length === rows.distinct.length)
  }

  test("judged q101 returns the sorted pair list with distances") {
    val rows = FuzzyJoin.q101FuzzyJoin(spark, sf("sf0.001")).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getString(0) < r.getString(1))
      assert(r.getAs[Long]("ed") >= 1L && r.getAs[Long]("ed") <= 2L)
    }
  }
}
