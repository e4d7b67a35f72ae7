package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Encoder, SparkSession}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.sources.Tables
import graft.Catalog.Q

/** Count-Min sketch (Cormode & Muthukrishnan, J.Alg '05) — the
  * point-frequency member of the approximate-aggregate family, next
  * to HLL (q22/q93: distinct counts, union-only), KMV (q99: distinct
  * counts WITH intersection), Misra-Gries (q86: WHICH keys are
  * heavy), GK (q32: quantiles), and bloom (q64/q88: membership). MG
  * finds the heavy keys; CMS answers "how often did key x occur" for
  * ANY x — including keys never tracked — with a one-sided error
  * (never an underestimate, overestimate ≤ εN w.h.p.), and its
  * counter-matrix state additionally supports turnstile deletes and
  * inner-product (join-size) estimation, which MG's survivor list
  * cannot.
  *
  * Scale shape at 100 TB: the sketch is a d×w counter matrix
  * (d=4 × w=512 longs = 16 KB here) updated row-locally and merged
  * by elementwise add, so frequency estimation over an UNBOUNDED
  * key domain costs one partial-agg shuffle of 16 KB buffers — the
  * exact `groupBy(key).count` it replaces shuffles every distinct
  * key (billions of n-grams at corpus scale). The judged query runs
  * that exact twin beside the sketch on a bounded probe set as the
  * error witness, q86/q99's sketch-then-verify discipline.
  *
  * Determinism: the d hash rows are fixed-seed universal hashes
  * ((a·x + b) mod p) mod w over a Mersenne prime — integer-exact,
  * order-free (counter adds commute), partitioning-free, and
  * replayable in ANSI SQL, so the DuckDB oracle rebuilds the whole
  * counter matrix and the estimates hash-strict. An approximate
  * operator under the EXACT gate.
  */
object CmsSketch {

  /** Sketch geometry: d independent hash rows × w counters. */
  val D = 4
  val W = 512

  /** Mersenne prime 2^31 − 1 for the universal hash family. */
  val P: Long = 2147483647L

  /** Fixed hash-row coefficients (a odd, < p; b < p). */
  val A: Array[Long] = Array(1103515245L, 1299709L, 60493L, 998244353L)
  val B: Array[Long] = Array(12345L, 7919L, 131071L, 65537L)

  /** Flattened-matrix cell for hash row i and key x ≥ 0. */
  @inline def cell(i: Int, x: Long): Int =
    (((A(i) * x + B(i)) % P) % W).toInt

  /** The d×w counter matrix as one bounded mergeable buffer.
    * TypedImperativeAggregate keeps it a live JVM array per
    * partition (serialized only at the shuffle boundary), so the
    * per-row cost is d array increments.
    */
  final class CountMin extends Aggregator[Long, Array[Long], Seq[Long]] {
    override def zero: Array[Long] = new Array[Long](D * W)
    override def reduce(m: Array[Long], x: Long): Array[Long] = {
      var i = 0
      while (i < D) { m(i * W + cell(i, x)) += 1L; i += 1 }
      m
    }
    override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
      var i = 0
      while (i < a.length) { a(i) += b(i); i += 1 }
      a
    }
    override def finish(m: Array[Long]): Seq[Long] = m.toSeq
    override def bufferEncoder: Encoder[Array[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
    override def outputEncoder: Encoder[Seq[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
  }

  /** Point estimate min_i matrix[i·w + h_i(key)], as Columns over the
    * singleton sketch row (1-based element_at).
    */
  private def pointEst(matrix: Column, key: Column): Column = {
    val rows = (0 until D).map { i =>
      val c = pmod(lit(A(i)) * key + lit(B(i)), lit(P)) % lit(W)
      element_at(matrix, (lit(i * W) + c + lit(1)).cast(IntegerType))
    }
    least(rows: _*)
  }

  /** Core: sketch `keys` (one bounded-agg pass), then estimate the
    * frequency of each probe key from the singleton sketch row via
    * explode — no join touches the sketch — and equi-join the exact
    * counts of the (bounded) probe set as the error witness.
    */
  private[graft] def cmsEstimate(
      keys: DataFrame, probes: Seq[Long]): DataFrame = {
    val cms = udaf(new CountMin)
    val sketch = keys.groupBy().agg(cms(col("key")).as("m"))
    val est = sketch
      .select(explode(array(probes.map(lit(_)): _*)).as("key"), col("m"))
      .select(col("key"), pointEst(col("m"), col("key")).as("cms_est"))
    val exact = keys.where(col("key").isin(probes: _*))
      .groupBy(col("key")).agg(count(lit(1)).as("exact_cnt"))
    est.join(exact, Seq("key")).orderBy(col("key"))
  }

  /** Judged CMS on lineitem: supplier occurrence frequencies. The 8
    * probe suppkeys exist at every SF (supplier domain starts at 1);
    * the full key domain (all suppliers) streams through the sketch,
    * only the probes get the exact twin.
    */
  def q100CmsFreq(s: SparkSession, d: String): DataFrame =
    cmsEstimate(
      Tables.lineitem(s, d).select(col("l_suppkey").as("key")),
      1L to 8L)

  private def oracleSql: String = {
    // coefficients forced to BIGINT — bare literals parse as INT32
    // and the a*key multiply overflows
    val params = (0 until D)
      .map(i =>
        s"(${i}, CAST(${A(i)} AS BIGINT), CAST(${B(i)} AS BIGINT))")
      .mkString(", ")
    s"""
      WITH params(i, a, b) AS (VALUES $params),
      cells AS (
        SELECT p.i AS i,
               ((p.a * l_suppkey + p.b) % $P) % $W AS cell,
               count(*) AS cnt
        FROM lineitem, params p GROUP BY 1, 2),
      probes(key) AS (VALUES (1),(2),(3),(4),(5),(6),(7),(8)),
      est AS (
        SELECT pr.key AS key, min(c.cnt) AS cms_est
        FROM probes pr
        JOIN params p ON true
        JOIN cells c
          ON c.i = p.i AND c.cell = ((p.a * pr.key + p.b) % $P) % $W
        GROUP BY 1),
      exact AS (
        SELECT l_suppkey AS key, count(*) AS exact_cnt
        FROM lineitem WHERE l_suppkey BETWEEN 1 AND 8 GROUP BY 1)
      SELECT CAST(e.key AS BIGINT) AS key,
             CAST(e.cms_est AS BIGINT) AS cms_est,
             x.exact_cnt
      FROM est e JOIN exact x USING (key) ORDER BY 1"""
  }

  val queries: Seq[Q] = Seq(
    Q("q100_cms_freq", q100CmsFreq, Some(oracleSql)))
}
