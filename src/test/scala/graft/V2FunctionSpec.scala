package graft

import java.nio.file.Files

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.types.{DoubleType, StructField, StructType}

import graft.functions.V2Functions

/** Catalog-shipped SQL functions (DSv2 `FunctionCatalog`): the
  * resolution path (`<cat>.fn(...)` from pure SQL, no session
  * extensions), the magic-method codegen contract for scalars, the
  * partial/merge aggregation contract for `sum_cents`, and semantic
  * parity with the engine surfaces each function pins itself to
  * (CosineSimilarity / t1 tokenization / Money cents).
  */
class V2FunctionSpec extends SparkTestBase {
  import spark.implicits._

  private val cat = s"graftfn_${java.util.UUID.randomUUID()
    .toString.take(8)}"

  private def withCatalog(body: => Unit): Unit = {
    spark.conf.set(s"spark.sql.catalog.$cat",
      "graft.sources.GraftLakeCatalog")
    spark.conf.set(s"spark.sql.catalog.$cat.root",
      Files.createTempDirectory("fn_cat_").toString)
    body
  }

  test("scalar functions resolve through the catalog and match " +
      "their session-surface twins") {
    withCatalog {
      val emb = graft.sources.Tables.embeddings(spark, sf("sf0.001"))
        .limit(64).cache()
      emb.createOrReplaceTempView("fn_emb")
      val viaCatalog = spark.sql(s"""
        SELECT a.vec_id,
               $cat.cosine_sim(a.embedding, q.embedding) AS cos
        FROM fn_emb a
        CROSS JOIN (SELECT embedding FROM fn_emb WHERE vec_id = 0) q
        ORDER BY a.vec_id""").collect()
      val viaExpr = emb.crossJoin(
          emb.where(col("vec_id") === 0)
            .select(col("embedding").as("qemb")))
        .select(col("vec_id"),
          graft.operators.Similarity.cosineNative(
            col("embedding"), col("qemb")).as("cos"))
        .orderBy(col("vec_id")).collect()
      assert(viaCatalog.length === viaExpr.length)
      viaCatalog.zip(viaExpr).foreach { case (a, b) =>
        assert(a.getLong(0) === b.getLong(0))
        // bit-identical, not approximately equal: same IEEE order
        assert(java.lang.Double.doubleToLongBits(a.getDouble(1)) ===
          java.lang.Double.doubleToLongBits(b.getDouble(1)))
      }
      emb.unpersist(): Unit
    }
  }

  test("token_count replicates the t1 tokenization contract " +
      "including its edge cases") {
    withCatalog {
      Seq(
        (1L, "alpha beta  gamma"), // multi-space collapse
        (2L, "  lead and trail  "), // space-only trim
        (3L, ""), // empty -> split yields [""] -> 1, the t1 contract
        (4L, "   "), // all-space -> trim -> "" -> 1
        (5L, "one\ntwo\tthree four"), // \s covers \n \t
        (6L, null.asInstanceOf[String])) // null -> null
        .toDF("id", "text").createOrReplaceTempView("fn_txt")
      val got = spark.sql(
        s"SELECT id, $cat.token_count(text) AS n FROM fn_txt ORDER BY id")
      val twin = spark.table("fn_txt")
        .select(col("id"), size(split(trim(col("text")), "\\s+")).as("n"))
        .orderBy(col("id"))
      val g = got.collect(); val t = twin.collect()
      // Spark's size() returns -1 for null under legacy conf default;
      // compare null-normalized
      def norm(r: Row): (Long, Any) =
        (r.getLong(0), if (r.isNullAt(1)) null else r.getInt(1))
      assert(g.map(norm).toSeq ===
        t.map(r => (r.getLong(0),
          if (r.isNullAt(1) || r.getInt(1) == -1) null else r.getInt(1)))
          .toSeq)
      assert(g.map(norm).toMap.apply(1L) === 3)
      assert(g.map(norm).toMap.apply(3L) === 1)
      assert(g.map(norm).toMap.apply(5L) === 4)
      assert(g.map(norm).toMap.apply(6L) === null)
    }
  }

  test("scalar functions plan through the magic-method Invoke path " +
      "inside whole-stage codegen") {
    withCatalog {
      // a parquet-backed (non-foldable) input: over a literal row the
      // optimizer constant-folds the Invoke away entirely — itself
      // proof the magic path evaluates at plan time — but here we
      // want to SEE the runtime plan shape
      graft.sources.Tables.documents(spark, sf("sf0.001"))
        .createOrReplaceTempView("fn_plan")
      val df = spark.sql(
        s"SELECT $cat.token_count(text) AS n FROM fn_plan")
      val optimized = df.queryExecution.optimizedPlan.toString
      // magic-method resolution plans as Invoke(...), not
      // ApplyFunctionExpression's row-boxed fallback
      assert(optimized.contains("invoke"),
        s"expected magic-method Invoke in plan:\n$optimized")
      assert(!optimized.contains("ApplyFunctionExpression"))
      // the `*(n)` stage marker is executedPlan.toString's rendering
      // of a WholeStageCodegen span — the Invoke projects INSIDE it
      val wsc = df.queryExecution.executedPlan.toString
      assert(wsc.contains("*(1) Project [invoke("),
        s"expected the Invoke inside a codegen stage:\n$wsc")
      assert(df.collect().nonEmpty)
    }
  }

  test("sum_cents aggregates exactly, skips nulls, and yields NULL " +
      "on all-null groups") {
    withCatalog {
      Seq[(String, Option[Double])](
        // 1.005*100 is 100.4999... in IEEE — rounds DOWN on every
        // engine (Spark round, DuckDB round, and this function all
        // round what the double multiply actually produced)
        ("a", Some(1.005)), // -> 100
        ("a", Some(2.004)), // -> 200
        // 0.125*100 = 12.5 EXACTLY: HALF_UP -> 13 (nearest-even
        // would give 12 — this pins the rounding mode)
        ("a", Some(0.125)), // -> 13
        ("a", None),
        ("b", None), ("b", None))
        .toDF("k", "v").createOrReplaceTempView("fn_money")
      val rows = spark.sql(s"""
        SELECT k, $cat.sum_cents(v) AS cents, count(*) AS n
        FROM fn_money GROUP BY k ORDER BY k""").collect()
      assert(rows(0).getString(0) === "a")
      assert(rows(0).getLong(1) === 313L)
      assert(rows(1).getString(0) === "b")
      assert(rows(1).isNullAt(1))
      // and against the Money surface on real data
      val li = graft.sources.Tables.lineitem(spark, sf("sf0.001"))
      li.createOrReplaceTempView("fn_li")
      val viaFn = spark.sql(s"""
        SELECT $cat.sum_cents(l_extendedprice) AS cents
        FROM fn_li""").collect().head.getLong(0)
      val viaMoney = li.agg(
        graft.functions.Money.sumCents(col("l_extendedprice")).as("c"))
        .collect().head.getLong(0)
      assert(viaFn === viaMoney)
    }
  }

  test("sum_cents plans as a partial/merge aggregate — map-side " +
      "combine before the shuffle") {
    withCatalog {
      graft.sources.Tables.lineitem(spark, sf("sf0.001"))
        .createOrReplaceTempView("fn_li2")
      val df = spark.sql(s"""
        SELECT l_returnflag, $cat.sum_cents(l_extendedprice) AS cents
        FROM fn_li2 GROUP BY l_returnflag""")
      val plan = df.queryExecution.executedPlan.toString
      // V2 aggregates plan as TypedImperativeAggregate: two
      // aggregate stages (partial below the exchange, final above)
      val aggStages = "(?i)aggregate".r.findAllIn(plan).size
      assert(plan.toLowerCase.contains("exchange"), plan)
      assert(aggStages >= 2, s"expected partial+final aggregate:\n$plan")
      assert(df.collect().nonEmpty)
    }
  }

  test("merge is associative and state-isolated at the unit level") {
    val f = new V2Functions.SumCentsBound
    def upd(s: V2Functions.SumCentsState, v: Double) =
      f.update(s, InternalRow(v))
    val a = upd(upd(f.newAggregationState(), 1.00), 2.00)
    val b = upd(f.newAggregationState(), 0.50)
    val c = f.newAggregationState() // empty partition
    val m = f.merge(f.merge(a, b), c)
    assert(f.produceResult(m) === 350L)
    assert(f.produceResult(f.newAggregationState()) === null)
  }

  test("listFunctions surfaces the registry; unknown names fail " +
      "with NoSuchFunction") {
    withCatalog {
      val shown = spark.sql(s"SHOW FUNCTIONS IN $cat")
        .collect().map(_.getString(0)).toSet
      assert(V2Functions.names.forall(n => shown.exists(_.endsWith(n))),
        s"missing functions in $shown")
      val err = intercept[Exception] {
        spark.sql(s"SELECT $cat.no_such_fn(1)").collect()
      }
      assert(err.getMessage.toLowerCase.contains("no_such_fn"))
    }
  }

  test("bind refuses wrong arities and types with a clear message") {
    withCatalog {
      val e1 = intercept[Exception] {
        spark.sql(s"SELECT $cat.cosine_sim(array(1.0F))").collect()
      }
      assert(e1.getMessage.contains("cosine_sim"))
      val e2 = intercept[Exception] {
        spark.sql(s"SELECT $cat.sum_cents('x')").collect()
      }
      assert(e2.getMessage.contains("sum_cents"))
    }
  }
}
