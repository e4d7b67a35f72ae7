package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.sources.Tables
import graft.Catalog.Q

/** Scalar function breadth: string / date / math functions, all
  * row-wise and codegen'd (the reference's scalar surface is just
  * trim/split/startsWith/format — SURVEY.md §2.2). Transcendentals
  * (sin/log/exp) are deliberately excluded from oracle-compared
  * output: libm results differ across engines in the last ulp.
  * sqrt IS exact (IEEE-defined), so it stays.
  */
object Scalars {

  /** String zoo over part. DuckDB length/strpos return BIGINT where
    * Spark returns INT — the oracle casts to match Spark.
    */
  def q14StringFuncs(s: SparkSession, d: String): DataFrame =
    Tables.part(s, d)
      .select(
        col("p_partkey"),
        upper(col("p_name")).as("name_upper"),
        lower(col("p_brand")).as("brand_lower"),
        length(col("p_name")).as("name_len"),
        substring(col("p_name"), 1, 5).as("name_pfx"),
        concat_ws("|", col("p_brand"), col("p_type")).as("brand_type"),
        regexp_replace(col("p_type"), "[aeiou]", "_").as("type_devowel"),
        reverse(col("p_brand")).as("brand_rev"),
        lpad(col("p_size").cast(StringType), 4, "0").as("size_pad"),
        col("p_name").contains("red").cast(StringType).as("has_red"))
      .orderBy(col("p_partkey"))

  /** Date/time zoo over orders: component extraction, truncation,
    * arithmetic, formatting.
    */
  def q15DateFuncs(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .select(
        col("o_orderkey"),
        year(col("o_orderdate")).as("yr"),
        month(col("o_orderdate")).as("mo"),
        dayofmonth(col("o_orderdate")).as("dom"),
        quarter(col("o_orderdate")).as("qtr"),
        date_trunc("month", col("o_orderdate")).as("month_start"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("iso_day"),
        datediff(lit("2026-01-01").cast(DateType),
          col("o_orderdate").cast(DateType)).as("days_to_2026"))
      .orderBy(col("o_orderkey"))

  /** Math zoo over lineitem: exact-on-IEEE operations only. */
  def q16MathFuncs(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .select(
        col("l_orderkey"), col("l_linenumber"),
        abs(col("l_discount") - 0.5).as("abs_off"),
        floor(col("l_extendedprice")).as("price_floor"),
        ceil(col("l_extendedprice")).as("price_ceil"),
        sqrt(col("l_quantity")).as("qty_sqrt"),
        pow(col("l_quantity"), lit(2.0)).as("qty_sq"),
        (col("l_extendedprice") * (lit(1.0) - col("l_discount")) *
          (lit(1.0) + col("l_tax"))).as("charged"),
        greatest(col("l_quantity"), col("l_discount") * 100).as("gx"),
        least(col("l_quantity"), col("l_tax") * 100).as("lx"))
      .orderBy(col("l_orderkey"), col("l_linenumber"))

  /** CASE/conditional zoo: when/otherwise, nullif-style, if. */
  def q20Conditionals(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .select(
        col("o_orderkey"),
        when(col("o_totalprice") > 250000, "high")
          .when(col("o_totalprice") > 100000, "mid")
          .otherwise("low").as("price_band"),
        when(col("o_orderstatus") === "F", col("o_totalprice")).as("finished_price"),
        coalesce(when(col("o_orderpriority") === "1-URGENT", lit("urgent")),
          lit("normal")).as("prio"))
      .orderBy(col("o_orderkey"))

  /** Array higher-order functions — transform / filter / aggregate
    * over a per-order quantity array. The collect_list is wrapped in
    * sort_array because collection order is partition-dependent;
    * after sorting, the HOF results are deterministic and the left
    * folds map exactly to DuckDB's list_* functions (PLAYBOOK: Spark
    * aggregate == list_reduce, transform == list_transform). Fine
    * for oracle certification of lambda semantics; hot per-token
    * kernels use the native expressions instead (HOFs evaluate
    * interpreted).
    */
  def q36ArrayHof(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .groupBy(col("l_orderkey"))
      .agg(sort_array(collect_list(round(col("l_quantity")).cast(IntegerType)))
        .as("qtys"))
      .select(col("l_orderkey"),
        size(col("qtys")).as("n_items"),
        size(filter(col("qtys"), x => x > 25)).as("n_big"),
        aggregate(col("qtys"), lit(0L), (a, x) => a + x.cast(LongType))
          .as("total_qty"),
        // serialized, not a raw array<int>: the driver's compare
        // harness sorts rows via pandas, which cannot hash ndarray
        // cells — array-typed judged outputs record `err` instead of
        // a verdict (CORRECTNESS_r02). Both engines emit the same
        // compact JSON text ("[2,4,6]"), so the hash compare is exact.
        to_json(transform(col("qtys"), x => x * 2)).as("doubled"))
      .orderBy(col("l_orderkey"))

  /** MapType surface: construction (map / map_from pairs), merge
    * (map_concat), lookup (element_at), keys/size, predicate filter
    * (map_filter), and value transformation (transform_values). The
    * judged output is flattened to scalars: map-typed cells would hit
    * the same harness limitation as raw arrays (CORRECTNESS_r02),
    * and the oracle certifies the VALUES the map ops produce by
    * computing them straight from the base columns — if any map op
    * mis-stored, mis-merged, or mis-looked-up an entry, the scalars
    * diverge.
    */
  def q42MapFuncs(s: SparkSession, d: String): DataFrame = {
    val base = map(
      lit("status"), col("o_orderstatus"),
      lit("prio"), substring_index(col("o_orderpriority"), "-", 1))
    val merged = map_concat(base,
      map(lit("bucket"), (col("o_orderkey") % 10).cast(StringType)))
    val cents = map(lit("price"),
      round(col("o_totalprice") * 100).cast(LongType))
    Tables.orders(s, d)
      .select(
        col("o_orderkey"),
        element_at(merged, "status").as("status"),
        element_at(merged, "prio").as("prio_num"),
        element_at(merged, "bucket").as("bucket"),
        size(map_keys(merged)).as("n_keys"),
        map_contains_key(merged, "status").as("has_status"),
        element_at(transform_values(cents, (_, v) => v * 2), "price")
          .as("double_price_cents"),
        size(map_filter(merged, (_, v) => v === "O")).as("n_open_vals"))
      .orderBy(col("o_orderkey"))
  }

  /** ANSI-safe `try_*` arithmetic — Spark 4 runs ANSI mode by
    * default, so raw arithmetic THROWS on overflow / division by
    * zero; the try_ family returns NULL instead, which is the only
    * sane per-row contract for a 100 TB pipeline (one dirty row must
    * not kill a 6-hour job). The operands are rigged so both failure
    * modes actually fire row-dependently: l_discount=0 rows divide
    * by zero, and quantities above 25 overflow the Long headroom.
    * The oracle reproduces NULL-on-failure with CASE guards (DuckDB
    * would ERROR on the overflow if it evaluated it — selection-
    * vector laziness keeps the guarded branch unevaluated).
    */
  def q46TryArithmetic(s: SparkSession, d: String): DataFrame = {
    val qty = round(col("l_quantity")).cast(LongType)
    val bp = round(col("l_discount") * 100).cast(LongType)
    Tables.lineitem(s, d)
      .select(
        col("l_orderkey"), col("l_linenumber"),
        try_divide(col("l_extendedprice"), col("l_discount")).as("price_per_disc"),
        try_divide(qty, bp).as("qty_per_bp"),
        try_add(lit(Long.MaxValue - 25), qty).as("guarded_add"),
        try_multiply(lit(Long.MaxValue / 25), qty).as("guarded_mul"))
      .orderBy(col("l_orderkey"), col("l_linenumber"))
  }

  /** Second array zoo: predicates (exists / forall), search
    * (array_position), slicing, flatten, and a two-array zip_with —
    * the HOF surface q36 doesn't cover. Same harness convention:
    * array-valued outputs serialize through to_json.
    */
  def q47ArrayFuncs2(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .groupBy(col("l_orderkey"))
      .agg(sort_array(collect_list(round(col("l_quantity")).cast(IntegerType)))
        .as("qtys"))
      .select(col("l_orderkey"),
        exists(col("qtys"), x => x > 45).as("any_big"),
        forall(col("qtys"), x => x > 0).as("all_pos"),
        array_position(col("qtys"), 10).as("pos10"),
        to_json(slice(col("qtys"), 1, 3)).as("first3"),
        size(flatten(array(col("qtys"), col("qtys")))).as("n_doubled"),
        to_json(zip_with(col("qtys"), reverse(col("qtys")),
          (a, b) => a * b)).as("minmax_prod"))
      .orderBy(col("l_orderkey"))

  /** Bitwise functions over the key columns — shifts, and/or/xor,
    * popcount. All integer-exact, so the oracle is a direct
    * transliteration (DuckDB's bit_count returns BIGINT where Spark
    * returns INT — cast on the oracle side, the playbook rule).
    */
  def q48Bitwise(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .select(
        col("l_orderkey"), col("l_linenumber"),
        shiftleft(col("l_linenumber"), 3).as("shl"),
        shiftright(col("l_orderkey"), 2).as("shr"),
        col("l_orderkey").bitwiseAND(lit(255L)).as("band"),
        col("l_orderkey").bitwiseOR(col("l_linenumber").cast(LongType)).as("bor"),
        col("l_orderkey").bitwiseXOR(col("l_linenumber").cast(LongType)).as("bxor"),
        bit_count(col("l_orderkey")).as("popcount"))
      .orderBy(col("l_orderkey"), col("l_linenumber"))

  val queries: Seq[Q] = Seq(
    Q("q46_try_arithmetic", q46TryArithmetic, Some(s"""
      WITH b AS (
        SELECT l_orderkey, l_linenumber,
               l_extendedprice, l_discount,
               CAST(round(l_quantity) AS BIGINT) AS qty,
               CAST(round(l_discount * 100) AS BIGINT) AS bp
        FROM lineitem)
      SELECT l_orderkey, l_linenumber,
             CASE WHEN l_discount = 0 THEN NULL
                  ELSE l_extendedprice / l_discount END AS price_per_disc,
             CASE WHEN bp = 0 THEN NULL
                  ELSE CAST(qty AS DOUBLE) / CAST(bp AS DOUBLE) END AS qty_per_bp,
             CASE WHEN qty > 25 THEN NULL
                  ELSE ${Long.MaxValue - 25} + qty END AS guarded_add,
             CASE WHEN qty > 25 THEN NULL
                  ELSE ${Long.MaxValue / 25} * qty END AS guarded_mul
      FROM b
      ORDER BY l_orderkey, l_linenumber""")),
    Q("q47_array_funcs2", q47ArrayFuncs2, Some("""
      SELECT l_orderkey,
             len(list_filter(qtys, x -> x > 45)) > 0 AS any_big,
             len(list_filter(qtys, x -> x <= 0)) = 0 AS all_pos,
             CAST(coalesce(list_position(qtys, 10), 0) AS BIGINT) AS pos10,
             CAST(to_json(qtys[1:3]) AS VARCHAR) AS first3,
             CAST(2 * len(qtys) AS INTEGER) AS n_doubled,
             CAST(to_json(list_transform(list_zip(qtys, list_reverse(qtys)),
               p -> p[1] * p[2])) AS VARCHAR) AS minmax_prod
      FROM (SELECT l_orderkey,
                   list_sort(list(CAST(round(l_quantity) AS INTEGER))) AS qtys
            FROM lineitem GROUP BY 1)
      ORDER BY l_orderkey""")),
    Q("q48_bitwise", q48Bitwise, Some("""
      SELECT l_orderkey, l_linenumber,
             CAST(l_linenumber << 3 AS INTEGER) AS shl,
             CAST(l_orderkey >> 2 AS BIGINT) AS shr,
             CAST(l_orderkey & 255 AS BIGINT) AS band,
             CAST(l_orderkey | CAST(l_linenumber AS BIGINT) AS BIGINT) AS bor,
             CAST(xor(l_orderkey, CAST(l_linenumber AS BIGINT)) AS BIGINT) AS bxor,
             CAST(bit_count(l_orderkey) AS INTEGER) AS popcount
      FROM lineitem
      ORDER BY l_orderkey, l_linenumber""")),
    Q("q42_map_funcs", q42MapFuncs, Some("""
      SELECT o_orderkey,
             o_orderstatus AS status,
             string_split(o_orderpriority, '-')[1] AS prio_num,
             CAST(o_orderkey % 10 AS VARCHAR) AS bucket,
             CAST(3 AS INTEGER) AS n_keys,
             true AS has_status,
             CAST(round(o_totalprice * 100) AS BIGINT) * 2 AS double_price_cents,
             CAST(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END AS INTEGER)
               AS n_open_vals
      FROM orders
      ORDER BY o_orderkey""")),
    Q("q36_array_hof", q36ArrayHof, Some("""
      SELECT l_orderkey,
             CAST(len(qtys) AS INTEGER) AS n_items,
             CAST(len(list_filter(qtys, x -> x > 25)) AS INTEGER) AS n_big,
             CAST(list_sum(qtys) AS BIGINT) AS total_qty,
             CAST(to_json(list_transform(qtys, x -> x * 2)) AS VARCHAR) AS doubled
      FROM (SELECT l_orderkey,
                   list_sort(list(CAST(round(l_quantity) AS INTEGER))) AS qtys
            FROM lineitem GROUP BY 1)
      ORDER BY l_orderkey""")),
    Q("q14_string_funcs", q14StringFuncs, Some("""
      SELECT p_partkey,
             upper(p_name) AS name_upper,
             lower(p_brand) AS brand_lower,
             CAST(length(p_name) AS INTEGER) AS name_len,
             substr(p_name, 1, 5) AS name_pfx,
             concat_ws('|', p_brand, p_type) AS brand_type,
             regexp_replace(p_type, '[aeiou]', '_', 'g') AS type_devowel,
             reverse(p_brand) AS brand_rev,
             lpad(CAST(p_size AS VARCHAR), 4, '0') AS size_pad,
             CAST(contains(p_name, 'red') AS VARCHAR) AS has_red
      FROM part
      ORDER BY p_partkey""")),
    Q("q15_date_funcs", q15DateFuncs, Some("""
      SELECT o_orderkey,
             CAST(year(o_orderdate) AS INTEGER) AS yr,
             CAST(month(o_orderdate) AS INTEGER) AS mo,
             CAST(day(o_orderdate) AS INTEGER) AS dom,
             CAST(quarter(o_orderdate) AS INTEGER) AS qtr,
             CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month_start,
             strftime(o_orderdate, '%Y-%m-%d') AS iso_day,
             CAST(datediff('day', CAST(o_orderdate AS DATE), DATE '2026-01-01') AS INTEGER) AS days_to_2026
      FROM orders
      ORDER BY o_orderkey""")),
    Q("q16_math_funcs", q16MathFuncs, Some("""
      SELECT l_orderkey, l_linenumber,
             abs(l_discount - 0.5) AS abs_off,
             CAST(floor(l_extendedprice) AS BIGINT) AS price_floor,
             CAST(ceil(l_extendedprice) AS BIGINT) AS price_ceil,
             sqrt(l_quantity) AS qty_sqrt,
             pow(l_quantity, 2.0) AS qty_sq,
             l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax) AS charged,
             greatest(l_quantity, l_discount * 100) AS gx,
             least(l_quantity, l_tax * 100) AS lx
      FROM lineitem
      ORDER BY l_orderkey, l_linenumber""")),
    Q("q20_conditionals", q20Conditionals, Some("""
      SELECT o_orderkey,
             CASE WHEN o_totalprice > 250000 THEN 'high'
                  WHEN o_totalprice > 100000 THEN 'mid'
                  ELSE 'low' END AS price_band,
             CASE WHEN o_orderstatus = 'F' THEN o_totalprice END AS finished_price,
             coalesce(CASE WHEN o_orderpriority = '1-URGENT' THEN 'urgent' END,
                      'normal') AS prio
      FROM orders
      ORDER BY o_orderkey"""))
  )
}
