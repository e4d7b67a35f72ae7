package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.Catalog.Q

/** JSON datasource read — the third leg of the SURVEY §2.2 sources
  * claim (parquet, csv-text, json). The rates table is a committed
  * JSON-lines fixture (`tools/gen_rates_fixture.py`) read through
  * Spark's DSv2 json source with an EXPLICIT schema: schema
  * inference costs a full extra pass over the data at scale and
  * silently widens types; a declared schema is the only sane
  * contract for a 100 TB ingest (Spark then prunes unreferenced
  * JSON fields during parsing).
  */
object JsonSource {

  val RatesJson = Fixtures.path("fixtures/rates.json")

  /** Explicit schema, nested struct included — no inference pass. */
  val ratesSchema: StructType = StructType(Seq(
    StructField("n_nationkey", IntegerType),
    StructField("currency", StringType),
    StructField("tax_bp", LongType),
    StructField("surcharge_cents", LongType),
    StructField("limits", StructType(Seq(
      StructField("min_order_cents", LongType),
      StructField("max_order_cents", LongType))))))

  def rates(s: SparkSession): DataFrame =
    s.read.schema(ratesSchema).json(RatesJson)

  /** Judged query: nation enriched with its JSON-side billing rates
    * plus a customer count. The 25-row JSON dim is broadcast to both
    * joins; at scale the only shuffle is the customer count's
    * partial-aggregated exchange. All output numerics are integral,
    * so the oracle compare is exact.
    */
  def q28JsonSource(s: SparkSession, d: String): DataFrame = {
    val cust = Tables.customer(s, d)
      .groupBy(col("c_nationkey")).agg(count(lit(1)).as("n_customers"))
    Tables.nation(s, d)
      .join(broadcast(rates(s)), Seq("n_nationkey"))
      .join(cust, col("n_nationkey") === col("c_nationkey"), "left")
      .select(col("n_nationkey"), col("n_name"), col("currency"),
        col("tax_bp"), col("surcharge_cents"),
        col("limits.min_order_cents").as("min_order_cents"),
        col("limits.max_order_cents").as("max_order_cents"),
        coalesce(col("n_customers"), lit(0L)).as("n_customers"))
      .orderBy(col("n_nationkey"))
  }

  // -- strict-schema CSV datasource ------------------------------------

  val FxCsv = Fixtures.path("fixtures/fx.csv")

  val fxSchema: StructType = StructType(Seq(
    StructField("currency", StringType),
    StructField("usd_per_unit_micro", LongType)))

  /** DSv2 csv read with header + EXPLICIT schema — the strict-schema
    * path (the reference-parity weather module instead reads raw
    * text and tokenizes, because the reference's per-line arity
    * dispatch is not CSV-strict). Inference is off for the same
    * reason as JSON: at 100 TB it costs a full extra pass.
    */
  def fx(s: SparkSession): DataFrame =
    s.read.schema(fxSchema).option("header", "true").csv(FxCsv)

  /** Judged query: JSON rates ⋈ CSV fx — each nation's surcharge
    * converted to exact micro-USD (cents × micro-per-unit / 100,
    * integral all the way). Two broadcast dims, zero shuffles.
    */
  def q29CsvSource(s: SparkSession, d: String): DataFrame =
    Tables.nation(s, d)
      .join(broadcast(rates(s)), Seq("n_nationkey"))
      .join(broadcast(fx(s)), Seq("currency"))
      .select(col("n_nationkey"), col("n_name"), col("currency"),
        col("usd_per_unit_micro"),
        // integer div, not `/`: fractional division then cast would
        // TRUNCATE in Spark but ROUND in DuckDB — integral math only
        expr("surcharge_cents * usd_per_unit_micro div 100")
          .as("surcharge_micro_usd"))
      .orderBy(col("n_nationkey"))

  val queries: Seq[Q] = Seq(
    Q("q29_csv_source", q29CsvSource, Some(s"""
      WITH r AS (
        SELECT n_nationkey, currency, surcharge_cents
        FROM read_json('$RatesJson', format='newline_delimited',
               columns={'n_nationkey':'INTEGER','currency':'VARCHAR',
                        'tax_bp':'BIGINT','surcharge_cents':'BIGINT',
                        'limits':'STRUCT(min_order_cents BIGINT, max_order_cents BIGINT)'})),
      fx AS (
        SELECT currency, usd_per_unit_micro
        FROM read_csv('$FxCsv', header=true,
               columns={'currency':'VARCHAR','usd_per_unit_micro':'BIGINT'}))
      SELECT n.n_nationkey, n.n_name, r.currency, fx.usd_per_unit_micro,
             CAST(r.surcharge_cents * fx.usd_per_unit_micro // 100 AS BIGINT)
               AS surcharge_micro_usd
      FROM nation n
      JOIN r USING (n_nationkey)
      JOIN fx USING (currency)
      ORDER BY n.n_nationkey""")),
    Q("q28_json_source", q28JsonSource, Some(s"""
      WITH r AS (
        SELECT n_nationkey, currency, tax_bp, surcharge_cents,
               struct_extract(limits, 'min_order_cents') AS min_order_cents,
               struct_extract(limits, 'max_order_cents') AS max_order_cents
        FROM read_json('$RatesJson', format='newline_delimited',
               columns={'n_nationkey':'INTEGER','currency':'VARCHAR',
                        'tax_bp':'BIGINT','surcharge_cents':'BIGINT',
                        'limits':'STRUCT(min_order_cents BIGINT, max_order_cents BIGINT)'})),
      c AS (
        SELECT c_nationkey, count(*) AS n_customers FROM customer GROUP BY 1)
      SELECT n.n_nationkey, n.n_name, r.currency, r.tax_bp, r.surcharge_cents,
             r.min_order_cents, r.max_order_cents,
             coalesce(c.n_customers, 0) AS n_customers
      FROM nation n
      JOIN r USING (n_nationkey)
      LEFT JOIN c ON n.n_nationkey = c.c_nationkey
      ORDER BY n.n_nationkey"""))
  )
}
