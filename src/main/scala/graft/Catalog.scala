package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Central registry of judged queries.
  *
  * Each module contributes a `Seq[Q]`; SparkEntry flattens them into
  * the driver contract. A `Q` with `oracle = None` is a
  * non-SQL-expressible operator (e.g. MinHash banding) that the
  * driver checks rows-only.
  *
  * Contract note: `Q.fn` returns a lazy DataFrame, but CONSTRUCTING
  * it may run bounded scalar probe jobs (adaptive sizing/routing:
  * e2/e5's corpus count, d7's token-frequency probe, the streaming
  * gates' sentinel placement) and, for source/sink and streaming
  * queries, materialize scratch artifacts. Callers should treat
  * `fn(...)` itself as potentially costing a few small Spark jobs —
  * the price of data-driven plans — and must consume the result
  * before re-invoking the same query (Housekeeping retires the
  * previous invocation's scratch on re-entry).
  */
object Catalog {
  final case class Q(
      name: String,
      fn: (SparkSession, String) => DataFrame,
      oracle: Option[String])

  def all: Seq[Q] =
    graft.operators.Relational.queries ++
      graft.operators.Joins.queries ++
      graft.operators.Aggregates.queries ++
      graft.operators.Windows.queries ++
      graft.operators.SetOps.queries ++
      graft.operators.Scalars.queries ++
      graft.operators.Advanced.queries ++
      graft.operators.Sessionize.queries ++
      graft.operators.Composite.queries ++
      graft.operators.ExactQuantile.queries ++
      graft.operators.HeavyHitters.queries ++
      graft.operators.KmvSketch.queries ++
      graft.operators.CmsSketch.queries ++
      graft.operators.FuzzyJoin.queries ++
      graft.operators.Etl.queries ++
      graft.operators.Layout.queries ++
      graft.operators.Skew.queries ++
      graft.operators.TextAnalysis.queries ++
      graft.operators.BpeTrain.queries ++
      graft.operators.Curation.queries ++
      graft.operators.Dedup.queries ++
      graft.operators.SemanticDedup.queries ++
      graft.operators.Similarity.queries ++
      graft.multimodal.Multimodal.queries ++
      graft.multimodal.MediaCodecs.queries ++
      graft.multimodal.ImageDedup.queries ++
      graft.weather.Weather.queries ++
      graft.sources.JsonSource.queries ++
      graft.sources.SeriesQueries.queries ++
      graft.sources.LedgerQueries.queries ++
      graft.sources.Sinks.queries ++
      graft.sources.SnapshotLake.queries ++
      graft.sources.LakeWriteQueries.queries ++
      graft.sources.LakeCatalogQueries.queries ++
      graft.streaming.StreamingGate.queries

  def queryMap: Map[String, (SparkSession, String) => DataFrame] =
    all.map(q => q.name -> q.fn).toMap

  def oracleMap: Map[String, String] =
    all.collect { case Q(n, _, Some(sql)) => n -> sql.trim }.toMap
}
