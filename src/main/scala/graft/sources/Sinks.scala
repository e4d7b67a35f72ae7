package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode}

/** Write-side breadth (the reference's only sink is tab-separated
  * text, SURVEY.md §2.1 O13). Two layouts that matter at 100 TB:
  *
  * - Hive-style partitioned parquet: the standard lake layout —
  *   partition pruning turns predicates on the partition column into
  *   directory skips, so a month-scoped query over a 100 TB table
  *   reads one directory.
  * - Bucketed tables: pre-shuffled on the join/agg key at write time;
  *   two tables co-bucketed on the same key join with ZERO exchange —
  *   the write-once-shuffle-never pattern for fact-to-fact joins.
  */
object Sinks {

  /** Partition-pruned lake layout. Cardinality warning applies: the
    * partition column must be low-cardinality (dates, regions), never
    * an id — each value becomes a directory.
    */
  def writePartitioned(df: DataFrame, path: String, partitionCols: String*): Unit =
    df.write.mode(SaveMode.Overwrite).partitionBy(partitionCols: _*).parquet(path)

  /** Bucketed managed table (in-memory catalog / warehouse dir).
    * `numBuckets` should match the cluster's target parallelism for
    * the downstream join, not the current core count.
    */
  def writeBucketed(df: DataFrame, table: String, bucketCol: String,
      numBuckets: Int, sortCol: Option[String] = None): Unit = {
    val w = df.write.mode(SaveMode.Overwrite)
      .format("parquet").bucketBy(numBuckets, bucketCol)
    sortCol.fold(w)(c => w.sortBy(c)).saveAsTable(table)
  }
}
