package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see SURVEY.md §7 and the per-module query registries.
  *
  * `queries` is the union of the module registries; every key that is
  * SQL-expressible also appears in `oracleSql` with column names aligned
  * to the Spark result (the driver sorts columns by name before hashing).
  */
object SparkEntry {

  /** Flagship query on sf0.001: the CDC materialized view (SURVEY.md §2
    * O10) — latest non-deleted row per key of the change stream.
    */
  def entry(spark: SparkSession): DataFrame =
    cdc.CdcQueries.materialize(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    cdc.CdcQueries.queries ++ analytics.Dashboards.queries ++
      ext.Tpch.queries ++ ext.Dedup.queries ++ ext.Similarity.queries ++
      ext.TextAnalysis.queries ++ ext.Multimodal.queries ++
      ext.Sessions.queries ++ ext.Sampling.queries ++ ext.Pipeline.queries ++
      ext.Temporal.queries ++ ext.Prep.queries ++ ext.Relational.queries ++
      ext.Search.queries ++ ext.Bloom.queries ++ ext.Validate.queries

  def oracleSql: Map[String, String] =
    cdc.CdcQueries.oracle ++ analytics.Dashboards.oracle ++
      ext.Tpch.oracle ++ ext.Dedup.oracle ++ ext.Similarity.oracle ++
      ext.TextAnalysis.oracle ++ ext.Multimodal.oracle ++
      ext.Sessions.oracle ++ ext.Sampling.oracle ++ ext.Pipeline.oracle ++
      ext.Temporal.oracle ++ ext.Prep.oracle ++ ext.Relational.oracle ++
      ext.Search.oracle ++ ext.Bloom.oracle ++ ext.Validate.oracle
}
