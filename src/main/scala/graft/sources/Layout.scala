package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Data-layout operators: how the engine WRITES so that future scans
  * prune. At 100 TB the difference between "scan everything and filter"
  * and "never open the file" is the dominant cost of every downstream
  * query, so layout is an operator, not an afterthought.
  *
  *   - Hive-style partitioned writes: one directory per partition value;
  *     a filter on the partition column becomes a `PartitionFilters`
  *     entry in the scan and non-matching directories are never listed.
  *   - Sorted-within-partitions writes: rowgroup-level min/max stats
  *     become selective, so predicate pushdown skips rowgroups even
  *     within a file (the poor-man's z-order for a single sort key; at
  *     scale, `repartitionByRange` first gives global range layout).
  *
  * (Bucketed writes — `bucketBy` + `saveAsTable` — are the third layout
  * tool, pinning a shuffle-free join key; they need a metastore-backed
  * table rather than a bare path, so this demo surface sticks to the
  * path-based forms.)
  */
object Layout {

  /** Write hive-partitioned by `cols` (directory per value). */
  def writePartitioned(df: DataFrame, path: String, cols: String*): Unit =
    df.write.partitionBy(cols: _*).mode("overwrite").parquet(path)

  /** Write range-partitioned AND sorted by `col`: global range layout
    * across files plus monotone rowgroups within each — both the file
    * list and the rowgroup stats become selective for range predicates.
    */
  def writeSorted(df: DataFrame, path: String, col: String,
      partitions: Int = 8): Unit =
    df.repartitionByRange(partitions, org.apache.spark.sql.functions.col(col))
      .sortWithinPartitions(col)
      .write.mode("overwrite").parquet(path)

  /** Read back a partitioned/sorted layout. Filters applied by the
    * caller reach the scan as PartitionFilters / PushedFilters — the
    * layout spec asserts both.
    */
  def read(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)
}
