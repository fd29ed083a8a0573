package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-provided parquet tables (TESTDATA.md).
  *
  * All queries take `(spark, sfDir)` and read only the columns they need —
  * Catalyst pushes the projection and any filters into the parquet scan
  * (`V2ScanRelationPushDown`), so at 100 TB the scan cost is bounded by the
  * referenced columns, not the table width.
  */
object Tables {
  def table(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  /** `events.ts` is written as parquet TIMESTAMP(NANOS), which Spark does
    * not read natively. Read it as a nanosecond long and truncate to a
    * microsecond timestamp — the same floor-truncation DuckDB applies when
    * casting TIMESTAMP_NS to TIMESTAMP, so the oracle stays value-identical
    * (oracle SQL uses `CAST(ts AS TIMESTAMP)`). The conf is set at read
    * time so the query works under any caller-provided session.
    */
  def events(spark: SparkSession, sfDir: String): DataFrame =
    eventsRaw(spark, sfDir)
      .withColumn("ts", org.apache.spark.sql.functions.expr("timestamp_micros(ts div 1000)"))

  /** Events with `ts` still the raw parquet nanosecond long. Time-range
    * operators filter HERE before the timestamp rewrite: a predicate on
    * the raw column reaches the parquet scan as a pushed filter (rowgroup
    * min/max skipping), which a predicate on the derived timestamp never
    * can.
    */
  def eventsRaw(spark: SparkSession, sfDir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    table(spark, sfDir, "events")
  }
  def customer(spark: SparkSession, sfDir: String): DataFrame   = table(spark, sfDir, "customer")
  def orders(spark: SparkSession, sfDir: String): DataFrame     = table(spark, sfDir, "orders")
  def lineitem(spark: SparkSession, sfDir: String): DataFrame   = table(spark, sfDir, "lineitem")
  def part(spark: SparkSession, sfDir: String): DataFrame       = table(spark, sfDir, "part")
  def supplier(spark: SparkSession, sfDir: String): DataFrame   = table(spark, sfDir, "supplier")
  def nation(spark: SparkSession, sfDir: String): DataFrame     = table(spark, sfDir, "nation")
  def region(spark: SparkSession, sfDir: String): DataFrame     = table(spark, sfDir, "region")
  def documents(spark: SparkSession, sfDir: String): DataFrame  = table(spark, sfDir, "documents")
  def embeddings(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "embeddings")
}
