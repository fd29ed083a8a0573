package graft.cdc

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** O2/O3/O4 — the write path: a deterministic, distributed CDC event
  * generator standing in for the reference's Faker-driven
  * insert/update/delete producer (`producer_insert.py:11-94`).
  *
  * Differences by design:
  *   - deterministic pure-arithmetic columns (no Faker, no RNG state) so
  *     the DuckDB oracle can regenerate the identical stream from SQL;
  *   - generated from `spark.range(n)` — embarrassingly parallel, no data
  *     movement, scales to any n on any cluster (the reference writes one
  *     row per interactive CLI call);
  *   - `RETURNING` (`producer_insert.py:27-34,61-65,89-90`) maps to the
  *     returned DataFrame itself.
  *
  * Op mix: i mod 10 == 0 → delete, == 1 → insert-burst key reuse pattern;
  * keys cycle mod 100 so every key sees multiple writes and some deletes —
  * the interesting CDC shapes (update-after-delete, delete-as-last-op) all
  * occur.
  */
object Producer {

  val N = 1000L
  val Keys = 100

  def events(spark: SparkSession): DataFrame =
    spark.range(0, N).select(
      col("id").as("seq"),
      (col("id") % Keys).cast("int").as("key"),
      when(col("id") % 10 === 0, "d")
        .when(col("id") < Keys, "c") // first cycle: inserts
        .otherwise("u").as("op"),
      concat(lit("name_"), (col("id") % Keys).cast("string")).as("full_name"),
      concat(lit("user"), (col("id") % Keys).cast("string"), lit("@example.com")).as("email"),
      when(col("id") % 7 === 0, lit(null).cast("string"))
        .otherwise(concat(lit("+1-555-"), (col("id") % 10000).cast("string"))).as("phone"),
      when(col("id") % 2 === 0, "public").otherwise("private").as("classification"),
      timestamp_seconds(lit(1704067200L) + col("id")).as("created_at"))

  /** Shared oracle-SQL fragment regenerating the same stream in DuckDB. */
  val oracleSql: String =
    """SELECT i AS seq, CAST(i % 100 AS INTEGER) AS key,
      |  CASE WHEN i % 10 = 0 THEN 'd' WHEN i < 100 THEN 'c' ELSE 'u' END AS op,
      |  'name_' || CAST(i % 100 AS VARCHAR) AS full_name,
      |  'user' || CAST(i % 100 AS VARCHAR) || '@example.com' AS email,
      |  CASE WHEN i % 7 = 0 THEN NULL
      |       ELSE '+1-555-' || CAST(i % 10000 AS VARCHAR) END AS phone,
      |  CASE WHEN i % 2 = 0 THEN 'public' ELSE 'private' END AS classification,
      |  TIMESTAMP '2024-01-01 00:00:00' + to_seconds(i) AS created_at
      |FROM range(0, 1000) t(i)""".stripMargin
}
