package graft.cdc

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Driver-verifiable queries for the CDC operator set (SURVEY.md §2
  * O1-O13). Each entry has matching DuckDB oracle SQL in [[oracle]];
  * column names are aligned between the Spark plan and the SQL because the
  * driver's comparator sorts columns by name before hashing.
  */
object CdcQueries {

  type Q = (SparkSession, String) => DataFrame

  /** O1 — CDC source scan: the raw change feed normalized to the internal
    * event model (seq, key, op, payload). Pure projection; no shuffle.
    */
  def cdcScan(spark: SparkSession, sfDir: String): DataFrame =
    CdcModel.fromEvents(Tables.events(spark, sfDir))

  /** O10 — the flagship materialization: latest non-deleted row per key. */
  def materialize(spark: SparkSession, sfDir: String): DataFrame =
    Materialize.customerView(Tables.events(spark, sfDir))

  val queries: Map[String, Q] = Map(
    "o01_cdc_scan" -> (cdcScan _),
    "o10_materialize" -> (materialize _)
  )

  val oracle: Map[String, String] = Map(
    "o01_cdc_scan" ->
      """SELECT event_id AS seq, user_id AS key,
        |  CASE WHEN event_type = 'error' THEN 'd'
        |       WHEN event_type = 'signup' THEN 'c'
        |       ELSE 'u' END AS op,
        |  CAST(ts AS TIMESTAMP) AS ts, value, props
        |FROM events""".stripMargin,
    "o10_materialize" ->
      """SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts, event_type, value, props
        |FROM (
        |  SELECT user_id, event_id, ts, event_type, value, props,
        |         row_number() OVER (PARTITION BY user_id ORDER BY event_id DESC) AS rn
        |  FROM events
        |) WHERE rn = 1 AND event_type <> 'error'""".stripMargin
  )
}
