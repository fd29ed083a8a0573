package graft.analytics

import graft.SparkSpec

/** The dashboard queries' scans must be pruned to the columns each panel
  * consumes: max_by materialization is opaque to Catalyst's column
  * pruning, so the payload pruning happens at view construction — these
  * assertions keep it that way.
  */
class DashboardsPlanSpec extends SparkSpec {

  private def readSchema(df: org.apache.spark.sql.DataFrame): String =
    "ReadSchema: struct<([^>\n]*)".r.findFirstMatchIn(
      df.queryExecution.executedPlan.toString).map(_.group(1)).getOrElse("")

  test("q1 terms count scans only key/seq/type") {
    val s = readSchema(Dashboards.termsCount(spark, sf))
    assert(s.contains("event_type") && s.contains("user_id") && s.contains("event_id"),
      s"q1 lost a required column: $s")
    assert(!s.contains("props") && !s.contains("value") && !s.contains("ts"),
      s"q1 reads more than it consumes: $s")
  }

  test("q2 histogram scans only key/seq/type/ts") {
    val s = readSchema(Dashboards.dateHistogram(spark, sf))
    assert(s.contains("ts"), s"q2 lost ts: $s")
    assert(!s.contains("props") && !s.contains("value"),
      s"q2 reads more than it consumes: $s")
  }

  test("q3 recent top-k never scans props") {
    val s = readSchema(Dashboards.recentTopK(spark, sf))
    assert(!s.contains("props"), s"q3 reads the unused props column: $s")
  }
}
