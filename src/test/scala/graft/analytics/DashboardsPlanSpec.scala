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

  test("q5 keyset page: literal cursor pushes to the scan; page is top-k") {
    import org.apache.spark.sql.functions._
    val raw = graft.Tables.eventsRaw(spark, sf)
      .select("user_id", "event_id", "ts", "event_type", "value")
    // a literal cursor (what a real search_after client sends): mid-range
    val mid = raw.agg(expr("percentile_approx(ts, 0.5, 100)")).head()
      .getAs[java.time.LocalDateTime](0)
    val page = Dashboards.keysetPage(raw, mid, 5000L)
    val p = page.queryExecution.executedPlan.toString
    // the OR-of-comparisons keyset predicate reaches the parquet scan —
    // rowgroup min/max skip everything past the cursor
    // no closing-] in the pattern: Spark truncates long filter lists
    // with "..." before the bracket ever prints
    val pushed = "PushedFilters: \\[([^\\]\n]*)".r.findFirstMatchIn(p).map(_.group(1))
    assert(pushed.exists(f => f.contains("Or(") && f.contains("LessThan(ts")),
      s"keyset predicate not pushed: $pushed\n$p")
    // and the page itself is a bounded top-k, never a global sort
    assert(p.contains("TakeOrderedAndProject"), s"page not TakeOrdered:\n$p")
    // page-chaining consistency on the registered q5: page1 ∪ page2 is
    // exactly the global top-20 — no gap, no overlap at the boundary
    val top20 = raw.orderBy(col("ts").desc, col("event_id").desc).limit(20)
      .select("event_id").collect().map(_.getLong(0)).toSet
    val page1 = raw.orderBy(col("ts").desc, col("event_id").desc).limit(10)
      .select("event_id").collect().map(_.getLong(0)).toSet
    val page2 = Dashboards.searchAfter(spark, sf)
      .select("event_id").collect().map(_.getLong(0)).toSet
    assert(page1.intersect(page2).isEmpty, "pages overlap")
    assert(page1.union(page2) == top20, "pages do not tile the top-20")
  }
}
