package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Approximate-aggregate accuracy: the sketch family (HyperLogLog++
  * distinct counts, quantile summaries) has no DuckDB oracle — different
  * engines' sketches legitimately differ — so its contract is an error
  * bound against the exact computation, which is what a 100 TB user
  * trades for the constant-memory plan shape (no distinct shuffle, no
  * global sort).
  */
class ApproxSpec extends SparkSpec {

  test("approx_count_distinct is within the configured relative error") {
    val ev = graft.Tables.events(spark, sf)
    val exact = ev.select(countDistinct("user_id")).first.getLong(0)
    val approx = ev.select(approx_count_distinct("user_id", rsd = 0.02))
      .first.getLong(0)
    assert(math.abs(approx - exact).toDouble / exact <= 0.05,
      s"approx=$approx exact=$exact")
  }

  test("approx_percentile lands within rank tolerance of the exact quantile") {
    val ev = graft.Tables.events(spark, sf).select(col("value"))
    val n = ev.count()
    val Seq(p50, p95) = ev.select(
        percentile_approx(col("value"), array(lit(0.5), lit(0.95)), lit(1000)))
      .first.getSeq[Double](0).toSeq
    // rank of the approximate answer must be within 1% of the target rank
    def rankOf(v: Double): Double =
      ev.filter(col("value") <= v).count().toDouble / n
    assert(math.abs(rankOf(p50) - 0.5) <= 0.01, s"p50=$p50 rank=${rankOf(p50)}")
    assert(math.abs(rankOf(p95) - 0.95) <= 0.01, s"p95=$p95 rank=${rankOf(p95)}")
  }

  test("r6 registered query: one row per type, users within HLL tolerance") {
    val rows = Sampling.approxStats(spark, sf).collect()
    val exact = graft.Tables.events(spark, sf)
      .groupBy("event_type").agg(countDistinct("user_id").as("u"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(rows.map(_.getString(0)).toSet == exact.keySet)
    for (r <- rows) {
      val (t, approx) = (r.getString(0), r.getLong(1))
      assert(math.abs(approx - exact(t)).toDouble / exact(t) <= 0.05,
        s"$t: approx=$approx exact=${exact(t)}")
      val (p50, p95) = (r.getDouble(2), r.getDouble(3))
      assert(p50 <= p95, s"$t: p50=$p50 > p95=$p95")
    }
  }

  test("approx distinct plans without a distinct shuffle of the key") {
    val p = graft.Tables.events(spark, sf)
      .select(approx_count_distinct("user_id"))
      .queryExecution.executedPlan.toString
    // one partial+final HLL pair; no Expand/expand-style distinct rewrite
    assert(!p.contains("Expand"), s"unexpected distinct expansion:\n$p")
    assert(p.contains("approx_count_distinct") || p.contains("HyperLogLog"),
      s"sketch aggregate missing:\n$p")
  }
}
