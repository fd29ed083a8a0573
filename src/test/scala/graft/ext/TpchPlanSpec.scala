package graft.ext

import graft.SparkSpec

/** Physical-plan assertions: these queries must keep the plan shapes that
  * survive a 100x scale-up, not just return correct rows.
  */
class TpchPlanSpec extends SparkSpec {

  private def plan(name: String): String =
    Tpch.queries(name)(spark, sf).queryExecution.executedPlan.toString

  test("dimension joins broadcast (no shuffle of the fact table)") {
    for (q <- Seq("t2_revenue_by_nation", "t3_top_customers",
      "t5_brand_revenue", "t6_supplier_by_region")) {
      val p = plan(q)
      assert(p.contains("BroadcastHashJoin"), s"$q: expected broadcast join in:\n$p")
      assert(!p.contains("SortMergeJoin"), s"$q: unwanted sort-merge join in:\n$p")
    }
  }

  test("fact filters are pushed into the parquet scan") {
    val p = plan("t1_pricing_summary")
    assert(p.contains("PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate"),
      s"t1: filter not pushed:\n$p")
  }

  test("scans read only referenced columns") {
    // executedPlan.toString truncates ReadSchema, so check the FileScan's
    // full column list instead: exactly the six referenced columns.
    val p = plan("t1_pricing_summary")
    val scanCols = "FileScan parquet \\[([^\\]]*)\\]".r
      .findFirstMatchIn(p).map(_.group(1)).getOrElse("")
    val cols = scanCols.split(",").map(_.trim.replaceAll("#\\d+$", "")).toSet
    assert(cols == Set("l_quantity", "l_extendedprice", "l_discount",
      "l_returnflag", "l_linestatus", "l_shipdate"),
      s"t1 reads unexpected columns: $cols\n$p")
  }

  test("top-k plans as TakeOrderedAndProject, not a global sort") {
    val p = plan("t3_top_customers")
    assert(p.contains("TakeOrderedAndProject"), s"t3: no top-k operator:\n$p")
  }

  test("aggregations are partial+final pairs (map-side combine)") {
    val p = plan("t1_pricing_summary")
    assert(p.contains("HashAggregate"), s"t1: no hash aggregate:\n$p")
    assert("HashAggregate".r.findAllIn(p).size >= 2, s"t1: no partial agg:\n$p")
  }

  test("correlated EXISTS decorrelates to a semi join, never a per-row subquery") {
    val p = plan("t7_exists_priority")
    assert(p.contains("LeftSemi"), s"t7: EXISTS not decorrelated:\n$p")
    assert(!p.contains("InSubquery") && !p.toLowerCase.contains("scalarsubquery"),
      s"t7: residual per-row subquery:\n$p")
  }

  test("t13 double quantifier: EXISTS -> semi AND NOT EXISTS -> anti, one key") {
    val p = plan("t13_orders_waiting")
    assert(p.contains("LeftSemi"), s"t13: EXISTS not decorrelated:\n$p")
    assert(p.contains("LeftAnti"), s"t13: NOT EXISTS not decorrelated:\n$p")
    assert(!p.contains("InSubquery") && !p.toLowerCase.contains("scalarsubquery"),
      s"t13: residual per-row subquery:\n$p")
    assert(p.contains("TakeOrderedAndProject"), s"t13: top-10 not bounded:\n$p")
  }

  test("t14: NOT EXISTS -> anti join; global-agg subquery is one-time, not per-row") {
    val p = plan("t14_lost_customers")
    assert(p.contains("LeftAnti"), s"t14: NOT EXISTS not decorrelated:\n$p")
    // the positive-balance aggregate appears as an uncorrelated one-time
    // Subquery (executed once, its result a literal in the filter) —
    // a CORRELATED per-row form would have failed decorrelation
    assert(p.contains("Subquery"), s"t14: scalar subquery missing:\n$p")
    assert(!p.contains("InSubquery"), s"t14: residual per-row subquery:\n$p")
  }

  test("t12: the max-subquery leg REUSES the revenue shuffle (one lineitem scan)") {
    val df = Tpch.queries("t12_top_supplier")(spark, sf)
    df.collect() // AQE decides reuse at materialization, not at planning
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("ReusedExchange"),
      s"t12: subquery max re-aggregated lineitem instead of reusing the shuffle:\n$p")
  }

  test("t15: correlated scalar aggs decorrelate to per-part aggregate joins") {
    val p = plan("t15_small_order_revenue")
    // both the count and the sum subquery must become aggregate+join legs
    // (per-partkey HashAggregates feeding joins), never per-row execution
    assert(!p.toLowerCase.contains("scalarsubquery") && !p.contains("InSubquery"),
      s"t15: residual per-row subquery:\n$p")
    assert("HashAggregate\\(keys=\\[l_partkey".r.findAllIn(p).size >= 2,
      s"t15: missing decorrelated per-part aggregates:\n$p")
    // the count leg must keep LEFT OUTER semantics (empty sibling set
    // counts as 0 — an inner rewrite would silently drop those rows)
    assert(p.contains("LeftOuter"), s"t15: count leg lost outer semantics:\n$p")
  }

  test("t16: NOT IN plans as a NULL-AWARE anti join, distinct-count is two-phase") {
    val p = plan("t16_supplier_diversity")
    // BroadcastHashJoin ..., LeftAnti, BuildRight, true — the trailing
    // flag is isNullAwareAntiJoin, the three-valued-logic operator NOT IN
    // requires (a plain anti join would keep rows a NULL should kill)
    assert("LeftAnti, BuildRight, true".r.findFirstIn(p).isDefined,
      s"t16: NOT IN did not plan as null-aware anti join:\n$p")
    // count(DISTINCT) expands to the two-level aggregate (dedup on
    // (brand,size,suppkey), then count) — partial on both levels
    assert("HashAggregate".r.findAllIn(p).size >= 4,
      s"t16: distinct count not two-phase:\n$p")
  }
}
