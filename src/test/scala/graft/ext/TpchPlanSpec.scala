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
    }
  }

  test("no STATIC broadcast hint on ANY SF-scaling table, in ANY t-query") {
    // customer/supplier/part/orders/lineitem all grow linearly with scale
    // factor: a static broadcast() hint on any of them — even filtered to
    // a constant fraction, as t5/t10 once did — would OOM every executor
    // at 100x scale. At test SF the size-based planner (or AQE) may still
    // choose a runtime broadcast — that is fine and expected; what must
    // never appear is a HINT that forces it regardless of size. A hinted
    // subtree scanning an SF-scaling table necessarily carries that
    // table's key attribute in its output, so detect it there. Runs over
    // EVERY registered t-query so new queries cannot dodge the check.
    import org.apache.spark.sql.catalyst.plans.logical.ResolvedHint
    val sfScalingKeys = Set("c_custkey", "s_suppkey", "p_partkey",
      "o_orderkey", "l_orderkey")
    for (q <- Tpch.queries.keys.toSeq.sorted) {
      val analyzed = Tpch.queries(q)(spark, sf).queryExecution.analyzed
      val offenders = analyzed.collect {
        case h: ResolvedHint if h.child.output.exists(a =>
          sfScalingKeys.contains(a.name)) => h
      }
      assert(offenders.isEmpty,
        s"$q: static broadcast hint on an SF-scaling table:\n${offenders.mkString("\n")}")
    }
  }

  test("t9: two-nation filter is pushed into the build sides") {
    // the nation filter must prune supplier/customer BEFORE the fact
    // joins — visible as an In(n_name, ...) pushed filter on the nation
    // scans, with the only broadcast being the 2-row filtered nation.
    val p = plan("t9_volume_shipping")
    assert(p.contains("In(n_name"), s"t9: nation filter not pushed to scan:\n$p")
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

  test("t17: IN-subquery decorrelates to a semi join; result is non-vacuous") {
    val df = Tpch.queries("t17_major_suppliers")(spark, sf)
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("LeftSemi"), s"t17: IN not decorrelated to semi join:\n$p")
    assert(!p.contains("InSubquery"), s"t17: residual per-row subquery:\n$p")

    // brute-force oracle in driver code: the qualifying set must be
    // NON-EMPTY at this SF (a threshold that yields 0 rows would make the
    // hash-match vacuous — empty always equals empty) and must match a
    // plain fold over the collected rows.
    val rows = graft.Tables.lineitem(spark, sf)
      .selectExpr("l_partkey", "l_suppkey", "CAST(l_quantity AS BIGINT) AS q")
      .collect()
    val perPS = rows.groupBy(r => (r.getLong(0), r.getLong(1)))
      .map { case (k, rs) => k -> rs.map(_.getLong(2)).sum }
    val perP = perPS.groupBy(_._1._1).map { case (p0, m) => p0 -> m.values.sum }
    val expect = perPS.collect {
      case ((p0, s0), q) if q * 5 > perP(p0) => s0
    }.toSet
    val got = df.collect().map(_.getLong(0)).toSet
    assert(expect.nonEmpty, "t17 threshold is vacuous at test SF (0 qualifying suppliers)")
    assert(got == expect, s"t17 mismatch: got $got expected $expect")
  }

  test("t18: both date predicates reach their scans; top-10 is a heap") {
    val p = plan("t18_shipping_priority")
    assert(p.contains("GreaterThan(l_shipdate"),
      s"t18: shipdate filter not pushed to the lineitem scan:\n$p")
    assert(p.contains("LessThan(o_orderdate"),
      s"t18: orderdate filter not pushed to the orders scan:\n$p")
    assert(p.contains("TakeOrderedAndProject"), s"t18: no top-k operator:\n$p")
  }

  test("t19: share is exact integral division; only fixed-size frames broadcast") {
    val df = Tpch.queries("t19_market_share")(spark, sf)
    val analyzed = df.queryExecution.analyzed.toString
    // the ppm is an IntegralDivide over decimal cents — never a double
    // divide whose last ulp could flip the rounded digit between engines
    assert(analyzed.contains(" div "), s"t19: share not integral division:\n$analyzed")
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin"), s"t19: nation/region not broadcast:\n$p")
  }

  test("t20: quantity gate aggregates the fact table BEFORE any join") {
    val p = plan("t20_large_orders")
    // the HAVING filter must sit on the per-orderkey aggregate of the
    // bare lineitem scan — in the printed tree the aggregate's child is
    // the FileScan, with no join anywhere below it
    val aggIdx = p.indexOf("HashAggregate(keys=[l_orderkey")
    assert(aggIdx >= 0, s"t20: no per-order aggregate:\n$p")
    val below = p.substring(aggIdx)
    assert(!below.contains("Join"), s"t20: join below the quantity gate:\n$p")
    assert(p.contains("TakeOrderedAndProject"), s"t20: top-100 not bounded:\n$p")
  }

  test("t21: both scalar subqueries reuse the part-value exchange") {
    val df = Tpch.queries("t21_value_concentration")(spark, sf)
    df.collect() // AQE decides reuse at materialization
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("ReusedExchange"),
      s"t21: scalar subqueries re-aggregated lineitem instead of sharing pv:\n$p")
  }

  test("t22: selective predicates on both fact scans; top-20 is a heap") {
    val p = plan("t22_returned_revenue")
    assert(p.contains("EqualTo(l_returnflag,R)"),
      s"t22: returnflag not pushed to the lineitem scan:\n$p")
    assert(p.contains("GreaterThanOrEqual(o_orderdate"),
      s"t22: date window not pushed to the orders scan:\n$p")
    assert(p.contains("TakeOrderedAndProject"), s"t22: no top-k operator:\n$p")
  }

  test("t23: both priority classes come from ONE pass (single join, partial agg)") {
    val p = plan("t23_priority_classes")
    assert("Scan parquet".r.findAllIn(p).size == 2,
      s"t23: conditional agg re-scanned a table:\n$p")
    assert("HashAggregate".r.findAllIn(p).size >= 2,
      s"t23: no partial aggregation:\n$p")
  }

  test("t24: all three conjuncts push to the scan; plan is scan->agg, no shuffle but the gather") {
    val p = plan("t24_forecast_revenue")
    // toString truncates the PushedFilters list, so assert each conjunct
    // on the (untruncated) Filter node plus the pushdown list's head
    assert(p.contains("PushedFilters: [IsNotNull(l_shipdate)"),
      s"t24: no pushed filters on the scan:\n$p")
    for (f <- Seq(">= 1998-01-01", "< 1999-01-01", ">= 0.05", "<= 0.07",
      "< 24.0"))
      assert(p.contains(f), s"t24: conjunct $f missing from the filter:\n$p")
    assert(!p.contains("Join"), s"t24: unexpected join:\n$p")
    // single-row gather: exactly one exchange (the final SinglePartition)
    assert("Exchange".r.findAllIn(p).size == 1 && p.contains("SinglePartition"),
      s"t24: expected exactly the one-row gather exchange:\n$p")
  }

  test("t25: month window pushes to the fact scan; part scan reads two columns") {
    val df = Tpch.queries("t25_promo_share")(spark, sf)
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("GreaterThanOrEqual(l_shipdate"),
      s"t25: month window not pushed to the lineitem scan:\n$p")
    val partCols = "FileScan parquet \\[([^\\]]*)\\]".r.findAllMatchIn(p)
      .map(_.group(1).split(",").map(_.trim.replaceAll("#\\d+L?$", "")).toSet)
      .find(_.contains("p_type")).getOrElse(Set.empty[String])
    assert(partCols == Set("p_partkey", "p_type"),
      s"t25: part scan reads unexpected columns: $partCols\n$p")
    // share must be integral division over exact decimals (t19 discipline)
    assert(df.queryExecution.analyzed.toString.contains(" div "),
      s"t25: share not integral division")
  }

  test("t27: part word-filter pushes to the scan; nation is the only static broadcast") {
    val p = plan("t27_profit_by_nation")
    // the selective dimension filter must reach the part scan so the
    // first join prunes the fact stream before the wider shuffles
    assert(p.contains("StringContains(p_name,red)"),
      s"t27: p_name filter not pushed to the part scan:\n$p")
    // the no-static-hint sweep above already proves no SF-scaling hint;
    // nation must still broadcast (hinted fixed-size dim)
    assert(p.contains("BroadcastHashJoin"), s"t27: nation not broadcast:\n$p")
  }

  test("t28: pair aggregate and per-order rollup share ONE l_orderkey exchange") {
    val df = Tpch.queries("t28_waiting_suppliers")(spark, sf)
    df.collect() // AQE decides reuse at materialization
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("ReusedExchange"),
      s"t28: per-order rollup re-shuffled the pair frame instead of reusing it:\n$p")
    assert(p.contains("TakeOrderedAndProject"), s"t28: top-20 not bounded:\n$p")
    // the double quantifier is integer comparisons, never a subquery
    assert(!p.contains("InSubquery") && !p.toLowerCase.contains("scalarsubquery"),
      s"t28: residual per-row subquery:\n$p")
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
