package graft.ext

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-exercise suite over the TPC-H-ish testdata — the join/agg
  * surface the reference lacks entirely (SURVEY.md §2.1 "Joins: none")
  * but a useful engine must have. Patterns chosen to exercise exactly the
  * physical strategies that matter at 100 TB:
  *
  *   - FIXED-SIZE dimension joins are `broadcast()`ed (nation/region are
  *     25/5 rows at every scale factor — a shuffle join here would move
  *     the fact table for nothing). SF-SCALING tables (customer, supplier,
  *     part) are NEVER statically hinted: at 100x scale a static
  *     `broadcast(customer)` exceeds the 8 GB broadcast limit and OOMs
  *     every executor. Those joins are left to AQE, which broadcasts at
  *     runtime exactly when the build side actually fits;
  *   - fact-side filters sit directly on the scan so Catalyst pushes them
  *     into parquet (`PushedFilters`), and only referenced columns are
  *     read (`ReadSchema`);
  *   - money aggregates run in DECIMAL internally (order-independent, so
  *     partial/final aggregation over any partitioning is deterministic —
  *     a double sum would drift with partition count and break the
  *     oracle), cast to double at the boundary;
  *   - top-k goes through `orderBy().limit()` → `TakeOrderedAndProject`
  *     (per-partition heaps, never a global sort).
  */
object Tpch {

  type Q = (SparkSession, String) => DataFrame

  private def dec(c: String) = col(c).cast("decimal(18,4)")

  /** TPC-H Q1-style pricing summary: wide partial-aggregated scan. */
  def pricingSummary(spark: SparkSession, sfDir: String): DataFrame =
    Tables.lineitem(spark, sfDir)
      .filter(col("l_shipdate") <= lit("1999-12-31"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum(dec("l_quantity")).cast("double").as("sum_qty"),
        sum(dec("l_extendedprice")).cast("double").as("sum_base_price"),
        sum(dec("l_extendedprice") * (lit(1).cast("decimal(18,4)") - dec("l_discount")))
          .cast("double").as("sum_disc_price"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))

  /** TPC-H Q5-style revenue by nation: three joins. Nation (25 rows,
    * fixed) is broadcast; customer SCALES with SF so it carries no hint —
    * the join shuffles on the customer key (co-partitioned with the
    * orders side), and AQE still runtime-broadcasts it when it fits.
    */
  def revenueByNation(spark: SparkSession, sfDir: String): DataFrame = {
    val li = Tables.lineitem(spark, sfDir)
    val ord = Tables.orders(spark, sfDir)
      .filter(col("o_orderdate") >= lit("1996-01-01") &&
        col("o_orderdate") < lit("1998-01-01"))
    val cust = Tables.customer(spark, sfDir)
    val nat = Tables.nation(spark, sfDir)
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(cust, col("o_custkey") === col("c_custkey"))
      .join(broadcast(nat), col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(sum(dec("l_extendedprice") * (lit(1).cast("decimal(18,4)") - dec("l_discount")))
        .cast("double").as("revenue"))
      .orderBy(col("revenue").desc, col("n_name"))
  }

  /** Top-10 customers by order volume: join + TakeOrderedAndProject.
    * Customer is SF-scaling, so no broadcast hint — the aggregated
    * per-customer frame and the customer table are both keyed on custkey
    * and shuffle-join co-partitioned; AQE runtime-broadcasts if small.
    */
  def topCustomers(spark: SparkSession, sfDir: String): DataFrame = {
    val ord = Tables.orders(spark, sfDir)
    val cust = Tables.customer(spark, sfDir)
    ord.groupBy(col("o_custkey"))
      .agg(sum(dec("o_totalprice")).cast("double").as("total_spend"),
        count(lit(1)).as("n_orders"))
      .join(cust, col("o_custkey") === col("c_custkey"))
      .select(col("c_custkey"), col("c_name"), col("total_spend"), col("n_orders"))
      .orderBy(col("total_spend").desc, col("c_custkey"))
      .limit(10)
  }

  /** Segment x priority matrix: two-dim agg after a customer join.
    * No hint — customer scales with SF; shuffle join on the key, AQE
    * decides broadcast at runtime.
    */
  def segmentPriority(spark: SparkSession, sfDir: String): DataFrame =
    Tables.orders(spark, sfDir)
      .join(Tables.customer(spark, sfDir),
        col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_mktsegment"), col("o_orderpriority"))
      .agg(count(lit(1)).as("n"),
        sum(dec("o_totalprice")).cast("double").as("total"))
      .orderBy(col("c_mktsegment"), col("o_orderpriority"))

  /** Brand revenue with a selective dimension filter: the brand filter
    * prunes `part` before the join, and the join is left UNHINTED — the
    * filtered build side is a constant fraction (~2/25) of an SF-scaling
    * table, so a static hint would force an OOM-sized broadcast at 100x
    * scale. The size-based planner (or AQE at runtime) broadcasts exactly
    * when the filtered frame actually fits.
    */
  def brandRevenue(spark: SparkSession, sfDir: String): DataFrame =
    Tables.lineitem(spark, sfDir)
      .join(Tables.part(spark, sfDir)
        .filter(col("p_brand").isin("Brand#11", "Brand#22")),
        col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_brand"))
      .agg(sum(dec("l_extendedprice")).cast("double").as("revenue"),
        count(lit(1)).as("n_items"))
      .orderBy(col("p_brand"))

  /** Region-nation-supplier rollup: chained broadcast joins on tiny dims. */
  def supplierByRegion(spark: SparkSession, sfDir: String): DataFrame =
    Tables.supplier(spark, sfDir)
      .join(broadcast(Tables.nation(spark, sfDir)),
        col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(spark, sfDir)),
        col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name"))
      .agg(count(lit(1)).as("n_suppliers"),
        sum(dec("s_acctbal")).cast("double").as("total_acctbal"))
      .orderBy(col("r_name"))

  /** t7 — correlated EXISTS (TPC-H Q4 shape): orders with at least one
    * high-discount lineitem, counted by priority. Written as SQL so
    * Catalyst's subquery DECORRELATION does the work — `RewritePredicate
    * Subquery` turns the correlated EXISTS into a left-semi join (the
    * plan spec asserts it); the hand-written semi join would dodge the
    * optimizer feature this query exists to exercise.
    */
  def priorityWithDiscount(spark: SparkSession, sfDir: String): DataFrame = {
    Tables.orders(spark, sfDir).createOrReplaceTempView("t7_orders")
    Tables.lineitem(spark, sfDir).createOrReplaceTempView("t7_lineitem")
    spark.sql(
      """SELECT o_orderpriority, count(*) AS n_orders
        |FROM t7_orders o
        |WHERE EXISTS (SELECT 1 FROM t7_lineitem l
        |              WHERE l.l_orderkey = o.o_orderkey AND l.l_discount > 0.08)
        |GROUP BY o_orderpriority""".stripMargin)
  }

  /** t8 — correlated SCALAR subquery: parts referenced by ≥ 35 lineitems,
    * with the reference count from a per-row correlated COUNT. Catalyst
    * decorrelates it to an aggregate + outer join; the count is exact
    * integer arithmetic, so the threshold can never flip on a float
    * boundary between engines.
    */
  def popularParts(spark: SparkSession, sfDir: String): DataFrame = {
    Tables.part(spark, sfDir).createOrReplaceTempView("t8_part")
    Tables.lineitem(spark, sfDir).createOrReplaceTempView("t8_lineitem")
    spark.sql(
      """SELECT p_partkey, n_refs FROM (
        |  SELECT p_partkey,
        |    (SELECT count(*) FROM t8_lineitem l
        |     WHERE l.l_partkey = p.p_partkey) AS n_refs
        |  FROM t8_part p)
        |WHERE n_refs >= 35""".stripMargin)
  }

  /** t9 — volume shipping (TPC-H Q7 shape): revenue flowing between two
    * nations, by direction and ship year. The two-nation predicate is
    * pushed INTO the build sides: nation is filtered to the two names
    * FIRST (2 rows — that tiny frame is the only broadcast), so the
    * supplier⋈nation and customer⋈nation joins keep only 2/25 of each
    * table before anything touches the facts. Supplier and customer
    * SCALE with SF, so they carry no static broadcast hint — the
    * filtered lookup frames shuffle-join on their keys and AQE
    * runtime-broadcasts them when they actually fit. The facts join
    * fact-to-fact on orderkey (shuffle, co-partitioned) — at 100 TB
    * that is the one shuffle this query needs, and it is unavoidable:
    * both sides are corpus-sized. The `(A,B) or (B,A)` pair predicate
    * stays as a cheap post-join residual over the surviving 2x2 grid.
    */
  def volumeShipping(spark: SparkSession, sfDir: String): DataFrame = {
    val natPair = Tables.nation(spark, sfDir)
      .filter(col("n_name").isin("NATION_1", "NATION_2"))
    val supNat = Tables.supplier(spark, sfDir)
      .join(broadcast(natPair), col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("n_name").as("supp_nation"))
    val custNat = Tables.customer(spark, sfDir)
      .join(broadcast(natPair), col("c_nationkey") === col("n_nationkey"))
      .select(col("c_custkey"), col("n_name").as("cust_nation"))
    Tables.lineitem(spark, sfDir)
      .join(Tables.orders(spark, sfDir), col("l_orderkey") === col("o_orderkey"))
      .join(supNat, col("l_suppkey") === col("s_suppkey"))
      .join(custNat, col("o_custkey") === col("c_custkey"))
      .filter((col("supp_nation") === "NATION_1" && col("cust_nation") === "NATION_2") ||
        (col("supp_nation") === "NATION_2" && col("cust_nation") === "NATION_1"))
      .groupBy(col("supp_nation"), col("cust_nation"),
        year(col("l_shipdate")).cast("long").as("l_year"))
      .agg(sum(dec("l_extendedprice") * (lit(1).cast("decimal(18,4)") - dec("l_discount")))
        .cast("double").as("revenue"))
  }

  /** t10 — disjunctive dimension predicate (TPC-H Q19 shape): revenue
    * under an OR of (brand, size-range, quantity-range) conjunctions.
    * The part-side conjuncts prune the build side BEFORE the join (only
    * rows satisfying SOME branch's brand+size survive), and the residual
    * mixed predicate evaluates post-join inside codegen. The shape
    * matters at scale because a naive engine evaluates the whole
    * disjunction as a join filter against the full dimension. Like t5,
    * the filtered `part` is a constant fraction of an SF-scaling table,
    * so it is never statically hinted — size-based planning / AQE decide.
    */
  def disjunctiveRevenue(spark: SparkSession, sfDir: String): DataFrame = {
    val branch1 = col("p_brand") === "Brand#11" &&
      col("p_size").between(1, 15) && col("l_quantity").between(1, 20)
    val branch2 = col("p_brand") === "Brand#22" &&
      col("p_size").between(10, 30) && col("l_quantity").between(10, 35)
    Tables.lineitem(spark, sfDir)
      .join(Tables.part(spark, sfDir)
        .filter((col("p_brand") === "Brand#11" && col("p_size").between(1, 15)) ||
          (col("p_brand") === "Brand#22" && col("p_size").between(10, 30))),
        col("l_partkey") === col("p_partkey"))
      .filter(branch1 || branch2)
      .agg(sum(dec("l_extendedprice") * (lit(1).cast("decimal(18,4)") - dec("l_discount")))
        .cast("double").as("revenue"),
        count(lit(1)).as("n_items"))
  }

  /** t11 — customer order-count distribution (TPC-H Q13 shape): how many
    * customers placed exactly k orders, INCLUDING k=0 — the zero bucket
    * forces a LEFT OUTER join (an inner join silently drops orderless
    * customers; the oracle would catch it). Two aggregations: per-customer
    * count (shuffle on custkey), then the tiny distribution rollup.
    */
  def orderCountDist(spark: SparkSession, sfDir: String): DataFrame =
    Tables.customer(spark, sfDir)
      .join(Tables.orders(spark, sfDir),
        col("c_custkey") === col("o_custkey"), "left_outer")
      .groupBy(col("c_custkey"))
      .agg(count(col("o_orderkey")).as("n_orders"))
      .groupBy(col("n_orders"))
      .agg(count(lit(1)).as("n_customers"))

  /** t12 — top supplier by revenue (TPC-H Q15 shape): the per-supplier
    * revenue view is compared against ITS OWN maximum via a scalar
    * subquery — the "aggregate of an aggregate" pattern. Written as SQL
    * so Catalyst plans the scalar subquery (one extra aggregation over
    * the shared revenue view, subquery result broadcast as a literal),
    * rather than hand-materializing the max. At 100 TB: two passes over
    * the aggregated (supplier-sized, NOT lineitem-sized) view, one
    * lineitem scan total.
    */
  def topSupplier(spark: SparkSession, sfDir: String): DataFrame = {
    Tables.lineitem(spark, sfDir).createOrReplaceTempView("t12_lineitem")
    Tables.supplier(spark, sfDir).createOrReplaceTempView("t12_supplier")
    spark.sql(
      """WITH rev AS (
        |  SELECT l_suppkey AS supplier_no,
        |    CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4)) *
        |             (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4))))
        |      AS DOUBLE) AS total_revenue
        |  FROM t12_lineitem
        |  WHERE l_suppkey IS NOT NULL
        |  GROUP BY l_suppkey)
        |SELECT s_suppkey, s_name, total_revenue
        |FROM t12_supplier JOIN rev ON s_suppkey = supplier_no
        |WHERE total_revenue = (SELECT max(total_revenue) FROM rev)""".stripMargin)
    // the explicit IS NOT NULL mirrors the null filter the join infers on
    // its own leg — without it the subquery's rev and the join's rev
    // canonicalize differently and ReuseExchange cannot unify them, so
    // lineitem would scan and aggregate TWICE (plan-asserted in
    // TpchPlanSpec; semantics unchanged: a null suppkey row could never
    // join or win the max)
  }

  /** t13 — suppliers who kept orders waiting (TPC-H Q21 shape): the
    * sole-offender query — a supplier's returned item in a finished
    * multi-supplier order where NO other supplier's item was returned
    * (`l_returnflag = 'R'` stands in for Q21's receipt>commit lateness;
    * this testdata carries no receipt/commit dates). The interesting
    * machinery is BOTH correlated quantifiers against the SAME fact
    * table: Catalyst decorrelates the EXISTS to a left-SEMI and the
    * NOT EXISTS to a left-ANTI join on l_orderkey — three passes over
    * lineitem co-partitioned on the order key, no per-row subquery
    * execution anywhere (plan-asserted). At 100 TB all three legs
    * shuffle on the same key, so AQE plans them as one exchange
    * lineage; the `<>` supplier inequality rides as a join residual.
    */
  def ordersWaiting(spark: SparkSession, sfDir: String): DataFrame = {
    Tables.lineitem(spark, sfDir).createOrReplaceTempView("t13_lineitem")
    Tables.orders(spark, sfDir).createOrReplaceTempView("t13_orders")
    Tables.supplier(spark, sfDir).createOrReplaceTempView("t13_supplier")
    spark.sql(
      """SELECT s.s_name, count(*) AS numwait
        |FROM t13_supplier s
        |JOIN t13_lineitem l1 ON l1.l_suppkey = s.s_suppkey
        |JOIN t13_orders o ON o.o_orderkey = l1.l_orderkey
        |                  AND o.o_orderstatus = 'F'
        |WHERE l1.l_returnflag = 'R'
        |  AND EXISTS (SELECT 1 FROM t13_lineitem l2
        |              WHERE l2.l_orderkey = l1.l_orderkey
        |                AND l2.l_suppkey <> l1.l_suppkey)
        |  AND NOT EXISTS (SELECT 1 FROM t13_lineitem l3
        |                  WHERE l3.l_orderkey = l1.l_orderkey
        |                    AND l3.l_suppkey <> l1.l_suppkey
        |                    AND l3.l_returnflag = 'R')
        |GROUP BY s.s_name
        |ORDER BY numwait DESC, s_name
        |LIMIT 10""".stripMargin)
  }

  /** t14 — lost customers (TPC-H Q22 shape): customers whose balance
    * beats the positive-balance average yet who never placed a
    * big-ticket order (> 450k; this testdata gives every customer SOME
    * order, so the premium-order absence plays Q22's no-order test),
    * rolled up by nation. Two optimizer features in one query: the global-aggregate
    * scalar subquery plans as ONE tiny subquery result reused as a
    * literal (never a per-row re-aggregation), and the NOT EXISTS
    * decorrelates to a left-ANTI join against the orders key — at
    * 100 TB that's one pass over orders' custkey column and one over
    * customer, no N×M anything. The threshold compare CROSS-MULTIPLIES
    * (`bal · n_pos > sum_pos`) in exact decimals instead of dividing —
    * an avg would be a double whose last-ulp rounding can flip rows at
    * the boundary between engines.
    */
  def lostCustomers(spark: SparkSession, sfDir: String): DataFrame = {
    Tables.customer(spark, sfDir).createOrReplaceTempView("t14_customer")
    Tables.orders(spark, sfDir).createOrReplaceTempView("t14_orders")
    spark.sql(
      """WITH pos AS (
        |  SELECT CAST(sum(CAST(c_acctbal AS DECIMAL(18,4))) AS DECIMAL(18,4))
        |           AS sum_pos,
        |         count(*) AS n_pos
        |  FROM t14_customer WHERE c_acctbal > 0)
        |SELECT c_nationkey, count(*) AS numcust,
        |  CAST(sum(CAST(c_acctbal AS DECIMAL(18,4))) AS DOUBLE) AS totacctbal
        |FROM t14_customer c
        |WHERE CAST(c_acctbal AS DECIMAL(18,4)) * (SELECT n_pos FROM pos)
        |        > (SELECT sum_pos FROM pos)
        |  AND NOT EXISTS (SELECT 1 FROM t14_orders o
        |                  WHERE o.o_custkey = c.c_custkey
        |                    AND o.o_totalprice > 450000)
        |GROUP BY c_nationkey""".stripMargin)
  }

  /** t15 — small-order revenue (TPC-H Q17 shape): revenue from lineitems
    * whose quantity is below 20% of their part's average order quantity.
    * The per-part average arrives through TWO correlated scalar
    * subqueries over the SAME relation and grouping (`sum` and `count`
    * of the sibling lineitems) so the threshold can CROSS-MULTIPLY in
    * exact integers — `5·qty·cnt < sum` ⇔ `qty < 0.2·avg` — instead of
    * dividing into a double whose last ulp could flip boundary rows
    * between engines (quantities are integer-valued in this testdata).
    * Catalyst decorrelates both into per-part aggregates joined back on
    * l_partkey — never a per-row subquery execution (plan-asserted). At
    * this SF the aggregate frames broadcast purely on AQE's size
    * estimate (no hint anywhere); at 100 TB the same plan shuffle-joins
    * all three legs co-partitioned on l_partkey.
    */
  def smallOrderRevenue(spark: SparkSession, sfDir: String): DataFrame = {
    Tables.lineitem(spark, sfDir).createOrReplaceTempView("t15_lineitem")
    Tables.part(spark, sfDir).createOrReplaceTempView("t15_part")
    spark.sql(
      """SELECT p.p_brand,
        |  CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,4))) AS DOUBLE)
        |    AS small_order_revenue,
        |  count(*) AS n_items
        |FROM t15_lineitem l JOIN t15_part p ON p.p_partkey = l.l_partkey
        |WHERE p.p_brand IN ('Brand#11', 'Brand#22')
        |  AND CAST(l.l_quantity AS BIGINT) * 5 *
        |      (SELECT count(*) FROM t15_lineitem l2
        |       WHERE l2.l_partkey = l.l_partkey)
        |    < (SELECT sum(CAST(l_quantity AS BIGINT)) FROM t15_lineitem l2
        |       WHERE l2.l_partkey = l.l_partkey)
        |GROUP BY p.p_brand""".stripMargin)
  }

  /** t16 — supplier diversity per part attribute (TPC-H Q16 shape): how
    * many DISTINCT suppliers serve each (brand, size) bucket, excluding a
    * blacklist via `NOT IN (subquery)`. `NOT IN` is NOT an anti join —
    * its three-valued NULL semantics (any NULL in the subquery empties
    * the result) force Catalyst's null-aware anti join, a different
    * physical operator from t13/t14's NOT EXISTS anti joins
    * (plan-asserted). The blacklist is tiny → broadcast; at 100 TB the
    * count-distinct shuffles (brand, size, suppkey) once, then the
    * distinct-count rollup rides the same partitioning.
    */
  def supplierDiversity(spark: SparkSession, sfDir: String): DataFrame = {
    Tables.lineitem(spark, sfDir).createOrReplaceTempView("t16_lineitem")
    Tables.part(spark, sfDir).createOrReplaceTempView("t16_part")
    Tables.supplier(spark, sfDir).createOrReplaceTempView("t16_supplier")
    spark.sql(
      """SELECT p.p_brand, p.p_size,
        |  count(DISTINCT l.l_suppkey) AS supplier_cnt
        |FROM t16_lineitem l JOIN t16_part p ON p.p_partkey = l.l_partkey
        |WHERE p.p_size <= 10
        |  AND l.l_suppkey NOT IN (SELECT s_suppkey FROM t16_supplier
        |                          WHERE s_acctbal < 0)
        |GROUP BY p.p_brand, p.p_size""".stripMargin)
  }

  /** t17 — major suppliers (TPC-H Q20 shape, partsupp-free): suppliers
    * who shipped MORE THAN 20% of some part's total volume — the
    * dominant-source audit. (20%, not higher: the testdata generator
    * spreads each part over ~5 suppliers, so the max per-part share is
    * ~0.25 at every SF — a larger threshold would return zero rows and
    * make the oracle check vacuous, empty-vs-empty. TpchSpec asserts
    * non-emptiness against a brute-force fold.) The machinery: an
    * `IN (derived aggregate)` subquery — Catalyst decorrelates it to a
    * left-SEMI join against the qualifying-supplier set (plan-asserted),
    * and the inner total REAGGREGATES the per-(part, supplier) rollup
    * (`pt` selects FROM `sp`), so lineitem is scanned ONCE however many
    * aggregation levels stack. Quantities are integer-valued → the 20%
    * threshold cross-multiplies in exact longs. At 100 TB: one
    * lineitem shuffle on (partkey, suppkey), a second tiny exchange of
    * the aggregated frame, one co-partitioned join, one semi join
    * against supplier.
    */
  def majorSuppliers(spark: SparkSession, sfDir: String): DataFrame = {
    Tables.lineitem(spark, sfDir).createOrReplaceTempView("t17_lineitem")
    Tables.supplier(spark, sfDir).createOrReplaceTempView("t17_supplier")
    spark.sql(
      """WITH sp AS (
        |  SELECT l_partkey, l_suppkey,
        |    sum(CAST(l_quantity AS BIGINT)) AS q
        |  FROM t17_lineitem GROUP BY l_partkey, l_suppkey),
        |pt AS (
        |  SELECT l_partkey, sum(q) AS tot FROM sp GROUP BY l_partkey)
        |SELECT s_suppkey, s_name FROM t17_supplier
        |WHERE s_suppkey IN (
        |  SELECT sp.l_suppkey FROM sp JOIN pt USING (l_partkey)
        |  WHERE sp.q * 5 > pt.tot)""".stripMargin)
  }

  /** t18 — shipping priority (TPC-H Q3 shape): top-10 open orders by
    * pending revenue for one market segment. The canonical
    * filter-join-join-agg-topk chain: both date predicates sit directly on
    * their scans (pushed into parquet rowgroup skipping — at 100 TB the
    * `l_shipdate > cutoff` filter is what makes this query cheap), the
    * segment-filtered customer leg is SF-scaling so it carries no hint,
    * and the final top-10 plans as `TakeOrderedAndProject` — per-partition
    * heaps over the aggregated frame, never a global sort.
    */
  def shippingPriority(spark: SparkSession, sfDir: String): DataFrame = {
    val cutoff = lit("1998-06-01")
    val cust = Tables.customer(spark, sfDir)
      .filter(col("c_mktsegment") === "BUILDING")
      .select(col("c_custkey"))
    val ord = Tables.orders(spark, sfDir)
      .filter(col("o_orderdate") < cutoff)
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderdate"), col("o_orderpriority"))
    val li = Tables.lineitem(spark, sfDir)
      .filter(col("l_shipdate") > cutoff)
      .select(col("l_orderkey"), col("l_extendedprice"), col("l_discount"))
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(cust, col("o_custkey") === col("c_custkey"))
      .groupBy(col("l_orderkey"), col("o_orderdate"), col("o_orderpriority"))
      .agg(sum(dec("l_extendedprice") * (lit(1).cast("decimal(18,4)") - dec("l_discount")))
        .cast("double").as("revenue"))
      .orderBy(col("revenue").desc, col("o_orderdate"), col("l_orderkey"))
      .limit(10)
  }

  /** t19 — national market share (TPC-H Q8 shape): NATION_1's share of
    * its own region's lineitem revenue, per order year. Two portability
    * disciplines: (a) the share is integer PARTS-PER-MILLION computed by
    * exact floor division over DECIMAL(38,0) cent sums — a double ratio's
    * last-ulp rounding could flip the 6th digit between engines, and
    * BIGINT cents × 1e6 would overflow a long around sf100 while
    * DECIMAL(38,0) has ~20 digits of headroom; (b) the target region is
    * LOOKED UP from the data (the one-row `nation⋈region` frame riding a
    * broadcast cross join), never hardcoded. Join order at scale: the
    * region-filtered supplier leg shrinks to 1/5 of supplier BEFORE the
    * facts join; lineitem⋈orders is the one fact-fact shuffle.
    */
  def marketShare(spark: SparkSession, sfDir: String): DataFrame = {
    val cents = (dec("l_extendedprice") * lit(10000)).cast("decimal(38,0)")
    val targetRegion = Tables.nation(spark, sfDir)
      .join(Tables.region(spark, sfDir), col("n_regionkey") === col("r_regionkey"))
      .filter(col("n_name") === "NATION_1")
      .select(col("r_regionkey").as("target_rk"))
    val supNat = Tables.supplier(spark, sfDir)
      .join(broadcast(Tables.nation(spark, sfDir)), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(targetRegion), col("n_regionkey") === col("target_rk"))
      .select(col("s_suppkey"), col("n_name").as("supp_nation"))
    // the region-filtered supplier leg joins FIRST: it keeps ~1/5 of
    // lineitem, so the unavoidable fact-fact shuffle on orderkey moves a
    // fifth of the rows it would in join-orders-first order
    Tables.lineitem(spark, sfDir)
      .join(supNat, col("l_suppkey") === col("s_suppkey"))
      .join(Tables.orders(spark, sfDir), col("l_orderkey") === col("o_orderkey"))
      .groupBy(year(col("o_orderdate")).cast("long").as("o_year"))
      .agg(
        sum(when(col("supp_nation") === "NATION_1", cents)
          .otherwise(lit(0).cast("decimal(38,0)"))).as("num_cents"),
        sum(cents).as("tot_cents"))
      .select(col("o_year"),
        expr("CAST((num_cents * 1000000) div tot_cents AS BIGINT)").as("share_ppm"))
  }

  /** t20 — large-volume orders (TPC-H Q18 shape): orders whose total
    * quantity exceeds a threshold, with their customer. The HAVING
    * pre-filter runs as a partial-aggregated groupBy on the fact table
    * BEFORE any join touches a dimension — at 100 TB the 280-quantity
    * gate keeps ~0.4% of orders, so the two subsequent joins (orders,
    * then customer, both SF-scaling → no hints, AQE decides) move a
    * thousandth of the data a join-first plan would. Quantities are
    * integer-valued → the threshold compares exact BIGINTs.
    */
  def largeOrders(spark: SparkSession, sfDir: String): DataFrame = {
    val big = Tables.lineitem(spark, sfDir)
      .groupBy(col("l_orderkey"))
      .agg(sum(col("l_quantity").cast("bigint")).as("sum_qty"))
      .filter(col("sum_qty") > 280)
    big.join(Tables.orders(spark, sfDir), col("l_orderkey") === col("o_orderkey"))
      .join(Tables.customer(spark, sfDir), col("o_custkey") === col("c_custkey"))
      .select(col("c_name"), col("c_custkey"), col("o_orderkey"),
        col("o_orderdate"), dec("o_totalprice").cast("double").as("total_price"),
        col("sum_qty"))
      .orderBy(col("total_price").desc, col("o_orderkey"))
      .limit(100)
  }

  /** t21 — part value concentration (TPC-H Q11 shape): parts whose
    * lineitem value exceeds 1.5× the mean part value. Q11's fixed
    * fraction-of-total threshold is scale-VARIANT (more parts dilute
    * every share, so a constant cutoff silently empties at higher SF —
    * the vacuous-oracle trap t17 once had); comparing against the MEAN
    * is scale-invariant, and the compare CROSS-MULTIPLIES exact decimals
    * (`v·n·2 > Σv·3`) so no division ever leaves integer arithmetic.
    * Written as SQL so both scalar subqueries (count and sum over the
    * same aggregated view) plan against ONE shared exchange of `pv`
    * (the t12 ReuseExchange pattern) — lineitem is scanned once however
    * many aggregation levels stack.
    */
  def valueConcentration(spark: SparkSession, sfDir: String): DataFrame = {
    Tables.lineitem(spark, sfDir).createOrReplaceTempView("t21_lineitem")
    spark.sql(
      """WITH pv AS (
        |  SELECT l_partkey, sum(CAST(l_extendedprice AS DECIMAL(18,4))) AS v
        |  FROM t21_lineitem GROUP BY l_partkey)
        |SELECT l_partkey, CAST(v AS DOUBLE) AS part_value FROM pv
        |WHERE v * (SELECT count(*) FROM pv) * 2 > (SELECT sum(v) FROM pv) * 3""".stripMargin)
  }

  /** t22 — returned-item customer ranking (TPC-H Q10 shape): which
    * recent customers returned the most revenue. Fact-fact shuffle on
    * orderkey with BOTH selective predicates pushed to their scans
    * (returnflag on lineitem, the date window on orders), then the
    * SF-scaling customer join unhinted and nation broadcast (25 rows,
    * fixed). Top-20 → TakeOrderedAndProject over the per-customer
    * aggregate, never a global sort.
    */
  def returnedRevenue(spark: SparkSession, sfDir: String): DataFrame =
    Tables.lineitem(spark, sfDir)
      .filter(col("l_returnflag") === "R")
      .join(Tables.orders(spark, sfDir)
        .filter(col("o_orderdate") >= lit("2000-01-01")),
        col("l_orderkey") === col("o_orderkey"))
      .join(Tables.customer(spark, sfDir), col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables.nation(spark, sfDir)),
        col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("c_custkey"), col("c_name"), col("n_name"))
      .agg(sum(dec("l_extendedprice") * (lit(1).cast("decimal(18,4)") - dec("l_discount")))
        .cast("double").as("revenue"))
      .orderBy(col("revenue").desc, col("c_custkey"))
      .limit(20)

  /** t23 — priority class breakdown (TPC-H Q12 shape): per line status,
    * how many returned items belong to high- vs low-priority orders.
    * The conditional-aggregation pattern (`sum(CASE WHEN…)`) — one pass,
    * both classes from the same rows, where a naive engine runs the
    * join twice with complementary filters. The returnflag predicate
    * pushes to the lineitem scan; the priority CASE rides inside the
    * aggregate in whole-stage codegen.
    */
  def priorityClasses(spark: SparkSession, sfDir: String): DataFrame = {
    val high = col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    Tables.lineitem(spark, sfDir)
      .filter(col("l_returnflag") === "R")
      .join(Tables.orders(spark, sfDir), col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("l_linestatus"))
      .agg(sum(when(high, 1L).otherwise(0L)).as("high_line_count"),
        sum(when(high, 0L).otherwise(1L)).as("low_line_count"))
      .orderBy(col("l_linestatus"))
  }

  /** t24 — forecast revenue change (TPC-H Q6 shape): the revenue a
    * blanket discount cut would have given up — one scan, zero joins.
    * The archetype of predicate pushdown: all three conjuncts (date
    * range, discount band, quantity cap) are sargable and reach the
    * parquet scan as PushedFilters, so at 100 TB the stage reads only
    * rowgroups whose min/max straddle the window; the plan is
    * scan → partial sum → one-row gather, the cheapest shape a query
    * can have (plan-asserted in `TpchPlanSpec`). The discount band
    * compares the stored doubles against the same double literals on
    * both engines — no re-rounding on either side.
    */
  def forecastRevenue(spark: SparkSession, sfDir: String): DataFrame =
    Tables.lineitem(spark, sfDir)
      .filter(col("l_shipdate") >= lit("1998-01-01") &&
        col("l_shipdate") < lit("1999-01-01") &&
        col("l_discount").between(0.05, 0.07) &&
        col("l_quantity") < 24)
      .agg(
        sum(dec("l_extendedprice") * dec("l_discount"))
          .cast("double").as("forecast_revenue"),
        count(lit(1)).as("n_items"))

  /** t25 — promotion effect (TPC-H Q14 shape): the share of one month's
    * discounted revenue that came from promoted parts, as exact
    * parts-per-million (t19's portability discipline — a double ratio's
    * last-ulp rounding could flip the final digit between engines).
    * Revenue is decomposed into two EXACT integer factors — price in
    * ten-thousandths and (1−discount) in ten-thousandths, each a
    * scale-4 decimal times 10⁴ so the cast to integer drops nothing —
    * multiplied in DECIMAL(38,0)/HUGEINT where the product (≤10¹³ per
    * row) and the monthly sum (≤10²² at sf100) both fit. At scale: the
    * month predicate pushes to the lineitem scan FIRST, the part join
    * is SF-scaling so it carries no static hint (AQE broadcasts the
    * build side when it measures small), and p_type/p_partkey are the
    * only part columns read.
    */
  def promoShare(spark: SparkSession, sfDir: String): DataFrame = {
    val priceU = (dec("l_extendedprice") * lit(10000)).cast("decimal(38,0)")
    val discU = ((lit(1).cast("decimal(18,4)") - dec("l_discount")) * lit(10000))
      .cast("decimal(38,0)")
    val rev8 = priceU * discU
    Tables.lineitem(spark, sfDir)
      .filter(col("l_shipdate") >= lit("1998-09-01") &&
        col("l_shipdate") < lit("1998-10-01"))
      .join(Tables.part(spark, sfDir).select(col("p_partkey"), col("p_type")),
        col("l_partkey") === col("p_partkey"))
      .agg(
        sum(when(col("p_type") === "PROMO", rev8)
          .otherwise(lit(0).cast("decimal(38,0)"))).as("promo_u"),
        sum(rev8).as("tot_u"))
      .select(expr("CAST((promo_u * 1000000) div tot_u AS BIGINT)")
        .as("promo_ppm"))
  }

  /** t26 — min-cost supplier per part (TPC-H Q2 shape, partsupp-free:
    * observed unit price from lineitem stands in for ps_supplycost):
    * for each small part, the EUROPE supplier with the cheapest unit
    * price. Q2's correlated min-subquery is decorrelated BY
    * CONSTRUCTION: per-(part,supplier) cost aggregates once (map-side
    * combined), and the per-part winner is a one-pass lexicographic
    * `min(struct(cost, suppkey, name))` — associative, so it partial-
    * aggregates; no per-part re-scan, no window sort. Ties break on the
    * explicit suppkey field, never engine luck. Unit price is ONE IEEE
    * division then floor — identical operands on both engines, then all
    * integer. Scale: the region filter prunes supplier to 1/5 BEFORE
    * the fact join (broadcast only nation/region, 25/5 rows fixed;
    * supplier itself is SF-scaling → unhinted), and the top-100 is a
    * TakeOrderedAndProject heap.
    */
  def minCostSupplier(spark: SparkSession, sfDir: String): DataFrame = {
    val eur = Tables.supplier(spark, sfDir)
      .join(broadcast(Tables.nation(spark, sfDir)),
        col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(spark, sfDir)
        .filter(col("r_name") === "EUROPE")),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("s_suppkey"), col("s_name"))
    val smallParts = Tables.part(spark, sfDir)
      .filter(col("p_size") <= 5)
      .select(col("p_partkey"), col("p_name"))
    val cost = Tables.lineitem(spark, sfDir)
      .select(col("l_partkey"), col("l_suppkey"),
        expr("CAST(floor(l_extendedprice * 1000000 / l_quantity) AS BIGINT)")
          .as("unit_micro"))
      .groupBy(col("l_partkey"), col("l_suppkey"))
      .agg(min("unit_micro").as("cost_micro"))
    cost.join(eur, col("l_suppkey") === col("s_suppkey"))
      .join(smallParts, col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_partkey"), col("p_name"))
      .agg(min(struct(col("cost_micro"), col("s_suppkey"), col("s_name")))
        .as("best"))
      .select(col("p_partkey"), col("p_name"),
        col("best.cost_micro").as("cost_micro"),
        col("best.s_suppkey").as("s_suppkey"),
        col("best.s_name").as("s_name"))
      .orderBy(col("cost_micro"), col("p_partkey"))
      .limit(100)
  }

  /** t27 — profit by (supplier nation, order year) — the TPC-H Q9 shape
    * without a partsupp table: unit cost is approximated from the part's
    * retail price (retail/10 per unit), keeping Q9's defining feature —
    * the LONGEST fact-side join chain in the suite. One lineitem scan
    * threads through FOUR joins on three different SF-scaling keys
    * (partkey → suppkey → orderkey) plus the fixed-dim nation broadcast.
    * Scale shape: the selective p_name word filter lands on the part
    * scan (PushedFilters) and — because it is the first join — prunes
    * the fact stream before the wider supplier/orders shuffles; every
    * SF-scaling join is left to the size-based planner / AQE (the t5/t10
    * lesson), and the profit term is per-row floor'd integer MICROS
    * (t26's discipline), so partial aggregation is exact under any
    * partitioning. At 100 TB this is the query where join ORDER is the
    * whole game; the declared shape gives Catalyst/AQE the reorder
    * freedom a hand-scheduled chain would forfeit.
    */
  def profitByNation(spark: SparkSession, sfDir: String): DataFrame = {
    val redParts = Tables.part(spark, sfDir)
      .filter(col("p_name").contains("red"))
      .select(col("p_partkey"), col("p_retailprice"))
    Tables.lineitem(spark, sfDir)
      .select(col("l_orderkey"), col("l_partkey"), col("l_suppkey"),
        col("l_extendedprice"), col("l_discount"), col("l_quantity"))
      .join(redParts, col("l_partkey") === col("p_partkey"))
      .join(Tables.supplier(spark, sfDir).select("s_suppkey", "s_nationkey"),
        col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(Tables.nation(spark, sfDir).select("n_nationkey", "n_name")),
        col("s_nationkey") === col("n_nationkey"))
      .join(Tables.orders(spark, sfDir).select("o_orderkey", "o_orderdate"),
        col("l_orderkey") === col("o_orderkey"))
      .withColumn("profit_micro",
        expr("CAST(floor(l_extendedprice * (1.0 - l_discount) * 1000000) AS BIGINT)" +
          " - CAST(floor(p_retailprice * l_quantity * 100000) AS BIGINT)"))
      .groupBy(col("n_name").as("nation"), year(col("o_orderdate")).as("o_year"))
      .agg(sum("profit_micro").as("profit_micro"),
        count(lit(1)).as("n_items"))
  }

  /** t28 — suppliers who kept orders waiting (TPC-H Q21 shape, lateness
    * improvised as shipdate > orderdate + 90 days since the testdata has
    * no receipt/commit dates): for finished orders with MORE THAN ONE
    * supplier where EXACTLY ONE was late, count waiting incidents per
    * supplier, top 20. Q21's notorious double correlated quantifier
    * (EXISTS another supplier / NOT EXISTS another late one) is stated
    * directly as per-order counts over the (order, supplier) grain —
    * the decorrelated form Catalyst would have to reach anyway, minus
    * the rewrite risk: one fact co-partition on l_orderkey serves the
    * pair aggregate, the per-order rollup AND the join between them
    * (exchange reuse), the quantifiers become two integer comparisons,
    * and the supplier join is AQE's choice (SF-scaling, never hinted).
    * Top-20 bounds through TakeOrderedAndProject with a deterministic
    * (numwait desc, name) tiebreak.
    */
  def waitingSuppliers(spark: SparkSession, sfDir: String): DataFrame = {
    val fin = Tables.orders(spark, sfDir)
      .filter(col("o_orderstatus") === "F")
      .select(col("o_orderkey"), col("o_orderdate"))
    val pairs = Tables.lineitem(spark, sfDir)
      .select(col("l_orderkey"), col("l_suppkey"), col("l_shipdate"))
      .join(fin, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("l_orderkey"), col("l_suppkey"))
      .agg(max(when(col("l_shipdate") >
        col("o_orderdate") + expr("INTERVAL 90 DAYS"), 1L).otherwise(0L))
        .as("late"))
    val perOrder = pairs.groupBy(col("l_orderkey"))
      .agg(count(lit(1)).as("n_supp"), sum("late").as("n_late"))
    pairs.join(perOrder, Seq("l_orderkey"))
      .filter(col("late") === 1L && col("n_supp") > 1L && col("n_late") === 1L)
      .join(Tables.supplier(spark, sfDir).select("s_suppkey", "s_name"),
        col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("s_name"))
      .agg(count(lit(1)).as("numwait"))
      .orderBy(col("numwait").desc, col("s_name"))
      .limit(20)
  }

  val queries: Map[String, Q] = Map(
    "t28_waiting_suppliers" -> (waitingSuppliers _),
    "t27_profit_by_nation" -> (profitByNation _),
    "t26_min_cost_supplier" -> (minCostSupplier _),
    "t24_forecast_revenue" -> (forecastRevenue _),
    "t25_promo_share" -> (promoShare _),
    "t18_shipping_priority" -> (shippingPriority _),
    "t19_market_share" -> (marketShare _),
    "t20_large_orders" -> (largeOrders _),
    "t21_value_concentration" -> (valueConcentration _),
    "t22_returned_revenue" -> (returnedRevenue _),
    "t23_priority_classes" -> (priorityClasses _),
    "t17_major_suppliers" -> (majorSuppliers _),
    "t15_small_order_revenue" -> (smallOrderRevenue _),
    "t16_supplier_diversity" -> (supplierDiversity _),
    "t14_lost_customers" -> (lostCustomers _),
    "t13_orders_waiting" -> (ordersWaiting _),
    "t1_pricing_summary" -> (pricingSummary _),
    "t2_revenue_by_nation" -> (revenueByNation _),
    "t3_top_customers" -> (topCustomers _),
    "t4_segment_priority" -> (segmentPriority _),
    "t5_brand_revenue" -> (brandRevenue _),
    "t6_supplier_by_region" -> (supplierByRegion _),
    "t7_exists_priority" -> (priorityWithDiscount _),
    "t8_popular_parts" -> (popularParts _),
    "t9_volume_shipping" -> (volumeShipping _),
    "t10_disjunctive_revenue" -> (disjunctiveRevenue _),
    "t11_order_count_dist" -> (orderCountDist _),
    "t12_top_supplier" -> (topSupplier _)
  )

  val oracle: Map[String, String] = Map(
    "t28_waiting_suppliers" ->
      """WITH f AS (
        |  SELECT o_orderkey, o_orderdate FROM orders
        |  WHERE o_orderstatus = 'F'),
        |p AS (
        |  SELECT l_orderkey, l_suppkey,
        |    max(CASE WHEN l_shipdate > o_orderdate + INTERVAL 90 DAY
        |        THEN 1 ELSE 0 END) AS late
        |  FROM lineitem JOIN f ON l_orderkey = o_orderkey
        |  GROUP BY 1, 2),
        |o AS (
        |  SELECT l_orderkey, count(*) AS n_supp, sum(late) AS n_late
        |  FROM p GROUP BY 1)
        |SELECT s_name, count(*) AS numwait
        |FROM p JOIN o USING (l_orderkey)
        |JOIN supplier ON l_suppkey = s_suppkey
        |WHERE late = 1 AND n_supp > 1 AND n_late = 1
        |GROUP BY s_name
        |ORDER BY numwait DESC, s_name
        |LIMIT 20""".stripMargin,
    "t27_profit_by_nation" ->
      """SELECT n_name AS nation, CAST(year(o_orderdate) AS INTEGER) AS o_year,
        |  CAST(sum(CAST(floor(l_extendedprice * (1.0 - l_discount) * 1000000) AS BIGINT)
        |         - CAST(floor(p_retailprice * l_quantity * 100000) AS BIGINT)) AS BIGINT)
        |    AS profit_micro,
        |  count(*) AS n_items
        |FROM lineitem
        |JOIN part ON l_partkey = p_partkey AND p_name LIKE '%red%'
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY 1, 2""".stripMargin,
    // the argmin is stated as its definition (min cost, then min
    // suppkey among achievers) — provably equal to the struct-min
    "t26_min_cost_supplier" ->
      """WITH eur AS (
        |  SELECT s_suppkey, s_name FROM supplier
        |  JOIN nation ON s_nationkey = n_nationkey
        |  JOIN region ON n_regionkey = r_regionkey
        |  WHERE r_name = 'EUROPE'),
        |cost AS (
        |  SELECT l_partkey, l_suppkey,
        |    min(CAST(floor(l_extendedprice * 1000000 / l_quantity) AS BIGINT))
        |      AS cost_micro
        |  FROM lineitem GROUP BY 1, 2),
        |j AS (
        |  SELECT c.l_partkey AS jpk, c.cost_micro, c.l_suppkey
        |  FROM cost c JOIN eur e ON c.l_suppkey = e.s_suppkey),
        |mc AS (SELECT jpk, min(cost_micro) AS c FROM j GROUP BY 1),
        |w AS (
        |  SELECT j.jpk, j.cost_micro, min(j.l_suppkey) AS s_suppkey
        |  FROM j JOIN mc ON j.jpk = mc.jpk AND j.cost_micro = mc.c
        |  GROUP BY 1, 2)
        |SELECT w.jpk AS p_partkey, p.p_name, w.cost_micro, w.s_suppkey,
        |  e.s_name
        |FROM w
        |JOIN part p ON w.jpk = p.p_partkey AND p.p_size <= 5
        |JOIN eur e ON w.s_suppkey = e.s_suppkey
        |ORDER BY w.cost_micro, p_partkey
        |LIMIT 100""".stripMargin,
    "t24_forecast_revenue" ->
      """SELECT
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4)) *
        |           CAST(l_discount AS DECIMAL(18,4))) AS DOUBLE)
        |    AS forecast_revenue,
        |  count(*) AS n_items
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1998-01-01 00:00:00'
        |  AND l_shipdate < TIMESTAMP '1999-01-01 00:00:00'
        |  AND l_discount BETWEEN 0.05 AND 0.07
        |  AND l_quantity < 24""".stripMargin,
    "t25_promo_share" ->
      """SELECT CAST((sum(CASE WHEN p_type = 'PROMO'
        |    THEN CAST(CAST(l_extendedprice AS DECIMAL(18,4)) * 10000 AS HUGEINT) *
        |         CAST((CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4))) * 10000 AS HUGEINT)
        |    ELSE CAST(0 AS HUGEINT) END) * 1000000)
        |  // sum(CAST(CAST(l_extendedprice AS DECIMAL(18,4)) * 10000 AS HUGEINT) *
        |        CAST((CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4))) * 10000 AS HUGEINT))
        |  AS BIGINT) AS promo_ppm
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE l_shipdate >= TIMESTAMP '1998-09-01 00:00:00'
        |  AND l_shipdate < TIMESTAMP '1998-10-01 00:00:00'""".stripMargin,
    "t18_shipping_priority" ->
      """SELECT l_orderkey, o_orderdate, o_orderpriority,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4)) *
        |           (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4)))) AS DOUBLE)
        |    AS revenue
        |FROM customer
        |JOIN orders ON c_custkey = o_custkey
        |JOIN lineitem ON l_orderkey = o_orderkey
        |WHERE c_mktsegment = 'BUILDING'
        |  AND o_orderdate < TIMESTAMP '1998-06-01 00:00:00'
        |  AND l_shipdate > TIMESTAMP '1998-06-01 00:00:00'
        |GROUP BY l_orderkey, o_orderdate, o_orderpriority
        |ORDER BY revenue DESC, o_orderdate, l_orderkey
        |LIMIT 10""".stripMargin,
    "t19_market_share" ->
      """WITH tr AS (
        |  SELECT r_regionkey AS target_rk FROM nation
        |  JOIN region ON n_regionkey = r_regionkey
        |  WHERE n_name = 'NATION_1')
        |SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
        |  CAST((sum(CASE WHEN n_name = 'NATION_1'
        |              THEN CAST(CAST(l_extendedprice AS DECIMAL(18,4)) * 10000 AS HUGEINT)
        |              ELSE CAST(0 AS HUGEINT) END) * 1000000)
        |       // sum(CAST(CAST(l_extendedprice AS DECIMAL(18,4)) * 10000 AS HUGEINT))
        |    AS BIGINT) AS share_ppm
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN tr ON n_regionkey = target_rk
        |GROUP BY o_year""".stripMargin,
    "t20_large_orders" ->
      """SELECT c_name, c_custkey, o_orderkey, o_orderdate,
        |  CAST(CAST(o_totalprice AS DECIMAL(18,4)) AS DOUBLE) AS total_price,
        |  sum_qty
        |FROM (SELECT l_orderkey,
        |        CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty
        |      FROM lineitem GROUP BY l_orderkey HAVING sum_qty > 280) big
        |JOIN orders ON big.l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |ORDER BY total_price DESC, o_orderkey
        |LIMIT 100""".stripMargin,
    "t21_value_concentration" ->
      """WITH pv AS (
        |  SELECT l_partkey, sum(CAST(l_extendedprice AS DECIMAL(18,4))) AS v
        |  FROM lineitem GROUP BY l_partkey)
        |SELECT l_partkey, CAST(v AS DOUBLE) AS part_value FROM pv
        |WHERE v * (SELECT count(*) FROM pv) * 2 > (SELECT sum(v) FROM pv) * 3""".stripMargin,
    "t22_returned_revenue" ->
      """SELECT c_custkey, c_name, n_name,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4)) *
        |           (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4)))) AS DOUBLE)
        |    AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |WHERE l_returnflag = 'R'
        |  AND o_orderdate >= TIMESTAMP '2000-01-01 00:00:00'
        |GROUP BY c_custkey, c_name, n_name
        |ORDER BY revenue DESC, c_custkey
        |LIMIT 20""".stripMargin,
    "t23_priority_classes" ->
      """SELECT l_linestatus,
        |  CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
        |           THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
        |  CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
        |           THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |WHERE l_returnflag = 'R'
        |GROUP BY l_linestatus
        |ORDER BY l_linestatus""".stripMargin,
    "t17_major_suppliers" ->
      """WITH sp AS (
        |  SELECT l_partkey, l_suppkey,
        |    CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS q
        |  FROM lineitem GROUP BY l_partkey, l_suppkey),
        |pt AS (
        |  SELECT l_partkey, CAST(sum(q) AS BIGINT) AS tot
        |  FROM sp GROUP BY l_partkey)
        |SELECT s_suppkey, s_name FROM supplier
        |WHERE s_suppkey IN (
        |  SELECT sp.l_suppkey FROM sp JOIN pt USING (l_partkey)
        |  WHERE sp.q * 5 > pt.tot)""".stripMargin,
    "t15_small_order_revenue" ->
      """SELECT p.p_brand,
        |  CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,4))) AS DOUBLE)
        |    AS small_order_revenue,
        |  count(*) AS n_items
        |FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
        |WHERE p.p_brand IN ('Brand#11', 'Brand#22')
        |  AND CAST(l.l_quantity AS BIGINT) * 5 *
        |      (SELECT count(*) FROM lineitem l2
        |       WHERE l2.l_partkey = l.l_partkey)
        |    < (SELECT sum(CAST(l_quantity AS BIGINT)) FROM lineitem l2
        |       WHERE l2.l_partkey = l.l_partkey)
        |GROUP BY p.p_brand""".stripMargin,
    "t16_supplier_diversity" ->
      """SELECT p.p_brand, p.p_size,
        |  count(DISTINCT l.l_suppkey) AS supplier_cnt
        |FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
        |WHERE p.p_size <= 10
        |  AND l.l_suppkey NOT IN (SELECT s_suppkey FROM supplier
        |                          WHERE s_acctbal < 0)
        |GROUP BY p.p_brand, p.p_size""".stripMargin,
    "t14_lost_customers" ->
      """WITH pos AS (
        |  SELECT CAST(sum(CAST(c_acctbal AS DECIMAL(18,4))) AS DECIMAL(18,4))
        |           AS sum_pos,
        |         count(*) AS n_pos
        |  FROM customer WHERE c_acctbal > 0)
        |SELECT c_nationkey, count(*) AS numcust,
        |  CAST(sum(CAST(c_acctbal AS DECIMAL(18,4))) AS DOUBLE) AS totacctbal
        |FROM customer c
        |WHERE CAST(c_acctbal AS DECIMAL(18,4)) * (SELECT n_pos FROM pos)
        |        > (SELECT sum_pos FROM pos)
        |  AND NOT EXISTS (SELECT 1 FROM orders o
        |                  WHERE o.o_custkey = c.c_custkey
        |                    AND o.o_totalprice > 450000)
        |GROUP BY c_nationkey""".stripMargin,
    "t13_orders_waiting" ->
      """SELECT s.s_name, count(*) AS numwait
        |FROM supplier s
        |JOIN lineitem l1 ON l1.l_suppkey = s.s_suppkey
        |JOIN orders o ON o.o_orderkey = l1.l_orderkey
        |              AND o.o_orderstatus = 'F'
        |WHERE l1.l_returnflag = 'R'
        |  AND EXISTS (SELECT 1 FROM lineitem l2
        |              WHERE l2.l_orderkey = l1.l_orderkey
        |                AND l2.l_suppkey <> l1.l_suppkey)
        |  AND NOT EXISTS (SELECT 1 FROM lineitem l3
        |                  WHERE l3.l_orderkey = l1.l_orderkey
        |                    AND l3.l_suppkey <> l1.l_suppkey
        |                    AND l3.l_returnflag = 'R')
        |GROUP BY s.s_name
        |ORDER BY numwait DESC, s_name
        |LIMIT 10""".stripMargin,
    "t1_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_base_price,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4)) *
        |           (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4)))) AS DOUBLE)
        |    AS sum_disc_price,
        |  count(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1999-12-31 00:00:00'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "t2_revenue_by_nation" ->
      """SELECT n_name,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4)) *
        |           (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4)))) AS DOUBLE)
        |    AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
        |GROUP BY n_name
        |ORDER BY revenue DESC, n_name""".stripMargin,
    "t3_top_customers" ->
      """SELECT c_custkey, c_name,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS total_spend,
        |  count(*) AS n_orders
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_custkey, c_name
        |ORDER BY total_spend DESC, c_custkey LIMIT 10""".stripMargin,
    "t4_segment_priority" ->
      """SELECT c_mktsegment, o_orderpriority, count(*) AS n,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS total
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_mktsegment, o_orderpriority
        |ORDER BY c_mktsegment, o_orderpriority""".stripMargin,
    "t5_brand_revenue" ->
      """SELECT p_brand,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
        |  count(*) AS n_items
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE p_brand IN ('Brand#11', 'Brand#22')
        |GROUP BY p_brand ORDER BY p_brand""".stripMargin,
    "t6_supplier_by_region" ->
      """SELECT r_name, count(*) AS n_suppliers,
        |  CAST(sum(CAST(s_acctbal AS DECIMAL(18,4))) AS DOUBLE) AS total_acctbal
        |FROM supplier
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name ORDER BY r_name""".stripMargin,
    "t7_exists_priority" ->
      """SELECT o_orderpriority, count(*) AS n_orders
        |FROM orders o
        |WHERE EXISTS (SELECT 1 FROM lineitem l
        |              WHERE l.l_orderkey = o.o_orderkey AND l.l_discount > 0.08)
        |GROUP BY o_orderpriority""".stripMargin,
    "t8_popular_parts" ->
      """SELECT p_partkey, n_refs FROM (
        |  SELECT p_partkey,
        |    (SELECT count(*) FROM lineitem l
        |     WHERE l.l_partkey = p.p_partkey) AS n_refs
        |  FROM part p)
        |WHERE n_refs >= 35""".stripMargin,
    "t9_volume_shipping" ->
      """SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
        |  CAST(year(l_shipdate) AS BIGINT) AS l_year,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4)) *
        |           (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4)))) AS DOUBLE)
        |    AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation n1 ON s_nationkey = n1.n_nationkey
        |JOIN nation n2 ON c_nationkey = n2.n_nationkey
        |WHERE (n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
        |   OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1')
        |GROUP BY supp_nation, cust_nation, l_year""".stripMargin,
    "t10_disjunctive_revenue" ->
      """SELECT
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4)) *
        |           (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4)))) AS DOUBLE)
        |    AS revenue,
        |  count(*) AS n_items
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE (p_brand = 'Brand#11' AND p_size BETWEEN 1 AND 15
        |       AND l_quantity BETWEEN 1 AND 20)
        |   OR (p_brand = 'Brand#22' AND p_size BETWEEN 10 AND 30
        |       AND l_quantity BETWEEN 10 AND 35)""".stripMargin,
    "t11_order_count_dist" ->
      """SELECT n_orders, count(*) AS n_customers FROM (
        |  SELECT c_custkey, count(o_orderkey) AS n_orders
        |  FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        |  GROUP BY c_custkey)
        |GROUP BY n_orders""".stripMargin,
    "t12_top_supplier" ->
      """WITH rev AS (
        |  SELECT l_suppkey AS supplier_no,
        |    CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4)) *
        |             (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4))))
        |      AS DOUBLE) AS total_revenue
        |  FROM lineitem
        |  WHERE l_suppkey IS NOT NULL
        |  GROUP BY l_suppkey)
        |SELECT s_suppkey, s_name, total_revenue
        |FROM supplier JOIN rev ON s_suppkey = supplier_no
        |WHERE total_revenue = (SELECT max(total_revenue) FROM rev)""".stripMargin
  )
}
