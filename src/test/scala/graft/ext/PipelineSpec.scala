package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** p4's water-filling invariants: the closed form must behave exactly
  * like the iterative definition — budget exhausted, caps respected,
  * and fairness (unsaturated allocations within one char of each other).
  */
class PipelineSpec extends SparkSpec {

  test("p4 water-filling: exhausts the budget, respects caps, fair level") {
    val rows = Pipeline.tokenBudget(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getBoolean(3), r.getLong(4)))
    val budget = rows.head._3
    assert(rows.map(_._3).distinct.size == 1, "budget must be one constant")
    // allocations exactly exhaust the budget (remainder distribution
    // included) unless every language saturated
    val totalAlloc = rows.map(_._5).sum
    if (rows.exists(!_._4)) assert(totalAlloc == budget,
      s"alloc ${totalAlloc} != budget $budget")
    // never allocate beyond a language's cap
    assert(rows.forall(r => r._5 <= r._2), s"alloc over cap: $rows")
    // saturated <=> allocated its full cap, both directions: a saturated
    // row must have alloc == cap, and an unsaturated row must NOT (an
    // unsaturated language reaching its cap via the +1 remainder would
    // mean the flag lied)
    assert(rows.forall(r => r._4 == (r._5 == r._2)),
      s"saturation flag disagrees with alloc: $rows")
    // water level: unsaturated languages all sit within 1 char
    val unsat = rows.filter(!_._4).map(_._5)
    if (unsat.nonEmpty)
      assert(unsat.max - unsat.min <= 1, s"uneven water level: $rows")
    // the corpus skew must exercise BOTH branches
    assert(rows.exists(_._4) && rows.exists(!_._4),
      s"vacuous corpus for p4: $rows")
    // a saturated language's cap can never exceed an unsaturated alloc+1
    for (s <- rows.filter(_._4); u <- rows.filter(!_._4))
      assert(s._2 <= u._5 + 1, s"saturation order violated: $s vs $u")
  }
}
