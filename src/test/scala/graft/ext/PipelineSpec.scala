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

  test("p6 shard plan equals the naive single-window fold; conserves; parallel cumsum") {
    import graft.ext.Portable.{tokenHashOf, P}
    val docs = graft.Tables.documents(spark, sf)
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    // the naive definition: ONE global cumsum over (h, doc_id) order —
    // exactly what the two-phase bucket decomposition must reproduce
    val ordered = docs.map { case (id, text) =>
      (tokenHashOf(id.toString + ":1"), id, text.split(" ", -1).length.toLong)
    }.sortBy(t => (t._1, t._2))
    var cum = 0L
    val assigned = ordered.map { case (h, id, n) =>
      cum += n
      ((cum - n) / Pipeline.ShardBudget, h, n)
    }
    val expected = assigned.groupBy(_._1).map { case (s, xs) =>
      s -> ((xs.length.toLong, xs.map(_._3).sum,
        xs.map(_._2).sum % P, xs.map(_._2).min, xs.map(_._2).max))
    }
    val q = Pipeline.shardPlan(spark, sf)
    val got = q.collect().map(r => r.getLong(0) ->
      ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
        r.getLong(5)))).toMap
    assert(got == expected,
      s"diverges on ${got.keys.filter(k => got.get(k) != expected.get(k)).take(3)}")
    // conservation: every doc and every token lands in exactly one shard
    assert(got.values.map(_._1).sum == docs.length.toLong)
    assert(got.values.map(_._2).sum == ordered.map(_._3).sum)
    // epoch shuffle must actually shuffle: hash order != doc_id order
    assert(ordered.map(_._2).toSeq != ordered.map(_._2).sorted.toSeq ||
      docs.length < 3, "hash order degenerate")
    // the corpus-grain cumsum runs PARTITIONED by bucket (the two-phase
    // shape) — the plan must hash-partition on bucket, and the only
    // single-partition window input is the bounded bucket-sums frame
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("hashpartitioning(bucket"),
      s"p6 lost the bucket-parallel cumsum:\n$plan")
  }

  test("p6 oversized document: shard ids gap but offsets stay exact") {
    import graft.ext.Portable.tokenHashOf
    import spark.implicits._
    // one doc of 3.2 budgets of tokens among small docs — wherever the
    // hash permutation lands it, it must swallow >= 3 whole shard ids
    val giantTokens = (Pipeline.ShardBudget * 16 / 5).toInt
    // doc 3 sorts FIRST under H(id‖":1") among {1,2,3,4} (deterministic
    // md5 order: 3 < 1 < 2 < 4), so the giant provably swallows shards
    // 1-2 before any small doc's start offset
    val docsRows = Seq(
      (3L, (1 to giantTokens).map(i => s"g$i").mkString(" ")),
      (2L, "alpha beta gamma"),
      (1L, "delta epsilon"),
      (4L, "zeta eta theta iota"))
    val got = Pipeline.shardPlanOf(docsRows.toDF("doc_id", "text"))
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    // driver-side naive fold, identical to the main test's
    val ordered = docsRows.map { case (id, text) =>
      (tokenHashOf(id.toString + ":1"), id, text.split(" ", -1).length.toLong)
    }.sortBy(t => (t._1, t._2))
    var cum = 0L
    val expected = ordered.map { case (h, _, n) =>
      cum += n; ((cum - n) / Pipeline.ShardBudget, h, n)
    }.groupBy(_._1).map { case (s, xs) =>
      s -> ((xs.length.toLong, xs.map(_._3).sum,
        xs.map(_._2).sum % graft.ext.Portable.P))
    }
    assert(got == expected, s"got $got expected $expected")
    // the giant doc must actually gap the id sequence — otherwise this
    // corpus exercises nothing the main test doesn't
    val ids = got.keySet
    assert(ids.max >= 3L && ids.size < ids.max + 1,
      s"no gap produced: $ids")
    // conservation still exact through the gap
    assert(got.values.map(_._2).sum == ordered.map(_._3).sum)
  }
}
