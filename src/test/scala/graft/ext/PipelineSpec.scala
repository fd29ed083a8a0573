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

  test("p6 epochs: different permutation, identical totals, reproducible") {
    val docs = graft.Tables.documents(spark, sf)
      .select(col("doc_id"), col("text"))
    def assignments(epoch: Long): Map[Long, Long] =
      Pipeline.shardDocsOf(docs, epoch).collect()
        .map(r => r.getLong(0) -> r.getLong(3)).toMap
    val e1 = assignments(1L)
    val e2 = assignments(2L)
    assert(e1.keySet == e2.keySet, "epochs must cover the same corpus")
    // a different epoch is a genuinely different permutation
    assert(e1 != e2, "epoch 2 produced the identical shard assignment")
    // but the corpus-level invariants are identical
    def totals(df: org.apache.spark.sql.DataFrame): (Long, Long) = {
      val r = df.agg(sum("n_docs"), sum("shard_tokens")).collect().head
      (r.getLong(0), r.getLong(1))
    }
    assert(totals(Pipeline.shardPlan(spark, sf)) ==
      totals(Pipeline.shardPlanEpoch2(spark, sf)),
      "token/doc totals must be epoch-invariant")
    // and each epoch is REPRODUCIBLE — the loader can re-derive it
    assert(assignments(2L) == e2, "epoch 2 not deterministic")
  }

  test("p7 shard verify: untampered passes; each tamper lights the right shards") {
    import spark.implicits._
    // a corpus big enough for several shards
    val docsRows = (1L to 40L).map(id =>
      (id, (1 to 600).map(i => s"w$id-$i").mkString(" ")))
    val docs = docsRows.toDF("doc_id", "text")
    val manifest = Pipeline.shardPlanOf(docs)
    val fetched = Pipeline.shardDocsOf(docs, 1L)
    def verdicts(f: org.apache.spark.sql.DataFrame): Map[Long, Boolean] =
      Pipeline.shardVerifyOf(manifest, f).collect()
        .map(r => r.getLong(0) -> r.getBoolean(7)).toMap
    val clean = verdicts(fetched)
    assert(clean.size >= 3, s"need several shards, got ${clean.size}")
    assert(clean.values.forall(identity), s"untampered must verify: $clean")
    val byDoc = fetched.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // dropped doc: exactly its shard fails
    val victim = byDoc.head
    val dropped = verdicts(fetched.filter(col("doc_id") =!= victim._1))
    assert(!dropped(victim._4), "dropped doc undetected")
    assert(dropped.filter(_._1 != victim._4).values.forall(identity),
      "drop detection must be local to the tampered shard")
    // altered text (token count changed): its shard fails
    val altered = verdicts(fetched.withColumn("n_tok",
      when(col("doc_id") === victim._1, col("n_tok") + 1L)
        .otherwise(col("n_tok"))))
    assert(!altered(victim._4), "altered token count undetected")
    // cross-shard swap: both shards fail, everything else passes
    val (sA, sB) = {
      val ss = byDoc.map(_._4).distinct.sorted; (ss(0), ss(1))
    }
    val docA = byDoc.find(_._4 == sA).get._1
    val docB = byDoc.find(_._4 == sB).get._1
    val swapped = verdicts(fetched.withColumn("shard_id",
      when(col("doc_id") === docA, sB)
        .when(col("doc_id") === docB, sA)
        .otherwise(col("shard_id"))))
    assert(!swapped(sA) && !swapped(sB), "cross-shard swap undetected")
    assert(swapped.filter(k => k._1 != sA && k._1 != sB).values.forall(identity))
    // phantom shard the manifest never issued: appears as a failing row
    val phantomId = byDoc.map(_._4).max + 5L
    val phantom = verdicts(fetched.unionByName(
      Seq((999L, 10L, 12345L, phantomId)).toDF("doc_id", "n_tok", "h", "shard_id")))
    assert(phantom.contains(phantomId) && !phantom(phantomId),
      "phantom shard must surface as a failing row")
    // missing shard (fetch lost it entirely): its manifest row fails
    val missing = verdicts(fetched.filter(col("shard_id") =!= sA))
    assert(!missing(sA), "missing shard undetected")
  }
}
