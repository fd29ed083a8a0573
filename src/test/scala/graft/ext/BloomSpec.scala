package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Bloom runtime-filter pruning (b1/b2): the sketch may only ever PRUNE —
  * never change the result. The DuckDB oracle pins the end-to-end values
  * and the register bits at sf0.01; these tests pin the bloom contract
  * (no false negatives; false positives exist and are removed by the
  * exact confirm) and the fact-side plan shape.
  */
class BloomSpec extends SparkSpec {

  test("b1 equals the plain semi join — bloom is invisible in the result") {
    val got = Bloom.bloomPrunedRevenue(spark, sf)
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2))).toSet
    val li = graft.Tables.lineitem(spark, sf)
    val keys = graft.Tables.orders(spark, sf)
      .filter(col("o_orderpriority") === "1-URGENT").select("o_orderkey")
    val want = li.join(keys, col("l_orderkey") === col("o_orderkey"), "left_semi")
      .groupBy(col("l_returnflag"))
      .agg(sum(col("l_extendedprice").cast("decimal(18,4)") *
          (lit(1).cast("decimal(18,4)") - col("l_discount").cast("decimal(18,4)")))
        .cast("double").as("revenue"),
        count(lit(1)).as("n_items"))
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2))).toSet
    assert(got == want)
  }

  test("b3 equals the plain anti join; the miss fast-path holds zero true members") {
    val got = Bloom.bloomAntiRevenue(spark, sf)
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2))).toSet
    val li = graft.Tables.lineitem(spark, sf)
    val keys = graft.Tables.orders(spark, sf)
      .filter(col("o_orderpriority") === "1-URGENT").select("o_orderkey")
    val want = li.join(keys, col("l_orderkey") === col("o_orderkey"), "left_anti")
      .groupBy(col("l_returnflag"))
      .agg(sum(col("l_extendedprice").cast("decimal(18,4)") *
          (lit(1).cast("decimal(18,4)") - col("l_discount").cast("decimal(18,4)")))
        .cast("double").as("revenue"),
        count(lit(1)).as("n_items"))
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2))).toSet
    assert(got == want, s"bloom-split anti join diverged: $got vs $want")

    // the no-false-negative contract, stated on the SPLIT itself: a row
    // the sketch lets bypass the anti join must truly be a non-member.
    // (equivalently: fact keys that ARE members all test positive.)
    val keySet = keys.collect().map(_.getLong(0)).toSet
    val n = li.count()
    val candidates = Bloom.prunedCandidates(
      li, "l_orderkey",
      Bloom.bloomWordsFast(keys, "o_orderkey"), Bloom.NWords)
    val candKeys = candidates.select("l_orderkey").collect().map(_.getLong(0))
    val missKeys = li.select("l_orderkey").collect().map(_.getLong(0))
      .diff(candKeys)
    assert(missKeys.forall(k => !keySet.contains(k)),
      "a true member leaked into the bypass population")
    assert(candidates.count() < n, "sketch pruned nothing at test SF")
  }

  test("bloom candidates: superset of true matches, with FPs under a tiny sketch") {
    import spark.implicits._
    // 20 dim keys × 3 hashes over a deliberately tiny sketch (1 word =
    // 32 bits) nearly saturate it: false positives are guaranteed on
    // this fixed (md5-deterministic) data, false negatives impossible.
    val dimKeys = (1L to 20L)
    val keys = dimKeys.toDF("k")
    val fact = (1L to 500L).toDF("fk")
    val nWords = 1
    val candFrame = Bloom.prunedCandidates(fact, "fk",
      Bloom.bloomWordsFast(keys, "k", nWords), nWords)
    val cand = candFrame.collect().map(_.getLong(0)).toSet
    assert(dimKeys.toSet.subsetOf(cand), "bloom dropped a true match")
    assert(cand.size > dimKeys.size, "tiny sketch produced no false " +
      "positives — the confirm-join path is untested by this corpus")
    // and the exact confirm removes every false positive
    val confirmed = candFrame
      .join(keys, col("fk") === col("k"), "left_semi")
      .collect().map(_.getLong(0)).toSet
    assert(confirmed == dimKeys.toSet)
  }

  test("property: no false negatives for arbitrary key/fact sets and sizes") {
    import spark.implicits._
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    // plain Gen from fixed seeds (offline classpath has no scalatest
    // bridge) — deterministic across runs, like MaterializePropertySpec
    val gen = for {
      nKeys <- Gen.choose(0, 30)
      keys <- Gen.listOfN(nKeys, Gen.choose(1L, 1000L))
      nFact <- Gen.choose(0, 80)
      facts <- Gen.listOfN(nFact, Gen.choose(1L, 1000L))
      nWords <- Gen.oneOf(1, 2, 8, 64)
    } yield (keys.distinct, facts, nWords)
    for (seed <- 1L to 6L) {
      val (keys, facts, nWords) =
        gen.apply(Gen.Parameters.default, Seed(seed)).get
      val cand = Bloom.prunedCandidates(facts.toDF("fk"), "fk",
          Bloom.bloomWordsFast(keys.toDF("k"), "k", nWords), nWords)
        .collect().map(_.getLong(0))
      val trueMatches = facts.filter(keys.contains)
      // multiset-faithful: every matching fact ROW survives exactly once
      assert(cand.count(trueMatches.contains) == trueMatches.size,
        s"seed=$seed nWords=$nWords lost a matching row")
      assert(cand.toSet.subsetOf(facts.toSet), s"seed=$seed invented rows")
    }
  }

  test("prune runs BELOW the confirm, unshuffled, in native hashing") {
    // The point of the runtime filter: the lineitem scan flows into the
    // bloom bit-test with no Exchange in between, and the exact semi
    // join runs ON THE SURVIVORS — Catalyst's PushDownLeftSemiAntiJoin
    // would silently invert that order without the barrier (it did; the
    // regression this test pins).
    val p = Bloom.bloomPrunedRevenue(spark, sf)
      .queryExecution.executedPlan.toString
    assert(p.contains("BroadcastExchange"), s"register table not broadcast:\n$p")
    assert(p.contains("xxhash64"), s"fact side not on the native hash:\n$p")
    val semi = p.indexOf("LeftSemi")
    val idx = p.indexOf("shiftleft")
    assert(idx >= 0, s"bit test missing from plan:\n$p")
    assert(semi >= 0 && semi < idx,
      s"exact semi join was pushed below the bloom prune:\n$p")
    // no shuffle and no semi join between the bit test and the scan
    val below = p.substring(idx)
    val lineitemScan = below.indexOf("lineitem")
    assert(lineitemScan >= 0, s"lineitem scan not under the bit test:\n$p")
    val between = below.substring(0, lineitemScan)
    assert(!between.contains("Exchange hashpartitioning"),
      s"fact side shuffles before the bloom test:\n$p")
    assert(!between.contains("LeftSemi"),
      s"semi join crept between the bit test and the scan:\n$p")
  }
}
