package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The v-family data-quality layer. The DuckDB oracle pins every value
  * at sf0.01; these tests pin the CONTRACTS the oracle comparison alone
  * cannot state: the suite's verdict mix is non-trivial (some
  * constraints pass, some fail — i.e. the metrics measure the data, not
  * the DDL), shares are exact ppm partitions, and the plans stay
  * aggregate-shaped (no cartesian products, no row-grain state past the
  * partial aggregates).
  */
class ValidateSpec extends SparkSpec {

  test("v1 suite covers the declared constraints with a non-trivial verdict mix") {
    val rows = Validate.expectationSuite(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getBoolean(3)))
    val byName = rows.map(r => r._1 -> r).toMap
    assert(rows.length == 12 && byName.size == 12, "duplicate or missing constraint")
    assert(rows.forall { case (_, m, _, _) => m >= 0L && m <= 1000000L },
      "metric outside [0, 1e6] ppm")
    // event_id IS a key; user_id is NOT (events repeat per user): the
    // suite must report both verdicts or it is restating assumptions
    assert(byName("uniqueness_events_event_id")._4, "event_id uniqueness should pass")
    assert(!byName("uniqueness_events_user_id")._4, "user_id 'uniqueness' should fail")
    assert(byName("uniqueness_events_user_id")._2 < 1000000L)
    // passed is derived from metric vs threshold, row by row
    assert(rows.forall { case (_, m, t, p) => p == (m >= t) })
  }

  test("v2 referential integrity: clean corpus, real child counts, sane plan") {
    val df = Validate.referentialIntegrity(spark, sf)
    val rows = df.collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(rows.length == 5)
    assert(rows.forall(_._2 > 0L), s"empty child side: ${rows.mkString(",")}")
    assert(rows.forall(_._3 == 0L), s"orphans in clean corpus: ${rows.mkString(",")}")
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct"), s"cartesian in v2:\n$p")
    // the 25-row nation parent must come in as a broadcast, not a shuffle
    assert(p.contains("BroadcastHashJoin"), s"no broadcast join in v2:\n$p")
    // the r12 scale shape: child keys PRE-AGGREGATE to (edge, key) grain
    // before the join — at 100x the parent union stops broadcasting, and
    // without the pre-agg the join shuffles 3x|lineitem| exploded rows
    // (exp 1.09 / 72 s at sf10-synth, caught by the round-12 sweep).
    // The pre-agg is visible as a hash partitioning on the (__e, __k)
    // pair BELOW the join, at any SF.
    assert(p.contains("hashpartitioning(__e") && p.contains("__k"),
      s"v2 lost the (edge, key) pre-aggregation:\n$p")
  }

  test("v3 uniqueness profile separates keys from non-keys") {
    val rows = Validate.uniquenessProfile(spark, sf).collect()
      .map(r => ((r.getString(0), r.getString(1)), (r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap
    assert(rows.size == 6)
    for (((rel, key), (n, k, s)) <- rows) {
      assert(s == n - k, s"$rel.$key surplus inconsistent")
      assert(n > 0L, s"$rel.$key empty")
    }
    assert(rows(("events", "event_id"))._3 == 0L, "event_id must be unique")
    assert(rows(("events", "user_id"))._3 > 0L,
      "user_id surplus must be positive — the non-key control")
    // the synthetic generator repeats (orderkey, linenumber) — the
    // composite row is a second non-key control, measured not assumed
    assert(rows(("lineitem", "l_orderkey,l_linenumber"))._3 > 0L,
      "composite surplus expected in the synthetic corpus")
  }

  test("v4 drift shares are exact ppm partitions of each half") {
    val rows = Validate.valueDrift(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    assert(rows.forall(r => r._1 >= 0L && r._1 <= 9L), "bin outside geometry")
    // floor-ppm shares: each half's shares sum to 1e6 minus at most
    // (bins − 1) floor losses
    val sumOld = rows.map(_._4).sum
    val sumNew = rows.map(_._5).sum
    assert(sumOld > 1000000L - rows.length && sumOld <= 1000000L, s"old shares sum $sumOld")
    assert(sumNew > 1000000L - rows.length && sumNew <= 1000000L, s"new shares sum $sumNew")
    assert(rows.forall(r => r._6 == math.abs(r._4 - r._5)))
    // both halves populated: the midpoint split measured real data
    assert(rows.map(_._2).sum > 0L && rows.map(_._3).sum > 0L)
  }

  test("v5 weekly shares partition each week; deltas measure real drift") {
    val rows = Validate.shareDrift(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    val byWeek = rows.groupBy(_._1)
    assert(byWeek.size >= 2, "need multiple weeks for a drift monitor")
    for ((wk, rs) <- byWeek) {
      val s = rs.map(_._4).sum
      assert(s > 1000000L - rs.length && s <= 1000000L, s"week $wk shares sum $s")
    }
    assert(rows.exists(_._6 > 0L), "zero drift everywhere — vacuous monitor")
  }

  test("v6 Benford: declared expectation is a ppm partition; audit measures data") {
    assert(Validate.BenfordPpm.map(_._2).sum == 1000000L,
      "the nine expected shares must partition one million exactly")
    val rows = Validate.benfordAudit(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(rows.map(_._1).toSet.subsetOf((1L to 9L).toSet))
    val obsSum = rows.map(_._3).sum
    assert(obsSum > 1000000L - 9 && obsSum <= 1000000L, s"observed shares sum $obsSum")
    assert(rows.forall(r => r._5 == math.abs(r._3 - r._4)))
    // the synthetic generator's price bands are NOT Benford — the audit
    // must say so (a near-zero delta everywhere would be suspicious)
    assert(rows.map(_._5).max > 10000L, "no measurable deviation — vacuous audit")
  }

  test("v7 FD audit: violation counts bounded by groups, non-trivial mix") {
    val rows = Validate.fdAudit(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.length == 4)
    assert(rows.forall(r => r._3 <= r._2 && r._2 > 0L))
    assert(rows.forall(r => r._4 >= 0L && r._4 <= 1000000L))
    // at least one FD candidate must be measurably violated, and the
    // rates must not all be identical (data-measured, not constant)
    assert(rows.exists(_._3 > 0L))
    assert(rows.map(_._4).distinct.length > 1)
  }

  test("drift plans scan the corpus the minimum number of times") {
    // DataFrame reuse is by subtree, not reference: the first version of
    // these queries re-aggregated the base frame per consumer and paid
    // 4 corpus scans each. The window-shape rewrite pins the floor.
    def scans(df: org.apache.spark.sql.DataFrame): Int = {
      df.count()
      val p = df.queryExecution.executedPlan.toString.split("== Initial Plan ==").head
      "Scan parquet".r.findAllIn(p).size
    }
    assert(scans(Validate.valueDrift(spark, sf)) == 2,
      "v4 must scan events exactly twice (midpoint pass + binning pass)")
    assert(scans(Validate.shareDrift(spark, sf)) == 1,
      "v5 must scan events exactly once")
  }

  test("v1/v3 plans hold no joins — pure aggregate pipelines") {
    for (q <- Seq(Validate.expectationSuite(spark, sf),
        Validate.uniquenessProfile(spark, sf))) {
      val p = q.queryExecution.executedPlan.toString
      assert(!p.contains("Join"), s"unexpected join:\n$p")
      assert(!p.contains("CartesianProduct"))
    }
  }

  test("v8 MAD anomaly: exact doubled-median identities, one scan, no joins") {
    val df = Validate.volumeAnomaly(spark, sf)
    val rows = df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
      r.getLong(3), r.getLong(4), r.getLong(5), r.getBoolean(6)))
    assert(rows.nonEmpty)
    // med/mad are corpus constants, identical on every row
    assert(rows.map(_._3).distinct.length == 1 && rows.map(_._5).distinct.length == 1)
    val med2 = rows.head._3; val mad4 = rows.head._5
    // doubled median really is the sum of the two middle order stats
    val ns = rows.map(_._2).sorted
    val cnt = ns.length
    assert(med2 == ns((cnt + 1) / 2 - 1) + ns(cnt / 2), "median_x2 identity")
    val devs = rows.map(_._4).sorted
    assert(mad4 == devs((cnt + 1) / 2 - 1) + devs(cnt / 2), "mad_x4 identity")
    // every row's score and verdict re-derive from its own columns
    for ((_, n, m2, d2, m4, s, a) <- rows) {
      assert(d2 == math.abs(2 * n - m2))
      assert(s == (BigInt(d2) * 2000000 / BigInt(math.max(m4, 1L))).toLong)
      assert(a == (s > Validate.VolumeAnomalyPpm))
    }
    // the scores measure the data, not the formula: real spread
    assert(rows.map(_._6).distinct.length > 5, "scores are near-constant")
    val p = df.queryExecution.executedPlan.toString.split("== Initial Plan ==").head
    assert("Scan parquet".r.findAllIn(p).size == 1, s"v8 must scan events once:\n$p")
    assert(!p.contains("Join") && !p.contains("CartesianProduct"))
  }
}
