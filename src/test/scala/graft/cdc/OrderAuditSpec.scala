package graft.cdc

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** o22's inversion logic against a SYNTHETIC stream with known
  * arrival-order inversions — the registry testdata contains none, so
  * without this spec the oracle comparison would only prove that an
  * all-healthy stream audits as all-healthy (the vacuity VERDICT r6
  * flagged). Expected values come from an independent sequential fold
  * over the same rows, not from re-running the window.
  */
class OrderAuditSpec extends SparkSpec {

  // (user, seq, event-time micros). Apply order is seq; event time runs
  // backward at a:3 (skew 5s), a:5 (skew 2s), c:2 (skew 7s). b is clean.
  private val rows = Seq(
    ("a", 1L, 1_000_000L), ("a", 2L, 4_000_000L), ("a", 3L, -1_000_000L),
    ("a", 4L, 6_000_000L), ("a", 5L, 4_000_000L), ("a", 6L, 9_000_000L),
    ("b", 1L, 2_000_000L), ("b", 2L, 2_000_000L), ("b", 3L, 8_000_000L),
    ("c", 1L, 5_000_000L), ("c", 2L, -2_000_000L)
  )

  private def audit() = {
    import spark.implicits._
    val events = rows.toDF("user_id", "event_id", "us")
      // deliberately shuffled input order: the window must order by seq,
      // not by arrival
      .orderBy(rand(7))
      .withColumn("ts", timestamp_micros(col("us")))
      .drop("us")
    CdcQueries.orderAuditFrom(events)
      .collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
  }

  // independent oracle: sequential fold per user in apply order
  private val expected: Map[String, (Long, Long, Long)] =
    rows.groupBy(_._1).map { case (u, es) =>
      val ts = es.sortBy(_._2).map(_._3)
      val skews = ts.zip(ts.tail).map { case (p, n) => p - n }
      u -> ((skews.size.toLong,
        skews.count(_ > 0).toLong,
        (0L +: skews).max))
    }

  test("o22 detects known inversions (counts + max skew vs sequential fold)") {
    val got = audit()
    assert(got.keySet == expected.keySet, s"keys: $got vs $expected")
    for ((u, e) <- expected)
      assert(got(u) == e, s"user $u: got ${got(u)}, expected $e")
    // the synthetic stream is non-vacuous by construction
    assert(expected("a")._2 == 2L && expected("c")._2 == 1L)
    assert(expected("a")._3 == 5_000_000L && expected("c")._3 == 7_000_000L)
    // and the clean key still gets a health row with zero inversions
    assert(got("b") == ((2L, 0L, 0L)))
  }
}
