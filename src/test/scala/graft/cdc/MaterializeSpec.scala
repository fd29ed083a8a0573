package graft.cdc

import graft.SparkSpec

class MaterializeSpec extends SparkSpec {
  import spark.implicits._

  // (seq, key, op-analog, payload) — event_type "error" is the delete.
  private def frame(rows: (Long, Long, String, Double)*) =
    rows.toDF("event_id", "user_id", "event_type", "value")

  test("last write per key wins, ordered by seq not arrival") {
    // Deliberately out of arrival order: seq decides.
    val events = frame(
      (3L, 1L, "purchase", 30.0),
      (1L, 1L, "signup", 10.0),
      (2L, 1L, "click", 20.0),
      (5L, 2L, "view", 50.0),
      (4L, 2L, "signup", 40.0)
    )
    val view = Materialize.view(events, "user_id", "event_id",
      events("event_type"), "error", Seq("value"))
    val got = view.select("user_id", "event_id", "value")
      .as[(Long, Long, Double)].collect().sortBy(_._1)
    assert(got.toSeq == Seq((1L, 3L, 30.0), (2L, 5L, 50.0)))
  }

  test("delete removes the key; delete-then-reinsert resurrects it") {
    val events = frame(
      (1L, 1L, "signup", 1.0),
      (2L, 1L, "error", 0.0), // delete: key 1 gone
      (1L, 2L, "signup", 2.0),
      (2L, 2L, "error", 0.0),
      (3L, 2L, "signup", 9.0) // reinsert after delete: key 2 live
    )
    val view = Materialize.view(events, "user_id", "event_id",
      events("event_type"), "error", Seq("value"))
    val got = view.select("user_id", "value").as[(Long, Double)].collect().sortBy(_._1)
    assert(got.toSeq == Seq((2L, 9.0)))
  }

  test("view equals a sequential fold of the event log (sf0.001)") {
    val events = graft.Tables.events(spark, sf)
      .select("event_id", "user_id", "event_type").as[(Long, Long, String)]
      .collect()
    val expected = events.sortBy(_._1).foldLeft(Map.empty[Long, (Long, String)]) {
      case (state, (seqId, key, op)) =>
        if (op == "error") state - key else state + (key -> ((seqId, op)))
    }
    val got = CdcQueries.materialize(spark, sf)
      .select("user_id", "event_id", "event_type").as[(Long, Long, String)]
      .collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got == expected)
  }

  test("materialization plan is a partial/final aggregate, not a windowed sort") {
    val plan = CdcQueries.materialize(spark, sf).queryExecution.executedPlan.toString
    // max_by(struct, seq) plans as SortAggregate (struct agg buffers are
    // not hash-aggregable) but still in a partial/final pair: the shuffle
    // carries at most one row per (mapper, key), unlike a row_number window
    // which shuffles the full event history.
    val aggregates = "(?m)^.*Aggregate".r.findAllIn(plan).size
    assert(aggregates >= 2, s"expected partial+final aggregate pair in:\n$plan")
    assert(!plan.contains("Window"), s"unexpected Window operator in:\n$plan")
  }

  test("log compaction keeps exactly the newest k per key, pre-shuffle limited") {
    val out = CdcQueries.logCompact(spark, sf, keep = 3)
    val byKey = out.collect().groupBy(_.getLong(0))
    assert(byKey.nonEmpty)
    for ((k, rows) <- byKey) {
      assert(rows.length <= 3, s"key $k kept ${rows.length} versions")
      // kept versions are the TOP event_ids for the key
      val keptIds = rows.map(_.getLong(1)).sorted.reverse.toSeq
      val allIds = graft.Tables.events(spark, sf)
        .filter(org.apache.spark.sql.functions.col("user_id") === k)
        .select("event_id").collect().map(_.getLong(0)).sorted.reverse.toSeq
      assert(keptIds == allIds.take(3), s"key $k kept $keptIds, wanted ${allIds.take(3)}")
    }
    // WindowGroupLimit: each partition discards beyond-k rows BEFORE the
    // exchange — the compaction shuffle carries ≤ k rows per key
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"),
      s"rank limit not pushed below the exchange:\n$plan")
  }
}
