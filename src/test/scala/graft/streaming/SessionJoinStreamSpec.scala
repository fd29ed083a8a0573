package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import java.sql.Timestamp

case class SEv(user: Int, ts: Timestamp, kind: String)
case class REv(ruser: Int, rts: Timestamp, amount: Double)

/** Streaming session windows and stream-stream interval joins: both must
  * equal their batch evaluation over the same closed event set (the
  * watermark only controls WHEN results emit, never WHAT emits).
  */
class SessionJoinStreamSpec extends SparkSpec {

  private def ts(minute: Int) = Timestamp.valueOf(f"2026-01-01 10:$minute%02d:00")

  test("streaming session windows equal the batch session_window aggregation") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    // user 1: minutes 1,2,3 then 20,21 → two sessions at a 5-minute gap;
    // user 2: one event → one singleton session
    val evs = Seq(
      SEv(1, ts(1), "a"), SEv(1, ts(2), "a"), SEv(1, ts(3), "a"),
      SEv(1, ts(20), "a"), SEv(1, ts(21), "a"),
      SEv(2, ts(5), "a"))
    val in = MemoryStream[SEv]
    val q = StreamApply.sessionCounts(in.toDF(), "ts", "user",
        gap = "5 minutes", horizon = "1 minute")
      .writeStream.outputMode("append")
      .format("memory").queryName("sess_out").start()
    try {
      in.addData(evs)
      q.processAllAvailable()
      in.addData(SEv(9, ts(59), "a")) // advance watermark, close all sessions
      q.processAllAvailable()
    } finally q.stop()

    def key(r: org.apache.spark.sql.Row) =
      (r.getInt(0), r.getTimestamp(1), r.getTimestamp(2), r.getLong(3))
    val streamed = spark.table("sess_out").collect().map(key).toSet
    val batch = StreamApply.sessionCounts(evs.toDF(), "ts", "user",
        gap = "5 minutes", horizon = "1 minute")
      .collect().map(key).toSet
    assert(batch.subsetOf(streamed), s"stream=$streamed batch=$batch")
    assert(streamed.count(_._1 == 1) == 2, "user 1 must split into two sessions")
    assert(streamed.exists { case (u, s, e, n) =>
      u == 1 && s == ts(1) && n == 3 }, s"first session wrong: $streamed")
  }

  test("chained stateful: session windows re-aggregated to hourly buckets") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    // hour 10 sessions: user 1 ends 10:08 (3 events) and 10:26 (2),
    // user 2 ends 10:10 (1) → bucket [10:00,11:00) = 3 sessions, 6 events
    val evs = Seq(
      SEv(1, ts(1), "a"), SEv(1, ts(2), "a"), SEv(1, ts(3), "a"),
      SEv(1, ts(20), "a"), SEv(1, ts(21), "a"),
      SEv(2, ts(5), "a"))
    val in = MemoryStream[SEv]
    val q = StreamApply.sessionRollup(in.toDF(), "ts", "user",
        gap = "5 minutes", horizon = "1 minute", bucket = "60 minutes")
      .writeStream.outputMode("append")
      .format("memory").queryName("rollup_out").start()
    try {
      in.addData(evs)
      q.processAllAvailable()
      // first sentinel closes the hour-10 sessions; second pushes the
      // watermark past 11:00 so the hour-10 BUCKET becomes emittable
      in.addData(SEv(9, ts(59), "x"))
      q.processAllAvailable()
      in.addData(SEv(8, Timestamp.valueOf("2026-01-01 13:00:00"), "x"))
      q.processAllAvailable()
    } finally q.stop()

    def key(r: org.apache.spark.sql.Row) =
      (r.getTimestamp(0), r.getTimestamp(1), r.getLong(2), r.getLong(3))
    val streamed = spark.table("rollup_out").collect().map(key).toSet
    // batch oracle: the SAME code over the closed event set (sentinels
    // included — their buckets may or may not have emitted in the
    // stream, so assert stream ⊆ batch and the hour-10 bucket exactly)
    val batch = StreamApply.sessionRollup(
        (evs :+ SEv(9, ts(59), "x") :+
          SEv(8, Timestamp.valueOf("2026-01-01 13:00:00"), "x")).toDF(),
        "ts", "user", gap = "5 minutes", horizon = "1 minute",
        bucket = "60 minutes")
      .collect().map(key).toSet
    assert(streamed.subsetOf(batch), s"stream=$streamed batch=$batch")
    assert(streamed.contains((Timestamp.valueOf("2026-01-01 10:00:00"),
      Timestamp.valueOf("2026-01-01 11:00:00"), 3L, 6L)),
      s"hour-10 bucket wrong: $streamed")
  }

  test("stream-stream interval join equals the batch interval join") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val lefts = Seq(SEv(1, ts(10), "click"), SEv(1, ts(30), "click"),
      SEv(2, ts(10), "click"))
    val rights = Seq(
      REv(1, ts(4), 5.0),  // 6 min before first click — inside 10-min window
      REv(1, ts(10), 7.0), // same instant — inclusive
      REv(1, ts(12), 9.0), // after first click, >10min before second — matches neither
      REv(2, ts(25), 1.0)) // after user 2's click — no match
    val lin = MemoryStream[SEv]
    val rin = MemoryStream[REv]
    val joined = StreamApply.intervalJoin(lin.toDF(), rin.toDF(),
      "user", "ruser", "ts", "rts", window = "10 minutes", horizon = "5 minutes")
    val q = joined.writeStream.outputMode("append")
      .format("memory").queryName("ij_out").start()
    try {
      lin.addData(lefts); rin.addData(rights)
      q.processAllAvailable()
      // watermark sentinels on distinct users so they cannot join
      lin.addData(SEv(9, ts(59), "x")); rin.addData(REv(8, ts(59), 0.0))
      q.processAllAvailable()
    } finally q.stop()

    val streamed = spark.table("ij_out")
      .select("user", "ts", "rts", "amount")
      .collect().map(r => (r.getInt(0), r.getTimestamp(1), r.getTimestamp(2), r.getDouble(3))).toSet
    val batch = StreamApply.intervalJoin(lefts.toDF(), rights.toDF(),
        "user", "ruser", "ts", "rts", window = "10 minutes", horizon = "5 minutes")
      .select("user", "ts", "rts", "amount")
      .collect().map(r => (r.getInt(0), r.getTimestamp(1), r.getTimestamp(2), r.getDouble(3))).toSet
    assert(streamed == batch, s"stream=$streamed batch=$batch")
    assert(streamed == Set(
      (1, ts(10), ts(4), 5.0),
      (1, ts(10), ts(10), 7.0)), s"wrong matches: $streamed")
  }

  test("left-outer interval join emits unmatched lefts once the watermark decides") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val lefts = Seq(SEv(1, ts(10), "click"), SEv(1, ts(30), "click"),
      SEv(2, ts(10), "click"))
    val rights = Seq(
      REv(1, ts(4), 5.0),  // matches user 1's first click only
      REv(2, ts(25), 1.0)) // after user 2's click — no match
    val lin = MemoryStream[SEv]
    val rin = MemoryStream[REv]
    val joined = StreamApply.intervalJoinOuter(lin.toDF(), rin.toDF(),
      "user", "ruser", "ts", "rts", window = "10 minutes", horizon = "5 minutes")
    val q = joined.writeStream.outputMode("append")
      .format("memory").queryName("ijo_out").start()
    try {
      lin.addData(lefts); rin.addData(rights)
      q.processAllAvailable()
      // move both watermarks far past every interval's upper bound so
      // each unmatched left becomes decidable and must emit its null row
      lin.addData(SEv(9, ts(59), "x")); rin.addData(REv(8, ts(59), 0.0))
      q.processAllAvailable()
    } finally q.stop()

    def key(r: org.apache.spark.sql.Row) =
      (r.getInt(0), r.getTimestamp(1),
        Option(r.getTimestamp(2)),
        if (r.isNullAt(3)) None else Some(r.getDouble(3)))
    val streamed = spark.table("ijo_out")
      .select("user", "ts", "rts", "amount").collect().map(key).toSet
    // batch truth: plain left-outer join under the same interval condition
    val batchSet = lefts.toDF().join(rights.toDF(),
        col("user") === col("ruser") &&
          col("rts") >= col("ts") - expr("INTERVAL 10 minutes") &&
          col("rts") <= col("ts"),
        "leftOuter")
      .select("user", "ts", "rts", "amount").collect().map(key).toSet
    assert(streamed == batchSet, s"stream=$streamed batch=$batchSet")
    // the unattributed clicks are present, as null rows
    assert(streamed.contains((1, ts(30), None, None)), s"got $streamed")
    assert(streamed.contains((2, ts(10), None, None)), s"got $streamed")
  }
}
