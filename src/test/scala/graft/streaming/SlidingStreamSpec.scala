package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** The streaming sliding-window distinct view must equal the batch w4
  * fold (same cover-set definition) over the whole feed under ANY
  * micro-batching, and — because the first stateful operator is a
  * (window, user) dedup — under redelivery of arbitrary slices.
  */
class SlidingStreamSpec extends SparkSpec {

  case class UE(user_id: Long, ts: java.sql.Timestamp)

  private val stepUs = 900000000L

  // deterministic feed: 400 events, 37 users, one event every 7 minutes
  // (every window overlaps its neighbors; users repeat within windows)
  private val base = 1700000000000000L // µs
  private val evs = (0 until 400).map { i =>
    UE((i * 13 % 37).toLong,
      new java.sql.Timestamp((base + i.toLong * 7L * 60000000L) / 1000L))
  }

  // batch w4 semantics in plain Scala (RelationalSpec's fold)
  private def expected(es: Seq[UE]): Map[Long, Long] =
    es.flatMap { e =>
      val us = e.ts.getTime * 1000L
      (0L until 4L).map(j => ((us / stepUs) * stepUs - j * stepUs, e.user_id))
    }.distinct.groupBy(_._1).map { case (ws, xs) => ws -> xs.length.toLong }

  private def run(batches: Seq[Seq[UE]],
      latenessMinutes: Long = 240L): (Map[Long, Long], Long) = {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val in = MemoryStream[UE]
    val name = s"sliding_out_${System.nanoTime()}"
    val q = SlidingStream.slidingDistinctView(in.toDF(), latenessMinutes)
      .writeStream
      .outputMode("update").format("memory").queryName(name).start()
    val nStateOps =
      try {
        batches.foreach { b => in.addData(b); q.processAllAvailable() }
        q.lastProgress.stateOperators.size.toLong
      } finally q.stop()
    val rows = spark.table(name).collect()
    // update mode re-emits a window on every change: keep the LAST row
    val last = rows.zipWithIndex.groupBy(_._1.getTimestamp(0)).map {
      case (ws, rs) =>
        ws.getTime * 1000L -> rs.maxBy(_._2)._1.getLong(1)
    }
    (last, nStateOps)
  }

  test("stream equals the batch w4 fold, independent of batching") {
    val exp = expected(evs)
    val (one, ops) = run(Seq(evs))
    val (three, _) = run(Seq(evs.take(70), evs.slice(70, 290), evs.drop(290)))
    assert(ops == 2L, s"expected dedup + agg as TWO stateful operators, got $ops")
    assert(one == exp, "1-batch run diverged from batch w4")
    assert(three == exp, "3-batch run diverged from batch w4")
    // sliding means overlapping windows: adjacent starts 15 min apart
    val starts = exp.keySet.toSeq.sorted
    assert(starts.sliding(2).exists { case Seq(a, b) => b - a < 3600000000L },
      "no overlapping windows — vacuous")
  }

  test("randomized feeds, batchings and redeliveries all equal the batch fold") {
    for (seed <- 1L to 5L) {
      val rnd = new scala.util.Random(seed)
      // random users and timestamps (jittered, mildly out of order
      // WITHIN a batch — legal under the generous watermark)
      val es = (0 until 200).map { i =>
        UE(rnd.nextInt(23).toLong,
          new java.sql.Timestamp(
            (base + i.toLong * 5L * 60000000L + rnd.nextInt(600) * 1000000L) / 1000L))
      }
      val exp = expected(es)
      // random batching with a random redelivered slice
      val cut1 = 1 + rnd.nextInt(es.length - 2)
      val cut2 = cut1 + rnd.nextInt(es.length - cut1)
      val redel = es.slice(rnd.nextInt(cut1), cut2)
      val batches = Seq(es.take(cut1), es.slice(cut1, cut2), redel, es.drop(cut2))
        .filter(_.nonEmpty)
      val (got, _) = run(batches)
      assert(got == exp, s"seed=$seed diverged from the batch fold")
    }
  }

  test("a TIGHT lateness bound stays exact for on-time events (fan-out margin)") {
    // the regression for the watermark contract: a caller stating
    // lateness = 1 min with a strictly ordered feed must lose nothing —
    // the (window − step) cover-set skew is the MODULE's margin to add.
    // Without it, every j ≥ 1 cover row of an on-time event would fall
    // behind the watermark from batch 2 on and every window but the
    // newest would undercount.
    val exp = expected(evs)
    val (got, _) = run(
      Seq(evs.take(100), evs.slice(100, 200), evs.slice(200, 300), evs.drop(300)),
      latenessMinutes = 1L)
    assert(got == exp, "tight-lateness run undercounted (margin broken)")
  }

  test("an in-bound late event in an EARLIER 15-min bucket keeps all cover rows") {
    // the truncation residual: lateness rides the TRUNCATED win_start,
    // so an event late by < 1 min whose own bucket is one step earlier
    // than the max event's loses up to a full extra step — the margin
    // must be lateness + WINDOW (60 min), not lateness + 45 min. This
    // feed discriminates: with the 45-min margin the late event's
    // oldest cover row sits 15 min behind the watermark and is dropped.
    def ue(u: Long, us: Long) = UE(u, new java.sql.Timestamp(us / 1000L))
    val step = stepUs
    val alignedBase = ((base / step) + 1L) * step
    val m = alignedBase + 150L * 60000000L + 10000000L // aligned + 150min + 10s
    val batch1 = (0 until 30).map(i =>
      ue((i % 7).toLong, alignedBase + i.toLong * 5L * 60000000L)) :+ ue(50L, m)
    val late = ue(99L, m - 50000000L) // 50 s late, previous 15-min bucket
    val batch2 = Seq(late, ue(51L, m + 60000000L), ue(52L, m + 120000000L))
    val all = batch1 ++ batch2
    val (got, _) = run(Seq(batch1, batch2), latenessMinutes = 1L)
    assert(got == expected(all),
      "in-bound late event lost cover rows (truncation margin broken)")
  }

  test("redelivered slice is absorbed by the (window, user) dedup state") {
    val exp = expected(evs)
    val (got, _) = run(Seq(evs.take(150), evs.slice(80, 220),
      evs.slice(80, 220), evs.drop(220)))
    assert(got == exp, "redelivery changed a distinct count")
  }
}
