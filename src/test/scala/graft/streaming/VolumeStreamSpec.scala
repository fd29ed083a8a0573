package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** The streaming day-count store must equal the batch per-day fold under
  * any micro-batching, and scoring the store must equal the batch v8
  * audit on the same feed — including a genuine spike day that must come
  * out `anomalous` (the monitor's whole point).
  */
class VolumeStreamSpec extends SparkSpec {

  case class VE(ts: java.sql.Timestamp)

  private val DayUs = 86400000000L
  private val base = 1700006400000000L // µs, midnight-aligned + 0h

  // 14 days of ~uniform volume (9-13 events/day) plus one 60-event
  // spike day — the spike must flag, the others must not all flag
  private val evs: Seq[VE] = (0 until 14).flatMap { d =>
    val n = if (d == 9) 60 else 9 + (d % 5)
    (0 until n).map { i =>
      VE(new java.sql.Timestamp((base + d.toLong * DayUs + i.toLong * 60000000L) / 1000L))
    }
  }

  private def expectedCounts: Map[Long, Long] =
    evs.groupBy(e => (e.ts.getTime * 1000L) / DayUs)
      .map { case (d, xs) => d -> xs.length.toLong }

  private def runStore(batches: Seq[Seq[VE]]): Map[Long, Long] = {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val in = MemoryStream[VE]
    val name = s"vol_out_${System.nanoTime()}"
    val q = VolumeStream.dailyCountView(in.toDF())
      .writeStream.outputMode("update").format("memory").queryName(name).start()
    try batches.foreach { b => in.addData(b); q.processAllAvailable() }
    finally q.stop()
    // update mode re-emits a day on every change: last write per key wins
    spark.table(name).collect().zipWithIndex
      .groupBy(_._1.getLong(0))
      .map { case (d, rs) => d -> rs.maxBy(_._2)._1.getLong(1) }
  }

  test("day-count store equals the batch fold under any batching") {
    val exp = expectedCounts
    assert(exp.size == 14)
    assert(runStore(Seq(evs)) == exp, "1-batch run diverged")
    assert(runStore(Seq(evs.take(40), evs.slice(40, 100), evs.drop(100))) == exp,
      "3-batch run diverged")
    assert(runStore(evs.grouped(17).toSeq) == exp, "many-batch run diverged")
  }

  test("scoring the maintained store equals the batch v8 on the same feed") {
    import spark.implicits._
    val store = runStore(evs.grouped(23).toSeq).toSeq.toDF("day", "n_events")
    val viaStream = VolumeStream.scoreStore(store).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getBoolean(6)))).toMap
    val viaBatch = graft.ext.Validate
      .volumeAnomalyOf(evs.map(e => Tuple1(e.ts)).toDF("ts")).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getBoolean(6)))).toMap
    assert(viaStream == viaBatch, s"stream-scored != batch:\n$viaStream\n$viaBatch")
    // the monitor measures: the injected spike flags, the feed is not all-anomalous
    val spikeDay = base / DayUs + 9
    assert(viaStream(spikeDay)._6, "60-event spike day not flagged")
    assert(viaStream.values.count(!_._6) >= 10, "quiet days falsely flagged")
  }
}
