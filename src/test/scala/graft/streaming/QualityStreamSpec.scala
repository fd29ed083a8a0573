package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** The streaming compliance monitor must equal the batch rule fold over
  * the whole feed under any micro-batching, and the feed deliberately
  * contains violations of BOTH rules (out-of-range values, unknown
  * types) — a monitor tested only on clean data proves nothing.
  */
class QualityStreamSpec extends SparkSpec {

  case class QE(ts: java.sql.Timestamp, event_type: String, value: Double)

  private val DayUs = 86400000000L
  private val base = 1700006400000000L // µs, mid-day so windows straddle rows

  // 300 events over ~3.5 days; every 23rd value is out of range, every
  // 31st type is unknown — both rules fire, on different rows
  private val evs = (0 until 300).map { i =>
    QE(new java.sql.Timestamp((base + i.toLong * 17L * 60000000L) / 1000L),
      if (i % 31 == 0) "unknown" else Seq("click", "view", "error")(i % 3),
      if (i % 23 == 0) 500.0 + i else (i % 490).toDouble + 0.5)
  }

  // the batch fold of the same declared rules, day-truncated event time
  private def expected(es: Seq[QE]): Map[Long, (Long, Long, Long)] =
    es.groupBy(e => (e.ts.getTime * 1000L) / DayUs * DayUs).map { case (d, xs) =>
      d -> ((xs.length.toLong,
        xs.count(e => e.value < 0.0 || e.value >= 500.0).toLong,
        xs.count(e => !Set("click", "error", "purchase", "signup", "view")
          .contains(e.event_type)).toLong))
    }

  private def run(batches: Seq[Seq[QE]]): Map[Long, (Long, Long, Long)] = {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val in = MemoryStream[QE]
    val name = s"quality_out_${System.nanoTime()}"
    val q = QualityStream.complianceView(in.toDF())
      .writeStream.outputMode("update").format("memory").queryName(name).start()
    try batches.foreach { b => in.addData(b); q.processAllAvailable() }
    finally q.stop()
    // update mode re-emits a window per change: keep the LAST emission
    spark.table(name).collect().zipWithIndex
      .groupBy(_._1.getTimestamp(0)).map { case (ws, rs) =>
        val r = rs.maxBy(_._2)._1
        ws.getTime * 1000L -> ((r.getLong(1), r.getLong(2), r.getLong(3)))
      }
  }

  test("stream equals the batch rule fold, independent of batching") {
    val exp = expected(evs)
    assert(exp.values.map(_._2).sum > 0L, "no range violations in feed — vacuous")
    assert(exp.values.map(_._3).sum > 0L, "no type violations in feed — vacuous")
    assert(exp.size >= 3, "need several day windows")
    assert(run(Seq(evs)) == exp, "1-batch run diverged from batch fold")
    assert(run(Seq(evs.take(50), evs.slice(50, 220), evs.drop(220))) == exp,
      "3-batch run diverged from batch fold")
    assert(run(evs.grouped(37).toSeq) == exp, "many-batch run diverged")
  }

  test("a clean feed reports zero violations with full counts") {
    val clean = evs.map(e => e.copy(event_type = "view", value = 1.5))
    val got = run(Seq(clean))
    assert(got.values.forall { case (_, r, t) => r == 0L && t == 0L })
    assert(got.values.map(_._1).sum == clean.length.toLong)
  }
}
