package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** The streaming histogram view must equal the batch fold of v4's
  * declared bin geometry (clamp-to-edge, floor-ppm shares) over the
  * whole feed, under any micro-batching — including values exactly on
  * bin edges and outside the declared domain.
  */
class DriftStreamSpec extends SparkSpec {

  case class VE(ts: java.sql.Timestamp, value: Double)

  private val DayUs = 86400000000L
  private val base = 1700006400000000L // µs

  private val evs = (0 until 240).map { i =>
    val v = i % 12 match {
      case 0 => 0.0        // low edge
      case 1 => 50.0       // bin boundary
      case 2 => 499.999    // top interior
      case 3 => 519.5      // above domain → clamps to bin 9
      case 4 => -3.25      // below domain → clamps to bin 0
      case k => (k * 47.5) % 500.0
    }
    VE(new java.sql.Timestamp((base + i.toLong * 31L * 60000000L) / 1000L), v)
  }

  private def bin(v: Double): Int =
    math.min(math.max(math.floor(v / 50.0), 0.0), 9.0).toInt

  private def expected(es: Seq[VE]): Map[Long, (Long, Seq[Long], Seq[Long])] =
    es.groupBy(e => (e.ts.getTime * 1000L) / DayUs * DayUs).map { case (d, xs) =>
      val counts = (0 until 10).map(b => xs.count(e => bin(e.value) == b).toLong)
      val shares = counts.map(c => (BigInt(c) * 1000000 / xs.length).toLong)
      d -> ((xs.length.toLong, counts, shares))
    }

  private def run(batches: Seq[Seq[VE]]): Map[Long, (Long, Seq[Long], Seq[Long])] = {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val in = MemoryStream[VE]
    val name = s"drift_out_${System.nanoTime()}"
    val q = DriftStream.histogramView(in.toDF())
      .writeStream.outputMode("update").format("memory").queryName(name).start()
    try batches.foreach { b => in.addData(b); q.processAllAvailable() }
    finally q.stop()
    spark.table(name).collect().zipWithIndex
      .groupBy(_._1.getTimestamp(0)).map { case (ws, rs) =>
        val r = rs.maxBy(_._2)._1
        ws.getTime * 1000L -> ((r.getLong(1),
          r.getSeq[Long](2).toList, r.getSeq[Long](3).toList))
      }
  }

  test("stream equals the batch histogram fold, independent of batching") {
    val exp = expected(evs).map { case (k, (n, c, s)) => k -> ((n, c.toList, s.toList)) }
    assert(exp.size >= 3, "need several day windows")
    // clamped bins actually exercised
    assert(exp.values.exists(_._2.head > 0L) && exp.values.exists(_._2.last > 0L))
    assert(run(Seq(evs)) == exp, "1-batch run diverged")
    assert(run(Seq(evs.take(55), evs.slice(55, 160), evs.drop(160))) == exp,
      "3-batch run diverged")
    assert(run(evs.grouped(29).toSeq) == exp, "many-batch run diverged")
  }

  test("shares partition one million per window (floor losses bounded)") {
    val got = run(Seq(evs))
    for ((ws, (_, _, shares)) <- got) {
      val s = shares.sum
      assert(s > 1000000L - shares.length && s <= 1000000L, s"window $ws shares sum $s")
    }
  }
}
