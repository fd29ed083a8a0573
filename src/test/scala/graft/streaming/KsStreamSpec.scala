package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** The live KS drift monitor: the maintained (type, cent) count store
  * must equal the batch count fold under any micro-batching, and the
  * served KS-against-reference must equal a driver fold of the same
  * statistic — including flagging an injected distribution shift.
  */
class KsStreamSpec extends SparkSpec {
  import KsStreamSpec.Ev

  private val baseMs = 1700000000000L

  private def ev(i: Int, v: Double, t: String) =
    Ev(new java.sql.Timestamp(baseMs + i * 1000L), v, t)

  // reference regime: uniform-ish values; drift regime: 'click' values
  // shifted up by 200 — a shape change KS must flag
  private val refFeed = (0 until 300).map { i =>
    ev(i, (i * 7 % 100) + (if (i % 2 == 0) 0.25 else 0.75),
      if (i % 3 == 0) "click" else "view")
  }
  private val driftFeed = (300 until 600).map { i =>
    val shifted = i % 3 == 0
    ev(i, (i * 7 % 100) + (if (shifted) 200.0 else 0.5),
      if (shifted) "click" else "view")
  }

  private def runCounts(batches: Seq[Seq[Ev]]): Map[(String, Long), Long] = {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val in = MemoryStream[Ev]
    val name = s"ks_out_${System.nanoTime()}"
    val q = KsStream.centCountView(in.toDF()).writeStream
      .outputMode("update").format("memory").queryName(name).start()
    try {
      batches.foreach { b => in.addData(b); q.processAllAvailable() }
    } finally q.stop()
    spark.table(name).selectExpr("event_type", "v", "n").collect()
      .zipWithIndex
      .groupBy(r => (r._1.getString(0), r._1.getLong(1)))
      .map { case (k, rs) => k -> rs.maxBy(_._2)._1.getLong(2) }
  }

  private def fold(evs: Seq[Ev]): Map[(String, Long), Long] =
    evs.groupBy(e => (e.event_type, math.floor(e.value * 100).toLong))
      .map { case (k, xs) => k -> xs.size.toLong }

  test("count store equals the batch fold under arbitrary batching") {
    val all = refFeed ++ driftFeed
    val expected = fold(all)
    assert(runCounts(Seq(all)) == expected, "1-batch diverged")
    assert(runCounts(Seq(all.take(100), all.slice(100, 450), all.drop(450)))
      == expected, "3-batch diverged")
  }

  test("served KS equals a driver fold and flags the injected shift") {
    import spark.implicits._
    def toDf(m: Map[(String, Long), Long]) =
      m.toSeq.map { case ((t, v), n) => (t, v, n) }.toDF("event_type", "v", "n")
    val store = runCounts(Seq(driftFeed))
    val ref = fold(refFeed)
    val got = KsStream.ksAgainst(toDf(store), toDf(ref)).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3), r.getBoolean(4)))).toMap
    // driver fold of the identical statistic
    val expected = Seq("click", "view").map { t =>
      val a = store.collect { case ((`t`, v), n) => (v, n) }
      val b = ref.collect { case ((`t`, v), n) => (v, n) }.toSeq
      val vs = (a.map(_._1) ++ b.map(_._1)).toSeq.distinct.sorted
      val (ta, tb) = (a.map(_._2).sum, b.map(_._2).sum)
      val ks = vs.map { v =>
        val ca = a.filter(_._1 <= v).map(_._2).sum
        val cb = b.filter(_._1 <= v).map(_._2).sum
        math.abs(ca * 1000000L / ta - cb * 1000000L / tb)
      }.max
      t -> ((ta, tb, ks, ks > 50000L))
    }.toMap
    assert(got == expected, s"KS diverged: got=$got exp=$expected")
    // the injected +200 shift on 'click' must alarm; 'view' must not
    assert(got("click")._4, "shifted type not flagged")
    assert(!got("view")._4, "unshifted type false-alarmed")
  }
}

object KsStreamSpec {
  /** TOP-LEVEL (companion) case class, not an inner class of the suite:
    * an inner case class needs an `$outer` pointer, and janino's
    * generated encoder code could not call its accessors — Spark fell
    * back to interpreted encoders and spewed `ERROR CodeGenerator` on
    * every `sbt test` run (r13 VERDICT item 5), masking real codegen
    * regressions.
    */
  private[streaming] case class Ev(ts: java.sql.Timestamp, value: Double,
    event_type: String)
}
