package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Companion-level event row: an inner case class can't get an encoder
  * (no outer scope at executor deserialization).
  */
case class M4Ev(ts: java.sql.Timestamp, event_id: Long,
  value: Double, event_type: String)

/** The live M4 downsampler: maintained pixel cells must equal the batch
  * a10 arithmetic on the same feed under any micro-batching, on
  * bit-identical (type, bucket) keys.
  */
class M4StreamSpec extends SparkSpec {

  private val baseMs = 1700000000000L // epoch-aligned enough: any instant

  // values sweep so extremes land mid-bucket (the M4-vs-OHLC case);
  // 2 types x ~4 six-hour buckets
  private val feed = (0 until 400).map { i =>
    M4Ev(new java.sql.Timestamp(baseMs + i * 300000L), // 5-min steps
      i.toLong, ((i * 37) % 101) + 0.25,
      if (i % 2 == 0) "click" else "view")
  }

  private def run(batches: Seq[Seq[M4Ev]]): Map[(String, Long), Seq[Long]] = {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val in = MemoryStream[M4Ev]
    val name = s"m4_out_${System.nanoTime()}"
    val q = M4Stream.m4View(in.toDF()).writeStream
      .outputMode("update").format("memory").queryName(name).start()
    try {
      batches.foreach { b => in.addData(b); q.processAllAvailable() }
    } finally q.stop()
    spark.table(name).collect().zipWithIndex
      .groupBy(r => (r._1.getString(0), r._1.getLong(1)))
      .map { case (k, rs) =>
        val r = rs.maxBy(_._2)._1
        k -> (2 to 10).map(r.getLong).toSeq
      }
  }

  test("maintained cells equal batch a10 arithmetic under any batching") {
    import spark.implicits._
    // batch reference: a10's exact formulation over the same rows
    val df = feed.toDF()
    val batch = graft.ext.Temporal.m4On(df).collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        (2 to 10).map(r.getLong).toSeq).toMap
    val a = run(Seq(feed))
    val b = run(Seq(feed.take(90), feed.slice(90, 260), feed.drop(260)))
    assert(a == batch, s"1-batch diverged: ${a.toSeq.diff(batch.toSeq).take(2)}")
    assert(b == batch, "3-batch diverged")
    // non-vacuity: some cell's extreme is interior (M4 > OHLC)
    assert(batch.values.exists { s =>
      val Seq(_, _, fUs, _, lUs, _, mnUs, _, mxUs) = s
      (mnUs != fUs && mnUs != lUs) || (mxUs != fUs && mxUs != lUs)
    }, "extremes always at cell edges")
  }
}
