package graft.streaming

import graft.SparkSpec
import graft.cdc.{CdcQueries, Materialize}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import java.nio.file.Files
import java.sql.Timestamp

/** The streaming share gate (the repo's namesake completed): the gated
  * published stream materializes to EXACTLY the batch o18 gate over the
  * same events — including retraction of keys whose state leaves the
  * shareable set — with raw identifiers structurally absent from the
  * published store, and replay absorbed.
  */
case class ShareEv(event_id: Long, user_id: Int, event_type: String,
    ts: Timestamp, value: Double)

class ShareGateStreamSpec extends SparkSpec {

  private val base = 1735689600000L // 2025-01-01T00:00:00Z

  private def ev(id: Long, u: Int, t: String, v: Double) =
    ShareEv(id, u, t, new Timestamp(base + id * 3600000L), v)

  // key 1: click -> stays shareable; key 2: view -> purchase (leaves the
  // gate: must be RETRACTED); key 3: click -> error (deleted: retracted);
  // key 4: purchase only (never shareable); key 5: view late (enters)
  private val batch1 = Seq(
    ev(1, 1, "click", 10.7), ev(2, 2, "view", 20.2),
    ev(3, 3, "click", 30.9), ev(4, 4, "purchase", 40.1))
  private val batch2 = Seq(
    ev(5, 2, "purchase", 21.5), ev(6, 3, "error", 0.0),
    ev(7, 5, "view", 50.3), ev(8, 1, "click", 11.4))

  private def runSink(batches: Seq[Seq[ShareEv]]): StreamApply.ParquetUpsertStore = {
    import spark.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val dir = Files.createTempDirectory("graft-sharegate").toString
    val raw = new StreamApply.ParquetUpsertStore(spark, s"$dir/raw",
      key = "user_id", seq = "event_id", opCol = "event_type",
      deleteOp = "error", payloadCols = Seq("ts", "value"))
    val published = StreamApply.publishedShareStore(spark, s"$dir/pub")
    val in = MemoryStream[ShareEv](2)
    val q = StreamApply.shareGateSink(in.toDF(), raw, published, s"$dir/ckpt").start()
    try batches.foreach { b => in.addData(b); q.processAllAvailable() }
    finally q.stop()
    published
  }

  private def batchGate(events: Seq[ShareEv]) = {
    import spark.implicits._
    CdcQueries.shareGateOf(Materialize.view(events.toDF(), "user_id",
        "event_id", col("event_type"), "error", Seq("ts", "event_type", "value")))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getTimestamp(2),
        r.getLong(3))).toSet
  }

  private def publishedRows(p: StreamApply.ParquetUpsertStore) =
    p.view().select("user_token", "event_type", "day", "value_floor")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getTimestamp(2),
        r.getLong(3))).toSet

  test("published stream == batch o18 gate, including retractions") {
    val p = runSink(Seq(batch1, batch2))
    val want = batchGate(batch1 ++ batch2)
    assert(publishedRows(p) == want)
    assert(want.nonEmpty, "gate output non-vacuous")
    // the two retracted keys really are tombstoned, not merely absent:
    // the audience-side materialization got an explicit delete
    val tombs = p.snapshot().filter(col("pub_op") === "d")
      .select("user_token").collect().map(_.getLong(0)).toSet
    val tok2 = graft.ext.Portable.tokenHashOf("2")
    val tok3 = graft.ext.Portable.tokenHashOf("3")
    assert(tombs.contains(tok2), "purchase transition must retract")
    assert(tombs.contains(tok3), "delete must retract")
    // tombstones carry NO attributes: the store keeps deletes forever,
    // so a tombstone retaining the redacted state's columns would park
    // non-shareable interaction data in the audience-side files
    val tombRows = p.snapshot().filter(col("pub_op") === "d")
      .select("event_type", "day", "value_floor").collect()
    assert(tombRows.nonEmpty && tombRows.forall(r =>
      r.isNullAt(0) && r.isNullAt(1) && r.isNullAt(2)),
      "tombstone rows must be attribute-free")
  }

  test("batching-independent: one batch vs two vs replayed prefix") {
    val all = batch1 ++ batch2
    val p1 = runSink(Seq(all))
    val p2 = runSink(Seq(batch1, batch2, batch1)) // replayed prefix
    val want = batchGate(all)
    assert(publishedRows(p1) == want)
    assert(publishedRows(p2) == want, "replay must be absorbed")
  }

  test("raw identifiers are structurally absent from the published store") {
    val p = runSink(Seq(batch1, batch2))
    val fields = p.snapshot().schema.fieldNames.toSet
    assert(fields == Set("user_token", "pub_seq", "pub_op",
      "event_type", "day", "value_floor"))
    assert(!fields.contains("user_id") && !fields.contains("ts") &&
      !fields.contains("value"))
  }
}
