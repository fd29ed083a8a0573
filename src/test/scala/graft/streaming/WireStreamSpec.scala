package graft.streaming

import graft.SparkSpec
import graft.cdc.Unwrap
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import java.nio.file.Files

case class WireRec(seq: Long, key: String, value: String)

/** End-to-end streaming parity with the reference consumer: raw Kafka-
  * shaped records (all three Debezium wire shapes mixed on one stream) →
  * `Unwrap` normalization → foreachBatch upsert → serving view. This is
  * the full `consumer_to_opensearch.py` loop as one streaming query —
  * the path a user of the reference would actually migrate onto.
  */
class WireStreamSpec extends SparkSpec {

  private def flat(id: Int, name: String, email: String): String =
    s"""{"id":$id,"full_name":"$name","email":"$email","phone":null,"classification":"public","created_at":null}"""

  private def deleteRewrite(id: Int): String =
    s"""{"op":"d","before":{"id":$id,"full_name":"x","email":"x","phone":null,"classification":"public","created_at":null},"after":null}"""

  test("wire stream: flat rows, delete-rewrites, and tombstones apply in order") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val dir = Files.createTempDirectory("graft-wire").toString

    val in = MemoryStream[WireRec]
    val events = Unwrap.unwrap(in.toDF())
      .select(col("seq"), col("key"), col("op"),
        col("row.full_name").as("full_name"), col("row.email").as("email"))
    val store = new StreamApply.ParquetUpsertStore(spark, dir,
      key = "key", seq = "seq", opCol = "op", deleteOp = "d",
      payloadCols = Seq("full_name", "email"))
    val q = StreamApply.upsertWriter(events, store, s"$dir/ckpt").start()
    try {
      // batch 1: two inserts (flat), one update (flat)
      in.addData(Seq(
        WireRec(1, "1", flat(1, "ada", "ada@x")),
        WireRec(2, "2", flat(2, "bob", "bob@x")),
        WireRec(3, "1", flat(1, "ada l.", "ada@x"))))
      q.processAllAvailable()
      // batch 2: delete-rewrite for key 2, tombstone for key 2 (the
      // coexisting delete duality), insert key 3
      in.addData(Seq(
        WireRec(4, "2", deleteRewrite(2)),
        WireRec(5, "2", null),
        WireRec(6, "3", flat(3, "cyd", "cyd@x"))))
      q.processAllAvailable()
    } finally q.stop()

    val view = store.view().select("key", "full_name")
      .collect().map(r => r.getInt(0) -> r.getString(1)).toMap
    assert(view == Map(1 -> "ada l.", 3 -> "cyd"),
      s"unexpected view: $view")
  }

  test("tombstone-only delete removes a key even with no rewrite record") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val dir = Files.createTempDirectory("graft-wire2").toString
    val in = MemoryStream[WireRec]
    val events = Unwrap.unwrap(in.toDF())
      .select(col("seq"), col("key"), col("op"),
        col("row.full_name").as("full_name"))
    val store = new StreamApply.ParquetUpsertStore(spark, dir,
      key = "key", seq = "seq", opCol = "op", deleteOp = "d",
      payloadCols = Seq("full_name"))
    val q = StreamApply.upsertWriter(events, store, s"$dir/ckpt").start()
    try {
      in.addData(Seq(WireRec(1, "7", flat(7, "gus", "g@x")), WireRec(2, "7", null)))
      q.processAllAvailable()
    } finally q.stop()
    assert(store.view().count() == 0)
  }
}
