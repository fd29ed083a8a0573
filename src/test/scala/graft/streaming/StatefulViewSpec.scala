package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** The mapGroupsWithState keyed view: state-store-backed CDC
  * materialization must equal the batch fold, and stale replays must not
  * regress newer state.
  */
class StatefulViewSpec extends SparkSpec {
  import StreamApply.{KeyedEvent, statefulView}

  test("stateful view converges to last-write-wins with tombstones kept") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val in = MemoryStream[KeyedEvent]
    val q = statefulView(in.toDS()).writeStream
      .outputMode("update").format("memory").queryName("sv_out").start()
    try {
      in.addData(Seq(
        KeyedEvent(1, 1, "c", 1.0), KeyedEvent(2, 2, "c", 2.0)))
      q.processAllAvailable()
      in.addData(Seq(
        KeyedEvent(3, 1, "u", 1.5), KeyedEvent(4, 2, "d", 0.0)))
      q.processAllAvailable()
      // stale replay of seq 1 after the key was updated at seq 3
      in.addData(Seq(KeyedEvent(1, 1, "c", 1.0)))
      q.processAllAvailable()
    } finally q.stop()

    val rows = spark.table("sv_out")
      .selectExpr("_1 as key", "_2.seq as seq", "_2.value as value", "_2.deleted as deleted")
      .collect()
    // latest emission per key
    val last = rows.groupBy(_.getInt(0)).map { case (k, rs) =>
      val r = rs.maxBy(_.getLong(1))
      k -> (r.getLong(1), r.getDouble(2), r.getBoolean(3))
    }
    assert(last(1) == ((3L, 1.5, false)), s"key 1 state wrong: ${last(1)}")
    assert(last(2) == ((4L, 0.0, true)), s"key 2 not tombstoned: ${last(2)}")
  }
}
