package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SessionsSpec extends SparkSpec {

  test("session boundaries split exactly at gaps over 30 minutes") {
    val rows = Sessions.sessionStats(spark, sf).collect()
    assert(rows.nonEmpty)
    // session numbering starts at 1 and is dense per user
    val byUser = rows.groupBy(_.getLong(0))
    for ((_, rs) <- byUser) {
      val nos = rs.map(_.getLong(1)).sorted
      assert(nos.head == 1L && nos.sameElements(1L to nos.length),
        s"session numbers not dense: ${nos.toSeq}")
    }
    // event ranges of consecutive sessions must not overlap
    for ((_, rs) <- byUser) {
      val ordered = rs.sortBy(_.getLong(1))
      for (Array(a, b) <- ordered.sliding(2).map(_.toArray).toSeq if b != null)
        assert(a.getLong(4) < b.getLong(3),
          "sessions overlap in event-id ranges")
    }
  }

  test("two-phase distinct equals direct distinct count") {
    val twoPhase = Sessions.distinctTypes(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val direct = graft.Tables.events(spark, sf)
      .groupBy("user_id").agg(countDistinct("event_type").as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(twoPhase == direct)
  }
}
