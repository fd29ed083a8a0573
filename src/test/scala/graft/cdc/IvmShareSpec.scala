package graft.cdc

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** O17 incremental view maintenance and O18 share gating: the IVM fold
  * must equal full recomputation at ANY cutoff (not just the registered
  * one), and the share view must leak neither raw keys nor ungated rows.
  */
class IvmShareSpec extends SparkSpec {

  private def recompute(): Map[String, Long] =
    Materialize.customerView(graft.Tables.events(spark, sf), Seq("event_type"))
      .groupBy("event_type").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap

  test("o17 incremental maintenance equals recomputation at several cutoffs") {
    val full = recompute()
    // cutoff 0 = everything is delta; max = everything is base (empty
    // delta); middles = the real mixed case
    for (cutoff <- Seq(0L, 300L, 700L, Long.MaxValue)) {
      val inc = CdcQueries.incrementalAgg(spark, sf, cutoff)
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(inc == full, s"cutoff=$cutoff inc=$inc full=$full")
    }
  }

  test("o18 share view passes only gated types and no raw keys") {
    val shared = CdcQueries.shareGate(spark, sf)
    assert(shared.columns.toSet ==
      Set("user_token", "event_type", "day", "value_floor"),
      s"unexpected share columns: ${shared.columns.mkString(",")}")
    val rows = shared.collect()
    assert(rows.nonEmpty)
    assert(rows.map(_.getString(1)).toSet.subsetOf(Set("click", "view")),
      "ungated event type leaked")
    // the token is the keyed hash, not the id: no shared token may equal
    // a raw user id unless the hash happens to collide with it — check
    // the tokens differ from ids as a set (150 ids, 31-bit hash space)
    val ids = graft.Tables.events(spark, sf)
      .select(col("user_id").cast("long")).distinct()
      .collect().map(_.getLong(0)).toSet
    val tokens = rows.map(_.getLong(0)).toSet
    assert((tokens intersect ids).isEmpty, "raw ids leaked as tokens")
    // one row per shared key: the view is the materialized state
    assert(tokens.size == rows.length, "duplicate keys in share view")
  }

  test("o26 manifest equals a driver fold; any row change moves a checksum") {
    val shared = CdcQueries.shareGate(spark, sf)
    val rows = shared.collect().map(r => (r.getLong(0), r.getString(1),
      r.getTimestamp(2), r.getLong(3)))
    val expected = rows.groupBy(_._1 % 16).map { case (sh, xs) =>
      sh -> ((xs.length.toLong, xs.map { case (tok, t, day, vf) =>
        val dayUs = day.getTime * 1000L
        graft.ext.Portable.tokenHashOf(s"$tok|$t|$dayUs|$vf")
      }.sum))
    }
    val got = CdcQueries.shareManifest(spark, sf).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got == expected, s"manifest diverged: got=$got exp=$expected")
    // tamper detection: altering ONE row's value moves exactly that
    // shard's checksum and nothing else
    val tampered = shared.withColumn("value_floor",
      when(col("user_token") === rows.head._1, col("value_floor") + 1L)
        .otherwise(col("value_floor")))
    val got2 = CdcQueries.shareManifestOf(tampered).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val shard0 = rows.head._1 % 16
    assert(got2(shard0)._2 != got(shard0)._2, "tampered shard unchanged")
    assert(got2(shard0)._1 == got(shard0)._1, "tamper changed the count")
    assert((got2 - shard0) == (got - shard0), "untouched shards moved")
  }

  test("o19 wide-schema parse reads both wire generations in one pass") {
    val rows = CdcQueries.schemaEvolution(spark, sf).collect()
    assert(rows.nonEmpty)
    for (r <- rows) {
      val (id, gen) = (r.getLong(0), r.getInt(3))
      assert(!r.isNullAt(1), s"k must parse in both generations (event $id)")
      if (id % 3 == 0) {
        assert(gen == 2 && r.getString(2).startsWith("r"),
          s"evolved record $id lost its new field")
      } else {
        assert(gen == 1 && r.isNullAt(2),
          s"old-generation record $id must null-fill the evolved column")
      }
    }
  }

  test("o20 field diff equals a sequential fold; no-ops are suppressed") {
    val ev = graft.Tables.events(spark, sf)
      .select("event_id", "user_id", "event_type", "value", "props")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        if (r.isNullAt(3)) null else (r.getDouble(3): java.lang.Double),
        r.getString(4)))
    val expected = ev.groupBy(_._2).values.flatMap { rows =>
      rows.sortBy(_._1).sliding(2).collect {
        case Array((_, _, pt, pv, pp), (seq, key, t, v, p)) =>
          val changed = Seq(
            (t != pt) -> "event_type",
            (v != pv) -> "value",
            (p != pp) -> "props").collect { case (true, n) => n }
          (seq, key, changed.mkString(","), changed.size.toLong)
      }.filter(_._4 > 0)
    }.toSet
    val got = CdcQueries.changedColumns(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
      .toSet
    assert(got == expected,
      s"missing=${expected -- got} extra=${got -- expected}")
    assert(got.forall(_._4 >= 1), "no-op update leaked through")
  }
}
