package graft.streaming

import graft.SparkSpec
import graft.ext.Dedup
import org.apache.spark.sql.DataFrame

import java.nio.file.Files

/** Streamed d26: the live (band, bkey) occupancy maintained by the
  * near-dup ingest path must equal the batch [[Dedup.bandOccupancyOf]]
  * audit over everything ingested — at EVERY prefix, under replay of a
  * whole batch, under a crash replayed between the occupancy and index
  * commits, and under source-level redelivery of old documents — and
  * the hub alarm must fire at the exact prefix a crafted family crosses
  * the cap.
  */
class OccupancyStreamSpec extends SparkSpec {

  private def occOf(stores: NearDupStream.Stores): Set[(Int, Long, Long, Long)] = {
    val v = stores.occupancyView()
    if (v.schema.isEmpty) Set.empty
    else v.collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
  }

  private def batchAudit(ingested: DataFrame): Set[(Int, Long, Long, Long)] =
    Dedup.bandOccupancyOf(Dedup.sketchOf(ingested), Dedup.LshBands)
      .collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet

  private def docsDf(docs: Seq[(Long, String)]): DataFrame = {
    import spark.implicits._
    docs.toDF("doc_id", "text")
  }

  test("live occupancy equals the batch d26 audit at every prefix; replay absorbed") {
    val dir = Files.createTempDirectory("graft-occ").toString
    val stores = new NearDupStream.Stores(spark, dir)
    // three families across three batches: an exact family growing
    // batch to batch, a near-dup family, singletons
    val b0 = Seq(1L -> "alpha beta gamma", 2L -> "alpha beta gamma",
      10L -> "one two three four five six seven eight nine ten")
    val b1 = Seq(3L -> "alpha beta gamma",
      11L -> "one two three four five six seven eight nine eleven",
      20L -> "lone wolf document")
    val b2 = Seq(4L -> "alpha beta gamma", 21L -> "another loner entirely")
    var ingested = Seq.empty[(Long, String)]
    for ((b, id) <- Seq(b0, b1, b2).zipWithIndex) {
      NearDupStream.applyBatch(docsDf(b), id.toLong, stores)
      ingested ++= b
      assert(occOf(stores) == batchAudit(docsDf(ingested)),
        s"prefix $id: live occupancy diverged from the batch audit")
    }
    // FULL replay of the last batch (crash after every commit): no-op
    NearDupStream.applyBatch(docsDf(b2), 2L, stores)
    assert(occOf(stores) == batchAudit(docsDf(ingested)), "full replay drifted")
    // source-level REDELIVERY inside a later batch: old docs anti-join
    // away, the genuinely-new doc counts once
    NearDupStream.applyBatch(docsDf(b0 :+ (30L -> "fresh new text")), 3L, stores)
    ingested :+= 30L -> "fresh new text"
    assert(occOf(stores) == batchAudit(docsDf(ingested)), "redelivery re-counted")
  }

  test("crash between occupancy and index commits replays idempotently") {
    val dir = Files.createTempDirectory("graft-occ-crash").toString
    val stores = new NearDupStream.Stores(spark, dir)
    val b0 = Seq(1L -> "alpha beta gamma", 2L -> "alpha beta gamma")
    val b1 = Seq(3L -> "alpha beta gamma", 4L -> "some other thing")
    NearDupStream.applyBatch(docsDf(b0), 0L, stores)
    // batch 1 CRASHES after pairs + occupancy but before the index
    // merge: run the partial chain by hand, then the full replay
    val (sk, _) = NearDupStream.findAndCommitPairs(docsDf(b1), 1L, stores)
    val fresh = sk.join(stores.indexView().select("doc_id"),
      Seq("doc_id"), "left_anti")
    NearDupStream.mergeOccupancy(fresh, 1L, stores)
    NearDupStream.applyBatch(docsDf(b1), 1L, stores) // the replay
    assert(occOf(stores) == batchAudit(docsDf(b0 ++ b1)),
      "occupancy double-counted the replayed batch")
    assert(stores.indexView().count() == 4)
  }

  test("hub alarm fires at the prefix the family crosses the cap") {
    val dir = Files.createTempDirectory("graft-occ-hot").toString
    val stores = new NearDupStream.Stores(spark, dir)
    val cap = 8L // injected small cap — the alarm threshold is a read-side dial
    val fam = (0 until 12).map(i => i.toLong -> "hub family text")
    NearDupStream.applyBatch(docsDf(fam.take(6)), 0L, stores)
    assert(stores.hotKeys(cap).isEmpty, "alarm fired below the cap")
    NearDupStream.applyBatch(docsDf(fam.drop(6)), 1L, stores)
    val hot = stores.hotKeys(cap).collect()
    assert(hot.nonEmpty, "alarm silent past the cap")
    // identical texts collide in EVERY band, each at 12 members
    assert(hot.length == Dedup.LshBands && hot.forall(_.getLong(2) == 12L))
  }
}
