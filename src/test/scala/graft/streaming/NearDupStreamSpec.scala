package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import java.nio.file.Files

case class Doc(doc_id: Long, text: String)

/** Streaming near-dup ingest: after the whole corpus has streamed through
  * in arbitrary batch splits, the confirmed-pair store must equal the d3
  * batch self-dedup of the same corpus — every near-dup pair is caught
  * when its second member arrives. Replays must be absorbed.
  */
class NearDupStreamSpec extends SparkSpec {

  private def corpus: Seq[Doc] =
    graft.Tables.documents(spark, sf).select("doc_id", "text")
      .collect().map(r => Doc(r.getLong(0), r.getString(1))).toSeq

  private def pairsOf(stores: NearDupStream.Stores): Set[(Long, Long, Double)] = {
    val v = stores.pairsView()
    if (v.schema.isEmpty) Set.empty
    else v.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
  }

  private def batchTruth: Set[(Long, Long, Double)] =
    graft.ext.Dedup.minhashLsh(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet

  test("streamed corpus converges to the d3 batch self-dedup") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val dir = Files.createTempDirectory("graft-neardup").toString
    val stores = new NearDupStream.Stores(spark, dir)
    val in = MemoryStream[Doc]
    val q = NearDupStream.nearDupWriter(in.toDF(), stores, s"$dir/ckpt").start()
    try {
      // 3 uneven splits; ids interleave across batches so delta×old and
      // delta×delta collisions both occur
      val splits = corpus.groupBy(d => (d.doc_id % 3).toInt)
      for (i <- 0 until 3) {
        in.addData(splits(i))
        q.processAllAvailable()
      }
    } finally q.stop()
    val truth = batchTruth
    assert(truth.nonEmpty, "corpus has no near-dup pairs; test proves nothing")
    assert(pairsOf(stores) == truth,
      "streamed pairs diverged from the batch self-dedup")
    // the index holds every document's sketch
    assert(stores.indexView().count() == corpus.size)
  }

  test("replaying an applied batch changes neither pairs nor index") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-neardup-replay").toString
    val stores = new NearDupStream.Stores(spark, dir)
    val (b1, b2) = corpus.splitAt(corpus.size / 2)
    NearDupStream.applyBatch(b1.toDF(), 0L, stores)
    NearDupStream.applyBatch(b2.toDF(), 1L, stores)
    val before = pairsOf(stores)
    val idxBefore = stores.indexView().count()
    NearDupStream.applyBatch(b2.toDF(), 1L, stores) // restart-and-replay
    assert(pairsOf(stores) == before, "replay duplicated or lost pairs")
    assert(stores.indexView().count() == idxBefore)
    assert(before == batchTruth)
  }
}
