package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import java.nio.file.Files

/** Streaming chunk-grain dedup: after an id-ordered corpus has streamed
  * through in batch splits, the per-document retention store must equal
  * batch d22's first-occurrence marks on the same corpus (a CDC feed
  * delivers in id/seq order, which is exactly d22's corpus order).
  * Replays must be absorbed; the stats-then-index commit order must
  * survive a crash between the two.
  */
class ChunkDedupStreamSpec extends SparkSpec {

  private def corpus: Seq[Doc] =
    graft.Tables.documents(spark, sf).select("doc_id", "text")
      .collect().map(r => Doc(r.getLong(0), r.getString(1)))
      .sortBy(_.doc_id).toSeq

  /** Driver-side batch truth: first occurrence in (doc_id, chunk_id)
    * order wins per (fingerprint, length) — the same fold DedupSpec
    * checks d22 against.
    */
  private def batchTruth: Map[Long, (Long, Long, Long, Long)] = {
    val ch = graft.ext.Prep.chunks(spark, sf)
      .select("doc_id", "chunk_id", "n_tokens", "chunk_fp").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val firstOf = ch.groupBy(c => (c._4, c._3))
      .map { case (k, cs) => k -> cs.map(c => (c._1, c._2)).min }
    ch.groupBy(_._1).map { case (id, cs) =>
      val kept = cs.filter(c => firstOf((c._4, c._3)) == ((c._1, c._2)))
      id -> (cs.length.toLong, kept.length.toLong,
        cs.map(_._3).sum, kept.map(_._3).sum)
    }
  }

  private def statsOf(stores: ChunkDedupStream.Stores): Map[Long, (Long, Long, Long, Long)] = {
    val v = stores.statsView()
    if (v.schema.isEmpty) Map.empty
    else v.collect().map(r => r.getLong(0) ->
      (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
  }

  private def indexOf(stores: ChunkDedupStream.Stores): Map[(Long, Long), (Long, Long)] = {
    val v = stores.indexView()
    if (v.schema.isEmpty) Map.empty
    else v.collect().map(r =>
      (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3))).toMap
  }

  test("id-ordered streamed corpus converges to the d22 batch marks") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val dir = Files.createTempDirectory("graft-chunkdedup").toString
    val stores = new ChunkDedupStream.Stores(spark, dir)
    val in = MemoryStream[Doc]
    val q = ChunkDedupStream.chunkDedupWriter(in.toDF(), stores, s"$dir/ckpt")
      .start()
    try {
      // id-ordered sequential splits — the CDC arrival order d22 assumes
      val n = corpus.size
      for (part <- Seq(corpus.take(n / 3), corpus.slice(n / 3, 2 * n / 3),
          corpus.drop(2 * n / 3))) {
        in.addData(part)
        q.processAllAvailable()
      }
    } finally q.stop()
    val truth = batchTruth
    assert(statsOf(stores) == truth,
      "streamed retention diverged from the batch first-occurrence marks")
    // cross-batch dedup is non-vacuous: some chunk's owner must live in
    // an earlier batch than a duplicate holder
    assert(truth.exists { case (_, (nc, nr, _, _)) => nr < nc },
      "no duplicate chunks anywhere — stream test proves nothing")
    // the index holds exactly the distinct fingerprints, owned by minima
    val ch = graft.ext.Prep.chunks(spark, sf)
      .select("doc_id", "chunk_id", "n_tokens", "chunk_fp").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val owners = ch.groupBy(c => (c._4, c._3))
      .map { case (k, cs) => k -> cs.map(c => (c._1, c._2)).min }
    assert(indexOf(stores) == owners, "index owners diverge from minima")
  }

  test("replaying an applied batch changes neither stats nor index") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-chunkdedup-replay").toString
    val stores = new ChunkDedupStream.Stores(spark, dir)
    val (b1, b2) = corpus.splitAt(corpus.size / 2)
    ChunkDedupStream.applyBatch(b1.toDF(), 0L, stores)
    ChunkDedupStream.applyBatch(b2.toDF(), 1L, stores)
    val (s0, i0) = (statsOf(stores), indexOf(stores))
    ChunkDedupStream.applyBatch(b2.toDF(), 1L, stores) // full redelivery
    assert(statsOf(stores) == s0, "replay mutated the stats store")
    assert(indexOf(stores) == i0, "replay mutated the owner index")
  }

  test("crash between the stats and index commits recovers exactly") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-chunkdedup-crash").toString
    val stores = new ChunkDedupStream.Stores(spark, dir)
    val (b1, b2) = corpus.splitAt(corpus.size / 2)
    ChunkDedupStream.applyBatch(b1.toDF(), 0L, stores)
    // batch 1 crashes after the stats commit, before the index commit
    val marked = ChunkDedupStream.screenBatch(b2.toDF(), stores)
    ChunkDedupStream.commitStats(marked, 1L, stores)
    // recovery: the checkpointed source redelivers batch 1 whole
    ChunkDedupStream.applyBatch(b2.toDF(), 1L, stores)
    // the recovered state equals a crash-free run
    val clean = new ChunkDedupStream.Stores(spark,
      Files.createTempDirectory("graft-chunkdedup-clean").toString)
    ChunkDedupStream.applyBatch(b1.toDF(), 0L, clean)
    ChunkDedupStream.applyBatch(b2.toDF(), 1L, clean)
    assert(statsOf(stores) == statsOf(clean), "crash recovery lost stats")
    assert(indexOf(stores) == indexOf(clean), "crash recovery lost owners")
  }
}
