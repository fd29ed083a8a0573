package graft.streaming

import graft.SparkSpec
import graft.ext.Similarity
import org.apache.spark.sql.DataFrame

import java.nio.file.Files

/** Streaming ANN-index maintenance: after every micro-batch the served
  * cell table equals batch s8 cell assignment ([[Similarity.cellAssignOn]])
  * over the live vector set — across updates, deletes, replay, and the
  * adaptive width crossing.
  */
class AnnStreamSpec extends SparkSpec {

  private type Ev = (Long, Long, Seq[Float], String, String)

  /** Deterministic 64-dim embedding with varied signs per id/version. */
  private def emb(id: Long, ver: Long = 0L): Seq[Float] =
    Seq.tabulate(64)(j => (((id * 31 + ver * 97 + j * 7) % 13) - 6).toFloat)

  private def df(rows: Seq[Ev]): DataFrame = {
    import spark.implicits._
    rows.toDF("seq", "vec_id", "embedding", "label", "op")
  }

  /** CDC semantics in a driver fold: last op per key by seq, deletes out. */
  private def alive(events: Seq[Ev]): Seq[Ev] =
    events.groupBy(_._2).values
      .map(_.maxBy(_._1)).filter(_._5 != "d").toSeq

  private def cellsOf(d: DataFrame): Set[(Long, String, Long)] =
    d.select("vec_id", "label", "subcell").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet

  private def streamCells(s: AnnStream.Store): Set[(Long, String, Long)] =
    cellsOf(s.cellsView())

  private def batchCells(events: Seq[Ev]): Set[(Long, String, Long)] =
    cellsOf(Similarity.cellAssignOn(
      df(alive(events)).select("vec_id", "embedding", "label")))

  test("stream cells == batch s8 assignment at every prefix (upd + del)") {
    val b1: Seq[Ev] = (1L to 6L).map(i => (i, i, emb(i), s"l${i % 3}", "u"))
    val b2: Seq[Ev] = Seq(
      (10L, 2L, emb(2, ver = 1), "l9", "u"), // re-embed + relabel
      (11L, 3L, Seq.empty[Float], "", "d"),  // delete
      (12L, 7L, emb(7), "l1", "u"))          // fresh vector
    val b3: Seq[Ev] = Seq(
      (20L, 7L, Seq.empty[Float], "", "d"),
      (21L, 8L, emb(8), "l2", "u"))
    val dir = Files.createTempDirectory("graft-annstream").toString
    val s = new AnnStream.Store(spark, dir)
    var seen = Seq.empty[Ev]
    for ((b, i) <- Seq(b1, b2, b3).zipWithIndex) {
      AnnStream.applyBatch(df(b), i.toLong, s)
      seen ++= b
      assert(streamCells(s) == batchCells(seen), s"diverged after batch $i")
    }
    // deletes really left the serving view
    val ids = s.cellsView().select("vec_id").collect().map(_.getLong(0)).toSet
    assert(ids == Set(1L, 2L, 4L, 5L, 6L, 8L))
  }

  test("replayed batches are absorbed: served cells unchanged") {
    val b1: Seq[Ev] = (1L to 5L).map(i => (i, i, emb(i), s"l${i % 2}", "u"))
    val b2: Seq[Ev] = Seq((6L, 2L, Seq.empty[Float], "", "d"),
      (7L, 9L, emb(9), "l1", "u"))
    val dir = Files.createTempDirectory("graft-annstream-rp").toString
    val s = new AnnStream.Store(spark, dir)
    AnnStream.applyBatch(df(b1), 0L, s)
    AnnStream.applyBatch(df(b2), 1L, s)
    val before = streamCells(s)
    AnnStream.applyBatch(df(b1), 0L, s) // at-least-once redelivery
    AnnStream.applyBatch(df(b2), 1L, s)
    assert(streamCells(s) == before, "replay moved the served cells")
    assert(before == batchCells(b1 ++ b2))
  }

  test("adaptive width crossing re-cells at read with no stored-row rewrite") {
    // past CellN0 the mask widens: the same stored signatures must serve
    // FINER cells, still equal to the batch definition over the live set
    val n = (Similarity.CellN0 + 100).toInt
    val evs: Seq[Ev] = (1L to n.toLong)
      .map(i => (i, i, emb(i), s"l${i % 3}", "u"))
    val (b1, b2) = evs.splitAt(n / 2) // below the threshold, then past it
    val dir = Files.createTempDirectory("graft-annstream-ad").toString
    val s = new AnnStream.Store(spark, dir)
    AnnStream.applyBatch(df(b1), 0L, s)
    val coarse = streamCells(s)
    assert(coarse == batchCells(b1))
    assert(coarse.forall(_._3 == 0L), "mask must be 0 bits below CellN0")
    AnnStream.applyBatch(df(b2), 1L, s)
    val fine = streamCells(s)
    assert(fine == batchCells(evs), "diverged past the width crossing")
    assert(fine.exists(_._3 != 0L), "mask never widened past CellN0")
  }
}
