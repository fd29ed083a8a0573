package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import java.nio.file.Files

/** Streaming importance-model maintenance: after every micro-batch the
  * score view equals batch c19 over the LIVE document set — through
  * in-batch races, updates (old counts must retract), deletes, replayed
  * batches, and finally against the real batch query on the real table.
  */
class ImportanceStreamSpec extends SparkSpec {

  private def feed(rows: Seq[(Long, Long, String, String, String)]): DataFrame = {
    import spark.implicits._
    rows.toDF("seq", "doc_id", "source", "text", "op")
  }

  private def run(batches: Seq[Seq[(Long, Long, String, String, String)]],
      replayOf: Option[Int] = None): ImportanceStream.Stores = {
    val dir = Files.createTempDirectory("graft-importance").toString
    val s = new ImportanceStream.Stores(spark, dir)
    batches.zipWithIndex.foreach { case (b, i) =>
      ImportanceStream.applyBatch(feed(b), i.toLong, s)
      if (replayOf.contains(i))
        ImportanceStream.applyBatch(feed(b), i.toLong, s)
    }
    s
  }

  /** Driver-side c19 fold over the CDC-materialized live set — the same
    * policy PrepSpec proves the batch query against.
    */
  private def expected(evs: Seq[(Long, Long, String, String, String)])
      : Map[Long, (String, Long, Long, Boolean)] = {
    val live = evs.groupBy(_._2).flatMap { case (doc, es) =>
      val (_, _, src, text, op) = es.maxBy(_._1)
      if (op == "d") None else Some((doc, src, text))
    }.toSeq
    val isT = (s: String) => s == graft.ext.Prep.DsirTargetSource
    val cntT = scala.collection.mutable.Map.empty[String, Long].withDefaultValue(0L)
    val cntC = scala.collection.mutable.Map.empty[String, Long].withDefaultValue(0L)
    live.foreach { case (_, src, text) =>
      text.split(" ", -1).foreach(w => if (isT(src)) cntT(w) += 1 else cntC(w) += 1)
    }
    val vocab = (cntT.keySet ++ cntC.keySet).toSeq
    val (nT, nC, v) = (cntT.values.sum, cntC.values.sum, vocab.length.toLong)
    val rPpm = vocab.map { w =>
      val pT = (cntT(w) + 1) * graft.ext.Prep.DsirPpb / (nT + v)
      val pC = math.max((cntC(w) + 1) * graft.ext.Prep.DsirPpb / (nC + v), 1L)
      w -> (pT * graft.ext.Prep.DsirPpm / pC - graft.ext.Prep.DsirPpm)
    }.toMap
    live.map { case (doc, src, text) =>
      val ws = text.split(" ", -1).toSeq
      val llr = ws.map(rPpm).sum
      doc -> ((src, ws.length.toLong, llr, llr >= 0L))
    }.toMap
  }

  private def scored(s: ImportanceStream.Stores)
      : Map[Long, (String, Long, Long, Boolean)] =
    s.scoreView().collect().map(r =>
      r.getLong(0) -> ((r.getString(1), r.getLong(2), r.getLong(3),
        r.getBoolean(4)))).toMap

  // src0 is the target slice; the feed mixes target and raw docs
  private val b1 = Seq(
    (1L, 10L, "src0", "key value scan table", "i"),
    (2L, 11L, "src1", "slow batch slow merge", "i"),
    (3L, 12L, "src2", "key value key value", "i"))
  private val b2 = Seq(
    // update MOVES doc 11 into the target slice and changes its words
    (4L, 11L, "src0", "key scan fast", "u"),
    // in-batch race on doc 13: seq 6 wins
    (5L, 13L, "src1", "first version", "i"),
    (6L, 13L, "src1", "second version wins", "u"))
  private val b3 = Seq(
    (7L, 12L, "src2", "", "d"), // delete shrinks the raw slice
    (8L, 14L, "src0", "table scan merge", "i"))

  test("score view equals the batch c19 fold over the live set at every prefix") {
    val prefixes = Seq(Seq(b1), Seq(b1, b2), Seq(b1, b2, b3))
    for (p <- prefixes) {
      val s = run(p)
      assert(scored(s) == expected(p.flatten), s"prefix of ${p.length} diverged")
    }
    // the final state genuinely exercised slice moves and deletes
    val fin = expected(Seq(b1, b2, b3).flatten)
    assert(fin(11L)._1 == "src0", "update did not move the doc's slice")
    assert(!fin.contains(12L), "deleted doc still scored")
    assert(fin(13L)._2 == 3L, "in-batch race resolved wrong")
  }

  test("replayed batch is absorbed; model view stays vocabulary-sized") {
    val s = run(Seq(b1, b2, b3), replayOf = Some(1))
    assert(scored(s) == expected(Seq(b1, b2, b3).flatten),
      "replay changed the scores")
    val vocab = s.docWordView().select("w").distinct().count()
    val expVocab = expected(Seq(b1, b2, b3).flatten).keySet // just docs
    assert(vocab > 0 && vocab <= 12, s"vocab view wrong size: $vocab")
    assert(expVocab.nonEmpty)
  }

  test("stream over the real table's insert feed == the batch c19 query") {
    import spark.implicits._
    val docs = graft.Tables.documents(spark, sf)
      .select("doc_id", "source", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    val evs = docs.zipWithIndex.map { case ((id, src, text), i) =>
      (i.toLong, id, src, text, "i")
    }.toSeq
    // two arbitrary batch cuts — the split must not matter
    val s = run(Seq(evs.take(evs.length / 3), evs.drop(evs.length / 3)))
    val got = scored(s)
    val batch = graft.ext.Prep.importanceWeights(spark, sf).collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2), r.getLong(3),
        r.getBoolean(4)))).toMap
    assert(got == batch, "stream-maintained scores diverge from the batch query")
    assert(got.values.exists(_._4) && got.values.exists(!_._4),
      "vacuous mask on the real table")
  }

  test("the foreachBatch writer path maintains the same state as direct applyBatch") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val dir = Files.createTempDirectory("graft-importance-writer").toString
    val s = new ImportanceStream.Stores(spark, dir)
    val in = MemoryStream[(Long, Long, String, String, String)]
    val q = ImportanceStream.importanceWriter(
      in.toDF().toDF("seq", "doc_id", "source", "text", "op"), s, s"$dir/ckpt")
      .start()
    try Seq(b1, b2, b3).foreach { b => in.addData(b); q.processAllAvailable() }
    finally q.stop()
    assert(scored(s) == expected(Seq(b1, b2, b3).flatten),
      "writer path diverged from direct applyBatch")
  }
}
