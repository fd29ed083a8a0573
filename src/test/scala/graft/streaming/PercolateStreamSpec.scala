package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.DataFrame

import java.nio.file.Files

/** Streaming percolation: the alert log equals a per-batch driver fold of
  * the conjunctive-match definition over LWW winners — updates re-alert
  * on match, non-matching versions and deletes stay silent, replays
  * cannot duplicate, and the registered never-matching query never fires.
  */
class PercolateStreamSpec extends SparkSpec {

  // test registry: q1 = {key}, q2 = {key, value} conjunction,
  // q3 = {ghost} must never fire
  private val queries: Seq[(Int, String)] =
    Seq(1 -> "key", 2 -> "key", 2 -> "value", 3 -> "ghost")

  private def qdf: DataFrame = {
    import spark.implicits._
    queries.toDF("query_id", "term")
  }

  private def feed(rows: Seq[(Long, Long, String, String)]): DataFrame = {
    import spark.implicits._
    rows.toDF("seq", "doc_id", "text", "op")
  }

  private def run(batches: Seq[Seq[(Long, Long, String, String)]],
      replayOf: Option[Int] = None): PercolateStream.Alerts = {
    val dir = Files.createTempDirectory("graft-percolate").toString
    val a = new PercolateStream.Alerts(spark, dir)
    batches.zipWithIndex.foreach { case (b, i) =>
      PercolateStream.applyBatch(feed(b), i.toLong, a, qdf)
      if (replayOf.contains(i))
        PercolateStream.applyBatch(feed(b), i.toLong, a, qdf)
    }
    a
  }

  /** Driver fold: per batch, LWW per doc; each surviving upsert alerts
    * every query whose terms all appear in its text.
    */
  private def expected(batches: Seq[Seq[(Long, Long, String, String)]])
      : Set[(Long, Long, Int, Long, Long)] = {
    val byQ = queries.groupBy(_._1).map { case (q, ts) => q -> ts.map(_._2).toSet }
    batches.zipWithIndex.flatMap { case (b, i) =>
      b.groupBy(_._2).flatMap { case (doc, es) =>
        val (seq, _, text, op) = es.maxBy(_._1)
        if (op == "d") Nil
        else {
          val toks = text.split(" ", -1).toSet
          byQ.filter { case (_, ts) => ts.subsetOf(toks) }
            .map { case (q, ts) => (i.toLong, seq, q, doc, ts.size.toLong) }
        }
      }
    }.toSet
  }

  private def logged(a: PercolateStream.Alerts): Set[(Long, Long, Int, Long, Long)] =
    a.view().collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getInt(2), r.getLong(3), r.getLong(4))).toSet

  private val b1 = Seq(
    (1L, 10L, "key value scan", "i"),       // alerts q1 and q2
    (2L, 11L, "value only here", "i"),      // no alert (q2 needs key too)
    (3L, 12L, "key alone", "i"))            // alerts q1
  private val b2 = Seq(
    // update: doc 11 NOW matches q2 — a new matching version must alert
    (4L, 11L, "key value now", "u"),
    // in-batch race: seq 6 wins; the superseded matching version (seq 5)
    // must NOT alert
    (5L, 13L, "key value", "i"),
    (6L, 13L, "nothing matches", "u"))
  private val b3 = Seq(
    // update away from matching: silence, not retraction
    (7L, 10L, "no terms anymore", "u"),
    // delete never alerts
    (8L, 12L, "", "d"))

  test("alert log equals the per-batch conjunctive fold; silence is silence") {
    val a = run(Seq(b1, b2, b3))
    val exp = expected(Seq(b1, b2, b3))
    assert(logged(a) == exp, s"alerts diverge:\n got=${logged(a)}\n exp=$exp")
    // the semantics actually exercised:
    assert(exp.exists(x => x._4 == 11L && x._3 == 2), "update-to-match must re-alert")
    assert(!exp.exists(_._2 == 5L), "superseded in-batch version alerted")
    assert(!exp.exists(x => x._1 == 2L && x._4 == 10L), "non-matching update alerted")
    assert(!exp.exists(_._3 == 3), "the never-matching query fired")
    assert(exp.nonEmpty)
  }

  test("replayed batch overwrites its own alerts — no duplicates") {
    val a = run(Seq(b1, b2, b3), replayOf = Some(1))
    assert(logged(a) == expected(Seq(b1, b2, b3)), "replay duplicated alerts")
    // row-level too: the log is a SET even counted with multiplicity
    val n = a.view().count()
    assert(n == expected(Seq(b1, b2, b3)).size.toLong)
  }

  test("stream percolation over the real table's insert feed == batch x30") {
    import spark.implicits._
    val docs = graft.Tables.documents(spark, sf)
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val evs = docs.zipWithIndex.map { case ((id, text), i) =>
      (i.toLong, id, text, "i")
    }.toSeq
    val dir = Files.createTempDirectory("graft-percolate-real").toString
    val a = new PercolateStream.Alerts(spark, dir)
    val saved = graft.ext.Search.savedSearches.toDF("query_id", "term")
    evs.grouped(200).zipWithIndex.foreach { case (b, i) =>
      PercolateStream.applyBatch(feed(b), i.toLong, a, saved)
    }
    val got = a.view().collect()
      .map(r => (r.getInt(2), r.getLong(3), r.getLong(4))).toSet
    val batch = graft.ext.Search.percolate(spark, sf).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == batch, "streamed alerts diverge from batch x30")
    assert(got.nonEmpty)
  }

  test("the foreachBatch writer path logs the same alerts as direct applyBatch") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val dir = Files.createTempDirectory("graft-percolate-writer").toString
    val a = new PercolateStream.Alerts(spark, dir)
    val in = MemoryStream[(Long, Long, String, String)]
    val q = PercolateStream.percolateWriter(
      in.toDF().toDF("seq", "doc_id", "text", "op"), a, qdf, s"$dir/ckpt")
      .start()
    try Seq(b1, b2, b3).foreach { b => in.addData(b); q.processAllAvailable() }
    finally q.stop()
    assert(logged(a) == expected(Seq(b1, b2, b3)), "writer path diverged")
  }
}
