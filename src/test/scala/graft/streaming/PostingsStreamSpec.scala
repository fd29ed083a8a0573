package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import java.nio.file.Files

/** Streaming postings maintenance: after every micro-batch the inverted
  * view equals the batch termFreq relation over the LIVE document set
  * (CDC materialize semantics: latest non-deleted text per doc_id) —
  * through in-batch races, updates that must retract old terms, deletes,
  * and replayed batches.
  */
class PostingsStreamSpec extends SparkSpec {

  private def feed(rows: Seq[(Long, Long, String, String)]): DataFrame = {
    import spark.implicits._
    rows.toDF("seq", "doc_id", "text", "op")
  }

  private def run(batches: Seq[Seq[(Long, Long, String, String)]],
      replayOf: Option[Int] = None): PostingsStream.Stores = {
    val dir = Files.createTempDirectory("graft-postings").toString
    val s = new PostingsStream.Stores(spark, dir)
    batches.zipWithIndex.foreach { case (b, i) =>
      PostingsStream.applyBatch(feed(b), i.toLong, s)
      // optional replay of THIS batch id with the same payload: the
      // store's (key, seq) idempotence must absorb it
      if (replayOf.contains(i)) PostingsStream.applyBatch(feed(b), i.toLong, s)
    }
    s
  }

  /** Driver-side oracle: CDC-materialize the events, then term counts. */
  private def expected(evs: Seq[(Long, Long, String, String)])
      : Map[(Long, String), Long] = {
    val live = evs.groupBy(_._2).flatMap { case (doc, es) =>
      val (seq, _, text, op) = es.maxBy(_._1)
      if (op == "d") None else Some(doc -> text)
    }
    live.toSeq.flatMap { case (doc, text) =>
      text.split(" ", -1).map(t => (doc, t))
    }.groupBy(identity).map { case (k, o) => k -> o.size.toLong }
  }

  private def posted(s: PostingsStream.Stores): Map[(Long, String), Long] =
    s.postingsView().collect()
      .map(r => (r.getLong(0), r.getString(1)) -> r.getLong(2)).toMap

  private val b1 = Seq(
    (1L, 10L, "the quick brown fox", "i"),
    (2L, 11L, "the lazy dog the dog", "i"),
    (3L, 12L, "lorem ipsum dolor", "i"))
  private val b2 = Seq(
    // update replaces doc 10's postings entirely (fox/brown must go)
    (4L, 10L, "slow red panda", "u"),
    // in-batch race: two changes to doc 13 — seq 6 must win
    (5L, 13L, "first version here", "i"),
    (6L, 13L, "second version wins", "u"))
  private val b3 = Seq(
    (7L, 11L, "", "d"), // delete drops doc 11's postings
    (8L, 14L, "the end", "i"))

  test("inverted view equals batch termFreq over the live set at every prefix") {
    val prefixes = Seq(Seq(b1), Seq(b1, b2), Seq(b1, b2, b3))
    for (p <- prefixes) {
      val s = run(p)
      assert(posted(s) == expected(p.flatten), s"prefix of ${p.length} diverged")
    }
    // the final state genuinely exercised update-retraction and delete
    val fin = expected((Seq(b1, b2, b3)).flatten)
    assert(!fin.contains((10L, "fox")), "old terms survived the update")
    assert(!fin.exists(_._1._1 == 11L), "deleted doc kept postings")
    assert(fin.contains((13L, "wins")), "in-batch race resolved wrong")
  }

  test("replayed batch is absorbed; df view matches a per-term rollup") {
    val s = run(Seq(b1, b2, b3), replayOf = Some(1))
    val exp = expected(Seq(b1, b2, b3).flatten)
    assert(posted(s) == exp, "replay changed the postings")
    val df = s.dfView().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val expDf = exp.keys.toSeq.groupBy(_._2).map { case (t, o) => t -> o.size.toLong }
    assert(df == expDf, "df rollup diverged")
  }

  test("the maintained index SERVES the x12 ranked search (end-to-end)") {
    import spark.implicits._
    val s = run(Seq(b1, b2, b3))
    // query terms chosen to hit live docs, replaced terms, and a miss
    val q = Seq((1, "the"), (1, "end"), (2, "panda"), (2, "fox"))
      .toDF("query_id", "term")
    val live = s.store.view().select("doc_id")
    val n = live.agg(count(lit(1)).as("n_docs"))
    val got = graft.ext.Search.matchSearchOn(s.postingsView(), n, q)
      .collect()
      .map(r => (r.getInt(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3)))
      .toMap
    // brute oracle over the expected live postings
    val exp = expected(Seq(b1, b2, b3).flatten)
    val nDocs = exp.keys.map(_._1).toSet.size.toLong
    val dfOf = exp.keys.toSeq.groupBy(_._2).map { case (t, o) => t -> o.size.toLong }
    val terms = Map(1 -> Seq("the", "end"), 2 -> Seq("panda", "fox"))
    val liveDocs: Seq[Long] = exp.keys.map(_._1).toSet.toSeq
    val brute = terms.toSeq.flatMap { case (qid, ts) =>
      liveDocs.flatMap { doc =>
        val hits = ts.filter(t => exp.contains((doc, t)))
        if (hits.isEmpty) None
        else Some((qid, doc) -> (hits.size.toLong,
          hits.map(t => exp((doc, t)) * nDocs * 1000000L / dfOf(t)).sum))
      }
    }.toMap
    assert(got == brute, s"serving diverged: got $got expected $brute")
    // the query genuinely exercised retraction: 'fox' (replaced in b2)
    // must hit nothing
    assert(!got.keys.exists { case (qid, doc) =>
      qid == 2 && exp.contains((doc, "fox")) }, "replaced term still served")
    assert(got.nonEmpty)
  }

  test("the maintained index serves AUTOCOMPLETE (x32) — incl. retraction") {
    val s = run(Seq(b1, b2, b3))
    val got = graft.ext.Search.autocompleteOn(s.postingsView(),
        Seq("w", "f", "se"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2),
        r.getLong(3), r.getLong(4)))
      .toSet
    val exp = expected(Seq(b1, b2, b3).flatten)
    val vocab = exp.toSeq.groupBy(_._1._2).map { case (t, xs) =>
      (t, xs.size.toLong, xs.map(_._2).sum)
    }
    val brute = Seq("w", "f", "se").flatMap { p =>
      vocab.filter(_._1.startsWith(p)).toSeq
        .sortBy { case (t, df, _) => (-df, t) }.take(4).zipWithIndex
        .map { case ((t, df, cf), i) => (p, i + 1L, t, df, cf) }
    }.toSet
    assert(got == brute, s"completion diverged: got $got expected $brute")
    // retraction visible at the suggest layer: 'fox' was replaced in b2,
    // so the 'f' prefix must not suggest it
    assert(!got.exists(_._3 == "fox"), "replaced term still suggested")
    assert(got.nonEmpty)
    // and a fresh store suggests nothing (not an exception)
    val fresh = new PostingsStream.Stores(spark,
      java.nio.file.Files.createTempDirectory("pidx").toString)
    assert(graft.ext.Search.autocompleteOn(fresh.postingsView(),
      Seq("w")).count() == 0L)
  }

  test("the maintained index serves BM25 (x17) — integer formula parity") {
    import spark.implicits._
    val s = run(Seq(b1, b2, b3))
    val q = Seq((1, "the"), (1, "version"), (2, "panda")).toDF("query_id", "term")
    val got = graft.ext.Search.bm25On(s.postingsView(), q).collect()
      .map(r => (r.getInt(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3)))
      .toMap
    // brute integer-BM25 over the expected live postings
    val exp = expected(Seq(b1, b2, b3).flatten)
    val dfOf = exp.keys.toSeq.groupBy(_._2).map { case (t, o) => t -> o.size.toLong }
    val dlOf = exp.toSeq.groupBy(_._1._1).map { case (d, o) => d -> o.map(_._2).sum }
    val nDocs = dlOf.size.toLong
    val aTokens = exp.values.sum
    val terms = Map(1 -> Seq("the", "version"), 2 -> Seq("panda"))
    val brute = terms.toSeq.flatMap { case (qid, ts) =>
      dlOf.keys.toSeq.flatMap { doc =>
        val hits = ts.filter(t => exp.contains((doc, t)))
        if (hits.isEmpty) None
        else Some((qid, doc) -> (hits.size.toLong, hits.map { t =>
          val tf = exp((doc, t))
          val tfMicro = (22L * aTokens * tf * 1000000L) /
            (10L * aTokens * tf + 3L * aTokens + 9L * dlOf(doc) * nDocs)
          (nDocs * 1000000L / dfOf(t)) * tfMicro / 1000000L
        }.sum))
      }
    }.toMap
    assert(got == brute, s"bm25 serving diverged: got $got expected $brute")
    assert(got.nonEmpty)
  }

  test("the foreachBatch writer path maintains the same index as direct applyBatch") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val dir = Files.createTempDirectory("graft-postings-writer").toString
    val s = new PostingsStream.Stores(spark, dir)
    val in = MemoryStream[(Long, Long, String, String)]
    val q = PostingsStream.postingsWriter(
      in.toDF().toDF("seq", "doc_id", "text", "op"), s, s"$dir/ckpt").start()
    try Seq(b1, b2, b3).foreach { b => in.addData(b); q.processAllAvailable() }
    finally q.stop()
    assert(posted(s) == expected(Seq(b1, b2, b3).flatten),
      "writer path diverged from the batch fold")
  }

  test("a fresh (never-committed) store serves ZERO hits, not an exception") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-postings-empty").toString
    val s = new PostingsStream.Stores(spark, dir)
    val q = Seq((1, "anything")).toDF("query_id", "term")
    val n = spark.sql("SELECT CAST(0 AS BIGINT) AS n_docs")
    assert(graft.ext.Search.matchSearchOn(s.postingsView(), n, q).count() == 0L)
    assert(graft.ext.Search.bm25On(s.postingsView(), q).count() == 0L)
  }

  test("one-batch and three-batch ingestion land on the same index") {
    val all = Seq(b1, b2, b3).flatten
    assert(posted(run(Seq(all))) == posted(run(Seq(b1, b2, b3))),
      "batching changed the index")
  }
}
