package graft.streaming

import graft.SparkSpec
import graft.ext.{Portable, Prep}
import graft.ext.Portable.tokenHashOf
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import java.nio.file.Files

/** Streaming calibration maintenance: after every micro-batch the
  * calibration view equals the c24 fold over the LIVE document set —
  * through in-batch races, updates (the old score's bin contribution
  * must retract), deletes, replayed batches, and finally against the
  * real batch query on the real table once the whole corpus streamed in.
  */
class CalibrationStreamSpec extends SparkSpec {

  private def feed(rows: Seq[(Long, Long, String, String, String)]): DataFrame = {
    import spark.implicits._
    rows.toDF("seq", "doc_id", "source", "text", "op")
  }

  private def run(batches: Seq[Seq[(Long, Long, String, String, String)]],
      replayOf: Option[Int] = None): CalibrationStream.Stores = {
    val dir = Files.createTempDirectory("graft-calib").toString
    val s = new CalibrationStream.Stores(spark, dir)
    batches.zipWithIndex.foreach { case (b, i) =>
      CalibrationStream.applyBatch(feed(b), i.toLong, s)
      if (replayOf.contains(i))
        CalibrationStream.applyBatch(feed(b), i.toLong, s)
    }
    s
  }

  /** Driver-side c24 fold over the live texts — the same per-doc
    * formulas PrepSpec proves the batch query against, then the same
    * histogram/ROC arithmetic.
    */
  private def expected(evs: Seq[(Long, Long, String, String, String)])
      : Map[Long, (Long, Long, Long, Long, Long)] = {
    val live = evs.groupBy(_._2).flatMap { case (_, es) =>
      val (_, _, _, text, op) = es.maxBy(_._1)
      if (op == "d") None else Some(text)
    }.toSeq
    def wOf(salt: String, b: Long): Long =
      tokenHashOf(salt + (b % Prep.QcBuckets).toString) % Prep.QcLevels
    val perDoc = live.map { text =>
      val toks = text.split(" ", -1)
      val hs = toks.map(tokenHashOf)
      val nF = hs.length + math.max(hs.length - 1, 0)
      val s = hs.map(wOf("qw:", _)).sum +
        hs.sliding(2).filter(_.length == 2)
          .map(p => wOf("qb:", (p(0) * 31L + p(1)) % Portable.P)).sum
      val score = s * 1000000L / math.max(nF, 1) - Prep.QcShift * 1000000L
      val n = toks.length.toLong
      val totlen = toks.map(_.length.toLong).sum
      val pass = n >= 32L && n <= 100000L &&
        totlen * 10L >= n * 40L && totlen <= n * 10L &&
        toks.count(_.length <= 2) * 10L <= n &&
        toks.distinct.length * 5L >= n * 2L &&
        toks.count(t => t == "a" || t == "the") >= 2L
      ((score + Prep.QcShift * 1000000L) / Prep.QcBinMicros, pass)
    }
    val bins = perDoc.groupBy(_._1).map { case (b, xs) =>
      (b, xs.length.toLong, xs.count(_._2).toLong)
    }.toSeq.sortBy(_._1)
    val totPos = bins.map(_._3).sum
    val totNeg = bins.map(x => x._2 - x._3).sum
    var negBelow = 0L
    val ascNeg = bins.map { case (b, n, p) =>
      val r = (b, negBelow); negBelow += n - p; r
    }.toMap
    var cumN = 0L; var cumP = 0L
    bins.reverse.map { case (b, n, p) =>
      cumN += n; cumP += p
      b -> ((n, p, cumP * 1000000L / math.max(totPos, 1L),
        (cumN - cumP) * 1000000L / math.max(totNeg, 1L),
        p * (2L * ascNeg(b) + (n - p))))
    }.toMap
  }

  private def got(s: CalibrationStream.Stores)
      : Map[Long, (Long, Long, Long, Long, Long)] =
    s.calibrationView().collect().map(r =>
      r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))).toMap

  // Texts span both label classes: long stopword-bearing prose (passes
  // the Gopher conjunction) and short fragments (fail word count).
  private def prose(seed: Int): String =
    (0 until 40).map(i => if (i % 7 == 0) "the" else if (i % 11 == 0) "a"
      else s"word$seed${i % 23}xx").mkString(" ")
  private val b1 = Seq(
    (1L, 10L, "s0", prose(1), "i"),
    (2L, 11L, "s0", "tiny doc", "i"),
    (3L, 12L, "s1", prose(2), "i"))
  private val b2 = Seq(
    (4L, 11L, "s0", prose(3), "u"), // update flips 11's label and bin
    (5L, 13L, "s1", "another short one", "i"),
    (6L, 10L, "s0", "", "d")) // delete retracts 10's contribution
  private val b3 = Seq(
    (7L, 13L, "s1", "x", "u"),
    (8L, 14L, "s0", prose(4), "i"))

  test("stream equals the live-set fold at every prefix, with updates and deletes") {
    val evs = b1 ++ b2 ++ b3
    for (cut <- Seq(Seq(b1), Seq(b1, b2), Seq(b1, b2, b3))) {
      val s = run(cut)
      assert(got(s) == expected(cut.flatten),
        s"prefix of ${cut.size} batches diverged")
    }
    // the synthetic corpus must exercise both classes and an update
    // that MOVES a document's bin, else retraction is untested
    val full = expected(evs)
    assert(full.values.map(_._2).sum > 0 &&
      full.values.map(x => x._1 - x._2).sum > 0, "labels degenerate")
    val pre = expected(b1)
    assert(pre.keySet != full.keySet || pre != full,
      "updates never changed the histogram — retraction untested")
  }

  /** Driver-side c25 fold over [[expected]]'s bins. */
  private def expectedAuc(evs: Seq[(Long, Long, String, String, String)])
      : (Long, Long, Long, Long) = {
    val bins = expected(evs)
    val p = bins.values.map(_._2).sum
    val n = bins.values.map(x => x._1 - x._2).sum
    val u2 = bins.values.map(_._5).sum
    (p, n, u2, u2 * 1000000L / math.max(2L * p * n, 1L))
  }

  test("c25 AUC serves at every prefix of the stream") {
    for (cut <- Seq(Seq(b1), Seq(b1, b2), Seq(b1, b2, b3))) {
      val s = run(cut)
      val r = s.aucView().collect()
      assert(r.length == 1)
      val gotAuc = (r.head.getLong(0), r.head.getLong(1),
        r.head.getLong(2), r.head.getLong(3))
      assert(gotAuc == expectedAuc(cut.flatten),
        s"AUC diverged at prefix ${cut.size}: $gotAuc")
    }
  }

  test("seq ties resolve by op priority (delete wins); null text coalesces") {
    val tied = Seq(
      (1L, 30L, "s0", prose(1), "i"),
      (5L, 30L, "s0", prose(2), "u"),
      (5L, 30L, "s0", "", "d"), // same seq as the update: tombstone wins
      (2L, 31L, "s1", null, "i"), // null-text upsert
      (3L, 32L, "s1", prose(3), "i"))
    val s = run(Seq(tied))
    val live = s.scoredView().select("doc_id").collect()
      .map(_.getLong(0)).toSet
    assert(live == Set(31L, 32L), s"seq-tie delete lost: live=$live")
    // the null-text doc stores a real (score, pass) — never nulls that
    // calibrationOn would bin under a null bin the batch can't produce
    assert(s.scoredView()
      .filter(col("score_micro").isNull || col("pass").isNull)
      .count() == 0L)
    // and the whole state is structurally identical to the empty-text twin
    val twin = run(Seq(tied.map { case (q, d, src, t, o) =>
      (q, d, src, if (t == null) "" else t, o) }))
    assert(got(s) == got(twin))
  }

  test("in-batch races and replays are absorbed") {
    val racy = Seq(
      (1L, 20L, "s0", "stale text", "i"),
      (3L, 20L, "s0", prose(9), "u"), // same batch, higher seq wins
      (2L, 21L, "s1", prose(5), "i"))
    val s = run(Seq(racy, b1), replayOf = Some(0))
    assert(got(s) == expected(racy ++ b1))
  }

  test("full corpus streamed in equals the real batch c24 on the real table") {
    val docs = graft.Tables.documents(spark, sf)
      .select(col("doc_id"), col("source"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    val evs = docs.zipWithIndex.map { case ((id, src, text), i) =>
      (i.toLong, id, src, text, "i")
    }.toSeq
    val s = run(evs.grouped(200).toSeq)
    val batch = Prep.qualityCalibration(spark, sf).collect().map(r =>
      r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))).toMap
    assert(got(s) == batch, "stream-built calibration != batch c24")
    assert(batch.nonEmpty)
    // and the served headline scalar equals the batch c25 key exactly
    val batchAuc = Prep.calibrationAuc(spark, sf).collect().head
    val streamAuc = s.aucView().collect().head
    assert(Seq(0, 1, 2, 3).forall(i =>
      batchAuc.getLong(i) == streamAuc.getLong(i)),
      s"stream AUC $streamAuc != batch $batchAuc")
  }
}
