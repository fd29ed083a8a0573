package graft.streaming

import graft.SparkSpec
import graft.ext.Dedup
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import java.nio.file.Files

/** Streaming cluster-label maintenance: after every micro-batch the
  * label store equals batch d7 (min-label connected components) over
  * everything ingested so far — including merges of pre-existing
  * multi-member components — under any batching and under replay.
  */
class LabelStreamSpec extends SparkSpec {

  // identical token sets pair with certainty (both band keys equal,
  // Jaccard 1.0) — the spec controls components exactly
  private val setA = "alpha beta gamma delta epsilon zeta eta theta"
  private val setB = "iota kappa lambdaw muw nuw xiw omicron piw"
  private val setC = "rho sigma tau upsilon phi chi psi omega"

  private def docsDF(rows: Seq[(Long, String)]): DataFrame = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  private def run(batches: Seq[Seq[(Long, String)]]): LabelStream.Stores = {
    val dir = Files.createTempDirectory("graft-labelstream").toString
    val s = new LabelStream.Stores(spark, dir)
    batches.zipWithIndex.foreach { case (b, i) =>
      LabelStream.applyBatch(docsDF(b), i.toLong, s)
    }
    s
  }

  private def labelsOf(s: LabelStream.Stores): Map[Long, Long] =
    s.labelsView().collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  /** Batch d7 over the SAME ingested pair set — the oracle. */
  private def batchCC(s: LabelStream.Stores, ids: Seq[Long]): Map[Long, Long] = {
    import spark.implicits._
    Dedup.minLabelClusters(s.nd.pairsView(), "doc_a", "doc_b",
        ids.toDF("doc_id"), "doc_id")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  // batch 1 plants component {10, 11} (label 10) and {20, 21} (label 20);
  // batch 2's doc 2 joins the A-family — the EXISTING component {10, 11}
  // must remap to the new minimum 2; batch 3 adds an isolated doc and a
  // late B-family member
  private val b1 = Seq(10L -> setA, 11L -> setA, 20L -> setB, 21L -> setB)
  private val b2 = Seq(2L -> setA)
  private val b3 = Seq(30L -> setC, 22L -> setB)
  private val allIds = Seq(2L, 10L, 11L, 20L, 21L, 22L, 30L)

  test("stream labels == batch d7 at every prefix, incl. remap of an existing component") {
    val s = run(Seq(b1, b2, b3))
    val got = labelsOf(s)
    assert(got == batchCC(s, allIds), "stream != batch CC over the same pairs")
    // the hardcoded expectation — the A family merged DOWN to 2
    assert(got == Map(2L -> 2L, 10L -> 2L, 11L -> 2L,
      20L -> 20L, 21L -> 20L, 22L -> 20L, 30L -> 30L), s"labels: $got")
  }

  test("batching-independent: one batch vs per-document batches") {
    val all = b1 ++ b2 ++ b3
    val one = labelsOf(run(Seq(all)))
    val perDoc = labelsOf(run(all.map(Seq(_))))
    assert(one == perDoc)
    assert(one == Map(2L -> 2L, 10L -> 2L, 11L -> 2L,
      20L -> 20L, 21L -> 20L, 22L -> 20L, 30L -> 30L))
  }

  test("replayed batches are absorbed: labels and pair set unchanged") {
    val dir = Files.createTempDirectory("graft-labelstream-rp").toString
    val s = new LabelStream.Stores(spark, dir)
    LabelStream.applyBatch(docsDF(b1), 0L, s)
    LabelStream.applyBatch(docsDF(b2), 1L, s)
    val before = labelsOf(s)
    val pairsBefore = s.nd.pairsView().collect().toSet
    // at-least-once: both earlier batches redelivered
    LabelStream.applyBatch(docsDF(b1), 0L, s)
    LabelStream.applyBatch(docsDF(b2), 1L, s)
    assert(labelsOf(s) == before, "replay must not move labels")
    assert(s.nd.pairsView().collect().toSet == pairsBefore,
      "replay must not duplicate pairs")
    // and the stream still equals batch CC
    assert(before == batchCC(s, Seq(2L, 10L, 11L, 20L, 21L)))
  }

  test("randomized: arbitrary families and batchings all equal batch d7") {
    val rnd = new scala.util.Random(42)
    val vocab = Vector("qa", "qb", "qc", "qd", "qe", "qf", "qg", "qh",
      "qi", "qj", "qk", "ql")
    for (trial <- 1 to 3) {
      val nFamilies = 3 + rnd.nextInt(3)
      // disjoint token sets per family ⇒ exact expected components
      val famTokens = (0 until nFamilies).map(f =>
        vocab.map(w => s"$w$f").mkString(" "))
      val docs = (1 to 12).map { i =>
        val f = rnd.nextInt(nFamilies)
        (i * 7L + trial, famTokens(f), f)
      }
      // random batching: shuffle, then cut into 1..4 batches
      val shuffled = rnd.shuffle(docs)
      val cuts = 1 + rnd.nextInt(4)
      val batches = shuffled.grouped(math.max(1, shuffled.size / cuts)).toSeq
      val s = {
        val dir = Files.createTempDirectory(s"graft-labelstream-r$trial").toString
        val st = new LabelStream.Stores(spark, dir)
        batches.zipWithIndex.foreach { case (b, i) =>
          LabelStream.applyBatch(docsDF(b.map(d => (d._1, d._2))), i.toLong, st)
        }
        st
      }
      val got = labelsOf(s)
      val expect = docs.groupBy(_._3).values.flatMap { fam =>
        val minId = fam.map(_._1).min
        fam.map(d => d._1 -> minId)
      }.toMap
      assert(got == expect, s"trial $trial batches=${batches.map(_.size)}")
      assert(got == batchCC(s, docs.map(_._1)), s"trial $trial vs batch CC")
    }
  }

  test("the per-batch merge graph is label-space, not corpus-space") {
    // structural scale check: after many batches the label store keeps
    // exactly one row per document and labels are component minima
    val s = run(Seq(b1, b2, b3))
    val rows = s.labelsView().collect()
    assert(rows.length == allIds.size)
    val byCanon = labelsOf(s).groupBy(_._2).view.mapValues(_.keys.min).toMap
    byCanon.foreach { case (canon, minId) =>
      assert(canon == minId, s"label $canon is not its component's min id")
    }
  }
}
