package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** s8's ADAPTIVE cell split past its threshold — the registry testdata
  * sits under [[Similarity.CellN0]], where the mask is 0 bits and every
  * historical result is bit-identical, so this spec is the only place
  * the split actually engages (the d6 adaptive-width discipline).
  *
  * 2600 synthetic vectors (> 2000, ≤ 4000 → exactly ONE split bit) over
  * 4 labels; the expected sub-cell of every vector is re-derived in
  * plain Scala from the shared plane family, and the blocking geometry
  * is asserted on the OUTPUT: neighbors must share the query's sub-cell
  * and span at most the own cell + one probed cell.
  */
class AdaptiveCellSpec extends SparkSpec {

  private val n = 2600
  private def vec(i: Int): Array[Float] =
    Array.tabulate(64) { d =>
      val h = ((i.toLong * 31 + d) * 2654435761L) % 1000L
      ((h - 500L).toFloat) / 500.0f
    }

  private lazy val emb = {
    import spark.implicits._
    (0 until n).map(i => (i.toLong, vec(i), i % 4))
      .toDF("vec_id", "embedding", "label")
  }

  // plain-Scala re-derivation of the sub-cell signature: same planes,
  // same double fold order, same sign comparisons as the Spark side
  private def subcell(i: Int): Long = {
    val v = vec(i).map(_.toDouble)
    val sig = (0 until 8).map { p =>
      val plane = Dedup.planes(p)
      var dot = 0.0
      var d = 0
      while (d < 64) { dot += v(d) * plane(d); d += 1 }
      if (dot > 0) 1L << p else 0L
    }.sum
    sig & 1L // n in (2000, 4000] -> exactly one split bit
  }

  test("past CellN0 the split engages; neighbors share the query's sub-cell") {
    val rows = Similarity.knnJoinOn(emb).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val byQ = rows.groupBy(_._1)
    // every vector is a query and gets a dense top-k
    assert(byQ.size == n, s"${n - byQ.size} vectors lost their neighbor list")
    for ((q, rs) <- byQ)
      assert(rs.map(_._3).sorted.sameElements(1L to rs.length),
        s"query $q ranks not dense")
    // the split is REAL at this size: both sub-cells are populated
    val cells = (0 until n).map(subcell).toSet
    assert(cells == Set(0L, 1L), "sub-cell split did not engage past CellN0")
    // blocking geometry: every neighbor shares the query's sub-cell
    // (own-label probe AND other-label probe both carry the query's own
    // signature), and labels span at most two cells
    for ((q, rs) <- byQ) {
      val qc = subcell(q.toInt)
      for ((_, nb, _) <- rs)
        assert(subcell(nb.toInt) == qc,
          s"query $q (subcell $qc): neighbor $nb in subcell ${subcell(nb.toInt)}")
      val labels = rs.map(r => (r._2 % 4)).toSet
      assert(labels.size <= 2, s"query $q neighbors span ${labels.size} labels")
    }
  }
}
