package graft.ext

import graft.SparkSpec
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** The shared connected-components engine (d7 text clusters, d9 semantic
  * clusters), property-checked: for ANY undirected edge set, the
  * distributed multi-hop min-label propagation equals a driver-side
  * union-find — every node labeled with its component's minimum id,
  * isolated nodes labeling themselves. Fixed ScalaCheck seeds (the
  * scalatest bridge artifact is not on the offline classpath) —
  * deterministic across runs.
  */
class ClustersPropertySpec extends SparkSpec {

  private val genGraph: Gen[(Int, List[(Long, Long)])] = for {
    nNodes <- Gen.choose(1, 40)
    nEdges <- Gen.choose(0, 60)
    us <- Gen.listOfN(nEdges, Gen.choose(0L, nNodes - 1L))
    vs <- Gen.listOfN(nEdges, Gen.choose(0L, nNodes - 1L))
  } yield (nNodes, us.zip(vs).filter { case (u, v) => u != v })

  private def sample(seed: Long): (Int, List[(Long, Long)]) =
    genGraph.apply(Gen.Parameters.default, Seed(seed)).getOrElse((1, Nil))

  /** Reference: plain union-find with min-root normalization. */
  private def unionFind(n: Int, edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = Array.tabulate(n)(identity)
    def find(x: Int): Int = if (parent(x) == x) x else { parent(x) = find(parent(x)); parent(x) }
    for ((u, v) <- edges) {
      val (ru, rv) = (find(u.toInt), find(v.toInt))
      if (ru != rv) parent(math.max(ru, rv)) = math.min(ru, rv)
    }
    (0 until n).map(i => i.toLong -> find(i).toLong).toMap
  }

  test("min-label clusters == union-find, for arbitrary graphs") {
    import spark.implicits._
    for (seed <- 1L to 15L) {
      val (n, edges) = sample(seed)
      val ids = (0L until n.toLong).toDF("id")
      val pairs = edges.toDF("a", "b")
      val got = Dedup.minLabelClusters(pairs, "a", "b", ids, "id")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == unionFind(n, edges), s"seed=$seed n=$n edges=$edges")
    }
  }

  /** Reference: sequential integer-arithmetic PageRank, the exact fold
    * d11's joins must reproduce (same Scale, same floor divisions).
    */
  private def pageRankSeq(n: Int, edges: Seq[(Long, Long)],
      iters: Int): Map[Long, Long] = {
    val Scale = 1000000000000L
    val und = edges.flatMap { case (a, b) => Seq(a -> b, b -> a) }
    val deg = und.groupBy(_._1).map { case (k, vs) => k -> vs.length.toLong }
    val nodes = (0L until n.toLong)
    var r = nodes.map(_ -> Scale / n).toMap
    for (_ <- 1 to iters) {
      val msg = und.groupBy(_._2).map { case (v, es) =>
        v -> es.map { case (u, _) => r(u) / deg(u) }.sum
      }
      r = nodes.map(u =>
        u -> (15L * (Scale / n) / 100L + 85L * msg.getOrElse(u, 0L) / 100L)).toMap
    }
    r
  }

  test("pagerank == sequential integer fold, for arbitrary graphs") {
    import spark.implicits._
    // multi-edges matter here (they weight the random graph's degrees),
    // so keep duplicates — only self-loops are dropped by the generator
    for (seed <- 1L to 8L) {
      val (n, edges) = sample(seed)
      val ids = (0L until n.toLong).toDF("id")
      val pairs = edges.toDF("a", "b")
      val got = Dedup.pageRankOn(pairs, "a", "b", ids, "id", iters = 2)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == pageRankSeq(n, edges, iters = 2),
        s"seed=$seed n=$n edges=$edges")
    }
  }
}
