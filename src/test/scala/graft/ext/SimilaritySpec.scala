package graft.ext

import graft.SparkSpec
import graft.functions.CosineSimilarity.cosineSim
import org.apache.spark.sql.functions._

class SimilaritySpec extends SparkSpec {

  private def vecs = graft.Tables.embeddings(spark, sf)
    .select(col("vec_id"), transform(col("embedding"), x => x.cast("double")).as("v"),
      col("label"))

  test("native cosine expression is bit-identical to the built-in form") {
    val builtinCos = {
      def dot(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
        aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)
      val e = vecs.limit(50)
      val pairs = e.select(col("vec_id").as("i"), col("v").as("a"))
        .crossJoin(e.select(col("vec_id").as("j"), col("v").as("b")))
      pairs.select(col("i"), col("j"),
        (dot(col("a"), col("b")) / (sqrt(dot(col("a"), col("a"))) * sqrt(dot(col("b"), col("b"))))).as("c1"),
        cosineSim(col("a"), col("b")).as("c2"))
    }
    val diff = builtinCos.filter(col("c1") =!= col("c2")).count()
    assert(diff == 0, "fused one-pass cosine drifted from the 3-pass built-in")
  }

  test("cosine expression runs inside whole-stage codegen") {
    val df = Similarity.bruteTopk(spark, sf)
    df.collect() // under AQE codegen stages only appear in the FINAL plan
    // (collect, not count — count() clones the plan and the original
    // queryExecution would never finalize)
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("cosine_sim"), s"expression missing from plan:\n$p")
    assert("""\*\(\d+\) Project \[[^\n]*cosine_sim""".r.findFirstIn(p).isDefined,
      s"cosine_sim not in a codegen'd Project:\n$p")
  }

  test("brute-force rank 1 is the true nearest neighbor") {
    val rows = vecs.collect().map(r =>
      r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0
      for (i <- a.indices) { d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i) }
      d / (math.sqrt(na) * math.sqrt(nb))
    }
    val top = Similarity.bruteTopk(spark, sf)
      .filter(col("rank") === 1).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    for ((q, n) <- top) {
      val best = rows.filter(_._1 != q)
        .maxBy { case (id, v) => (cos(rows(q), v), -id.toDouble) }._1
      assert(n == best, s"query $q: rank-1 neighbor $n != true nearest $best")
    }
  }

  test("IVF probes only the query's cell; LSH output ranks are dense") {
    val labels = vecs.select("vec_id", "label").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val ivf = Similarity.ivfTopk(spark, sf).collect()
    assert(ivf.nonEmpty)
    assert(ivf.forall(r => labels(r.getLong(0)) == labels(r.getLong(1))),
      "IVF returned a neighbor outside the query's coarse cell")
    val lsh = Similarity.lshTopk(spark, sf).collect()
    val byQ = lsh.groupBy(_.getLong(0))
    for ((_, rs) <- byQ)
      assert(rs.map(_.getLong(2)).sorted.sameElements(1L to rs.length),
        "LSH ranks not dense from 1")
  }

  test("s5 nprobe=2: probes own cell + one other; recall never below s2's") {
    val labels = vecs.select("vec_id", "label").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    def byQuery(df: org.apache.spark.sql.DataFrame): Map[Long, Set[Long]] =
      df.collect().map(r => r.getLong(0) -> r.getLong(1))
        .groupBy(_._1).map { case (q, rs) => q -> rs.map(_._2).toSet }
    // exact ground truth: brute-force rank <= 3
    val truth = byQuery(Similarity.bruteTopk(spark, sf).filter(col("rank") <= 3))
    val s2 = byQuery(Similarity.ivfTopk(spark, sf))
    val s5 = byQuery(Similarity.ivfNprobeTopk(spark, sf))
    assert(s5.nonEmpty)
    for ((q, ns) <- s5) {
      // structural nprobe=2: neighbors span at most 2 cells, one of them
      // the query's own
      val cells = ns.map(labels)
      assert(cells.size <= 2, s"query $q probed ${cells.size} cells")
      // candidate-set ⊇ own cell ⟹ recall against the exact answer is
      // monotone: any true neighbor reachable by s2 is also an s5
      // candidate, and true neighbors always outrank non-true candidates
      val r2 = s2.getOrElse(q, Set.empty).count(truth(q))
      val r5 = ns.count(truth(q))
      assert(r5 >= r2, s"query $q: nprobe=2 recall $r5 < nprobe=1 recall $r2")
    }
    // and the wider probe must help somewhere on this corpus, else the
    // query proves nothing
    val total2 = s2.map { case (q, ns) => ns.count(truth(q)) }.sum
    val total5 = s5.map { case (q, ns) => ns.count(truth(q)) }.sum
    assert(total5 >= total2)
  }

  test("s15 filtered ANN: tenant respected, probe structure kept, filter binds") {
    import graft.ext.Portable.tokenHashOf
    def tenantOf(id: Long): Long = tokenHashOf(id.toString) % Similarity.Tenants
    val labels = vecs.select("vec_id", "label").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val rows = Similarity.filteredTopk(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(rows.nonEmpty, "filtered search returned nothing — vacuous")
    // the metadata predicate holds on every emitted pair
    for ((q, n, _, _) <- rows)
      assert(tenantOf(n) == tenantOf(q), s"tenant violated: $q -> $n")
    val byQ = rows.groupBy(_._1)
    for ((q, rs) <- byQ) {
      // dense ranks from 1, cosines non-increasing in rank order
      val sorted = rs.sortBy(_._3)
      assert(sorted.map(_._3).toSeq == (1L to rs.length).toSeq,
        s"ranks not dense for $q")
      assert(sorted.map(_._4).toSeq == sorted.map(_._4).sortBy(-(_: Double)).toSeq,
        s"cos not descending for $q")
    }
    // probe structure survives the filter: ≤ 2 cells for a full query,
    // ≤ 1+WidenedOtherCells for one the narrow probe left short (the
    // r13 widen-on-shortfall read path); the s16 eval's widen flag is
    // the same decision rule, so it tells us which bound applies
    val widenedByQ = Similarity.filteredRecallEval(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getBoolean(3)).toMap
    for ((q, rs) <- byQ) {
      val cells = rs.map(x => labels(x._2)).toSet
      val bound = if (widenedByQ.getOrElse(q, false))
        1 + Similarity.WidenedOtherCells else 2
      assert(cells.size <= bound, s"query $q probed ${cells.size} cells")
    }
    // the filter must BIND on this corpus: versus the unfiltered s5
    // top-3, some query's neighbor set changes (else the tenant
    // predicate proved nothing), and every same-set query kept rank
    // order
    val s5 = Similarity.ivfNprobeTopk(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).groupBy(_._1)
      .map { case (q, rs) => q -> rs.map(_._2).toSet }
    val changed = byQ.exists { case (q, rs) =>
      s5.get(q).exists(_ != rs.map(_._2).toSet) }
    assert(changed, "filtered result identical to unfiltered for every query")
  }

  test("s16 filtered recall: arms recomputed, monotone, widen flag honest") {
    import graft.ext.Portable.tokenHashOf
    def tenantOf(id: Long): Long = tokenHashOf(id.toString) % Similarity.Tenants
    // filtered brute truth, recomputed driver-side
    val all = vecs.collect().map(r =>
      (r.getLong(0), r.getSeq[Double](1).toArray))
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) { d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
      d / (math.sqrt(na) * math.sqrt(nb))
    }
    val queries = all.filter(_._1 < 8)
    val truth = queries.map { case (qid, qv) =>
      qid -> all.filter(e => e._1 != qid && tenantOf(e._1) == tenantOf(qid))
        .map(e => (e._1, cos(e._2, qv)))
        .sortBy(x => (-x._2, x._1)).take(3).map(_._1).toSet
    }.toMap
    // the WIDENED arm's top-3 IS s15's output since r13 (the serving
    // path widens on shortfall) — recompute hits_widened from it
    val s15 = Similarity.filteredTopk(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).groupBy(_._1)
      .map { case (q, rs) => q -> rs.map(_._2).toSet }
    val eval = Similarity.filteredRecallEval(spark, sf).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(eval.nonEmpty, "s16 returned nothing — vacuous")
    assert(eval.keySet == truth.filter(_._2.nonEmpty).keySet,
      "queries with filtered truth must all be evaluated")
    for ((q, r) <- eval) {
      val k = r.getLong(1)
      assert(k == truth(q).size, s"query $q: k=$k != |truth|")
      val hw = truth(q).count(s15.getOrElse(q, Set.empty))
      assert(r.getLong(5) == hw, s"query $q: hits_widened ${r.getLong(5)} != $hw")
      assert(r.getLong(6) == r.getLong(4) * 1000000L / k, s"query $q: recall2 ppm")
      assert(r.getLong(7) == hw * 1000000L / k, s"query $q: recallw ppm")
      // widening never loses: the widened candidate set is a superset
      assert(r.getLong(7) >= r.getLong(6), s"query $q: recall not monotone")
      // flag honesty: widened exactly when the narrow probe came short
      assert(r.getBoolean(3) == (r.getLong(2) < 3), s"query $q: widen flag")
    }
  }

  test("s16 widen-on-shortfall recovers a tenant the narrow probe starves") {
    import graft.ext.Portable.tokenHashOf
    import spark.implicits._
    def tenantOf(id: Long): Long = tokenHashOf(id.toString) % Similarity.Tenants
    // craft a corpus: the query sits in cell 0, the nprobe=2 probe set
    // is {cell 0, cell 1} (centroid-cosine ties break to the lowest
    // label), and the query's tenant exists ONLY in cell 2 — so the
    // narrow arm returns nothing and the widened arm must recover it.
    val qid = 0L
    val t = tenantOf(qid)
    // id pools by tenant, computed from the real hash. Query ids that
    // SHARE qid's tenant are left out of the corpus entirely — they'd
    // sit in cell 0 and quietly feed the narrow arm, unstarving it.
    val others = (100L until 400L)
    val sameTenant = others.filter(tenantOf(_) == t).take(4)
    val otherTenant = others.filter(tenantOf(_) != t)
    def v(axis: Int): Seq[Double] = Seq.tabulate(4)(i => if (i == axis) 1.0 else 0.0)
    val rows =
      (0L until 8L).filter(id => id == qid || tenantOf(id) != t)
        .map(id => (id, v(0), 0)) ++ // queries, all in cell 0
        otherTenant.take(6).map(id => (id, v(1), 1)) ++ // cell 1 filler
        sameTenant.map(id => (id, v(2), 2)) ++ // the starved tenant, cell 2
        otherTenant.slice(6, 12).map(id => (id, v(3), 3)) // cell 3 filler
    val emb = rows.toDF("vec_id", "embedding", "label")
    val eval = Similarity.filteredRecallEvalOn(emb).collect()
      .map(r => r.getLong(0) -> r).toMap
    val r = eval(qid)
    assert(r.getBoolean(3), s"query $qid must widen: $r")
    assert(r.getLong(4) == 0L, s"narrow arm must starve: $r")
    assert(r.getLong(5) > 0L, s"widened arm must recover: $r")
    assert(r.getLong(7) > r.getLong(6), s"recall must improve: $r")

    // r13: the widen is part of the SERVING path, not just the eval —
    // the same crafted corpus through s15 itself must return the
    // starved query's same-tenant neighbors (pre-r13 it returned
    // nothing for qid), with the tenant predicate intact on every row
    val served = Similarity.filteredTopkOn(emb).collect()
      .map(x => (x.getLong(0), x.getLong(1)))
    val mine = served.filter(_._1 == qid).map(_._2).toSet
    assert(mine.nonEmpty, "serving path must recover the starved query")
    assert(mine.subsetOf(sameTenant.toSet),
      s"served neighbors must be the starved tenant's: $mine")
    served.foreach { case (q, n) =>
      assert(tenantOf(n) == tenantOf(q), s"tenant violated in serving: $q -> $n")
    }
  }

  test("s17 filtered IVF-PQ: tenant respected, probe structure kept, filter binds") {
    import graft.ext.Portable.tokenHashOf
    def tenantOf(id: Long): Long = tokenHashOf(id.toString) % Similarity.Tenants
    val labels = vecs.select("vec_id", "label").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val rows = Similarity.filteredIvfPq(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(rows.nonEmpty, "filtered IVF-PQ returned nothing — vacuous")
    for ((q, n, _, _) <- rows)
      assert(tenantOf(n) == tenantOf(q), s"tenant violated: $q -> $n")
    val byQ = rows.groupBy(_._1)
    for ((q, rs) <- byQ) {
      val sorted = rs.sortBy(_._3)
      assert(sorted.map(_._3).toSeq == (1L to rs.length).toSeq,
        s"ranks not dense for $q")
      assert(sorted.map(_._4).toSeq == sorted.map(_._4).sortBy(-(_: Double)).toSeq,
        s"cos not descending for $q")
    }
    // probe structure survives the filter: <= 2 cells for a full query,
    // <= 1+WidenedOtherCells for a short one (s17's widen decision
    // counts the same narrow same-tenant candidates as s15/s16's, so
    // the s16 widen flag is the applicable bound selector)
    val widenedByQ = Similarity.filteredRecallEval(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getBoolean(3)).toMap
    for ((q, rs) <- byQ) {
      val cells = rs.map(x => labels(x._2)).toSet
      val bound = if (widenedByQ.getOrElse(q, false))
        1 + Similarity.WidenedOtherCells else 2
      assert(cells.size <= bound, s"query $q probed ${cells.size} cells")
    }
    // the filter must BIND vs the unfiltered s13 on this corpus
    val s13 = Similarity.ivfPqTopk(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).groupBy(_._1)
      .map { case (q, rs) => q -> rs.map(_._2).toSet }
    assert(byQ.exists { case (q, rs) =>
      s13.get(q).exists(_ != rs.map(_._2).toSet) },
      "filtered result identical to unfiltered for every query")
  }

  test("s11 recall eval matches independently recomputed hit sets; monotone") {
    def byQuery(df: org.apache.spark.sql.DataFrame): Map[Long, Set[Long]] =
      df.collect().map(r => r.getLong(0) -> r.getLong(1))
        .groupBy(_._1).map { case (q, rs) => q -> rs.map(_._2).toSet }
    val truth = byQuery(Similarity.bruteTopk(spark, sf).filter(col("rank") <= 3))
    val s2 = byQuery(Similarity.ivfTopk(spark, sf))
    val s5 = byQuery(Similarity.ivfNprobeTopk(spark, sf))
    val eval = Similarity.recallEval(spark, sf).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(eval.keySet == truth.keySet, "a query is missing from the eval")
    for ((q, r) <- eval) {
      val k = r.getLong(1)
      assert(k == truth(q).size, s"query $q: k=$k != |truth|=${truth(q).size}")
      val h1 = truth(q).count(s2.getOrElse(q, Set.empty))
      val h2 = truth(q).count(s5.getOrElse(q, Set.empty))
      assert(r.getLong(2) == h1, s"query $q: hits_nprobe1 ${r.getLong(2)} != $h1")
      assert(r.getLong(3) == h2, s"query $q: hits_nprobe2 ${r.getLong(3)} != $h2")
      assert(r.getLong(4) == h1 * 1000000L / k)
      assert(r.getLong(5) == h2 * 1000000L / k)
      // the superset candidate set can only improve recall
      assert(r.getLong(5) >= r.getLong(4), s"query $q: recall not monotone")
    }
  }

  test("s6 quantized-rerank: exact cosines on output, near-exact recall") {
    def byQuery(df: org.apache.spark.sql.DataFrame): Map[Long, Set[Long]] =
      df.collect().map(r => r.getLong(0) -> r.getLong(1))
        .groupBy(_._1).map { case (q, rs) => q -> rs.map(_._2).toSet }
    val truth = byQuery(Similarity.bruteTopk(spark, sf).filter(col("rank") <= 3))
    val s6 = Similarity.sqRerankTopk(spark, sf)
    val rows = s6.collect()
    // ranks dense 1..3 per query; cos column is the EXACT rerank value
    for ((_, rs) <- rows.groupBy(_.getLong(0)))
      assert(rs.map(_.getLong(2)).sorted.sameElements(1L to rs.length))
    // 64-level quantization + a 16-deep shortlist loses almost nothing
    // against the exact answer on this corpus (deterministic inputs)
    val s6m = byQuery(s6)
    val recall = s6m.map { case (q, ns) => ns.count(truth(q)) }.sum
    assert(recall >= 22, s"quantized recall collapsed: $recall/24")
  }

  test("s7 PQ-rerank: exact cosines on output, sane recall from 4-byte codes") {
    def byQuery(df: org.apache.spark.sql.DataFrame): Map[Long, Set[Long]] =
      df.collect().map(r => r.getLong(0) -> r.getLong(1))
        .groupBy(_._1).map { case (q, rs) => q -> rs.map(_._2).toSet }
    val truth = byQuery(Similarity.bruteTopk(spark, sf).filter(col("rank") <= 3))
    val s7 = Similarity.pqRerankTopk(spark, sf)
    val rows = s7.collect()
    // ranks dense 1..3 per query, every query answered
    val grouped = rows.groupBy(_.getLong(0))
    assert(grouped.keySet == truth.keySet, "a query lost all neighbors")
    for ((_, rs) <- grouped)
      assert(rs.map(_.getLong(2)).sorted.sameElements(1L to rs.length))
    // output cos is the EXACT cosine (the rerank contract): recompute
    // from the raw vectors for every returned pair
    val v = graft.Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray).toMap
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0
      for (i <- a.indices) { d += a(i)*b(i); na += a(i)*a(i); nb += b(i)*b(i) }
      d / (math.sqrt(na) * math.sqrt(nb))
    }
    for (r <- rows) {
      val expect = math.rint(cos(v(r.getLong(0)), v(r.getLong(1))) * 1e6) / 1e6
      assert(math.abs(r.getDouble(3) - expect) < 1e-9,
        s"rerank cosine not exact for ${(r.getLong(0), r.getLong(1))}")
    }
    // 4-byte codes + a 16-deep shortlist: coarse, but the rerank must
    // still recover a solid share of the exact top-3 on this corpus
    val s7m = byQuery(s7)
    val recall = s7m.map { case (q, ns) => ns.count(truth(q)) }.sum
    assert(recall >= 12, s"PQ recall collapsed: $recall/24")
  }

  test("s8 kNN join: every vector answered; nprobe=2 structure; no corpus broadcast") {
    val labels = vecs.select("vec_id", "label").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val df = Similarity.knnJoin(spark, sf)
    val rows = df.collect()
    val byQ = rows.groupBy(_.getLong(0))
    // the kNN GRAPH property: every vector is a query and gets neighbors
    assert(byQ.keySet == labels.keySet, "a vector has no neighbor list")
    for ((q, rs) <- byQ) {
      assert(rs.map(_.getLong(2)).sorted.sameElements(1L to rs.length),
        s"query $q ranks not dense")
      // neighbors span at most the own cell + one probed other cell
      val cells = rs.map(r => labels(r.getLong(1))).toSet
      assert(cells.size <= 2, s"query $q neighbors span ${cells.size} cells")
    }
    // recall monotonicity vs the own-cell-only (nprobe=1) baseline:
    // the own cell is always probed, so per query the candidate set is
    // a superset and the rank-1 cosine can only improve
    val own1 = {
      val e = vecs
      val paired = e.select(col("vec_id").as("query_id"), col("v").as("qv"), col("label"))
        .join(e, Seq("label"))
        .filter(col("vec_id") =!= col("query_id"))
        .select(col("query_id"), col("vec_id"),
          cosineSim(col("v"), col("qv")).as("c"))
        .groupBy("query_id").agg(max(col("c")).as("best"))
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
      paired
    }
    val got1 = rows.filter(_.getLong(2) == 1L)
      .map(r => r.getLong(0) -> r.getDouble(3)).toMap
    for ((q, best) <- own1)
      assert(got1(q) >= math.rint(best * 1e6) / 1e6 - 1e-9,
        s"query $q: nprobe=2 rank-1 ${got1(q)} below own-cell best $best")
    // plan: with the size-estimate broadcast path disabled, the ONLY
    // broadcast left must be the explicitly-hinted |cells|-row centroid
    // frame (its join carries `cv`); the corpus-sized scoring join on
    // the cell id must fall back to a shuffle join. Locally AQE may
    // legitimately broadcast the small corpus by SIZE — that choice is
    // scale-gated and disappears at 100 TB, unlike a hint.
    val key = "spark.sql.autoBroadcastJoinThreshold"
    val prev = spark.conf.get(key)
    spark.conf.set(key, "-1")
    try {
      val df = Similarity.knnJoin(spark, sf)
      val p = df.queryExecution.executedPlan.toString
      val bjoins = "Broadcast(?:Hash|NestedLoop)Join[^\\n]*".r.findAllIn(p).toList
      // two legitimate broadcasts under threshold -1: the centroid
      // crossJoin (recognizable by its label<>qlabel residual) and the
      // ONE-ROW adaptive-cell count frame (a bare Cross with no
      // residual — the d6 pattern); nothing else may broadcast. The
      // count frame is provably one row: it is a global aggregate.
      // a corpus broadcast would appear as a BroadcastHashJoin on the
      // (label, subcell) scoring keys — neither a qlabel residual nor a
      // residual-free Cross — and is caught by the allowlist
      assert(bjoins.nonEmpty && bjoins.forall(j =>
        j.contains("qlabel") || j.trim.endsWith("Cross")),
        s"non-centroid broadcast join in s8 plan:\n$p")
      assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin"),
        s"cell-id scoring join is not a shuffle join:\n$p")
    } finally spark.conf.set(key, prev)
  }

  test("s10: reassignment matches a driver-side brute force; objective never increases") {
    val out = Similarity.kmeansStep(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getInt(1), r.getInt(2), r.getBoolean(3), r.getLong(4)))
      .toMap
    // brute-force recompute in plain Scala: quantize, integer centroids,
    // exact long distances, argmin with (dist, label) tiebreak
    val vecs = graft.Tables.embeddings(spark, sf)
      .selectExpr("vec_id", "label",
        "transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 10000000.0) AS BIGINT)) AS qv")
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getSeq[Long](2).toArray))
    val cents = vecs.groupBy(_._2).map { case (l, vs) =>
      l -> Array.tabulate(64)(d => vs.map(_._3(d)).sum / vs.length)
    }
    def dist(q: Array[Long], c: Array[Long]): Long =
      (0 until 64).map(d => (q(d) - c(d)) * (q(d) - c(d))).sum
    for ((id, old, qv) <- vecs) {
      val (bd, bl) = cents.map { case (l, c) => (dist(qv, c), l) }.min
      val (gotOld, gotNew, gotMoved, gotDist) = out(id)
      assert(gotOld == old && gotNew == bl && gotDist == bd,
        s"vec $id: got ($gotNew, $gotDist) expected ($bl, $bd)")
      assert(gotMoved == (bl != old))
      // the Lloyd invariant that makes the loop converge: a step never
      // increases any vector's distance to its assigned centroid
      assert(bd <= dist(qv, cents(old)), s"vec $id: objective increased")
    }
    assert(out.size == vecs.length)
  }

  test("s10: centroids broadcast; the vector table is scanned once, shuffled never") {
    val p = Similarity.kmeansStep(spark, sf).queryExecution.executedPlan.toString
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"),
      s"s10: k-row centroid frame not broadcast:\n$p")
    // the assignment side must not exchange on anything corpus-sized
    // except the final per-vector argmin aggregation
    val exchanges = "Exchange hashpartitioning\\(([^)]*)\\)".r
      .findAllMatchIn(p).map(_.group(1)).toSeq
    assert(exchanges.forall(e => e.contains("vec_id") || e.contains("clabel") || e.contains("dim")),
      s"s10: unexpected exchange:\n$p")
  }

  test("query set broadcasts; the vector scan is never shuffled (s1)") {
    val p = Similarity.bruteTopk(spark, sf).queryExecution.executedPlan.toString
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"),
      s"query side not broadcast:\n$p")
    // the only exchange allowed is the final per-query top-k shuffle
    val exchanges = "Exchange hashpartitioning\\(([^)]*)\\)".r
      .findAllMatchIn(p).map(_.group(1)).toSeq
    assert(exchanges.forall(_.contains("query_id")),
      s"unexpected exchange beyond the top-k shuffle:\n$p")
  }

  test("s12 MMR equals a brute greedy recompute; diversified != plain top-k") {
    val got = Similarity.mmrDiversify(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val byQ = got.groupBy(_._1)
    assert(byQ.values.forall(_.length == 5), "every query must select 5")
    assert(byQ.values.forall(v => v.map(_._2).distinct.length == 5),
      "duplicate selection")
    // brute recompute with the same index-order accumulation as cosineSim
    val vecs = graft.Tables.embeddings(spark, sf).collect()
      .map(r => r.getLong(0) ->
        r.getSeq[Float](1).map(_.toDouble).toArray).toMap
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      val n = math.min(a.length, b.length)
      while (i < n) { dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
      dot / (math.sqrt(na) * math.sqrt(nb))
    }
    for ((qid, sel) <- byQ) {
      val qv = vecs(qid)
      val pool = vecs.keys.filter(_ != qid).toSeq
        .map(c => c -> cos(vecs(c), qv))
        .sortBy { case (c, rel) => (-rel, c) }.take(20)
      var selected = Vector(pool.minBy { case (c, rel) => (-rel, c) }._1)
      while (selected.length < 5) {
        val rem = pool.filterNot { case (c, _) => selected.contains(c) }
        val next = rem.minBy { case (c, rel) =>
          val maxsim = selected.map(sc => cos(vecs(c), vecs(sc))).max
          (-((rel - maxsim) / 2), c)
        }._1
        selected :+= next
      }
      val gotOrder = sel.sortBy(_._3).map(_._2).toVector
      assert(gotOrder == selected, s"q$qid: $gotOrder != brute $selected")
    }
    // diversification must CHANGE something vs plain relevance order for
    // at least one query, or the operator is a relabeled top-k
    val plain = Similarity.bruteTopk(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .groupBy(_._1).map { case (q, v) => q -> v.sortBy(_._3).map(_._2).toVector }
    assert(byQ.exists { case (q, v) => v.sortBy(_._3).map(_._2).toVector != plain(q) },
      "MMR output identical to plain top-5 on every query — vacuous")
  }

  test("s13 IVF-PQ: neighbors only from probed cells; exact rerank; recall holds") {
    val rows = Similarity.ivfPqTopk(spark, sf).collect()
    assert(rows.nonEmpty)
    // ranks dense 1..k per query
    for ((_, rs) <- rows.groupBy(_.getLong(0)))
      assert(rs.map(_.getLong(2)).sorted.sameElements(1L to rs.length))
    // CONTAINMENT: every neighbor's cell must be one the query probed —
    // recompute the probe set (own label + nearest-other centroid label)
    // driver-side from the raw vectors
    val emb = graft.Tables.embeddings(spark, sf)
      .select("vec_id", "label", "embedding").collect()
      .map(r => (r.getLong(0), r.getInt(1),
        r.getSeq[Float](2).map(_.toDouble).toArray))
    val labelOf = emb.map(e => e._1 -> e._2).toMap
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0
      for (i <- a.indices) { d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i) }
      d / (math.sqrt(na) * math.sqrt(nb))
    }
    // fixed-point centroids (s4's discipline: floor 1e-7 grid, mean)
    val cents = emb.groupBy(_._2).map { case (l, vs) =>
      val n = vs.length
      l -> Array.tabulate(64)(d =>
        vs.map(v => math.floor(v._3(d) * 1e7).toLong).sum.toDouble / 1e7 / n)
    }
    val probed = emb.filter(_._1 < 8).map { case (qid, ql, qv) =>
      val other = cents.filter(_._1 != ql).toSeq
        .map { case (l, cv) => (l, cos(qv, cv)) }
        .minBy { case (l, c) => (-c, l) }._1
      qid -> Set(ql, other)
    }.toMap
    for (r <- rows)
      assert(probed(r.getLong(0)).contains(labelOf(r.getLong(1))),
        s"neighbor ${r.getLong(1)} outside query ${r.getLong(0)}'s probed cells")
    // the rerank contract: output cos is the exact cosine
    val vecs = emb.map(e => e._1 -> e._3).toMap
    for (r <- rows) {
      val expect = math.rint(cos(vecs(r.getLong(0)), vecs(r.getLong(1))) * 1e6) / 1e6
      assert(math.abs(r.getDouble(3) - expect) < 1e-9, "rerank cosine not exact")
    }
    // where the probed cells fit the 32-deep shortlist, the PQ stage
    // cannot drop anyone — the fused path must EQUAL s5 exactly (same
    // candidates, same exact-cosine ordering)
    val cellSize = emb.groupBy(_._2).map { case (l, vs) => l -> vs.length }
    val s5 = Similarity.ivfNprobeTopk(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .groupBy(_._1).map { case (q, rs) => q -> rs.sortBy(_._3).map(_._2).toSeq }
    val s13 = rows.map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .groupBy(_._1).map { case (q, rs) => q -> rs.sortBy(_._3).map(_._2).toSeq }
    for ((q, cellsOf) <- probed) {
      val nCand = cellsOf.toSeq.map(cellSize).sum - 1 // minus the query
      if (nCand <= 32)
        assert(s13(q) == s5(q),
          s"query $q: shortlist covers all $nCand candidates yet differs from s5")
    }
    // recall floor vs the exact top-3: sf0.001's coarse quantizer is weak
    // (s5 itself retrieves ~4/24 here) — the fused path must still beat
    // chance, which 3 random picks from a probed cell would not
    val truth = Similarity.bruteTopk(spark, sf).filter(col("rank") <= 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1))
      .groupBy(_._1).map { case (q, rs) => q -> rs.map(_._2).toSet }
    val hits = s13.map { case (q, ns) => ns.count(truth(q)) }.sum
    assert(hits >= 2, s"IVF-PQ recall collapsed: $hits hits")
  }

  test("s14 margin mining equals a driver recount; the margin cut bites") {
    val rows = vecs.collect().map(r =>
      (r.getLong(0), r.getSeq[Double](1).toArray, r.getInt(2)))
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var (d, na, nb, i) = (0.0, 0.0, 0.0, 0)
      while (i < a.length) {
        d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1
      }
      d / (math.sqrt(na) * math.sqrt(nb))
    }
    val pos = for {
      (qa, va, la) <- rows if qa % 2 == 0
      (nb, vb, lb) <- rows if nb % 2 == 1 && lb == la
      c = math.floor(cos(vb, va) * 1000000.0).toLong if c > 0
    } yield (qa, nb, c)
    def topStats(xs: Seq[(Long, Long)]): (Long, Long) = {
      val top = xs.sortBy { case (id, c) => (-c, id) }.take(4)
      (top.size.toLong, top.map(_._2).sum)
    }
    val fwd = pos.groupBy(_._1).map { case (q, xs) =>
      q -> topStats(xs.map(x => (x._2, x._3)).toSeq) }
    val bwd = pos.groupBy(_._2).map { case (n, xs) =>
      n -> topStats(xs.map(x => (x._1, x._3)).toSeq) }
    val mined = pos.groupBy(_._1).flatMap { case (q, xs) =>
      val scored = xs.map { case (_, n, c) =>
        val (nf, sumf) = fwd(q); val (nb2, sumb) = bwd(n)
        (n, c, 2000000L * c * nf * nb2 / (sumf * nb2 + sumb * nf))
      }.toSeq
      val best = scored.minBy { case (n, _, m) => (-m, n) }
      if (best._3 >= 1000000L) Some((q, best._1, best._2, best._3)) else None
    }.toSet
    val got = Similarity.bitextMargin(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(got == mined,
      s"missing=${(mined -- got).take(3)} extra=${(got -- mined).take(3)}")
    assert(got.nonEmpty, "no pair mined — vacuous")
    // the margin threshold rejects someone with candidates, and the
    // argmax genuinely reorders raw cosine for someone
    assert(pos.map(_._1).toSet.size > got.size,
      "every candidate query mined a pair — the margin cut proves nothing")
    val rawBest = pos.groupBy(_._1).map { case (q, xs) =>
      q -> xs.map(x => (x._2, x._3)).toSeq
        .minBy { case (n, c) => (-c, n) }._1 }
    assert(got.exists { case (q, n, _, _) => rawBest(q) != n },
      "margin ranking never disagrees with raw cosine — normalizer inert")
  }
}
