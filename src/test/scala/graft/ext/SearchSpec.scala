package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Search operators (x12 match, x13 phrase) against brute-force
  * re-computations in plain Scala, plus plan-shape checks: the corpus
  * posting list must shuffle, never broadcast — only the literal query
  * frames may — and the per-query top-k must plan as WindowGroupLimit.
  */
class SearchSpec extends SparkSpec {

  private def corpus(): Seq[(Long, Array[String])] =
    graft.Tables.documents(spark, sf)
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1).split(" "))).toSeq

  test("x12 match search equals a brute-force tf-idf ranking") {
    val docs = corpus()
    val n = docs.size.toLong
    val tf = docs.flatMap { case (id, ws) =>
      ws.groupBy(identity).map { case (w, o) => ((id, w), o.length.toLong) }
    }.toMap
    val df = tf.keys.groupBy(_._2).map { case (w, ks) => w -> ks.size.toLong }
    val expected = Search.matchQueries.groupBy(_._1).flatMap { case (qid, qs) =>
      val terms = qs.map(_._2)
      val scored = docs.flatMap { case (id, _) =>
        val matched = terms.filter(t => tf.contains((id, t)))
        if (matched.isEmpty) None
        else Some((id, matched.size.toLong,
          matched.map(t => tf((id, t)) * n * 1000000L / df(t)).sum))
      }
      scored.sortBy { case (id, _, s) => (-s, id) }.take(10).zipWithIndex
        .map { case ((id, nt, s), i) => (qid, id, nt, s, i + 1L) }
    }.toSet
    val got = Search.matchSearch(spark, sf).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSet
    assert(got == expected,
      s"missing=${expected -- got} extra=${got -- expected}")
  }

  test("x21 facets count the FULL match set per attribute, not the top page") {
    val attrs = graft.Tables.documents(spark, sf)
      .select("doc_id", "lang", "source").collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getString(2)))).toMap
    val docs = corpus()
    val expected = Search.matchQueries.groupBy(_._1).flatMap { case (qid, qs) =>
      val terms = qs.map(_._2).toSet
      val hits = docs.collect {
        case (id, ws) if ws.exists(terms) => id }
      hits.flatMap(id => Seq((qid, "lang", attrs(id)._1), (qid, "source", attrs(id)._2)))
    }.groupBy(identity).map { case (k, vs) => k -> vs.size.toLong }
    val got = Search.facets(spark, sf).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2)) -> r.getLong(3)).toMap
    assert(got == expected,
      s"missing=${expected.toSet -- got.toSet} extra=${got.toSet -- expected.toSet}")
    // facet totals cover the full match set — more docs than any top-10 page
    val lang4 = got.collect { case ((4, "lang", _), n) => n }.sum
    assert(lang4 > 10, s"facets look page-bounded: query 4 counts $lang4 docs")
  }

  test("x13 phrase search equals a brute-force sliding-window count") {
    val docs = corpus()
    val expected = Search.phraseQueries.flatMap { case (qid, phrase) =>
      val p = phrase.split(" ")
      val hits = docs.flatMap { case (id, ws) =>
        val occ = ws.sliding(p.length).count(_.sameElements(p)).toLong
        if (occ > 0) Some((id, occ)) else None
      }
      hits.sortBy { case (id, occ) => (-occ, id) }.take(10).zipWithIndex
        .map { case ((id, occ), i) => (qid, phrase, id, occ, i + 1L) }
    }.toSet
    val got = Search.phraseSearch(spark, sf).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSet
    assert(got == expected,
      s"missing=${expected -- got} extra=${got -- expected}")
  }

  test("x14 hybrid fusion equals RRF recomputed from its two arms") {
    val text = Search.matchSearch(spark, sf).collect()
      .map(r => ((r.getInt(0), r.getLong(1)), r.getLong(4))).toMap
    import graft.functions.CosineSimilarity.cosineSim
    val e = graft.Tables.embeddings(spark, sf)
      .select(col("vec_id"), transform(col("embedding"), x => x.cast("double")).as("v"))
    val qids = Search.matchQueries.map(_._1).distinct
    val vecs = e.collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    def cos(a: Seq[Double], b: Seq[Double]): Double = {
      val dot = a.zip(b).map { case (x, y) => x * y }.sum
      dot / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
    }
    val vecArm = qids.flatMap { q =>
      vecs.toSeq.filter(_._1 != q.toLong)
        .map { case (id, v) => (id, cos(vecs(q.toLong), v)) }
        .sortBy { case (id, c) => (-c, id) }.take(10).zipWithIndex
        .map { case ((id, _), i) => ((q, id), i + 1L) }
    }.toMap
    val expected = (text.keySet ++ vecArm.keySet).groupBy(_._1).flatMap {
      case (qid, keys) =>
        val scored = keys.map { k =>
          val s = text.get(k).map(r => 1000000L / (60 + r)).getOrElse(0L) +
            vecArm.get(k).map(r => 1000000L / (60 + r)).getOrElse(0L)
          val nArms = text.contains(k).compare(false) + vecArm.contains(k).compare(false)
          (k._2, nArms.toLong, s)
        }.toSeq
        scored.sortBy { case (id, _, s) => (-s, id) }.take(10).zipWithIndex
          .map { case ((id, n, s), i) => (qid, id, n, s, i + 1L) }
    }.toSet
    val got = Search.hybridSearch(spark, sf).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSet
    assert(got == expected,
      s"missing=${expected -- got} extra=${got -- expected}")
  }

  test("x17 BM25 equals a brute-force Robertson scoring") {
    val docs = corpus()
    val tf = docs.flatMap { case (id, ws) =>
      ws.groupBy(identity).map { case (w, o) => ((id, w), o.length.toLong) }
    }.toMap
    val df = tf.keys.groupBy(_._2).map { case (w, ks) => w -> ks.size.toLong }
    val dl = docs.map { case (id, ws) => id -> ws.length.toLong }.toMap
    val n = docs.size.toLong
    val a = dl.values.sum
    def w(id: Long, t: String): Long = {
      val f = tf((id, t))
      val tfm = (22L * a * f * 1000000L) / (10L * a * f + 3L * a + 9L * dl(id) * n)
      (n * 1000000L / df(t)) * tfm / 1000000L
    }
    val expected = Search.matchQueries.groupBy(_._1).flatMap { case (qid, qs) =>
      val terms = qs.map(_._2)
      val scored = docs.flatMap { case (id, _) =>
        val matched = terms.filter(t => tf.contains((id, t)))
        if (matched.isEmpty) None
        else Some((id, matched.size.toLong, matched.map(w(id, _)).sum))
      }
      scored.sortBy { case (id, _, s) => (-s, id) }.take(10).zipWithIndex
        .map { case ((id, nt, s), i) => (qid, id, nt, s, i + 1L) }
    }.toSet
    val got = Search.bm25Search(spark, sf).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSet
    assert(got == expected,
      s"missing=${expected -- got} extra=${got -- expected}")
  }

  test("x16 highlight snippets center on the first matched query term") {
    val docs = corpus().toMap
    val hits = Search.matchSearch(spark, sf).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(4)))
    val terms = Search.matchQueries.groupBy(_._1)
      .view.mapValues(_.map(_._2)).toMap
    val expected = hits.map { case (qid, did, rank) =>
      val ws = docs(did)
      val fp = terms(qid).map(t => ws.indexOf(t)).filter(_ >= 0).min + 1L
      val start = math.max(fp - 2, 1L).toInt
      val snippet = ws.slice(start - 1, (fp + 2).toInt).mkString(" ")
      (qid, did, rank, fp, snippet)
    }.toSet
    val got = Search.highlight(spark, sf).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getString(4))).toSet
    assert(got == expected,
      s"missing=${expected -- got} extra=${got -- expected}")
  }

  test("x18 fuzzy: deletion neighborhood finds EVERY distance-1 term") {
    // brute-force truth: levenshtein against the whole vocabulary —
    // the SymSpell index must lose nothing at fuzziness 1
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1)((i, j) =>
        if (i == 0) j else if (j == 0) i else 0)
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    val vocab = graft.Tables.documents(spark, sf)
      .select(explode(Portable.tokens(col("text"))).as("t"))
      .groupBy("t").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val got = Search.fuzzySearch(spark, sf).collect()
      .map(r => (r.getInt(0), r.getString(2), r.getLong(3))).toSet
    for ((qid, qterm) <- Search.fuzzyQueries) {
      val truth = vocab.keys.filter(t => lev(qterm, t) <= 1).toSet
      val found = got.collect { case (q, t, _) if q == qid => t }
      // top-5 cap: only assert completeness when truth fits the cap
      if (truth.size <= 5)
        assert(found == truth, s"$qterm: found=$found truth=$truth")
      else assert(found.size == 5 && found.subsetOf(truth), s"$qterm")
      // distances reported are the true distances
      for ((q, t, d) <- got if q == qid)
        assert(d == lev(qterm, t), s"distance wrong for ($qterm, $t)")
    }
    assert(!got.exists(_._1 == 7), "the no-match query must return nothing")
  }

  test("x19 MLT: seeds never retrieve themselves; hits share a seed top term") {
    import spark.implicits._
    val got = Search.moreLikeThis(spark, sf).collect()
    assert(got.nonEmpty)
    for (r <- got)
      assert(r.getLong(0) != r.getLong(1), "a seed retrieved itself")
    // recompute each seed's top-term set brute-force and check every hit
    // contains at least one of them (n_terms >= 1 means a term matched,
    // but verify against independently derived seed terms)
    val toksByDoc = graft.Tables.documents(spark, sf)
      .select(col("doc_id"), graft.ext.Portable.tokens(col("text")).as("ws"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1).toSeq).toMap
    val nDocs = toksByDoc.size.toLong
    val tf = toksByDoc.toSeq.flatMap { case (d, ws) =>
      ws.groupBy(identity).map { case (t, o) => (d, t, o.size.toLong) } }
    val dfreq = tf.groupBy(_._2).map { case (t, rs) => t -> rs.size.toLong }
    val seedTop = (for (s <- Seq(0L, 1L, 2L, 3L)) yield {
      val terms = tf.filter(_._1 == s)
        .map { case (_, t, c) => (t, c * nDocs * 1000000L / dfreq(t)) }
        .sortBy { case (t, w) => (-w, t) }.take(5).map(_._1).toSet
      s -> terms
    }).toMap
    for (r <- got) {
      val shared = seedTop(r.getLong(0)).intersect(toksByDoc(r.getLong(1)).toSet)
      assert(shared.nonEmpty,
        s"hit ${r.getLong(1)} shares no top term with seed ${r.getLong(0)}")
      assert(r.getLong(2) <= 5, "n_terms exceeds the MLT term budget")
    }
  }

  test("x20 significant terms are genuinely overrepresented in their source") {
    val got = Search.significantTerms(spark, sf).collect()
    assert(got.nonEmpty)
    // brute-force rates from the raw corpus
    val rows = graft.Tables.documents(spark, sf)
      .select(col("source"), graft.ext.Portable.tokens(col("text")).as("ws"))
      .collect().map(r => r.getString(0) -> r.getSeq[String](1).toSeq)
    val bg = rows.flatMap(_._2).groupBy(identity).map { case (t, o) => t -> o.size.toLong }
    val tBg = rows.map(_._2.size.toLong).sum
    val bySource = rows.groupBy(_._1)
    for (r <- got) {
      val (src, term) = (r.getString(0), r.getString(1))
      val fgToks = bySource(src).flatMap(_._2)
      val tfFg = fgToks.count(_ == term).toLong
      assert(tfFg == r.getLong(2), s"tf_fg wrong for ($src, $term)")
      assert(bg(term) == r.getLong(3), s"tf_bg wrong for ($src, $term)")
      assert(tfFg >= 5, "min-count gate violated")
      val sig = tfFg * tBg * 1000000L / (bg(term) * fgToks.size.toLong)
      assert(sig == r.getLong(4), s"sig_micro wrong for ($src, $term)")
      // a top-10 significant term is at least as frequent in its source
      // as in the background (ratio >= 1 in micro units)
      assert(r.getLong(4) >= 1000000L,
        s"($src, $term) ranked significant but underrepresented")
    }
  }

  test("only the literal query frames broadcast; top-k is WindowGroupLimit") {
    // With auto-broadcast disabled, every BroadcastExchange in the plan
    // is an explicit hint — so the count must equal the hint sites on
    // the literal frames (x12: query set + one-row corpus count; x13:
    // phrase set), proving the corpus posting list itself shuffles.
    val key = "spark.sql.autoBroadcastJoinThreshold"
    val prev = spark.conf.get(key)
    spark.conf.set(key, "-1")
    try {
      val p12 = Search.matchSearch(spark, sf).queryExecution.executedPlan.toString
      val p13 = Search.phraseSearch(spark, sf).queryExecution.executedPlan.toString
      def nBroadcasts(p: String): Int =
        "BroadcastExchange".r.findAllIn(p).size
      assert(nBroadcasts(p12) == 2, s"x12 broadcasts != 2:\n$p12")
      assert(nBroadcasts(p13) == 1, s"x13 broadcasts != 1:\n$p13")
      assert(p12.contains("WindowGroupLimit"), s"x12 top-k not limited:\n$p12")
      assert(p13.contains("WindowGroupLimit"), s"x13 top-k not limited:\n$p13")
      // x16 = x12's two hints + the bounded hit×term probe frame; the
      // corpus token-array side must stay on the streamed side
      val p16 = Search.highlight(spark, sf).queryExecution.executedPlan.toString
      assert(nBroadcasts(p16) == 3, s"x16 broadcasts != 3:\n$p16")
    } finally spark.conf.set(key, prev)
  }

  test("x24 proximity equals brute-force min-gap; no positions cross join") {
    val docsArr = graft.Tables.documents(spark, sf)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).split(" "))
    val expected = (for {
      (qid, t0, t1) <- Search.proximityQueries
      (id, ws) <- docsArr
      p0 = ws.zipWithIndex.collect { case (w, i) if w == t0 => i.toLong }
      p1 = ws.zipWithIndex.collect { case (w, i) if w == t1 => i.toLong }
      if p0.nonEmpty && p1.nonEmpty
      gap = (for (a <- p0; b <- p1) yield math.abs(a - b)).min
      if gap <= 3
    } yield (qid, id) -> gap).toMap
    val df = Search.proximitySearch(spark, sf)
    val got = df.collect()
      .map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(got == expected,
      s"missing=${(expected.keySet -- got.keySet).take(5)} " +
        s"extra=${(got.keySet -- expected.keySet).take(5)}")
    assert(expected.nonEmpty, "no proximity hits — test is vacuous")
    // the linear formulation: no nested-loop/cartesian position pairing
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"positions pair quadratically:\n$p")
  }

  test("x23 fuzzy name join equals the brute-force distance-1 self-join") {
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1)(i => Array.tabulate(b.length + 1) {
        j => if (i == 0) j else if (j == 0) i else 0
      })
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    val names = graft.Tables.customer(spark, sf)
      .select("c_name").distinct().collect().map(_.getString(0))
    val expect = (for {
      a <- names; b <- names
      if a < b && lev(a, b) == 1
    } yield (a, b)).toSet
    val got = Search.fuzzyNameJoin(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    assert(got == expect,
      s"missing=${(expect -- got).take(5)} extra=${(got -- expect).take(5)}")
    assert(expect.nonEmpty, "no distance-1 name pairs — test is vacuous")
  }

  test("x30 percolation equals the conjunctive driver fold; silence is proven") {
    val got = Search.percolate(spark, sf).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSet
    val byQ = Search.savedSearches.groupBy(_._1)
      .map { case (q, ts) => q -> ts.map(_._2).toSet }
    val docs = graft.Tables.documents(spark, sf)
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1).split(" ", -1).toSet))
    val expect = docs.flatMap { case (id, toks) =>
      byQ.filter { case (_, ts) => ts.subsetOf(toks) }
        .map { case (q, ts) => (q, id, ts.size.toLong) }
    }.toSet
    assert(got == expect,
      s"missing=${(expect -- got).take(5)} extra=${(got -- expect).take(5)}")
    // mixed outcomes or the registry proves nothing: some query fires,
    // the out-of-vocabulary one never does, and some doc alerts nobody
    assert(got.nonEmpty, "no alerts — vacuous registry")
    assert(!got.exists(_._1 == 4), "the never-matching saved search fired")
    assert(docs.exists { case (id, _) => !got.exists(_._2 == id) },
      "every document alerts — conjunction proves nothing")
  }

  test("x31 trigram-indexed regex equals brute regex; prefilter necessary") {
    val docs = graft.Tables.documents(spark, sf)
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val rx = Search.RegexPattern.r
    val brute = docs.map { case (id, t) => id -> rx.findAllIn(t).size.toLong }
      .filter(_._2 > 0).toMap
    val got = Search.trigramRegex(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got == brute,
      s"missing=${(brute.keySet -- got.keySet).take(5)} " +
        s"extra=${(got.keySet -- brute.keySet).take(5)}")
    assert(brute.nonEmpty, "no regex matches in the corpus — vacuous")
    // the literal-containment argument the prefilter rests on: every
    // matching document contains every required literal verbatim
    for ((id, _) <- brute) {
      val t = docs.find(_._1 == id).get._2
      Search.RegexLiterals.foreach(l =>
        assert(t.contains(l), s"doc $id matches without literal '$l'"))
    }
    // and the index actually prunes: some document lacks a needed trigram
    val needed = Search.RegexLiterals.flatMap(Search.trigramsOf).distinct
    assert(docs.exists { case (_, t) => !needed.forall(t.contains) },
      "every document is a candidate — the prefilter proves nothing")
  }

  test("x32 autocomplete equals the brute vocabulary fold; ranks dense") {
    val vocab = graft.Tables.documents(spark, sf)
      .select("doc_id", "text").collect()
      .flatMap(r => r.getString(1).split(" ").groupBy(identity)
        .map { case (t, xs) => (t, xs.length.toLong) })
      .groupBy(_._1)
      .map { case (t, xs) => (t, xs.length.toLong, xs.map(_._2).sum) }
    val brute = Search.typedPrefixes.flatMap { p =>
      vocab.filter(_._1.startsWith(p)).toSeq
        .sortBy { case (t, df, _) => (-df, t) }.take(4).zipWithIndex
        .map { case ((t, df, cf), i) => (p, i + 1L, t, df, cf) }
    }.toSet
    val got = Search.autocomplete(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2),
        r.getLong(3), r.getLong(4))).toSet
    assert(got == brute,
      s"missing=${(brute -- got).take(3)} extra=${(got -- brute).take(3)}")
    // every typed prefix completes, and at least one is rank-limited
    // (more candidates than the page size — the top-8 actually cuts)
    Search.typedPrefixes.foreach(p =>
      assert(got.exists(_._1 == p), s"prefix '$p' has no completion"))
    assert(Search.typedPrefixes.exists(p =>
      vocab.count(_._1.startsWith(p)) > 4),
      "no prefix exceeds the page size — the rank cut proves nothing")
  }
}
