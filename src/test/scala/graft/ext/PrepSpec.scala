package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Invariants of the preparation operators: masking completeness, packing
  * geometry, chunk reassembly, contamination symmetry.
  */
class PrepSpec extends SparkSpec {

  test("c21 funnel chains exactly and matches a driver-side rule recount") {
    val rows = Prep.gopherRules(spark, sf)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(_._1)
    assert(rows.map(_._1).toSeq == Seq("r1_word_count", "r2_mean_word_len",
      "r3_short_token_frac", "r4_distinct_frac", "r5_stopword_coverage"))
    // funnel algebra: fail + pass = checked; next stage checks the passers
    rows.foreach { case (_, in, fail, pass) => assert(in == fail + pass) }
    rows.sliding(2).foreach { case Array((_, _, _, p), (_, in2, _, _)) =>
      assert(p == in2)
    }
    // driver recount of the five predicates
    val docs = graft.Tables.documents(spark, sf)
      .select("text").collect().map(_.getString(0).split(" ").toSeq)
    val preds: Seq[Seq[String] => Boolean] = Seq(
      t => t.length >= 32 && t.length <= 100000,
      t => { val s = t.map(_.length.toLong).sum; val n = t.length.toLong
             s * 10 >= n * 40 && s <= n * 10 },
      t => t.count(_.length <= 2).toLong * 10 <= t.length.toLong,
      t => t.distinct.length.toLong * 5 >= t.length.toLong * 2,
      t => t.count(w => w == "a" || w == "the") >= 2)
    val expect = (1 to 5).map { i =>
      docs.count(t => preds.take(i).forall(_(t))).toLong
    }
    assert(rows.map(_._4).toSeq == expect)
    assert(rows.head._2 == docs.length.toLong)
  }

  test("pii scrub leaves no digit in the masked name; pseudonym is stable") {
    val out = Prep.piiScrub(spark, sf)
    assert(out.filter(col("name_masked").rlike("[0-9]")).count() == 0)
    // deterministic: same input -> same pseudonym on recompute
    val a = out.select("c_custkey", "name_pseudo").collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val b = Prep.piiScrub(spark, sf).select("c_custkey", "name_pseudo")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(a == b)
  }

  test("seq packing: offsets are the exclusive prefix sum in doc_id order") {
    val rows = Prep.seqPack(spark, sf)
      .select("doc_id", "n_tokens", "offset", "first_seq", "last_seq")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).sortBy(_._1)
    var expected = 0L
    rows.foreach { case (_, n, off, first, last) =>
      assert(off == expected, "offset must be contiguous — packing leaves no gap")
      assert(first == off / 512 && last == (off + n - 1) / 512)
      expected += n
    }
  }

  test("chunks: sizes sum to the doc token count; all full but the last") {
    val byDoc = Prep.chunks(spark, sf)
      .groupBy("doc_id").agg(sum("n_tokens").as("total"),
        count(lit(1)).as("n_chunks"), max("chunk_id").as("max_chunk"))
    val docs = graft.Tables.documents(spark, sf)
      .select(col("doc_id"), size(split(col("text"), " ")).cast("long").as("n"))
    val joined = byDoc.join(docs, "doc_id")
    assert(joined.filter(col("total") =!= col("n")).count() == 0,
      "chunk sizes must reassemble the document")
    assert(joined.filter(col("n_chunks") =!= col("max_chunk") + 1).count() == 0,
      "chunk ids must be dense from 0")
    // every chunk except a doc's last is exactly 32 tokens
    val sized = Prep.chunks(spark, sf).join(
      byDoc.select(col("doc_id"), col("max_chunk")), "doc_id")
    assert(sized.filter(col("chunk_id") < col("max_chunk") &&
      col("n_tokens") =!= 32).count() == 0)
  }

  test("contamination: only train docs appear, and hits are real shingle overlaps") {
    val out = Prep.contamination(spark, sf)
    assert(out.filter(col("doc_id") % 97 === 0).count() == 0,
      "held-out docs must not appear as contaminated train docs")
    assert(out.filter(col("n_shared_shingles") < 1 ||
      col("n_test_docs") < 1).count() == 0)
  }

  test("bpe pairs: every pair is two chars and counts are descending") {
    val rows = Prep.bpePairs(spark, sf).collect()
    assert(rows.nonEmpty && rows.length <= 20)
    assert(rows.forall(_.getString(0).length == 2))
    val counts = rows.map(_.getLong(1))
    assert(counts.zip(counts.tail).forall { case (a, b) => a >= b })
  }

  test("c10 BPE trainer equals a sequential in-memory trainer (repeat stress)") {
    import spark.implicits._
    // "aaaa" forces the greedy-overlap rule: (a,a) merges to [aa,aa],
    // and a later (aa,aa) merge is then possible — the case a naive
    // pairwise replace gets wrong
    val corpus = Seq.fill(8)("aaaa") ++ Seq.fill(6)("aab") ++
      Seq.fill(5)("banana") ++ Seq.fill(3)("band") ++ Seq.fill(2)("ana")
    def sequentialBpe(toks: Seq[String], n: Int): Seq[(Int, String, String, Long)] = {
      var vocab: Map[Seq[String], Long] = toks.groupBy(identity)
        .map { case (t, o) => t.map(_.toString) -> o.size.toLong }
      val out = Seq.newBuilder[(Int, String, String, Long)]
      for (step <- 1 to n) {
        val counts = scala.collection.mutable.Map.empty[(String, String), Long]
        for ((syms, f) <- vocab; p <- syms.zip(syms.drop(1)))
          counts(p) = counts.getOrElse(p, 0L) + f
        val ((l, r), c) = counts.toSeq.minBy { case ((a, b), m) => (-m, s"$a $b") }
        out += ((step, l, r, c))
        vocab = vocab.map { case (syms, f) =>
          val acc = scala.collection.mutable.ArrayBuffer.empty[String]
          for (s <- syms) {
            if (acc.nonEmpty && acc.last == l && s == r) acc(acc.size - 1) = l + r
            else acc += s
          }
          acc.toSeq -> f
        }.groupBy(_._1).map { case (k, vs) => k -> vs.values.sum }
      }
      out.result()
    }
    val expect = sequentialBpe(corpus, 5)
    val got = Prep.bpeTrainOn(corpus.toDF("t"), 5).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(4))).toSeq
    assert(got == expect, s"merge tables differ:\n got   $got\n expect $expect")
    // the stress property itself: (a,a) must merge first, and the
    // resulting "aa" symbol must later merge with ITSELF — the chain a
    // naive pairwise replace breaks ("aaaa" -> [aa,aa] -> [aaaa])
    assert((expect.head._2, expect.head._3) == ("a", "a"), s"$expect")
    assert(expect.exists(m => m._2 == "aa" && m._3 == "aa"),
      s"repeat-merge chain broken: $expect")
  }

  test("c12 encode: per-doc budgets equal a sequential apply of the merge table") {
    val merges = Prep.bpeTrainOn(graft.Tables.documents(spark, sf)
      .select(org.apache.spark.sql.functions.explode(
        Portable.tokens(org.apache.spark.sql.functions.col("text"))).as("t")), 6)
      .collect().sortBy(_.getInt(0))
      .map(r => (r.getString(1), r.getString(2)))
    def encodeLen(tok: String): Long = {
      var syms: Seq[String] = tok.map(_.toString)
      for ((l, r) <- merges) {
        val acc = scala.collection.mutable.ArrayBuffer.empty[String]
        for (s <- syms) {
          if (acc.nonEmpty && acc.last == l && s == r) acc(acc.size - 1) = l + r
          else acc += s
        }
        syms = acc.toSeq
      }
      syms.size.toLong
    }
    val expected = graft.Tables.documents(spark, sf)
      .select("doc_id", "text").collect().map { row =>
        val toks = row.getString(1).split(" ", -1).toSeq
        (row.getLong(0), (toks.size.toLong, toks.map(encodeLen).sum,
          toks.map(_.length.toLong).sum))
      }.toMap
    val got = Prep.bpeEncode(spark, sf).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got == expected,
      s"diff=${(expected.toSet -- got.toSet).take(3)} / ${(got.toSet -- expected.toSet).take(3)}")
    // encode is a real compression: fewer units than chars, at least one
    // unit per word
    assert(got.values.forall { case (w, u, c) => u <= c && u >= w })
  }

  test("c9 span scrub: cuts exactly the spans, keeps order, keeps empty docs") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val run = (0 until 12).map(i => s"dup$i").mkString(" ")
    def noise(tag: String, n: Int) = (0 until n).map(i => s"$tag$i").mkString(" ")
    val docs = Seq(
      1L -> s"$run ${noise("a", 10)}",  // shared run + unique tail
      2L -> s"${noise("b", 4)} $run",   // unique head + shared run
      3L -> run,                        // ENTIRELY the shared run
      4L -> noise("c", 6))              // no duplication at all
      .toDF("doc_id", "text")
    val th = docs
      .select(col("doc_id"),
        posexplode(Portable.tokens(col("text"))).as(Seq("pos", "tok")))
      .select(col("doc_id"), col("pos"), Portable.tokenHash(col("tok")).as("h"))
    val byId = Prep.spanScrubOf(docs, Dedup.substringSpansOf(th))
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap
    assert(byId(1L) == (noise("a", 10), 12L), s"doc1: ${byId(1L)}")
    assert(byId(2L) == (noise("b", 4), 12L), s"doc2: ${byId(2L)}")
    assert(byId(3L) == ("", 12L), "fully-duplicated doc must stay as an empty row")
    assert(byId(4L) == (noise("c", 6), 0L), "untouched doc must pass through")
  }

  test("quality gate: kept == no flag set; flags agree with their sources") {
    val rows = Prep.qualityGate(spark, sf).collect()
      .map(r => r.getLong(0) ->
        ((r.getBoolean(1), r.getBoolean(2), r.getBoolean(3), r.getBoolean(4), r.getBoolean(5))))
      .toMap
    assert(rows.nonEmpty)
    for ((_, (short, lowq, contam, dup, kept)) <- rows)
      assert(kept == !(short || lowq || contam || dup))
    // the contaminated flag set is exactly the set c6 removes
    val c6Kept = Prep.decontaminated(spark, sf)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val contamIds = rows.collect { case (id, (_, _, true, _, _)) => id }.toSet
    assert(contamIds == rows.keySet -- c6Kept,
      "contaminated flags disagree with the c6 removal set")
  }

  test("c17 l-diversity agrees with c14 group sizes; verdicts follow l") {
    val ld = Prep.lDiversity(spark, sf).collect()
      .map(r => ((r.getString(0), r.getString(1)),
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getBoolean(5)))).toMap
    // same quasi-identifier grain as c14: group sizes must agree
    val ka = Prep.kAnonymity(spark, sf).collect()
      .map(r => ((r.getString(1), r.getString(2)), r.getLong(3)))
      .groupBy(_._1).map { case (g, xs) => g -> xs.head._2 }
    assert(ld.keySet == ka.keySet, "c14/c17 disagree on the group set")
    assert(ld.forall { case (g, (n, _, _, _)) => n == ka(g) },
      "group_n diverges from the c14 window count")
    for ((g, (n, l, lim, d)) <- ld) {
      assert(l >= 1L && l <= n, s"$g: l_distinct out of range")
      assert(d == (l >= lim), s"$g: verdict inconsistent")
    }
    // non-trivial verdict mix (data-measured, not DDL-restated)
    assert(ld.values.exists(_._4) , "no diverse group")
  }

  test("c18 fertility: per-lang totals reconcile with c12's per-doc budgets") {
    val byLang = Prep.tokenizerFertility(spark, sf).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))).toMap
    assert(byLang.keySet == Set("en", "de", "fr", "es", "zh"))
    for ((lang, (w, u, c, f, cpu)) <- byLang) {
      // a word is >= 1 unit, a unit >= 1 char: both ratios have hard floors
      assert(u >= w && c >= u, s"$lang: impossible budgets")
      assert(f == (BigInt(u) * 1000000 / BigInt(w)).toLong, s"$lang fertility")
      assert(cpu == (BigInt(c) * 1000000 / BigInt(u)).toLong, s"$lang chars/unit")
      assert(f >= 1000000L)
    }
    // the metric measures the languages, not the formula
    assert(byLang.values.map(_._4).toSeq.distinct.length >= 2,
      "fertility identical across languages — vacuous")
    // same vocab, different rollup grain: lang totals == c12's doc totals
    val docTotals = Prep.bpeEncode(spark, sf)
      .agg(org.apache.spark.sql.functions.sum("n_words"),
        org.apache.spark.sql.functions.sum("n_bpe_units"),
        org.apache.spark.sql.functions.sum("n_chars")).collect().head
    assert((byLang.values.map(_._1).sum, byLang.values.map(_._2).sum,
      byLang.values.map(_._3).sum) ==
      ((docTotals.getLong(0), docTotals.getLong(1), docTotals.getLong(2))),
      "lang-grain and doc-grain budgets diverge")
  }

  test("c19 importance weights equal a driver fold; the mask selects a real subset") {
    val got = Prep.importanceWeights(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getBoolean(4))).sortBy(_._1)
    // driver fold under the declared policy: add-1 ppb models over the
    // shared vocabulary, linearized ratio in ppm, count-weighted sum
    val docs = graft.Tables.documents(spark, sf)
      .select("doc_id", "source", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    val toks = docs.map { case (id, src, t) => (id, src, t.split(" ", -1).toSeq) }
    val isT = (s: String) => s == Prep.DsirTargetSource
    val cntT = scala.collection.mutable.Map.empty[String, Long].withDefaultValue(0L)
    val cntC = scala.collection.mutable.Map.empty[String, Long].withDefaultValue(0L)
    toks.foreach { case (_, src, ws) =>
      ws.foreach(w => if (isT(src)) cntT(w) += 1 else cntC(w) += 1)
    }
    val vocab = (cntT.keySet ++ cntC.keySet).toSeq
    val (nT, nC, v) = (cntT.values.sum, cntC.values.sum, vocab.length.toLong)
    val rPpm = vocab.map { w =>
      val pT = (cntT(w) + 1) * Prep.DsirPpb / (nT + v)
      val pC = math.max((cntC(w) + 1) * Prep.DsirPpb / (nC + v), 1L)
      w -> (pT * Prep.DsirPpm / pC - Prep.DsirPpm)
    }.toMap
    val expected = toks.map { case (id, src, ws) =>
      val llr = ws.map(rPpm).sum
      (id, src, ws.length.toLong, llr, llr >= 0L)
    }.sortBy(_._1).toSeq
    assert(got.toSeq == expected,
      s"importance diverges:\n got=${got.take(3).toSeq}\n exp=${expected.take(3)}")
    // the resampling mask must cut, not rubber-stamp
    val nSel = got.count(_._5)
    assert(nSel > 0 && nSel < got.length, s"vacuous mask: $nSel/${got.length}")
    // vocabulary stats must never broadcast (it grows with the corpus);
    // the only broadcast join allowed is the one-row totals frame
    val p = Prep.importanceWeights(spark, sf).queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct"), s"cartesian in c19:\n$p")
  }

  test("c20 t-closeness equals a driver EMD fold; the threshold splits groups") {
    val got = Prep.tCloseness(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getBoolean(5))).sortBy(x => (x._1, x._2))
    val rows = graft.Tables.documents(spark, sf)
      .select(col("lang"), col("source"), expr("n_chars DIV 100").as("cls"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    val classes = rows.map(_._3).distinct.sorted
    val t = rows.length.toLong
    val tCnt = rows.groupBy(_._3).map { case (c, xs) => c -> xs.length.toLong }
    val m = classes.length.toLong
    val expected = rows.groupBy(x => (x._1, x._2)).map { case ((lang, src), xs) =>
      val g = xs.length.toLong
      val gCnt = xs.groupBy(_._3).map { case (c, ys) => c -> ys.length.toLong }
      var cumG = BigInt(0); var cumT = BigInt(0); var num = BigInt(0)
      for (c <- classes) {
        cumG += BigInt(gCnt.getOrElse(c, 0L)); cumT += BigInt(tCnt(c))
        num += (cumG * t - cumT * g).abs
      }
      val emd = (num * 1000000 / (BigInt(g) * t * math.max(m - 1, 1L))).toLong
      (lang, src, g, emd, Prep.TClosenessPpm, emd <= Prep.TClosenessPpm)
    }.toSeq.sortBy(x => (x._1, x._2))
    assert(got.toSeq == expected,
      s"EMD diverges:\n got=${got.take(3).toSeq}\n exp=${expected.take(3)}")
    // the audit must separate groups, not rubber-stamp the corpus
    assert(got.exists(_._6) && got.exists(!_._6),
      s"vacuous verdict: ${got.count(_._6)}/${got.length} close")
  }

  test("c22 classifier equals a driver fold; both classes present; zero shuffles") {
    import graft.ext.Portable.{tokenHashOf, P}
    def wOf(salt: String, bucketBase: Long): Long =
      tokenHashOf(salt + (bucketBase % Prep.QcBuckets).toString) %
        Prep.QcLevels
    val expected = graft.Tables.documents(spark, sf)
      .select(col("doc_id"), col("source"), col("text")).collect()
      .map { r =>
        val hs = r.getString(2).split(" ", -1) // split keeps empty tokens
          .map(tokenHashOf)
        val nF = hs.length + math.max(hs.length - 1, 0)
        // bigram bucket COMPOSES the token hashes (fastText n-gram trick)
        val s = hs.map(wOf("qw:", _)).sum +
          hs.sliding(2).filter(_.length == 2)
            .map(p => wOf("qb:", (p(0) * 31L + p(1)) % P)).sum
        val score = s * 1000000L / math.max(nF, 1) - Prep.QcShift * 1000000L
        (r.getLong(0), (r.getString(1), nF.toLong, score, score >= 0L))
      }.toMap
    val q = Prep.qualityClassifier(spark, sf)
    val got = q.collect()
      .map(r => (r.getLong(0), (r.getString(1), r.getLong(2), r.getLong(3),
        r.getBoolean(4)))).toMap
    assert(got == expected,
      s"diverges on ${got.keys.filter(k => got(k) != expected(k)).take(3)}")
    // a classifier that keeps (or drops) everything separates nothing
    assert(got.values.exists(_._4) && got.values.exists(!_._4),
      s"vacuous: ${got.values.count(_._4)}/${got.size} kept")
    // the 100 TB contract: scoring is a pure scan — no Exchange anywhere
    val plan = q.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"c22 shuffles:\n$plan")
  }

  test("c24 calibration equals a driver fold; ROC monotone; AUC in range") {
    import graft.ext.Portable.{tokenHashOf, P}
    def wOf(salt: String, bucketBase: Long): Long =
      tokenHashOf(salt + (bucketBase % Prep.QcBuckets).toString) %
        Prep.QcLevels
    val docs = graft.Tables.documents(spark, sf)
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val perDoc = docs.map { case (_, text) =>
      val toks = text.split(" ", -1)
      val hs = toks.map(tokenHashOf)
      val nF = hs.length + math.max(hs.length - 1, 0)
      val s = hs.map(wOf("qw:", _)).sum +
        hs.sliding(2).filter(_.length == 2)
          .map(p => wOf("qb:", (p(0) * 31L + p(1)) % P)).sum
      val score = s * 1000000L / math.max(nF, 1) - Prep.QcShift * 1000000L
      val n = toks.length.toLong
      val totlen = toks.map(_.length.toLong).sum
      val pass = n >= 32L && n <= 100000L &&
        totlen * 10L >= n * 40L && totlen <= n * 10L &&
        toks.count(_.length <= 2) * 10L <= n &&
        toks.distinct.length * 5L >= n * 2L &&
        toks.count(t => t == "a" || t == "the") >= 2L
      val bin = (score + Prep.QcShift * 1000000L) / Prep.QcBinMicros
      (bin, pass)
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
    val expected = bins.reverse.map { case (b, n, p) =>
      cumN += n; cumP += p
      b -> ((n, p, cumP * 1000000L / math.max(totPos, 1L),
        (cumN - cumP) * 1000000L / math.max(totNeg, 1L),
        p * (2L * ascNeg(b) + (n - p))))
    }.toMap
    val got = Prep.qualityCalibration(spark, sf).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))).toMap
    assert(got == expected,
      s"diverges on ${got.keys.filter(k => got.get(k) != expected.get(k)).take(3)}")
    // the reference label must split the corpus, else the audit is vacuous
    assert(totPos > 0L && totNeg > 0L, s"degenerate labels: $totPos/$totNeg")
    // ROC prefixes are monotone in threshold (descending bin order)
    val byBinDesc = got.toSeq.sortBy(-_._1).map(_._2)
    assert(byBinDesc.map(_._3) == byBinDesc.map(_._3).sorted,
      "TPR not monotone")
    assert(byBinDesc.map(_._4) == byBinDesc.map(_._4).sorted,
      "FPR not monotone")
    // AUC from the u2 contributions lands in [0, 1]
    val auc2 = got.values.map(_._5).sum
    assert(auc2 >= 0L && auc2 <= 2L * totPos * totNeg,
      s"AUC out of range: $auc2 / ${2L * totPos * totNeg}")
  }

  test("c23 topic mix equals a driver fold; topics separate; shares partition") {
    import graft.ext.Portable
    import Portable.tokenHashOf
    val docs = graft.Tables.documents(spark, sf)
      .select(col("source"), col("text")).collect()
      .map(r => (r.getString(0), r.getString(1)))
    val perDoc = docs.map { case (src, text) =>
      val toks = text.split(" ", -1)
      val scores = Array.fill(Prep.Topics)(0L)
      for (t <- toks) {
        val base = tokenHashOf(
          "qw:" + (tokenHashOf(t) % Prep.QcBuckets).toString)
        for (k <- 0 until Prep.Topics)
          scores(k) += (Portable.A(k) * base + Portable.B(k)) %
            Portable.P % Prep.QcLevels
      }
      (src, scores.indexOf(scores.max).toLong) // first max = smallest head
    }
    val counts = perDoc.groupBy(identity).view.mapValues(_.length.toLong)
    val srcTotals = perDoc.groupBy(_._1).view.mapValues(_.length.toLong)
    val expected = counts.map { case ((src, topic), n) =>
      (src, topic) -> ((n, n * 1000000L / srcTotals(src)))
    }.toMap
    val got = Prep.topicMix(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3)))).toMap
    assert(got == expected,
      s"diverges on ${got.keys.filter(k => got.get(k) != expected.get(k)).take(3)}")
    // the classifier must separate topics, and shares must partition each
    // source (floor rounding loses < Topics ppm)
    assert(got.keys.map(_._2).toSet.size > 1, "every doc got one topic")
    got.keys.map(_._1).toSet.foreach { (src: String) =>
      val tot = got.collect { case ((s, _), (_, sh)) if s == src => sh }.sum
      assert(tot <= 1000000L && tot > 1000000L - Prep.Topics, s"$src: $tot")
    }
  }
}
