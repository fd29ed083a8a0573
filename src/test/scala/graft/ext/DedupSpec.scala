package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Semantic + plan checks for the dedup family. The DuckDB oracle already
  * pins exact values at sf0.01; these tests pin the *meaning* (LSH output
  * is a subset of the brute-force truth, thresholds hold, recall is sane)
  * and the plan shapes that must survive scale-up.
  */
class DedupSpec extends SparkSpec {

  private def bruteJaccardPairs(minJac: Double): Set[(Long, Long)] = {
    val d = graft.Tables.documents(spark, sf)
      .select(col("doc_id"), array_distinct(split(col("text"), " ")).as("toks"))
    val a = d.select(col("doc_id").as("i"), col("toks").as("ta"))
    val b = d.select(col("doc_id").as("j"), col("toks").as("tb"))
    a.crossJoin(b).filter(col("i") < col("j"))
      .withColumn("inter", size(array_intersect(col("ta"), col("tb"))).cast("double"))
      .withColumn("jac", col("inter") / (size(col("ta")) + size(col("tb")) - col("inter")))
      .filter(col("jac") >= minJac)
      .select("i", "j").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
  }

  test("d22 chunk dedup equals a driver-side first-occurrence recount") {
    val src = graft.Tables.documents(spark, sf)
      .select("doc_id", "source").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val ch = Prep.chunks(spark, sf)
      .select("doc_id", "chunk_id", "n_tokens", "chunk_fp").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // First occurrence in (doc_id, chunk_id) order wins, per (fp, len) key.
    val firstOf = ch.groupBy(c => (c._4, c._3))
      .map { case (k, cs) => k -> cs.map(c => (c._1, c._2)).min }
    val expect = ch.groupBy(c => src(c._1)).map { case (s, cs) =>
      val retained = cs.filter(c => firstOf((c._4, c._3)) == ((c._1, c._2)))
      s -> (cs.length.toLong, retained.length.toLong,
        cs.map(_._3).sum, retained.map(_._3).sum)
    }
    val got = Dedup.chunkDedup(spark, sf).collect().map { r =>
      r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
    }.toMap
    assert(got == expect)
    // Non-vacuity: chunk-grain dedup must actually drop something here
    // (doc-grain near-dups share chunks), but never everything.
    val (tot, ret) = (got.values.map(_._1).sum, got.values.map(_._2).sum)
    assert(ret < tot && ret > 0)
  }

  test("exact dedup groups identical texts under the min doc_id") {
    import spark.implicits._
    val df = Seq((10L, "x y z"), (3L, "x y z"), (7L, "other text"))
      .toDF("doc_id", "text")
    val out = df.groupBy(md5(col("text")).as("text_md5"))
      .agg(min("doc_id").as("canonical_doc_id"), count(lit(1)).as("n_copies"))
      .collect().map(r => (r.getLong(1), r.getLong(2))).toSet
    assert(out == Set((3L, 2L), (7L, 1L)))
  }

  test("minhash-LSH finds only true near-dups and most of the closest") {
    val found = Dedup.minhashLsh(spark, sf).select("doc_a", "doc_b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val truth090 = bruteJaccardPairs(0.9)
    val truth095 = bruteJaccardPairs(0.95)
    assert(found.subsetOf(truth090), "LSH emitted a pair below the threshold")
    val recall =
      if (truth095.isEmpty) 1.0
      else truth095.count(found.contains).toDouble / truth095.size
    assert(recall >= 0.5, s"LSH recall on jac>=0.95 pairs too low: $recall")
  }

  test("d25 LSH recall eval recomputes from brute truth; reports a crafted miss") {
    import graft.ext.Portable.tokenHashOf
    // brute truth over the REAL corpus, driver-side: probes are the
    // LshProbeCount lowest-hash doc ids, partners at token-Jaccard >= 0.9
    val probeIds = graft.Tables.documents(spark, sf)
      .select("doc_id").collect().map(_.getLong(0))
      .sortBy(id => (tokenHashOf(id.toString), id))
      .take(Dedup.LshProbeCount).toSet
    val truth = bruteJaccardPairs(0.9)
      .flatMap { case (a, b) => Seq((a, b), (b, a)) }
      .filter { case (p, _) => probeIds.contains(p) }
      .groupBy(_._1).map { case (p, xs) => p -> xs.map(_._2).toSet }
    val found = Dedup.minhashLsh(spark, sf).select("doc_a", "doc_b")
      .collect().flatMap(r => Seq((r.getLong(0), r.getLong(1)),
        (r.getLong(1), r.getLong(0)))).groupBy(_._1)
      .map { case (p, xs) => p -> xs.map(_._2).toSet }
    val eval = Dedup.lshRecallEval(spark, sf).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(eval.keySet == truth.keySet, "probe set diverged from brute truth")
    for ((p, (nT, nF, ppm)) <- eval) {
      assert(nT == truth(p).size, s"probe $p: n_truth")
      val hits = truth(p).count(found.getOrElse(p, Set.empty))
      assert(nF == hits, s"probe $p: n_found $nF != $hits")
      assert(ppm == hits * 1000000L / nT, s"probe $p: ppm arithmetic")
    }
    // crafted corpus through the injectable form: the index "lost" one
    // true pair — the eval must report exactly that miss, counting hits
    // from either pair orientation (3 docs <= LshProbeCount, so every
    // doc is a probe)
    import spark.implicits._
    val probeId = 1L
    val t = (1L to 20L).map(i => tokenHashOf(s"w$i")).sorted
    val sk = Seq((probeId, t), (probeId + 1000, t), (probeId + 2000, t))
      .toDF("doc_id", "toks")
    val pairs = Seq((probeId + 1000, probeId)) // one found (reversed), one lost
      .toDF("doc_a", "doc_b")
    val r = Dedup.lshRecallEvalOn(sk, pairs).collect()
      .map(x => x.getLong(0) -> ((x.getLong(1), x.getLong(2), x.getLong(3)))).toMap
    assert(r(probeId) == ((2L, 1L, 500000L)),
      s"crafted miss not reported: ${r.get(probeId)}")
  }

  test("d26 band occupancy: audit arithmetic on known occupancy + real-corpus sanity") {
    import spark.implicits._
    // crafted: 3 sketch rows where band 0 has keys (7,7,9) and band 1
    // has (5,5,5) — so band 0: 2 keys, max 2, bound C(2,2)=1; band 1:
    // 1 key, max 3, bound C(3,2)=3
    val sk = Seq((1L, 7L, 5L), (2L, 7L, 5L), (3L, 9L, 5L))
      .toDF("doc_id", "bk0", "bk1")
    val got = Dedup.bandOccupancyOf(sk, 2).collect()
      .map(r => r.getInt(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(got(0) == ((2L, 2L, 1L)), s"band 0 audit wrong: ${got.get(0)}")
    assert(got(1) == ((1L, 3L, 3L)), s"band 1 audit wrong: ${got.get(1)}")
    // real corpus: one row per band; every confirmed d3 pair collided
    // in SOME band, so the total bound dominates the confirmed count
    val real = Dedup.bandOccupancy(spark, sf).collect()
    assert(real.length == Dedup.LshBands)
    val bound = real.map(_.getLong(3)).sum
    assert(bound >= Dedup.minhashLsh(spark, sf).count(),
      "candidate bound cannot be below the confirmed pair count")
  }

  test("d3 hot-band-key cap binds on a >cap family: chain pairs, closure unchanged") {
    import spark.implicits._
    // A crafted family LARGER than the production cap, all exact copies
    // (same text => same key in every band => every band's key is hot),
    // plus a 2-copy family (far below cap => all-pairs arm) and a loner.
    val n = (Dedup.HotBandKeyCap + 1).toInt
    val docs = ((0 until n).map(i => (i.toLong, "alpha beta gamma")) ++
      Seq((900000L, "one two three four"), (900001L, "one two three four"),
        (950000L, "totally unrelated loner text"))).toDF("doc_id", "text")
    val sk = Dedup.sketchOf(docs).localCheckpoint()
    // the d26 gate sees the hub before any build pays for it
    val occ = Dedup.bandOccupancyOf(sk, Dedup.LshBands)
      .select("band", "max_key_members").collect()
    assert(occ.length == Dedup.LshBands &&
      occ.forall(_.getLong(1) == n.toLong),
      "crafted family must be the hottest key of every band")
    val capped = Dedup.lshPairsOf(sk, Some(Dedup.HotBandKeyCap))
      .localCheckpoint()
    // STAR shape: the hub family emits exactly n-1 pairs rooted at its
    // minimum doc_id (claimed by band 0; bands 1-7's stars are
    // exclusivity-filtered), the 2-copy family exactly 1, so the cap
    // cuts C(n,2)+1 to n. A star and NOT a consecutive-pair chain: the
    // chain version of this very test left minLabelClusters' linear
    // path contraction 4 046 hops short of its fixpoint at 50 rounds.
    val cappedPairs = capped.select("doc_a", "doc_b").as[(Long, Long)]
      .collect().toSet
    val star = (1 until n).map(i => (0L, i.toLong)).toSet
    assert(cappedPairs == star + ((900000L, 900001L)),
      s"expected star + small pair, got ${cappedPairs.size} pairs")
    // every star edge is an exact copy => jac 1.0 survives the confirm
    assert(capped.filter(col("jac") < 1.0).isEmpty)
    // LABEL CLOSURE identical with and without the cap — connectivity
    // is the cap's contract. The uncapped arm really pays C(n,2).
    val ids = docs.select("doc_id")
    def labels(pairs: org.apache.spark.sql.DataFrame) =
      Dedup.minLabelClusters(pairs, "doc_a", "doc_b", ids, "doc_id")
        .as[(Long, Long)].collect().toMap
    val uncapped = Dedup.lshPairsOf(sk, None).localCheckpoint()
    assert(uncapped.count() == n.toLong * (n - 1) / 2 + 1,
      "uncapped arm must emit the full quadratic pair set")
    val (lc, lu) = (labels(capped), labels(uncapped))
    assert(lc == lu, "cap changed the closure")
    assert((0 until n).forall(i => lc(i.toLong) == 0L) &&
      lc(900001L) == 900000L && lc(950000L) == 950000L)
  }

  test("d27 exact-then-LSH labels equal the full d3->d7 build; LSH stage shrinks to reps") {
    import spark.implicits._
    // Multi-member exact families, some linked ACROSS families by
    // near-dup (not identical) text, plus a loner and an empty-text
    // family (split("", " ") = [""] - ONE empty token, so it sketches
    // and clusters like any exact family; truly sketchless docs exist
    // only for null text, which the anti-join branch covers). Family A
    // (3 copies) ~ family B (2 copies): 19 shared tokens, one A-only
    // => jac 19/20 = 0.95. Family C is its own cluster.
    val shared = (0 until 19).map(i => s"t$i").mkString(" ")
    val tA = s"$shared extra"
    val tB = shared
    val docs = Seq(
      (10L, tA), (11L, tA), (12L, tA),
      (20L, tB), (21L, tB),
      (30L, "c0 c1 c2 c3"), (31L, "c0 c1 c2 c3"),
      (40L, "completely different loner text"),
      (50L, ""), (51L, "")).toDF("doc_id", "text")
    val sk = Dedup.sketchOf(docs).localCheckpoint()
    val full = Dedup.minLabelClusters(
      Dedup.lshPairsOf(sk, Some(Dedup.HotBandKeyCap)), "doc_a", "doc_b",
      docs.select("doc_id"), "doc_id").as[(Long, Long)].collect().toMap
    val composed = Dedup.exactThenLshOn(docs, sk)
      .as[(Long, Long)].collect().toMap
    assert(composed == full, "d1->d3 compose diverged from the full build")
    // the cross-family near-dup link must actually be present (the
    // equality above would hold vacuously on an all-singleton corpus)
    assert(full(20L) == 10L && full(12L) == 10L && full(31L) == 30L)
    // the empty-text family clusters like any exact family (one shared
    // empty token => jac 1.0), in BOTH arms
    assert(full(51L) == 50L && composed(51L) == 50L)
    // and the LSH stage really ran on representatives only
    val reps = docs.groupBy(md5(col("text"))).agg(min("doc_id").as("r"))
      .select("r").as[Long].collect().toSet
    val repPairs = Dedup.lshPairsOf(
      sk.join(reps.toSeq.toDF("doc_id"), Seq("doc_id"), "left_semi"),
      Some(Dedup.HotBandKeyCap)).select("doc_a", "doc_b")
      .as[(Long, Long)].collect().toSet
    assert(repPairs == Set((10L, 20L)),
      "rep-level LSH should see ONE cross-family pair and no intra-family ones")
  }

  test("simhash: near-identical token sets get close sketches") {
    import spark.implicits._
    val df = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta"),
      (2L, "alpha beta gamma delta epsilon zeta eta iota"), // 1 token swap
      (3L, "one two three four five six seven eight")       // disjoint
    ).toDF("doc_id", "text")
    // same pipeline as d4, inlined over the literal frame
    val sk = Dedup.queries("d4_simhash") // registry shape check only
    assert(sk != null)
    val hashes = df.select(col("doc_id"),
        graft.ext.Portable.tokenSet(col("text")).as("toks"))
      .select(col("doc_id"), col("toks"))
    val out = Dedup.simhashOf(hashes).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(ham(out(1L), out(2L)) < ham(out(1L), out(3L)),
      s"1-token-swap pair should be closer than disjoint pair: $out")
  }

  test("dedup clusters: every near-dup pair shares a canonical; canon = min") {
    val labels = Dedup.dedupClusters(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val pairs = Dedup.minhashLsh(spark, sf).select("doc_a", "doc_b")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.forall { case (a, b) => labels(a) == labels(b) },
      "a near-dup pair landed in two different clusters")
    // canonical is the minimum member of its own cluster
    val byCluster = labels.groupBy(_._2).map { case (c, m) => c -> m.keys.min }
    assert(byCluster.forall { case (c, minMember) => c == minMember })
    // every document is labeled
    assert(labels.size == graft.Tables.documents(spark, sf).count())
  }

  test("d9: embedding clusters — every near-dup pair shares a canonical") {
    val labels = Dedup.embedClusters(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val pairs = Dedup.embedNearDup(spark, sf).select("vec_a", "vec_b")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.nonEmpty)
    assert(pairs.forall { case (a, b) => labels(a) == labels(b) },
      "a semantic near-dup pair landed in two different clusters")
    val byCluster = labels.groupBy(_._2).map { case (c, m) => c -> m.keys.min }
    assert(byCluster.forall { case (c, minMember) => c == minMember })
    assert(labels.size == graft.Tables.embeddings(spark, sf).count())
  }

  test("embedding near-dup pairs all meet the cosine threshold") {
    val rows = Dedup.embedNearDup(spark, sf).collect()
    assert(rows.forall(_.getDouble(2) >= 0.4))
    val ids = rows.map(r => (r.getLong(0), r.getLong(1)))
    assert(ids.forall { case (a, b) => a < b })
    assert(ids.distinct.length == ids.length)
  }

  test("d8: sketch estimate is bounded, and high for every exact near-dup") {
    val est = Dedup.minhashEstimate(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(est.nonEmpty)
    assert(est.values.forall(e => e >= 0.0 && e <= 1.0))
    // d8's banding is its own fixed 16-perm EstBands geometry while d3
    // confirms over the higher-recall 64-perm 8x8 index (r13), so
    // containment of d3's exact pairs in d8's candidate set is now
    // STATISTICAL, not structural: d8's 16-perm 4x4 banding collides a
    // jac>=0.9 pair with p ~ 1-(1-0.9^4)^4 ~ 0.986. Assert >= 95%
    // coverage, and the deterministic estimate floor (one band of
    // EstRows mins equal -> EstRows/16) on every pair d8 did band.
    val exact = Dedup.minhashLsh(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(exact.nonEmpty)
    val floor = Dedup.EstRows / 16.0
    val covered = exact.count(est.contains)
    assert(covered.toDouble / exact.length >= 0.95,
      s"d8 candidates cover only $covered/${exact.length} exact pairs")
    for (p <- exact if est.contains(p))
      assert(est(p) >= floor, s"pair $p: estimate ${est(p)} too low for jac>=0.9")
  }

  test("d2: a stopword-like hot shingle is capped out of the posting index") {
    import spark.implicits._
    // 200 docs that share ONLY one hot shingle (df=200), plus two docs
    // sharing three rare shingles. Uncapped, the hot shingle alone makes
    // every hot-doc pair jac=1 (19 900 pairs); capped, those docs have no
    // indexed shingles left and only the rare pair survives.
    val hot = (100L until 300L).map(id => (id, "web", 777L))
    val rare = Seq((1L, "web", 11L), (1L, "web", 12L), (1L, "web", 13L),
      (2L, "web", 11L), (2L, "web", 12L), (2L, "web", 13L))
    val sh = (hot ++ rare).toDF("doc_id", "source", "shingle")
    val capped = Dedup.ngramJaccardOf(sh, cap = 64L)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(capped == Set((1L, 2L)), s"cap failed to drop the hot shingle: $capped")
    val uncapped = Dedup.ngramJaccardOf(sh, cap = Long.MaxValue).count()
    assert(uncapped == 200L * 199L / 2 + 1,
      s"uncapped should be quadratic in the hot df: $uncapped")
  }

  test("adaptive bucket width: low bits stable, width rises with the corpus") {
    import spark.implicits._
    // the invariant everything historical depends on: masking the 8-bit
    // bucket to 4 bits reproduces the original 4-plane bucket exactly
    val vecs = graft.Tables.embeddings(spark, sf)
      .select(col("vec_id"),
        transform(col("embedding"), x => x.cast("double")).as("v"))
    for (t <- 0 until 4) {
      val rows = vecs.select(
          Dedup.bucket(col("v"), t).as("old"),
          Dedup.wideBucket(col("v"), t).bitwiseAND(lit(15L)).as("masked"))
        .collect()
      assert(rows.forall(r => r.getLong(0) == r.getLong(1)),
        s"table $t: masked wide bucket != historical bucket")
    }
    // exact duplicates share every bucket at ANY width, so a corpus past
    // the width threshold still finds all its exact-dup pairs
    val base = graft.Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding"))
    val dup = base.withColumn("vec_id", col("vec_id") + 1000000L)
    // filler shards (negated / reversed / both) have no cos≥0.4 relation
    // to the originals; they exist to push the corpus past the threshold
    val big = base.unionByName(dup)
      .unionByName(base.withColumn("vec_id", col("vec_id") + 2000000L)
        .withColumn("embedding",
          transform(col("embedding"), x => x * lit(-1.0f))))
      .unionByName(base.withColumn("vec_id", col("vec_id") + 3000000L)
        .withColumn("embedding", reverse(col("embedding"))))
      .unionByName(base.withColumn("vec_id", col("vec_id") + 4000000L)
        .withColumn("embedding",
          transform(reverse(col("embedding")), x => x * lit(-1.0f))))
      .withColumn("label", lit(0))
    assert(big.count() > Dedup.BucketN0, "stress corpus under the width threshold")
    val pairs = Dedup.buildEmbedNearDupOn(big).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val ids = base.select("vec_id").collect().map(_.getLong(0))
    for (id <- ids)
      assert(pairs.contains((id, id + 1000000L)),
        s"exact duplicate pair ($id, ${id + 1000000L}) lost at adaptive width")
  }

  test("d2/d3/d5/d6: no forced broadcast of a corpus-sized frame") {
    // The 100 TB invariant: every frame in the dedup family is one row
    // per document/vector, so a broadcast may only ever be chosen by the
    // optimizer's SIZE ESTIMATE (scale-gated, disappears at real scale),
    // never forced by a hint (which survives scale-up and OOMs past the
    // 8 GB broadcast limit). Detection: with autoBroadcastJoinThreshold
    // = -1 — which also disables AQE's runtime broadcast conversion,
    // whose threshold falls back to it — the ONLY way a
    // BroadcastExchange can appear is an explicit broadcast()/hint. So
    // zero BroadcastExchange under this conf proves no hint remains.
    val key = "spark.sql.autoBroadcastJoinThreshold"
    val prev = spark.conf.get(key)
    spark.conf.set(key, "-1")
    try {
      // d3/d6 via their BUILDERS: the public entry points memoize a
      // checkpointed frame whose plan is a bare RDD scan — the invariant
      // lives in the build DAG
      val plans = Seq(
        "d2_ngram_jaccard" -> Dedup.ngramJaccard(spark, sf),
        "d3_minhash_lsh" -> Dedup.buildMinhashLsh(spark, sf),
        "d5_simhash_neardup" -> Dedup.simhashNearDup(spark, sf),
        "d6_embed_neardup" -> Dedup.buildEmbedNearDup(spark, sf),
        "d12_substring_spans" -> Dedup.substringSpans(spark, sf),
        "d13_incremental_lsh" -> Dedup.incrementalLsh(spark, sf))
      for ((q, df) <- plans) {
        val p = df.queryExecution.executedPlan.toString
        assert(!p.contains("BroadcastExchange") && !p.contains("BroadcastHashJoin")
            && !p.contains("BroadcastNestedLoopJoin"),
          s"$q forces a corpus-sized broadcast:\n$p")
      }
    } finally spark.conf.set(key, prev)
  }

  test("no exchange in the LSH plan carries token arrays or text") {
    // The scale invariant: whatever shuffles (candidate distinct, band
    // join at larger SF), it moves ids and band keys — never the token
    // arrays or raw text. Those must stay in scan-side projections and
    // re-join onto the small candidate set.
    val p = Dedup.buildMinhashLsh(spark, sf).queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning\\(([^)]*)\\)".r
      .findAllMatchIn(p).map(_.group(1)).toSeq
    // At sf0.001 every join broadcasts, so zero shuffles is valid (and
    // ideal); whatever exchanges appear at larger SF must carry only ids
    // and band keys.
    assert(!exchanges.exists(e => e.contains("toks") || e.contains("text")),
      s"token arrays shuffled:\n$p")
    // dedup-free banding: no distinct/aggregate over the candidate pairs
    assert(!p.contains("dropDuplicates"), s"unexpected distinct:\n$p")
    // the intersection is evaluated in exactly one Project (barrier keeps
    // it out of the join condition and the final filter), via the native
    // sorted-merge kernel, never array_intersect's per-pair hash set
    assert("sorted_intersect_count".r.findAllIn(p).size == 1,
      s"intersection evaluated more than once:\n$p")
    assert(!p.contains("array_intersect"), s"non-native intersection:\n$p")
    // The per-doc sketch frame is checkpointed, so the hash pipeline
    // (md5 per token) must not appear in the final plan AT ALL — its 5
    // reference sites all read the materialized frame.
    val md5Count = "conv\\(substring\\(md5\\(".r.findAllIn(p).size
    assert(md5Count == 0, s"md5 inlined $md5Count times — sketch frame not reused:\n$p")
  }

  test("d10 triangle census equals brute-force enumeration over the edge set") {
    import org.apache.spark.sql.functions._
    val edges = Dedup.embedNearDup(spark, sf)
      .select("vec_a", "vec_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val adj = edges.flatMap { case (a, b) => Seq(a -> b, b -> a) }
      .groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2) }
    val triBrute = edges.toSeq.map { case (a, b) =>
      (adj(a) intersect adj(b)).size.toLong
    }.sum / 3 // each triangle counted once per edge
    val wedgeBrute = adj.values.map(n => n.size.toLong * (n.size - 1) / 2).sum
    val row = Dedup.triangleStats(spark, sf).collect().head
    assert(row.getLong(0) == triBrute,
      s"triangles ${row.getLong(0)} != brute $triBrute")
    assert(row.getLong(1) == wedgeBrute,
      s"wedges ${row.getLong(1)} != brute $wedgeBrute")
    if (wedgeBrute > 0)
      assert(row.getDouble(2) == 3.0 * triBrute / wedgeBrute)
  }

  test("d11 pagerank equals a sequential integer-arithmetic fold") {
    val Scale = 1000000000000L
    val edges = Dedup.embedNearDup(spark, sf)
      .select("vec_a", "vec_b").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val und = edges.flatMap { case (a, b) => Seq(a -> b, b -> a) }
    val deg = und.groupBy(_._1).map { case (k, vs) => k -> vs.length.toLong }
    val nodes = graft.Tables.embeddings(spark, sf)
      .select("vec_id").collect().map(_.getLong(0))
    val n = nodes.length.toLong
    var r = nodes.map(_ -> Scale / n).toMap
    for (_ <- 1 to 3) {
      val msg = und.groupBy(_._2).map { case (v, es) =>
        v -> es.map { case (u, _) => r(u) / deg(u) }.sum
      }
      r = nodes.map(u =>
        u -> (15L * (Scale / n) / 100L + 85L * msg.getOrElse(u, 0L) / 100L)).toMap
    }
    val got = Dedup.pageRank(spark, sf).collect()
      .map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(got == r, s"diff=${r.toSet -- got.toSet}")
    // connected nodes outrank isolated ones (which hold the base rank)
    val base = 15L * (Scale / n) / 100L
    val connected = deg.keySet
    assert(nodes.filterNot(connected).forall(got(_) == base),
      "isolated nodes must sit at the damping base")
    assert(connected.nonEmpty && connected.exists(got(_) > base),
      "no connected node rose above the base rank")
  }

  test("d14 containment catches the quoted-subset pair symmetric Jaccard misses") {
    import spark.implicits._
    // doc 1's shingles all sit inside doc 2 (a short doc quoted in a
    // long one); doc 3 is unrelated. Jaccard(1,2) = 4/24 — far below
    // d2's threshold — but containment(1 → 2) = 1.
    val sh = (Seq(1L, 2L, 3L, 4L).map(s => (1L, "s", s)) ++
        (Seq(1L, 2L, 3L, 4L) ++ (10L until 30L)).map(s => (2L, "s", s)) ++
        Seq(50L, 51L).map(s => (3L, "s", s)))
      .toDF("doc_id", "source", "shingle")
    val got = Dedup.containmentOf(sh, Long.MaxValue).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(got == Set((1L, 2L, 1.0)), s"got: $got")
    assert(Dedup.ngramJaccardOf(sh, Long.MaxValue).count() == 0,
      "symmetric Jaccard should NOT fire on the subset pair")
  }

  test("d13 incremental == d3 batch restricted to delta-touching pairs") {
    val batch = Dedup.minhashLsh(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      .filter(p => p._1 % 10 == 0 || p._2 % 10 == 0)
    val inc = Dedup.incrementalLsh(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(inc == batch, s"missing=${batch -- inc}, extra=${inc -- batch}")
  }

  /** Same projection d12's production path uses over `documents`. */
  private def thOf(docs: Seq[(Long, String)]) = {
    import spark.implicits._
    docs.toDF("doc_id", "text")
      .select(col("doc_id"),
        posexplode(Portable.tokens(col("text"))).as(Seq("pos", "tok")))
      .select(col("doc_id"), col("pos"), Portable.tokenHash(col("tok")).as("h"))
  }

  test("d12: maximal duplicated spans — merged, localized, cross-doc only") {
    // doc 1 and doc 2 share a 12-token run (≥ one full 8-gram window) and
    // a second, disjoint 9-token run far enough away to be its own island;
    // doc 3 carries only the second run — its unique noise must stay
    // unflagged, and no window straddling run+noise may ever match.
    val run = (0 until 12).map(i => s"dup$i").mkString(" ")
    val run2 = (0 until 9).map(i => s"also$i").mkString(" ")
    def noise(tag: String, n: Int) = (0 until n).map(i => s"$tag$i").mkString(" ")
    val docs = Seq(
      1L -> s"$run ${noise("a", 20)} $run2",
      2L -> s"${noise("b", 5)} $run ${noise("c", 20)} $run2",
      3L -> s"${noise("d", 3)} $run2 ${noise("e", 20)}")
    val out = Dedup.substringSpansOf(thOf(docs)).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    // doc 1: run at tokens 1-12, run2 at 33-41 (1-based); doc 2: run at
    // 6-17, run2 at 38-46; doc 3: run2 at 4-12. Two islands per doc for
    // 1/2 — the 20-token gaps may not merge; within-run windows must.
    assert(out == Set(
      (1L, 1L, 12L, 12L), (1L, 33L, 41L, 9L),
      (2L, 6L, 17L, 12L), (2L, 38L, 46L, 9L),
      (3L, 4L, 12L, 9L)), s"got: $out")
  }

  test("d12: spans cover every duplicated window and nothing in unique text") {
    // On the real corpus: recompute duplicated 8-gram start positions by
    // brute force and assert the spans are exactly their island closure.
    val th = Dedup.tokenHashFrame(spark, sf)
      .select("doc_id", "pos", "h").collect()
      .groupBy(_.getLong(0))
      .view.mapValues(_.sortBy(_.getInt(1)).map(_.getLong(2)).toArray).toMap
    val P = Portable.P
    val grams = th.toSeq.flatMap { case (doc, hs) =>
      (0 to hs.length - Dedup.SpanGram).map { i =>
        val g = (i + 1 until i + Dedup.SpanGram)
          .foldLeft(hs(i))((acc, j) => (acc * 31L + hs(j)) % P)
        (doc, i, g)
      }
    }
    val byGram = grams.groupBy(_._3)
      .filter(_._2.map(_._1).distinct.size >= 2)
    val hits = byGram.values.flatten.map(t => (t._1, t._2)).toSet
    val expected = hits.groupBy(_._1).flatMap { case (doc, ps) =>
      val sorted = ps.map(_._2).toSeq.sorted
      val islands = sorted.tail.foldLeft(Vector(Vector(sorted.head))) {
        (acc, p) =>
          if (p - acc.last.last <= Dedup.SpanGram) acc.init :+ (acc.last :+ p)
          else acc :+ Vector(p)
      }
      islands.map(is =>
        (doc, is.head + 1L, is.last + Dedup.SpanGram.toLong,
          (is.last + Dedup.SpanGram - is.head).toLong))
    }.toSet
    val got = Dedup.substringSpans(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(got == expected,
      s"missing=${expected -- got}, extra=${got -- expected}")
  }

  test("d15: coverage sums d12's spans exactly and bounds never break") {
    val spans = Dedup.substringSpans(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(3)))
      .groupBy(_._1).map { case (d, xs) => d -> xs.map(_._2).sum }
    val rows = Dedup.spanCoverage(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3)))
    assert(rows.length == graft.Tables.documents(spark, sf).count(),
      "every document must appear in the coverage audit")
    rows.foreach { case (doc, n, dup, mostly) =>
      assert(dup == spans.getOrElse(doc, 0L), s"doc $doc coverage != span sum")
      assert(dup >= 0 && dup <= n, s"doc $doc: coverage $dup outside [0, $n]")
      assert(mostly == (dup * 2 >= n), s"doc $doc verdict mismatch")
    }
    // the corpus' planted duplicates make the gate non-trivial both ways
    assert(rows.exists(_._4) && rows.exists(!_._4))
  }

  test("c13: cluster weights equalize clusters and agree with d7 sizes") {
    val labels = Dedup.dedupClusters(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1))
    val sizes = labels.groupBy(_._2).map { case (c, xs) => c -> xs.size.toLong }
    val rows = Dedup.clusterWeights(spark, sf).collect()
      .map(r => (r.getLong(1), (r.getLong(0), r.getLong(2), r.getLong(3))))
    assert(rows.length == labels.length, "one weight row per document")
    for ((canon, (_, size, w)) <- rows) {
      assert(size == sizes(canon), s"cluster $canon size mismatch")
      assert(w == 1000000L / size, s"cluster $canon weight mismatch")
    }
    // equalization: every cluster's total weight is within one floor
    // step of 1e6 regardless of its size
    for ((canon, size) <- sizes) {
      val total = (1000000L / size) * size
      assert(total > 1000000L - size && total <= 1000000L,
        s"cluster $canon total weight $total out of bounds")
    }
    assert(sizes.values.exists(_ > 1), "no nontrivial cluster — test is vacuous")
  }

  test("d17: per-source dup rate recomputes from d7 labels exactly") {
    val labels = Dedup.dedupClusters(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val srcOf = graft.Tables.documents(spark, sf)
      .select(col("doc_id"), col("source")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val expected = labels.toSeq
      .groupBy { case (id, _) => srcOf(id) }
      .map { case (src, xs) =>
        val dups = xs.count { case (id, canon) => id != canon }
        src -> (xs.size.toLong, dups.toLong)
      }
    val rows = Dedup.sourceDupRate(spark, sf).collect()
    assert(rows.length == expected.size, "one row per source")
    for (r <- rows) {
      val (n, d) = expected(r.getString(0))
      assert(r.getLong(1) == n, s"${r.getString(0)}: n_docs")
      assert(r.getLong(2) == d, s"${r.getString(0)}: n_dups")
      assert(r.getLong(3) == d * 1000000L / n, s"${r.getString(0)}: dup_ppm")
    }
    // at least one source must actually hold duplicates, else vacuous
    assert(rows.exists(_.getLong(2) > 0), "no source with dups — vacuous")
  }

  test("d16: keeps the longest member of every cluster, ties to lowest id") {
    val labels = Dedup.dedupClusters(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val chars = graft.Tables.documents(spark, sf).select("doc_id", "n_chars")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val expect = labels.groupBy(_._2).map { case (canon, ms) =>
      val members = ms.keys.toSeq
      val kept = members.minBy(id => (-chars(id), id))
      canon -> (members.size.toLong, kept, chars(kept))
    }
    val got = Dedup.retentionPolicy(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(got == expect)
    // retention must cover every document exactly once across clusters
    assert(got.values.map(_._1).sum == chars.size)
  }

  test("d19 medoids: exact below the member cap, keep-longest fallback above") {
    import spark.implicits._
    // cluster 1: 3 members (<= cap 4) — exact medoid, hand-computed;
    // cluster 10: 6 members (> cap 4) — keep-longest with NULL sum_dist
    val docsF = Seq(
      (1L, "a b c d", 7L), (2L, "a b c e", 7L), (3L, "a b x y", 7L),
      (10L, "p q", 3L), (11L, "p q r", 5L), (12L, "p q s", 5L),
      (13L, "p t", 3L), (14L, "p u", 3L), (15L, "p v w z", 7L)
    ).toDF("doc_id", "text", "n_chars")
    val labels = Seq(1L -> 1L, 2L -> 1L, 3L -> 1L, 10L -> 10L, 11L -> 10L,
      12L -> 10L, 13L -> 10L, 14L -> 10L, 15L -> 10L)
      .toDF("doc_id", "canonical")
    val got = Dedup.clusterMedoidsOf(labels, docsF, cap = 4).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getLong(3)))).toMap
    // exact branch: dist(1,2)=1e6-3e6/5=400000, dist(1,3)=dist(2,3)=666667
    // -> sums 1066667/1066667/1333334, tie to the lower doc_id
    assert(got(1L) == ((3L, 1L, Some(1066667L))), s"exact branch: ${got(1L)}")
    // fallback branch: longest member (n_chars 7 -> doc 15), no distance
    assert(got(10L) == ((6L, 15L, None)), s"fallback branch: ${got(10L)}")
    assert(got.size == 2)
  }

  test("d20 overlap matrix is consistent with the label frame") {
    val rows = Dedup.crossSourceOverlap(spark, sf).collect()
      .map(r => ((r.getString(0), r.getString(1)),
        (r.getLong(2), r.getLong(3), r.getLong(4))))
    assert(rows.nonEmpty, "no cross-source overlap at test SF — vacuous")
    assert(rows.forall { case ((a, b), _) => a < b }, "unordered pair emitted")
    assert(rows.map(_._1).distinct.length == rows.length, "duplicate pair row")
    // each shared cluster contributes >= 1 doc on each side
    assert(rows.forall { case (_, (nc, da, db)) => da >= nc && db >= nc && nc > 0 })
    // brute recount from the label frame itself
    val ls = Dedup.dedupClusters(spark, sf)
      .join(graft.Tables.documents(spark, sf).select("doc_id", "source"), Seq("doc_id"))
      .collect().map(r => (r.getLong(1), r.getString(2)))
    val bySrcPair = ls.groupBy(_._1).values.flatMap { xs =>
      val counts = xs.groupBy(_._2).map { case (s, ys) => s -> ys.length.toLong }
      for (a <- counts.keys; b <- counts.keys if a < b)
        yield (a, b) -> (1L, counts(a), counts(b))
    }.groupBy(_._1).map { case (k, vs) =>
      k -> vs.map(_._2).reduce((x, y) => (x._1 + y._1, x._2 + y._2, x._3 + y._3))
    }
    assert(rows.toMap == bySrcPair, "matrix diverges from brute recount")
  }

  test("c11: no near-dup pair straddles the train/valid/test split") {
    val split = Dedup.leakageSplit(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getString(2))).toMap
    // the leakage invariant: both ends of EVERY near-dup pair — the
    // exact rows an id-hashed split would scatter — land on one side
    val pairs = Dedup.minhashLsh(spark, sf).select("doc_a", "doc_b")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.forall { case (a, b) => split(a)._2 == split(b)._2 },
      "a near-dup pair straddles the split boundary")
    // total coverage, cluster-consistent assignment, all three splits used
    assert(split.size == graft.Tables.documents(spark, sf).count())
    assert(split.groupBy(_._2._1).forall(_._2.map(_._2._2).toSet.size == 1),
      "two members of one cluster drew different splits")
    assert(split.values.map(_._2).toSet == Set("train", "valid", "test"))
  }

  test("d21 ingest churn equals a driver union-find recount; identities hold") {
    val got = Dedup.ingestChurn(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getBoolean(4))).sortBy(_._1)
    val ids = graft.Tables.documents(spark, sf)
      .select("doc_id").collect().map(_.getLong(0))
    val pairs = Dedup.minhashLsh(spark, sf).select("doc_a", "doc_b")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    def unionFind(nodes: Seq[Long], edges: Seq[(Long, Long)]): Map[Long, Long] = {
      val p = scala.collection.mutable.Map(nodes.map(n => n -> n): _*)
      def find(x: Long): Long = { if (p(x) != x) p(x) = find(p(x)); p(x) }
      edges.foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) p(math.max(ra, rb)) = math.min(ra, rb)
      }
      nodes.map(n => n -> find(n)).toMap
    }
    val after = unionFind(ids.toSeq, pairs.toSeq)
    val oldIds = ids.filter(_ % 10 != 0).toSeq
    val before = unionFind(oldIds,
      pairs.filter { case (a, b) => a % 10 != 0 && b % 10 != 0 }.toSeq)
    val expected = after.groupBy(_._2).flatMap { case (can, ms) =>
      val docs = ms.keys.toSeq
      val nNew = docs.count(_ % 10 == 0).toLong
      if (nNew == 0) None
      else {
        val nbc = docs.filter(_ % 10 != 0).map(before).distinct.length.toLong
        Some((can, docs.length.toLong, nNew, nbc, nbc >= 2))
      }
    }.toSeq.sortBy(_._1)
    assert(got.toSeq == expected, s"churn diverges:\n got=${got.toSeq}\n exp=$expected")
    // identities: new members never exceed the cluster; a pure-new
    // cluster has zero before-clusters; output covers every delta doc
    assert(got.forall(r => r._3 >= 1L && r._3 <= r._2))
    assert(got.filter(r => r._2 == r._3).forall(_._4 == 0L),
      "a pure-new cluster claims pre-existing members")
    // every delta doc is covered exactly once across the touched clusters
    assert(got.map(_._3).sum == ids.count(_ % 10 == 0).toLong)
  }

  test("d24 cluster gini equals a BigInt driver fold; mix is non-trivial") {
    val labels = Dedup.dedupClusters(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val srcOf = graft.Tables.documents(spark, sf)
      .select("doc_id", "source").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val per = labels.groupBy(_._2).toSeq
      .map { case (_, ms) =>
        val bySrc = ms.map(m => srcOf(m._1)).groupBy(identity)
          .map(_._2.size.toLong)
        val n = bySrc.sum
        (n, bySrc.size.toLong,
          1000000L - (bySrc.map(s => BigInt(s) * s).sum * 1000000 /
            (BigInt(n) * n)).toLong)
      }
      .filter(_._1 >= 2)
    val expected = per.groupBy(_._1).map { case (sz, xs) =>
      sz -> ((xs.size.toLong, xs.map(_._2).sum,
        (xs.map(x => BigInt(x._3) * x._1).sum /
          BigInt(xs.map(_._1).sum)).toLong))
    }
    val got = Dedup.clusterGini(spark, sf).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(got == expected, s"gini diverged: got=$got exp=$expected")
    // the audit separates regimes: some cluster is single-source-pure
    // (gini 0) OR genuinely mixed (gini > 0) — require both signals
    // exist across the corpus so the statistic isn't constant
    assert(per.map(_._3).distinct.size > 1,
      "every cluster has identical impurity — the audit proves nothing")
  }

  test("d23 k-core equals a driver peeling fold; both regions non-empty") {
    import scala.collection.mutable
    val k = 4
    val pairs = Dedup.minhashLsh(spark, sf)
      .select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val adj = mutable.Map.empty[Long, mutable.Set[Long]]
    for ((a, b) <- pairs) {
      adj.getOrElseUpdate(a, mutable.Set.empty) += b
      adj.getOrElseUpdate(b, mutable.Set.empty) += a
    }
    val expected = mutable.Set.empty[(Long, Boolean, Long, Long)]
    var round = 1L
    var doomed = adj.filter(_._2.size < k).keySet.toSeq
    while (doomed.nonEmpty) {
      // SIMULTANEOUS removal: record degrees as of the round start
      doomed.foreach(n => expected += ((n, false, round, adj(n).size.toLong)))
      doomed.foreach { n =>
        adj(n).foreach(m => adj(m) -= n)
        adj -= n
      }
      round += 1
      doomed = adj.filter(_._2.size < k).keySet.toSeq
    }
    adj.foreach { case (n, s) => expected += ((n, true, 0L, s.size.toLong)) }
    val got = Dedup.kcore(spark, sf).collect()
      .map(r => (r.getLong(0), r.getBoolean(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(got == expected.toSet,
      s"missing=${(expected.toSet -- got).take(5)} extra=${(got -- expected).take(5)}")
    assert(got.exists(_._2) && got.exists(!_._2),
      "core or shell empty — the peel proves nothing")
    // the oracle's unroll bound must dominate the true peel depth
    assert(round - 1 <= Dedup.CoreUnroll,
      s"peel depth ${round - 1} exceeds the oracle unroll ${Dedup.CoreUnroll}")
  }

  test("d23 guard: a peel deeper than CoreUnroll fails loudly") {
    import spark.implicits._
    // a 20-node path peels at k=2 from both ends — depth 10 > CoreUnroll.
    // Silently converging past the oracle's unroll would desynchronize
    // the correctness gate; the loop must throw instead.
    val path = (0L until 19L).map(i => (i, i + 1)).toDF("doc_a", "doc_b")
    val e = intercept[IllegalArgumentException] {
      Dedup.kcoreOf(path, coreK = 2L).collect()
    }
    assert(e.getMessage.contains("CoreUnroll"), e.getMessage)
    // and a shallow graph through the same injectable path still works:
    // a 5-clique plus one pendant node at k=2 peels in one round
    val clique = (for { a <- 0L until 5L; b <- a + 1 until 5L } yield (a, b))
    val g = (clique :+ ((0L, 99L))).toDF("doc_a", "doc_b")
    val got = Dedup.kcoreOf(g, coreK = 2L).collect()
      .map(r => (r.getLong(0), r.getBoolean(1))).toMap
    assert(got(99L) == false && (0L until 5L).forall(got(_)))
  }
}
