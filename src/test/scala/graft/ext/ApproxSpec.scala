package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Approximate-aggregate accuracy: the sketch family (HyperLogLog++
  * distinct counts, quantile summaries) can never hash-match an oracle on
  * its raw estimates — different engines' sketches legitimately differ —
  * so r6 ships the contract itself (exact counts + within-bound booleans,
  * oracle-checked), and this spec holds the TIGHT bounds against the
  * exact computation, which is what a 100 TB user trades for the
  * constant-memory plan shape (no distinct shuffle, no global sort).
  */
class ApproxSpec extends SparkSpec {

  test("approx_count_distinct is within the configured relative error") {
    val ev = graft.Tables.events(spark, sf)
    val exact = ev.select(countDistinct("user_id")).first.getLong(0)
    val approx = ev.select(approx_count_distinct("user_id", rsd = 0.02))
      .first.getLong(0)
    assert(math.abs(approx - exact).toDouble / exact <= 0.05,
      s"approx=$approx exact=$exact")
  }

  test("approx_percentile lands within rank tolerance of the exact quantile") {
    val ev = graft.Tables.events(spark, sf).select(col("value"))
    val n = ev.count()
    val Seq(p50, p95) = ev.select(
        percentile_approx(col("value"), array(lit(0.5), lit(0.95)), lit(1000)))
      .first.getSeq[Double](0).toSeq
    // rank of the approximate answer must be within 1% of the target rank
    def rankOf(v: Double): Double =
      ev.filter(col("value") <= v).count().toDouble / n
    assert(math.abs(rankOf(p50) - 0.5) <= 0.01, s"p50=$p50 rank=${rankOf(p50)}")
    assert(math.abs(rankOf(p95) - 0.95) <= 0.01, s"p95=$p95 rank=${rankOf(p95)}")
  }

  test("r6 registered query: exact counts carried, every bound satisfied") {
    val rows = Sampling.approxStats(spark, sf).collect()
    val exact = graft.Tables.events(spark, sf)
      .groupBy("event_type").agg(countDistinct("user_id").as("u"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(rows.map(_.getString(0)).toSet == exact.keySet)
    for (r <- rows) {
      val t = r.getString(0)
      assert(r.getLong(1) == exact(t), s"$t: exact_users mismatch")
      assert(r.getBoolean(2), s"$t: hll_ok false")
      assert(r.getBoolean(3), s"$t: p50_ok false")
      assert(r.getBoolean(4), s"$t: p95_ok false")
    }
  }

  test("r7 sketch registers obey the merge law (max-combine across splits)") {
    // sketch(A ∪ B) == per-register max(sketch(A), sketch(B)): the
    // property that lets per-partition/per-day sketches combine without
    // revisiting keys. Exercised by splitting the stream on event-id
    // parity — the registered query is the whole-stream sketch.
    import org.apache.spark.sql.DataFrame
    def sketch(ev: DataFrame): Map[(String, Long), Long] =
      Sampling.hllRegisters(spark, sf) // registered query reads the table;
        .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap

    val ev = graft.Tables.events(spark, sf)
    def sketchOf(part: DataFrame): Map[(String, Long), Long] =
      part.select(col("event_type"),
          graft.ext.Portable.tokenHash(col("user_id").cast("string")).as("h"))
        .select(col("event_type"), (col("h") % 64).as("bucket"),
          expr("h DIV 64").as("rest"))
        .groupBy("event_type", "bucket")
        .agg(max(expr("rest & -rest")).as("register"))
        .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap

    val whole = sketchOf(ev)
    val a = sketchOf(ev.filter(col("event_id") % 2 === 0))
    val b = sketchOf(ev.filter(col("event_id") % 2 === 1))
    val merged = (a.keySet ++ b.keySet).map { k =>
      k -> math.max(a.getOrElse(k, 0L), b.getOrElse(k, 0L))
    }.toMap
    assert(merged == whole, "merge law violated")
    // and the registered query equals the direct formulation
    assert(sketch(ev) == whole)
  }

  test("r17 union estimate recomputes from raw keys; merge row is the max-fold") {
    val rows = Sampling.hllUnion(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(_._1)
    // driver recount: registers per scope from the raw user-day keys,
    // then the integer estimate formula verbatim
    val evs = graft.Tables.events(spark, sf)
      .select(col("event_type"), col("user_id"),
        expr("unix_micros(ts) DIV 86400000000").as("day"))
      .collect().map(r => (r.getString(0),
        s"${r.getLong(1)}:${r.getLong(2)}"))
    val (tT, m) = (67108864L, 64L)
    def regsOf(keys: Seq[String]): Map[Long, Long] =
      keys.map(graft.ext.Portable.tokenHashOf).groupBy(_ % m)
        .map { case (b, hs) =>
          b -> hs.map { h => val r = h / m; if (r == 0) 0L else r & -r }.max
        }
    def estOf(regs: Map[Long, Long]): Long = {
      val dsum = regs.values.map(r => if (r == 0) 1L else tT / (2 * r)).sum
      (709L * m * m * tT) / (1000L * (dsum + (m - regs.size) * tT))
    }
    val perType = evs.groupBy(_._1).map { case (t, xs) =>
      t -> regsOf(xs.map(_._2).distinct)
    }
    val globalRegs = (0L until m).flatMap { b =>
      val vs = perType.values.flatMap(_.get(b))
      if (vs.isEmpty) None else Some(b -> vs.max) // merge = per-bucket max
    }.toMap
    val expect = (perType.map { case (t, r) =>
      (t, r.size.toLong, estOf(r))
    }.toSeq :+ (("__all__", globalRegs.size.toLong, estOf(globalRegs))))
      .sortBy(_._1)
    assert(rows.map(x => (x._1, x._2, x._3)).toSeq == expect)
    // truth columns are the exact distincts; estimate lands within the
    // generous 3-sigma band (sigma ≈ 1.04/sqrt(64) = 13%)
    val truth = evs.distinct.groupBy(_._1).map { case (t, xs) => t -> xs.size.toLong }
    for ((s0, _, est, tru) <- rows) {
      val exp = if (s0 == "__all__") evs.map(_._2).distinct.size.toLong else truth(s0)
      assert(tru == exp, s"$s0: true_distinct mismatch")
      assert(math.abs(est - tru).toDouble <= 0.4 * tru,
        s"$s0: estimate $est vs true $tru outside 40%")
    }
  }

  test("r18 KMV bottom-k recomputes from raw keys; union row is the merge law") {
    val rows = Sampling.kmvDistinct(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
      .sortBy(_._1)
    val evs = graft.Tables.events(spark, sf)
      .select(col("event_type"), col("user_id"),
        expr("unix_micros(ts) DIV 86400000000").as("day"))
      .collect().map(r => (r.getString(0), s"${r.getLong(1)}:${r.getLong(2)}"))
    val (k, p) = (64, 2147483647L)
    def sketchOf(keys: Seq[String]): Seq[Long] =
      keys.distinct.map(graft.ext.Portable.tokenHashOf).distinct.sorted.take(k)
    def estOf(bottom: Seq[Long], nDistinct: Long): Long =
      if (nDistinct <= k) nDistinct else (k - 1L) * p / bottom.last
    val perType = evs.groupBy(_._1).map { case (t, xs) =>
      val hs = xs.map(_._2).distinct.map(graft.ext.Portable.tokenHashOf).distinct
      (t, sketchOf(xs.map(_._2)), hs.size.toLong)
    }.toSeq
    // MERGE LAW: bottom-k of the union of hash sets == bottom-k of the
    // concatenated per-type sketches (no raw keys revisited)
    val allH = evs.map(_._2).distinct.map(graft.ext.Portable.tokenHashOf).distinct
    val mergedFromSketches =
      perType.flatMap(_._2).distinct.sorted.take(k)
    assert(mergedFromSketches.toSeq == allH.sorted.take(k).toSeq,
      "KMV merge law violated")
    val expect = (perType.map { case (t, sk0, nd) =>
      (t, sk0.size.toLong, sk0.last, estOf(sk0, nd))
    } :+ (("__all__", math.min(k, allH.size).toLong,
      mergedFromSketches.last, estOf(mergedFromSketches, allH.size.toLong))))
      .sortBy(_._1)
    assert(rows.map(x => (x._1, x._2, x._3, x._4)).toSeq == expect)
    // truth columns exact; estimate within the generous 3-sigma band
    // (sigma ~ 1/sqrt(64) = 12.5%)
    val truth = evs.distinct.groupBy(_._1)
      .map { case (t, xs) => t -> xs.map(_._2).distinct.size.toLong }
    for ((s0, _, _, est, tru) <- rows) {
      val exp = if (s0 == "__all__") evs.map(_._2).distinct.size.toLong
        else truth(s0)
      assert(tru == exp, s"$s0: true_distinct mismatch")
      assert(math.abs(est - tru).toDouble <= 0.4 * tru,
        s"$s0: estimate $est vs true $tru outside 40%")
    }
  }

  test("r19 subsample CI equals a driver fold; replicates genuinely differ") {
    val evs = graft.Tables.events(spark, sf)
      .select(col("event_type"),
        expr("CAST(floor(value * 100) AS BIGINT)").as("v"),
        col("event_id").cast("string"))
      .collect().map(r => (r.getString(0), r.getLong(1),
        graft.ext.Portable.tokenHashOf(r.getString(2))))
    val expected = evs.groupBy(_._1).map { case (t, xs) =>
      val means = (0 until 24).map { b =>
        val in = xs.filter(x => (x._3 >> b) % 2 == 1)
        in.map(_._2).sum * 1000000L / in.length
      }.sorted
      val n = xs.length.toLong
      t -> ((n, xs.map(_._2).sum * 1000000L / n, means(2), means(21)))
    }
    val got = Sampling.subsampleCi(spark, sf).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))).toMap
    assert(got == expected, s"CI diverged: got=$got exp=$expected")
    // non-vacuity: the interval has real width (replicates disagree)
    // and brackets the full-sample mean on this corpus
    got.values.foreach { case (_, mean, lo, hi) =>
      assert(lo < hi, "degenerate interval")
      assert(lo <= mean && mean <= hi, "interval misses the mean")
    }
  }

  test("r8 count-min estimates dominate true counts and sketches merge by sum") {
    val rows = Sampling.cmHeavyHitters(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(rows.nonEmpty)
    // CM never underestimates (collisions only add)
    for ((t, truth, est) <- rows)
      assert(est >= truth, s"$t: est=$est < true=$truth")
    // merge law: per-split sketches SUM to the whole-corpus sketch
    import org.apache.spark.sql.DataFrame
    def counters(part: DataFrame): Map[(Int, Long), Long] =
      part.select(explode(split(col("text"), " ")).as("term"))
        .select(posexplode(array((0 until 4).map(i =>
          graft.ext.Portable.tokenHash(concat(lit(s"cm$i:"), col("term"))) % 32): _*))
          .as(Seq("row", "bucket")))
        .groupBy("row", "bucket").agg(count(lit(1)).as("c"))
        .collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    val d = graft.Tables.documents(spark, sf)
    val whole = counters(d)
    val a = counters(d.filter(col("doc_id") % 2 === 0))
    val b = counters(d.filter(col("doc_id") % 2 === 1))
    val merged = (a.keySet ++ b.keySet).map(k =>
      k -> (a.getOrElse(k, 0L) + b.getOrElse(k, 0L))).toMap
    assert(merged == whole, "count-min merge law violated")
  }

  test("approx distinct plans without a distinct shuffle of the key") {
    val p = graft.Tables.events(spark, sf)
      .select(approx_count_distinct("user_id"))
      .queryExecution.executedPlan.toString
    // one partial+final HLL pair; no Expand/expand-style distinct rewrite
    assert(!p.contains("Expand"), s"unexpected distinct expansion:\n$p")
    assert(p.contains("approx_count_distinct") || p.contains("HyperLogLog"),
      s"sketch aggregate missing:\n$p")
  }
}
