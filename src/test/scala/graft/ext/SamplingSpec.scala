package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SamplingSpec extends SparkSpec {

  test("hash sample is deterministic and partition-independent") {
    val s1 = Sampling.hashSample(spark, sf).collect().map(_.getLong(0)).toSet
    val s2 = Sampling.hashSample(spark, sf).collect().map(_.getLong(0)).toSet
    assert(s1 == s2, "sample changed between runs")
    // repartitioning the input must not change the sample membership
    val repart = graft.Tables.documents(spark, sf).repartition(13)
      .filter(graft.ext.Portable.tokenHash(col("doc_id").cast("string")) % 100 < 10)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(repart == s1, "sample depends on partitioning")
  }

  test("stratified rates hold approximately per stratum") {
    val total = graft.Tables.documents(spark, sf)
      .groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val picked = Sampling.stratifiedSample(spark, sf)
      .groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val rates = Map("en" -> 0.05, "de" -> 0.20, "fr" -> 0.20, "es" -> 0.20, "zh" -> 0.50)
    for ((lang, rate) <- rates; n <- total.get(lang)) {
      val got = picked.getOrElse(lang, 0L).toDouble / n
      // hash gating is binomial; wide tolerance at sf0.001 sizes
      assert(math.abs(got - rate) < 0.25, s"$lang: rate $got vs $rate")
    }
  }

  test("mixture summary picked never exceeds total and matches r1 gate") {
    val rows = Sampling.mixtureSummary(spark, sf).collect()
    assert(rows.forall(r => r.getLong(2) <= r.getLong(1)))
    val totalPicked = rows.map(_.getLong(2)).sum
    val r1 = Sampling.hashSample(spark, sf).count()
    assert(totalPicked == r1)
  }

  test("priority sample is weight-biased, deterministic, and heap-shaped") {
    val df = Sampling.prioritySample(spark, sf)
    val s1 = df.collect().map(_.getLong(0)).toSeq
    assert(s1.length == 64 && s1.distinct.length == 64)
    // pure function of the data: a second evaluation is identical
    assert(Sampling.prioritySample(spark, sf).collect()
      .map(_.getLong(0)).toSeq == s1)
    // inclusion ∝ n_chars: the sample's mean weight must sit well above
    // the corpus mean (weight range here is wide enough that this is
    // deterministic, not a statistical accident)
    val sampleMean = df.agg(avg("n_chars")).head().getDouble(0)
    val corpusMean = graft.Tables.documents(spark, sf)
      .agg(avg("n_chars")).head().getDouble(0)
    assert(sampleMean > corpusMean,
      s"weighted sample not weight-biased: $sampleMean <= $corpusMean")
    // scale shape: global top-k plans as TakeOrderedAndProject
    // (per-partition heaps + tiny merge), never a full sort
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("TakeOrderedAndProject"), s"top-k not heap-shaped:\n$p")
  }

  test("r10 exact quantiles equal the sorted-rank definition; no global sort") {
    import org.apache.spark.sql.functions._
    val vals = graft.Tables.events(spark, sf)
      .select("event_type", "value").collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toSeq
      .groupBy(_._1).map { case (t, vs) => t -> vs.map(_._2).sorted }
    val df = Sampling.exactQuantiles(spark, sf)
    val got = df.collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2)).toMap
    assert(got.size == vals.size * 2, "a (group, quantile) row is missing")
    for ((t, sorted) <- vals) {
      val n = sorted.size
      assert(got((t, "p50")) == sorted((n + 1) / 2 - 1), s"$t p50 wrong")
      assert(got((t, "p95")) == sorted((19 * n + 19) / 20 - 1), s"$t p95 wrong")
    }
    // the point of the operator: no range-partitioned global sort — the
    // only exchanges are hash partitionings (aggs + bounded windows)
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("rangepartitioning"),
      s"r10 fell back to a global sort:\n$p")
  }

  test("r11 decile bins match brute-force ntile semantics; no global sort") {
    import org.apache.spark.sql.functions._
    val byType = graft.Tables.events(spark, sf)
      .select("event_type", "value").collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toSeq
      .groupBy(_._1).map { case (t, vs) => t -> vs.map(_._2) }
    val df = Sampling.decileBins(spark, sf)
    val got = df.collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    for ((t, vs) <- byType) {
      val sorted = vs.sorted
      val n = sorted.size
      val bounds = (1 to 9).map(k => sorted((k * n + 9) / 10 - 1))
      val expect = vs.groupBy(v => bounds.count(v > _).toLong)
        .map { case (b, xs) => b -> xs.size.toLong }
      for ((b, c) <- expect)
        assert(got((t, b)) == c, s"$t bin $b: got ${got.get((t, b))} want $c")
      // every value accounted for
      assert(expect.values.sum == n)
    }
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("rangepartitioning"),
      s"r11 fell back to a global sort:\n$p")
  }

  test("r12 per-group top-k matches brute force and plans WindowGroupLimit") {
    val docs = graft.Tables.documents(spark, sf)
      .select("doc_id", "lang", "n_chars").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    def h(s: String): Long = Portable.tokenHashOf(s)
    val expect = docs.groupBy(_._2).toSeq.flatMap { case (lang, ds) =>
      ds.toSeq
        .map { case (id, _, nc) => (id, nc, nc.toDouble / (h(id.toString) + 1L)) }
        .sortBy { case (id, _, pr) => (-pr, id) }
        .take(8).zipWithIndex
        .map { case ((id, nc, _), i) => (lang, id) -> (nc, (i + 1).toLong) }
    }.toMap
    val df = Sampling.groupTopk(spark, sf)
    val got = df.collect()
      .map(r => (r.getString(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3)))
      .toMap
    assert(got == expect, "per-group top-k mismatch")
    // the rank filter must push below the exchange as a group limit
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("WindowGroupLimit"),
      s"rank filter not planned as WindowGroupLimit:\n$p")
  }

  test("column profile matches per-column recomputation in one scan") {
    val prof = Sampling.columnProfile(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    val ev = graft.Tables.events(spark, sf)
    val n = ev.count()
    for (c <- Seq("event_id", "ts", "user_id", "event_type", "value", "props")) {
      val nulls = ev.filter(col(c).isNull).count()
      val dist = ev.select(c).na.drop().distinct().count()
      assert(prof(c) == ((nulls, dist, n)),
        s"$c: got ${prof(c)} want ${(nulls, dist, n)}")
    }
    // ONE pass over the table: the multi-distinct plans as a single
    // scan + Expand, never one rescan per column
    val plan = Sampling.columnProfile(spark, sf)
      .queryExecution.executedPlan.toString
    assert("Scan parquet|FileScan parquet".r.findAllIn(plan).size == 1,
      s"profiler rescans the table:\n$plan")
    assert(plan.contains("Expand"), s"multi-distinct not Expand-planned:\n$plan")
  }
}
