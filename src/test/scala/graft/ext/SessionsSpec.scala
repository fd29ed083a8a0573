package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SessionsSpec extends SparkSpec {

  test("session boundaries split exactly at gaps over 30 minutes") {
    val rows = Sessions.sessionStats(spark, sf).collect()
    assert(rows.nonEmpty)
    // session numbering starts at 1 and is dense per user
    val byUser = rows.groupBy(_.getLong(0))
    for ((_, rs) <- byUser) {
      val nos = rs.map(_.getLong(1)).sorted
      assert(nos.head == 1L && nos.sameElements(1L to nos.length),
        s"session numbers not dense: ${nos.toSeq}")
    }
    // event ranges of consecutive sessions must not overlap
    for ((_, rs) <- byUser) {
      val ordered = rs.sortBy(_.getLong(1))
      for (Array(a, b) <- ordered.sliding(2).map(_.toArray).toSeq if b != null)
        assert(a.getLong(4) < b.getLong(3),
          "sessions overlap in event-id ranges")
    }
  }

  test("lag/cumsum sessionization agrees with session_window on the same gap") {
    // Two independent formulations of 30-minute-gap sessions — the
    // relational lag+cumsum (k1) and Spark's native session_window
    // (the streaming-capable form) — must carve identical sessions:
    // same per-user session count, same multiset of session sizes.
    import org.apache.spark.sql.functions._
    val viaLag = Sessions.sessionStats(spark, sf)
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_sessions"),
        sort_array(collect_list("n_events")).as("sizes"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getSeq[Long](2))).toMap
    val viaNative = graft.streaming.StreamApply.sessionCounts(
        graft.Tables.events(spark, sf), "ts", "user_id", gap = "30 minutes")
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_sessions"),
        sort_array(collect_list("n_events")).as("sizes"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getSeq[Long](2))).toMap
    assert(viaLag == viaNative,
      s"formulations disagree: ${viaLag.toSeq.diff(viaNative.toSeq).take(3)}")
  }

  test("two-phase distinct equals direct distinct count") {
    val twoPhase = Sessions.distinctTypes(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val direct = graft.Tables.events(spark, sf)
      .groupBy("user_id").agg(countDistinct("event_type").as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(twoPhase == direct)
  }

  test("k4 funnel depths match a per-user sequential fold") {
    import org.apache.spark.sql.functions._
    val evs = graft.Tables.events(spark, sf)
      .select("user_id", "event_type", "ts", "value").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getTimestamp(2).getTime,
        r.getDouble(3)))
    val byUser = evs.groupBy(_._1)
    val expected = byUser.map { case (_, es) =>
      val t1 = es.filter(_._2 == "signup").map(_._3).minOption
      val t2 = t1.flatMap(t => es.filter(e =>
        e._2 == "click" && e._4 > 200 && e._3 > t).map(_._3).minOption)
      val t3 = t2.flatMap(t => es.filter(e =>
        e._2 == "purchase" && e._4 > 400 && e._3 > t).map(_._3).minOption)
      if (t3.isDefined) 3 else if (t2.isDefined) 2
      else if (t1.isDefined) 1 else 0
    }.groupBy(identity).map { case (d, us) => d -> us.size.toLong }
    val got = Sessions.funnel(spark, sf).collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(got == expected, s"got=$got expected=$expected")
  }

  test("k5 retention cohorts match a per-user week fold") {
    import org.apache.spark.sql.functions._
    val epoch = java.time.LocalDate.parse("2024-01-01").toEpochDay
    val weeks = graft.Tables.events(spark, sf)
      .select("user_id", "ts").collect()
      .map { r =>
        val day = r.getTimestamp(1).toInstant
          .atZone(java.time.ZoneOffset.UTC).toLocalDate.toEpochDay
        (r.getLong(0), (day - epoch) / 7)
      }.distinct
    val cohort = weeks.groupBy(_._1).map { case (u, ws) => u -> ws.map(_._2).min }
    val expected = weeks.groupBy { case (u, w) => (cohort(u), w - cohort(u)) }
      .map { case (k, vs) => k -> vs.size.toLong }
    val got = Sessions.retentionCohorts(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(got == expected, s"got=$got expected=$expected")
  }

  test("k7 transitions equal a per-user sequential fold; rows sum to ~1") {
    import org.apache.spark.sql.functions._
    val ev = graft.Tables.events(spark, sf)
      .select("user_id", "event_id", "event_type").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    val brute = ev.groupBy(_._1).toSeq.flatMap { case (_, rows) =>
      val types = rows.sortBy(_._2).map(_._3).toSeq
      types.zip(types.drop(1))
    }.groupBy(p => p).map { case (p, o) => p -> o.size.toLong }
    val got = Sessions.transitions(spark, sf).collect()
      .map(r => ((r.getString(0), r.getString(1)), (r.getLong(2), r.getLong(3))))
      .toMap
    assert(got.keySet == brute.keySet, "transition pair sets differ")
    for ((p, (n, _)) <- got)
      assert(n == brute(p), s"count differs for $p")
    // per from-state, probabilities are n*1e6 div total: the floor sum
    // lands within |to-states| of exactly 1.0
    for ((from, rows) <- got.toSeq.groupBy(_._1._1)) {
      val pSum = rows.map(_._2._2).sum
      assert(pSum <= 1000000L && pSum > 1000000L - rows.size,
        s"$from: probability mass $pSum out of bounds")
    }
  }

  test("k11 top paths equal a per-user trigram fold; shares sum to ~1") {
    import org.apache.spark.sql.functions._
    val ev = graft.Tables.events(spark, sf)
      .select("user_id", "event_id", "event_type").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    val brute = ev.groupBy(_._1).toSeq.flatMap { case (_, rows) =>
      val types = rows.sortBy(_._2).map(_._3).toSeq
      types.lazyZip(types.drop(1)).lazyZip(types.drop(2)).toSeq
    }.groupBy(identity).map { case (t, o) => t -> o.size.toLong }
    val total = brute.values.sum
    val got = Sessions.topPaths(spark, sf).collect()
      .map(r => ((r.getString(0), r.getString(1), r.getString(2)),
        (r.getLong(3), r.getLong(4)))).toMap
    assert(got.keySet == brute.keySet, "trigram sets differ")
    for ((t, (n, share)) <- got) {
      assert(n == brute(t), s"count differs for $t")
      assert(share == n * 1000000L / total, s"share differs for $t")
    }
    // floor shares land within |paths| of exactly 1.0
    val sSum = got.values.map(_._2).sum
    assert(sSum <= 1000000L && sSum > 1000000L - got.size,
      s"share mass $sSum out of bounds")
  }

  test("k6 concurrency equals counting sessions per epoch brute-force") {
    import org.apache.spark.sql.functions._
    val epochUs = 1800000000L
    val bounds = Sessions.sessionize(spark, sf)
      .join(graft.Tables.events(spark, sf).select("event_id", "ts"), Seq("event_id"))
      .groupBy("user_id", "session_no")
      .agg(min(unix_micros(col("ts"))).as("s"), max(unix_micros(col("ts"))).as("e"))
      .collect().map(r => (r.getLong(2), r.getLong(3)))
    val expected = bounds
      .flatMap { case (s, e) => (s / epochUs) to (e / epochUs) }
      .groupBy(identity).map { case (ep, xs) => ep -> xs.length.toLong }
    val got = Sessions.concurrency(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(got == expected,
      s"missing=${expected.toSet -- got.toSet} extra=${got.toSet -- expected.toSet}")
    // every session contributes at least its own epoch
    assert(got.values.sum >= bounds.length.toLong)
  }

  test("k8 conversion-lag bands match a per-user first-view/first-purchase fold") {
    def usOf(t: java.sql.Timestamp): Long =
      t.getTime * 1000L + (t.getNanos % 1000000) / 1000L
    val evs = graft.Tables.events(spark, sf)
      .select("user_id", "event_type", "ts").collect()
      .map(r => (r.getLong(0), r.getString(1), usOf(r.getTimestamp(2))))
    val lags = evs.groupBy(_._1).flatMap { case (_, es) =>
      for {
        v <- es.filter(_._2 == "view").map(_._3).minOption
        p <- es.filter(e => e._2 == "purchase" && e._3 > v).map(_._3).minOption
      } yield p - v
    }.toSeq
    val expected = lags.groupBy(_ / 86400000000L).map { case (band, ls) =>
      (band, (ls.size.toLong, ls.min, ls.max)) }
    val got = Sessions.conversionLag(spark, sf).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got == expected,
      s"missing=${expected.toSet -- got.toSet} extra=${got.toSet -- expected.toSet}")
  }

  test("k9 decay score equals a sequential integer fold; decay is monotone") {
    import org.apache.spark.sql.functions._
    val evs = graft.Tables.events(spark, sf)
      .select(col("user_id"), col("value"), unix_micros(col("ts")).as("us"))
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2)))
    val head = evs.map(_._3).max
    val expected = evs.groupBy(_._1).map { case (u, es) =>
      val score = es.map { case (_, v, us) =>
        val age = math.min((head - us) / 86400000000L, 20L)
        math.floor(v * 1000000).toLong / (1L << age)
      }.sum
      u -> ((es.length.toLong, score))
    }
    val got = Sessions.decayScore(spark, sf).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got == expected)
    // a positive-value event aged one extra day never contributes more
    val v = 123.456
    def c(days: Long) =
      math.floor(v * 1000000).toLong / (1L << math.min(days, 20L))
    assert((0L to 25L).map(c).sliding(2).forall(w => w(0) >= w(1)))
  }

  test("k10 outliers equal the brute-force |z| > 3 set, computed in BigInt") {
    import org.apache.spark.sql.functions._
    val evs = graft.Tables.events(spark, sf)
      .select(col("user_id"), col("event_id"), col("value"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val expected = evs.groupBy(_._1).toSeq.flatMap { case (_, es) =>
      val vs = es.map(e => BigInt(math.floor(e._3 * 1000000).toLong))
      val n = BigInt(es.length); val s = vs.sum
      val q = vs.map(x => x * x).sum
      es.zip(vs).collect {
        case ((_, id, _), v) if (n * v - s).pow(2) > 9 * (n * q - s * s) => id
      }
    }.toSet
    val got = Sessions.zscoreOutliers(spark, sf).collect()
      .map(_.getLong(1)).toSet
    assert(expected.nonEmpty, "k10 threshold vacuous at test SF")
    assert(got == expected,
      s"missing=${expected -- got} extra=${got -- expected}")

    // decimal(38,0) magnitude envelope (see zscoreOutliers doc): the
    // largest product is dev^2 <= (2 n |v|max)^2, which must stay inside
    // 38 digits — overflow is a SILENT null->false drop under non-ANSI
    // mode, so measure the actual bound from the data and fail loudly
    // with a full order of magnitude to spare.
    val worst = evs.groupBy(_._1).values.map { es =>
      val vmax = es.map(e => BigInt(math.abs(
        math.floor(e._3 * 1000000).toLong))).max
      (BigInt(2) * es.length * vmax).pow(2)
    }.max
    assert(worst < BigInt(10).pow(37),
      s"k10 dev^2 magnitude $worst within 10x of decimal(38,0) overflow")
  }

  test("k12: weights partition 1e6 per purchase; bucketed join equals brute range join") {
    import org.apache.spark.sql.functions._
    val got = Sessions.attribution(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
    assert(got.nonEmpty, "no attributed purchases at test SF — vacuous")
    val byP = got.groupBy(_._1)
    for ((pid, touches) <- byP) {
      assert(touches.map(_._5).sum == 1000000L, s"purchase $pid weights don't partition 1e6")
      assert(touches.map(_._2).distinct.length == touches.length,
        s"purchase $pid: duplicate click pair (bucketing double-count)")
      assert(touches.map(_._3).sorted.toSeq == (1L to touches.length.toLong),
        s"purchase $pid: ranks not 1..n")
      assert(touches.forall(_._4 == touches.length.toLong))
    }
    // brute pair recount: plain per-user range condition
    val ev = graft.Tables.events(spark, sf)
      .select(col("user_id"), col("event_id"), col("event_type"),
        unix_micros(col("ts")).as("us")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
    val byUser = ev.groupBy(_._1)
    val brute = byUser.toSeq.flatMap { case (_, xs) =>
      for {
        p <- xs.toSeq if p._3 == "purchase"
        c <- xs.toSeq if c._3 == "click" &&
          p._4 >= c._4 && p._4 - c._4 <= 604800000000L
      } yield (p._2, c._2)
    }.toSet
    assert(got.map(t => (t._1, t._2)).toSet == brute,
      "bucketed pair set diverges from the brute range join")
  }

  test("k13 RFM segments equal a brute ntile-free fold; no global sort in the plan") {
    import org.apache.spark.sql.functions._
    val df = Sessions.rfmSegments(spark, sf)
    val got = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)) -> ((r.getLong(3), r.getLong(4))))
      .toMap
    // brute: per-user metrics, boundaries as the ceil(k·n/5)-th smallest,
    // quintile = 1 + strict-greater count over the 4 boundaries
    val ev = graft.Tables.events(spark, sf)
      .select(col("user_id"), unix_micros(col("ts")).as("us"),
        col("event_type"), col("value")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getDouble(3)))
    val anchor = ev.map(_._2).max
    val um = ev.groupBy(_._1).map { case (u, xs) =>
      val rec = (anchor - xs.map(_._2).max) / 86400000000L
      val freq = xs.length.toLong
      val mon = xs.filter(_._3 == "purchase")
        .map(x => math.floor(x._4 * 100).toLong).sum
      (u, rec, freq, mon)
    }.toSeq
    def bounds(vs: Seq[Long]): Seq[Long] = {
      val s = vs.sorted; val n = s.length
      (1 to 4).map(k => s((k * n + 4) / 5 - 1))
    }
    val (rb, fb, mb) = (bounds(um.map(_._2)), bounds(um.map(_._3)), bounds(um.map(_._4)))
    def q(v: Long, bs: Seq[Long]): Long = 1L + bs.count(v > _)
    val expected = um.groupBy(x => (q(x._2, rb), q(x._3, fb), q(x._4, mb)))
      .map { case (k, xs) => k -> ((xs.length.toLong, xs.map(_._4).sum)) }
    assert(got == expected, s"segments diverge:\n got=$got\n exp=$expected")
    assert(got.keys.forall { case (a, b, c) =>
      Seq(a, b, c).forall(x => x >= 1L && x <= 5L) })
    assert(got.values.map(_._1).sum == um.length.toLong)
    // the point of the histogram-refine shape: NO range-partitioned
    // global sort of the user frame anywhere in the plan
    val p = df.queryExecution.executedPlan.toString.toLowerCase
    assert(!p.contains("rangepartitioning"), s"global sort in k13 plan:\n$p")
  }

  test("k14 stickiness equals a driver fold; ratio bounded by its definition") {
    val got = Sessions.stickiness(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).sortBy(_._1)
    val evs = graft.Tables.events(spark, sf)
      .select(col("user_id"), expr("unix_micros(ts) DIV 86400000000").as("day"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val udw = evs.map { case (u, d) => (u, d, d / 7) }.distinct
    val expected = udw.groupBy(_._3).map { case (w, xs) =>
      val dauSum = xs.groupBy(_._2).values.map(_.map(_._1).distinct.length.toLong).sum
      val nDays = xs.map(_._2).distinct.length.toLong
      val wau = xs.map(_._1).distinct.length.toLong
      (w, nDays, dauSum, wau, dauSum * 1000000L / (wau * nDays))
    }.toSeq.sortBy(_._1)
    assert(got.toSeq == expected, s"stickiness diverges:\n got=${got.toSeq}\n exp=$expected")
    // bounds: a weekly active is active on >= 1 of the observed days and
    // <= all of them
    for ((w, nDays, dauSum, wau, ppm) <- got) {
      assert(dauSum >= wau && dauSum <= wau * nDays, s"week $w impossible mass")
      assert(ppm >= 1000000L / nDays && ppm <= 1000000L, s"week $w ratio out of range")
    }
    // non-vacuous: daily habit strength must differ from full attendance
    assert(got.exists(_._5 < 1000000L), "every user active every day — vacuous")
  }

  test("k15 user growth equals a driver fold; identities hold") {
    val got = Sessions.userGrowth(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).sortBy(_._1)
    val evs = graft.Tables.events(spark, sf)
      .select(col("user_id"), expr("unix_micros(ts) DIV 86400000000").as("day"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val firstOf = evs.groupBy(_._1).map { case (u, xs) => u -> xs.map(_._2).min }
    val days = evs.map(_._2).distinct.sorted
    var cum = 0L
    val expected = days.map { d =>
      val dau = evs.filter(_._2 == d).map(_._1).distinct.length.toLong
      val nu = firstOf.values.count(_ == d).toLong
      cum += nu
      (d, dau, nu, dau - nu, cum)
    }
    assert(got.toSeq == expected.toSeq,
      s"growth diverges:\n got=${got.take(3).toSeq}\n exp=${expected.take(3).toSeq}")
    // identities: day-1 actives are all new; the curve ends at the true
    // distinct-user total; returning never negative
    assert(got.head._3 == got.head._2, "day one must be all new users")
    assert(got.last._5 == firstOf.size.toLong, "curve must end at total distinct users")
    assert(got.forall(_._4 >= 0L))
    // non-vacuous: the corpus must actually contain returning users
    assert(got.exists(_._4 > 0L), "no returning users — vacuous decomposition")
  }

  test("k16 L28 histogram equals a driver recount and conserves users") {
    val got = Sessions.engagementHistogram(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    val evs = graft.Tables.events(spark, sf)
      .select(col("user_id"), expr("unix_micros(ts) DIV 86400000000").as("day"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val maxDay = evs.map(_._2).max
    val inWin = evs.filter(_._2 > maxDay - 28).distinct
    val expected = inWin.groupBy(_._1).map(_._2.map(_._2).distinct.length.toLong)
      .groupBy(identity).map { case (d, us) => (d, us.size.toLong) }
      .toArray.sortBy(_._1)
    assert(got.toSeq == expected.toSeq)
    // buckets stay inside the window; user total is conserved
    assert(got.forall { case (d, _) => d >= 1L && d <= 28L })
    assert(got.map(_._2).sum == inWin.map(_._1).distinct.length.toLong)
    // non-vacuous: a habit spine AND a casual tail must both exist
    assert(got.length > 1, "degenerate single-bucket histogram")
  }

  test("k17 CEP funnel equals a driver regex over the ordered journey") {
    val got = Sessions.cepFunnel(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getBoolean(3)))
      .toMap
    val evs = graft.Tables.events(spark, sf)
      .select(col("user_id"), expr("unix_micros(ts)").as("us"),
        col("event_id"), col("event_type"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getString(3)))
    val chOf = Map("signup" -> 's', "click" -> 'c', "view" -> 'v',
      "purchase" -> 'p').withDefaultValue('e')
    val rx = "s[cv]*p".r
    val expect = evs.groupBy(_._1).map { case (u, xs) =>
      val j = xs.sortBy(x => (x._2, x._3)).map(x => chOf(x._4)).mkString
      u -> (j.length.toLong, rx.findAllIn(j).size.toLong,
        rx.findAllIn(j).nonEmpty)
    }
    assert(got == expect)
    // identities: conversions bounded by signups and purchases; the
    // verdict restates the count; the pattern fires somewhere
    for ((u, (_, conv, isConv)) <- got) {
      val types = evs.filter(_._1 == u).map(_._4)
      assert(conv <= math.min(types.count(_ == "signup"),
        types.count(_ == "purchase")).toLong, s"user $u overcounts")
      assert(isConv == (conv > 0L))
    }
    assert(got.values.map(_._2).sum > 0L, "no conversion anywhere — vacuous")
    assert(got.values.map(_._2).toSet.size > 1,
      "every user converts identically — pattern proves nothing")
  }

  test("k18 hazard curve equals a driver survival fold; censoring real") {
    val dayUs = 86400000000L
    val evs = graft.Tables.events(spark, sf)
      .select(col("user_id"), col("event_type"), expr("unix_micros(ts)").as("us"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val maxUs = evs.map(_._3).max
    val horizons = evs.groupBy(_._1).toSeq.flatMap { case (_, xs) =>
      val sUs = xs.filter(_._2 == "signup").map(_._3)
      if (sUs.isEmpty) None
      else {
        val s0 = sUs.min
        val p = xs.filter(x => x._2 == "purchase" && x._3 >= s0).map(_._3)
        val d = if (p.isEmpty) None else Some((p.min - s0) / dayUs)
        Some((d, d.getOrElse((maxUs - s0) / dayUs)))
      }
    }
    val maxH = horizons.map(_._2).max
    val expected = (0L to maxH).map { k =>
      val atRisk = horizons.count(_._2 >= k).toLong
      val nConv = horizons.count(_._1.contains(k)).toLong
      val cum = horizons.count(h => h._1.exists(_ <= k)).toLong
      k -> ((atRisk, nConv, nConv * 1000000L / atRisk, cum))
    }.toMap
    val got = Sessions.hazardCurve(spark, sf).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))).toMap
    assert(got == expected, s"hazard diverged: got=$got exp=$expected")
    assert(got(0L)._1 == horizons.size.toLong)
    assert(got.values.map(_._2).sum == horizons.count(_._1.isDefined).toLong)
    // the corpus converts every signup, so CENSORING — the reason
    // survival analysis exists — is driven on a spec-built cohort:
    // u1 converts day 1; u2 never converts, censored at day 3 (the
    // corpus horizon set by u3's late event); u3 converts day 0
    import spark.implicits._
    val dayU = 86400000000L
    val synth = Seq(
      (1L, "signup", 0L), (1L, "purchase", dayU + 1L),
      (2L, "signup", 0L), (2L, "click", dayU),
      (3L, "signup", 2 * dayU), (3L, "purchase", 2 * dayU + 5L),
      (3L, "view", 5 * dayU)
    ).toDF("user_id", "event_type", "us")
    val sg = Sessions.hazardCurveOf(synth).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))).toMap
    // day 0: 3 at risk, u3 converts; day 1: u1 converts (u3 left as
    // converted); days 2..5: only u2 remains, never converting — it
    // stays AT RISK through its censoring horizon (corpus max = u3's
    // day-5 event ⇒ horizon (5·day − 0)/day = 5) and is never counted
    // as a non-conversion
    assert(sg == Map(
      0L -> ((3L, 1L, 333333L, 1L)),
      1L -> ((2L, 1L, 500000L, 2L)),
      2L -> ((1L, 0L, 0L, 2L)),
      3L -> ((1L, 0L, 0L, 2L)),
      4L -> ((1L, 0L, 0L, 2L)),
      5L -> ((1L, 0L, 0L, 2L))),
      s"censored cohort diverged: $sg")
  }

  test("k20 activation-cohort LTV equals a driver fold; matrix triangular") {
    val evs = graft.Tables.events(spark, sf)
      .selectExpr("user_id", "event_type",
        "CAST(datediff(CAST(ts AS DATE), DATE'2024-01-01') AS BIGINT) DIV 7 AS week",
        "CAST(floor(value * 100) AS BIGINT) AS cents")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getLong(3)))
    val cohort = evs.filter(e => e._2 == "purchase" && e._4 > 20000L)
      .groupBy(_._1).map { case (u, xs) => u -> xs.map(_._3).min }
    val maxw = evs.map(_._3).max
    val expected = cohort.values.toSeq.distinct.flatMap { cw =>
      val users = cohort.filter(_._2 == cw).keySet
      val n = users.size.toLong
      var cum = 0L
      (0L to (maxw - cw)).map { off =>
        val rev = evs.filter(e => users(e._1) && e._2 == "purchase" &&
          e._3 == cw + off && e._3 >= cw).map(_._4).sum
        cum += rev
        (cw, off) -> ((n, rev, cum, cum * 1000000L / n))
      }
    }.toMap
    val got = Sessions.cohortLtv(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> ((r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))).toMap
    assert(got == expected, s"LTV diverged: got=${got.toSeq.sortBy(_._1).take(3)}")
    // triangular spine, monotone curves, >1 cohort (else the panel is 1-D)
    val cohorts = got.keySet.map(_._1)
    assert(cohorts.size > 1, "single cohort — the matrix proves nothing")
    cohorts.foreach { cw =>
      val offs = got.keySet.filter(_._1 == cw).map(_._2)
      assert(offs == (0L to (maxw - cw)).toSet, s"cohort $cw spine holes")
      val curve = offs.toSeq.sorted.map(o => got((cw, o))._3)
      assert(curve == curve.sorted, s"cohort $cw cum not monotone")
    }
  }

  test("k19 markov backtest equals a driver fold; rule is the train argmax") {
    val evs = graft.Tables.events(spark, sf)
      .select(col("user_id"), col("event_id"), col("event_type"),
        expr("unix_micros(ts)").as("us"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        r.getLong(3)))
    val mid = (evs.map(_._4).min + evs.map(_._4).max) / 2
    val steps = evs.groupBy(_._1).toSeq.flatMap { case (_, xs) =>
      val o = xs.sortBy(_._2)
      o.zip(o.tail).map { case (a, b) => (a._3, b._3, a._4) }
    }
    val train = steps.filter(_._3 < mid).groupBy(s => (s._1, s._2))
      .map { case (k, v) => k -> v.size.toLong }
    val model = train.keys.map(_._1).toSeq.distinct.map { ft =>
      val rows = train.filter(_._1._1 == ft).toSeq
        .map { case ((_, tt), n) => (tt, n) }
      val pred = rows.minBy { case (tt, n) => (-n, tt) }._1
      ft -> ((pred, rows.map(_._2).sum))
    }.toMap
    val expected = steps.filter(_._3 >= mid).groupBy(_._1)
      .filter(x => model.contains(x._1))
      .map { case (ft, xs) =>
        val (pred, nTrain) = model(ft)
        val hits = xs.count(_._2 == pred).toLong
        ft -> ((pred, nTrain, xs.size.toLong, hits,
          hits * 1000000L / xs.size))
      }
    val got = Sessions.markovEval(spark, sf).collect()
      .map(r => r.getString(0) -> ((r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    assert(got == expected, s"backtest diverged: got=$got exp=$expected")
    assert(got.nonEmpty && got.values.exists(_._4 > 0L))
  }
}
