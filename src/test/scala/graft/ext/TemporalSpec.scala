package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Semantics of the as-of join (vs a brute-force reference) and the SCD2
  * interval invariants. The DuckDB oracle pins exact values at sf0.01;
  * these pin the operator contract on controlled inputs.
  */
class TemporalSpec extends SparkSpec {

  test("asofJoin picks the latest right row at or before each left ts") {
    import spark.implicits._
    val left = Seq(
      (1, 10L, "l10"), (1, 20L, "l20"), (1, 5L, "l5"),
      (2, 7L, "l7")
    ).toDF("k", "t", "lv")
    val right = Seq(
      (1, 10L, "r10"), (1, 15L, "r15"),
      (2, 8L, "r8") // after the only left row of key 2
    ).toDF("k", "t", "rv")
    val out = Temporal.asofJoin(left, right, "k", "t", Seq("rv"))
      .select("k", "t", "lv", "asof_rv")
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getString(2),
        Option(r.getString(3)))).toSet
    assert(out == Set(
      (1, 5L, "l5", None),          // before any right row
      (1, 10L, "l10", Some("r10")), // equal ts is visible (inclusive)
      (1, 20L, "l20", Some("r15")), // latest of the two earlier rows
      (2, 7L, "l7", None)           // right row exists but is later
    ))
  }

  test("asofJoin matches a brute-force max-ts-per-left computation on events") {
    val out = Temporal.asofClickPurchase(spark, sf)
    val ev = graft.Tables.events(spark, sf)
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("event_id"), col("user_id"), col("ts"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id").as("pu"), col("ts").as("pts"))
    val brute = clicks.join(purchases,
        col("user_id") === col("pu") && col("pts") <= col("ts"), "left")
      .groupBy("event_id").agg(max("pts").as("expected_pts"))
    val joined = out.join(brute, Seq("event_id"), "left")
    assert(joined.filter(
      (col("purchase_ts").isNull && col("expected_pts").isNotNull) ||
      (col("purchase_ts").isNotNull && col("purchase_ts") =!= col("expected_pts"))
    ).count() == 0)
    assert(out.count() == clicks.count(), "as-of must preserve left cardinality")
  }

  test("asofJoin matches whole rows — null payload fields are not stitched across rows") {
    import spark.implicits._
    val left = Seq((1, 25L, "l")).toDF("k", "t", "lv")
    val right = Seq(
      (1, 10L, Some(5.0), Some("x")),
      (1, 20L, None: Option[Double], Some("y")) // latest row has a null field
    ).toDF("k", "t", "a", "b")
    val r = Temporal.asofJoin(left, right, "k", "t", Seq("a", "b"))
      .select("asof_a", "asof_b").collect().head
    // ASOF semantics: the WHOLE latest row (null, "y") — never (5.0, "y"),
    // a combination that exists in no right row
    assert(r.isNullAt(0) && r.getString(1) == "y", s"stitched payload: $r")
    // an all-null payload row is still a match, not invisible
    val right2 = Seq((1, 20L, None: Option[Double], None: Option[String]))
      .toDF("k", "t", "a", "b")
    val r2 = Temporal.asofJoin(left, right2, "k", "t", Seq("a", "b"))
      .select("asof_a", "asof_b").collect().head
    assert(r2.isNullAt(0) && r2.isNullAt(1))
  }

  test("asofJoin equals an in-memory reference on randomized event sets") {
    import spark.implicits._
    val rnd = new scala.util.Random(42) // fixed seed — deterministic CI
    for (trial <- 1 to 5) {
      val nKeys = 1 + rnd.nextInt(4)
      val left = Seq.fill(30)((rnd.nextInt(nKeys), rnd.nextInt(50).toLong, rnd.nextInt(1000)))
        .distinctBy(r => (r._1, r._2)) // unique (key, ts) — as-of precondition
        .toDF("k", "t", "lv")
      val right = Seq.fill(20)((rnd.nextInt(nKeys), rnd.nextInt(50).toLong, rnd.nextInt(1000)))
        .distinctBy(r => (r._1, r._2))
        .toDF("k", "t", "rv")
      val got = Temporal.asofJoin(left, right, "k", "t", Seq("rv"))
        .select("k", "t", "asof_rv")
        .collect().map(r => (r.getInt(0), r.getLong(1)) ->
          (if (r.isNullAt(2)) None else Some(r.getInt(2)))).toMap
      val rightRows = right.collect().map(r => (r.getInt(0), r.getLong(1), r.getInt(2)))
      val expected = left.collect().map { lr =>
        val (k, t) = (lr.getInt(0), lr.getLong(1))
        val matches = rightRows.filter(rr => rr._1 == k && rr._2 <= t)
        (k, t) -> (if (matches.isEmpty) None
                   else Some(matches.maxBy(_._2)._3))
      }.toMap
      assert(got == expected, s"trial $trial: diff=${
        (got.toSet diff expected.toSet).take(3)}")
    }
  }

  test("scd2 intervals tile each key's timeline without overlap") {
    val h = Temporal.scd2History(spark, sf)
    // exactly one current row per key
    val currents = h.filter(col("is_current")).groupBy("user_id").count()
    assert(currents.filter(col("count") =!= 1).count() == 0)
    // each non-current row's valid_to equals the next row's valid_from
    // (lead construction makes this true by definition; assert no
    // zero-length or inverted intervals instead)
    assert(h.filter(col("valid_to").isNotNull &&
      col("valid_to") < col("valid_from")).count() == 0)
    // row count is preserved: every event is a version
    assert(h.count() == graft.Tables.events(spark, sf).count())
  }

  test("a3 resample equals a brute-force per-day forward fill") {
    val events = graft.Tables.events(spark, sf)
      .select("user_id", "ts", "event_id", "value").collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(2), r.getDouble(3)))
    val byUser = events.groupBy(_._1)
    val days = (0 until 30).map(d =>
      java.sql.Timestamp.valueOf(f"2024-01-${d + 1}%02d 00:00:00"))
    val expected = byUser.keySet.flatMap { u =>
      val evs = byUser(u)
      days.map { day =>
        // latest event at or before the day start; ties on ts break by
        // the highest event_id (the max_by/arg_max reduction)
        val eligible = evs.filter(!_._2.after(day))
        val v =
          if (eligible.isEmpty) None
          else Some(eligible.maxBy(e =>
            (e._2.getTime, e._2.getNanos.toLong, e._3))._4)
        (u, day, v)
      }
    }
    val got = Temporal.resampleFfill(spark, sf).collect()
      .map(r => (r.getLong(0), r.getTimestamp(1),
        if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toSet
    assert(got == expected,
      s"missing=${(expected -- got).take(5)}, extra=${(got -- expected).take(5)}")
  }

  test("a4 OHLC bars equal a per-(user, day) sequential fold") {
    val events = graft.Tables.events(spark, sf)
      .select("user_id", "ts", "event_id", "value").collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(2), r.getDouble(3)))
    def dayOf(t: java.sql.Timestamp): Long = t.getTime - Math.floorMod(t.getTime, 86400000L)
    val expected = events.groupBy(e => (e._1, dayOf(e._2))).map { case ((u, d), es) =>
      // open/close read the instant-reduced series: at a tied instant
      // the highest event_id wins before first/last are taken
      val reduced = es.groupBy(e => (e._2.getTime, e._2.getNanos))
        .map { case (_, g) => g.maxBy(_._3) }.toSeq
        .sortBy(e => (e._2.getTime, e._2.getNanos.toLong))
      (u, d, reduced.head._4, es.map(_._4).max, es.map(_._4).min,
        reduced.last._4, es.size.toLong)
    }.toSet
    val got = Temporal.ohlcBars(spark, sf).collect()
      .map(r => (r.getLong(0), r.getTimestamp(1).getTime, r.getDouble(2),
        r.getDouble(3), r.getDouble(4), r.getDouble(5), r.getLong(6))).toSet
    assert(got == expected,
      s"missing=${(expected -- got).take(3)}, extra=${(got -- expected).take(3)}")
  }

  test("a5 time-weighted averages equal a per-(user, day) segment fold") {
    val events = graft.Tables.events(spark, sf)
      .select("user_id", "ts", "event_id", "value").collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(2), r.getDouble(3)))
    def usOf(t: java.sql.Timestamp): Long =
      t.getTime * 1000L + (t.getNanos % 1000000) / 1000L
    def dayOf(t: java.sql.Timestamp): Long = t.getTime - Math.floorMod(t.getTime, 86400000L)
    val expected = events.groupBy(e => (e._1, dayOf(e._2))).flatMap { case ((u, d), es) =>
      val reduced = es.groupBy(e => usOf(e._2))
        .map { case (us, g) => (us, g.maxBy(_._3)._4) }.toSeq.sortBy(_._1)
      val segs = reduced.zip(reduced.drop(1)).map { case ((us, v), (nus, _)) =>
        (nus - us, Math.round(v * 100)) }
      if (segs.isEmpty) None
      else {
        val den = segs.map(_._1).sum
        val num = segs.map { case (w, c) => w * c }.sum
        Some((u, d, segs.size.toLong, den, num, num.toDouble / den.toDouble / 100.0))
      }
    }.toSet
    val got = Temporal.twaBars(spark, sf).collect()
      .map(r => (r.getLong(0), r.getTimestamp(1).getTime, r.getLong(2),
        r.getLong(3), r.getLong(4), r.getDouble(5))).toSet
    assert(got == expected,
      s"missing=${(expected -- got).take(3)}, extra=${(got -- expected).take(3)}")
  }

  test("a6 forward as-of equals brute-force next-purchase lookup") {
    import org.apache.spark.sql.functions._
    val evs = graft.Tables.events(spark, sf)
      .select(col("user_id"), col("event_type"), col("event_id"),
        col("value"), unix_micros(col("ts")).as("us"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getDouble(3), r.getLong(4)))
    // purchases pre-reduced per (user, instant) by max event_id
    val purch = evs.filter(_._2 == "purchase")
      .groupBy(e => (e._1, e._5))
      .map { case ((u, us), es) => (u, us, es.maxBy(_._3)._4) }.toSeq
    val expected = evs.filter(_._2 == "click").map { case (u, _, id, v, us) =>
      val next = purch.filter(p => p._1 == u && p._2 >= us)
        .sortBy(_._2).headOption
      (id, u, us, v, next.map(_._2), next.map(_._3))
    }.toSet
    val got = Temporal.asofForwardClickNext(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3),
        if (r.isNullAt(4)) None else Some(r.getLong(4)),
        if (r.isNullAt(5)) None else Some(r.getDouble(5)))).toSet
    assert(got == expected,
      s"missing=${(expected -- got).take(3)}, extra=${(got -- expected).take(3)}")
    // forward matches must exist somewhere AND be absent somewhere for
    // the left-join semantics to be exercised
    assert(got.exists(_._5.isDefined) && got.exists(_._5.isEmpty))
  }

  test("a9 calendar fill: complete spine × types, zero-filled, counts exact") {
    import org.apache.spark.sql.functions._
    val dayUs = 86400000000L
    val ev = graft.Tables.events(spark, sf)
      .select(unix_micros(date_trunc("day", col("ts"))), col("event_type"))
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val days = ev.map(_._1)
    val spine = (days.min to days.max by dayUs)
    val types = ev.map(_._2).distinct
    val counts = ev.groupBy(identity).map { case (k, xs) => k -> xs.length.toLong }
    val got = Temporal.calendarFill(spark, sf).collect().map { r =>
      (r.getTimestamp(0).getTime * 1000L, r.getString(1)) -> r.getLong(2)
    }.toMap
    // the frame is EXACTLY the spine × type grid
    assert(got.size == spine.length * types.length,
      s"${got.size} rows != ${spine.length} days x ${types.length} types")
    for (d <- spine; t <- types)
      assert(got((d, t)) == counts.getOrElse((d, t), 0L), s"($d,$t) count")
    // totals conserve: densification adds only zeros
    assert(got.values.sum == ev.length.toLong, "zero fill altered totals")
  }

  test("a7 interpolation equals brute force; exact at event instants; bounded") {
    import org.apache.spark.sql.functions._
    val evs = graft.Tables.events(spark, sf)
      .select(col("user_id"), unix_micros(col("ts")).as("us"),
        col("event_id"), col("value"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    val inst = evs.groupBy(e => (e._1, e._2)).map { case ((u, us), es) =>
      (u, us, math.round(es.maxBy(_._3)._4 * 1000000))
    }.toSeq
    val dayUs = 86400000000L
    val day0 = java.time.LocalDateTime.parse("2024-01-01T00:00:00")
      .toEpochSecond(java.time.ZoneOffset.UTC) * 1000000L
    val grid = for {
      u <- evs.map(_._1).distinct
      d <- 0 until 30
    } yield (u, day0 + d * dayUs)
    def truncDiv(a: BigInt, b: BigInt): BigInt =
      if (a.signum >= 0) a / b else -((-a) / b) // both engines' stated form
    val expected = grid.flatMap { case (u, t) =>
      val mine = inst.filter(_._1 == u)
      val before = mine.filter(_._2 <= t)
      val after = mine.filter(_._2 >= t)
      if (before.isEmpty || after.isEmpty) None
      else {
        val (_, t0, v0) = before.maxBy(_._2)
        val (_, t1, v1) = after.minBy(_._2)
        val v = if (t1 == t0) BigInt(v0)
          else BigInt(v0) + truncDiv(BigInt(v1 - v0) * BigInt(t - t0), BigInt(t1 - t0))
        Some(((u, t), (t0, t1, v.toLong)))
      }
    }.toMap
    val got = Temporal.resampleInterp(spark, sf).collect()
      .map(r => ((r.getLong(0), r.getTimestamp(1).getTime * 1000L),
        (r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(got == expected,
      s"missing=${(expected.toSet -- got.toSet).take(3)} extra=${(got.toSet -- expected.toSet).take(3)}")
    // interpolated values stay inside [min(v0,v1), max(v0,v1)]
    val instMap = inst.map(i => (i._1, i._2) -> i._3).toMap
    got.foreach { case ((u, _), (t0, t1, v)) =>
      val (v0, v1) = (instMap((u, t0)), instMap((u, t1)))
      assert(v >= math.min(v0, v1) && v <= math.max(v0, v1),
        s"interp $v outside [$v0,$v1] for user $u")
    }
    // a grid point landing exactly on an event instant returns its value
    val exact = got.collect { case ((u, _), (t0, t1, v)) if t0 == t1 => (u, t0, v) }
    exact.foreach { case (u, t0, v) => assert(v == instMap((u, t0))) }
  }

  test("a10 M4 equals a driver fold; extremes' times add over OHLC") {
    val bucketUs = 21600000000L
    val evs = graft.Tables.events(spark, sf)
      .selectExpr("event_type", "unix_micros(ts) AS us", "event_id",
        "CAST(floor(value * 100) AS BIGINT) AS v").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val expected = evs.groupBy(e => (e._1, e._2 / bucketUs)).map {
      case ((t, b), xs) =>
        val f = xs.minBy(e => (e._2, e._3))
        val l = xs.maxBy(e => (e._2, e._3))
        val mn = xs.minBy(e => (e._4, e._2, e._3))
        val mx = xs.maxBy(e => (e._4, e._2, e._3))
        (t, b) -> ((xs.size.toLong, f._4, f._2, l._4, l._2,
          mn._4, mn._2, mx._4, mx._2))
    }
    val got = Temporal.m4Downsample(spark, sf).collect().map { r =>
      (r.getString(0), r.getLong(1)) -> ((r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7),
        r.getLong(8), r.getLong(9), r.getLong(10)))
    }.toMap
    assert(got == expected,
      s"M4 diverged; sample got=${got.take(1)} exp=${expected.take(1)}")
    // the min/max TIMES are information OHLC doesn't carry: in some
    // bucket the extreme is neither the first nor the last point
    assert(got.exists { case (_, (_, _, fUs, _, lUs, _, mnUs, _, mxUs)) =>
      (mnUs != fUs && mnUs != lUs) || (mxUs != fUs && mxUs != lUs)
    }, "extremes always at bucket edges — M4 adds nothing over first/last")
  }
}
