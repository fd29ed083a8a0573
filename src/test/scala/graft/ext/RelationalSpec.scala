package graft.ext

import graft.SparkSpec

/** Plan shapes for the relational-breadth queries: the point of w1 is
  * that five window functions share ONE Window operator (one shuffle,
  * one sort); the point of u1 is that set ops become joins, never
  * driver-side sets.
  */
class RelationalSpec extends SparkSpec {

  test("window suite evaluates all five functions in one window pass") {
    val p = Relational.windowSuite(spark, sf)
      .queryExecution.optimizedPlan.toString
    val windows = "Window \\[".r.findAllIn(p).size
    assert(windows == 1, s"expected one Window operator, plan:\n$p")
  }

  test("set ops plan as semi/anti joins with no driver collection") {
    val p = Relational.setOps(spark, sf)
      .queryExecution.executedPlan.toString
    assert(p.contains("LeftSemi") && p.contains("LeftAnti"),
      s"set ops must compile to semi/anti joins:\n$p")
    val rows = Relational.setOps(spark, sf).collect()
    assert(rows.map(_.getLong(0)).distinct.length == rows.length)
  }

  test("pivot output has one count column per event type, totals match") {
    import org.apache.spark.sql.functions._
    val out = Relational.eventPivot(spark, sf)
    assert(out.columns.toSet ==
      Set("user_id", "n_click", "n_view", "n_purchase", "n_signup", "n_error"))
    val total = out.select((col("n_click") + col("n_view") + col("n_purchase") +
      col("n_signup") + col("n_error")).as("t"))
      .agg(sum("t")).first.getLong(0)
    assert(total == graft.Tables.events(spark, sf).count())
  }

  test("cube emits all four grouping-set levels") {
    import org.apache.spark.sql.functions._
    val out = Relational.typeDayCube(spark, sf).cache()
    try {
      assert(out.filter(col("event_type").isNull && col("weekday").isNull).count() == 1)
      assert(out.filter(col("event_type").isNotNull && col("weekday").isNull).count() > 0)
      assert(out.filter(col("event_type").isNull && col("weekday").isNotNull).count() > 0)
      assert(out.filter(col("event_type").isNotNull && col("weekday").isNotNull).count() > 0)
    } finally out.unpersist()
  }

  test("grouping sets emits exactly the three requested levels, one Expand") {
    import org.apache.spark.sql.functions._
    val out = Relational.groupingSetsTotals(spark, sf).cache()
    try {
      // marginals only: never both keys concrete, grand total exactly once
      assert(out.filter(col("etype") =!= "__all__" && col("weekday") =!= "__all__").count() == 0)
      assert(out.filter(col("etype") === "__all__" && col("weekday") === "__all__").count() == 1)
      assert(out.filter(col("etype") =!= "__all__").count() > 0)
      assert(out.filter(col("weekday") =!= "__all__").count() > 0)
      // one Expand with 3 projections (the requested sets), not cube's 2^k
      val p = out.queryExecution.executedPlan.toString
      assert(p.contains("Expand"), s"grouping sets did not plan an Expand:\n$p")
      val rowsTotal = out.filter(col("etype") === "__all__" && col("weekday") === "__all__")
        .select("n").first.getLong(0)
      assert(rowsTotal == graft.Tables.events(spark, sf).count())
    } finally out.unpersist()
  }

  test("unpivot inverts the pivot and plans as Expand without a new shuffle") {
    import org.apache.spark.sql.functions._
    val melted = Relational.eventUnpivot(spark, sf)
    // re-pivoting the melted frame recovers the original wide rows
    val metrics = Seq("n_click", "n_view", "n_purchase", "n_signup", "n_error")
    val wide = Relational.eventPivot(spark, sf).collect()
      .map(r => r.getLong(0) -> (1 to 5).map(r.getLong).toSeq).toMap
    val back = melted.groupBy("user_id").pivot("metric").sum("n").collect()
      .map(r => r.getLong(0) -> metrics.map(m => r.getLong(r.fieldIndex(m))))
      .toMap
    assert(back == wide)
    // one Expand, and no exchange beyond the pivot aggregation's single one
    val plan = melted.queryExecution.executedPlan.toString
    assert(plan.contains("Expand"), s"no Expand in unpivot plan:\n$plan")
    assert("Exchange".r.findAllIn(plan).size == 1,
      s"unpivot added a shuffle:\n$plan")
  }

  test("x15 LM score equals the brute integer-quantized bigram mean") {
    import org.apache.spark.sql.functions._
    val docs = graft.Tables.documents(spark, sf)
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1).split(" ")))
    val bigrams = docs.flatMap { case (id, ws) =>
      ws.zip(ws.drop(1)).map(b => (id, b))
    }
    val c12 = bigrams.groupBy(_._2).map { case (b, xs) => b -> xs.size.toLong }
    val c1 = bigrams.groupBy(_._2._1).map { case (w, xs) => w -> xs.size.toLong }
    val expected = bigrams.groupBy(_._1).map { case (id, bs) =>
      val ps = bs.map { case (_, b) => c12(b) * 1000000L / c1(b._1) }
      id -> (ps.size.toLong,
        BigDecimal(ps.sum.toDouble / ps.size)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }
    val got = graft.ext.TextAnalysis.lmScore(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(got == expected,
      s"diff=${(got.toSet diff expected.toSet).take(3)}")
  }

  test("u4 bag set ops equal the min/surplus multiset identities") {
    import org.apache.spark.sql.functions._
    // INTERSECT ALL = min of multiplicities; EXCEPT ALL = left surplus
    val counts = graft.Tables.events(spark, sf)
      .filter(col("event_type").isin("click", "view"))
      .groupBy("user_id")
      .agg(
        sum((col("event_type") === "click").cast("long")).as("c"),
        sum((col("event_type") === "view").cast("long")).as("v"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val got = Relational.bagSetOps(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val expected = counts.flatMap { case (u, (c, v)) =>
      val common = math.min(c, v); val surplus = math.max(0L, c - v)
      if (common == 0 && surplus == 0) None else Some(u -> (common, surplus))
    }
    assert(got == expected,
      s"missing=${(expected.toSet -- got.toSet).take(5)}, extra=${(got.toSet -- expected.toSet).take(5)}")
  }

  test("w2 range-frame windows equal a brute trailing-30-min fold") {
    import org.apache.spark.sql.functions._
    val horizon = 1800000000L
    val ev = graft.Tables.events(spark, sf)
      .select(col("event_id"), col("user_id"), unix_micros(col("ts")),
        expr("CAST(floor(value * 100) AS BIGINT)"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val expected = ev.groupBy(_._2).values.flatMap { rows =>
      rows.map { case (id, u, ts, _) =>
        val frame = rows.filter { case (_, _, t2, _) =>
          t2 >= ts - horizon && t2 <= ts }
        (id, u, ts, frame.length.toLong, frame.map(_._4).sum)
      }
    }.toSet
    val df = Relational.timeWindows(spark, sf)
    val got = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSet
    assert(got == expected,
      s"missing=${(expected -- got).take(3)} extra=${(got -- expected).take(3)}")
    // one fused Window over one key exchange, as w1 (AQE's toString
    // repeats the plan as "Initial Plan" — count the final section only)
    val p = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    assert("\\bWindow\\b".r.findAllIn(p).size == 1, s"window not fused:\n$p")
    assert("Exchange".r.findAllIn(p).size == 1, s"extra shuffles:\n$p")
  }

  test("w4 sliding distinct equals a brute per-window fold; windows overlap") {
    import org.apache.spark.sql.functions._
    val step = 900000000L
    val ev = graft.Tables.events(spark, sf)
      .select(col("user_id"), unix_micros(col("ts"))).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val expected = ev.flatMap { case (u, us) =>
      (0L until 4L).map(j => ((us / step) * step - j * step, u))
    }.groupBy(_._1).map { case (ws, xs) =>
      ws -> (xs.length.toLong, xs.map(_._2).distinct.length.toLong)
    }
    val got = Relational.slidingDistinct(spark, sf).collect().map { r =>
      val ws = r.getTimestamp(0).toInstant
      ws.getEpochSecond * 1000000L + ws.getNano / 1000 ->
        (r.getLong(1), r.getLong(2))
    }.toMap
    assert(got == expected,
      s"missing=${(expected.keySet -- got.keySet).take(3)} " +
        s"extra=${(got.keySet -- expected.keySet).take(3)}")
    // a genuinely SLIDING result: some event must land in overlapping
    // windows with different distinct counts, else a plain GROUP BY
    // would have produced the same frame and the test proves nothing
    val sorted = expected.toSeq.sortBy(_._1)
    assert(sorted.sliding(2).exists { case Seq((a, _), (b, _)) => b - a < 3600000000L },
      "no overlapping windows in the corpus — vacuous")
  }

  test("cover-set floor alignment holds for pre-epoch event times") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val step = Relational.SlidingStepUs
    val fan = Relational.SlidingFan
    // negative, positive, and boundary-straddling epochs — truncating
    // div agrees with floor only on the non-negatives, so the negatives
    // are the regression guard
    val us = Seq(-3L * step - 1L, -step, -1L, 0L, 1L, step - 1L, 2L * step + 7L)
    val got = us.toDF("us")
      .select(col("us"), explode(sequence(lit(0L), lit(fan - 1L))).as("j"))
      .select(col("us"), Relational.coverStartUs(col("us"), col("j")).as("ws"))
      .collect().map(r => r.getLong(0) -> r.getLong(1))
      .groupBy(_._1).map { case (u, xs) => u -> xs.map(_._2).toSet }
    for ((u, starts) <- got) {
      assert(starts.size == fan, s"event $u covered by ${starts.size} windows")
      assert(starts.forall(ws => ws % step == 0 || ws % step == -0L),
        s"unaligned start for $u: $starts")
      assert(starts.forall(ws => ws <= u && u < ws + fan * step),
        s"window not containing $u: $starts")
    }
  }
}
