package graft.ext

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal operators over the event stream: as-of join and SCD2 history
  * — the two time-travel primitives a CDC-fed analytics store serves
  * (the reference's OpenSearch index keeps only the latest row per key;
  * these reconstruct "what was true at time t" from the same events).
  *
  * Both are built on the UNION + ordered-window formulation, not a range
  * join: a range/theta join over (key, l.ts >= r.ts) explodes to the
  * cross product per key before filtering, while the union form is one
  * shuffle on the key, one sort per partition, one linear pass — the
  * as-of shape that survives 100 TB (and what AS OF JOIN compiles to in
  * engines that have it natively; DuckDB's ASOF JOIN is the oracle).
  */
object Temporal {

  type Q = (SparkSession, String) => DataFrame

  /** Generic as-of join: for each `left` row, attach `rightPayload`
    * columns from the latest `right` row with the same `key` and
    * `right.ts <= left.ts` (inclusive — right rows at the exact same
    * timestamp are visible, matching `ASOF JOIN ... ON l.ts >= r.ts`).
    * Unmatched left rows keep null payloads (left-join semantics).
    *
    * Implementation: tag right rows 0 and left rows 1, union, and take
    * `last(payload, ignoreNulls)` over an ordered running window per
    * key. The tag breaks timestamp ties so a same-instant right row
    * sorts before the left row that should see it. The payload travels
    * as ONE struct — filling each column independently would stitch
    * values from DIFFERENT right rows whenever a payload field is null
    * (and skip all-null rows entirely), diverging from row-level ASOF
    * semantics; the struct is non-null exactly when a right row exists,
    * so the match is always one whole row.
    */
  def asofJoin(left: DataFrame, right: DataFrame, key: String, ts: String,
      rightPayload: Seq[String], prefix: String = "asof_"): DataFrame = {
    val leftCols = left.columns.filterNot(c => c == key || c == ts).toSeq
    val clashes = rightPayload.map(prefix + _).toSet
      .intersect(left.columns.toSet + "__tag")
    require(clashes.isEmpty,
      s"prefixed right payload collides with left columns: $clashes")
    val payloadStruct = struct(rightPayload.map(col): _*)
    val lTagged = left.select(
      col(key) +: col(ts) +: leftCols.map(col) :+
        lit(null).cast(org.apache.spark.sql.types.StructType(
          rightPayload.map(c => right.schema(c)))).as("__payload") :+
        lit(1).as("__tag"): _*)
    val rTagged = right.select(
      col(key) +: col(ts) +: leftCols.map(c => lit(null).cast(left.schema(c).dataType).as(c)) :+
        payloadStruct.as("__payload") :+
        lit(0).as("__tag"): _*)
    val w = Window.partitionBy(key).orderBy(col(ts), col("__tag"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    lTagged.unionByName(rTagged)
      .withColumn("__payload", last("__payload", ignoreNulls = true).over(w))
      .filter(col("__tag") === 1)
      .select(col(key) +: col(ts) +: leftCols.map(col) ++:
        rightPayload.map(c => col(s"__payload.$c").as(prefix + c)): _*)
  }

  /** a1 — as-of join demo: each click event sees the user's most recent
    * purchase at or before the click.
    */
  def asofClickPurchase(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables.events(spark, sfDir)
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts"), col("event_id"),
        col("value").as("click_value"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"),
        col("ts").as("purchase_ts"), col("value").as("purchase_value"))
    asofJoin(clicks, purchases, "user_id", "ts",
        Seq("purchase_ts", "purchase_value"), prefix = "")
      .select("event_id", "user_id", "ts", "click_value",
        "purchase_ts", "purchase_value")
  }

  /** a6 — FORWARD as-of join: each click sees the user's NEXT purchase
    * at or after the click (time-to-next-action attribution — the
    * mirror of a1's lookback). Implemented as a1's backward engine on
    * the NEGATED time axis: `right.(-us) <= left.(-us)` ⟺
    * `right.us >= left.us`, so the one union + ordered-window pass is
    * reused verbatim — no second engine, no range join. Purchases
    * pre-reduce to one row per (user, instant) via `max_by(value,
    * event_id)` (a3's discipline) so a same-instant tie can never make
    * the carried row engine-dependent. Timestamps travel as exact
    * integer µs.
    */
  def asofForwardClickNext(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables.events(spark, sfDir)
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), (-unix_micros(col("ts"))).as("nus"),
        col("event_id"), unix_micros(col("ts")).as("us"),
        col("value").as("click_value"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .groupBy(col("user_id"), unix_micros(col("ts")).as("p_us"))
      .agg(expr("max_by(value, event_id)").as("purchase_value"))
      .select(col("user_id"), (-col("p_us")).as("nus"),
        col("p_us"), col("purchase_value"))
    asofJoin(clicks, purchases, "user_id", "nus",
        Seq("p_us", "purchase_value"), prefix = "next_")
      .select(col("event_id"), col("user_id"), col("us"), col("click_value"),
        col("next_p_us"), col("next_purchase_value"))
  }

  /** a2 — SCD2 history view: every event becomes a versioned row with a
    * validity interval `[valid_from, valid_to)` per key; the open-ended
    * row is the current version. This is the CDC events → slowly-changing
    * -dimension materialization (the history-keeping sibling of the
    * latest-row view in `cdc.Materialize`). One window, one shuffle.
    */
  def scd2History(spark: SparkSession, sfDir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("valid_from", "event_id")
    Tables.events(spark, sfDir)
      .select(col("event_id"), col("user_id"), col("value"),
        col("ts").as("valid_from"))
      .withColumn("valid_to", lead("valid_from", 1).over(w))
      .withColumn("is_current", col("valid_to").isNull)
  }

  /** a3 — resample to a fixed daily grid with forward fill (the
    * `time_bucket_gapfill` / `fill(previous)` operator of time-series
    * stores): per user, one row per day carrying the latest event value
    * at or before that day's start; days before a user's first event
    * stay null. The grid is users × `sequence(...)` — linear, generated
    * in the projection, never a range join — and the fill is the same
    * union+ordered-window as-of as a1: one shuffle on the key, one
    * linear pass, at any scale.
    *
    * Events are pre-reduced to one row per (user, instant) via
    * `max_by(value, event_id)` (`arg_max` in the oracle) so a
    * same-instant tie can never make the carried row engine-dependent.
    */
  def resampleFfill(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables.events(spark, sfDir)
    val latest = ev.groupBy(col("user_id"), col("ts"))
      .agg(expr("max_by(value, event_id)").as("value"))
      .select(col("user_id"), col("ts").as("day"), col("value"))
    val grid = ev.select("user_id").distinct()
      .select(col("user_id"), explode(expr(
        "sequence(timestamp'2024-01-01 00:00:00'," +
          " timestamp'2024-01-30 00:00:00', interval 1 day)")).as("day"))
    asofJoin(grid, latest, "user_id", "day", Seq("value"), prefix = "")
      .select(col("user_id"), col("day"), col("value").as("last_value"))
  }

  /** a7 — resample to the daily grid with LINEAR INTERPOLATION (the
    * `time_bucket_gapfill + interpolate` operator): per user and grid
    * instant, the value interpolated between the last event at-or-before
    * and the first event at-or-after; grid points outside the user's
    * observed range drop (no anchor on one end). Both neighbor lookups
    * are the SAME union+ordered-window as-of engine as a1/a6 (backward
    * on µs, forward on the negated axis) — two key shuffles, never a
    * range join. The slope term is exact integer arithmetic: values in
    * micro-units, times in integer µs, the product in DECIMAL(38,0)
    * (vµ·Δt ≈ 10²¹ overflows a long), and the division written with the
    * sign PULLED OUT — Spark's `div` truncates toward zero while
    * DuckDB's `//` floors, and they differ exactly on negative
    * numerators, so both engines only ever divide nonnegatives.
    */
  def resampleInterp(spark: SparkSession, sfDir: String): DataFrame = {
    val instants = Tables.events(spark, sfDir)
      .groupBy(col("user_id"), unix_micros(col("ts")).as("us"))
      .agg(expr("max_by(value, event_id)").as("value"))
      .select(col("user_id"), col("us"),
        expr("CAST(round(value * 1000000) AS BIGINT)").as("vu"))
    val grid = Tables.events(spark, sfDir).select("user_id").distinct()
      .select(col("user_id"), explode(expr(
        "sequence(timestamp'2024-01-01 00:00:00'," +
          " timestamp'2024-01-30 00:00:00', interval 1 day)")).as("day"))
      .select(col("user_id"), col("day"), unix_micros(col("day")).as("us"))
    val back = asofJoin(grid,
      instants.select(col("user_id"), col("us"),
        col("us").as("t0"), col("vu").as("v0")),
      "user_id", "us", Seq("t0", "v0"), prefix = "")
    val fwd = asofJoin(back.withColumn("nus", -col("us")),
      instants.select(col("user_id"), (-col("us")).as("nus"),
        col("us").as("t1"), col("vu").as("v1")),
      "user_id", "nus", Seq("t1", "v1"), prefix = "")
    fwd.filter(col("t0").isNotNull && col("t1").isNotNull)
      .withColumn("interp_micro", expr(
        """CASE WHEN t1 = t0 THEN v0
          |ELSE v0 + CAST(CASE WHEN v1 >= v0
          |  THEN (CAST(v1 - v0 AS DECIMAL(38,0)) * (us - t0)) div (t1 - t0)
          |  ELSE -((CAST(v0 - v1 AS DECIMAL(38,0)) * (us - t0)) div (t1 - t0))
          |END AS BIGINT) END""".stripMargin.replace("\n", " ")))
      .select(col("user_id"), col("day"), col("t0"), col("t1"),
        col("interp_micro"))
  }

  /** a4 — OHLC DOWNSAMPLING: per (user, day) bars — open/close = value
    * at the first/last instant of the bar, high/low = extremes over all
    * events, volume = event count — the time-series rollup every
    * metrics store serves (`time_bucket` + `first`/`last` in
    * TimescaleDB terms). Same-instant ties are resolved BEFORE the bar:
    * events pre-reduce to one row per (user, instant) via
    * `max_by(value, event_id)` (a3's determinism trick), so the bar's
    * `min_by/max_by(value, ts)` open/close can never be
    * engine-dependent. Two map-side-combined aggregations + one join,
    * all co-partitioned on the user key — no window, no self-join, at
    * any scale.
    */
  def ohlcBars(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables.events(spark, sfDir)
    val hlv = ev
      .groupBy(col("user_id"), date_trunc("day", col("ts")).as("day"))
      .agg(max("value").as("high"), min("value").as("low"),
        count(lit(1)).as("volume"))
    val instants = ev.groupBy(col("user_id"), col("ts"))
      .agg(expr("max_by(value, event_id)").as("value"))
    val oc = instants
      .groupBy(col("user_id"), date_trunc("day", col("ts")).as("day"))
      .agg(expr("min_by(value, ts)").as("open"),
        expr("max_by(value, ts)").as("close"))
    hlv.join(oc, Seq("user_id", "day"))
      .select(col("user_id"), col("day"), col("open"), col("high"),
        col("low"), col("close"), col("volume"))
  }

  /** a5 — TIME-WEIGHTED average per (user, day) bar (TimescaleDB's
    * `time_weight('locf', ...)`): each value is weighted by how long it
    * was the current value — the honest mean for irregularly-sampled
    * series, where a plain avg overweights bursts. Locf segments are
    * [instant, next instant) within the bar; the bar's trailing segment
    * (no successor) carries no weight, so bars with one instant drop.
    *
    * Exactness discipline: values quantize to integer CENTS (they carry
    * 2 decimals), durations are integer MICROSECONDS, so numerator and
    * denominator are exact longs in both engines and the final `twa`
    * double is one IEEE division of identical operands — never a
    * float accumulation order dependence. Same-instant ties pre-reduce
    * via `max_by(value, event_id)` (a3/a4's trick) so segment values
    * can't be engine-dependent. One shuffle on (user, day), one window
    * pass, one map-side-combined aggregation — scale-shape identical
    * to a4.
    */
  def twaBars(spark: SparkSession, sfDir: String): DataFrame = {
    val instants = Tables.events(spark, sfDir)
      .groupBy(col("user_id"), col("ts"))
      .agg(expr("max_by(value, event_id)").as("value"))
      .select(col("user_id"), date_trunc("day", col("ts")).as("day"),
        unix_micros(col("ts")).as("us"),
        expr("CAST(round(value * 100) AS BIGINT)").as("cents"))
    val w = Window.partitionBy("user_id", "day").orderBy("us")
    instants.withColumn("next_us", lead("us", 1).over(w))
      .filter(col("next_us").isNotNull)
      .withColumn("w_us", col("next_us") - col("us"))
      .groupBy("user_id", "day")
      .agg(count(lit(1)).as("n_segments"),
        sum("w_us").as("den_us"),
        sum(col("cents") * col("w_us")).as("num_cent_us"))
      .withColumn("twa",
        col("num_cent_us").cast("double") / col("den_us").cast("double") / lit(100.0))
  }

  /** a8 — as-of join with a TOLERANCE bound (pandas `merge_asof
    * (tolerance=...)` / kdb `wj` within-window semantics): the most
    * recent prior purchase counts only if it is at most 7 days stale,
    * else the click reports no match. Rides a1's union+window engine
    * UNCHANGED and gates in the final projection — correct because
    * as-of carries the MOST RECENT prior row: if that one is outside
    * the tolerance, every other prior row is staler, so nulling the
    * carried payload is exactly "no match within tolerance" (no second
    * engine, no range join, zero extra shuffles). Staleness compares
    * exact integer micros.
    */
  def asofTolerance(spark: SparkSession, sfDir: String): DataFrame = {
    val tolUs = 7L * 86400000000L
    val in = when(
      unix_micros(col("ts")) - unix_micros(col("purchase_ts")) <= tolUs, true)
    asofClickPurchase(spark, sfDir)
      .select(col("event_id"), col("user_id"), col("ts"), col("click_value"),
        when(in, col("purchase_ts")).as("purchase_ts"),
        when(in, col("purchase_value")).as("purchase_value"))
  }

  /** a9 — calendar DENSIFICATION (gap fill): daily event counts per
    * event type over the FULL corpus date spine, zero-filled — the
    * time-series completion every downstream chart/model assumes
    * ("no row" and "zero events" are different statements, and a
    * forecast trained on the sparse frame silently skips the quiet
    * days). Spine generation is the scale story: the span comes from a
    * ONE-ROW min/max aggregate, `sequence(lo, hi, 1 day)` explodes it
    * into |days| rows, and the cross join against the distinct-type
    * frame is bounded × bounded (days × types — thousands of rows at a
    * century of data; both sides annotated broadcast). The fact side
    * stays a map-side-combined daily aggregate; the left join that
    * lands zeros shuffles only |days|·|types| rows. No range join, no
    * per-day scan, no driver-side date loop.
    */
  def calendarFill(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables.events(spark, sfDir)
      .select(date_trunc("day", col("ts")).as("day"), col("event_type"))
    val daily = ev.groupBy("day", "event_type").agg(count(lit(1)).as("n_events"))
    // one-row span; the spine explode is |days| rows, a bounded frame
    val spine = ev.agg(min("day").as("lo"), max("day").as("hi"))
      .select(explode(expr("sequence(lo, hi, interval 1 day)")).as("day"))
    val types = ev.select("event_type").distinct()
    broadcast(spine).crossJoin(broadcast(types))
      .join(daily, Seq("day", "event_type"), "left")
      .select(col("day"), col("event_type"),
        coalesce(col("n_events"), lit(0L)).as("n_events"))
  }

  /** a10's pixel-column width: 6-hour epoch buckets. */
  private val M4BucketUs = 21600000000L

  /** a10 — M4 DOWNSAMPLING (Jugel et al., VLDB'14): per (event_type,
    * time bucket) the first, last, min and max points with their
    * timestamps — the four rows per pixel column that make a line chart
    * of millions of points render IDENTICALLY to the full data, and the
    * standard answer to "ship a dashboard series without shipping the
    * corpus". a4's OHLC bars are the finance special case; M4 keeps the
    * extremes' TIMES too, which is what pixel-exact rendering needs.
    *
    * One groupBy with four struct-ordered argmin/argmax aggregates
    * (r13's associative struct-min idiom — map-side combined partials;
    * struct-ordered buffers aren't hash-aggregable, so the partials are
    * SORT-based aggregation on the (type, bucket) key — a local
    * per-partition sort, not a global one, and still one pass):
    * first/last order by (ts, id), min/max by
    * (value, ts, id) — value ties resolve to the earliest point for min
    * and the latest for max, both total orders, so the result and the
    * oracle hash are partitioning-independent. Values are exact cents.
    * At 100 TB: the scan is the cost; output is 4 points × pixels.
    */
  def m4Downsample(spark: SparkSession, sfDir: String): DataFrame =
    m4On(Tables.events(spark, sfDir))

  /** a10 over an arbitrary `(event_type, ts, event_id, value)` frame —
    * injectable so the streaming twin ([[graft.streaming.M4Stream]])
    * can be proven cell-identical against the same rows.
    */
  private[graft] def m4On(events: DataFrame): DataFrame = {
    events
      .select(col("event_type"), unix_micros(col("ts")).as("us"),
        col("event_id"),
        expr("CAST(floor(value * 100) AS BIGINT)").as("v"))
      .withColumn("bucket", expr(s"us DIV $M4BucketUs"))
      .groupBy("event_type", "bucket")
      .agg(count(lit(1)).as("n_points"),
        min(struct(col("us"), col("event_id"), col("v"))).as("f"),
        max(struct(col("us"), col("event_id"), col("v"))).as("l"),
        min(struct(col("v"), col("us"), col("event_id"))).as("mn"),
        max(struct(col("v"), col("us"), col("event_id"))).as("mx"))
      .select(col("event_type"), col("bucket"), col("n_points"),
        col("f.v").as("first_v"), col("f.us").as("first_us"),
        col("l.v").as("last_v"), col("l.us").as("last_us"),
        col("mn.v").as("min_v"), col("mn.us").as("min_us"),
        col("mx.v").as("max_v"), col("mx.us").as("max_us"))
  }

  val queries: Map[String, Q] = Map(
    "a10_m4_downsample" -> (m4Downsample _),
    "a9_calendar_fill" -> (calendarFill _),
    "a8_asof_tolerance" -> (asofTolerance _),
    "a5_twa_bars" -> (twaBars _),
    "a7_resample_interp" -> (resampleInterp _),
    "a1_asof_join" -> (asofClickPurchase _),
    "a2_scd2_history" -> (scd2History _),
    "a3_resample_ffill" -> (resampleFfill _),
    "a4_ohlc_bars" -> (ohlcBars _),
    "a6_asof_forward" -> (asofForwardClickNext _)
  )

  val oracle: Map[String, String] = Map(
    "a10_m4_downsample" ->
      s"""WITH ev AS (
         |  SELECT event_type, epoch_us(CAST(ts AS TIMESTAMP)) AS us,
         |    event_id, CAST(floor(value * 100) AS BIGINT) AS v,
         |    epoch_us(CAST(ts AS TIMESTAMP)) // $M4BucketUs AS bucket
         |  FROM events),
         |r AS (
         |  SELECT *,
         |    row_number() OVER (PARTITION BY event_type, bucket
         |      ORDER BY us, event_id) AS rf,
         |    row_number() OVER (PARTITION BY event_type, bucket
         |      ORDER BY us DESC, event_id DESC) AS rl,
         |    row_number() OVER (PARTITION BY event_type, bucket
         |      ORDER BY v, us, event_id) AS rmn,
         |    row_number() OVER (PARTITION BY event_type, bucket
         |      ORDER BY v DESC, us DESC, event_id DESC) AS rmx
         |  FROM ev)
         |SELECT event_type, bucket, CAST(count(*) AS BIGINT) AS n_points,
         |  CAST(max(CASE WHEN rf = 1 THEN v END) AS BIGINT) AS first_v,
         |  CAST(max(CASE WHEN rf = 1 THEN us END) AS BIGINT) AS first_us,
         |  CAST(max(CASE WHEN rl = 1 THEN v END) AS BIGINT) AS last_v,
         |  CAST(max(CASE WHEN rl = 1 THEN us END) AS BIGINT) AS last_us,
         |  CAST(max(CASE WHEN rmn = 1 THEN v END) AS BIGINT) AS min_v,
         |  CAST(max(CASE WHEN rmn = 1 THEN us END) AS BIGINT) AS min_us,
         |  CAST(max(CASE WHEN rmx = 1 THEN v END) AS BIGINT) AS max_v,
         |  CAST(max(CASE WHEN rmx = 1 THEN us END) AS BIGINT) AS max_us
         |FROM r GROUP BY 1, 2""".stripMargin,
    "a9_calendar_fill" ->
      """WITH ev AS (
        |  SELECT date_trunc('day', CAST(ts AS TIMESTAMP)) AS day, event_type
        |  FROM events),
        |daily AS (
        |  SELECT day, event_type, CAST(count(*) AS BIGINT) AS n
        |  FROM ev GROUP BY day, event_type),
        |span AS (SELECT min(day) AS lo, max(day) AS hi FROM ev),
        |spine AS (
        |  SELECT unnest(generate_series(lo, hi, INTERVAL 1 DAY)) AS day
        |  FROM span),
        |types AS (SELECT DISTINCT event_type FROM ev)
        |SELECT s.day, t.event_type,
        |  CAST(coalesce(d.n, 0) AS BIGINT) AS n_events
        |FROM spine s CROSS JOIN types t
        |LEFT JOIN daily d ON d.day = s.day AND d.event_type = t.event_type""".stripMargin,
    // backward neighbor via ASOF (>=), forward neighbor via the
    // min-qualifying formulation (a6's pattern); interpolation restates
    // the sign-split truncating division verbatim
    "a7_resample_interp" ->
      """WITH days AS (
        |  SELECT unnest(generate_series(TIMESTAMP '2024-01-01',
        |    TIMESTAMP '2024-01-30', INTERVAL 1 DAY)) AS day),
        |u AS (SELECT DISTINCT user_id FROM events),
        |grid AS (SELECT user_id, day, epoch_us(day) AS us
        |         FROM u CROSS JOIN days),
        |inst AS (
        |  SELECT user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS ius,
        |    CAST(round(arg_max(value, event_id) * 1000000) AS BIGINT) AS vu
        |  FROM events GROUP BY user_id, epoch_us(CAST(ts AS TIMESTAMP))),
        |b AS (
        |  SELECT g.user_id, g.day, g.us, i.ius AS t0, i.vu AS v0
        |  FROM grid g ASOF JOIN inst i
        |    ON g.user_id = i.user_id AND g.us >= i.ius),
        |f AS (
        |  SELECT g.user_id, g.us, min(i.ius) AS t1
        |  FROM grid g JOIN inst i
        |    ON i.user_id = g.user_id AND i.ius >= g.us
        |  GROUP BY g.user_id, g.us)
        |SELECT b.user_id, b.day, b.t0, f.t1,
        |  CASE WHEN f.t1 = b.t0 THEN b.v0
        |  ELSE b.v0 + CAST(CASE WHEN i1.vu >= b.v0
        |    THEN (CAST(i1.vu - b.v0 AS HUGEINT) * (b.us - b.t0)) // (f.t1 - b.t0)
        |    ELSE -((CAST(b.v0 - i1.vu AS HUGEINT) * (b.us - b.t0)) // (f.t1 - b.t0))
        |  END AS BIGINT) END AS interp_micro
        |FROM b
        |JOIN f ON f.user_id = b.user_id AND f.us = b.us
        |JOIN inst i1 ON i1.user_id = b.user_id AND i1.ius = f.t1""".stripMargin,
    // DuckDB's ASOF is >= only, so the forward join states its
    // definition: the minimum qualifying purchase instant per click,
    // then the (pre-reduced, hence unique) row at that instant
    "a6_asof_forward" ->
      """WITH e AS (
        |  SELECT user_id, event_type, event_id, value,
        |    epoch_us(CAST(ts AS TIMESTAMP)) AS us
        |  FROM events),
        |c AS (
        |  SELECT event_id, user_id, us, value AS click_value
        |  FROM e WHERE event_type = 'click'),
        |p AS (
        |  SELECT user_id, us AS p_us, arg_max(value, event_id) AS purchase_value
        |  FROM e WHERE event_type = 'purchase' GROUP BY user_id, us),
        |m AS (
        |  SELECT c.event_id, c.user_id, min(p.p_us) AS next_p_us
        |  FROM c JOIN p ON p.user_id = c.user_id AND p.p_us >= c.us
        |  GROUP BY c.event_id, c.user_id)
        |SELECT c.event_id, c.user_id, c.us, c.click_value,
        |  m.next_p_us, p.purchase_value AS next_purchase_value
        |FROM c
        |LEFT JOIN m ON m.event_id = c.event_id
        |LEFT JOIN p ON p.user_id = c.user_id AND p.p_us = m.next_p_us""".stripMargin,
    "a5_twa_bars" ->
      """WITH instants AS (
        |  SELECT user_id, CAST(ts AS TIMESTAMP) AS mts,
        |    arg_max(value, event_id) AS value
        |  FROM events GROUP BY user_id, CAST(ts AS TIMESTAMP)),
        |seg AS (
        |  SELECT user_id, date_trunc('day', mts) AS day,
        |    epoch_us(mts) AS us,
        |    CAST(round(value * 100) AS BIGINT) AS cents,
        |    lead(epoch_us(mts)) OVER (
        |      PARTITION BY user_id, date_trunc('day', mts)
        |      ORDER BY epoch_us(mts)) AS next_us
        |  FROM instants)
        |SELECT user_id, day, count(*) AS n_segments,
        |  CAST(sum(next_us - us) AS BIGINT) AS den_us,
        |  CAST(sum(cents * (next_us - us)) AS BIGINT) AS num_cent_us,
        |  CAST(sum(cents * (next_us - us)) AS DOUBLE)
        |    / CAST(sum(next_us - us) AS DOUBLE) / 100.0 AS twa
        |FROM seg WHERE next_us IS NOT NULL
        |GROUP BY user_id, day""".stripMargin,
    "a8_asof_tolerance" ->
      """WITH c AS (
        |  SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts,
        |    value AS click_value
        |  FROM events WHERE event_type = 'click'),
        |p AS (
        |  SELECT user_id, CAST(ts AS TIMESTAMP) AS pts,
        |    CAST(ts AS TIMESTAMP) AS purchase_ts, value AS purchase_value
        |  FROM events WHERE event_type = 'purchase')
        |SELECT c.event_id, c.user_id, c.ts, c.click_value,
        |  CASE WHEN epoch_us(c.ts) - epoch_us(p.purchase_ts) <= 604800000000
        |    THEN p.purchase_ts END AS purchase_ts,
        |  CASE WHEN epoch_us(c.ts) - epoch_us(p.purchase_ts) <= 604800000000
        |    THEN p.purchase_value END AS purchase_value
        |FROM c ASOF LEFT JOIN p
        |  ON c.user_id = p.user_id AND c.ts >= p.pts""".stripMargin,
    "a1_asof_join" ->
      """WITH c AS (
        |  SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts,
        |    value AS click_value
        |  FROM events WHERE event_type = 'click'),
        |p AS (
        |  SELECT user_id, CAST(ts AS TIMESTAMP) AS pts,
        |    CAST(ts AS TIMESTAMP) AS purchase_ts, value AS purchase_value
        |  FROM events WHERE event_type = 'purchase')
        |SELECT c.event_id, c.user_id, c.ts, c.click_value,
        |  p.purchase_ts, p.purchase_value
        |FROM c ASOF LEFT JOIN p
        |  ON c.user_id = p.user_id AND c.ts >= p.pts""".stripMargin,
    "a2_scd2_history" ->
      """WITH e AS (
        |  SELECT event_id, user_id, value, CAST(ts AS TIMESTAMP) AS valid_from
        |  FROM events),
        |s AS (
        |  SELECT e.*, lead(valid_from) OVER (
        |    PARTITION BY user_id ORDER BY valid_from, event_id) AS valid_to
        |  FROM e)
        |SELECT event_id, user_id, value, valid_from, valid_to,
        |  (valid_to IS NULL) AS is_current
        |FROM s""".stripMargin,
    "a3_resample_ffill" ->
      """WITH days AS (
        |  SELECT unnest(generate_series(TIMESTAMP '2024-01-01',
        |    TIMESTAMP '2024-01-30', INTERVAL 1 DAY)) AS day),
        |u AS (SELECT DISTINCT user_id FROM events),
        |grid AS (SELECT user_id, day FROM u CROSS JOIN days),
        |e AS (
        |  SELECT user_id, CAST(ts AS TIMESTAMP) AS ets,
        |    arg_max(value, event_id) AS value
        |  FROM events GROUP BY user_id, CAST(ts AS TIMESTAMP))
        |SELECT g.user_id, g.day, e.value AS last_value
        |FROM grid g ASOF LEFT JOIN e
        |  ON g.user_id = e.user_id AND g.day >= e.ets""".stripMargin,
    "a4_ohlc_bars" ->
      """WITH hlv AS (
        |  SELECT user_id, date_trunc('day', CAST(ts AS TIMESTAMP)) AS day,
        |    max(value) AS high, min(value) AS low, count(*) AS volume
        |  FROM events GROUP BY 1, 2),
        |instants AS (
        |  SELECT user_id, CAST(ts AS TIMESTAMP) AS mts,
        |    arg_max(value, event_id) AS value
        |  FROM events GROUP BY user_id, CAST(ts AS TIMESTAMP)),
        |oc AS (
        |  SELECT user_id, date_trunc('day', mts) AS day,
        |    arg_min(value, mts) AS open, arg_max(value, mts) AS close
        |  FROM instants GROUP BY 1, 2)
        |SELECT user_id, day, open, high, low, close, volume
        |FROM hlv JOIN oc USING (user_id, day)""".stripMargin
  )
}
