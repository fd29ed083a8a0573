package graft.ext

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-sequence operators over the `events` stream table: gap-based
  * sessionization and skew-safe distinct aggregation — the per-user
  * behavioral rollups a training-data pipeline derives from raw event
  * logs.
  *
  * Scale shape: both queries shuffle once on `user_id` (the window
  * partition / first-phase group key) and everything after runs inside
  * the partition. Per-user event counts are bounded (a user's history
  * fits a partition); a pathological hot user would move to the salted
  * two-phase form of k2, which is already the shape shown here.
  */
object Sessions {

  type Q = (SparkSession, String) => DataFrame

  /** k1 — gap-based sessionization: a new session starts when the gap to
    * the previous event of the same user exceeds 30 minutes. Session id =
    * running count of session starts (lag + cumulative sum windows), the
    * standard relational encoding.
    */
  def sessionize(spark: SparkSession, sfDir: String): DataFrame = {
    val byUser = Window.partitionBy("user_id").orderBy("event_id")
    val ev = Tables.events(spark, sfDir)
      .select(col("event_id"), col("user_id"), col("ts"))
    // Gap compare in exact integer microseconds on both engines
    // (unix_micros / epoch_us) — a seconds cast would floor on one side
    // and round on the other at fractional boundaries.
    ev.withColumn("prev_ts", lag("ts", 1).over(byUser))
      .withColumn("new_session",
        when(col("prev_ts").isNull ||
          unix_micros(col("ts")) - unix_micros(col("prev_ts")) > 1800000000L, 1L)
          .otherwise(0L))
      .withColumn("session_no", sum("new_session").over(byUser))
      .select(col("event_id"), col("user_id"), col("session_no"))
  }

  /** k1 rollup — sessions per user with bounds and length. */
  def sessionStats(spark: SparkSession, sfDir: String): DataFrame =
    sessionize(spark, sfDir)
      .groupBy(col("user_id"), col("session_no"))
      .agg(count(lit(1)).as("n_events"),
        min("event_id").as("first_event"),
        max("event_id").as("last_event"))

  /** k2 — distinct event types per user via two-phase aggregation: phase
    * one groups on (user, type) — the "salted" expansion that spreads a
    * hot user across partitions — phase two counts per user. The skew-safe
    * form of COUNT(DISTINCT), with map-side partial aggregation in both
    * phases.
    */
  def distinctTypes(spark: SparkSession, sfDir: String): DataFrame =
    Tables.events(spark, sfDir)
      .select(col("user_id"), col("event_type"))
      .groupBy("user_id", "event_type").agg(count(lit(1)).as("n"))
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_distinct_types"), sum("n").as("n_events"))

  /** k3 — salted join: the skew-mitigation shape for a hot key joining a
    * small dimension. The probe side derives a salt from a uniform column
    * (`event_id % 8`); the dimension replicates once per salt value, so
    * the join key becomes (user_id, salt) and a hot user's rows spread
    * over 8 shuffle partitions instead of one straggler task. Exactly one
    * dim replica matches each probe row, so the result equals the
    * unsalted join — which is precisely what the oracle checks (its SQL
    * is the PLAIN join). At 100 TB the salt count scales with observed
    * skew (or AQE's skew-join split handles it adaptively; the explicit
    * salt is the portable form).
    */
  def saltedJoin(spark: SparkSession, sfDir: String): DataFrame = {
    val salts = 8
    val ev = Tables.events(spark, sfDir)
      .select(col("user_id"), col("event_id"), col("value"))
    val dim = ev.groupBy("user_id").agg(min("event_id").as("first_seq"))
    val saltedDim = dim.withColumn("salt",
      explode(array((0 until salts).map(lit): _*)))
    ev.withColumn("salt", pmod(col("event_id"), lit(salts)).cast("int"))
      .join(saltedDim, Seq("user_id", "salt"))
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_events"), min("first_seq").as("first_seq"))
  }

  /** k4 — ordered conversion funnel: per user, the first qualifying
    * signup, then the first high-value click STRICTLY AFTER it, then
    * the first high-value purchase strictly after that — funnel depth
    * 0-3, reported as users per depth. The event-sequence analytic
    * every product dashboard runs, built without any per-user event
    * sort: each stage is a keyed min-aggregation (map-side partials)
    * joined to the previous stage on the user key, so the work per
    * stage is one shuffle of one row per surviving user — at 100 TB
    * the funnel narrows the data stage by stage instead of windowing
    * the whole event history. Strict `>` comparisons are safe:
    * (user_id, ts) is unique in the stream.
    */
  def funnel(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables.events(spark, sfDir)
      .select(col("user_id"), col("event_type"), col("ts"), col("value"))
    val s1 = ev.filter(col("event_type") === "signup")
      .groupBy("user_id").agg(min("ts").as("t1"))
    val s2 = ev.filter(col("event_type") === "click" && col("value") > 200)
      .join(s1, Seq("user_id"))
      .filter(col("ts") > col("t1"))
      .groupBy("user_id").agg(min("ts").as("t2"))
    val s3 = ev.filter(col("event_type") === "purchase" && col("value") > 400)
      .join(s2, Seq("user_id"))
      .filter(col("ts") > col("t2"))
      .groupBy("user_id").agg(min("ts").as("t3"))
    ev.select("user_id").distinct()
      .join(s1.select(col("user_id"), lit(1).as("d1")), Seq("user_id"), "left")
      .join(s2.select(col("user_id"), lit(1).as("d2")), Seq("user_id"), "left")
      .join(s3.select(col("user_id"), lit(1).as("d3")), Seq("user_id"), "left")
      .select(
        when(col("d3").isNotNull, 3)
          .when(col("d2").isNotNull, 2)
          .when(col("d1").isNotNull, 1)
          .otherwise(0).cast("int").as("depth"))
      .groupBy("depth").agg(count(lit(1)).as("n_users"))
  }

  /** k5 — retention cohorts: users grouped by first-activity week, then
    * for each (cohort, weeks-since-cohort) the count of distinct users
    * active that week — the analytics-warehouse classic behind every
    * retention curve. Weeks are integer day arithmetic from a fixed
    * epoch (`datediff div 7` — identical integers in both engines; a
    * date_trunc week would hang the oracle on engine week-start
    * conventions). Two keyed aggregations and one join on user_id: the
    * cohort frame is one row per user, the activity frame one row per
    * (user, week) — at 100 TB nothing here is bigger than the
    * user×week matrix, and every aggregation map-side combines.
    */
  def retentionCohorts(spark: SparkSession, sfDir: String): DataFrame = {
    // integer DIV, not `/` (double division on long columns); all events
    // are on/after the epoch, so truncation == floor on both engines
    val ev = Tables.events(spark, sfDir)
      .select(col("user_id"),
        expr("CAST(datediff(CAST(ts AS DATE), DATE'2024-01-01') AS BIGINT) DIV 7")
          .as("week"))
    val cohort = ev.groupBy("user_id").agg(min("week").as("cohort_week"))
    val active = ev.distinct()
    active.join(cohort, Seq("user_id"))
      .select(col("cohort_week"), (col("week") - col("cohort_week")).as("week_offset"))
      .groupBy("cohort_week", "week_offset")
      .agg(count(lit(1)).as("n_active_users"))
  }

  /** k6 — session concurrency: how many sessions are active in each
    * 30-minute epoch. This is the INTERVAL×TIME-GRID join — the range
    * join the prompt for any monitoring/capacity question ("concurrent
    * users at peak") — done as bucket explosion: each session interval
    * explodes into the epochs it spans (`sequence` over integer epoch
    * indices, scan-local) and the grid side becomes an equi-GROUP BY,
    * never a range-predicate cross join. A range-join formulation
    * compares every session against every epoch (|sessions|·|grid|
    * pairs); this shape's cost is Σ epochs-per-session — linear in the
    * data with a small duration factor, the same bucketing trick an
    * overlap join at 100 TB uses (genomics/IP-range joins bucket
    * exactly like this). Epoch arithmetic is exact integer µs on both
    * engines.
    */
  def concurrency(spark: SparkSession, sfDir: String): DataFrame = {
    val epochUs = 1800000000L // 30 minutes in microseconds
    val ev = Tables.events(spark, sfDir).select(col("event_id"), col("ts"))
    val bounds = sessionize(spark, sfDir)
      .join(ev, Seq("event_id"))
      .groupBy("user_id", "session_no")
      .agg(min(unix_micros(col("ts"))).as("s_us"),
        max(unix_micros(col("ts"))).as("e_us"))
    bounds
      .select(explode(sequence(
        expr(s"s_us DIV $epochUs"), expr(s"e_us DIV $epochUs"))).as("epoch"))
      .groupBy("epoch")
      .agg(count(lit(1)).as("n_active"))
      .select(col("epoch"),
        expr(s"timestamp_micros(epoch * $epochUs)").as("epoch_start"),
        col("n_active"))
  }

  /** k7 — Markov TRANSITION MATRIX over per-user event sequences: for
    * each (from, to) event-type pair, how often `to` immediately follows
    * `from` in a user's stream, with the conditional probability
    * P(to | from) in integer micro-units (`n·10^6 DIV from_total` —
    * exact, order-independent, no float sum anywhere). The
    * next-event model behind session simulation, anomaly scoring, and
    * behavioral features.
    *
    * One window (lead over the user's id-ordered stream — the same
    * partition-once shape as k1), one pair aggregation, and a
    * per-from-state total joined back on the |types|² matrix — every
    * frame after the window is bounded by the type-vocabulary size, not
    * the event count.
    */
  def transitions(spark: SparkSession, sfDir: String): DataFrame = {
    val byUser = Window.partitionBy("user_id").orderBy("event_id")
    val steps = Tables.events(spark, sfDir)
      .select(col("user_id"), col("event_id"), col("event_type"))
      .withColumn("next_type", lead("event_type", 1).over(byUser))
      .filter(col("next_type").isNotNull)
    val pairs = steps.groupBy(col("event_type").as("from_type"),
        col("next_type").as("to_type"))
      .agg(count(lit(1)).as("n"))
    val totals = pairs.groupBy("from_type").agg(sum("n").as("from_total"))
    pairs.join(totals, Seq("from_type")) // |types| rows — trivially small
      .select(col("from_type"), col("to_type"), col("n"),
        expr("n * 1000000 DIV from_total").as("p_micro"))
  }

  /** k11 — top PATHS: the frequency of every 3-step event-type sequence
    * across user streams — k7's pairwise transition matrix extended one
    * order up, the "most common click-paths" panel of product analytics
    * (and the raw counts behind a trigram behavioral model). Same
    * partition-once shape as k1/k7: ONE window (two leads share one
    * sort over the user's id-ordered stream), then a map-side-combined
    * aggregation whose keyspace is |types|³ — bounded by the type
    * vocabulary, never the event count. The corpus share is integral
    * ppm over the one bounded aggregate (`OVER ()` on ≤ |types|³ rows —
    * a single-partition window ONLY over the vocabulary-sized frame,
    * never over event-scale data).
    */
  def topPaths(spark: SparkSession, sfDir: String): DataFrame = {
    val byUser = Window.partitionBy("user_id").orderBy("event_id")
    Tables.events(spark, sfDir)
      .select(col("user_id"), col("event_id"), col("event_type"))
      .withColumn("t2", lead("event_type", 1).over(byUser))
      .withColumn("t3", lead("event_type", 2).over(byUser))
      .filter(col("t3").isNotNull)
      .groupBy(col("event_type").as("step1"), col("t2").as("step2"),
        col("t3").as("step3"))
      .agg(count(lit(1)).as("n_paths"))
      .withColumn("share_ppm",
        expr("n_paths * 1000000 DIV sum(n_paths) OVER ()"))
  }

  /** k8 — CONVERSION LATENCY distribution: time from a user's first
    * `view` to their first `purchase` after it, banded into whole days —
    * the time-to-convert histogram next to k4's depth funnel. Same
    * staged-min-aggregation shape as k4 (filter → groupBy min → join →
    * min), never a per-user event-history window: each stage is a
    * map-side-combined aggregation co-partitioned on user_id, and the
    * final rollup is |bands| rows. Latency stays in exact integer
    * MICROSECONDS end to end; banding is integer DIV (a double `/`
    * could floor an exact-day boundary into the wrong band).
    */
  def conversionLag(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables.events(spark, sfDir)
      .select(col("user_id"), col("event_type"),
        unix_micros(col("ts")).as("us"))
    val v = ev.filter(col("event_type") === "view")
      .groupBy("user_id").agg(min("us").as("v_us"))
    val p = ev.filter(col("event_type") === "purchase")
      .join(v, Seq("user_id"))
      .filter(col("us") > col("v_us"))
      .groupBy("user_id").agg(min("us").as("p_us"))
    v.join(p, Seq("user_id"))
      .withColumn("lag_us", col("p_us") - col("v_us"))
      .withColumn("lag_days", expr("lag_us DIV 86400000000"))
      .groupBy("lag_days")
      .agg(count(lit(1)).as("n_users"),
        min("lag_us").as("min_lag_us"), max("lag_us").as("max_lag_us"))
  }

  /** k9 — time-DECAYED engagement score per user: each event contributes
    * its micro-quantized value halved once per whole day of age relative
    * to the stream head — recency weighting without `exp`/libm (the
    * cross-engine hash trap): the decay is an integer shift-divide
    * `v DIV 2^min(age_days, 20)`, exact in both engines, and the age
    * cap stops the shift from degenerating past the value's precision.
    * Plan shape: the stream head is a one-row aggregate joined back
    * broadcast (o23's pattern); ages ride the raw event timestamps; the
    * per-user rollup is one map-side-combined shuffle on user_id.
    */
  def decayScore(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables.events(spark, sfDir)
      .select(col("user_id"), col("value"), unix_micros(col("ts")).as("us"))
    val head = ev.agg(max("us").as("head_us"))
    ev.crossJoin(broadcast(head)) // one-row frame: correct broadcast
      .select(col("user_id"),
        expr("""CAST(floor(value * 1000000) AS BIGINT)
               | DIV shiftleft(CAST(1 AS BIGINT),
               |   CAST(least((head_us - us) DIV 86400000000, 20) AS INT))"""
          .stripMargin.replace("\n", " ")).as("decayed"))
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_events"), sum("decayed").as("score_micro"))
  }

  /** k10 — per-user z-score OUTLIER events (|value − µ| > 3σ against the
    * user's own population), with NO square root and NO floating-point
    * statistics: the z test cross-multiplies to
    * `(n·v − S)² > 9·(n·Q − S²)` over exact integer micro-quantized
    * values (S = Σv, Q = Σv²) — both sides are DECIMAL(38,0)/HUGEINT
    * (S² ≈ 10²⁶ overflows a long), so the flag is bit-identical across
    * engines where a sqrt/stddev formulation would hash-differ in the
    * last ulp.
    *
    * MAGNITUDE ENVELOPE: decimal(38,0) products silently overflow to
    * NULL under non-ANSI mode, and `NULL > x` is false — an overflow
    * would silently DROP outliers, not fail. The largest term is
    * dev² ≤ (2n·|v|max)², so the contract is `n·|v|max < 10¹⁸·√(1/4)`,
    * i.e. per-user event count × max |value|·10⁶ below ~5·10¹⁷ —
    * this corpus sits at ~10¹³ (10⁴ events × 10⁹ micro-value), five
    * orders inside the envelope, and `SessionsSpec` measures the actual
    * bound from the data so growth past it fails loudly instead of
    * silently. Plan shape: partition-only window aggregates — ONE
    * exchange on user_id and a per-partition sort, where the
    * groupBy+self-join alternative shuffles the event frame twice.
    */
  def zscoreOutliers(spark: SparkSession, sfDir: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window.partitionBy("user_id")
    def d(c: Column): Column = c.cast("decimal(38,0)")
    val ev = Tables.events(spark, sfDir)
      .select(col("user_id"), col("event_id"),
        expr("CAST(floor(value * 1000000) AS BIGINT)").as("v_micro"))
    ev.withColumn("n", count(lit(1)).over(w))
      .withColumn("s", sum(d(col("v_micro"))).over(w))
      .withColumn("q", sum(d(col("v_micro")) * d(col("v_micro"))).over(w))
      .withColumn("dev", d(col("n")) * d(col("v_micro")) - col("s"))
      .filter(col("dev") * col("dev") >
        lit(9) * (d(col("n")) * col("q") - col("s") * col("s")))
      .select(col("user_id"), col("event_id"), col("v_micro"),
        col("n").as("n_events"))
  }

  /** k12 — MULTI-TOUCH ATTRIBUTION: for each purchase, EVERY click by
    * the same user in the preceding 7-day window, ranked by time, with
    * an exact integral-ppm linear credit split (1e6 DIV n per touch,
    * floor remainder credited to the FIRST touch so each purchase's
    * weights sum to exactly 10⁶) — the marketing-attribution operator
    * one step past a8's single-touch as-of: the whole touch set
    * materializes, so last-touch / first-touch / U-shaped models are
    * all projections of this output.
    *
    * Scale shape: the variable-width lookback cannot be a fixed
    * rows-window, and a plain per-user join is quadratic for hot
    * users, so the join is BUCKETED on the lookback width (k6's
    * interval-grid argument): clicks post under their own 7-day bucket
    * and the next, purchases join their bucket only — every true pair
    * straddles at most one boundary, so the copies cover exactly the
    * candidates and the (user, bucket) join bounds pair fan-out by
    * clicks-per-user-per-14-days, never click history. One join, two
    * windows on the purchase key, no corpus-sized state.
    */
  def attribution(spark: SparkSession, sfDir: String): DataFrame = {
    val Lookback = 604800000000L // 7 days in µs
    val ev = Tables.events(spark, sfDir)
      .select(col("user_id"), col("event_id"), col("event_type"),
        unix_micros(col("ts")).as("us"))
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id").as("purchase_id"),
        col("us").as("pus"), expr(s"us DIV $Lookback").as("bkt"))
    val c = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("event_id").as("click_id"), col("us").as("cus"),
        explode(array(expr(s"us DIV $Lookback"),
          expr(s"us DIV $Lookback + 1"))).as("bkt"))
    val wr = Window.partitionBy("purchase_id").orderBy(col("cus"), col("click_id"))
    val wn = Window.partitionBy("purchase_id")
    p.join(c, Seq("user_id", "bkt"))
      .filter(col("pus") >= col("cus") && col("pus") - col("cus") <= Lookback)
      .withColumn("touch_rank", row_number().over(wr).cast("long"))
      .withColumn("n_touches", count(lit(1)).over(wn))
      .select(col("purchase_id"), col("user_id"), col("click_id"),
        col("touch_rank"), col("n_touches"),
        (expr("1000000 DIV n_touches") +
          when(col("touch_rank") === 1L, expr("1000000 % n_touches"))
            .otherwise(0L)).as("weight_ppm"))
  }

  /** k13 — RFM SEGMENTATION: every user scored on Recency (days since
    * their last event, against the corpus's newest event), Frequency
    * (event count) and Monetary (exact purchase cents), each cut into
    * quintiles, rolled up to the (R, F, M) segment grid — the classic
    * audience-segmentation cube (`quintile 1` = smallest metric values;
    * consumers read R1 as "most recent" after the sign flip they
    * prefer). Output is ≤ 125 segment rows with user counts and total
    * monetary mass.
    *
    * Quintile BOUNDARIES come from the r10/r11 histogram-refine shape,
    * NOT `ntile` — ntile drags the whole user-grain frame through one
    * range-partitioned global sort, while here: (1) one user-keyed
    * aggregate builds the metric frame (map-side combined); (2) the
    * three metrics melt into (metric, v) rows and a 3×~1k-bucket
    * histogram locates each of the 12 target ranks (`ceil(k·n/5)` as
    * exact integer arithmetic); (3) only the located buckets' rows are
    * rank-refined (sort bounded by one bucket's width, adaptive
    * `w = (hi−lo+1) DIV 1024`); (4) assignment is a broadcast of 4
    * longs per metric against the user frame — `1 + Σ(v > bound)`,
    * ties landing in the lower quintile, stated identically in the
    * oracle. The user-metric frame is localCheckpointed: three
    * consumers (histogram, refine, assignment) read it like the
    * materialized user-metrics table a production pipeline would keep.
    */
  def rfmSegments(spark: SparkSession, sfDir: String): DataFrame = {
    val DayUs = 86400000000L
    val ev = Tables.events(spark, sfDir)
      .select(col("user_id"), unix_micros(col("ts")).as("us"),
        col("event_type"), col("value"))
    val anchor = ev.agg(max("us").as("anchor_us"))
    val um = ev.groupBy("user_id")
      .agg(max("us").as("last_us"), count(lit(1)).as("frequency"),
        sum(when(col("event_type") === "purchase",
          expr("CAST(floor(value * 100) AS BIGINT)")).otherwise(0L))
          .as("monetary_cents"))
      .crossJoin(broadcast(anchor)) // one-row frame: correct broadcast
      .withColumn("recency_days", expr(s"(anchor_us - last_us) DIV $DayUs"))
      .select("user_id", "recency_days", "frequency", "monetary_cents")
      .localCheckpoint(false)
    val melted = um.select(explode(array(
        struct(lit("r").as("metric"), col("recency_days").as("v")),
        struct(lit("f").as("metric"), col("frequency").as("v")),
        struct(lit("m").as("metric"), col("monetary_cents").as("v")))).as("mv"))
      .select(col("mv.metric").as("metric"), col("mv.v").as("v"))
    val span = melted.groupBy("metric")
      .agg(min("v").as("lo"), max("v").as("hi"), count(lit(1)).as("n"))
      .withColumn("w", expr("greatest(1L, (hi - lo + 1) DIV 1024)"))
      .localCheckpoint(false) // 3 rows
    val hist = melted
      .join(broadcast(span.select("metric", "lo", "w")), Seq("metric"))
      .groupBy(col("metric"), expr("(v - lo) DIV w").as("bucket"))
      .agg(count(lit(1)).as("c"))
    val wb = Window.partitionBy("metric").orderBy("bucket")
    val cum = hist.withColumn("cum", sum("c").over(wb))
      .withColumn("cum_before", col("cum") - col("c"))
    val targets = span.select(col("metric"), explode(array((1 to 4).map(k =>
        struct(lit(k.toLong).as("k"), expr(s"($k * n + 4) DIV 5").as("r"))): _*))
        .as("t"))
      .select(col("metric"), col("t.k").as("k"), col("t.r").as("r"))
    val located = targets.join(cum, Seq("metric"))
      .filter(col("r") > col("cum_before") && col("r") <= col("cum"))
      .select(col("metric"), col("k"), col("bucket"),
        (col("r") - col("cum_before")).as("local_r"))
    val wv = Window.partitionBy("metric", "k").orderBy("v")
    val bounds = melted
      .join(broadcast(span.select("metric", "lo", "w")), Seq("metric"))
      .withColumn("bucket", expr("(v - lo) DIV w"))
      .join(broadcast(located), Seq("metric", "bucket"))
      .withColumn("rn", row_number().over(wv))
      .filter(col("rn") === col("local_r"))
      .groupBy("metric").agg(sort_array(collect_list("v")).as("bs"))
    // 1 row × 3 array-of-4 columns
    val wide = bounds.groupBy().pivot("metric", Seq("r", "f", "m")).agg(first("bs"))
    def quint(v: Column, bs: Column): Column =
      lit(1L) + aggregate(bs, lit(0L),
        (acc, b) => acc + when(v > b, 1L).otherwise(0L))
    um.crossJoin(broadcast(wide)) // one-row frame: correct broadcast
      .select(quint(col("recency_days"), col("r")).as("r_quintile"),
        quint(col("frequency"), col("f")).as("f_quintile"),
        quint(col("monetary_cents"), col("m")).as("m_quintile"),
        col("monetary_cents"))
      .groupBy("r_quintile", "f_quintile", "m_quintile")
      .agg(count(lit(1)).as("n_users"),
        sum("monetary_cents").as("total_monetary_cents"))
  }

  /** k14 — DAU/WAU STICKINESS: per epoch week, the ratio of summed daily
    * active users to weekly active users — the habit-formation metric
    * every product-analytics stack reports (DAU/MAU in its week-scaled
    * form; the corpus spans one month, so weeks are the non-degenerate
    * grain). Declared calendar: day = `unix_micros DIV 1 day`, week =
    * `day DIV 7` (epoch weeks — v5's discipline, identical integers in
    * both engines); `n_days` counts OBSERVED days so a partial first or
    * last week is normalized by its own coverage, not by 7;
    * `stickiness_ppm = Σdau · 1e6 DIV (wau · n_days)` — exactly 1e6 when
    * every weekly-active user shows up every observed day.
    *
    * Shape: one events scan projected to (user, day, week), one distinct,
    * then two week-grain aggregates over calendar-bounded frames (a
    * week-count of rows, never corpus-sized) joined on the week key. At
    * 100 TB the only corpus-sized stage is the scan + the (week, day,
    * user) distinct — map-side combined, keyed wider than any hot key.
    */
  def stickiness(spark: SparkSession, sfDir: String): DataFrame = {
    val dayUs = 86400000000L
    val udw = Tables.events(spark, sfDir)
      .select(col("user_id"),
        expr(s"unix_micros(ts) DIV $dayUs").as("day"))
      .withColumn("week", expr("day DIV 7"))
      .distinct() // (user, day, week) — a user counts once per day
    val daily = udw.groupBy("week", "day")
      .agg(count_distinct(col("user_id")).as("dau"))
      .groupBy("week")
      .agg(sum("dau").as("dau_sum"), count(lit(1)).as("n_days"))
    val weekly = udw.groupBy("week")
      .agg(count_distinct(col("user_id")).as("wau"))
    daily.join(weekly, Seq("week"))
      .select(col("week"), col("n_days"), col("dau_sum"), col("wau"),
        expr("dau_sum * 1000000 DIV (wau * n_days)").as("stickiness_ppm"))
  }

  /** k15 — USER GROWTH curve: per event-time day, newly-seen users,
    * returning actives, and the running distinct-user total — the
    * new-vs-returning decomposition every growth dashboard opens with.
    * The cumulative distinct is NOT a windowed count-distinct (state
    * explosion at scale): each user collapses to a `first_day` row
    * (one min aggregate), the day grain rolls up new-user counts, and
    * the running total is a cumulative sum over the CALENDAR-bounded
    * day frame. `returning = dau − new` needs dau per day — one more
    * (day, user) distinct rollup. Identity `cum_users_day = Σ new ≤ day`
    * is exact by construction.
    *
    * Shape: two corpus-sized map-side-combined aggregates (per-user min,
    * per-(day, user) distinct) and day-frame windows bounded by the
    * calendar — the single-partition window holds days, never users.
    */
  def userGrowth(spark: SparkSession, sfDir: String): DataFrame = {
    val dayUs = 86400000000L
    val ud = Tables.events(spark, sfDir)
      .select(col("user_id"), expr(s"unix_micros(ts) DIV $dayUs").as("day"))
    val firstDay = ud.groupBy("user_id").agg(min("day").as("day"))
      .groupBy("day").agg(count(lit(1)).as("new_users"))
    val dau = ud.distinct()
      .groupBy("day").agg(count(lit(1)).as("dau"))
    val wd = Window.orderBy("day") // day-grain frame: calendar-bounded
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    dau.join(firstDay, Seq("day"), "left")
      .select(col("day"), col("dau"),
        coalesce(col("new_users"), lit(0L)).as("new_users"))
      .withColumn("returning", col("dau") - col("new_users"))
      .withColumn("cum_users", sum("new_users").over(wd))
  }

  /** k16 — L28 ENGAGEMENT HISTOGRAM (the "power-user curve"): for the
    * 28-day window ending at the corpus's last active day, bucket users
    * by how many distinct days they were active and count users per
    * bucket — the frequency curve a growth team reads to see whether the
    * product has a daily-habit spine or a long casual tail (k14 gives
    * the one-number DAU/WAU summary; k16 is its full distribution).
    *
    * Shape: the anchor day is a ONE-ROW aggregate cross-joined back with
    * an explicit broadcast (never a corpus broadcast); then one
    * (user, day) distinct and a per-user count — both map-side-combined
    * user-keyed aggregates — and a ≤28-row rollup. Nothing wider than
    * (user_id, day) ever shuffles, so the plan is two narrow exchanges
    * at any corpus size.
    */
  def engagementHistogram(spark: SparkSession, sfDir: String): DataFrame = {
    val dayUs = 86400000000L
    val ud = Tables.events(spark, sfDir)
      .select(col("user_id"), expr(s"unix_micros(ts) DIV $dayUs").as("day"))
    val anchor = ud.agg(max("day").as("max_day")) // one row, broadcast-safe
    ud.crossJoin(broadcast(anchor))
      .filter(col("day") > col("max_day") - 28)
      .select("user_id", "day").distinct()
      .groupBy("user_id").agg(count(lit(1)).as("active_days"))
      .groupBy("active_days").agg(count(lit(1)).as("n_users"))
  }

  /** k17 — CEP SEQUENCE-PATTERN matching (Flink CEP / SQL
    * MATCH_RECOGNIZE, stated relationally): each user's event history
    * becomes an ordered journey string (one character per event type,
    * ordered by time then event id), and the conversion pattern
    * `s[cv]*p` — a signup followed by any run of clicks/views closed by
    * a purchase, with no intervening error — is counted per user by the
    * regex engine. This is the operator class k4's fixed funnel cannot
    * express: arbitrary regular patterns over event sequences
    * (negations, alternations, bounded runs) with non-overlapping match
    * semantics, for free from the regex automaton.
    *
    * Shape: one (user)-keyed shuffle of (sort-key, char) rows; the
    * journey materializes per user inside the aggregate and the
    * automaton runs once over each user's |events| characters — exactly
    * the per-key state a CEP engine keeps. At 100 TB the journey is
    * bounded by windowing the sequence (sub-journeys per session/day,
    * k1's session cut) before the same aggregate; the operator shape is
    * unchanged.
    */
  def cepFunnel(spark: SparkSession, sfDir: String): DataFrame = {
    val ch = when(col("event_type") === "signup", "s")
      .when(col("event_type") === "click", "c")
      .when(col("event_type") === "view", "v")
      .when(col("event_type") === "purchase", "p")
      .otherwise("e")
    val journeys = Tables.events(spark, sfDir)
      .select(col("user_id"),
        struct(expr("unix_micros(ts)").as("us"), col("event_id")).as("k"),
        ch.as("c"))
      .groupBy("user_id")
      .agg(array_join(transform(
        sort_array(collect_list(struct(col("k"), col("c")))),
        x => x.getField("c")), "").as("journey"))
    journeys.select(col("user_id"),
      length(col("journey")).cast("long").as("n_events"),
      regexp_count(col("journey"), lit("s[cv]*p")).cast("long")
        .as("n_conversions"))
      .withColumn("converted", col("n_conversions") > 0L)
  }

  /** k18 — CONVERSION HAZARD CURVE (discrete survival analysis with
    * right-censoring): per whole day since a user's first signup, how
    * many cohort members were still "at risk" (no purchase yet, corpus
    * hasn't ended for them) and what fraction of them converted that
    * day — the time-to-convert analysis k8's lag histogram approximates
    * without handling CENSORING (a user who signed up two days before
    * the corpus ends and hasn't purchased is not a non-converter; they
    * are unobserved past day 2, and dropping or mis-counting them biases
    * every later-day rate). Survival analysis keeps the estimate honest:
    * each user contributes to the risk set exactly up to their
    * conversion or censoring horizon.
    *
    * Kept integer-exact by reporting per-day HAZARD (conversions·10⁶
    * DIV at-risk) and cumulative conversions rather than the
    * Kaplan–Meier running PRODUCT (a product of rationals neither stays
    * in 64 bits nor floors portably; the hazard curve carries the same
    * information point-wise). Shape: two user-keyed aggregates build the
    * per-user (conversion day, censoring horizon) frame; everything
    * after is day-grain — a horizon histogram, a reverse-cumulative
    * risk count, one bounded spine — statistics-sized regardless of
    * corpus scale.
    */
  def hazardCurve(spark: SparkSession, sfDir: String): DataFrame =
    hazardCurveOf(Tables.events(spark, sfDir)
      .select(col("user_id"), col("event_type"), unix_micros(col("ts")).as("us")))

  /** k18 over an arbitrary `(user_id, event_type, us)` frame — injectable
    * because the synthetic corpus happens to convert EVERY signup, so the
    * censoring branch (the reason survival analysis exists) needs a spec-
    * built cohort to be exercised at all; `SessionsSpec` drives both.
    */
  private[ext] def hazardCurveOf(ev: DataFrame): DataFrame = {
    val dayUs = 86400000000L
    val hi = ev.agg(max("us").as("max_us"))
    val s = ev.filter(col("event_type") === "signup")
      .groupBy("user_id").agg(min("us").as("s_us"))
    val conv = s
      .join(ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("us").as("p_us0")), Seq("user_id"))
      .filter(col("p_us0") >= col("s_us"))
      .groupBy("user_id").agg(min("p_us0").as("p_us"))
    val u = s.join(conv, Seq("user_id"), "left")
      .crossJoin(broadcast(hi)) // one-row frame: correct broadcast
      .select(
        when(col("p_us").isNotNull,
          expr(s"(p_us - s_us) DIV $dayUs")).as("d"),
        expr(s"(max_us - s_us) DIV $dayUs").as("c"))
      .select(col("d"), coalesce(col("d"), col("c")).as("horizon"))
    val hh = u.groupBy(col("horizon").as("day")).agg(count(lit(1)).as("n_h"))
    val ch = u.filter(col("d").isNotNull)
      .groupBy(col("d").as("day")).agg(count(lit(1)).as("n_conv"))
    val spine = u.agg(max("horizon").as("maxh"), count(lit(1)).as("total"))
      .select(explode(expr("sequence(CAST(0 AS BIGINT), maxh)")).as("day"),
        col("total"))
    val w = Window.partitionBy(lit(1)).orderBy("day")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    spine
      .join(hh, Seq("day"), "left")
      .join(ch, Seq("day"), "left")
      .select(col("day"), col("total"),
        coalesce(col("n_h"), lit(0L)).as("n_h"),
        coalesce(col("n_conv"), lit(0L)).as("n_conv"))
      .withColumn("leaving", sum("n_h").over(w))
      // at risk on day k = cohort minus everyone whose horizon ended
      // BEFORE k (reverse-cumulative of the horizon histogram)
      .withColumn("at_risk", col("total") - (col("leaving") - col("n_h")))
      .withColumn("hazard_ppm", expr("n_conv * 1000000 DIV at_risk"))
      .withColumn("cum_conv", sum("n_conv").over(w))
      .select(col("day"), col("at_risk"), col("n_conv"),
        col("hazard_ppm"), col("cum_conv"))
  }

  /** k19 — next-event-prediction BACKTEST: train the order-1 Markov
    * predictor (per from-type argmax next-type, k7's matrix reduced to
    * its decision rule) on transitions whose from-event precedes the
    * corpus midpoint, then score top-1 accuracy on the newer half — the
    * train/eval split evaluation loop, in-engine. k7 reports the
    * transition PROBABILITIES; k19 reports whether the rule they imply
    * actually predicts held-out behavior, which is the number a product
    * team can act on (and the honest guard against reading structure
    * into a near-uniform matrix: accuracy ≈ the majority-class rate
    * says the model adds nothing).
    *
    * Exactness: the predictor is an argmax over integer counts
    * (struct-min with to_type tie-break — total order, so both engines
    * pick the same rule even on tied counts) and accuracy is integer
    * ppm. Shape: one user-keyed window builds all transitions; train
    * and eval are two filters of that one frame; the model is
    * |types|² counts collapsing to |types| rows, so the eval join is a
    * broadcast-sized lookup (AQE, never a static hint).
    */
  def markovEval(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables.events(spark, sfDir)
      .select(col("user_id"), col("event_id"), col("event_type"),
        unix_micros(col("ts")).as("us"))
    val mid = ev.agg(min("us").as("lo"), max("us").as("hi"))
      .selectExpr("(lo + hi) DIV 2 AS mid_us")
    val byUser = Window.partitionBy("user_id").orderBy("event_id")
    val steps = ev
      .withColumn("next_type", lead("event_type", 1).over(byUser))
      .filter(col("next_type").isNotNull)
      .crossJoin(broadcast(mid)) // one-row frame: correct broadcast
      .select(col("event_type").as("from_type"),
        col("next_type").as("to_type"), col("us"), col("mid_us"))
    val model = steps.filter(col("us") < col("mid_us"))
      .groupBy("from_type", "to_type").agg(count(lit(1)).as("n"))
      .groupBy("from_type")
      .agg(min(struct((-col("n")).as("neg_n"), col("to_type"))).as("m"),
        sum("n").as("n_train"))
      .select(col("from_type"), col("m.to_type").as("predicted"),
        col("n_train"))
    steps.filter(col("us") >= col("mid_us"))
      .join(model, Seq("from_type"))
      .groupBy(col("from_type"), col("predicted"), col("n_train"))
      .agg(count(lit(1)).as("n_eval"),
        sum(when(col("to_type") === col("predicted"), 1L).otherwise(0L))
          .as("n_hit"))
      .select(col("from_type"), col("predicted"), col("n_train"),
        col("n_eval"), col("n_hit"),
        expr("n_hit * 1000000 DIV n_eval").as("accuracy_ppm"))
  }

  /** k20 — ACTIVATION-COHORT LTV CURVE: users cohort by the week of
    * their first HIGH-VALUE purchase (value > 200, the p98.4 tail — the activation
    * event; first-ACTIVITY cohorts are degenerate on a corpus where
    * every user is active from week 0, which is precisely why real
    * growth teams cohort on activation, not signup), and for each
    * week-of-life offset the curve reports cumulative post-activation
    * purchase revenue per cohort member in exact integer micro-cents —
    * k5's retention matrix with VALUE in the cells, the "LTV by cohort
    * age" panel that decides payback periods. The spine is complete
    * (every cohort × every offset through the corpus horizon,
    * zero-revenue weeks included), so the curve is monotone step data;
    * the cumulative sum rides the |cohorts|×|weeks| statistics frame.
    * Week arithmetic is k5's exact integer-day form; revenue floors to
    * cents before any sum. One corpus scan to the (cohort, offset)
    * grain; the per-user work is one keyed min-aggregate.
    */
  def cohortLtv(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables.events(spark, sfDir)
      .select(col("user_id"), col("event_type"),
        expr("CAST(datediff(CAST(ts AS DATE), DATE'2024-01-01') AS BIGINT) DIV 7")
          .as("week"),
        expr("CAST(floor(value * 100) AS BIGINT)").as("cents"))
    val cohort = ev
      .filter(col("event_type") === "purchase" && col("cents") > 20000L)
      .groupBy("user_id").agg(min("week").as("cohort_week"))
    val sizes = cohort.groupBy("cohort_week").agg(count(lit(1)).as("n_users"))
    val rev = ev.filter(col("event_type") === "purchase")
      .join(cohort, Seq("user_id"))
      .filter(col("week") >= col("cohort_week")) // post-activation only
      .groupBy(col("cohort_week"), (col("week") - col("cohort_week")).as("week_offset"))
      .agg(sum("cents").as("revenue_cents"))
    val maxw = ev.agg(max("week").as("max_week"))
    val spine = sizes.crossJoin(broadcast(maxw)) // one-row frame
      .select(col("cohort_week"), col("n_users"),
        explode(expr("sequence(CAST(0 AS BIGINT), max_week - cohort_week)"))
          .as("week_offset"))
    val wcum = Window.partitionBy("cohort_week").orderBy("week_offset")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    spine
      .join(rev, Seq("cohort_week", "week_offset"), "left")
      .select(col("cohort_week"), col("week_offset"), col("n_users"),
        coalesce(col("revenue_cents"), lit(0L)).as("revenue_cents"))
      .withColumn("cum_cents", sum("revenue_cents").over(wcum))
      .withColumn("ltv_micro", expr("cum_cents * 1000000 DIV n_users"))
  }

  val queries: Map[String, Q] = Map(
    "k20_cohort_ltv" -> (cohortLtv _),
    "k19_markov_eval" -> (markovEval _),
    "k18_hazard_curve" -> (hazardCurve _),
    "k17_cep_funnel" -> (cepFunnel _),
    "k15_user_growth" -> (userGrowth _),
    "k16_l28_histogram" -> (engagementHistogram _),
    "k14_stickiness" -> (stickiness _),
    "k13_rfm_segments" -> (rfmSegments _),
    "k12_attribution" -> (attribution _),
    "k10_zscore_outliers" -> (zscoreOutliers _),
    "k9_decay_score" -> (decayScore _),
    "k8_conversion_lag" -> (conversionLag _),
    "k7_transitions" -> (transitions _),
    "k11_top_paths" -> (topPaths _),
    "k1_session_stats" -> (sessionStats _),
    "k2_distinct_types" -> (distinctTypes _),
    "k3_salted_join" -> (saltedJoin _),
    "k4_funnel" -> (funnel _),
    "k5_retention_cohorts" -> (retentionCohorts _),
    "k6_concurrency" -> (concurrency _)
  )

  val oracle: Map[String, String] = Map(
    "k20_cohort_ltv" ->
      """WITH ev AS (
        |  SELECT user_id, event_type,
        |    CAST(datediff('day', DATE '2024-01-01', CAST(ts AS DATE))
        |      AS BIGINT) // 7 AS week,
        |    CAST(floor(value * 100) AS BIGINT) AS cents
        |  FROM events),
        |cohort AS (SELECT user_id, min(week) AS cohort_week
        |           FROM ev
        |           WHERE event_type = 'purchase' AND cents > 20000
        |           GROUP BY 1),
        |sizes AS (SELECT cohort_week, CAST(count(*) AS BIGINT) AS n_users
        |          FROM cohort GROUP BY 1),
        |rev AS (
        |  SELECT cohort_week, week - cohort_week AS week_offset,
        |    CAST(sum(cents) AS BIGINT) AS revenue_cents
        |  FROM ev JOIN cohort USING (user_id)
        |  WHERE event_type = 'purchase' AND week >= cohort_week
        |  GROUP BY 1, 2),
        |mw AS (SELECT max(week) AS max_week FROM ev),
        |spine AS (
        |  SELECT cohort_week, n_users,
        |    unnest(range(0, max_week - cohort_week + 1)) AS week_offset
        |  FROM sizes CROSS JOIN mw),
        |j AS (
        |  SELECT s.cohort_week, s.week_offset, s.n_users,
        |    coalesce(revenue_cents, 0) AS revenue_cents
        |  FROM spine s LEFT JOIN rev
        |    ON s.cohort_week = rev.cohort_week
        |    AND s.week_offset = rev.week_offset)
        |SELECT cohort_week, week_offset, n_users,
        |  CAST(revenue_cents AS BIGINT) AS revenue_cents,
        |  CAST(sum(revenue_cents) OVER (PARTITION BY cohort_week
        |    ORDER BY week_offset ROWS UNBOUNDED PRECEDING) AS BIGINT)
        |    AS cum_cents,
        |  CAST(CAST(sum(revenue_cents) OVER (PARTITION BY cohort_week
        |    ORDER BY week_offset ROWS UNBOUNDED PRECEDING) AS BIGINT)
        |    * 1000000 // n_users AS BIGINT) AS ltv_micro
        |FROM j""".stripMargin,
    "k19_markov_eval" ->
      """WITH ev AS (
        |  SELECT user_id, event_id, event_type,
        |    epoch_us(CAST(ts AS TIMESTAMP)) AS us
        |  FROM events),
        |mid AS (SELECT (min(us) + max(us)) // 2 AS mid_us FROM ev),
        |steps AS (
        |  SELECT event_type AS from_type,
        |    lead(event_type) OVER (PARTITION BY user_id ORDER BY event_id)
        |      AS to_type,
        |    us, mid_us
        |  FROM ev CROSS JOIN mid),
        |s2 AS (SELECT * FROM steps WHERE to_type IS NOT NULL),
        |tr AS (
        |  SELECT from_type, to_type, CAST(count(*) AS BIGINT) AS n
        |  FROM s2 WHERE us < mid_us GROUP BY 1, 2),
        |model AS (
        |  SELECT from_type, to_type AS predicted, n_train FROM (
        |    SELECT from_type, to_type,
        |      row_number() OVER (PARTITION BY from_type
        |        ORDER BY n DESC, to_type) AS rk,
        |      CAST(sum(n) OVER (PARTITION BY from_type) AS BIGINT)
        |        AS n_train
        |    FROM tr)
        |  WHERE rk = 1)
        |SELECT from_type, predicted, n_train,
        |  CAST(count(*) AS BIGINT) AS n_eval,
        |  CAST(sum(CASE WHEN to_type = predicted THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_hit,
        |  CAST(sum(CASE WHEN to_type = predicted THEN 1 ELSE 0 END)
        |    * 1000000 // count(*) AS BIGINT) AS accuracy_ppm
        |FROM s2 JOIN model USING (from_type)
        |WHERE us >= mid_us
        |GROUP BY 1, 2, 3""".stripMargin,
    "k18_hazard_curve" ->
      """WITH ev AS (
        |  SELECT user_id, event_type,
        |    epoch_us(CAST(ts AS TIMESTAMP)) AS us
        |  FROM events),
        |hi AS (SELECT max(us) AS max_us FROM ev),
        |s AS (SELECT user_id, min(us) AS s_us FROM ev
        |      WHERE event_type = 'signup' GROUP BY 1),
        |conv AS (
        |  SELECT s.user_id, min(p.us) AS p_us
        |  FROM s JOIN ev p ON p.user_id = s.user_id
        |    AND p.event_type = 'purchase' AND p.us >= s.s_us
        |  GROUP BY 1),
        |u AS (
        |  SELECT (p_us - s_us) // 86400000000 AS d,
        |    coalesce((p_us - s_us) // 86400000000,
        |             (max_us - s_us) // 86400000000) AS horizon
        |  FROM s LEFT JOIN conv USING (user_id) CROSS JOIN hi),
        |hh AS (SELECT horizon AS day, CAST(count(*) AS BIGINT) AS n_h
        |       FROM u GROUP BY 1),
        |ch AS (SELECT d AS day, CAST(count(*) AS BIGINT) AS n_conv
        |       FROM u WHERE d IS NOT NULL GROUP BY 1),
        |spine AS (
        |  SELECT unnest(range(0, max(horizon) + 1)) AS day,
        |    CAST(count(*) AS BIGINT) AS total
        |  FROM u),
        |j AS (
        |  SELECT spine.day, total,
        |    coalesce(n_h, 0) AS n_h, coalesce(n_conv, 0) AS n_conv
        |  FROM spine LEFT JOIN hh ON spine.day = hh.day
        |             LEFT JOIN ch ON spine.day = ch.day),
        |w AS (
        |  SELECT day, n_conv,
        |    CAST(total - (sum(n_h) OVER (ORDER BY day
        |      ROWS UNBOUNDED PRECEDING) - n_h) AS BIGINT) AS at_risk,
        |    CAST(sum(n_conv) OVER (ORDER BY day
        |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_conv
        |  FROM j)
        |SELECT day, at_risk, CAST(n_conv AS BIGINT) AS n_conv,
        |  CAST(n_conv * 1000000 // at_risk AS BIGINT) AS hazard_ppm,
        |  cum_conv
        |FROM w""".stripMargin,
    "k17_cep_funnel" ->
      """WITH j AS (
        |  SELECT user_id,
        |    string_agg(CASE event_type
        |        WHEN 'signup' THEN 's' WHEN 'click' THEN 'c'
        |        WHEN 'view' THEN 'v' WHEN 'purchase' THEN 'p'
        |        ELSE 'e' END, '' ORDER BY ts, event_id) AS journey
        |  FROM events GROUP BY user_id)
        |SELECT user_id,
        |  CAST(length(journey) AS BIGINT) AS n_events,
        |  CAST(len(regexp_extract_all(journey, 's[cv]*p')) AS BIGINT)
        |    AS n_conversions,
        |  len(regexp_extract_all(journey, 's[cv]*p')) > 0 AS converted
        |FROM j""".stripMargin,
    "k16_l28_histogram" ->
      """WITH ud AS (
        |  SELECT user_id,
        |    epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000 AS day
        |  FROM events),
        |a AS (SELECT max(day) AS max_day FROM ud),
        |act AS (
        |  SELECT user_id, CAST(count(DISTINCT day) AS BIGINT) AS active_days
        |  FROM ud, a WHERE day > max_day - 28
        |  GROUP BY user_id)
        |SELECT active_days, CAST(count(*) AS BIGINT) AS n_users
        |FROM act GROUP BY active_days""".stripMargin,
    "k15_user_growth" ->
      """WITH ud AS (
        |  SELECT user_id,
        |    epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000 AS day
        |  FROM events),
        |fd AS (
        |  SELECT day, CAST(count(*) AS BIGINT) AS new_users FROM (
        |    SELECT user_id, min(day) AS day FROM ud GROUP BY user_id)
        |  GROUP BY day),
        |dau AS (
        |  SELECT day, CAST(count(*) AS BIGINT) AS dau
        |  FROM (SELECT DISTINCT day, user_id FROM ud) GROUP BY day)
        |SELECT day, dau,
        |  COALESCE(new_users, 0) AS new_users,
        |  dau - COALESCE(new_users, 0) AS returning,
        |  CAST(sum(COALESCE(new_users, 0)) OVER (ORDER BY day) AS BIGINT)
        |    AS cum_users
        |FROM dau LEFT JOIN fd USING (day)""".stripMargin,
    "k14_stickiness" ->
      """WITH udw AS (
        |  SELECT DISTINCT user_id,
        |    epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000 AS day,
        |    epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000 // 7 AS week
        |  FROM events),
        |daily AS (
        |  SELECT week, CAST(sum(dau) AS BIGINT) AS dau_sum,
        |    CAST(count(*) AS BIGINT) AS n_days
        |  FROM (SELECT week, day, count(DISTINCT user_id) AS dau
        |        FROM udw GROUP BY 1, 2)
        |  GROUP BY week),
        |weekly AS (
        |  SELECT week, CAST(count(DISTINCT user_id) AS BIGINT) AS wau
        |  FROM udw GROUP BY week)
        |SELECT week, n_days, dau_sum, wau,
        |  dau_sum * 1000000 // (wau * n_days) AS stickiness_ppm
        |FROM daily JOIN weekly USING (week)""".stripMargin,
    "k13_rfm_segments" ->
      """WITH anchor AS (
        |  SELECT max(epoch_us(CAST(ts AS TIMESTAMP))) AS aus FROM events),
        |um AS (
        |  SELECT user_id,
        |    CAST((aus - max(epoch_us(CAST(ts AS TIMESTAMP)))) // 86400000000
        |      AS BIGINT) AS recency_days,
        |    CAST(count(*) AS BIGINT) AS frequency,
        |    CAST(sum(CASE WHEN event_type = 'purchase'
        |      THEN CAST(floor(value * 100) AS BIGINT) ELSE 0 END) AS BIGINT)
        |      AS monetary_cents
        |  FROM events CROSS JOIN anchor GROUP BY user_id, aus),
        |m AS (
        |  SELECT 'r' AS metric, recency_days AS v FROM um
        |  UNION ALL SELECT 'f', frequency FROM um
        |  UNION ALL SELECT 'm', monetary_cents FROM um),
        |r AS (
        |  SELECT metric, v,
        |    row_number() OVER (PARTITION BY metric ORDER BY v) AS rn,
        |    count(*) OVER (PARTITION BY metric) AS n
        |  FROM m),
        |b AS (
        |  SELECT metric, t.k, v FROM r
        |  JOIN (VALUES (1), (2), (3), (4)) t(k) ON r.rn = (t.k * r.n + 4) // 5),
        |bs AS (SELECT metric, list(v ORDER BY v) AS lst FROM b GROUP BY metric),
        |br AS (SELECT lst AS rl FROM bs WHERE metric = 'r'),
        |bf AS (SELECT lst AS fl FROM bs WHERE metric = 'f'),
        |bm AS (SELECT lst AS ml FROM bs WHERE metric = 'm'),
        |q AS (
        |  SELECT
        |    1 + len(list_filter(rl, x -> recency_days > x)) AS r_quintile,
        |    1 + len(list_filter(fl, x -> frequency > x)) AS f_quintile,
        |    1 + len(list_filter(ml, x -> monetary_cents > x)) AS m_quintile,
        |    monetary_cents
        |  FROM um CROSS JOIN br CROSS JOIN bf CROSS JOIN bm)
        |SELECT CAST(r_quintile AS BIGINT) AS r_quintile,
        |  CAST(f_quintile AS BIGINT) AS f_quintile,
        |  CAST(m_quintile AS BIGINT) AS m_quintile,
        |  CAST(count(*) AS BIGINT) AS n_users,
        |  CAST(sum(monetary_cents) AS BIGINT) AS total_monetary_cents
        |FROM q GROUP BY 1, 2, 3""".stripMargin,
    // the oracle states the UNBUCKETED definition (plain range join) —
    // the hash match is the bucketing-completeness proof
    "k12_attribution" ->
      """WITH p AS (
        |  SELECT event_id AS purchase_id, user_id,
        |    epoch_us(CAST(ts AS TIMESTAMP)) AS pus
        |  FROM events WHERE event_type = 'purchase'),
        |c AS (
        |  SELECT event_id AS click_id, user_id,
        |    epoch_us(CAST(ts AS TIMESTAMP)) AS cus
        |  FROM events WHERE event_type = 'click'),
        |pairs AS (
        |  SELECT p.purchase_id, p.user_id, c.click_id, c.cus
        |  FROM p JOIN c ON p.user_id = c.user_id
        |    AND p.pus >= c.cus AND p.pus - c.cus <= 604800000000),
        |r AS (
        |  SELECT purchase_id, user_id, click_id,
        |    row_number() OVER (PARTITION BY purchase_id
        |                       ORDER BY cus, click_id) AS touch_rank,
        |    count(*) OVER (PARTITION BY purchase_id) AS n_touches
        |  FROM pairs)
        |SELECT purchase_id, user_id, click_id,
        |  CAST(touch_rank AS BIGINT) AS touch_rank,
        |  CAST(n_touches AS BIGINT) AS n_touches,
        |  CAST(1000000 // n_touches
        |    + CASE WHEN touch_rank = 1 THEN 1000000 % n_touches ELSE 0 END
        |    AS BIGINT) AS weight_ppm
        |FROM r""".stripMargin,
    "k10_zscore_outliers" ->
      """WITH e AS (
        |  SELECT user_id, event_id,
        |    CAST(floor(value * 1000000) AS BIGINT) AS v_micro,
        |    count(*) OVER (PARTITION BY user_id) AS n,
        |    sum(CAST(CAST(floor(value * 1000000) AS BIGINT) AS HUGEINT))
        |      OVER (PARTITION BY user_id) AS s,
        |    sum(CAST(CAST(floor(value * 1000000) AS BIGINT) AS HUGEINT) *
        |        CAST(CAST(floor(value * 1000000) AS BIGINT) AS HUGEINT))
        |      OVER (PARTITION BY user_id) AS q
        |  FROM events)
        |SELECT user_id, event_id, v_micro, CAST(n AS BIGINT) AS n_events
        |FROM e
        |WHERE (n * v_micro - s) * (n * v_micro - s) > 9 * (n * q - s * s)""".stripMargin,
    "k9_decay_score" ->
      """WITH e AS (
        |  SELECT user_id, value, epoch_us(CAST(ts AS TIMESTAMP)) AS us
        |  FROM events),
        |h AS (SELECT max(us) AS head_us FROM e)
        |SELECT user_id, count(*) AS n_events,
        |  CAST(sum(
        |    CAST(floor(value * 1000000) AS BIGINT) //
        |      (CAST(1 AS BIGINT) << CAST(least((h.head_us - us) // 86400000000, 20) AS INTEGER))
        |  ) AS BIGINT) AS score_micro
        |FROM e CROSS JOIN h
        |GROUP BY user_id""".stripMargin,
    "k8_conversion_lag" ->
      """WITH e AS (
        |  SELECT user_id, event_type,
        |    epoch_us(CAST(ts AS TIMESTAMP)) AS us
        |  FROM events),
        |v AS (
        |  SELECT user_id, min(us) AS v_us FROM e
        |  WHERE event_type = 'view' GROUP BY user_id),
        |p AS (
        |  SELECT e.user_id, min(e.us) AS p_us
        |  FROM e JOIN v USING (user_id)
        |  WHERE e.event_type = 'purchase' AND e.us > v.v_us
        |  GROUP BY e.user_id)
        |SELECT (p.p_us - v.v_us) // 86400000000 AS lag_days,
        |  count(*) AS n_users,
        |  min(p.p_us - v.v_us) AS min_lag_us,
        |  max(p.p_us - v.v_us) AS max_lag_us
        |FROM v JOIN p USING (user_id)
        |GROUP BY 1""".stripMargin,
    "k7_transitions" ->
      """WITH steps AS (
        |  SELECT event_type AS from_type,
        |    lead(event_type, 1) OVER (PARTITION BY user_id ORDER BY event_id)
        |      AS to_type
        |  FROM events),
        |pairs AS (
        |  SELECT from_type, to_type, count(*) AS n
        |  FROM steps WHERE to_type IS NOT NULL
        |  GROUP BY from_type, to_type),
        |totals AS (
        |  SELECT from_type, CAST(sum(n) AS BIGINT) AS from_total
        |  FROM pairs GROUP BY from_type)
        |SELECT from_type, to_type, n, n * 1000000 // from_total AS p_micro
        |FROM pairs JOIN totals USING (from_type)""".stripMargin,
    "k11_top_paths" ->
      """WITH steps AS (
        |  SELECT event_type AS step1,
        |    lead(event_type, 1) OVER w AS step2,
        |    lead(event_type, 2) OVER w AS step3
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY event_id)),
        |paths AS (
        |  SELECT step1, step2, step3, CAST(count(*) AS BIGINT) AS n_paths
        |  FROM steps WHERE step3 IS NOT NULL
        |  GROUP BY step1, step2, step3)
        |SELECT step1, step2, step3, n_paths,
        |  CAST(n_paths * 1000000 // CAST(sum(n_paths) OVER () AS BIGINT) AS BIGINT)
        |    AS share_ppm
        |FROM paths""".stripMargin,
    "k1_session_stats" ->
      """WITH s AS (
        |  SELECT event_id, user_id,
        |    sum(new_session) OVER (PARTITION BY user_id ORDER BY event_id) AS session_no
        |  FROM (
        |    SELECT event_id, user_id,
        |      CASE WHEN prev_ts IS NULL
        |             OR epoch_us(CAST(ts AS TIMESTAMP)) - epoch_us(prev_ts) > 1800000000
        |           THEN 1 ELSE 0 END AS new_session
        |    FROM (
        |      SELECT event_id, user_id, ts,
        |        lag(CAST(ts AS TIMESTAMP), 1) OVER (PARTITION BY user_id ORDER BY event_id) AS prev_ts
        |      FROM events)))
        |SELECT user_id, CAST(session_no AS BIGINT) AS session_no,
        |  count(*) AS n_events,
        |  min(event_id) AS first_event, max(event_id) AS last_event
        |FROM s GROUP BY user_id, session_no""".stripMargin,
    "k2_distinct_types" ->
      """SELECT user_id, count(*) AS n_distinct_types,
        |  CAST(sum(n) AS BIGINT) AS n_events
        |FROM (SELECT user_id, event_type, count(*) AS n
        |      FROM events GROUP BY user_id, event_type)
        |GROUP BY user_id""".stripMargin,
    // the PLAIN join — salting must be invisible in the result
    "k3_salted_join" ->
      """WITH dim AS (
        |  SELECT user_id, min(event_id) AS first_seq
        |  FROM events GROUP BY user_id)
        |SELECT e.user_id, count(*) AS n_events, min(d.first_seq) AS first_seq
        |FROM events e JOIN dim d ON e.user_id = d.user_id
        |GROUP BY e.user_id""".stripMargin,
    "k4_funnel" ->
      """WITH e AS (
        |  SELECT user_id, event_type, CAST(ts AS TIMESTAMP) AS ts, value
        |  FROM events),
        |s1 AS (
        |  SELECT user_id, min(ts) AS t1 FROM e
        |  WHERE event_type = 'signup' GROUP BY user_id),
        |s2 AS (
        |  SELECT e.user_id, min(e.ts) AS t2
        |  FROM e JOIN s1 ON e.user_id = s1.user_id
        |  WHERE e.event_type = 'click' AND e.value > 200 AND e.ts > s1.t1
        |  GROUP BY e.user_id),
        |s3 AS (
        |  SELECT e.user_id, min(e.ts) AS t3
        |  FROM e JOIN s2 ON e.user_id = s2.user_id
        |  WHERE e.event_type = 'purchase' AND e.value > 400 AND e.ts > s2.t2
        |  GROUP BY e.user_id)
        |SELECT CAST(CASE WHEN s3.user_id IS NOT NULL THEN 3
        |                 WHEN s2.user_id IS NOT NULL THEN 2
        |                 WHEN s1.user_id IS NOT NULL THEN 1
        |                 ELSE 0 END AS INTEGER) AS depth,
        |  count(*) AS n_users
        |FROM (SELECT DISTINCT user_id FROM e) u
        |LEFT JOIN s1 ON u.user_id = s1.user_id
        |LEFT JOIN s2 ON u.user_id = s2.user_id
        |LEFT JOIN s3 ON u.user_id = s3.user_id
        |GROUP BY 1""".stripMargin,
    "k5_retention_cohorts" ->
      """WITH ev AS (
        |  SELECT DISTINCT user_id,
        |    datediff('day', DATE '2024-01-01',
        |      CAST(CAST(ts AS TIMESTAMP) AS DATE)) // 7 AS week
        |  FROM events),
        |cohort AS (
        |  SELECT user_id, min(week) AS cohort_week FROM ev GROUP BY user_id)
        |SELECT cohort_week, week - cohort_week AS week_offset,
        |  count(*) AS n_active_users
        |FROM ev JOIN cohort USING (user_id)
        |GROUP BY 1, 2""".stripMargin,
    "k6_concurrency" ->
      """WITH s AS (
        |  SELECT event_id, user_id, ts,
        |    sum(new_session) OVER (PARTITION BY user_id ORDER BY event_id) AS session_no
        |  FROM (
        |    SELECT event_id, user_id, ts,
        |      CASE WHEN prev_ts IS NULL
        |             OR epoch_us(CAST(ts AS TIMESTAMP)) - epoch_us(prev_ts) > 1800000000
        |           THEN 1 ELSE 0 END AS new_session
        |    FROM (
        |      SELECT event_id, user_id, ts,
        |        lag(CAST(ts AS TIMESTAMP), 1) OVER (PARTITION BY user_id ORDER BY event_id) AS prev_ts
        |      FROM events))),
        |bounds AS (
        |  SELECT user_id, session_no,
        |    min(epoch_us(CAST(ts AS TIMESTAMP))) AS s_us,
        |    max(epoch_us(CAST(ts AS TIMESTAMP))) AS e_us
        |  FROM s GROUP BY user_id, session_no),
        |epochs AS (
        |  SELECT unnest(range(s_us // 1800000000, e_us // 1800000000 + 1)) AS epoch
        |  FROM bounds)
        |SELECT epoch,
        |  make_timestamp(epoch * 1800000000) AS epoch_start,
        |  count(*) AS n_active
        |FROM epochs GROUP BY epoch""".stripMargin
  )
}
