package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Continuously-maintained SLIDING-window distinct-user counts — the
  * streaming twin of the batch w4 (`ext.Relational.slidingDistinct`):
  * hour-long windows stepped every 15 minutes, each reporting the exact
  * number of distinct users, kept current per micro-batch.
  *
  * Two CHAINED stateful operators implement the exactness:
  *
  *   1. the same bounded cover-set fan-out as batch w4 (an event belongs
  *      to exactly `win/step = 4` windows, so a 4× explode turns sliding
  *      into plain grouping — no window spine, no range join), then a
  *      watermarked `dropDuplicates` on (window, user): its state is the
  *      set of (window, user) pairs still inside the watermark, which is
  *      what makes the count EXACT under at-least-once delivery — a
  *      redelivered event is a duplicate pair and is absorbed;
  *   2. a per-window count over the deduplicated stream (Update mode):
  *      state is one long per live window.
  *
  * The watermark bounds BOTH states: closed windows age out of the dedup
  * set and the count map — the memory story at 100 TB/day is
  * |users active per window| · (watermark/step) pairs, not stream
  * length. (The sketch-based `DistinctStream` is the same dashboard with
  * O(64) state per window when approximate is acceptable; this twin is
  * the exact-contract sibling, `SlidingStreamSpec` proves stream ≡
  * batch w4.)
  *
  * Input: a streaming frame with `user_id` and an event-time `ts`
  * TIMESTAMP column. The caller states its REAL event lateness bound in
  * whole minutes; the watermark actually applied is `lateness + window
  * length (60 min)`, because it necessarily rides the DERIVED
  * `win_start` column (Spark evicts dedup state only on a column in the
  * dedup key), and relative to the maximum event time an event late by
  * L has its oldest cover-set row at `win_start ≥ T − L − step −
  * (window − step) = T − L − window` — the fan-out skew (window − step
  * = 45 min) PLUS up to one step (15 min) of its own truncation.
  * Without that full internal margin, events within the stated bound
  * would silently lose their older cover-set rows and windows would
  * undercount — the caller-facing contract is lateness-of-EVENTS, and
  * the derived-column skew is this module's own business.
  */
object SlidingStream {

  private val StepUs = graft.ext.Relational.SlidingStepUs
  private val Fan = graft.ext.Relational.SlidingFan
  /** Full window length in minutes, CEILING division: (window − step)
    * fan-out skew + one step of win_start truncation. Ceil keeps the
    * margin safe if the shared constants ever stop being whole minutes.
    */
  private val WindowSkewMinutes = (StepUs * Fan + 59999999L) / 60000000L

  def slidingDistinctView(events: DataFrame,
      latenessMinutes: Long = 240L): DataFrame =
    events
      .select(col("user_id"), col("ts"),
        explode(sequence(lit(0L), lit(Fan - 1L))).as("j"))
      .select(col("user_id"),
        // the SHARED floor-aligned cover-set arithmetic (truncating
        // `div` would diverge on pre-1970 event times)
        timestamp_micros(graft.ext.Relational.coverStartUs(
          unix_micros(col("ts")), col("j"))).as("win_start"))
      .withWatermark("win_start", s"${latenessMinutes + WindowSkewMinutes} minutes")
      .dropDuplicates("win_start", "user_id")
      .groupBy("win_start")
      .agg(count(lit(1)).as("n_users"))
}
