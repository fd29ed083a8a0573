package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Continuously-maintained M4 pixel columns — the streaming twin of the
  * batch a10 downsampler ([[graft.ext.Temporal.m4Downsample]]): per
  * (event_type, 6-hour window) the first/last/min/max points WITH their
  * timestamps, maintained live — the query behind a real-time line
  * chart that stays pixel-exact while showing data seconds old.
  *
  * One watermarked tumbling aggregate; state per live (type, window) is
  * four (value, ts, id) structs plus a count — constant per cell
  * regardless of stream rate. The four extremes are the SAME
  * struct-ordered argmin/argmax aggregates as the batch query
  * (first/last by (ts_us, event_id), min/max by (value, ts_us,
  * event_id) — total orders, so the maintained result is
  * batching-independent), and `window('6 hours')` aligns to the epoch
  * under the project-wide UTC session, so streamed window keys are
  * bit-identical to a10's `us DIV 6h` buckets: a live cell can be
  * diffed against the batch row directly. `M4StreamSpec` proves
  * stream ≡ batch a10 under arbitrary batching on the same feed.
  */
object M4Stream {

  private val BucketUs = 21600000000L // 6 h — a10's pixel width

  def m4View(events: DataFrame, latenessMinutes: Long = 60L): DataFrame =
    events
      .withWatermark("ts", s"$latenessMinutes minutes")
      .select(col("event_type"), col("ts"), col("event_id"),
        unix_micros(col("ts")).as("us"),
        expr("CAST(floor(value * 100) AS BIGINT)").as("v"))
      .groupBy(col("event_type"), window(col("ts"), "6 hours").as("win"))
      .agg(count(lit(1)).as("n_points"),
        min(struct(col("us"), col("event_id"), col("v"))).as("f"),
        max(struct(col("us"), col("event_id"), col("v"))).as("l"),
        min(struct(col("v"), col("us"), col("event_id"))).as("mn"),
        max(struct(col("v"), col("us"), col("event_id"))).as("mx"))
      .select(col("event_type"),
        expr(s"unix_micros(win.start) DIV $BucketUs").as("bucket"),
        col("n_points"),
        col("f.v").as("first_v"), col("f.us").as("first_us"),
        col("l.v").as("last_v"), col("l.us").as("last_us"),
        col("mn.v").as("min_v"), col("mn.us").as("min_us"),
        col("mx.v").as("max_v"), col("mx.us").as("max_us"))
}
