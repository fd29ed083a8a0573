package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Continuously-maintained DAILY-VOLUME counts — the streaming half of
  * the batch v8 MAD anomaly monitor ([[graft.ext.Validate.volumeAnomaly]]).
  *
  * The split of labor follows what each engine is good at: the live
  * query maintains the per-day counts (ONE watermarked tumbling
  * aggregate, state = a single long per live day — the cheapest
  * stateful query that exists), while the MAD scoring runs as a BATCH
  * pass over the maintained store via `Validate.scoreDayCounts` — the
  * medians need the whole day history anyway (yesterday's score changes
  * when today shifts the median), so scoring inside the stream would
  * both re-rank all days per micro-batch and emit retractions for every
  * historical day; scoring the store on the consumer's cadence is the
  * production shape (alerting runs minutely, state stays one long per
  * day).
  *
  * Day identity is `unix_micros DIV 1 day` — `window('1 day')` aligns
  * to the epoch under the project-wide UTC session, so the streamed day
  * keys are bit-identical to the batch query's and a maintained store
  * can be scored against (or diffed with) the batch audit directly.
  * `VolumeStreamSpec` proves count-store ≡ batch fold under arbitrary
  * batching and score ≡ the batch v8 on the same feed.
  */
object VolumeStream {

  private val DayUs = 86400000000L

  /** Live per-day event counts: `(day LONG, n_events LONG)`. */
  def dailyCountView(events: DataFrame, latenessMinutes: Long = 60L): DataFrame =
    events
      .withWatermark("ts", s"$latenessMinutes minutes")
      .groupBy(window(col("ts"), "1 day").as("win"))
      .agg(count(lit(1)).as("n_events"))
      .select(expr(s"unix_micros(win.start) DIV $DayUs").as("day"),
        col("n_events"))

  /** MAD scoring of a maintained `(day, n_events)` store — v8's own
    * arithmetic, byte-for-byte (`Validate.scoreDayCounts`).
    */
  def scoreStore(dayCounts: DataFrame): DataFrame =
    graft.ext.Validate.scoreDayCounts(dayCounts)
}
