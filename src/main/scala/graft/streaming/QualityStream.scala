package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Continuously-maintained data-quality COMPLIANCE monitor — the
  * streaming twin of the batch v1 expectation rules over the event
  * stream: per event-time day, the event count and the number of rows
  * violating the declared value-range and type-domain constraints, kept
  * current per micro-batch. This is the quality gate a CDC ingest runs
  * ON the stream (alert the moment a producer starts emitting
  * out-of-domain rows) rather than on the next snapshot scan.
  *
  * The rules are [[graft.ext.Validate]]'s OWN constants (value ∈
  * [ValueLo, ValueHi), event_type ∈ EventTypeDomain) — one definition,
  * so the batch suite and the live monitor can never check different
  * contracts.
  *
  * Shape: the violation flags are stateless codegen'd projections; the
  * only stateful operator is one watermarked tumbling-day aggregate, so
  * state is three longs per live day — eviction follows the watermark,
  * and at 100 TB/day the state size is days-in-flight, not stream
  * length. `QualityStreamSpec` proves stream ≡ the batch fold under
  * arbitrary micro-batching.
  */
object QualityStream {

  def complianceView(events: DataFrame, latenessMinutes: Long = 60L): DataFrame =
    events
      .withWatermark("ts", s"$latenessMinutes minutes")
      .groupBy(window(col("ts"), "1 day").as("win"))
      .agg(count(lit(1)).as("n_events"),
        sum(when(col("value") < graft.ext.Validate.ValueLo ||
            col("value") >= graft.ext.Validate.ValueHi, 1L)
          .otherwise(0L)).as("n_range_violations"),
        sum(when(col("event_type").isin(graft.ext.Validate.EventTypeDomain: _*), 0L)
          .otherwise(1L)).as("n_type_violations"))
      .select(col("win.start").as("win_start"), col("n_events"),
        col("n_range_violations"), col("n_type_violations"))
}
