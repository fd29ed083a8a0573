package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Continuously-maintained VALUE-DISTRIBUTION histograms — the
  * streaming twin of the batch v4 drift monitor: per event-time day,
  * the 10-bin histogram of `value` on v4's OWN declared geometry
  * (`Validate.DriftBins` × `DriftWidth`, clamp-to-edge), with exact
  * integral-ppm shares. The batch query compares the corpus's old half
  * against its new half; the live monitor emits one histogram row per
  * window so the consumer compares consecutive windows — same
  * geometry, same arithmetic, so a batch-computed reference histogram
  * is directly comparable against any live window.
  *
  * Shape: ONE watermarked tumbling aggregate whose state per live
  * window is `DriftBins + 1` longs (the per-bin conditional sums ride
  * the same aggregate row as the count — NOT a (window, bin) grain,
  * which would need a second stateful pass for the shares that
  * streaming can't chain in update mode). Shares are a stateless
  * projection of that one row. `DriftStreamSpec` proves stream ≡ the
  * batch fold under arbitrary batching.
  */
object DriftStream {

  def histogramView(events: DataFrame, latenessMinutes: Long = 60L): DataFrame = {
    val bins = graft.ext.Validate.DriftBins
    val width = graft.ext.Validate.DriftWidth
    val bin = least(greatest(floor(col("value") / width), lit(0.0)),
      lit(bins - 1.0)).cast("long")
    val binSums = (0 until bins).map(b =>
      sum(when(bin === b.toLong, 1L).otherwise(0L)).as(s"b$b"))
    events
      .withWatermark("ts", s"$latenessMinutes minutes")
      .groupBy(window(col("ts"), "1 day").as("win"))
      .agg(count(lit(1)).as("n_events"), binSums: _*)
      .select(col("win.start").as("win_start"), col("n_events"),
        array((0 until bins).map(b => col(s"b$b")): _*).as("bin_counts"),
        expr(s"transform(array(${(0 until bins).map(b => s"b$b").mkString(",")}), " +
          "b -> CAST(CAST(b AS DECIMAL(38,0)) * 1000000 DIV " +
          "CAST(n_events AS DECIMAL(38,0)) AS BIGINT))").as("share_ppm"))
  }
}
