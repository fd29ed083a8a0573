package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Continuously-maintained VALUE-CDF counts scored against a frozen
  * reference by exact Kolmogorov–Smirnov — the streaming half of the
  * batch v9 drift test ([[graft.ext.Validate.ksDrift]]), and the
  * exact-grain sibling of [[DriftStream]]'s 10-bin histograms.
  *
  * The labor split is [[VolumeStream]]'s: the live query maintains the
  * per-(type, cent) counts — one global update-mode aggregate whose
  * state is a single long per observed (type, cent), bounded by the
  * declared value domain, never by stream length — while the KS itself
  * runs as a batch read joining the maintained store against a FROZEN
  * reference distribution (a golden snapshot's counts) through
  * [[graft.ext.Validate.ksStatOn]] — v9's own engine, one definition,
  * so the live alarm and the batch audit can never disagree on
  * arithmetic. Scoring in-stream would re-rank every cent row per
  * micro-batch inside a second stateful pass update mode can't chain;
  * scoring the store on the consumer's cadence is the production shape.
  *
  * `KsStreamSpec` proves count-store ≡ the batch count fold under
  * arbitrary batching, and served KS ≡ the batch engine on identical
  * frames — including a drift injection the monitor must flag.
  */
object KsStream {

  /** Live exact-cents counts: `(event_type, v, n)` — the streaming CDF
    * state. No watermark: the CDF is over all time by definition, and
    * the state is value-domain-bounded, not time-bounded.
    */
  def centCountView(events: DataFrame): DataFrame =
    events
      .select(col("event_type"),
        expr("CAST(floor(value * 100) AS BIGINT)").as("v"))
      .groupBy("event_type", "v")
      .agg(count(lit(1)).as("n"))

  /** KS of a maintained `(event_type, v, n)` store against a reference
    * relation of the same shape — v9's engine byte-for-byte.
    */
  def ksAgainst(store: DataFrame, reference: DataFrame): DataFrame = {
    val a = store.select(col("event_type").as("key"), col("v"),
      col("n").as("n_a"))
    val b = reference.select(col("event_type").as("key"), col("v"),
      col("n").as("n_b"))
    val combined = a.join(b, Seq("key", "v"), "full_outer")
      .select(col("key"), col("v"),
        coalesce(col("n_a"), lit(0L)).as("n_a"),
        coalesce(col("n_b"), lit(0L)).as("n_b"))
    graft.ext.Validate.ksStatOn(combined)
      .select(col("key").as("event_type"), col("n_a").as("n_live"),
        col("n_b").as("n_ref"), col("ks_ppm"), col("drifted"))
  }
}
