package graft.streaming

import graft.ext.Dedup
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.DataStreamWriter

/** Streaming near-duplicate detection — the ingest-time twin of the d3/d13
  * batch family. A document stream is deduplicated AGAINST EVERYTHING EVER
  * INGESTED at per-batch cost that follows the batch size, never the
  * corpus:
  *
  *   - the persisted MinHash sketch INDEX (one row per document:
  *     [[Dedup.LshBands]] band keys + the sorted token-hash set, byte-identical to the rows
  *     [[Dedup.sketchOf]] computes in batch) lives in a
  *     [[StreamApply.ParquetUpsertStore]] — append-mostly keyed state with
  *     the single-pointer atomic commit;
  *   - each micro-batch sketches only its own documents, band-joins them
  *     against the index plus themselves ([[Dedup.incrementalPairs]] — the
  *     same engine as batch d13, so stream and batch provably agree), and
  *     confirms candidates with the exact sorted-intersect Jaccard;
  *   - confirmed pairs land in a second store KEYED BY THE PAIR, so the
  *     at-least-once replay of a micro-batch re-derives byte-identical
  *     rows and the keyed merge absorbs them — pairs are emitted
  *     effectively-once without any batch-id bookkeeping.
  *
  * Crash safety: pairs commit before the index. A crash between the two
  * merges replays the batch against an index that does not yet contain it,
  * recomputing the identical pair set (absorbed by key) and then
  * committing the index — nothing is lost, nothing duplicates. The reverse
  * order would lose pairs: a replayed batch already in the index
  * anti-joins itself away.
  *
  * At 100 TB the index store is a partitioned table (bucket by doc_id; the
  * band join reshuffles on band keys regardless) and the merge is a Delta/
  * Iceberg MERGE — same protocol, scaled out; per-ingest cost is
  * |delta| × collision rate, exactly d13's scaling argument.
  */
object NearDupStream {

  /** The two stores a near-dup ingest pipeline maintains.
    *
    * The index store's directory carries [[Dedup.geomTag]] (mirroring
    * the batch dedup indexes): the persisted rows embed the banding
    * geometry in their SCHEMA (bk0..bk{n-1}), so a geometry change must
    * change the store PATH or reopening a store written under the old
    * geometry would fail on `indexView()`'s select with an unexplained
    * AnalysisException — and, worse, a schema-merging store could
    * silently mix band keys computed under two geometries.
    */
  final class Stores(spark: SparkSession, dir: String) {
    val index = new StreamApply.ParquetUpsertStore(spark,
      s"$dir/index${Dedup.geomTag}",
      "doc_id", "seq", "op", "d", Dedup.bandCols :+ "toks")
    val pairs = new StreamApply.ParquetUpsertStore(spark, s"$dir/pairs",
      "pair_key", "seq", "op", "d", Seq("doc_a", "doc_b", "jac"))

    /** Confirmed near-dup pairs so far. */
    def pairsView(): DataFrame = {
      val v = pairs.view()
      if (v.schema.isEmpty) v else v.select("doc_a", "doc_b", "jac")
    }

    /** The sketch index as a [[Dedup.sketchOf]]-shaped frame. */
    def indexView(): DataFrame = {
      val v = index.view()
      if (v.schema.isEmpty) v
      else v.select("doc_id", Dedup.bandCols :+ "toks": _*)
    }
  }

  /** Sketch one `(doc_id, text)` micro-batch, find its near-dup pairs
    * against the index (plus itself), and commit them to the pair store.
    * Returns the batch sketch and the found pairs (both materialized)
    * so [[LabelStream]] can maintain cluster labels from the same
    * derivation — the INDEX merge is deliberately NOT done here: it
    * must come last in whatever chain consumes this (crash between the
    * pair/label commits and the index commit replays the batch against
    * an index that does not yet contain it, re-deriving identical rows;
    * the reverse order would lose them — a replayed batch already in
    * the index anti-joins itself away).
    */
  private[streaming] def findAndCommitPairs(batch: DataFrame, batchId: Long,
      stores: Stores): (DataFrame, DataFrame) = {
    val sk = Dedup.sketchOf(batch.select("doc_id", "text"))
      // consulted by both band joins, both confirm re-joins, and the
      // index merge — one sketch pass per batch, not six
      .localCheckpoint()
    val indexed = stores.indexView()
    // Replay guard: a redelivered document is already in the index; the
    // anti-join keeps it out of the "old corpus" side so it cannot pair
    // with itself (its pairs re-derive identically and merge by key).
    val old =
      if (indexed.schema.isEmpty) sk.limit(0)
      else indexed.join(sk.select("doc_id"), Seq("doc_id"), "left_anti")
    // batch-bounded (delta × collision rate); consumed by the pair merge
    // and by label maintenance
    val found = Dedup.incrementalPairs(sk, old).localCheckpoint()
    stores.pairs.merge(found.select(
      concat_ws("_", col("doc_a"), col("doc_b")).as("pair_key"),
      lit(batchId).as("seq"), lit("i").as("op"),
      col("doc_a"), col("doc_b"), col("jac")), batchId)
    (sk, found)
  }

  /** Commit the batch sketch into the index — the LAST step of every
    * ingest chain (see [[findAndCommitPairs]] for the ordering proof).
    */
  private[streaming] def commitIndex(sk: DataFrame, batchId: Long,
      stores: Stores): Unit =
    stores.index.merge(sk.select(col("doc_id") +:
      lit(batchId).as("seq") +: lit("i").as("op") +:
      (Dedup.bandCols.map(col) :+ col("toks")): _*), batchId)

  /** One micro-batch of `(doc_id, text)` documents through the ingest
    * path. Public so tests can drive replay directly.
    */
  def applyBatch(batch: DataFrame, batchId: Long, stores: Stores): Unit = {
    val (sk, _) = findAndCommitPairs(batch, batchId, stores)
    commitIndex(sk, batchId, stores)
  }

  /** foreachBatch writer: dedup a `(doc_id, text)` document stream
    * against the full ingest history.
    */
  def nearDupWriter(docsStream: DataFrame, stores: Stores,
      checkpoint: String): DataStreamWriter[Row] =
    docsStream.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .foreachBatch((batch: DataFrame, id: Long) =>
        applyBatch(batch, id, stores))
}
