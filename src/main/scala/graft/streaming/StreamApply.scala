package graft.streaming

import graft.cdc.Materialize
import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, GroupStateTimeout}

import java.nio.file.{Files, Paths, StandardCopyOption}

/** Structured-Streaming side of the CDC engine (SURVEY.md §2 O10/O13 and
  * Q2-as-stream). The reference's consumer loop
  * (`consumer_to_opensearch.py:67-96`) is one unbounded poll applying
  * events in arrival order; its Spark equivalent is a streaming query per
  * concern:
  *
  *   - [[upsertWriter]]: `foreachBatch` + last-write-wins merge — the
  *     OpenSearch upsert-by-`_id` analog. Checkpointing replaces the
  *     consumer group (O13): at-least-once redelivery + an idempotent
  *     keyed merge gives effectively-once sink state (true exactly-once
  *     needs a transactional sink — see [[ParquetUpsertStore]]).
  *   - [[dedupped]]: `dropDuplicatesWithinWatermark` on the event id —
  *     the redelivery guard, with state bounded by the watermark.
  *   - [[windowedCounts]]: event-time tumbling counts with a watermark —
  *     the "new customers over time" dashboard as a stream (the reference
  *     had no event-time semantics at all; processing order only).
  *
  * State scale: the upsert state is the live-key set, not the event
  * history; the windowed state is bounded by the watermark horizon. Both
  * survive a 1000-executor run because all state is keyed and
  * shuffle-partitioned — nothing accumulates on the driver.
  */
object StreamApply {

  /** Micro-batch merge: new state = last-write-wins over (old state ∪
    * batch). The swap is two directory moves, so it is NOT atomic — a
    * crash can land between them. [[ParquetUpsertStore.recover]] makes it
    * crash-CONSISTENT instead: every entry point first rolls the swap
    * forward (complete `state_tmp_*` present) or back (only `state_old_*`
    * present), so a reader always sees one complete state and a replayed
    * micro-batch merges onto the recovered state idempotently. True
    * atomic commit (and with it exactly-once sink effects) needs a
    * transactional table format — in production the body of `merge` is a
    * Delta/Iceberg `MERGE WHEN MATCHED UPDATE/DELETE WHEN NOT MATCHED
    * INSERT`; this parquet store is the demo-scale stand-in with the same
    * keyed, idempotent, per-micro-batch shape.
    */
  final class ParquetUpsertStore(spark: SparkSession, dir: String,
      key: String, seq: String, opCol: String, deleteOp: String,
      payloadCols: Seq[String]) extends Serializable {

    private val statePath = s"$dir/state"

    // underscore prefix: Spark's scan ignores it as a hidden file, so
    // the marker rides inside the directory it certifies
    private val CommitMarker = "_GRAFT_COMMITTED"

    /** Roll an interrupted swap forward or back. Crash windows of
      * [[merge]], in write order (tmp is written, then MARKED committed,
      * then moved):
      *
      *   1. during the tmp write → no commit marker: the partial tmp is
      *      garbage, delete it (`state` — if any — stays authoritative;
      *      a crash before the very first commit correctly recovers to
      *      empty state and the checkpointed batch replays);
      *   2. after `state`→`state_old`, before `tmp`→`state` → roll
      *      FORWARD: the marker proves the tmp is complete, promote it;
      *   3. after `tmp`→`state`, before the old-dir delete → `state`
      *      intact: delete the stray old dir.
      *
      * Idempotent; called from every public entry point.
      */
    private def listStrays(d: java.nio.file.Path): List[java.nio.file.Path] = {
      import scala.jdk.CollectionConverters._
      val s = Files.list(d)
      try s.iterator().asScala.toList
        .filter(f => f.getFileName.toString.startsWith("state_tmp_") ||
          f.getFileName.toString.startsWith("state_old_"))
      finally s.close()
    }

    private def deleteRecursively(p: java.nio.file.Path): Unit = {
      val w = Files.walk(p)
      try w.sorted(java.util.Comparator.reverseOrder())
        .forEach(f => Files.delete(f))
      finally w.close()
    }

    private def recover(): Unit = {
      val d = Paths.get(dir)
      if (!Files.isDirectory(d)) return
      val strays = listStrays(d)
      val p = Paths.get(statePath)
      if (!Files.exists(p)) {
        // batch ids are monotonic: the highest-numbered COMMITTED tmp
        // (else old — complete by construction, it WAS the state) is the
        // most recent consistent state. A tmp without the marker is a
        // torn write (crash mid-parquet-job) and must never be promoted.
        def id(f: java.nio.file.Path): Long =
          f.getFileName.toString.split("_").last.toLong
        val candidate = strays.filter(f =>
            f.getFileName.toString.startsWith("state_tmp_") &&
              Files.exists(f.resolve(CommitMarker)))
          .sortBy(id).lastOption
          .orElse(strays.filter(_.getFileName.toString.startsWith("state_old_"))
            .sortBy(id).lastOption)
        candidate.foreach(c => Files.move(c, p, StandardCopyOption.ATOMIC_MOVE))
      }
      listStrays(d).foreach(deleteRecursively)
    }

    def snapshot(): DataFrame = {
      recover()
      val p = Paths.get(statePath)
      if (Files.exists(p)) spark.read.parquet(statePath)
      else spark.emptyDataFrame
    }

    /** Merge one micro-batch. Deletes must be retained IN the state (not
      * dropped) so a later replay of an older batch cannot resurrect a
      * deleted key; the serving view filters them.
      */
    def merge(batch: DataFrame, batchId: Long): Unit = {
      recover()
      val cols = (key +: seq +: opCol +: payloadCols).distinct
      val incoming = batch.select(cols.map(col): _*)
      val p = Paths.get(statePath)
      val merged =
        if (!Files.exists(p)) incoming
        else spark.read.parquet(statePath).unionByName(incoming)
      val next = Materialize.latestByKey(merged, key, seq, Seq(opCol) ++ payloadCols)
      val tmp = s"$dir/state_tmp_$batchId"
      next.write.mode("overwrite").parquet(tmp)
      val tmpP = Paths.get(tmp)
      // commit marker AFTER the parquet job returns: recover() promotes
      // only marked tmps, so a torn write can never become the state
      Files.createFile(tmpP.resolve(CommitMarker))
      if (Files.exists(p)) {
        val old = Paths.get(s"$dir/state_old_$batchId")
        Files.move(p, old, StandardCopyOption.ATOMIC_MOVE)
        Files.move(tmpP, p, StandardCopyOption.ATOMIC_MOVE)
        deleteRecursively(old)
      } else {
        Files.move(tmpP, p, StandardCopyOption.ATOMIC_MOVE)
      }
    }

    /** Serving view: live (non-deleted) rows only. */
    def view(): DataFrame = {
      val s = snapshot()
      if (s.schema.isEmpty) s else s.filter(col(opCol) =!= deleteOp)
    }
  }

  /** foreachBatch upsert writer over a normalized CDC event stream. */
  def upsertWriter(events: DataFrame, store: ParquetUpsertStore,
      checkpoint: String): DataStreamWriter[org.apache.spark.sql.Row] =
    events.writeStream
      .outputMode("update")
      .option("checkpointLocation", checkpoint)
      .foreachBatch((batch: DataFrame, id: Long) => store.merge(batch, id))

  /** Redelivery dedup (O13): exactly-once per event id within the
    * watermark horizon. Upstream retries land as byte-identical events,
    * so dropping by id is lossless — same contract the reference leans on
    * with its idempotent upsert. `dropDuplicatesWithinWatermark` (not
    * plain `dropDuplicates`) is what makes the horizon real: with the
    * event-time column outside the dedup key, plain `dropDuplicates`
    * never evicts its state; the within-watermark variant expires each
    * id once the watermark passes its event time, so state is bounded by
    * the horizon on an unbounded stream.
    */
  def dedupped(events: DataFrame, tsCol: String, idCol: String,
      horizon: String = "10 minutes"): DataFrame =
    events.withWatermark(tsCol, horizon).dropDuplicatesWithinWatermark(idCol)

  /** Q2 as a stream: tumbling event-time counts with late-data bound. */
  def windowedCounts(events: DataFrame, tsCol: String,
      width: String = "1 day", horizon: String = "10 minutes"): DataFrame =
    events
      .withWatermark(tsCol, horizon)
      .groupBy(window(col(tsCol), width))
      .count()
      .select(col("window.start").as("bucket"), col("count").as("n"))

  /** Batch reference for [[windowedCounts]] — used by tests to assert
    * stream/batch parity on the same event set.
    */
  def windowedCountsBatch(events: DataFrame, tsCol: String,
      width: String = "1 day"): DataFrame =
    events.groupBy(window(col(tsCol), width)).count()
      .select(col("window.start").as("bucket"), col("count").as("n"))

  /** Streaming sessionization: event-time session windows, closed after
    * `gap` of inactivity per key, state bounded by the watermark. The
    * streaming-native sibling of the batch lag/cumsum sessionization in
    * [[graft.ext.Sessions]] — `session_window` merges windows in the
    * state store, so a session emits exactly once, when the watermark
    * passes its end. The same expression runs in batch (the parity test
    * relies on that).
    */
  def sessionCounts(events: DataFrame, tsCol: String, keyCol: String,
      gap: String = "30 minutes", horizon: String = "10 minutes"): DataFrame =
    events
      .withWatermark(tsCol, horizon)
      .groupBy(col(keyCol), session_window(col(tsCol), gap))
      .count()
      .select(col(keyCol),
        col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col("count").as("n_events"))

  /** Stream-stream interval join: each left event joined to right events
    * of the same key whose timestamp falls within `[l.ts - window, l.ts]`
    * — the streaming sibling of [[graft.ext.Temporal.asofJoin]] (all
    * matches in the interval rather than only the latest; an as-of over
    * unbounded streams is not expressible with bounded state, the
    * interval bound is what lets both sides' join state be evicted at
    * the watermark).
    *
    * Column names on `right` must not collide with `left`'s; `rightTs`
    * is the right side's event-time column.
    */
  def intervalJoin(left: DataFrame, right: DataFrame, keyCol: String,
      rightKeyCol: String, tsCol: String, rightTs: String,
      window: String = "10 minutes", horizon: String = "10 minutes"): DataFrame =
    left.withWatermark(tsCol, horizon)
      .join(right.withWatermark(rightTs, horizon),
        col(keyCol) === col(rightKeyCol) &&
          col(rightTs) >= col(tsCol) - expr(s"INTERVAL $window") &&
          col(rightTs) <= col(tsCol))

  // ---- mapGroupsWithState variant of the keyed view ---------------------

  /** Normalized CDC event for the typed stateful path. */
  case class KeyedEvent(seq: Long, key: Int, op: String, value: Double)

  /** Per-key live state. */
  case class KeyState(seq: Long, value: Double, deleted: Boolean)

  /** The keyed view as CUSTOM STREAMING STATE — the
    * `mapGroupsWithState` alternative to the `foreachBatch` merge: state
    * lives in Spark's state store (shuffle-partitioned by key, bounded by
    * the live-key set, checkpointed), and each micro-batch emits the
    * updated row per touched key. Same fold semantics as
    * [[graft.cdc.Materialize]]: highest `seq` wins, deletes tombstone the
    * key (state is KEPT so an out-of-order older event cannot resurrect
    * it).
    */
  def statefulView(events: Dataset[KeyedEvent]): Dataset[(Int, KeyState)] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.key)
      .mapGroupsWithState[KeyState, (Int, KeyState)](GroupStateTimeout.NoTimeout) {
        (key, batch, state) =>
          val init = state.getOption.getOrElse(KeyState(Long.MinValue, 0.0, deleted = true))
          val next = batch.foldLeft(init) { (s, e) =>
            if (e.seq <= s.seq) s // stale replay — state already newer
            else if (e.op == "d") KeyState(e.seq, 0.0, deleted = true)
            else KeyState(e.seq, e.value, deleted = false)
          }
          state.update(next)
          key -> next
      }
  }

  /** [[statefulView]] with a tombstone TTL: a deleted key keeps its
    * tombstone (still blocking stale replays) for `ttlMs` of processing
    * time, then its state is REMOVED. Without eviction, dead keys
    * accumulate forever and state grows with the key-churn HISTORY
    * instead of the live-key set — the difference between bounded and
    * unbounded state on a 100 TB-scale churny stream. The TTL is the
    * redelivery horizon: after it, a replay of pre-delete events is
    * assumed impossible (the same contract a watermark encodes), so a
    * late stale event after eviction re-creates the key — accepted, and
    * exactly what the spec demonstrates. Live keys never time out.
    */
  def statefulViewWithTtl(events: Dataset[KeyedEvent],
      ttlMs: Long = 600000L): Dataset[(Int, KeyState)] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.key)
      .mapGroupsWithState[KeyState, (Int, KeyState)](
        GroupStateTimeout.ProcessingTimeTimeout) {
        (key, batch, state) =>
          if (state.hasTimedOut) {
            val last = state.get
            state.remove() // tombstone past the horizon — state evicted
            key -> last
          } else {
            val init = state.getOption.getOrElse(KeyState(Long.MinValue, 0.0, deleted = true))
            val next = batch.foldLeft(init) { (s, e) =>
              if (e.seq <= s.seq) s
              else if (e.op == "d") KeyState(e.seq, 0.0, deleted = true)
              else KeyState(e.seq, e.value, deleted = false)
            }
            state.update(next)
            if (next.deleted) state.setTimeoutDuration(ttlMs)
            key -> next
          }
      }
  }
}
