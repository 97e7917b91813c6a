package graft.streaming

import graft.behavioral.{EventBuf, FunnelMode, FunnelScan}

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming versions of the behavioral operators.
  *
  * The reference is batch-only (DuckDB); these are the extension phases from
  * SURVEY.md §7: unbounded event streams with watermark-driven state expiry.
  *
  *   - streaming sessionize → Spark's native `session_window` (merging
  *     session state store, watermark handles late data and state GC);
  *   - streaming window_funnel → `flatMapGroupsWithState` with an event-time
  *     timeout: per-user packed event buffer, re-evaluated on each
  *     micro-batch, state dropped once the watermark passes the last event
  *     plus the funnel window (bounded state, the 100 TB requirement).
  */
object StreamingBehavioral {

  /** Gap-based streaming session stats, one row per closed (or updated)
    * session: (user_id, session start/end, n_events).
    *
    * `events` needs columns `user_id` and `ts` (timestamp). `gap` is e.g.
    * "30 minutes"; `watermark` bounds lateness AND state size. */
  def sessionStats(events: DataFrame, gap: String, watermark: String = "1 hour"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(col("user_id"), session_window(col("ts"), gap))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"),
        col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col("n_events"))

  /** Streaming exact dedup: keeps the first occurrence of each text digest
    * within the watermark horizon — the streaming counterpart of
    * `Dedup.exactDupGroups`. State is one 32-byte digest per distinct doc,
    * GC'd by the watermark. */
  def streamingExactDedup(docs: DataFrame, textCol: String = "text",
      tsCol: String = "ts", watermark: String = "1 hour"): DataFrame =
    docs
      .withColumn("text_hash", sha2(col(textCol), 256))
      .withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark("text_hash")
      .drop("text_hash")

  /** One input event for the streaming funnel: condition bitmask packed
    * exactly like the batch EventBuf (bit i = condition i). */
  case class FunnelEvent(user_id: Long, ts: java.sql.Timestamp, conds: Int)

  /** Streaming funnel output: the user's current max step. */
  case class FunnelUpdate(user_id: Long, steps: Int, n_events: Int)

  /** Per-user state: the packed event arrays (kept sorted lazily by the
    * batch scan) plus the max event time seen. */
  case class FunnelState(ts: Array[Long], conds: Array[Int], maxTsUs: Long, best: Int)

  /** Streaming window_funnel over an unbounded keyed stream.
    *
    * Same semantics as the batch aggregate, re-evaluated per micro-batch.
    * State per user is O(events inside the funnel window): events older
    * than (watermark - window) can no longer participate in any chain that
    * includes a future event, and the whole state times out (and is
    * dropped) once the watermark passes maxTs + window.
    */
  def streamingFunnel(events: Dataset[FunnelEvent], windowMicros: Long,
      numConds: Int, mode: Int = FunnelMode.Default,
      watermark: String = "1 hour"): Dataset[FunnelUpdate] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", watermark)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[FunnelState, FunnelUpdate](
        OutputMode.Update, GroupStateTimeout.EventTimeTimeout) {
        (userId: Long, batch: Iterator[FunnelEvent], state: GroupState[FunnelState]) =>
          if (state.hasTimedOut) {
            // watermark passed maxTs + window: no chain can change anymore
            state.remove()
            Iterator.empty
          } else {
            val buf = EventBuf.empty()
            var maxTsUs = Long.MinValue
            var best = 0
            state.getOption.foreach { s =>
              var i = 0
              while (i < s.ts.length) { buf.append(s.ts(i), s.conds(i)); i += 1 }
              maxTsUs = s.maxTsUs
              best = s.best
            }
            var n = 0
            batch.foreach { e =>
              if (e.ts != null && e.conds != 0) {
                val us = e.ts.getTime * 1000 + (e.ts.getNanos / 1000) % 1000
                buf.append(us, e.conds)
                if (us > maxTsUs) maxTsUs = us
                n += 1
              }
            }
            // prune events that can no longer join any future chain: an event
            // at t only matters while some chain entry within [t - window, t]
            // can still extend, i.e. while watermark < t + window
            val horizonUs = state.getCurrentWatermarkMs() * 1000 - windowMicros
            val pruned = EventBuf.empty()
            var i = 0
            buf.sortByTs()
            while (i < buf.n) {
              if (buf.ts(i) >= horizonUs) pruned.append(buf.ts(i), buf.conds(i))
              i += 1
            }
            val kept = if (pruned.n < buf.n) pruned else buf
            // monotone funnel depth: pruning must never lower a step
            // already reached by an expired chain
            val steps = math.max(best,
              FunnelScan.maxStep(kept, windowMicros, mode, numConds))
            state.update(FunnelState(
              java.util.Arrays.copyOf(kept.ts, kept.n),
              java.util.Arrays.copyOf(kept.conds, kept.n), maxTsUs, steps))
            // expire once nothing can change: watermark > maxTs + window
            state.setTimeoutTimestamp((maxTsUs + windowMicros) / 1000 + 1)
            Iterator.single(FunnelUpdate(userId, steps, kept.n))
          }
      }
  }
}
