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

  /** Arm a state-expiry event-time timeout, clamped above the current
    * watermark: `setTimeoutTimestamp` throws if handed a timestamp the
    * watermark has already passed, which a straight `maxTs + horizon` can
    * produce for a user whose (late, or all-filtered) batch left `maxTs`
    * behind the watermark — the state then expires at the next watermark
    * advance instead of crashing the query. */
  private def armExpiry(state: GroupState[_], tsMs: Long): Unit =
    state.setTimeoutTimestamp(math.max(tsMs, state.getCurrentWatermarkMs() + 1))

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

  /** One banded fingerprint row for the streaming near-dup dedup: `bucket`
    * packs (band index, 16 fingerprint bits) so each of the 4 bands keys
    * its own state partition. */
  case class SimhashBandEvent(bucket: Long, doc_id: Long,
      ts: java.sql.Timestamp, simhash: Long)

  /** Per-band vote: was this doc within `maxDist` of anything previously
    * seen in this band bucket? */
  case class NearDupVote(doc_id: Long, ts: java.sql.Timestamp, dup: Boolean)

  /** Fingerprints seen in one band bucket within the watermark horizon. */
  case class BandState(sim: Array[Long], tsUs: Array[Long])

  /** Streaming NEAR-duplicate suppression by SimHash Hamming distance —
    * the streaming counterpart of `Dedup.simhashPairs`. A document is
    * flagged `is_near_dup` iff a document within Hamming distance
    * `maxDist` (≤ 3: the 4×16-bit pigeonhole bound, like the batch join)
    * was seen earlier within the watermark horizon; suppression is
    * seen-based (a suppressed doc still suppresses its own later
    * near-dups), and — exactly like `streamingExactDedup` — the guarantee
    * only spans the watermark: expired fingerprints are GC'd and a late
    * near-dup of an expired doc re-emits as new.
    *
    * Shape: the fingerprint is the per-row `simhash64` kernel (no
    * shuffle), each doc fans out to its 4 band buckets (the only
    * exchange), per-bucket state is a pruned fingerprint list keyed by
    * (band, 16 bits) — state cardinality is bounded by docs-in-horizon ×
    * 4, spread over 2^18 bucket keys, with event-time timeout dropping
    * idle buckets — and a final per-(doc, ts) aggregate ORs the 4 band
    * votes — any band finding a within-distance prior fingerprint makes
    * the doc a near-dup (multiple stateful operators in append mode).
    * Output:
    * (doc_id, ts, is_near_dup), emitted once the watermark passes ts.
    *
    * Requires `spark.sql.streaming.statefulOperator.checkCorrectness
    * .enabled=false`: Spark's static check cannot see that the vote
    * stage emits each row in the SAME micro-batch with its ORIGINAL
    * event time (never late for the downstream aggregate), so it flags
    * the flatMapGroupsWithState → aggregation chain as a possible
    * late-row hazard. Documents arriving behind the watermark are
    * dropped (the standard streaming-lateness contract).
    */
  /** Default per-row fingerprint for `streamingSimhashDedup`: `simhash64`
    * (xxhash64 token votes) over whitespace tokens — the production kernel. */
  def simhash64Fingerprint(text: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    org.apache.spark.sql.graftbridge.ColumnBridge.column(
      graft.functions.Simhash64(
        org.apache.spark.sql.graftbridge.ColumnBridge.expression(
          graft.ops.TextAnalysis.tokensWs(text))))

  /** Oracle-mirrorable md5 fingerprint packed to the same 64-bit layout
    * (4×16-bit bands), the streaming twin of `Dedup.simhashIndexMd5`'s
    * conversion — lets the streaming near-dup screen be gated against the
    * DuckDB md5 simhash oracle (q83). */
  def simhashMd5Fingerprint(text: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    val hex = org.apache.spark.sql.graftbridge.ColumnBridge.column(
      graft.functions.SimhashMd5Hex(
        org.apache.spark.sql.graftbridge.ColumnBridge.expression(
          graft.ops.TextAnalysis.tokensWs(text))))
    val hi = conv(substring(hex, 1, 8), 16, 10).cast("long")
    val lo = conv(substring(hex, 9, 8), 16, 10).cast("long")
    shiftleft(hi, 32).bitwiseOR(lo)
  }

  def streamingSimhashDedup(docs: DataFrame, maxDist: Int = 3,
      idCol: String = "doc_id", textCol: String = "text",
      tsCol: String = "ts", watermark: String = "1 hour",
      fingerprint: org.apache.spark.sql.Column => org.apache.spark.sql.Column =
        simhash64Fingerprint): DataFrame = {
    require(maxDist >= 0 && maxDist <= 3,
      s"maxDist must be in [0,3] for the 4-band pigeonhole guarantee, got $maxDist")
    val spark = docs.sparkSession
    import spark.implicits._
    val fp = docs.select(col(idCol).cast("long").as("doc_id"),
        col(tsCol).as("ts"),
        fingerprint(col(textCol)).as("simhash"))
      .filter(col("simhash").isNotNull)
    val banded = fp.select(col("doc_id"), col("ts"), col("simhash"),
        explode(array((0 until 4).map(b =>
          lit(b.toLong << 16) + shiftrightunsigned(col("simhash"), b * 16)
            .bitwiseAND(lit(0xFFFFL))): _*)).as("bucket"))
      .withWatermark("ts", watermark)
      .select(col("bucket"), col("doc_id"), col("ts"), col("simhash"))
      .as[SimhashBandEvent]
    val votes = banded
      .groupByKey(_.bucket)
      .flatMapGroupsWithState[BandState, NearDupVote](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (_: Long, batch: Iterator[SimhashBandEvent], state: GroupState[BandState]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            val sims = scala.collection.mutable.ArrayBuffer.empty[Long]
            val tss = scala.collection.mutable.ArrayBuffer.empty[Long]
            state.getOption.foreach { s => sims ++= s.sim; tss ++= s.tsUs }
            // deterministic within-batch order: earlier (ts, id) suppresses
            val events = batch.toArray.sortBy(e =>
              (e.ts.getTime, e.doc_id))
            val out = events.map { e =>
              var dup = false
              var i = 0
              while (!dup && i < sims.length) {
                if (java.lang.Long.bitCount(sims(i) ^ e.simhash) <= maxDist)
                  dup = true
                i += 1
              }
              sims += e.simhash
              tss += e.ts.getTime * 1000
              NearDupVote(e.doc_id, e.ts, dup)
            }
            // GC: fingerprints behind the watermark can never suppress a
            // future (non-late) document
            val horizonUs = state.getCurrentWatermarkMs() * 1000
            val keep = tss.indices.filter(i => tss(i) >= horizonUs)
            if (keep.isEmpty) state.remove()
            else {
              state.update(BandState(keep.map(sims).toArray, keep.map(tss).toArray))
              val maxTsMs = keep.map(i => tss(i) / 1000).max
              state.setTimeoutTimestamp(
                math.max(maxTsMs, state.getCurrentWatermarkMs()) + 1)
            }
            out.iterator
          }
      }
    // OR the 4 band votes per (doc, ts): near-dup iff ANY band saw a
    // within-distance prior fingerprint
    votes.toDF()
      .withWatermark("ts", watermark)
      .groupBy(col("doc_id"), col("ts"))
      .agg((max(col("dup").cast("int")) === 1).as("is_near_dup"))
  }

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
              if (e.ts != null) {
                val us = e.ts.getTime * 1000 + (e.ts.getNanos / 1000) % 1000
                // maxTs tracks EVERY event (like streamingRetention): a user
                // whose first batch is all conds=0 noise must still arm a
                // valid expiry timestamp, not Long.MinValue + window
                if (us > maxTsUs) maxTsUs = us
                if (e.conds != 0) {
                  buf.append(us, e.conds)
                  n += 1
                }
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
            armExpiry(state, (maxTsUs + windowMicros) / 1000 + 1)
            Iterator.single(FunnelUpdate(userId, steps, kept.n))
          }
      }
  }

  /** One input event for streaming retention: condition bitmask packed
    * like the batch RetentionAgg buffer (bit i = condition i). */
  case class RetentionEvent(user_id: Long, ts: java.sql.Timestamp, conds: Int)

  /** Streaming retention output: the user's anchor-gated flags, one per
    * condition — identical semantics to the batch `retention` aggregate
    * (flag 0 = anchor seen; flag i = anchor seen AND condition i seen). */
  case class RetentionUpdate(user_id: Long, flags: Seq[Boolean])

  /** Per-user retention state: the OR of all condition bitmasks seen plus
    * the max event time (for expiry). O(1) — retention is the ideal
    * streaming aggregate: the state is a single Int however many events
    * arrive. */
  case class RetentionState(mask: Int, maxTsUs: Long)

  /** Streaming `retention` over an unbounded keyed stream: per-user
    * bitmask-OR state updated per micro-batch, anchor gating applied at
    * emission exactly like the batch aggregate's finalize. Unlike the
    * funnel there is nothing to prune — the mask is O(1) — so the
    * watermark's only job is state EXPIRY: a user idle past `horizon`
    * (event-time) is dropped, bounding state cardinality by
    * users-active-within-horizon. Late events behind the watermark are
    * dropped by the standard lateness contract. Emits in Update mode:
    * each micro-batch re-emits the users it touched. */
  def streamingRetention(events: Dataset[RetentionEvent], numConds: Int,
      watermark: String = "1 hour",
      horizonMicros: Long = 30L * 86400 * 1000000): Dataset[RetentionUpdate] = {
    require(numConds >= 1 && numConds <= 32,
      s"retention supports 1..32 conditions, got $numConds")
    require(horizonMicros > 0, s"horizonMicros must be positive, got $horizonMicros")
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", watermark)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[RetentionState, RetentionUpdate](
        OutputMode.Update, GroupStateTimeout.EventTimeTimeout) {
        (userId: Long, batch: Iterator[RetentionEvent], state: GroupState[RetentionState]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            var mask = 0
            var maxTsUs = Long.MinValue
            state.getOption.foreach { s => mask = s.mask; maxTsUs = s.maxTsUs }
            batch.foreach { e =>
              if (e.ts != null) {
                mask |= e.conds
                val us = e.ts.getTime * 1000 + (e.ts.getNanos / 1000) % 1000
                if (us > maxTsUs) maxTsUs = us
              }
            }
            state.update(RetentionState(mask, maxTsUs))
            armExpiry(state, (maxTsUs + horizonMicros) / 1000 + 1)
            // anchor gating at emission, same as the batch finalize:
            // flag 0 = anchor bit; flag i = anchor AND bit i
            val anchor = (mask & 1) != 0
            val flags = (0 until numConds).map(i =>
              if (i == 0) anchor else anchor && ((mask >> i) & 1) != 0)
            Iterator.single(RetentionUpdate(userId, flags))
          }
      }
  }

  /** One input event for streaming sequence_match: condition bitmask
    * packed like the batch `EventBuf` (bit i = condition i+1 of the
    * pattern, i.e. `(?1)` tests bit 0). */
  case class SeqEvent(user_id: Long, ts: java.sql.Timestamp, conds: Int)

  /** Streaming sequence_match output: whether the user's buffered event
    * history matches the pattern (monotone — once true it stays true for
    * the lifetime of the user's state), plus the buffered-event count
    * (0 once matched: the buffer is dropped on latch). */
  case class SeqMatchUpdate(user_id: Long, matched: Boolean, n_buffered: Int)

  /** Per-user state: packed event buffer + max event time + the latch. */
  case class SeqMatchState(ts: Array[Long], conds: Array[Int],
      maxTsUs: Long, matched: Boolean)

  /** Streaming `sequence_match` over an unbounded keyed stream: the batch
    * pattern engine (`PatternExecutor` — same fast paths, same NFA, same
    * 10k-state guard) re-evaluated per micro-batch over a per-user packed
    * event buffer.
    *
    * Match latching: a match can never be un-matched by later events, so
    * the first successful evaluation LATCHES `matched` and drops the
    * buffer — matched users cost O(1) state from then on, and evaluation
    * stops for them.
    *
    * State bounding is the `horizonMicros` contract (same forgetting
    * contract as streaming retention / the dedup ops): events older than
    * watermark − horizon are pruned from unmatched buffers, so a match
    * whose WHOLE SPAN would exceed the horizon can be missed — size the
    * horizon to the longest chain the product cares about. A user idle
    * past the horizon expires entirely (latched or not) and restarts
    * from scratch if they return. Late events behind the watermark are
    * dropped by the standard lateness contract.
    *
    * Only condition-bearing events enter the buffer (conds != 0), exactly
    * like the batch aggregate — `.`/`.*` see condition-bearing events
    * only (SURVEY.md §1.4). */
  def streamingSequenceMatch(events: Dataset[SeqEvent], pattern: String,
      watermark: String = "1 hour",
      horizonMicros: Long = 30L * 86400 * 1000000): Dataset[SeqMatchUpdate] = {
    val steps = graft.behavioral.pattern.PatternParser.parse(pattern) match {
      case Right(s) => s
      case Left(e) => throw new IllegalArgumentException(
        s"sequence_match pattern error: $e")
    }
    require(horizonMicros > 0, s"horizonMicros must be positive, got $horizonMicros")
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", watermark)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SeqMatchState, SeqMatchUpdate](
        OutputMode.Update, GroupStateTimeout.EventTimeTimeout) {
        (userId: Long, batch: Iterator[SeqEvent], state: GroupState[SeqMatchState]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            var maxTsUs = Long.MinValue
            var matched = false
            val buf = EventBuf.empty()
            state.getOption.foreach { s =>
              matched = s.matched
              maxTsUs = s.maxTsUs
              if (!matched) {
                var i = 0
                while (i < s.ts.length) { buf.append(s.ts(i), s.conds(i)); i += 1 }
              }
            }
            batch.foreach { e =>
              if (e.ts != null) {
                val us = e.ts.getTime * 1000 + (e.ts.getNanos / 1000) % 1000
                if (us > maxTsUs) maxTsUs = us
                if (!matched && e.conds != 0) buf.append(us, e.conds)
              }
            }
            if (!matched) {
              // prune events the horizon has passed: they may no longer
              // combine with future events (the forgetting contract)
              val horizonUs = state.getCurrentWatermarkMs() * 1000 - horizonMicros
              val pruned = EventBuf.empty()
              buf.sortByTs()
              var i = 0
              while (i < buf.n) {
                if (buf.ts(i) >= horizonUs) pruned.append(buf.ts(i), buf.conds(i))
                i += 1
              }
              val kept = if (pruned.n < buf.n) pruned else buf
              matched = graft.behavioral.pattern.PatternExecutor
                .execute(steps, kept, countAll = false) > 0
              if (matched) {
                // latch: drop the buffer, O(1) state from here on
                state.update(SeqMatchState(Array.emptyLongArray,
                  Array.emptyIntArray, maxTsUs, matched = true))
              } else {
                state.update(SeqMatchState(
                  java.util.Arrays.copyOf(kept.ts, kept.n),
                  java.util.Arrays.copyOf(kept.conds, kept.n),
                  maxTsUs, matched = false))
              }
            } else {
              state.update(SeqMatchState(Array.emptyLongArray,
                Array.emptyIntArray, maxTsUs, matched = true))
            }
            armExpiry(state, (maxTsUs + horizonMicros) / 1000 + 1)
            val nBuf = state.get.ts.length
            Iterator.single(SeqMatchUpdate(userId, matched, nBuf))
          }
      }
  }

  /** Streaming sequence_count output: cumulative non-overlapping match
    * count (monotone) plus the events still buffered (those not yet
    * consumed by a counted match and inside the horizon). */
  case class SeqCountUpdate(user_id: Long, n_matches: Long, n_buffered: Int)

  /** Per-user state: completed-match count + the unconsumed event suffix. */
  case class SeqCountState(count: Long, ts: Array[Long], conds: Array[Int],
      maxTsUs: Long)

  /** Streaming `sequence_count` (non-overlapping, resume at match end + 1)
    * over an unbounded keyed stream — the counting sibling of
    * `streamingSequenceMatch`, sharing the batch pattern engine unchanged.
    *
    * The per-batch step counts matches in (state suffix ++ new events) and
    * then DROPS the consumed prefix: in non-overlapping semantics the
    * search resumes at match end + 1, so nothing at or before the last
    * counted match's end can ever participate again. The consumed boundary
    * is reported by the counting pass itself
    * (`PatternExecutor.executeWithConsumed`), so count and boundary agree
    * by construction — in particular under the `MaxNfaStates` abort guard,
    * where a start position's outcome depends on how much buffer follows
    * it and the count is therefore NOT monotone in prefix length (the
    * prefix-rerun binary search this replaces could disagree with the
    * counting pass near the guard and silently re-expose or over-drop
    * events; StreamingSeqCountSpec pins a guard-straddling pattern).
    *
    * Same horizon contract as `streamingSequenceMatch`: unconsumed events
    * older than watermark − horizon are pruned (a match spanning wider than
    * the horizon may be missed), idle users expire, late events drop. The
    * emitted count is cumulative and monotone within a state lifetime.
    *
    * Counted matches are FINAL: an event that arrives later (above the
    * watermark, so not "late" by the lateness contract) but whose
    * timestamp sorts before an already-counted match joins only the
    * unconsumed suffix — it cannot retroactively re-partition matches the
    * operator already emitted, where the batch aggregate re-sorting full
    * history might. Emitted counts never need correction; that finality
    * is the streaming contract. */
  def streamingSequenceCount(events: Dataset[SeqEvent], pattern: String,
      watermark: String = "1 hour",
      horizonMicros: Long = 30L * 86400 * 1000000): Dataset[SeqCountUpdate] = {
    val steps = graft.behavioral.pattern.PatternParser.parse(pattern) match {
      case Right(s) => s
      case Left(e) => throw new IllegalArgumentException(
        s"sequence_count pattern error: $e")
    }
    require(horizonMicros > 0, s"horizonMicros must be positive, got $horizonMicros")
    import events.sparkSession.implicits._

    events
      .withWatermark("ts", watermark)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SeqCountState, SeqCountUpdate](
        OutputMode.Update, GroupStateTimeout.EventTimeTimeout) {
        (userId: Long, batch: Iterator[SeqEvent], state: GroupState[SeqCountState]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            var count = 0L
            var maxTsUs = Long.MinValue
            val buf = EventBuf.empty()
            state.getOption.foreach { s =>
              count = s.count
              maxTsUs = s.maxTsUs
              var i = 0
              while (i < s.ts.length) { buf.append(s.ts(i), s.conds(i)); i += 1 }
            }
            batch.foreach { e =>
              if (e.ts != null) {
                val us = e.ts.getTime * 1000 + (e.ts.getNanos / 1000) % 1000
                if (us > maxTsUs) maxTsUs = us
                if (e.conds != 0) buf.append(us, e.conds)
              }
            }
            // prune unconsumed events the horizon has passed (forgetting
            // contract — consumed events are already gone)
            val horizonUs = state.getCurrentWatermarkMs() * 1000 - horizonMicros
            buf.sortByTs()
            val pruned = EventBuf.empty()
            var i = 0
            while (i < buf.n) {
              if (buf.ts(i) >= horizonUs) pruned.append(buf.ts(i), buf.conds(i))
              i += 1
            }
            val kept = if (pruned.n < buf.n) pruned else buf
            val (newMatches, from) = graft.behavioral.pattern.PatternExecutor
              .executeWithConsumed(steps, kept)
            count += newMatches
            val restN = kept.n - from
            val restTs = new Array[Long](restN)
            val restConds = new Array[Int](restN)
            i = 0
            while (i < restN) {
              restTs(i) = kept.ts(from + i); restConds(i) = kept.conds(from + i)
              i += 1
            }
            state.update(SeqCountState(count, restTs, restConds, maxTsUs))
            armExpiry(state, (maxTsUs + horizonMicros) / 1000 + 1)
            Iterator.single(SeqCountUpdate(userId, count, restN))
          }
      }
  }

  /** Streaming sequence_match_events output: `matched_ts` holds the epoch-µs
    * timestamps the first match's `(?N)` steps consumed (empty until matched
    * — the batch aggregate's no-match result is the empty array too). */
  case class SeqMatchEventsUpdate(user_id: Long, matched: Boolean,
      matched_ts: Array[Long], n_buffered: Int)

  /** Per-user state: packed buffer + the latched step timestamps. */
  case class SeqMatchEventsState(ts: Array[Long], conds: Array[Int],
      maxTsUs: Long, matched: Boolean, matchedTs: Array[Long])

  /** Streaming `sequence_match_events`: like `streamingSequenceMatch`, but
    * the latch captures the `(?N)` step timestamps of the match that fired
    * (`PatternExecutor.executeCollect` — the batch engine unchanged).
    *
    * Finality: the FIRST match found over the buffered in-horizon history
    * latches and the buffer drops (O(1) state from then on). An event
    * arriving later — above the watermark but with an earlier timestamp —
    * might have enabled an earlier-starting match in full-history batch
    * semantics; the streamed result never retracts (the same finality
    * contract as `streamingSequenceCount`'s counted matches). With events
    * in timestamp order the latched match IS the batch first match over
    * the history seen so far.
    *
    * Same horizon/lateness contracts as `streamingSequenceMatch`. */
  def streamingSequenceMatchEvents(events: Dataset[SeqEvent], pattern: String,
      watermark: String = "1 hour",
      horizonMicros: Long = 30L * 86400 * 1000000): Dataset[SeqMatchEventsUpdate] = {
    val steps = graft.behavioral.pattern.PatternParser.parse(pattern) match {
      case Right(s) => s
      case Left(e) => throw new IllegalArgumentException(
        s"sequence_match_events pattern error: $e")
    }
    require(horizonMicros > 0, s"horizonMicros must be positive, got $horizonMicros")
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", watermark)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SeqMatchEventsState, SeqMatchEventsUpdate](
        OutputMode.Update, GroupStateTimeout.EventTimeTimeout) {
        (userId: Long, batch: Iterator[SeqEvent], state: GroupState[SeqMatchEventsState]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            var maxTsUs = Long.MinValue
            var matched = false
            var matchedTs: Array[Long] = Array.emptyLongArray
            val buf = EventBuf.empty()
            state.getOption.foreach { s =>
              matched = s.matched
              matchedTs = s.matchedTs
              maxTsUs = s.maxTsUs
              if (!matched) {
                var i = 0
                while (i < s.ts.length) { buf.append(s.ts(i), s.conds(i)); i += 1 }
              }
            }
            batch.foreach { e =>
              if (e.ts != null) {
                val us = e.ts.getTime * 1000 + (e.ts.getNanos / 1000) % 1000
                if (us > maxTsUs) maxTsUs = us
                if (!matched && e.conds != 0) buf.append(us, e.conds)
              }
            }
            if (!matched) {
              val horizonUs = state.getCurrentWatermarkMs() * 1000 - horizonMicros
              val pruned = EventBuf.empty()
              buf.sortByTs()
              var i = 0
              while (i < buf.n) {
                if (buf.ts(i) >= horizonUs) pruned.append(buf.ts(i), buf.conds(i))
                i += 1
              }
              val kept = if (pruned.n < buf.n) pruned else buf
              val got = graft.behavioral.pattern.PatternExecutor
                .executeCollect(steps, kept)
              if (got != null) {
                matched = true
                matchedTs = got
                state.update(SeqMatchEventsState(Array.emptyLongArray,
                  Array.emptyIntArray, maxTsUs, matched = true, got))
              } else {
                state.update(SeqMatchEventsState(
                  java.util.Arrays.copyOf(kept.ts, kept.n),
                  java.util.Arrays.copyOf(kept.conds, kept.n),
                  maxTsUs, matched = false, Array.emptyLongArray))
              }
            } else {
              state.update(SeqMatchEventsState(Array.emptyLongArray,
                Array.emptyIntArray, maxTsUs, matched = true, matchedTs))
            }
            armExpiry(state, (maxTsUs + horizonMicros) / 1000 + 1)
            val nBuf = state.get.ts.length
            Iterator.single(SeqMatchEventsUpdate(userId, matched, matchedTs, nBuf))
          }
      }
  }

  /** One input row for streaming sequence_next_node: `conds` packs the step
    * conditions (bit i = step i+1), `base_cond` is the base-condition flag.
    * Rows with conds == 0 and base_cond == false STILL enter the buffer —
    * any event can be the adjacent "next node" answer (the batch aggregate
    * buffers all rows for the same reason; reference
    * `src/sequence_next_node.rs:186-192`). */
  case class NNEvent(user_id: Long, ts: java.sql.Timestamp, value: String,
      base_cond: Boolean, conds: Int)

  /** Streaming sequence_next_node output: the CURRENT adjacent-value answer
    * over the in-horizon history (update semantics — later events can
    * change it, e.g. a tail base re-anchors, or the answer event itself
    * arrives after the matched chain). */
  case class NextNodeUpdate(user_id: Long, next_node: String, n_buffered: Int)

  /** Per-user state: the full in-horizon row buffer (ts, packed flags,
    * value strings — `flags` bit 32 is the base condition, bits 0..31 the
    * steps, the batch `NNBuf` layout). */
  case class NextNodeState(ts: Array[Long], flags: Array[Long],
      values: Array[String], maxTsUs: Long)

  /** Streaming `sequence_next_node` (2 directions × 4 bases, the batch
    * aggregate's scan shared verbatim via `NextNodeScan`): per micro-batch
    * the user's in-horizon buffer is re-scanned and the CURRENT answer
    * emitted in Update mode.
    *
    * Unlike match/count there is no latch or consumed prefix — the answer
    * is not monotone (a `tail`/`last_match` base re-anchors on new events,
    * and even a `head` match's adjacent event can arrive later), so the
    * state must hold every in-horizon row, values included. That is the
    * same O(group-size) state the batch aggregate buffers (all rows, no
    * condition pre-filter); the horizon is the bound, so size it to the
    * chain span the product cares about. Within the horizon the emitted
    * answer ALWAYS equals the batch aggregate over the same rows — there
    * is no divergence contract to document beyond lateness (events behind
    * the watermark drop) and forgetting (rows older than watermark −
    * horizon prune, exactly like the other streaming operators). */
  def streamingSequenceNextNode(events: Dataset[NNEvent], direction: String,
      base: String, numSteps: Int, watermark: String = "1 hour",
      horizonMicros: Long = 30L * 86400 * 1000000): Dataset[NextNodeUpdate] = {
    require(numSteps >= 1 && numSteps <= 32,
      s"numSteps must be in 1..32 (the batch aggregate's step-condition arity), got $numSteps")
    val forward = direction.trim.toLowerCase match {
      case "forward" => true
      case "backward" => false
      case other => throw new IllegalArgumentException(
        s"sequence_next_node direction must be forward|backward, got '$other'")
    }
    val baseId = base.trim.toLowerCase match {
      case "head" => 0
      case "tail" => 1
      case "first_match" => 2
      case "last_match" => 3
      case other => throw new IllegalArgumentException(
        s"sequence_next_node base must be head|tail|first_match|last_match, got '$other'")
    }
    require(horizonMicros > 0, s"horizonMicros must be positive, got $horizonMicros")
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", watermark)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[NextNodeState, NextNodeUpdate](
        OutputMode.Update, GroupStateTimeout.EventTimeTimeout) {
        (userId: Long, batch: Iterator[NNEvent], state: GroupState[NextNodeState]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            import graft.behavioral.{NNBuf, NextNodeScan}
            import org.apache.spark.unsafe.types.UTF8String
            var maxTsUs = Long.MinValue
            val buf = new NNBuf(16)
            state.getOption.foreach { s =>
              maxTsUs = s.maxTsUs
              var i = 0
              while (i < s.ts.length) {
                val v = if (s.values(i) == null) null
                  else UTF8String.fromString(s.values(i))
                buf.append(s.ts(i), s.flags(i), buf.intern(v))
                i += 1
              }
            }
            batch.foreach { e =>
              if (e.ts != null) {
                val us = e.ts.getTime * 1000 + (e.ts.getNanos / 1000) % 1000
                if (us > maxTsUs) maxTsUs = us
                var f = e.conds.toLong & 0xFFFFFFFFL
                if (e.base_cond) f |= 1L << 32
                val v = if (e.value == null) null else UTF8String.fromString(e.value)
                buf.append(us, f, buf.intern(v))
              }
            }
            val horizonUs = state.getCurrentWatermarkMs() * 1000 - horizonMicros
            buf.sortByTs()
            val kept = new NNBuf(math.max(buf.n, 16))
            var i = 0
            while (i < buf.n) {
              if (buf.ts(i) >= horizonUs)
                kept.append(buf.ts(i), buf.flags(i), kept.intern(buf.valueAt(i)))
              i += 1
            }
            val answer = NextNodeScan.scan(kept, forward, baseId, numSteps) match {
              case null => null
              case v => v.toString
            }
            val ts2 = new Array[Long](kept.n)
            val fl2 = new Array[Long](kept.n)
            val vs2 = new Array[String](kept.n)
            i = 0
            while (i < kept.n) {
              ts2(i) = kept.ts(i); fl2(i) = kept.flags(i)
              val v = kept.valueAt(i)
              vs2(i) = if (v == null) null else v.toString
              i += 1
            }
            state.update(NextNodeState(ts2, fl2, vs2, maxTsUs))
            armExpiry(state, (maxTsUs + horizonMicros) / 1000 + 1)
            Iterator.single(NextNodeUpdate(userId, answer, kept.n))
          }
      }
  }

  /** Continuous near-dup screening of a DOCUMENT STREAM against a stored
    * `Dedup.minhashIndex` — the streaming face of the incremental-ingest
    * dedup (q74): each micro-batch runs the batch-exact probe
    * `Dedup.minhashLshJoinAgainst` against the static index and hands the
    * (new_id, idx_id, jaccard) pair frame to `sink` with the batch id.
    *
    * foreachBatch is the right idiom here, not a reformulated stateful
    * pipeline: the probe's internals (candidate-pair dropDuplicates,
    * two-stage exact verification, multi-pass joins over the index) would
    * each become an unbounded stateful operator in pure streaming, yet the
    * operation needs NO cross-batch state at all — a doc's near-dups
    * against a static index are fully determined within its own
    * micro-batch. State: none; the index re-scans column-pruned per batch
    * (persist it when it fits executor storage, leave it on parquet when
    * it does not).
    *
    * Per micro-batch the result is bit-identical to the batch operator
    * (differential-tested in StreamingIngestSpec). Pairs BETWEEN two
    * streamed docs are out of scope by design — that is the batch
    * self-join's job at compaction time, when the index generation is
    * rebuilt; a streamed doc is screened against the index generation it
    * probes. */
  def nearDupIngest(docs: DataFrame, index: DataFrame, threshold: Double,
      k: Int = 3, numHashes: Int = 96, bands: Int = 24,
      idCol: String = "doc_id", textCol: String = "text")
      (sink: (DataFrame, Long) => Unit): org.apache.spark.sql.streaming.StreamingQuery =
    docs.writeStream
      .outputMode("append")
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        // the probe persists the batch-side sketch (it feeds both candidate
        // generation and verification within one action); release it as soon
        // as the sink has consumed the result — a long-running stream must
        // not accumulate one cached sketch per micro-batch. The result frame
        // is only valid INSIDE `sink`; a sink that needs it later must copy.
        val (res, batchSketch) = graft.ops.Dedup.minhashLshJoinAgainstTracked(
          batch.toDF(), index, threshold, k, numHashes, bands, idCol, textCol)
        try sink(res, batchId)
        finally graft.ops.OpCaches.release(batchSketch)
      }
      .start()
}
