package graft.streaming

import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}

/** Custom stateful streaming operators via
  * `KeyValueGroupedDataset.flatMapGroupsWithState` — the extension point
  * for per-key state Spark's built-ins don't cover.
  *
  * [[latestWins]] is the streaming form of keyed latest-wins dedup (q22):
  * for every key it keeps exactly one (ts-max) record in state and emits a
  * row only when the champion changes. State is O(keys) — one small case
  * class per key, the bound that matters at 100 TB of events with a
  * bounded key universe — with an optional processing-time TTL so expired
  * keys are evicted (the production guard against unbounded key growth).
  */
object StatefulOps {

  case class KeyedEvent(user_id: Long, event_id: Long, tsMillis: Long, value: Double)
  case class Champion(event_id: Long, tsMillis: Long, value: Double)

  // --------------------------------------------------- streaming near-dup
  /** A sketched document entering the stream: doc_id + its MinHash
    * signature (64 longs, from [[graft.functions.MinHashSketchAgg]] or
    * [[graft.llmops.Dedup.minhashSignatures]] run inside the batch/
    * foreachBatch that feeds this operator).
    */
  case class SketchedDoc(doc_id: Long, sig: Seq[Long])
  /** An online near-dup hit: the arriving doc vs an earlier one. */
  case class NearDupHit(doc_id: Long, dup_of: Long, est_jaccard: Double)
  case class BucketState(ids: Seq[Long], sigs: Seq[Seq[Long]])

  /** Streaming incremental near-dup detection — the online form of q30:
    * as each sketched document arrives, report any earlier document whose
    * signature agrees on ≥ `minSim` of the hash positions. Candidates
    * come from LSH band buckets exactly like the batch path: the stream
    * is exploded to (band, bandHash) keys, and per bucket a bounded set
    * of recent signatures is kept in `flatMapGroupsWithState` state.
    *
    * State bounds (the 100 TB-of-stream concerns): per bucket at most
    * `maxBucket` signatures are retained FIFO (same hot-bucket cap as the
    * batch path — a stop-boilerplate bucket can't grow without bound),
    * and an optional processing-time TTL evicts cold buckets entirely.
    * A pair colliding in several bands is emitted once per colliding
    * band — dedupe downstream if exact-once pairs matter (a batch
    * `dropDuplicates` per sink epoch; the stream itself must not hold
    * global pair state).
    */
  def streamingNearDup(
      docs: Dataset[SketchedDoc],
      minSim: Double,
      maxBucket: Int = 1000,
      ttlMillis: Long = -1L): Dataset[NearDupHit] = {
    import docs.sparkSession.implicits._
    import graft.llmops.Dedup.{NumBands, NumHashes}
    val rowsPerBand = NumHashes / NumBands
    docs
      .flatMap { d =>
        (0 until NumBands).map { b =>
          val bandHash = d.sig.slice(b * rowsPerBand, (b + 1) * rowsPerBand)
            .mkString(",").hashCode
          // band in the high 32 bits, hash in the low 32: distinct bands
          // can NEVER share a bucket key (a multiplier smaller than the
          // 2^32 hash range would alias adjacent bands' buckets)
          ((b.toLong << 32) | (bandHash.toLong & 0xffffffffL), d.doc_id, d.sig)
        }
      }
      .groupByKey(_._1)
      .flatMapGroupsWithState[BucketState, NearDupHit](
        OutputMode.Append,
        if (ttlMillis > 0) GroupStateTimeout.ProcessingTimeTimeout
        else GroupStateTimeout.NoTimeout) {
        (_: Long, batch: Iterator[(Long, Long, Seq[Long])], state: GroupState[BucketState]) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            var st = state.getOption.getOrElse(BucketState(Nil, Nil))
            val hits = Seq.newBuilder[NearDupHit]
            batch.foreach { case (_, id, sig) =>
              // a re-arriving doc REPLACES its stored signature (a revised
              // document must not keep matching by its old sketch), is not
              // compared against itself, and only a genuinely new version
              // reports hits
              val prevIdx = st.ids.indexOf(id)
              val changed = prevIdx < 0 || st.sigs(prevIdx) != sig
              val (ids0, sigs0) =
                if (prevIdx < 0) (st.ids, st.sigs)
                else (st.ids.patch(prevIdx, Nil, 1), st.sigs.patch(prevIdx, Nil, 1))
              if (changed) {
                var i = 0
                while (i < ids0.length) {
                  val other = sigs0(i)
                  var agree = 0
                  var k = 0
                  while (k < NumHashes) { if (other(k) == sig(k)) agree += 1; k += 1 }
                  val est = agree.toDouble / NumHashes
                  if (est >= minSim) hits += NearDupHit(id, ids0(i), est)
                  i += 1
                }
              }
              // FIFO cap: evict the oldest signature past maxBucket
              val (ids2, sigs2) =
                if (ids0.length >= maxBucket) (ids0.tail :+ id, sigs0.tail :+ sig)
                else (ids0 :+ id, sigs0 :+ sig)
              st = BucketState(ids2, sigs2)
            }
            state.update(st)
            if (ttlMillis > 0) state.setTimeoutDuration(ttlMillis)
            hits.result().iterator
          }
      }
  }

  def latestWins(
      events: Dataset[KeyedEvent],
      ttlMillis: Long = -1L): Dataset[(Long, Champion)] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[Champion, (Long, Champion)](
        OutputMode.Append,
        if (ttlMillis > 0) GroupStateTimeout.ProcessingTimeTimeout
        else GroupStateTimeout.NoTimeout) {
        (user: Long, batch: Iterator[KeyedEvent], state: GroupState[Champion]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            def beats(a: Champion, b: Champion): Boolean =
              a.tsMillis > b.tsMillis || (a.tsMillis == b.tsMillis && a.event_id > b.event_id)
            val incoming = batch.foldLeft(Option.empty[Champion]) { (best, e) =>
              val c = Champion(e.event_id, e.tsMillis, e.value)
              if (best.exists(b => !beats(c, b))) best else Some(c)
            }
            val prior = state.getOption
            val next = (prior.toSeq ++ incoming.toSeq)
              .reduceOption((a, b) => if (beats(b, a)) b else a)
            // refresh the TTL on EVERY batch that touches this key — an
            // actively-updated key must never expire just because its
            // champion is stable
            if (ttlMillis > 0 && state.exists) state.setTimeoutDuration(ttlMillis)
            next match {
              case Some(c) if !prior.contains(c) =>
                state.update(c)
                if (ttlMillis > 0) state.setTimeoutDuration(ttlMillis)
                Iterator((user, c))
              case _ => Iterator.empty
            }
          }
      }
  }

  // ----------------------------------------------------- streaming funnel
  /** A typed funnel event: user + step name + event time (millis). */
  case class FunnelEvent(user_id: Long, event_type: String, tsMillis: Long)
  /** Per-user funnel state: the furthest step reached and when. */
  case class FunnelState(step: Int, tsMillis: Long)
  /** Emitted when a user ADVANCES: the new step and seconds from the
    * previous step (0 for step 1).
    */
  case class FunnelAdvance(user_id: Long, step: Int, event_type: String,
                           secsFromPrev: Double)

  /** Streaming conversion funnel — the online form of q114: per user, a
    * state machine holds only (furthest step, its event time); an event
    * advances the state iff it is the NEXT step with a LATER timestamp
    * (q114's strict ordering), and each advance emits one row. Events for
    * already-passed or skipped-ahead steps mutate nothing, so replays and
    * out-of-order duplicates are naturally idempotent at the state level.
    *
    * State is O(users) × one 2-field case class — the same bound
    * latestWins carries — with the same TTL/refresh-on-touch eviction
    * contract. Within a micro-batch, events apply in timestamp order
    * (event-time, then arrival) so a batch containing view+click+purchase
    * advances all three steps deterministically.
    */
  def streamingFunnel(
      events: Dataset[FunnelEvent],
      steps: Seq[String],
      ttlMillis: Long = -1L): Dataset[FunnelAdvance] = {
    import events.sparkSession.implicits._
    val stepIdx = steps.zipWithIndex.toMap // step name -> 0-based
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[FunnelState, FunnelAdvance](
        OutputMode.Append,
        if (ttlMillis > 0) GroupStateTimeout.ProcessingTimeTimeout
        else GroupStateTimeout.NoTimeout) {
        (user: Long, batch: Iterator[FunnelEvent], state: GroupState[FunnelState]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            var cur = state.getOption.getOrElse(FunnelState(0, Long.MinValue))
            val out = scala.collection.mutable.ArrayBuffer[FunnelAdvance]()
            val ordered = batch.filter(e => stepIdx.contains(e.event_type))
              .toSeq.sortBy(e => (e.tsMillis, stepIdx(e.event_type)))
            ordered.foreach { e =>
              val s = stepIdx(e.event_type) + 1 // 1-based step number
              if (s == cur.step + 1 && e.tsMillis > cur.tsMillis) {
                val secs = if (cur.step == 0) 0.0
                  else (e.tsMillis - cur.tsMillis) / 1000.0
                out += FunnelAdvance(user, s, e.event_type, secs)
                cur = FunnelState(s, e.tsMillis)
              }
            }
            if (cur.step > 0) {
              state.update(cur)
              if (ttlMillis > 0) state.setTimeoutDuration(ttlMillis)
            }
            out.iterator
          }
      }
  }

  // ------------------------------------------- streaming exact dedup
  /** Streaming exact dedup on the NATIVE `dropDuplicatesWithinWatermark`
    * — q21's online form, built-in-first (the same reasoning as
    * [[streamingSessionize]]): the built-in gets watermark-scoped state
    * eviction and the RocksDB provider for free, where a hand-rolled
    * flatMapGroupsWithState would re-implement exactly that. State holds
    * one entry per distinct key seen within the watermark horizon —
    * bounded by distinct-keys-per-horizon, not stream length. Events
    * whose (user_id, event_type, value) already appeared within the
    * horizon are dropped; the first occurrence passes through.
    */
  def streamingExactDedup(
      events: DataFrame,
      late: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", late)
      .dropDuplicatesWithinWatermark("user_id", "event_type", "value")

  // ------------------------------------------- streaming rate anomaly
  /** One closed minute bucket for a key: produced upstream by the NATIVE
    * watermarked tumbling-window count (`groupBy(window(ts, "1 minute"),
    * type)` in append mode — built-in state, RocksDB, watermark
    * eviction); this operator only keeps the trailing history the
    * built-in cannot express.
    */
  case class MinuteCount(event_type: String, minuteStartMs: Long, cnt: Long)
  /** An anomalous bucket: its count and truncated z vs trailing history. */
  case class RateAnomaly(event_type: String, minuteStartMs: Long, cnt: Long,
                         z: Double)
  /** Trailing per-key history: parallel ascending (minute, count) seqs. */
  case class RateState(minutes: Seq[Long], counts: Seq[Long])

  /** Streaming event-rate anomaly — q138's online twin: each closed
    * minute bucket is z-scored against the key's trailing `histLen`
    * buckets and emitted iff |z| ≥ `zThresh`. The z math is q138's exact
    * chain (integer sums → fixed IEEE mean/var), with one streaming
    * addition: the std has a floor of 1.0 (counts are integers — a
    * flatline history has std 0, and a spike against it must emit a
    * large finite z, not divide by zero).
    *
    * State: O(keys) × histLen longs — event types are a bounded
    * dimension, so state is KBs regardless of stream volume; the heavy
    * lifting (per-minute counting over raw events) happened in the
    * native windowed aggregate upstream. Buckets at-or-before the
    * newest already-scored minute mutate nothing (replay-idempotent);
    * within a batch, buckets apply in minute order.
    */
  def streamingRateAnomaly(
      buckets: Dataset[MinuteCount],
      histLen: Int = 30,
      minHist: Int = 5,
      zThresh: Double = 3.0): Dataset[RateAnomaly] = {
    import buckets.sparkSession.implicits._
    buckets
      .groupByKey(_.event_type)
      .flatMapGroupsWithState[RateState, RateAnomaly](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (key: String, batch: Iterator[MinuteCount], state: GroupState[RateState]) =>
          var cur = state.getOption.getOrElse(RateState(Nil, Nil))
          val out = scala.collection.mutable.ArrayBuffer[RateAnomaly]()
          batch.toSeq.sortBy(_.minuteStartMs).foreach { b =>
            if (cur.minutes.isEmpty || b.minuteStartMs > cur.minutes.last) {
              if (cur.counts.size >= minHist) {
                val n = cur.counts.size
                val s = cur.counts.sum
                val sq = cur.counts.map(c => c * c).sum
                val mean = s.toDouble / n
                val variance = math.max(sq.toDouble / n - mean * mean, 0.0)
                val std = math.max(math.sqrt(variance), 1.0)
                val z = math.floor((b.cnt - mean) / std * 10000.0) / 10000.0
                if (math.abs(z) >= zThresh)
                  out += RateAnomaly(key, b.minuteStartMs, b.cnt, z)
              }
              cur = RateState((cur.minutes :+ b.minuteStartMs).takeRight(histLen),
                (cur.counts :+ b.cnt).takeRight(histLen))
            }
          }
          if (cur.minutes.nonEmpty) state.update(cur)
          out.iterator
      }
  }

  // ----------------------------------------------- streaming sessionization
  /** STREAMING sessionization — q37's streaming twin, on Spark's NATIVE
    * `session_window` aggregate (not custom state: when a built-in covers
    * the semantics, the built-in wins — it gets watermark-driven state
    * eviction, RocksDB state, and AQE-free incremental planning for
    * free). Events carry an event-time `ts` column; sessions close when
    * a user is idle ≥ `gap`, and a closed session is EMITTED once the
    * watermark (`late`) passes its end — the streaming analog of q37's
    * per-session one-row output, with identical (user_id, start, n, sum)
    * semantics on the same inputs (StatefulOpsSpec drives both shapes).
    *
    * State: one open session window per active user — O(active users),
    * evicted by the watermark, stored in the RocksDB provider under
    * [[graft.LocalSession]]'s default. At 100 TB of events the state is
    * the ACTIVE user set only; closed sessions leave state the moment
    * the watermark passes.
    */
  def streamingSessionize(
      events: DataFrame,
      gap: String = "4 hours",
      late: String = "10 minutes"): DataFrame = {
    import org.apache.spark.sql.functions._
    events
      .withWatermark("ts", late)
      .groupBy(session_window(col("ts"), gap), col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        graft.operators.Ops.dsum(col("value")).as("sum_value"))
      .select(col("user_id"),
        unix_micros(col("session_window.start")).as("session_start_us"),
        col("n_events"), col("sum_value"))
  }

  // ------------------------------------------- streaming session paths
  /** q205's ONLINE form: emit each completed session's path (first ≤ 8
    * event types in time order, joined with ">") once its session window
    * closes under the watermark. Built-in-first ([[streamingSessionize]]'s
    * reasoning): the native `session_window` aggregation gets
    * watermark-scoped state eviction and RocksDB state for free; the
    * path assembles from a session-bounded `collect_list` sorted on
    * (event-time, event_id) structs — deterministic under out-of-order
    * arrival WITHIN the lateness horizon — and `slice(…, 1, 8)` caps the
    * emitted string exactly like the batch form's rn ≤ 8. Append mode
    * emits one row per session, after the watermark passes its close —
    * the at-most-once-per-session contract a path-mining dashboard
    * wants. State per open session: ≤ 8 (ts, id, type) structs + the
    * window bounds, bounded by gap × arrival rate per user.
    */
  def streamingSessionPaths(
      events: DataFrame,
      gap: String = "4 hours",
      late: String = "10 minutes"): DataFrame = {
    import org.apache.spark.sql.functions._
    events
      .withWatermark("ts", late)
      .groupBy(session_window(col("ts"), gap), col("user_id"))
      .agg(array_join(
        transform(
          slice(sort_array(collect_list(struct(
            unix_micros(col("ts")).as("us"), col("event_id"),
            col("event_type")))), 1, 8),
          x => x.getField("event_type")), ">").as("path"))
      .select(col("user_id"),
        unix_micros(col("session_window.start")).as("session_start_us"),
        col("path"))
  }
}
