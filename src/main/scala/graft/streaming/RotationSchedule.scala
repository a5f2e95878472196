package graft.streaming

import java.time.{Instant, ZoneId}

import org.apache.spark.sql.streaming.StreamingQuery

/** R4 wallclock scheduled rotation, timezone-day-aligned.
  *
  * The reference computes the next rotation as the next multiple of
  * `rotate.schedule.interval.ms` measured from the START OF THE CURRENT DAY
  * in the configured partitioner timezone
  * (`TopicPartitionWriter.java:371-384`, `setNextScheduleRotation` via
  * storage-common's `DateTimeUtils.getNextTimeAdjustedByDay`; timezone read
  * at `TopicPartitionWriter.java:127-132`). A 24h schedule in Asia/Shanghai
  * therefore rotates at Shanghai midnight — not 24h after connector start.
  *
  * Spark's `Trigger.ProcessingTime` aligns to epoch, not to a timezone day,
  * so the faithful Spark-first mapping is the scheduled-drain pattern: at
  * each aligned boundary run one `Trigger.AvailableNow` cycle against the
  * same checkpoint (exactly-once is carried by the checkpoint + the sink's
  * deterministic offset names, exactly as in the continuous path). This is
  * the standard Structured Streaming idiom for "ingest on a wallclock
  * schedule" and costs nothing between boundaries — no idle micro-batches.
  */
object RotationSchedule {

  /** Next schedule boundary strictly after `nowMs`: start-of-day of `nowMs`
    * in `zone`, plus the next whole multiple of `periodMs` — computed in
    * LOCAL time, like storage-common's `getNextTimeAdjustedByDay` (Joda
    * local-millis arithmetic): a 24h schedule fires at every local
    * midnight even across a DST transition where the absolute day is
    * 23h/25h. Local times that fall in a DST gap resolve forward
    * (java.time's default, matching Joda's lenient convertLocalToUTC).
    */
  def nextTimeAdjustedByDay(nowMs: Long, periodMs: Long, zone: ZoneId): Long = {
    require(periodMs > 0, s"periodMs must be positive, got $periodMs")
    val local = Instant.ofEpochMilli(nowMs).atZone(zone).toLocalDateTime
    val startOfDay = local.toLocalDate.atStartOfDay
    val elapsedLocalMs = java.time.Duration.between(startOfDay, local).toMillis
    startOfDay.plus(java.time.Duration.ofMillis((elapsedLocalMs / periodMs + 1) * periodMs))
      .atZone(zone).toInstant.toEpochMilli
  }

  /** Delay from `nowMs` to the next aligned boundary (always > 0). */
  def delayMs(nowMs: Long, periodMs: Long, zone: ZoneId): Long =
    nextTimeAdjustedByDay(nowMs, periodMs, zone) - nowMs

  /** Handle for a running scheduled-rotation loop. */
  final class ScheduledRotation private[RotationSchedule] (
      mkCycle: () => StreamingQuery,
      periodMs: Long,
      zone: ZoneId,
      clock: () => Long,
      sleeper: Long => Unit) {
    @volatile private var stopped = false
    @volatile private var cycleCount = 0L
    @volatile private var failureCount = 0L
    @volatile private var lastFailureV: Option[Throwable] = None
    @volatile private var inFlight: StreamingQuery = null
    /** Completed drain cycles (boundaries fired) so far. */
    def cycles: Long = cycleCount
    /** Cycles that raised (storage outage past D4's retries, …). */
    def failures: Long = failureCount
    def lastFailure: Option[Throwable] = lastFailureV

    private val thread = new Thread(() => {
      while (!stopped) {
        try {
          sleeper(delayMs(clock(), periodMs, zone))
          if (!stopped) {
            val q = mkCycle()
            inFlight = q
            try q.awaitTermination()
            finally inFlight = null
            cycleCount += 1
          }
        } catch {
          // stop() interrupts whichever phase is in flight (the sleep or a
          // draining cycle); swallow and let the loop condition exit
          case _: InterruptedException => ()
          // A failed cycle (e.g. storage outage outlasting D4's in-task
          // retries) must NOT kill the schedule: the reference pauses and
          // retries at the next opportunity. Record it, keep the loop
          // alive — the next boundary retries from the same checkpoint,
          // so no data is skipped.
          case scala.util.control.NonFatal(e) =>
            failureCount += 1
            lastFailureV = Some(e)
        }
      }
    }, "graft-scheduled-rotation")
    thread.setDaemon(true)
    thread.start()

    def stop(): Unit = {
      stopped = true
      // stop the in-flight drain too — interrupting awaitTermination
      // alone would leave the query running unsupervised after stop()
      val q = inFlight
      if (q != null) {
        try q.stop()
        catch { case scala.util.control.NonFatal(_) => () }
      }
      thread.interrupt()
      thread.join(10000)
    }
    /** Block until at least `n` cycles have completed (test hook). */
    def awaitCycles(n: Long, timeoutMs: Long = 30000): Boolean = {
      val deadline = System.currentTimeMillis() + timeoutMs
      while (cycleCount < n && System.currentTimeMillis() < deadline) Thread.sleep(20)
      cycleCount >= n
    }
  }

  /** Start the loop: at every `periodMs` boundary aligned to `zone`'s day,
    * start the query `mkCycle` returns (expected: `Trigger.AvailableNow`
    * against a fixed checkpoint) and await its termination.
    */
  def schedule(
      mkCycle: () => StreamingQuery,
      periodMs: Long,
      zone: ZoneId,
      clock: () => Long = () => System.currentTimeMillis(),
      sleeper: Long => Unit = Thread.sleep): ScheduledRotation =
    new ScheduledRotation(mkCycle, periodMs, zone, clock, sleeper)
}
