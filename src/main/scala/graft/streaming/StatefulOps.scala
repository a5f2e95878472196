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
}
