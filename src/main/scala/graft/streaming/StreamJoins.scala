package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Watermarked STREAM–STREAM joins — the continuous twins of the batch
  * attribution ops (q34 as-of, q143 last-touch, q190 interval overlap).
  * Spark buffers both sides in state and joins across micro-batches; the
  * two things that make this safe at 100 TB-of-stream are encoded here and
  * non-optional:
  *
  *   - BOTH sides carry an event-time watermark, and
  *   - the join condition carries an explicit event-time RANGE
  *     (`click_ts ∈ [purchase_ts − window, purchase_ts]`),
  *
  * which together let Spark evict state the moment a row can no longer
  * match anything (state ≈ window × arrival rate, not the stream's
  * history). Without the range bound, stream-stream state grows without
  * limit — the streaming analog of the BroadcastNestedLoop trap q190's
  * scaladoc describes for batch interval joins.
  */
object StreamJoins {

  /** Purchases attributed to every same-user click in the trailing
    * `window`. `joinType` "inner" emits matches as they meet;
    * "leftOuter" additionally emits an unmatched purchase (null click
    * columns) once the watermark proves no click can still arrive —
    * the streaming form of q34's LEFT as-of semantics.
    *
    * Inputs need (user_id, ts, …); clicks contribute `value`, purchases
    * `event_id`. Output: one row per (purchase, matching click) pair —
    * downstream pick-latest (q143's last-touch) is a per-purchase
    * max_by in the sink epoch, deliberately NOT global stream state.
    */
  def attributionJoin(
      clicks: DataFrame,
      purchases: DataFrame,
      watermarkDelay: String = "10 minutes",
      window: String = "7 days",
      joinType: String = "inner"): DataFrame = {
    val c = clicks.withWatermark("ts", watermarkDelay)
      .select(col("user_id").as("c_user"), col("ts").as("click_ts"),
        col("value").as("click_value"))
    val p = purchases.withWatermark("ts", watermarkDelay)
      .select(col("user_id").as("p_user"), col("ts").as("purchase_ts"),
        col("event_id"))
    p.join(c,
      expr(s"""p_user = c_user AND
               click_ts BETWEEN purchase_ts - INTERVAL $window
               AND purchase_ts"""),
      joinType)
      .select(col("event_id"), col("p_user").as("user_id"),
        col("purchase_ts"), col("click_ts"), col("click_value"))
  }
}
