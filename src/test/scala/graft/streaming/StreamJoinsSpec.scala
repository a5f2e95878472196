package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger

import graft.SparkTestBase

class StreamJoinsSpec extends SparkTestBase {

  case class Click(user_id: Long, ts: Timestamp, value: Double)
  case class Purchase(user_id: Long, ts: Timestamp, event_id: Long)

  private def t(min: Long) = new Timestamp(1700000000000L + min * 60000L)

  test("stream-stream attribution joins clicks in-window, across micro-batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val clicks = MemoryStream[Click]
    val purchases = MemoryStream[Purchase]
    val q = StreamJoins
      .attributionJoin(clicks.toDF(), purchases.toDF(),
        watermarkDelay = "5 minutes", window = "1 hour")
      .writeStream.outputMode("append")
      .format("memory").queryName("attr")
      .trigger(Trigger.ProcessingTime(0L)).start()
    try {
      // click lands in an EARLIER micro-batch than the purchase it
      // attributes — the cross-batch buffering is the point of the op
      clicks.addData(Click(1, t(0), 1.5), Click(2, t(0), 9.9))
      q.processAllAvailable()
      purchases.addData(Purchase(1, t(30), 100L))
      q.processAllAvailable()
      val got = spark.table("attr")
        .select("event_id", "user_id", "click_value").as[(Long, Long, Double)]
        .collect().toSet
      assert(got == Set((100L, 1L, 1.5)), s"only user 1's click matches: $got")

      // a second click inside the window → the SAME purchase gains a
      // second pair row (pick-latest is the sink's job, not the join's)
      clicks.addData(Click(1, t(20), 2.5))
      q.processAllAvailable()
      val got2 = spark.table("attr").as[(Long, Long, Timestamp, Timestamp, Double)]
        .collect().map(r => (r._1, r._5)).toSet
      assert(got2 == Set((100L, 1.5), (100L, 2.5)))

      // out-of-window click (2h before the purchase) must NOT match
      clicks.addData(Click(1, t(-120), 0.1))
      q.processAllAvailable()
      assert(spark.table("attr").count() == 2)
    } finally q.stop()
  }

  test("left-outer emits the unmatched purchase only after the watermark closes it") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val clicks = MemoryStream[Click]
    val purchases = MemoryStream[Purchase]
    val q = StreamJoins
      .attributionJoin(clicks.toDF(), purchases.toDF(),
        watermarkDelay = "5 minutes", window = "1 hour", joinType = "leftOuter")
      .writeStream.outputMode("append")
      .format("memory").queryName("attr_outer")
      .trigger(Trigger.ProcessingTime(0L)).start()
    try {
      purchases.addData(Purchase(7, t(10), 700L))
      // both sides must move the watermark past ts+delay before the
      // outer row may emit; until then the purchase stays buffered
      clicks.addData(Click(99, t(10), 0.0))
      q.processAllAvailable()
      assert(spark.table("attr_outer").count() == 0,
        "outer row must not emit while a matching click could still arrive")
      clicks.addData(Click(99, t(200), 0.0))
      purchases.addData(Purchase(99, t(200), 999L))
      q.processAllAvailable()
      q.processAllAvailable()
      val outer = spark.table("attr_outer")
        .filter("event_id = 700").select("click_value").collect()
      assert(outer.length == 1 && outer.head.isNullAt(0),
        "watermark-closed purchase must emit exactly one null-click row")
    } finally q.stop()
  }
}
