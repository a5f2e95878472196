package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** Semantic checks for the warehouse staples beyond the DuckDB gate:
  * q151 must actually DETECT planted orphans (clean fixtures return
  * all-zero rows, which proves nothing), and q150's decay must weight
  * recent events above old ones.
  */
class WarehouseSpec extends SparkTestBase {

  private val dir = sf("sf0.001")

  test("q151 audit is all-green on the clean fixture") {
    val rows = Warehouse.q151.run(spark, dir).collect()
    assert(rows.length == 4)
    assert(rows.forall(_.getAs[Long]("n_orphans") == 0L))
  }

  test("q151's anti-join logic counts planted orphans exactly") {
    import spark.implicits._
    // 3 of 5 fact keys missing from the dimension
    val fact = Seq(1L, 2L, 3L, 4L, 5L).toDF("fk")
    val dim = Seq(1L, 2L).toDF("pk")
    val orphans = fact.join(broadcast(dim), col("fk") === col("pk"), "left_anti")
      .count()
    assert(orphans == 3L)
    // duplicate dim keys must NOT deflate/inflate the orphan count
    val dupDim = Seq(1L, 1L, 2L, 2L).toDF("pk")
    assert(fact.join(broadcast(dupDim), col("fk") === col("pk"), "left_anti")
      .count() == 3L)
  }

  test("q150 decayed value is bounded by the raw sum and favors recency") {
    val rows = Warehouse.q150.run(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val raw = r.getAs[Double]("sum_value")
      val decayed = r.getAs[Double]("decayed_value")
      // weights are in (0, 1]: |decayed| cannot exceed |raw| + rounding slack
      assert(math.abs(decayed) <= math.abs(raw) + 0.01,
        s"${r.getString(0)}: decayed $decayed vs raw $raw")
    }
    // an event at the anchor gets weight 1, one 30 days earlier gets e^-1:
    // verify the weight expression's direction on a two-row frame
    import spark.implicits._
    val t0 = 1700000000000000L // µs
    val ev = Seq(("a", t0), ("a", t0 - 30L * 86400 * 1000000))
      .toDF("event_type", "us")
      .select(col("event_type"), expr("timestamp_micros(us)").as("ts"),
        lit(100.0).as("value"), lit(1L).as("event_id"), lit(1L).as("user_id"),
        lit("").as("props"))
    val out = ev.agg(max(unix_micros(col("ts"))).as("t_max"))
      .crossJoin(ev)
      .select((floor(exp(-((col("t_max") - unix_micros(col("ts"))).cast("double") /
        lit(30.0 * 86400.0 * 1000000.0))) * lit(1e6)).cast("long")).as("w"))
      .collect().map(_.getLong(0)).sorted
    assert(out.last == 1000000L)               // weight 1.0 at the anchor
    assert(out.head == math.floor(math.exp(-1.0) * 1e6).toLong) // e^-1
  }

  /** 10 calm days alternating 10/11 events plus one 100-event spike at
    * day 7 — crafted so median=10.5, MAD=0.5: the spike's modified z is
    * ~120 while every calm day sits at ~0.67, and most pairwise slopes
    * cancel. Separates the ROBUST estimators from their classical twins
    * (OLS/mean-σ would both be dragged by the spike).
    */
  private def spikeEventsDir(): String = {
    import spark.implicits._
    val base = 1700000000000L
    val counts = Seq(10, 11, 10, 11, 10, 11, 10, 100, 11, 10)
    val rows = for {
      (c, day) <- counts.zipWithIndex
      i <- 0 until c
    } yield (day.toLong * 1000 + i, new java.sql.Timestamp(base + day * 86400000L),
      i.toLong % 7, "t", 1.0)
    val dir = java.nio.file.Files.createTempDirectory("graft-spike").toString
    rows.toDF("event_id", "ts", "user_id", "event_type", "value")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  test("q169 Theil-Sen slope shrugs off a 10x spike day") {
    val dir = spikeEventsDir()
    val r = TimeSeries.q169.run(spark, dir).collect()
    assert(r.length == 1 && r.head.getLong(1) == 45L) // C(10,2) pairs
    val slope = r.head.getDouble(2)
    assert(math.abs(slope) <= 0.2,
      s"median slope must ignore the spike, got $slope")
  }

  test("q174 MAD flags exactly the spike day") {
    val dir = spikeEventsDir()
    val flagged = TimeSeries.q174.run(spark, dir).collect()
    assert(flagged.length == 1, s"only the spike: ${flagged.toSeq}")
    assert(flagged.head.getLong(2) == 100L) // the 100-event day
    assert(flagged.head.getDouble(3) > 100.0) // z ~ 0.6745*89.5/0.5
  }
}
