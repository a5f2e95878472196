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
}
