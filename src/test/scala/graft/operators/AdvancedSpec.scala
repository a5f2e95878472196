package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.llmops.Similarity

/** Behavior checks for the advanced operators on controlled inputs. */
class AdvancedSpec extends SparkTestBase {

  test("asof join: carries the latest prior click per user (inclusive)") {
    import spark.implicits._
    def ts(s: Long) = new java.sql.Timestamp(1700000000000L + s * 1000)
    // user 1: click@10 (v=1.0), purchase@20, click@30 (v=3.0), purchase@30
    //         (inclusive: purchase@30 sees click@30), purchase@5 (no match)
    val rows = Seq(
      (1L, ts(10), 1L, "click", 1.0),
      (2L, ts(20), 1L, "purchase", 0.0),
      (3L, ts(30), 1L, "click", 3.0),
      (4L, ts(30), 1L, "purchase", 0.0),
      (5L, ts(5), 1L, "purchase", 0.0),
      (6L, ts(50), 2L, "purchase", 0.0))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    val dir = java.nio.file.Files.createTempDirectory("graft-asof").toString
    rows.write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = Advanced.q34.run(spark, dir).collect()
      .map(r => r.getLong(0) -> Option(r.get(2)).map(_.asInstanceOf[Double])).toMap
    assert(out(2L).contains(1.0))  // latest prior click
    assert(out(4L).contains(3.0))  // inclusive at equal ts
    assert(out(5L).isEmpty)        // nothing before
    assert(out(6L).isEmpty)        // user 2 has no clicks
  }

  test("approx_count_distinct within 5% of exact at sf0.001") {
    val rows = Advanced.q36.run(spark, sf("sf0.001")).collect()
    rows.foreach { r =>
      val approx = r.getLong(1).toDouble
      val exact = r.getLong(2).toDouble
      assert(math.abs(approx - exact) / exact < 0.05,
        s"status ${r.getString(0)}: approx=$approx exact=$exact")
      // the in-query audit column must agree with the bound it encodes
      assert(r.getBoolean(4), s"err_ok false for status ${r.getString(0)}")
    }
  }

  test("q246: oracled HLL audit — exact side matches countDistinct, err_ok true") {
    val rows = Advanced.q246.run(spark, sf("sf0.001")).collect()
    assert(rows.nonEmpty)
    val expected = graft.Tables.orders(spark, sf("sf0.001"))
      .groupBy("o_orderstatus")
      .agg(countDistinct("o_custkey"), count(lit(1)))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    rows.foreach { r =>
      assert((r.getLong(1), r.getLong(2)) == expected(r.getString(0)))
      assert(r.getBoolean(3), s"err_ok false for status ${r.getString(0)}")
    }
  }

  test("q36's pre-grouped rewrite preserves countDistinct NULL semantics") {
    import spark.implicits._
    // TPC-H custkey is non-null, so exercise the rewrite shape on a frame
    // where the key IS nullable: a NULL key must not count as a distinct
    // customer (count(key), not count(1), after the pre-group)
    val rows = Seq(
      ("O", Some(1L)), ("O", Some(1L)), ("O", Some(2L)), ("O", None),
      ("F", None), ("F", None))
      .toDF("o_orderstatus", "o_custkey")
    val dir = java.nio.file.Files.createTempDirectory("graft-q36null").toString
    rows.write.mode("overwrite").parquet(s"$dir/orders.parquet")
    val got = Advanced.q36.run(spark, dir).collect()
      .map(r => r.getString(0) -> ((r.getLong(2), r.getLong(3)))).toMap
    val expected = rows.groupBy("o_orderstatus")
      .agg(countDistinct("o_custkey"), count(lit(1)))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got == expected)                 // exact_cust == countDistinct, n == all rows
    assert(got("F") == ((0L, 2L)))          // all-NULL group: zero distinct, both rows counted
    assert(got("O") == ((2L, 4L)))          // NULL-key group excluded from distinct, not from n
  }

  test("sessionization: gap closes sessions, counts partition the events") {
    val out = Advanced.q37.run(spark, sf("sf0.001"))
    val total = out.agg(sum("n_events")).collect().head.getLong(0)
    assert(total == 1000) // every event lands in exactly one session
  }

  test("cube emits all four grouping-set levels") {
    val out = Advanced.q35.run(spark, sf("sf0.001")).collect()
    val levels = out.map(r => (r.getInt(2), r.getInt(3))).toSet
    assert(levels == Set((0, 0), (0, 1), (1, 0), (1, 1)))
  }

  test("IVF top-k achieves reasonable recall vs brute force") {
    val dir = sf("sf0.001")
    val got = Similarity.q38.run(spark, dir).collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(2)).toSet).toMap
    val e = graft.Tables.embeddings(spark, dir)
    val brute = Similarity.bruteForceTopK(
      e.filter(col("vec_id").isin(100L, 101L, 102L)), e, k = 5).collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(2)).toSet).toMap
    // 1-probe IVF over random-ish data: expect SOME overlap with brute
    // force and full result shape; exact recall is data-dependent
    assert(got.keySet == Set(100L, 101L, 102L))
    assert(got.values.forall(_.size == 5))
    val overlap = got.keys.map(k => got(k).intersect(brute(k)).size).sum
    assert(overlap >= 3, s"IVF found almost nothing from brute-force top-5 (overlap=$overlap)")
  }
}
