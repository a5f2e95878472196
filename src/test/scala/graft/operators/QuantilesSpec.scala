package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** q118's engine under the distributions the refine pass must survive:
  * point mass (80%+ identical values), heavy ties at boundaries, negatives,
  * and a refineThreshold small enough to force multi-round recursion.
  * Expected values come from the textbook sort (fine at test scale).
  */
class QuantilesSpec extends SparkTestBase {
  import spark.implicits._

  private val pcts = Seq(25, 50, 75, 90, 99)

  /** Naive oracle: k = ceil(pct*n/100), value = k-th smallest. */
  private def naive(xs: Seq[Double]): Seq[(Int, Long, Double)] = {
    val sorted = xs.sorted
    val n = xs.size.toLong
    pcts.map { p => val k = (p * n + 99) / 100; (p, k, sorted((k - 1).toInt)) }
  }

  private def run(xs: Seq[Double], threshold: Long): Seq[(Int, Long, Double)] =
    Quantiles.exactQuantiles(
        xs.toDF("v").repartition(4), "v", pcts, B = 8,
        refineThreshold = threshold, maxRounds = 64)
      .as[(Int, Long, Double)].collect().toSeq

  test("point mass: 85% of rows share one value, tiny threshold recurses") {
    val xs = Seq.fill(8500)(7.25) ++ (1 to 1500).map(_ * 0.001)
    // threshold 100 << the 8500-row mass: the old single-refine would window
    // 8500 rows in one partition; the loop must resolve the mass by observed
    // min==max instead.
    assert(run(xs, threshold = 100) == naive(xs))
  }

  test("two point masses at range extremes") {
    val xs = Seq.fill(4000)(-5.0) ++ Seq.fill(4000)(5.0) ++ Seq(0.0, 1.0, 2.0)
    assert(run(xs, threshold = 50) == naive(xs))
  }

  test("uniform with ties on bucket boundaries and negatives") {
    val xs = (0 until 5000).map(i => ((i % 97) - 48) * 0.5) // many exact ties
    assert(run(xs, threshold = 64) == naive(xs))
  }

  test("all rows identical resolves without any window") {
    val xs = Seq.fill(2000)(42.0)
    assert(run(xs, threshold = 10) == naive(xs))
  }

  test("n smaller than threshold takes the direct refine path") {
    val xs = (1 to 50).map(_.toDouble)
    assert(run(xs, threshold = 1000) == naive(xs))
  }

  test("grouped engine: per-group ranks on skewed groups, tiny threshold") {
    // group A is a point mass, group B uniform, group C tiny
    val rows = Seq.fill(4000)(("A", 9.5)) ++
      (1 to 3000).map(i => ("B", i * 0.01)) ++ Seq(("C", 1.0), ("C", 2.0))
    val got = Quantiles.exactQuantilesByGroup(
        rows.toDF("grp", "v").repartition(4), "grp", "v", pcts,
        B = 8, refineThreshold = 64)
      .as[(String, Int, Long, Double)].collect().toSeq
    val expect = rows.groupBy(_._1).toSeq.sortBy(_._1).flatMap { case (g, rs) =>
      val sorted = rs.map(_._2).sorted
      val n = rs.size.toLong
      pcts.map { p => val k = (p * n + 99) / 100; (g, p, k, sorted((k - 1).toInt)) }
    }
    assert(got == expect)
  }

  test("grouped engine rejects unbounded group cardinality") {
    val rows = (1 to 100).map(i => (s"g$i", i.toDouble))
    val ex = intercept[IllegalArgumentException] {
      Quantiles.exactQuantilesByGroup(rows.toDF("grp", "v"), "grp", "v",
        Seq(50), maxGroups = 10).count()
    }
    assert(ex.getMessage.contains("groups"))
  }

  test("production default threshold matches on lineitem sf0.001") {
    val got = Quantiles.q118.run(spark, sf("sf0.001"))
      .as[(Int, Long, Double)].collect().toSeq
    val xs = graft.Tables.lineitem(spark, sf("sf0.001"))
      .select(col("l_extendedprice")).as[Double].collect().toSeq
    assert(got == naive(xs))
  }
}
