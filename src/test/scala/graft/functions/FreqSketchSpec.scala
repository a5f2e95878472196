package graft.functions

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Misra–Gries sketch: the guarantee (no heavy item ever missing, bounded
  * undercount) must hold under partitioned execution and tiny k — the
  * properties q106 relies on to stay layout-independent.
  */
class FreqSketchSpec extends SparkTestBase {

  private def stream(rows: Seq[String], parts: Int) = {
    import spark.implicits._
    rows.toDF("term").repartition(parts)
  }

  test("every item above N/(k+1) keeps a counter, any partitioning, tiny k") {
    // N = 1000: "hot" 400×, "warm" 300×, 300 singletons; k=3 → bound
    // N/(k+1) = 250: hot and warm must ALWAYS survive
    val rows = Seq.fill(400)("hot") ++ Seq.fill(300)("warm") ++
      (1 to 300).map(i => s"u$i")
    for (parts <- Seq(1, 4, 13)) {
      val sk = stream(scala.util.Random.shuffle(rows), parts)
        .agg(FreqSketch.freq_sketch(col("term"), 3).as("sk"))
        .head.getMap[String, Long](0)
      assert(sk.contains("hot") && sk.contains("warm"),
        s"parts=$parts lost a guaranteed heavy item: $sk")
      // undercount bounded by N/(k+1)
      assert(sk("hot") >= 400 - 250 && sk("hot") <= 400, s"hot=$sk")
      assert(sk.size <= 3)
    }
  }

  test("sketch counts are lower bounds (never overcount)") {
    val rows = Seq.fill(50)("a") ++ Seq.fill(30)("b") ++ Seq.fill(20)("c") ++
      (1 to 100).map(i => s"x$i")
    val sk = stream(rows, 7)
      .agg(FreqSketch.freq_sketch(col("term"), 8).as("sk"))
      .head.getMap[String, Long](0)
    val truth = Map("a" -> 50L, "b" -> 30L, "c" -> 20L).withDefaultValue(1L)
    sk.foreach { case (t, c) =>
      assert(c <= truth(t), s"overcounted $t: $c > ${truth(t)}")
    }
  }

  test("q106: two-pass heavy hitters equal the exact computation") {
    val sfDir = sf("sf0.01")
    val out = graft.QueryRegistry.byName("q106_heavy_hitters")
      .run(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val exact = docs
      .select(explode(split(graft.operators.Ops.asciiLower(col("text")), " ")).as("term"))
      .filter(col("term") =!= "")
    val n = exact.count()
    val truth = exact.groupBy("term").agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") * 200 >= lit(n))
      .orderBy(col("cnt").desc, col("term"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(out.nonEmpty, "fixture: the sf corpus has heavy terms")
    assert(out.sameElements(truth),
      s"sketch-pruned recount diverged: ${out.toSeq} vs ${truth.toSeq}")
  }
}
