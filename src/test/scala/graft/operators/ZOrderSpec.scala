package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Z-order clustering: the written files must carry tight min/max
  * envelopes on BOTH dimensions — the property parquet row-group pruning
  * consumes — where a linear sort is tight on one and covers the full
  * range on the other.
  */
class ZOrderSpec extends SparkTestBase {

  test("morton code interleaves bits (known values)") {
    import spark.implicits._
    val out = Seq((0L, 0L), (65535L, 0L), (0L, 65535L), (3L, 5L))
      .toDF("a", "b")
      .select(ZOrder.morton(col("a"), col("b")).as("z"))
      .collect().map(_.getLong(0))
    // spread16(65535) = 0x55555555; y-side shifts left by 1 → 0xAAAAAAAA
    assert(out(0) == 0L)
    assert(out(1) == 0x55555555L)
    assert(out(2) == 0xAAAAAAAAL)
    // a=3 (bits 0,1 → even positions 0,2 = 5), b=5 (bits 0,2 → odd
    // positions 1,5 = 0x22) → 5 | 0x22 = 0x27
    assert(out(3) == 0x27L)
  }

  test("z-ordered files have tight envelopes on BOTH dims; linear sort only on one") {
    import spark.implicits._
    // 100×100 grid
    val grid = spark.range(10000)
      .select((col("id") / 100).cast("long").as("x"), (col("id") % 100).cast("long").as("y"))

    def avgSpans(df: org.apache.spark.sql.DataFrame): (Double, Double) = {
      val dir = java.nio.file.Files.createTempDirectory("zorder").toString
      df.write.mode("overwrite").parquet(dir)
      val spans = spark.read.parquet(dir)
        .groupBy(input_file_name())
        .agg((max("x") - min("x")).as("sx"), (max("y") - min("y")).as("sy"))
        .agg(avg("sx"), avg("sy")).head
      (spans.getDouble(0), spans.getDouble(1))
    }

    val (zx, zy) = avgSpans(ZOrder.clusterBy(grid, "x", "y", 16))
    val (lx, ly) = avgSpans(
      grid.repartitionByRange(16, col("x"), col("y")).sortWithinPartitions("x", "y"))

    // linear layout: x is tightly partitioned but every file spans all of y
    assert(lx < 20, s"linear x span should be tight: $lx")
    assert(ly > 90, s"linear y span should be the full range: $ly")
    // z-order: BOTH dims bounded well below the global span (ideal 16-file
    // 2D tiling covers 25 per dim; allow generous slack for range-bound
    // sampling)
    assert(zx < 60, s"z-order x span: $zx")
    assert(zy < 60, s"z-order y span: $zy")
    // and the combined envelope area is far smaller than linear's
    assert(zx + zy < (lx + ly) * 0.8, s"z ($zx,$zy) vs linear ($lx,$ly)")
  }

  test("degenerate constant dimension falls back to ordering on the live one") {
    import spark.implicits._
    val df = spark.range(1000)
      .select(col("id").as("x"), lit(7L).as("y"))
    val out = ZOrder.clusterBy(df, "x", "y", 4)
    // must not throw (division guard) and must preserve all rows
    assert(out.count() == 1000)
  }
}
