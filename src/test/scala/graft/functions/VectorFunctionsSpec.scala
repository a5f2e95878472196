package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkTestBase
import VectorFunctions._

class VectorFunctionsSpec extends SparkTestBase {

  test("vec_dot matches the fold composition bit-for-bit (codegen + interpreted)") {
    import spark.implicits._
    val df = Seq(
      (1L, (1 to 64).map(i => math.sin(i * 0.7).toFloat), (1 to 64).map(i => math.cos(i * 1.3).toFloat)),
      (2L, Seq(1.5f, -2.5f, 3.25f), Seq(0.5f, 4.0f, -1.25f)),
      (3L, Seq.empty[Float], Seq.empty[Float]))
      .toDF("id", "a", "b")
    val fold = aggregate(
      zip_with(col("a"), col("b"), (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)
    val rows = df.select(col("id"), vec_dot(col("a"), col("b")).as("native"), fold.as("folded"))
      .collect()
    rows.foreach { r =>
      assert(java.lang.Double.doubleToLongBits(r.getDouble(1)) ==
        java.lang.Double.doubleToLongBits(r.getDouble(2)), s"id=${r.getLong(0)}")
    }
    // interpreted path: disable whole-stage codegen so nullSafeEval runs
    val prev = spark.conf.get("spark.sql.codegen.wholeStage")
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    try {
      val interp = df.filter(col("id") === 2L)
        .select(vec_dot(col("a"), col("b"))).collect().head.getDouble(0)
      assert(interp == 1.5 * 0.5 + -2.5 * 4.0 + 3.25 * -1.25)
    } finally spark.conf.set("spark.sql.codegen.wholeStage", prev)
  }

  test("vec_cosine on orthogonal / identical vectors") {
    import spark.implicits._
    val df = Seq((Seq(1f, 0f), Seq(0f, 1f)), (Seq(2f, 0f), Seq(4f, 0f)))
      .toDF("a", "b")
    val out = df.select(vec_cosine(col("a"), col("b"))).collect().map(_.getDouble(0))
    assert(out(0) == 0.0 && out(1) == 1.0)
  }

  test("null array → null result") {
    import spark.implicits._
    val df = Seq((Some(Seq(1f)), Option.empty[Seq[Float]])).toDF("a", "b")
    assert(df.select(vec_dot(col("a"), col("b"))).collect().head.isNullAt(0))
  }

  test("sig_agreement matches the HOF spelling (codegen + interpreted), handles nulls/lengths") {
    import spark.implicits._
    val df = Seq(
      (1L, (1L to 64L).toSeq, (1L to 64L).toSeq),                    // all agree
      (2L, (1L to 64L).toSeq, (1L to 64L).map(i => if (i % 3 == 0) -i else i)), // 2/3 agree
      (3L, Seq(1L, 2L, 3L), Seq(1L, 9L)),                            // length mismatch: common prefix
      (4L, Seq.empty[Long], Seq.empty[Long]))
      .toDF("id", "a", "b")
    val hof = size(filter(
      zip_with(col("a"), col("b"), (x, y) => when(x === y, 1).otherwise(null)),
      v => v.isNotNull))
    val rows = df.select(col("id"),
        sig_agreement(col("a"), col("b")).as("native"), hof.as("hofv"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2)))
    rows.foreach { case (id, n, h) => assert(n == h, s"id=$id native=$n hof=$h") }
    assert(rows.find(_._1 == 1L).get._2 == 64)
    assert(rows.find(_._1 == 3L).get._2 == 1)
    assert(rows.find(_._1 == 4L).get._2 == 0)

    val prev = spark.conf.get("spark.sql.codegen.wholeStage")
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    try {
      val interp = df.filter(col("id") === 2L)
        .select(sig_agreement(col("a"), col("b"))).collect().head.getInt(0)
      assert(interp == 64 - 64 / 3)
    } finally spark.conf.set("spark.sql.codegen.wholeStage", prev)

    val nulls = Seq((Some(Seq(1L)), Option.empty[Seq[Long]])).toDF("a", "b")
    assert(nulls.select(sig_agreement(col("a"), col("b"))).collect().head.isNullAt(0))
  }
}
