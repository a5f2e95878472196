package graft

/** vec_dot registered through the shared extension registry is
  * SQL-callable (registerAll path; the SparkSessionExtensions class uses
  * the identical builder at session construction).
  */
class GraftExtensionsSpec extends SparkTestBase {

  test("vec_dot is available in SQL after registration") {
    import spark.implicits._
    GraftExtensions.registerAll(spark)
    Seq((Seq(1f, 2f, 3f), Seq(4f, 5f, 6f))).toDF("a", "b")
      .createOrReplaceTempView("vecs")
    val out = spark.sql("SELECT vec_dot(a, b) AS d FROM vecs").collect()
    assert(out.head.getDouble(0) == 1.0 * 4 + 2.0 * 5 + 3.0 * 6)
    spark.catalog.dropTempView("vecs")
  }
}
