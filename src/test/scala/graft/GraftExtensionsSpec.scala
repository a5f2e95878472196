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

  test("freq_sketch and sig_agreement are SQL-callable") {
    import spark.implicits._
    GraftExtensions.registerAll(spark)
    Seq("a", "a", "a", "b", "c").toDF("t").createOrReplaceTempView("terms")
    val sk = spark.sql("SELECT freq_sketch(t, 2) AS sk FROM terms")
      .head.getMap[String, Long](0)
    assert(sk.contains("a") && sk.size <= 2)
    Seq((Seq(1L, 2L, 3L), Seq(1L, 9L, 3L))).toDF("x", "y")
      .createOrReplaceTempView("sigs")
    val agree = spark.sql("SELECT sig_agreement(x, y) AS n FROM sigs")
      .head.getInt(0)
    assert(agree == 2)
    spark.catalog.dropTempView("terms"); spark.catalog.dropTempView("sigs")
  }

  test("minhash_sketch aggregate is SQL-callable and matches the library path") {
    import spark.implicits._
    GraftExtensions.registerAll(spark)
    Seq((1L, 10L), (1L, 20L), (1L, 30L), (2L, 10L)).toDF("doc_id", "h")
      .createOrReplaceTempView("hashes")
    val sql = spark.sql(
      "SELECT doc_id, minhash_sketch(h) AS sig FROM hashes GROUP BY doc_id ORDER BY doc_id")
      .collect()
    assert(sql.length == 2)
    val sig1 = sql.head.getSeq[Long](1)
    assert(sig1.length == graft.llmops.Dedup.NumHashes)
    // doc 2's single-hash mins: (a*10+b) mod p per function — spot check
    val sig2 = sql(1).getSeq[Long](1)
    val (a0, b0) = graft.llmops.Dedup.minhashParams.head
    assert(sig2.head == (a0 * 10L + b0) % graft.llmops.Dedup.MersennePrime)
    spark.catalog.dropTempView("hashes")
  }

  test("simhash_sketch aggregate is SQL-callable with sign-packed bits") {
    import spark.implicits._
    GraftExtensions.registerAll(spark)
    // two tokens with hash 0b01 and one with 0b11: bit0 sum = +3 → set;
    // bit1 sum = -1+(-1)+1 = -1 → clear; all higher bits negative → clear
    Seq((1L, 1L), (1L, 1L), (1L, 3L)).toDF("doc_id", "h")
      .createOrReplaceTempView("tok_hashes")
    val out = spark.sql(
      "SELECT doc_id, simhash_sketch(h) AS sh FROM tok_hashes GROUP BY doc_id")
      .collect()
    assert(out.head.getLong(1) == 1L)
    spark.catalog.dropTempView("tok_hashes")
  }
}
