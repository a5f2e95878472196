package graft.llmops

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** The exact-store contract behind q201: warm increments must equal a cold
  * full recompute BIT-IDENTICALLY (min-merge idempotence — stronger than
  * the HLL store's tolerance band), replays must be no-ops, and the
  * novelty read must count exactly the unseen terms.
  */
class VocabStoreSpec extends SparkTestBase {

  private def docs = graft.Tables.documents(spark, sf("sf0.001"))

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("vocabstore-spec-").toString

  private def stored(dir: String): Map[String, Long] =
    spark.read.parquet(s"$dir/terms.parquet").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap

  private def cold: Map[String, Long] =
    docs.select(col("doc_id"),
        explode(split(graft.operators.Ops.asciiLower(col("text")), " ")).as("term"))
      .filter(col("term") =!= "")
      .groupBy("term").agg(min("doc_id").as("first_id")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap

  test("warm increment equals cold recompute bit-identically; replay is a no-op") {
    val dir = tmp()
    VocabStore.build(docs.filter(col("doc_id") % 2 === 0), dir)
    val batch = docs.filter(col("doc_id") % 2 === 1)
    VocabStore.update(spark, dir, batch)
    val warm = stored(dir)
    assert(warm == cold, "min-merge store must equal the cold first-occurrence table")
    // idempotence: a replayed batch cannot change any minimum
    VocabStore.update(spark, dir, batch)
    assert(stored(dir) == warm)
    // commit hygiene: no .tmp / .old residue after a successful swap
    val left = new java.io.File(dir).list().toSet
    assert(left == Set("terms.parquet"), s"residue: $left")
  }

  test("batch order does not matter: odd-then-even equals even-then-odd") {
    val (d1, d2) = (tmp(), tmp())
    VocabStore.build(docs.filter(col("doc_id") % 2 === 0), d1)
    VocabStore.update(spark, d1, docs.filter(col("doc_id") % 2 === 1))
    VocabStore.build(docs.filter(col("doc_id") % 2 === 1), d2)
    VocabStore.update(spark, d2, docs.filter(col("doc_id") % 2 === 0))
    assert(stored(d1) == stored(d2))
  }

  test("streaming twin: foreachBatch increments land the batch-API store state") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dir = tmp()
    VocabStore.build(docs.filter(col("doc_id") % 2 === 0), dir)
    val rows = docs.filter(col("doc_id") % 2 === 1)
      .select("doc_id", "text").as[(Long, String)].collect()
    val stream = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, String)]
    val q = VocabStore.stream(stream.toDS().toDF("doc_id", "text"), dir).start()
    try {
      val (b1, b2) = rows.splitAt(rows.length / 2)
      stream.addData(b1.toSeq); q.processAllAvailable()
      stream.addData(b2.toSeq); q.processAllAvailable()
    } finally q.stop()
    assert(stored(dir) == cold,
      "two streamed micro-batches must land the exact cold-recompute state")
  }

  test("newTermRate counts exactly the unseen terms") {
    import spark.implicits._
    val dir = tmp()
    val base = Seq((0L, "alpha beta gamma", "en", "s", 16L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val batch = Seq((1L, "beta delta epsilon delta", "en", "s", 24L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    VocabStore.build(base, dir)
    val r = VocabStore.newTermRate(spark, dir, batch).head
    // batch vocabulary {beta, delta, epsilon}: 3 distinct, 2 new
    assert((r.getLong(0), r.getLong(1)) == ((3L, 2L)), s"got $r")
  }
}
