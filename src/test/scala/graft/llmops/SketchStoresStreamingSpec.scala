package graft.llmops

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Streaming twins of the md5-sketch stores: micro-batched foreachBatch
  * delivery must land the exact same state as a cold batch build —
  * BloomStore by OR-merge algebra (no epoch guard needed), CMSStore
  * through the epoch guard (SUM-merge is not idempotent).
  */
class SketchStoresStreamingSpec extends SparkTestBase {

  private def docs = graft.Tables.documents(spark, sf("sf0.001"))

  private def tmp(p: String): String =
    java.nio.file.Files.createTempDirectory(p).toString

  test("BloomStore streaming twin: micro-batches land the cold-rebuild word table") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dir = tmp("bloomstream")
    BloomStore.build(docs.filter(col("doc_id") % 2 === 0), dir)
    val rows = docs.filter(col("doc_id") % 2 === 1)
      .select("doc_id", "text").as[(Long, String)].collect()
    val stream = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, String)]
    val q = BloomStore.stream(stream.toDS().toDF("doc_id", "text"), dir).start()
    try {
      val (b1, b2) = rows.splitAt(rows.length / 2)
      stream.addData(b1.toSeq); q.processAllAvailable()
      stream.addData(b2.toSeq); q.processAllAvailable()
    } finally q.stop()
    val warm = spark.read.parquet(s"$dir/words.parquet").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val cold = BloomStore.wordTable(BloomStore.keyGrams(docs), "shingle")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(warm == cold)
  }

  test("CMSStore streaming twin: epoch-guarded micro-batches land the cold-rebuild sketch") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dir = tmp("cmsstream")
    CMSStore.build(docs.filter(col("doc_id") % 2 === 0), dir)
    val rows = docs.filter(col("doc_id") % 2 === 1)
      .select("doc_id", "text").as[(Long, String)].collect()
    val stream = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, String)]
    val q = CMSStore.stream(stream.toDS().toDF("doc_id", "text"), dir).start()
    try {
      val (b1, b2) = rows.splitAt(rows.length / 2)
      stream.addData(b1.toSeq); q.processAllAvailable()
      stream.addData(b2.toSeq); q.processAllAvailable()
    } finally q.stop()
    val warm = CMSStore.counters(spark, dir).collect()
      .map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    val cold = CMSStore.sketchTable(CMSStore.termCounts(docs)).collect()
      .map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(warm == cold)
  }
}
