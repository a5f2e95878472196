package graft.streaming

import java.nio.file.Files
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.SparkTestBase
import graft.core.PipelineConfig
import graft.partition.DefaultPartitioner
import graft.sink.JsonFormat

/** Streaming parity: a MemoryStream producing the canonical Kafka record
  * shape drives the foreachBatch sink; files land with offset-exact names
  * across micro-batches, and the checkpoint carries offsets (D2). Also
  * covers the streaming analytics ops the reference's rotation maps to:
  * watermarked windowed aggregation and streaming dropDuplicates.
  */
class StreamingSpec extends SparkTestBase {

  case class Rec(topic: String, partition: Int, offset: Long,
                 timestamp: java.sql.Timestamp, a: Long, b: String)

  private def recs(from: Int, until: Int): Seq[Rec] =
    (from until until).map(o =>
      Rec("s", 0, o.toLong, new java.sql.Timestamp(1700000000000L + o * 1000L), o * 10L, s"v$o"))

  test("memory-source micro-batches → offset-named json files + checkpoint") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val base = Files.createTempDirectory("graft-stream")
    val ckpt = Files.createTempDirectory("graft-ckpt")
    val cfg = PipelineConfig(flushSize = 50)
    val stream = MemoryStream[Rec]
    val q = ParityPipeline.start(
      stream.toDF(), cfg, DefaultPartitioner, JsonFormat(),
      base.toString, ckpt.toString,
      payload = to_json(struct(col("a"), col("b"))))
    try {
      stream.addData(recs(0, 120)) // batch 0 → files 0, 50, 100
      q.processAllAvailable()
      stream.addData(recs(120, 160)) // batch 1 → file 120 (its own batch)
      q.processAllAvailable()
    } finally q.stop()

    val files = listFiles(base)
    assert(files.contains(f"topics/s/partition=0/s+0+${0}%010d.json"))
    assert(files.contains(f"topics/s/partition=0/s+0+${100}%010d.json"))
    assert(files.contains(f"topics/s/partition=0/s+0+${120}%010d.json"))
    // checkpoint recorded both epochs (D2: offsets WAL replaces preCommit)
    assert(Files.list(ckpt.resolve("offsets")).iterator().asScala.size >= 2)
  }

  test("watermarked windowed aggregation (streaming analytics layer)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[Rec]
    val agg = stream.toDF()
      .withWatermark("timestamp", "10 minutes")
      .groupBy(window(col("timestamp"), "1 minute"), col("partition"))
      .agg(count(lit(1)).as("n"), sum(col("a")).as("sum_a"))
    val q = agg.writeStream.outputMode("complete")
      .format("memory").queryName("win_agg")
      .trigger(Trigger.ProcessingTime(0L)).start()
    try {
      stream.addData(recs(0, 180))
      q.processAllAvailable()
      val out = spark.table("win_agg").collect()
      // base ts 22:13:20 is mid-minute → 180s of 1s-spaced events span 4 windows
      assert(out.length == 4)
      assert(out.map(_.getAs[Long]("n")).sum == 180)
    } finally q.stop()
  }

  test("streaming session windows merge events within the gap") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[Rec]
    val sessions = stream.toDF()
      .withWatermark("timestamp", "1 hour")
      .groupBy(session_window(col("timestamp"), "30 seconds"), col("partition"))
      .agg(count(lit(1)).as("n"))
    val q = sessions.writeStream.outputMode("complete")
      .format("memory").queryName("sess")
      .trigger(Trigger.ProcessingTime(0L)).start()
    try {
      // two bursts of 1s-spaced events separated by a >30s gap → 2 sessions
      stream.addData(recs(0, 20) ++ recs(60, 80))
      q.processAllAvailable()
      val out = spark.table("sess").collect()
      assert(out.length == 2)
      assert(out.map(_.getAs[Long]("n")).sorted.toSeq == Seq(20L, 20L))
    } finally q.stop()
  }

  test("streaming dropDuplicates dedups across micro-batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[Rec]
    val dedup = stream.toDF()
      .withWatermark("timestamp", "1 hour")
      .dropDuplicates("offset")
    val q = dedup.writeStream.outputMode("append")
      .format("memory").queryName("dedup_out")
      .trigger(Trigger.ProcessingTime(0L)).start()
    try {
      stream.addData(recs(0, 50))
      q.processAllAvailable()
      stream.addData(recs(25, 75)) // 25 dups + 25 new
      q.processAllAvailable()
      assert(spark.table("dedup_out").count() == 75)
    } finally q.stop()
  }

  test("batch analytics Columns compose into streaming queries (redaction + quality gate)") {
    // the same pure-Column operators the oracled batch queries use run
    // unchanged inside a stream — stateless per-row analytics need no
    // streaming-specific code path
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[(Long, String)]
    val curated = stream.toDF().toDF("doc_id", "text")
      .withColumn("clean", graft.llmops.TextAnalysis.redactPii(col("text")))
      .withColumn("n_tokens", size(split(col("clean"), " ")))
      .filter(col("n_tokens") >= 3)
    val q = curated.writeStream.outputMode("append")
      .format("memory").queryName("stream_curate")
      .trigger(Trigger.ProcessingTime(0L)).start()
    try {
      stream.addData(
        (1L, "contact me at a@b.com for details"),
        (2L, "too short"),
        (3L, "server at 10.0.0.1 answers"))
      q.processAllAvailable()
      val rows = spark.table("stream_curate").collect()
        .map(r => r.getLong(0) -> r.getString(2)).toMap
      assert(rows.keySet == Set(1L, 3L)) // doc 2 fails the token gate
      assert(rows(1L) == "contact me at <EMAIL> for details")
      assert(rows(3L) == "server at <IP> answers")
    } finally q.stop()
  }
}
