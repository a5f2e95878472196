package graft.sink

import java.net.URI
import java.nio.file.Files
import java.util.concurrent.ConcurrentHashMap

import org.apache.hadoop.fs.{FSDataOutputStream, Path, RawLocalFileSystem}
import org.apache.hadoop.util.Progressable
import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.core.{PipelineConfig, Retry}
import graft.partition.DefaultPartitioner

/** A local FS whose first create() per path throws — the transient
  * object-store failure D4 retries (reference: failureTime +
  * retry.backoff.ms, `TopicPartitionWriter.java:158-171`).
  */
class FlakyFileSystem extends RawLocalFileSystem {
  override def getScheme: String = "flaky"
  override def getUri: URI = URI.create("flaky:///")
  override def create(f: Path, overwrite: Boolean, bufferSize: Int,
                      replication: Short, blockSize: Long,
                      progress: Progressable): FSDataOutputStream = {
    if (FlakyFileSystem.failures.putIfAbsent(f.toString, true) == null)
      throw new java.io.IOException(s"injected transient failure for $f")
    super.create(f, overwrite, bufferSize, replication, blockSize, progress)
  }
}
object FlakyFileSystem {
  val failures = new ConcurrentHashMap[String, java.lang.Boolean]()
}

class RetrySpec extends SparkTestBase {

  test("Retry.withBackoff: retries IOExceptions, propagates the final one") {
    var sleeps = List.empty[Long]
    var calls = 0
    val got = Retry.withBackoff(3, 100L, ms => sleeps ::= ms) {
      calls += 1
      if (calls < 3) throw new java.io.IOException(s"boom $calls")
      "ok"
    }
    assert(got == "ok" && calls == 3 && sleeps == List(100L, 100L))

    calls = 0
    val e = intercept[java.io.IOException] {
      Retry.withBackoff(2, 1L) { calls += 1; throw new java.io.IOException("always") }
    }
    assert(e.getMessage == "always" && calls == 2)

    // non-IO exceptions are NOT retried (a schema bug must fail fast)
    calls = 0
    intercept[IllegalArgumentException] {
      Retry.withBackoff(3, 1L) { calls += 1; throw new IllegalArgumentException("bug") }
    }
    assert(calls == 1)
  }

  test("D4: sink retries a transient storage failure and completes the file") {
    val base = Files.createTempDirectory("graft-flaky")
    spark.sparkContext.hadoopConfiguration
      .setClass("fs.flaky.impl", classOf[FlakyFileSystem], classOf[org.apache.hadoop.fs.FileSystem])
    FlakyFileSystem.failures.clear()
    val cfg = PipelineConfig(flushSize = 100, retryBackoffMs = 1L, writeMaxAttempts = 3)
    val df = kafkaRecords("fk", nParts = 1, perPart = 150)
    val res = OffsetNamedSink.writeBatch(
      df, cfg, DefaultPartitioner, JsonFormat(), s"flaky://${base.toString}",
      payload = to_json(struct(col("a"), col("b"))))
    // every target file's first create() threw; the retry rewrote it whole
    assert(FlakyFileSystem.failures.size >= 2)
    assert(res.offsetsToCommit == Map(("fk", 0) -> 150L))
    val f0 = base.resolve(f"topics/fk/partition=0/fk+0+${0}%010d.json")
    val f100 = base.resolve(f"topics/fk/partition=0/fk+0+${100}%010d.json")
    assert(Files.readAllLines(f0).size == 100)
    assert(Files.readAllLines(f100).size == 50)
    assert(Files.readAllLines(f0).get(0) == """{"a":0,"b":"v0"}""")
  }

  test("D4: attempts exhausted -> the write fails loudly (no silent loss)") {
    val base = Files.createTempDirectory("graft-flaky2")
    spark.sparkContext.hadoopConfiguration
      .setClass("fs.flaky.impl", classOf[FlakyFileSystem], classOf[org.apache.hadoop.fs.FileSystem])
    FlakyFileSystem.failures.clear()
    // 1 attempt = no retries: the injected failure must surface
    val cfg = PipelineConfig(flushSize = 100, retryBackoffMs = 1L, writeMaxAttempts = 1)
    val df = kafkaRecords("fx", nParts = 1, perPart = 10)
    val e = intercept[org.apache.spark.SparkException] {
      OffsetNamedSink.writeBatch(
        df, cfg, DefaultPartitioner, JsonFormat(), s"flaky://${base.toString}",
        payload = to_json(struct(col("a"))))
    }
    assert(e.getMessage.contains("injected transient failure")
      || Option(e.getCause).exists(_.getMessage.contains("injected transient failure")))
  }
}
