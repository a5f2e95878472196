package graft.streaming

import java.nio.file.{Files, Path => JPath}
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkTestBase
import graft.core.PipelineConfig
import graft.partition.DefaultPartitioner
import graft.schema.SchemaCompat
import graft.sink.JsonFormat

/** R5/E1/E2 through the sink: alternating-schema record streams, the
  * reference's schema-evolution test shape (`TestDataWriterAvro.java:354-409`,
  * FIXTURES.md §1: v1 = base fields, v2 = +defaulted string).
  */
class EvolvingSinkSpec extends SparkTestBase {

  private val v1 = StructType(Seq(StructField("a", LongType), StructField("b", StringType)))
  private val v2 = StructType(v1.fields :+ StructField("c", StringType))

  /** offsets 0-99 schema v1, 100-199 v2, 200-299 v1 again (NONE must cut
    * three files; BACKWARD projects all to v2).
    */
  private def evolvingBatch() = {
    import spark.implicits._
    (0 until 300).map { o =>
      val sid = if (o >= 100 && o < 200) 2 else 1
      ("ev", 0, o.toLong, new java.sql.Timestamp(1700000000000L + o * 1000L),
        sid, o.toLong, s"v$o", if (sid == 2) s"c$o" else null)
    }.toDF("topic", "partition", "offset", "timestamp", "schema_id", "a", "b", "c")
      .withColumn("payload",
        when(col("schema_id") === 2, struct(col("a"), col("b"), col("c")))
          .otherwise(struct(col("a"), col("b"), lit(null).cast("string").as("c"))))
  }

  private def files(base: JPath): Seq[String] = listFiles(base)

  test("NONE: schema change rotates files at the version boundaries (R5)") {
    val base = Files.createTempDirectory("graft-evolve-none")
    val cfg = PipelineConfig(flushSize = 1000000, compatibility = SchemaCompat.None_)
    ParityPipeline.writeEvolving(
      evolvingBatch(), Map(1 -> v1, 2 -> v2), col("schema_id"),
      cfg, DefaultPartitioner, JsonFormat(), base.toString,
      toPayload = df => to_json(df.col("payload")))
    // three files: v1[0-99], v2[100-199], v1[200-299]
    assert(files(base) == Seq(0, 100, 200).map(o => f"topics/ev/partition=0/ev+0+$o%010d.json"))
    val f0 = Files.readAllLines(base.resolve(f"topics/ev/partition=0/ev+0+${0}%010d.json")).asScala
    assert(f0.size == 100)
  }

  test("BACKWARD: old records project up to the latest schema, one file (E2)") {
    val base = Files.createTempDirectory("graft-evolve-back")
    val cfg = PipelineConfig(flushSize = 1000000, compatibility = SchemaCompat.Backward)
    ParityPipeline.writeEvolving(
      evolvingBatch(), Map(1 -> v1, 2 -> v2), col("schema_id"),
      cfg, DefaultPartitioner, JsonFormat(), base.toString,
      toPayload = df => to_json(df.col("payload")))
    assert(files(base) == Seq(f"topics/ev/partition=0/ev+0+${0}%010d.json"))
    val lines = Files.readAllLines(base.resolve(f"topics/ev/partition=0/ev+0+${0}%010d.json")).asScala
    assert(lines.size == 300)
    // v2 records keep c; projected v1 records simply omit the null field in JSON
    assert(lines(150).contains("\"c\":\"c150\""))
    assert(!lines(0).contains("\"c\""))
  }

  test("FORWARD: records project DOWN to the oldest schema, one file (E2)") {
    val base = Files.createTempDirectory("graft-evolve-fwd")
    val cfg = PipelineConfig(flushSize = 1000000, compatibility = SchemaCompat.Forward)
    ParityPipeline.writeEvolving(
      evolvingBatch(), Map(1 -> v1, 2 -> v2), col("schema_id"),
      cfg, DefaultPartitioner, JsonFormat(), base.toString,
      toPayload = df => to_json(df.col("payload")))
    assert(files(base) == Seq(f"topics/ev/partition=0/ev+0+${0}%010d.json"))
    val lines = Files.readAllLines(base.resolve(f"topics/ev/partition=0/ev+0+${0}%010d.json")).asScala
    assert(lines.size == 300)
    // v2 records lose field c when projected down to v1
    assert(!lines(150).contains("\"c\""))
  }

  test("NONE + parquet: schema-run rotation dispatches to the parquet writer") {
    val base = Files.createTempDirectory("graft-evolve-pq")
    val cfg = PipelineConfig(flushSize = 1000000, compatibility = SchemaCompat.None_)
    ParityPipeline.writeEvolving(
      evolvingBatch(), Map(1 -> v1, 2 -> v2), col("schema_id"),
      cfg, DefaultPartitioner, graft.sink.ParquetFormat(), base.toString,
      toPayload = df => to_json(df.col("payload")))
    assert(files(base) == Seq(0, 100, 200).map(o => f"topics/ev/partition=0/ev+0+$o%010d.parquet"))
    val back = spark.read.parquet(base.resolve(f"topics/ev/partition=0/ev+0+${100}%010d.parquet").toString)
    assert(back.count() == 100)
    assert(back.select("payload.c").where(col("c").isNotNull).count() == 100) // v2 run keeps c
  }

  test("F5 analog: JSON value bytes → from_json(StructType) → parquet payload") {
    import spark.implicits._
    val base = Files.createTempDirectory("graft-f5")
    val schema = StructType(Seq(
      StructField("boolean", BooleanType), StructField("int", IntegerType),
      StructField("map1", MapType(StringType, StringType)),
      StructField("list1", ArrayType(StringType))))
    // raw Kafka value bytes carrying JSON — the ParquetJsonFormat path
    // (StructType replaces the protobuf class as the JSON schema carrier)
    val records = (0 until 50).map { o =>
      ("j", 0, o.toLong, new java.sql.Timestamp(1700000000000L + o),
        s"""{"boolean":true,"int":$o,"map1":{"a":"b"},"list1":["x","y"]}""".getBytes("UTF-8"))
    }.toDF("topic", "partition", "offset", "timestamp", "value")
    val decoded = records
      .withColumn("payload", from_json(ParityPipeline.Converters.string, schema))
      .select("topic", "partition", "offset", "timestamp",
        "payload.boolean", "payload.int", "payload.map1", "payload.list1")
    val res = ParityPipeline.writeMicroBatch(
      decoded, PipelineConfig(flushSize = 1000), DefaultPartitioner,
      graft.sink.ParquetFormat(), base.toString, payload = lit(null))
    assert(res.files.map(_.records).sum == 50)
    val back = spark.read.parquet(base.resolve(f"topics/j/partition=0/j+0+${0}%010d.parquet").toString)
    assert(back.schema.fieldNames.toSet ==
      Set("topic", "partition", "offset", "timestamp", "boolean", "int", "map1", "list1"))
    val r = back.orderBy("offset").collect().head
    assert(r.getAs[Map[String, String]]("map1") == Map("a" -> "b"))
    assert(r.getAs[scala.collection.Seq[String]]("list1") == Seq("x", "y"))
  }
}
