package graft.sources

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Read the sink's landed files back WITH their Kafka provenance — the
  * inverse of [[graft.sink.OffsetNamedSink]]'s naming scheme
  * (`<topic>+<partition>+<zero-padded startOffset><ext>`,
  * `TopicPartitionWriter.java:268-285`). Because the name is a pure
  * function of the data's origin, topic / kafka partition / file start
  * offset are recoverable from `input_file_name()` alone — enabling
  * offset-aware reprocessing of landed data, which the reference cannot do
  * at all (its storage is write-only, `OSSStorage.java:73-75`).
  */
object LandedFiles {

  private val FilePattern = "([^/+]+)\\+(\\d+)\\+(\\d+)\\.[a-z.]+$"

  /** Parquet-landed records + (topic, partition, file_start_offset)
    * provenance columns parsed from the deterministic file names.
    * `recursiveFileLookup` handles any partitioner depth (hourly, a
    * multi-level `yyyy/MM/dd` path format, ...) and a non-default
    * `topicsDir`.
    */
  def readParquet(spark: SparkSession, baseDir: String,
                  topicsDir: String = "topics"): DataFrame =
    withProvenance(spark.read
      .option("recursiveFileLookup", "true")
      .parquet(s"$baseDir/$topicsDir"))

  /** JSON-landed records (schema required — landed JSON carries none). */
  def readJson(spark: SparkSession, baseDir: String,
               schema: org.apache.spark.sql.types.StructType,
               topicsDir: String = "topics"): DataFrame =
    withProvenance(spark.read.schema(schema)
      .option("recursiveFileLookup", "true")
      .json(s"$baseDir/$topicsDir"))

  def withProvenance(df: DataFrame): DataFrame = {
    val f = input_file_name()
    df
      .withColumn("_topic", regexp_extract(f, FilePattern, 1))
      .withColumn("_kafka_partition", regexp_extract(f, FilePattern, 2).cast("int"))
      .withColumn("_file_start_offset", regexp_extract(f, FilePattern, 3).cast("long"))
  }
}
