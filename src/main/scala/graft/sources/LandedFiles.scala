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

  /** Name pattern derived from the sink's config: the same `fileDelim`
    * that built `<topic><delim><partition><delim><paddedOffset><ext>`
    * must parse it back. The extension class covers compressed/custom
    * extensions (`.json.gz`, `.bin`, `.mp4`, ...).
    */
  private def filePattern(fileDelim: String): String = {
    val d = java.util.regex.Pattern.quote(fileDelim)
    s"([^/]+?)$d(\\d+)$d(\\d+)\\.[A-Za-z0-9.]+$$"
  }

  /** Parquet-landed records + (topic, partition, file_start_offset)
    * provenance columns parsed from the deterministic file names.
    * `recursiveFileLookup` handles any partitioner depth (hourly, a
    * multi-level `yyyy/MM/dd` path format, ...) and a non-default
    * `topicsDir`.
    */
  def readParquet(spark: SparkSession, baseDir: String,
                  topicsDir: String = "topics",
                  fileDelim: String = "+"): DataFrame =
    withProvenance(spark.read
      .option("recursiveFileLookup", "true")
      .parquet(s"$baseDir/$topicsDir"), fileDelim)

  /** JSON-landed records (schema required — landed JSON carries none). */
  def readJson(spark: SparkSession, baseDir: String,
               schema: org.apache.spark.sql.types.StructType,
               topicsDir: String = "topics",
               fileDelim: String = "+"): DataFrame =
    withProvenance(spark.read.schema(schema)
      .option("recursiveFileLookup", "true")
      .json(s"$baseDir/$topicsDir"), fileDelim)

  def withProvenance(df: DataFrame, fileDelim: String = "+"): DataFrame = {
    val f = input_file_name()
    val p = filePattern(fileDelim)
    df
      .withColumn("_topic", regexp_extract(f, p, 1))
      .withColumn("_kafka_partition", regexp_extract(f, p, 2).cast("int"))
      .withColumn("_file_start_offset", regexp_extract(f, p, 3).cast("long"))
  }
}
