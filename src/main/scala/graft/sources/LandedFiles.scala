package graft.sources

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}

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

  /** Avro-landed records decoded WITHOUT the spark-avro connector: the
    * `binaryFile` source delivers whole container files, avro-core decodes
    * them per partition (one decoder per file, the classic opaque-blob →
    * rows pattern), and provenance is parsed from the path. Container
    * files are file-at-a-time units here — appropriate for the sink's
    * flush-size-bounded objects, not for multi-GB avro.
    */
  def readAvro(spark: SparkSession, baseDir: String,
               schema: org.apache.spark.sql.types.StructType,
               topicsDir: String = "topics",
               fileDelim: String = "+"): DataFrame = {
    import org.apache.avro.file.{DataFileStream, SeekableByteArrayInput, DataFileReader}
    import org.apache.avro.generic.{GenericDatumReader, GenericRecord}
    import spark.implicits._
    val files = spark.read.format("binaryFile")
      .option("recursiveFileLookup", "true")
      .option("pathGlobFilter", "*.avro")
      .load(s"$baseDir/$topicsDir")
      .select(col("path"), col("content"))
      .as[(String, Array[Byte])]
    val outSchema = schema.add("__path", org.apache.spark.sql.types.StringType)
    val rows = files.flatMap { case (path, content) =>
      val reader = new DataFileStream[GenericRecord](
        new SeekableByteArrayInput(content), new GenericDatumReader[GenericRecord]())
      import scala.jdk.CollectionConverters._
      try reader.iterator().asScala.map { rec =>
        org.apache.spark.sql.Row.fromSeq(
          graft.sink.AvroSupport.fromGenericRecord(rec, schema).toSeq :+ path)
      }.toVector
      finally reader.close()
    }(org.apache.spark.sql.Encoders.row(outSchema))
    withProvenance(rows.toDF(), fileDelim, pathCol = col("__path")).drop("__path")
  }

  def withProvenance(df: DataFrame, fileDelim: String = "+",
                     pathCol: Column = input_file_name()): DataFrame = {
    val f = pathCol
    val p = filePattern(fileDelim)
    df
      .withColumn("_topic", regexp_extract(f, p, 1))
      .withColumn("_kafka_partition", regexp_extract(f, p, 2).cast("int"))
      .withColumn("_file_start_offset", regexp_extract(f, p, 3).cast("long"))
  }
}
