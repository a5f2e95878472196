package graft.partition

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Output partitioners (SURVEY.md §2.3, P1–P6) — "the GROUP BY of this
  * system". The reference whitelists five Confluent partitioners
  * (`OSSSinkConnectorConfiguration.java:110-118`) and calls
  * `encodePartition(record)` per record (`TopicPartitionWriter.java:194`).
  *
  * Spark-first re-expression: a partitioner is a pure function from record
  * columns to ONE derived `Column` (the encoded partition directory).
  * Because it's a Column, it joins the plan inside codegen, it's usable
  * both by the parity sink (file routing) and by `partitionBy` in batch
  * writes, and partition pruning on the resulting directory layout is free
  * for downstream readers. No reflection (`OSSSinkTask.java:124-140`'s
  * plug-in loading) — a sealed registry instead.
  */
sealed trait Partitioner {
  /** The encoded-partition directory expression, e.g. `partition=3` or
    * `2019-06-12-16`. Input columns follow the canonical Kafka record
    * shape: topic/partition/offset/timestamp/key/value + decoded payload
    * columns.
    */
  def encodePartition: Column
}

/** P5: timestamp extractors — `Wallclock` (breaks exactly-once determinism,
  * README.md:125), `Record` (the Kafka record timestamp column), or
  * `RecordField` (a payload field). `TopicPartitionWriter.java:111-112,186-191`.
  */
sealed trait TimestampExtractor { def ts: Column }
case object WallclockTimestamp extends TimestampExtractor { def ts: Column = current_timestamp() }
case object RecordTimestamp extends TimestampExtractor { def ts: Column = col("timestamp") }
final case class RecordFieldTimestamp(field: String) extends TimestampExtractor {
  def ts: Column = col(field)
}

/** P1: `partition=<kafkaPartition>` — preserves Kafka partitioning
  * (path shape per `TestDataWriterAvro.java:493-496`).
  */
case object DefaultPartitioner extends Partitioner {
  def encodePartition: Column = concat(lit("partition="), col("partition"))
}

/** P2: directory from a record field (`partition.field.name`). */
final case class FieldPartitioner(fieldName: String) extends Partitioner {
  def encodePartition: Column = concat(lit(s"$fieldName="), col(fieldName))
}

/** P3: directory from the extracted timestamp formatted by `pathFormat`
  * (Java SimpleDateFormat-style per README.md:172-179; here Spark
  * `date_format` pattern), bucketed to `partition.duration.ms`, rendered
  * in `timezone`.
  */
final case class TimeBasedPartitioner(
    pathFormat: String,
    durationMs: Long,
    timezone: String = "UTC",
    extractor: TimestampExtractor = RecordTimestamp) extends Partitioner {
  def encodePartition: Column = {
    val bucketed = timestamp_millis(
      floor(unix_millis(extractor.ts) / durationMs).cast("long") * durationMs)
    date_format(from_utc_timestamp(bucketed, timezone), pathFormat)
  }
}

/** P4: fixed-format TimeBased specializations
  * (`OSSSinkConnectorConfiguration.java:113-114`).
  */
object HourlyPartitioner {
  def apply(tz: String = "UTC", ex: TimestampExtractor = RecordTimestamp): TimeBasedPartitioner =
    TimeBasedPartitioner("yyyy-MM-dd-HH", 3600000L, tz, ex)
}
object DailyPartitioner {
  def apply(tz: String = "UTC", ex: TimestampExtractor = RecordTimestamp): TimeBasedPartitioner =
    TimeBasedPartitioner("yyyy-MM-dd", 86400000L, tz, ex)
}

/** P6: custom partitioner — any Column-producing function, registered as a
  * value instead of loaded by reflection.
  */
final case class CustomPartitioner(expr: Column) extends Partitioner {
  def encodePartition: Column = expr
}
