package graft.partition

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** P1–P6 encode-partition semantics on known records. */
class PartitionerSpec extends SparkTestBase {

  private lazy val df = kafkaRecords("t", nParts = 2, perPart = 3)
    .withColumn("region", concat(lit("r"), col("partition")))

  private def encs(p: Partitioner): Seq[String] =
    df.select(p.encodePartition).distinct().collect().map(_.getString(0)).sorted

  test("P1 default: partition=<kafkaPartition>") {
    assert(encs(DefaultPartitioner) == Seq("partition=0", "partition=1"))
  }

  test("P2 field: <field>=<value>") {
    assert(encs(FieldPartitioner("region")) == Seq("region=r0", "region=r1"))
  }

  test("P3 time-based: custom format + duration bucketing + timezone") {
    // base 1700000000000 = 2023-11-14 22:13:20 UTC; 10-minute buckets
    val p = TimeBasedPartitioner("yyyy-MM-dd-HH-mm", 600000L)
    assert(encs(p) == Seq("2023-11-14-22-10"))
    // Shanghai is UTC+8
    val sh = TimeBasedPartitioner("yyyy-MM-dd-HH", 3600000L, timezone = "Asia/Shanghai")
    assert(encs(sh) == Seq("2023-11-15-06"))
  }

  test("P4 hourly/daily specializations") {
    assert(encs(HourlyPartitioner()) == Seq("2023-11-14-22"))
    assert(encs(DailyPartitioner()) == Seq("2023-11-14"))
  }

  test("P5 RecordField extractor routes by a payload timestamp field") {
    val df2 = df.withColumn("evt_ts",
      col("timestamp") + expr("INTERVAL 2 HOURS"))
    val p = TimeBasedPartitioner("yyyy-MM-dd-HH", 3600000L,
      extractor = RecordFieldTimestamp("evt_ts"))
    val out = df2.select(p.encodePartition).distinct().collect().map(_.getString(0))
    assert(out.toSeq == Seq("2023-11-15-00"))
  }

  test("P6 custom: arbitrary Column expression") {
    val p = CustomPartitioner(concat(lit("mod="), pmod(col("offset"), lit(2))))
    assert(encs(p) == Seq("mod=0", "mod=1"))
  }
}
