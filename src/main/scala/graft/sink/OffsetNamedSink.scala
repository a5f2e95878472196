package graft.sink

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.{Column, DataFrame, Row}

import graft.core.PipelineConfig
import graft.partition.{Partitioner, RecordTimestamp, TimestampExtractor}

/** The parity sink: offset-exact, deterministically-named file commits
  * (SURVEY.md §2.4 R1–R7, §2.6 D1–D3, §4.2).
  *
  * The reference's 405-line `TopicPartitionWriter` state machine
  * (`storage/TopicPartitionWriter.java:144-155,179-212`) collapses into a
  * declarative plan:
  *
  *   - routing  (P*): one derived column `__enc` (`encodePartition`,
  *     `TopicPartitionWriter.java:194`)
  *   - R1 flush.size: `__fileIdx = (row_number per writer-key ordered by
  *     offset - 1) / flushSize` (`TopicPartitionWriter.java:231-237`)
  *   - R2 event-time rotation: `__timeBucket = floor(ts/interval)` joins
  *     the writer key (`TopicPartitionWriter.java:343-346`)
  *   - R3 partition-change rotation: implicit — `__enc` is part of the key
  *   - R5 schema-change rotation: an `extraGroupCols` schema-id column
  *     (NONE mode); BACKWARD/FORWARD project via
  *     [[graft.schema.SchemaCompat.project]] upstream instead
  *   - D1 offset-exact naming: `__startOffset = min(offset)` per file
  *     group → `<topic>+<partition>+<zero-padded start><ext>`
  *     (`TopicPartitionWriter.java:268-285`)
  *   - D3 idempotent replay: names are pure functions of the data, files
  *     are overwrite-created (`OSSStorage.java:78-90`), so re-running a
  *     batch rewrites byte-identical objects (README.md:123)
  *
  * Scale: the only shuffle is `repartition(__path)` — one pass, keyed by
  * output file, so 1000 executors write 1000 files concurrently and no
  * executor ever holds more than its files' rows. Nothing is collected to
  * the driver except O(#files) metadata.
  *
  * Works against any Hadoop FileSystem URI — `file:/` in tests, `oss://`
  * with hadoop-aliyun on the classpath (`OSSStorage.java:48-57` analog).
  */
object OffsetNamedSink {

  /** Max rows buffered per file for the in-task D4 retry; files larger
    * than this stream without buffering (their retry layer is Spark's
    * task re-execution over the deterministic, overwrite-created names).
    */
  private[sink] val RetryBufferRows = 100000

  /** One committed file: full path + record count + offset range. */
  final case class CommittedFile(path: String, records: Long, startOffset: Long, endOffset: Long)

  /** Per (topic, partition) next-offset-to-commit — the `preCommit`
    * contract (`OSSSinkTask.java:196-208`, `TopicPartitionWriter.java:330,396-400`).
    */
  final case class BatchResult(files: Seq[CommittedFile], offsetsToCommit: Map[(String, Int), Long])

  /** Adds the file-group columns. Input must carry `topic` (string),
    * `partition` (int), `offset` (long), plus whatever the partitioner /
    * extractor reference.
    */
  def withFileGroups(
      df: DataFrame,
      cfg: PipelineConfig,
      partitioner: Partitioner,
      extractor: TimestampExtractor = RecordTimestamp,
      extension: String,
      extraGroupCols: Seq[Column] = Nil): DataFrame = {
    val enc = partitioner.encodePartition
    val timeBucket =
      if (cfg.rotateIntervalMs > 0)
        floor(unix_millis(extractor.ts) / cfg.rotateIntervalMs).cast("long")
      else lit(0L)
    val withKeys = df
      .withColumn("__enc", enc)
      .withColumn("__tb", timeBucket)
      .withColumn("__xg", if (extraGroupCols.nonEmpty) concat_ws("", extraGroupCols: _*) else lit(""))
    val writerKey = Seq(col("topic"), col("partition"), col("__enc"), col("__tb"), col("__xg"))
    val rn = row_number().over(
      Window.partitionBy(writerKey: _*).orderBy(col("offset")))
    val withIdx = withKeys.withColumn("__fileIdx", ((rn - 1) / cfg.flushSize).cast("long"))
    val fileKey = writerKey :+ col("__fileIdx")
    val start = min(col("offset")).over(Window.partitionBy(fileKey: _*))
    withIdx
      .withColumn("__startOffset", start)
      .withColumn("__dir",
        concat_ws(cfg.dirDelim, lit(cfg.topicsDir), col("topic"), col("__enc")))
      .withColumn("__fname",
        concat(
          col("topic"), lit(cfg.fileDelim),
          col("partition").cast("string"), lit(cfg.fileDelim),
          lpad(col("__startOffset").cast("string"), cfg.zeroPadWidth, "0"),
          lit(extension)))
      .withColumn("__path", concat(col("__dir"), lit(cfg.dirDelim), col("__fname")))
  }

  /** Hadoop conf entries travel to executors as a plain serializable map. */
  private def confEntries(df: DataFrame): Array[(String, String)] = {
    val conf = df.sparkSession.sparkContext.hadoopConfiguration
    val it = conf.iterator()
    val buf = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    while (it.hasNext) { val e = it.next(); buf += ((e.getKey, e.getValue)) }
    buf.toArray
  }

  private def buildConf(entries: Array[(String, String)]): Configuration = {
    val c = new Configuration(false)
    entries.foreach { case (k, v) => c.set(k, v) }
    c
  }

  /** Streamed byte-writer path (JSON F1 / ByteArray F2 / Avro F3): rows are
    * repartitioned by target file and appended in offset order through a
    * Hadoop FS stream — the executor-side analog of `RecordWriter.write`,
    * one open stream per file at a time per task.
    *
    * `payload` must be: a string column (JSON), a binary column
    * (ByteArray), or a struct column (Avro).
    */
  def writeBatch(
      df: DataFrame,
      cfg: PipelineConfig,
      partitioner: Partitioner,
      format: OutputFormat,
      baseDir: String,
      payload: Column,
      extractor: TimestampExtractor = RecordTimestamp,
      extraGroupCols: Seq[Column] = Nil): BatchResult = {

    // persist: the grouped plan feeds BOTH the write pass and the metadata
    // pass — without it the whole upstream plan re-executes for metadata,
    // and a Wallclock extractor could even re-bucket differently between
    // the two passes, reporting files that were never written
    val grouped = withFileGroups(df, cfg, partitioner, extractor, format.extension, extraGroupCols)
      .withColumn("__payload", payload)
      .persist()
    val rows = grouped.select(col("__path"), col("offset"), col("__payload"))
    val payloadType = rows.schema("__payload").dataType
    val entries = confEntries(df)
    val base = baseDir

    val retryBackoffMs = cfg.retryBackoffMs
    val writeMaxAttempts = cfg.writeMaxAttempts
    rows
      .repartition(col("__path"))
      .sortWithinPartitions(col("__path"), col("offset"))
      .foreachPartition { (it: Iterator[Row]) =>
        val conf = buildConf(entries)
        var fs: FileSystem = null
        var avroSchema: org.apache.avro.Schema = null
        val structType = payloadType match {
          case st: StructType => st
          case _ => null
        }
        // One whole-file write attempt: open (overwrite-create,
        // OSSStorage.java:78-90), append every row, close.
        def writeOnce(path: String, fileRows: Iterator[Row]): Unit = {
          val p = new Path(base, path)
          if (fs == null) fs = p.getFileSystem(conf)
          var out: java.io.OutputStream = null
          var avro: org.apache.avro.file.DataFileWriter[org.apache.avro.generic.GenericRecord] = null
          val raw = new java.io.BufferedOutputStream(fs.create(p, true), 1 << 16)
          try {
            format match {
              case j: JsonFormat => out = j.compression.wrap(raw)
              case b: ByteArrayFormat => out = b.compression.wrap(raw)
              case a: AvroFormat =>
                if (avroSchema == null) avroSchema = AvroSupport.toAvroSchema(structType)
                avro = AvroSupport.containerWriter(raw, avroSchema, a.codecFactory)
              case _: ParquetFormat =>
                throw new IllegalArgumentException("use writeBatchParquet for parquet")
            }
            fileRows.foreach { r =>
              // null payloads (Kafka tombstones) are skipped, not written —
              // one delete marker must not poison the whole micro-batch
              if (!r.isNullAt(2)) format match {
                case j: JsonFormat =>
                  out.write(r.getString(2).getBytes("UTF-8")); out.write(j.lineSeparator)
                case b: ByteArrayFormat =>
                  out.write(r.getAs[Array[Byte]](2)); out.write(b.separator)
                case _: AvroFormat =>
                  avro.append(AvroSupport.toGenericRecord(r.getStruct(2), structType, avroSchema))
                case _ => ()
              }
            }
          } finally {
            if (avro != null) avro.close() else if (out != null) out.close() else raw.close()
          }
        }
        // One FILE is the retry unit, like the reference's record buffer +
        // retry.backoff.ms (TopicPartitionWriter.java:158-171): a file
        // whose rows fit in RetryBufferRows is buffered and the whole
        // write retries on IOException (overwrite-create makes a partial
        // file from a failed attempt harmless). A larger file streams
        // straight through WITHOUT the in-task retry — the single-pass
        // iterator can't be replayed, and buffering it would regress the
        // writer from O(1) to O(file) heap — so its failures escalate
        // directly to Spark's task retry, where the deterministic names +
        // overwrite-create replay the whole partition idempotently.
        val it2 = it.buffered
        while (it2.hasNext) {
          val path = it2.head.getString(0)
          val buf = scala.collection.mutable.ArrayBuffer.empty[Row]
          while (it2.hasNext && it2.head.getString(0) == path && buf.size < RetryBufferRows)
            buf += it2.next()
          if (it2.hasNext && it2.head.getString(0) == path) {
            // oversized file: buffered prefix + rest of the stream, one pass
            val rest = new Iterator[Row] {
              def hasNext: Boolean = it2.hasNext && it2.head.getString(0) == path
              def next(): Row = it2.next()
            }
            writeOnce(path, buf.iterator ++ rest)
          } else {
            graft.core.Retry.withBackoff(writeMaxAttempts, retryBackoffMs) {
              writeOnce(path, buf.iterator)
            }
          }
        }
      }

    // records = payload rows actually written (tombstones are skipped by
    // the writer loop, so they must not inflate the metadata)
    try collectResult(grouped, count(col("__payload"))) finally grouped.unpersist()
  }

  /** Parquet path (F4/F5): Spark's vectorized parquet writer does the
    * heavy lifting via a dynamic-partition write keyed by the target file,
    * then each part file is renamed to its deterministic offset name —
    * O(#files) driver-side metadata ops, no data movement through the
    * driver. This replaces `AvroParquetWriter`
    * (`ParquetAvroRecordWriterProvider.java:78-87`) with the engine-native
    * columnar writer (row-group/page/codec via the usual
    * `parquet.block.size` / `spark.sql.parquet.compression.codec` confs).
    */
  def writeBatchParquet(
      df: DataFrame,
      cfg: PipelineConfig,
      partitioner: Partitioner,
      format: ParquetFormat,
      baseDir: String,
      payloadCols: Seq[String],
      extractor: TimestampExtractor = RecordTimestamp,
      extraGroupCols: Seq[Column] = Nil): BatchResult = {

    val spark = df.sparkSession
    // persisted for the same write-vs-metadata consistency reason as writeBatch
    val grouped = withFileGroups(df, cfg, partitioner, extractor, format.extension, extraGroupCols)
      .persist()
    val tmp = new Path(baseDir, s".graft-tmp-${java.util.UUID.randomUUID}")
    val conf = spark.sparkContext.hadoopConfiguration
    val fs = tmp.getFileSystem(conf)
    try {
      // keep row order by offset via an internal alias so a payload column
      // legitimately named "offset" survives into the output
      grouped
        .select((payloadCols.map(col) ++ Seq(
          col("offset").as("__sortOffset"), col("__dir"), col("__fname"))): _*)
        .repartition(col("__dir"), col("__fname"))
        .sortWithinPartitions(col("__dir"), col("__fname"), col("__sortOffset"))
        .drop("__sortOffset")
        .write
        .option("compression", format.codec)
        .partitionBy("__dir", "__fname")
        .mode("overwrite")
        .parquet(tmp.toString)

      // Rename part files to their deterministic names (D1). Partition dir
      // names are Hive-escaped (%2F for '/', etc.) — unescape, then
      // delete+rename (overwrite semantics, OSSStorage.java:78-90).
      // Renames are metadata-only but one RPC each; with thousands of
      // files per batch they run on a small thread pool (object stores
      // serve concurrent metadata ops well — reference pools 2048 OSS
      // connections, core-site.xml:22-25).
      val dirs = fs.globStatus(new Path(tmp, "__dir=*/__fname=*"))
      val pool = java.util.concurrent.Executors.newFixedThreadPool(
        math.max(1, math.min(16, dirs.length)))
      try {
        val futures = dirs.toSeq.map { d =>
          pool.submit(new java.util.concurrent.Callable[Unit] {
            def call(): Unit = {
              val fname = unescapePartitionValue(d.getPath.getName.stripPrefix("__fname="))
              val rel = unescapePartitionValue(d.getPath.getParent.getName.stripPrefix("__dir="))
              val parts = fs.listStatus(d.getPath).filter(_.getPath.getName.startsWith("part-"))
              require(parts.length == 1,
                s"expected 1 part file per group, got ${parts.length} in ${d.getPath}")
              val target = new Path(new Path(baseDir, rel), fname)
              val source = parts.head.getPath
              // D4: each rename is one object-store metadata RPC — retry
              // transient failures with the same backoff as data writes.
              // The body is IDEMPOTENT: if a prior attempt applied
              // server-side before its response was lost (source gone,
              // target present), it's recognized as success rather than
              // deleting the just-committed target; and Hadoop rename
              // signals failure by returning false, which must become an
              // IOException or the retry (and the whole batch) would
              // silently report success on a lost file.
              graft.core.Retry.withBackoff(cfg.writeMaxAttempts, cfg.retryBackoffMs) {
                if (!(fs.exists(target) && !fs.exists(source))) {
                  fs.mkdirs(target.getParent)
                  if (fs.exists(target)) fs.delete(target, false)
                  if (!fs.rename(source, target))
                    throw new java.io.IOException(s"rename $source -> $target returned false")
                }
              }
              ()
            }
          })
        }
        futures.foreach(_.get())
      } finally pool.shutdown()
    } finally {
      fs.delete(tmp, true)
    }
    try collectResult(grouped, count(lit(1))) finally grouped.unpersist()
  }

  /** Hive partition-path unescape (%XX sequences only — '+' stays '+'). */
  private[sink] def unescapePartitionValue(s: String): String = {
    val sb = new StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '%' && i + 2 < s.length) {
        sb.append(Integer.parseInt(s.substring(i + 1, i + 3), 16).toChar)
        i += 3
      } else { sb.append(c); i += 1 }
    }
    sb.toString
  }

  /** O(#files) metadata: per-file counts + offset ranges + preCommit map.
    * `recordCount` counts what the writer actually emits (non-null payloads
    * for the byte writers; every row for parquet).
    */
  private def collectResult(grouped: DataFrame, recordCount: Column): BatchResult = {
    val files = grouped
      .groupBy("__path", "topic", "partition")
      .agg(recordCount.as("n"), min("offset").as("lo"), max("offset").as("hi"))
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getInt(2), r.getLong(3), r.getLong(4), r.getLong(5)))
    val committed = files.map { case (p, _, _, n, lo, hi) => CommittedFile(p, n, lo, hi) }
    val offsets = files
      .groupBy { case (_, t, pt, _, _, _) => (t, pt) }
      .map { case (k, fs) => k -> (fs.map(_._6).max + 1) } // offset + 1: TopicPartitionWriter.java:330
    BatchResult(committed.toSeq.sortBy(_.path), offsets)
  }
}
