package graft.llmops

import graft.{QuerySpec, Tables}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** REAL audio-metadata decode for the multimodal column — the audio twin
  * of [[ImageMeta]], and codec-free for the same reason: WAV (RIFF, the
  * interchange format every audio pipeline accepts) carries channel
  * count, sample rate, bit depth, and data length in plain header fields.
  *
  * RIFF layout (Microsoft/IBM WAVE spec): `"RIFF" size "WAVE"`, then a
  * chunk walk — each chunk is `id(4) size(LE32) data[size]` with odd
  * sizes padded by one byte. The `"fmt "` chunk holds format(LE16),
  * channels(LE16), sample_rate(LE32), byte_rate(LE32), block_align(LE16),
  * bits(LE16); the `"data"` chunk's size gives the payload length, and
  * duration follows as `data_size · 1000 / byte_rate`. Everything is
  * LITTLE-endian — the opposite of PNG/JPEG, which is exactly why the
  * synth→parse oracle catches byte-order bugs.
  *
  * Compressed formats (MP3/FLAC/OGG) genuinely need codec tables and stay
  * behind [[Multimodal.decodeStub]].
  */
object AudioMeta {

  /** (channels, sample_rate, bits, duration_ms) or None when the payload
    * is not a parseable WAV. Total on truncated/adversarial bytes — same
    * contract as [[ImageMeta.parse]].
    */
  def parse(b: Array[Byte]): Option[(Int, Int, Int, Long)] = {
    if (b == null || b.length < 44) return None
    if (b(0) != 'R' || b(1) != 'I' || b(2) != 'F' || b(3) != 'F' ||
        b(8) != 'W' || b(9) != 'A' || b(10) != 'V' || b(11) != 'E') return None
    var channels, rate, bits, byteRate = -1
    var dataSize = -1L
    // Long cursor: a declared chunk size near Int.MaxValue would wrap an
    // Int cursor negative and index b(i) out of bounds; in Long arithmetic
    // the oversized advance just exits the loop — total on adversarial bytes
    var cur = 12L
    while (cur + 8 <= b.length && (dataSize < 0 || channels < 0)) {
      val i = cur.toInt // cur + 8 <= b.length <= Int.MaxValue, so exact
      val size = le32(b, i + 4)
      if (b(i) == 'f' && b(i + 1) == 'm' && b(i + 2) == 't' && b(i + 3) == ' ') {
        if (i + 8 + 16 > b.length) return None
        channels = le16(b, i + 10)
        rate = le32(b, i + 12).toInt
        byteRate = le32(b, i + 16).toInt
        bits = le16(b, i + 22)
      } else if (b(i) == 'd' && b(i + 1) == 'a' &&
                 b(i + 2) == 't' && b(i + 3) == 'a') {
        dataSize = size
      }
      cur += 8L + size + (size & 1L) // chunks are word-aligned
    }
    if (channels < 1 || rate < 1 || bits < 1 || byteRate < 1 || dataSize < 0) None
    else Some((channels, rate, bits, dataSize * 1000L / byteRate))
  }

  private def le16(b: Array[Byte], i: Int): Int =
    (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8)

  private def le32(b: Array[Byte], i: Int): Long =
    (b(i) & 0xffL) | ((b(i + 1) & 0xffL) << 8) |
      ((b(i + 2) & 0xffL) << 16) | ((b(i + 3) & 0xffL) << 24)

  /** (media_id, channels, sample_rate, bits, duration_ms) from a binary
    * `payload` column. Same narrow `mapPartitions` shape and per-partition
    * decoder-init slot as [[ImageMeta.imageMeta]].
    */
  def audioMeta(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, bytes) =>
          parse(bytes) match {
            case Some((c, r, bi, d)) => (id, Option(c), Option(r), Option(bi), Option(d))
            case None                => (id, None, None, None, None)
          }
        }
      }
      .toDF("media_id", "channels", "sample_rate", "bits", "duration_ms")
  }

  // --------------------------------------------------------- synthesis
  /** Little-endian byte columns (RIFF is little-endian). */
  private def le16Col(c: Column): Column = {
    val hx = lpad(hex(c), 4, "0")
    unhex(concat(substring(hx, 3, 2), substring(hx, 1, 2)))
  }
  private def le32Col(c: Column): Column = {
    val hx = lpad(hex(c), 8, "0")
    unhex(concat(substring(hx, 7, 2), substring(hx, 5, 2),
      substring(hx, 3, 2), substring(hx, 1, 2)))
  }

  /** A minimal REAL WAV header: RIFF/WAVE + canonical 16-byte fmt chunk +
    * an empty-bodied data chunk declaring `nSamples` frames (fixture-grade,
    * like [[ImageMeta.pngBytes]] — header only, no sample data). A LIST
    * chunk sits between fmt and data so parsers must walk chunks, not read
    * fixed offsets.
    */
  def wavBytes(channels: Column, sampleRate: Column, bits: Column,
               nSamples: Column): Column = {
    // Column./ is double division; values are exact small ints, so the
    // cast back to int is lossless
    val blockAlign = (channels * bits / lit(8)).cast("int")
    val byteRate = (sampleRate * blockAlign).cast("int")
    val dataSize = (nSamples * blockAlign).cast("int")
    concat(
      lit("RIFF".getBytes("US-ASCII")), le32Col(dataSize + lit(50)),
      lit("WAVE".getBytes("US-ASCII")),
      lit("fmt ".getBytes("US-ASCII")), le32Col(lit(16)),
      le16Col(lit(1)), le16Col(channels), le32Col(sampleRate),
      le32Col(byteRate), le16Col(blockAlign), le16Col(bits),
      lit("LIST".getBytes("US-ASCII")), le32Col(lit(6)),
      lit("INFOis".getBytes("US-ASCII")),
      lit("data".getBytes("US-ASCII")), le32Col(dataSize))
  }

  // ---------------------------------------------------------------- q76
  /** q76: synthesize REAL WAV headers with per-doc parameters, recover
    * them by PARSING THE BYTES — the oracle derives the expectation from
    * doc_id directly, so a hash match proves the little-endian chunk-walk
    * round trip (q63's pattern, opposite byte order).
    */
  val q76 = QuerySpec(
    "q76_audio_meta",
    (s, d) => {
      val channels = (col("doc_id") % 2 + 1).cast("int")
      val rate = when(col("doc_id") % 4 === 0, 8000)
        .when(col("doc_id") % 4 === 1, 16000)
        .when(col("doc_id") % 4 === 2, 44100)
        .otherwise(48000).cast("int")
      val bits = ((col("doc_id") % 3 + 1) * 8).cast("int")
      val nSamples = (col("doc_id") % 5000 + 1).cast("int")
      audioMeta(
          Tables.documents(s, d)
            .select(col("doc_id").as("media_id"),
              wavBytes(channels, rate, bits, nSamples).as("payload")))
        .orderBy("media_id")
    },
    Some("""WITH p AS (
              SELECT doc_id AS media_id,
                CAST(doc_id % 2 + 1 AS INTEGER) AS channels,
                CAST(CASE WHEN doc_id % 4 = 0 THEN 8000
                          WHEN doc_id % 4 = 1 THEN 16000
                          WHEN doc_id % 4 = 2 THEN 44100
                          ELSE 48000 END AS INTEGER) AS sample_rate,
                CAST((doc_id % 3 + 1) * 8 AS INTEGER) AS bits,
                doc_id % 5000 + 1 AS n_samples
              FROM documents)
            SELECT media_id, channels, sample_rate, bits,
              CAST(FLOOR(CAST(n_samples * 1000 AS DOUBLE) / sample_rate) AS BIGINT)
                AS duration_ms
            FROM p ORDER BY media_id""")
  )

  val all: Seq[QuerySpec] = Seq(q76)
}
