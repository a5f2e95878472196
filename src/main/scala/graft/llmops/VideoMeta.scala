package graft.llmops

import graft.{QuerySpec, Tables}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** REAL video-container metadata decode — the video member of the
  * multimodal trio ([[ImageMeta]] PNG/JPEG, [[AudioMeta]] WAV/RIFF):
  * MP4 / ISO-BMFF (ISO 14496-12) carries brand, movie timescale,
  * duration, and track count in plain BIG-endian box headers, no codec
  * tables needed. Frame DECODE (H.264 etc.) genuinely needs codecs and
  * stays behind [[Multimodal.decodeStub]]; the container walk is the real,
  * testable part — the same split the reference's format writers draw
  * between container framing and payload bytes.
  *
  * Box layout: `size(BE32) type(4) payload[size-8]`, `size == 1` → 64-bit
  * largesize follows the type, `size == 0` → box extends to EOF. `ftyp`
  * holds the major brand; `moov` is a container whose `mvhd` child holds
  * version(1): v0 → ctime(4) mtime(4) timescale(4) duration(4), v1 →
  * ctime(8) mtime(8) timescale(4) duration(8); each `trak` child is one
  * track. duration_ms = duration·1000/timescale (integer).
  */
object VideoMeta {

  /** (brand, timescale, duration_ms, n_tracks) or None when the payload is
    * not parseable ISO-BMFF. TOTAL on truncated/adversarial bytes: the
    * cursor is Long (an adversarial 64-bit largesize exits the loop instead
    * of wrapping), every field read is bounds-checked, and a child size
    * below its own header length aborts instead of looping.
    */
  def parse(b: Array[Byte]): Option[(String, Long, Long, Int)] = {
    if (b == null || b.length < 16) return None
    var brand: String = null
    var timescale = -1L
    var duration = -1L
    var tracks = 0
    var sawMoov = false
    var cur = 0L
    while (cur + 8 <= b.length) {
      val i = cur.toInt
      var size: Long = be32(b, i)
      var hdr = 8L
      if (size == 1) {
        if (cur + 16 > b.length) return None
        size = be64(b, i + 8); hdr = 16L
      } else if (size == 0) size = b.length - cur
      // a box must fit its container (ISO 14496-12): a declared size past
      // EOF is a truncated/corrupt file, not a shorter box
      if (size < hdr || cur + size > b.length || cur + size < cur) return None
      if (isType(b, i + 4, "ftyp")) {
        if (cur + hdr + 4 > b.length) return None
        brand = new String(b, (cur + hdr).toInt, 4, "US-ASCII")
      } else if (isType(b, i + 4, "moov")) {
        sawMoov = true
        var c = cur + hdr
        val end = math.min(cur + size, b.length.toLong)
        while (c + 8 <= end) {
          val j = c.toInt
          var s2: Long = be32(b, j)
          var h2 = 8L
          if (s2 == 1) {
            if (c + 16 > end) return None
            s2 = be64(b, j + 8); h2 = 16L
          } else if (s2 == 0) s2 = end - c
          if (s2 < h2 || c + s2 > end || c + s2 < c) return None
          if (isType(b, j + 4, "mvhd")) {
            if (c + h2 + 4 > end) return None
            val v = b((c + h2).toInt) & 0xff
            if (v == 0) {
              if (c + h2 + 20 > end) return None
              timescale = be32(b, (c + h2 + 12).toInt)
              duration = be32(b, (c + h2 + 16).toInt)
            } else {
              if (c + h2 + 28 > end) return None
              timescale = be32(b, (c + h2 + 20).toInt)
              duration = be64(b, (c + h2 + 24).toInt)
            }
          } else if (isType(b, j + 4, "trak")) tracks += 1
          c += s2
        }
      }
      cur += size
    }
    if (brand == null || !sawMoov || timescale < 1 || duration < 0) None
    else Some((brand, timescale, duration * 1000L / timescale, tracks))
  }

  private def isType(b: Array[Byte], i: Int, t: String): Boolean =
    b(i) == t.charAt(0) && b(i + 1) == t.charAt(1) &&
      b(i + 2) == t.charAt(2) && b(i + 3) == t.charAt(3)

  private def be32(b: Array[Byte], i: Int): Long =
    ((b(i) & 0xffL) << 24) | ((b(i + 1) & 0xffL) << 16) |
      ((b(i + 2) & 0xffL) << 8) | (b(i + 3) & 0xffL)

  private def be64(b: Array[Byte], i: Int): Long =
    (be32(b, i) << 32) | be32(b, i + 4)

  /** (media_id, brand, timescale, duration_ms, n_tracks) from a binary
    * `payload` column — same narrow `mapPartitions` shape as
    * [[ImageMeta.imageMeta]] / [[AudioMeta.audioMeta]].
    */
  def videoMeta(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, bytes) =>
          parse(bytes) match {
            case Some((br, ts, d, tr)) =>
              (id, Option(br), Option(ts), Option(d), Option(tr))
            case None => (id, None, None, None, None)
          }
        }
      }
      .toDF("media_id", "brand", "timescale", "duration_ms", "n_tracks")
  }

  // --------------------------------------------------------- synthesis
  /** Big-endian byte columns — ISO-BMFF is big-endian, so hex order IS
    * byte order (no swap, unlike [[AudioMeta.le32Col]]).
    */
  private def be32Col(c: Column): Column = unhex(lpad(hex(c), 8, "0"))
  private def be64Col(c: Column): Column = unhex(lpad(hex(c), 16, "0"))

  private def box(tpe: String, payload: Column*): Column = {
    // zero-arg concat() types as STRING and would coerce the whole
    // byte-assembly to string; an explicit empty binary keeps it BINARY
    val body =
      if (payload.isEmpty) lit(Array.empty[Byte]) else concat(payload: _*)
    concat(be32Col(length(body) + lit(8)), lit(tpe.getBytes("US-ASCII")), body)
  }

  /** A minimal REAL MP4 skeleton: `ftyp` with the given brand, `moov`
    * containing an mvhd (v0 or v1 per the `v1` flag — both code paths get
    * fixture coverage) and `nTracks` empty `trak` boxes. Fixture-grade
    * like [[AudioMeta.wavBytes]]: header structure only, no media data.
    */
  def mp4Bytes(brand: Column, timescale: Column, durationUnits: Column,
               nTracks: Column, v1: Column): Column = {
    val zeros80 = lit(Array.fill[Byte](80)(0))
    val mvhd0 = box("mvhd",
      be32Col(lit(0)), // version 0 + flags
      be32Col(lit(0)), be32Col(lit(0)), // ctime, mtime
      be32Col(timescale), be32Col(durationUnits), zeros80)
    val mvhd1 = box("mvhd",
      be32Col(lit(0x01000000)), // version 1 + flags
      be64Col(lit(0)), be64Col(lit(0)), // ctime, mtime (64-bit)
      be32Col(timescale), be64Col(durationUnits), zeros80)
    val trak = box("trak")
    val traks = when(nTracks === 1, trak)
      .when(nTracks === 2, concat(trak, trak))
      .otherwise(concat(trak, trak, trak))
    concat(
      box("ftyp", brand.cast("binary"), be32Col(lit(0))),
      box("moov", when(v1, mvhd1).otherwise(mvhd0), traks))
  }

  // ---------------------------------------------------------------- q97
  /** q97: synthesize REAL MP4 box structures with per-doc parameters
    * (alternating mvhd v0/v1, 1–3 tracks, four timescales), recover them
    * by PARSING THE BYTES; the oracle derives the expectation from doc_id
    * directly, so a hash match proves the big-endian box-walk round trip —
    * q63/q76's pattern for the third modality.
    */
  val q97 = QuerySpec(
    "q97_video_meta",
    (s, d) => {
      val brand = when(col("doc_id") % 2 === 0, "isom").otherwise("mp42")
      val timescale = when(col("doc_id") % 4 === 0, 600)
        .when(col("doc_id") % 4 === 1, 1000)
        .when(col("doc_id") % 4 === 2, 90000)
        .otherwise(48000).cast("int")
      val durationUnits = (col("doc_id") % 100000 + 1).cast("int")
      val nTracks = (col("doc_id") % 3 + 1).cast("int")
      videoMeta(
          Tables.documents(s, d)
            .select(col("doc_id").as("media_id"),
              mp4Bytes(brand, timescale, durationUnits, nTracks,
                col("doc_id") % 2 === 1).as("payload")))
        .orderBy("media_id")
    },
    Some("""WITH p AS (
              SELECT doc_id AS media_id,
                CASE WHEN doc_id % 2 = 0 THEN 'isom' ELSE 'mp42' END AS brand,
                CAST(CASE WHEN doc_id % 4 = 0 THEN 600
                          WHEN doc_id % 4 = 1 THEN 1000
                          WHEN doc_id % 4 = 2 THEN 90000
                          ELSE 48000 END AS BIGINT) AS timescale,
                doc_id % 100000 + 1 AS duration_units,
                CAST(doc_id % 3 + 1 AS INTEGER) AS n_tracks
              FROM documents)
            SELECT media_id, brand, timescale,
              duration_units * 1000 // timescale AS duration_ms, n_tracks
            FROM p ORDER BY media_id""")
  )

  val all: Seq[QuerySpec] = Seq(q97)
}
