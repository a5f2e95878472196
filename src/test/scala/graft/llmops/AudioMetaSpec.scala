package graft.llmops

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class AudioMetaSpec extends SparkTestBase {

  private def hex(s: String): Array[Byte] =
    s.replaceAll("\\s", "").sliding(2, 2).map(Integer.parseInt(_, 16).toByte).toArray

  // Hand-assembled canonical WAV header: PCM, 2ch, 44100 Hz, 16-bit,
  // data size 176400 (= exactly 1000 ms). Little-endian throughout.
  private val wav2ch = hex(
    "52494646" + "94B10200" + "57415645" + // RIFF <size> WAVE
      "666D7420" + "10000000" +             // "fmt " 16
      "0100" + "0200" + "44AC0000" +        // PCM, 2ch, 44100
      "10B10200" + "0400" + "1000" +        // byteRate 176400, align 4, 16-bit
      "64617461" + "90B10200")              // "data" 176400

  test("parse: canonical header fields and exact duration") {
    assert(AudioMeta.parse(wav2ch).contains((2, 44100, 16, 1000L)))
  }

  test("parse: chunk walk skips a LIST chunk between fmt and data") {
    val withList = hex(
      "52494646" + "00000000" + "57415645" +
        "666D7420" + "10000000" +
        "0100" + "0100" + "803E0000" + "007D0000" + "0200" + "1000" +
        "4C495354" + "06000000" + "494E464F6973" + // LIST(6) INFOis
        "64617461" + "007D0000")                   // data 32000 = 1000ms
    assert(AudioMeta.parse(withList).contains((1, 16000, 16, 1000L)))
  }

  test("parse: total on garbage — truncated, corrupt, null") {
    assert(AudioMeta.parse(null).isEmpty)
    assert(AudioMeta.parse(Array.empty[Byte]).isEmpty)
    assert(AudioMeta.parse("RIFF but not really a wave file....".getBytes).isEmpty)
    (0 until wav2ch.length).foreach { n =>
      val r = AudioMeta.parse(wav2ch.take(n))
      // the full fixture is exactly the header; any truncation loses a
      // required field (44 bytes is the minimum before the data decl)
      assert(if (n < wav2ch.length) r.isEmpty else r.contains((2, 44100, 16, 1000L)))
    }
  }

  test("parse: total on a declared chunk size near Int.MaxValue (cursor overflow)") {
    // A chunk declaring ~2^31-16 bytes wrapped the old Int cursor negative
    // (i += 8 + size) and indexed b(i) out of bounds; the Long cursor just
    // walks past the end and returns None. Size field 0x7FFFFFF0 LE.
    val huge = hex(
      "52494646" + "00000000" + "57415645" +
        "4A554E4B" + "F0FFFF7F")      // "JUNK" chunk, size 0x7FFFFFF0
    assert(AudioMeta.parse(huge ++ Array.fill(64)(0.toByte)).isEmpty)
    // unsigned-range size (bit 31 set) must also be total
    val unsigned = hex(
      "52494646" + "00000000" + "57415645" +
        "4A554E4B" + "F0FFFFFF")      // size 0xFFFFFFF0
    assert(AudioMeta.parse(unsigned ++ Array.fill(64)(0.toByte)).isEmpty)
    // fmt parsed first, then the oversized chunk: still None (no data), no throw
    val fmtThenHuge = hex(
      "52494646" + "00000000" + "57415645" +
        "666D7420" + "10000000" +
        "0100" + "0100" + "803E0000" + "007D0000" + "0200" + "1000" +
        "4A554E4B" + "F0FFFF7F")
    assert(AudioMeta.parse(fmtThenHuge ++ Array.fill(64)(0.toByte)).isEmpty)
  }

  test("property: parse is total on arbitrary and mutated-WAV bytes") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    def samples[T](g: Gen[T], n: Int): Seq[T] =
      (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(11L + i)))
    val noise = Gen.choose(0, 64).flatMap(n => Gen.listOfN(n, Gen.choose(-128, 127).map(_.toByte)))
    samples(noise, 300).foreach(b => AudioMeta.parse(b.toArray)) // must not throw
    val mut = for {
      i <- Gen.choose(0, wav2ch.length - 1)
      v <- Gen.choose(-128, 127).map(_.toByte)
    } yield { val c = wav2ch.clone(); c(i) = v; c }
    samples(mut, 400).foreach { b =>
      AudioMeta.parse(b) match {
        case Some((c, r, bi, d)) =>
          assert(c >= 1 && r >= 1 && bi >= 1 && d >= 0)
        case None =>
      }
    }
  }

  test("synth -> parse round trip distributes over a DataFrame") {
    import spark.implicits._
    val ids = (0L until 48L).toDF("media_id")
    val channels = (col("media_id") % 2 + 1).cast("int")
    val rate = when(col("media_id") % 4 === 0, 8000)
      .when(col("media_id") % 4 === 1, 16000)
      .when(col("media_id") % 4 === 2, 44100)
      .otherwise(48000).cast("int")
    val bits = ((col("media_id") % 3 + 1) * 8).cast("int")
    val nSamples = (col("media_id") % 5000 + 1).cast("int")
    val out = AudioMeta.audioMeta(
        ids.select(col("media_id"),
          AudioMeta.wavBytes(channels, rate, bits, nSamples).as("payload")))
      .collect()
      .map(r => r.getLong(0) -> ((r.getInt(1), r.getInt(2), r.getInt(3), r.getLong(4)))).toMap
    (0L until 48L).foreach { id =>
      val expRate = Seq(8000, 16000, 44100, 48000)((id % 4).toInt)
      val expSamples = id % 5000 + 1
      assert(out(id) == (((id % 2).toInt + 1, expRate, ((id % 3).toInt + 1) * 8,
        expSamples * 1000L / expRate)))
    }
  }

  test("audioMeta: undecodable rows yield null metadata, not failure") {
    import spark.implicits._
    val rows = Seq((1L, wav2ch), (2L, "junk".getBytes), (3L, null.asInstanceOf[Array[Byte]]))
    val out = AudioMeta.audioMeta(rows.toDF("media_id", "payload"))
      .orderBy("media_id").collect()
    assert(out.length == 3)
    assert(out(0).getInt(1) == 2 && out(0).getLong(4) == 1000L)
    assert(out(1).isNullAt(1) && out(2).isNullAt(1))
  }

  test("synthWav -> pcmStats recovers hand-computed per-channel stats (q250 round trip)") {
    import spark.implicits._
    // media 10, 2ch x 3 frames: sample rule (3*10 + 5*ch + 7*i) % 4001 - 2000
    //   ch0: -1970, -1963, -1956 -> sum -5889; ch1: -1965, -1958, -1951 -> sum -5874
    // media 3, 1ch x 2 frames: (9 + 7*i) - 2000 -> -1991, -1984 -> sum -3975
    // All samples NEGATIVE: a signed-LE16 sign-extension bug flips every one.
    val src = Seq((10L, 2, 3), (3L, 1, 2)).toDF("media_id", "channels", "n")
    val out = AudioMeta.pcmStats(AudioMeta.synthWav(src))
      .orderBy("media_id", "channel").collect()
    assert(out.length == 3)
    assert((out(0).getLong(0), out(0).getInt(1), out(0).getLong(2), out(0).getLong(3),
      out(0).getLong(4), out(0).getLong(5)) == ((3L, 0, 2L, -3975L, -1991L, -1984L)))
    assert((out(1).getLong(0), out(1).getInt(1), out(1).getLong(2), out(1).getLong(3),
      out(1).getLong(4), out(1).getLong(5)) == ((10L, 0, 3L, -5889L, -1970L, -1956L)))
    assert((out(2).getLong(0), out(2).getInt(1), out(2).getLong(2), out(2).getLong(3),
      out(2).getLong(4), out(2).getLong(5)) == ((10L, 1, 3L, -5874L, -1965L, -1951L)))
    // the synthesized payload is a complete WAV the header parser accepts
    // (2ch 16-bit @8kHz, 12 data bytes -> duration floors to 0 ms)
    val bytes = AudioMeta.synthWav(Seq((10L, 2, 3)).toDF("media_id", "channels", "n"))
      .collect()(0).getAs[Array[Byte]]("payload")
    assert(AudioMeta.parse(bytes).contains((2, 8000, 16, 0L)))
  }

  test("fmt chunk declaring size < 16 folds to None instead of misdecoding the next chunk's bytes") {
    // round-13 ADVICE: the fixed-offset fmt field reads (i+8..i+23) are
    // only the fmt chunk's own bytes when it DECLARES >= 16 of them. This
    // payload is crafted so the PRE-FIX walk decoded it "successfully":
    // fmt declares 4 bytes (fmtCode=1, channels=1), the walk then lands on
    // a real data chunk at offset 24, and the bits field read at i+22=34
    // hits data-payload sample #1 (0x0010 = 16) — every gate passed and
    // decodePcm returned 6 plausible frames from a malformed file (parse()
    // likewise returned a header tuple). Both must fold to None.
    val undersizedFmt = hex(
      "52494646" + "24000000" + "57415645" + // RIFF 36 WAVE
        "666D7420" + "04000000" +             // "fmt " declaring only 4 bytes
        "0100" + "0100" +                     // fmtCode=1, channels=1
        "64617461" + "0C000000" +             // "data" 12
        "0500" + "1000" + "0100" + "0200" + "0300" + "0400")
    assert(AudioMeta.parse(undersizedFmt).isEmpty)
    import spark.implicits._
    val out = AudioMeta.pcmStats(Seq((7L, undersizedFmt)).toDF("media_id", "payload"))
      .collect()
    assert(out.length == 1 && out(0).isNullAt(1),
      "undersized fmt declaration must yield the one null row")
    // and the patched-real-WAV variant: a valid synthWav payload whose fmt
    // size field alone is rewritten 16 -> 12 stops decoding
    val good = AudioMeta.synthWav(Seq((1L, 2, 3)).toDF("media_id", "channels", "n"))
      .collect()(0).getAs[Array[Byte]]("payload")
    assert(AudioMeta.parse(good).isDefined)
    val patched = good.clone()
    patched(16) = 12 // fmt size LE32 at offset 16: 16 -> 12
    assert(AudioMeta.parse(patched).isEmpty)
    val out2 = AudioMeta.pcmStats(Seq((8L, patched)).toDF("media_id", "payload"))
      .collect()
    assert(out2.length == 1 && out2(0).isNullAt(1))
  }

  test("synthWav: an Int-overflowing channels x n product fails the loud require, not ByteBuffer math") {
    import spark.implicits._
    // round-13 ADVICE: 2 ch x 1.2e9 frames = 4.8e9 sample bytes overflows
    // Int to a POSITIVE 505 MB — the silent-wrong-RIFF-sizes class, worse
    // than the negative-allocation one. The bound require must fire first.
    val e = intercept[Throwable](
      AudioMeta.synthWav(Seq((1L, 2, 1200000000)).toDF("media_id", "channels", "n"))
        .collect())
    val chain = Iterator.iterate(e)(_.getCause).takeWhile(_ != null)
      .map(t => Option(t.getMessage).getOrElse("")).mkString("|")
    assert(chain.contains("synthWav payload would exceed"), s"got: $chain")
  }

  test("pcmStats: corrupt, truncated, non-PCM16, and empty-data payloads fold to one null row") {
    import spark.implicits._
    val good = AudioMeta.synthWav(Seq((1L, 2, 3)).toDF("media_id", "channels", "n"))
      .collect()(0).getAs[Array[Byte]]("payload")
    // 8-bit header (wavBytes, no sample data): valid WAV, not PCM16-decodable
    val bits8 = AudioMeta.wavBytes(lit(1), lit(8000), lit(8), lit(0))
    val rows = Seq((1L, good), (2L, good.take(60)), (3L, "junk".getBytes),
      (4L, null.asInstanceOf[Array[Byte]]))
    val out = AudioMeta.pcmStats(
        rows.toDF("media_id", "payload")
          .union(Seq(5L).toDF("media_id").select(col("media_id"), bits8.as("payload"))))
      .orderBy("media_id", "channel").collect()
    assert(out.length == 2 + 4, "2 channel rows for the good WAV + 4 null rows")
    assert(!out(0).isNullAt(1) && !out(1).isNullAt(1))
    // truncated data chunk (declared 12 bytes, 2 present) must fold, not index OOB
    assert(out(2).isNullAt(1), "truncated data chunk must fold to nulls")
    assert(out(3).isNullAt(1) && out(4).isNullAt(1))
    assert(out(5).isNullAt(1), "8-bit/empty-data WAV has no PCM16 sample walk")
  }
}
