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
}
