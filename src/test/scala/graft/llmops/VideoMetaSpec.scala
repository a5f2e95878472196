package graft.llmops

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class VideoMetaSpec extends SparkTestBase {

  private def hex(s: String): Array[Byte] =
    s.replaceAll("\\s", "").sliding(2, 2).map(Integer.parseInt(_, 16).toByte).toArray

  // Hand-assembled minimal MP4: ftyp(isom) + moov[mvhd v0 (timescale 1000,
  // duration 2500) + 2 traks]. Big-endian throughout.
  private val mp4v0 = hex(
    "00000010" + "66747970" + "69736F6D" + "00000000" +  // ftyp isom
      "00000084" + "6D6F6F76" +                          // moov size 8+108+16
      "0000006C" + "6D766864" + "00000000" +             // mvhd v0
      "00000000" + "00000000" +                          // ctime mtime
      "000003E8" + "000009C4" +                          // timescale 1000, dur 2500
      ("00" * 80) +                                      // rate..next_track_id
      "00000008" + "7472616B" +                          // trak
      "00000008" + "7472616B")                           // trak

  test("parse: canonical v0 box walk — brand, timescale, integer ms, track count") {
    assert(VideoMeta.parse(mp4v0).contains(("isom", 1000L, 2500L, 2)))
  }

  test("parse: mvhd v1 (64-bit times) and largesize boxes") {
    val v1 = hex(
      "00000010" + "66747970" + "6D703432" + "00000000" + // ftyp mp42
        "00000088" + "6D6F6F76" +                         // moov 8+120+8
        "00000078" + "6D766864" + "01000000" +            // mvhd v1
        "0000000000000000" + "0000000000000000" +         // ctime mtime (64)
        "00015F90" + "0000000000015F90" +                 // ts 90000, dur 90000
        ("00" * 80) +
        "00000008" + "7472616B")
    assert(VideoMeta.parse(v1).contains(("mp42", 90000L, 1000L, 1)))
    // top-level largesize: size=1 marker + 64-bit size on the ftyp box
    val large = hex(
      "00000001" + "66747970" + "0000000000000018" + "69736F6D" + "00000000") ++
      mp4v0.drop(16)
    assert(VideoMeta.parse(large).contains(("isom", 1000L, 2500L, 2)))
  }

  test("parse: total on garbage — truncated, corrupt, null, adversarial sizes") {
    assert(VideoMeta.parse(null).isEmpty)
    assert(VideoMeta.parse(Array.empty[Byte]).isEmpty)
    assert(VideoMeta.parse("ftyp but not really an mp4 file....".getBytes).isEmpty)
    (0 until mp4v0.length).foreach { n =>
      val r = VideoMeta.parse(mp4v0.take(n))
      assert(r.isEmpty || n == mp4v0.length)
    }
    // a child box declaring less than its own header must abort, not loop
    val badChild = hex(
      "00000010" + "66747970" + "69736F6D" + "00000000" +
        "00000010" + "6D6F6F76" + "00000002" + "7472616B")
    assert(VideoMeta.parse(badChild).isEmpty)
    // adversarial 64-bit largesize (would overflow an Int cursor)
    val huge = hex(
      "00000010" + "66747970" + "69736F6D" + "00000000" +
        "00000001" + "6D646174" + "7FFFFFFFFFFFFFF0")
    assert(VideoMeta.parse(huge ++ Array.fill(32)(0.toByte)).isEmpty)
  }

  test("property: parse is total on arbitrary and mutated-MP4 bytes") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    def samples[T](g: Gen[T], n: Int): Seq[T] =
      (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(23L + i)))
    val noise = Gen.choose(0, 64).flatMap(n => Gen.listOfN(n, Gen.choose(-128, 127).map(_.toByte)))
    samples(noise, 300).foreach(b => VideoMeta.parse(b.toArray)) // must not throw
    val mut = for {
      i <- Gen.choose(0, mp4v0.length - 1)
      v <- Gen.choose(-128, 127).map(_.toByte)
    } yield { val c = mp4v0.clone(); c(i) = v; c }
    samples(mut, 400).foreach { b =>
      VideoMeta.parse(b) match {
        case Some((br, ts, d, tr)) =>
          assert(br.length == 4 && ts >= 1 && d >= 0 && tr >= 0)
        case None =>
      }
    }
  }

  test("synth -> parse round trip distributes over a DataFrame, both mvhd versions") {
    import spark.implicits._
    val ids = (0L until 48L).toDF("media_id")
    val brand = when(col("media_id") % 2 === 0, "isom").otherwise("mp42")
    val timescale = when(col("media_id") % 4 === 0, 600)
      .when(col("media_id") % 4 === 1, 1000)
      .when(col("media_id") % 4 === 2, 90000)
      .otherwise(48000).cast("int")
    val durationUnits = (col("media_id") % 100000 + 1).cast("int")
    val nTracks = (col("media_id") % 3 + 1).cast("int")
    val out = VideoMeta.videoMeta(
        ids.select(col("media_id"),
          VideoMeta.mp4Bytes(brand, timescale, durationUnits, nTracks,
            col("media_id") % 2 === 1).as("payload")))
      .collect()
      .map(r => r.getLong(0) ->
        ((r.getString(1), r.getLong(2), r.getLong(3), r.getInt(4)))).toMap
    (0L until 48L).foreach { id =>
      val expBrand = if (id % 2 == 0) "isom" else "mp42"
      val expTs = Seq(600, 1000, 90000, 48000)((id % 4).toInt).toLong
      val expDur = (id % 100000 + 1) * 1000L / expTs
      assert(out(id) == ((expBrand, expTs, expDur, (id % 3).toInt + 1)),
        s"id $id: ${out(id)}")
    }
  }
}
