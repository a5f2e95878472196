package graft.llmops

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class ImageMetaSpec extends SparkTestBase {

  private def hex(s: String): Array[Byte] =
    s.replaceAll("\\s", "").sliding(2, 2).map(Integer.parseInt(_, 16).toByte).toArray

  // A hand-assembled 3x2 PNG header (signature + IHDR only)
  private val png3x2 = hex(
    "89504E470D0A1A0A" + "0000000D" + "49484452" +
      "00000003" + "00000002" + "0802000000" + "00000000")

  // SOI + APP0(JFIF) + COM + SOF0 height=2 width=3 + EOI
  private val jpeg3x2 = hex(
    "FFD8" + "FFE0 0010 4A46494600 0101 00 0001 0001 0000" +
      "FFFE0004 6769" +
      "FFC0 0011 08 0002 0003 03 012200 021101 031101" +
      "FFD9")

  test("parse: PNG IHDR dimensions at fixed offsets") {
    assert(ImageMeta.parse(png3x2).contains(("png", 3, 2)))
  }

  test("parse: JPEG walks segments (APP0 + COM) to SOF0") {
    assert(ImageMeta.parse(jpeg3x2).contains(("jpeg", 3, 2)))
  }

  test("parse: progressive JPEG (SOF2) and FF fill bytes") {
    // SOI + fill-padded DQT-like segment + SOF2
    val b = hex("FFD8" + "FFFF" + "FFDB0004 0000" +
      "FFC2 0011 08 0100 0180 03 012200 021101 031101" + "FFD9")
    assert(ImageMeta.parse(b).contains(("jpeg", 384, 256)))
  }

  test("parse: total on garbage — truncated, corrupt, null, zero-dim") {
    assert(ImageMeta.parse(null).isEmpty)
    assert(ImageMeta.parse(Array.empty[Byte]).isEmpty)
    assert(ImageMeta.parse("not an image".getBytes).isEmpty)
    // every prefix must classify, not crash; prefixes that still contain
    // the full header legitimately parse (PNG: 24 bytes through IHDR
    // height; JPEG here: 35 bytes through the SOF0 width field)
    (0 until png3x2.length).foreach { n =>
      val r = ImageMeta.parse(png3x2.take(n))
      assert(if (n < 24) r.isEmpty else r.contains(("png", 3, 2)))
    }
    (0 until jpeg3x2.length).foreach { n =>
      val r = ImageMeta.parse(jpeg3x2.take(n))
      assert(if (n < 35) r.isEmpty else r.contains(("jpeg", 3, 2)))
    }
    // PNG with zero width
    val zw = png3x2.clone(); zw(16) = 0; zw(17) = 0; zw(18) = 0; zw(19) = 0
    assert(ImageMeta.parse(zw).isEmpty)
    // JPEG that hits start-of-scan before any SOF
    assert(ImageMeta.parse(hex("FFD8 FFDA0002 00")).isEmpty)
  }

  test("property: parse is total on arbitrary bytes — random, mutated-PNG, mutated-JPEG") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    def samples[T](g: Gen[T], n: Int): Seq[T] =
      (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(7L + i)))
    // pure noise of every length 0..64
    val noise = Gen.choose(0, 64).flatMap(n => Gen.listOfN(n, Gen.choose(-128, 127).map(_.toByte)))
    samples(noise, 300).foreach(b => ImageMeta.parse(b.toArray)) // must not throw
    // single-byte mutations of VALID headers: worst case for offset logic
    val basePng = png3x2
    val baseJpeg = jpeg3x2
    val mut = for {
      useJpeg <- Gen.oneOf(true, false)
      base = if (useJpeg) baseJpeg else basePng
      i <- Gen.choose(0, base.length - 1)
      v <- Gen.choose(-128, 127).map(_.toByte)
    } yield { val c = base.clone(); c(i) = v; c }
    samples(mut, 400).foreach { b =>
      ImageMeta.parse(b) match {
        case Some((f, w, h)) => // a surviving parse must still be sane
          assert((f == "png" || f == "jpeg") && w >= 1 && h >= 1)
        case None => // rejection is always fine
      }
    }
  }

  test("synth -> parse round trip distributes over a DataFrame") {
    import spark.implicits._
    val ids = (0L until 64L).toDF("media_id")
    val w = (col("media_id") % 1920 + 1).cast("int")
    val h = (col("media_id") % 1080 + 1).cast("int")
    val payload = when(col("media_id") % 2 === 0, ImageMeta.pngBytes(w, h))
      .otherwise(ImageMeta.jpegBytes(w, h))
    val out = ImageMeta.imageMeta(ids.select(col("media_id"), payload.as("payload")))
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getInt(2), r.getInt(3))).toMap

    (0L until 64L).foreach { id =>
      val (f, ww, hh) = out(id)
      assert(f == (if (id % 2 == 0) "png" else "jpeg"))
      assert(ww == (id % 1920 + 1).toInt && hh == (id % 1080 + 1).toInt)
    }
  }

  test("imageMeta: undecodable rows yield null metadata, not failure") {
    import spark.implicits._
    val rows = Seq((1L, png3x2), (2L, "junk".getBytes), (3L, null.asInstanceOf[Array[Byte]]))
    val out = ImageMeta.imageMeta(rows.toDF("media_id", "payload"))
      .orderBy("media_id").collect()
    assert(out.length == 3)
    assert(out(0).getString(1) == "png" && out(0).getInt(2) == 3)
    assert(out(1).isNullAt(1) && out(2).isNullAt(1))
  }

  test("synthPng -> pngPixelStats recovers hand-computed channel sums (q249 round trip)") {
    import spark.implicits._
    // media_id 10, 2x1: pixel rule gives (r,g,b) = (10,20,70) at x=0 and
    // (11,25,81) at x=1 → sums (21,45,151). A real decode must walk the
    // inflated IDAT raster to produce these — header echoing cannot.
    val src = Seq((10L, 2, 1), (3L, 1, 3)).toDF("media_id", "w", "h")
    val out = ImageMeta.pngPixelStats(ImageMeta.synthPng(src))
      .orderBy("media_id").collect()
    // media_id 3, 1x3: r = (3 + 83y) % 256 for y=0..2 → 3+86+169 = 258;
    // g = (6 + 31y) → 6+37+68 = 111; b = (21 + 3y) → 21+24+27 = 72
    assert(out(0).getLong(0) == 3L && out(0).getInt(1) == 1 && out(0).getInt(2) == 3)
    assert((out(0).getLong(4), out(0).getLong(5), out(0).getLong(6)) == ((258L, 111L, 72L)))
    assert(out(1).getLong(0) == 10L && out(1).getInt(1) == 2 && out(1).getInt(2) == 1)
    assert(out(1).getLong(3) == 2L)
    assert((out(1).getLong(4), out(1).getLong(5), out(1).getLong(6)) == ((21L, 45L, 151L)))
    // the synthesized payload is a complete PNG (signature + IHDR parse)
    val bytes = ImageMeta.synthPng(Seq((10L, 2, 1)).toDF("media_id", "w", "h"))
      .collect()(0).getAs[Array[Byte]]("payload")
    assert(ImageMeta.parse(bytes).contains(("png", 2, 1)))
  }

  test("pngPixelStats: corrupt or non-PNG payloads yield null stats, not failure") {
    import spark.implicits._
    val good = ImageMeta.synthPng(Seq((1L, 2, 2)).toDF("media_id", "w", "h"))
      .collect()(0).getAs[Array[Byte]]("payload")
    // truncate mid-IDAT: valid signature + IHDR, broken stream — ImageIO
    // must not crash the task
    val rows = Seq((1L, good), (2L, good.take(40)), (3L, "junk".getBytes),
      (4L, null.asInstanceOf[Array[Byte]]))
    val out = ImageMeta.pngPixelStats(rows.toDF("media_id", "payload"))
      .orderBy("media_id").collect()
    assert(out(0).getInt(1) == 2 && out(0).getLong(3) == 4L)
    assert(out(1).isNullAt(1), "truncated IDAT must fold to nulls")
    assert(out(2).isNullAt(1) && out(3).isNullAt(1))
  }
}
