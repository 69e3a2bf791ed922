package graft.operators

import graft.SparkSpec
import Multimodal.MediaRecord

class AviCodecSpec extends SparkSpec {

  private def gray(w: Int, h: Int, seed: Int): Array[Byte] =
    AviCodec.dibFrame(w, h)((x, y) => (seed + x * 7 + y * 13) % 256)

  test("write → parse round trip: raw-DIB frames come back byte-exact") {
    val frames = (0 until 3).map(f => gray(5, 4, f * 17))
    val bytes = AviCodec.write(5, 4, 25, "DIB ", frames)
    assert(AviCodec.isAvi(bytes))
    val avi = AviCodec.parse(bytes)
    assert(avi.width === 5 && avi.height === 4 && avi.bitCount === 24)
    assert(avi.compression === "DIB " && !avi.topDown && avi.fps === 25)
    assert(avi.frames.length === 3)
    avi.frames.zip(frames).foreach { case (a, b) => assert(a.toSeq === b.toSeq) }
  }

  test("odd-width frames survive the word-aligned chunk walk") {
    // 3-px-wide 24-bit rows are 9 bytes padded to 12; frame byte counts
    // stay even here, so ALSO use an odd frame count with a 1×1 frame
    // (3-byte payload, odd chunk size → pad byte exercised)
    val f1 = gray(1, 1, 5)
    assert(f1.length === 4) // 1 px * 3 bytes padded to 4-byte stride
    val odd = Array[Byte](1, 2, 3) // hand-rolled unpadded payload
    val bytes = AviCodec.write(1, 1, 10, "DIB ", Seq(odd, f1, odd))
    val avi = AviCodec.parse(bytes)
    assert(avi.frames.length === 3)
    assert(avi.frames(0).toSeq === odd.toSeq)
    assert(avi.frames(2).toSeq === odd.toSeq)
  }

  test("decode: mean over bands × pixels × frames matches direct computation") {
    val id = 7L
    val bytes = AviCodec.grayAvi(id)
    val dec = AviCodec.open()
    val info = dec.decode(MediaRecord(id, "video", bytes))
    val (w, h, nf) = ((2 + id % 14).toInt, (1 + id % 11).toInt, (1 + id % 5).toInt)
    assert(info.width === w && info.height === h && info.n_frames === nf)
    val graySum = (for { f <- 0 until nf; y <- 0 until h; x <- 0 until w }
      yield (id * 31 + x * 7 + y * 13 + f * 17) % 256).sum
    // all three BGR bands carry the gray value → mean == graySum / (w·h·nf)
    assert(math.abs(info.mean_byte - graySum.toDouble / (w * h * nf)) < 1e-9)
    dec.close()
  }

  test("top-down DIB (negative biHeight) reads rows in natural order") {
    // craft a top-down container by patching the written header's
    // biHeight to its negation; the frame payload is then row 0 first
    val w = 3; val h = 2
    val stride = ((3 * w + 3) / 4) * 4
    val topDownFrame = new Array[Byte](stride * h)
    for (y <- 0 until h; x <- 0 until w; b <- 0 until 3)
      topDownFrame(y * stride + x * 3 + b) = (10 * y + x).toByte
    val bytes = AviCodec.write(w, h, 25, "DIB ", Seq(topDownFrame))
    // strf biHeight sits 12 bytes into the strf body; find it and negate
    val idx = {
      var i = 0; var at = -1
      while (at < 0 && i + 4 <= bytes.length) {
        if (bytes(i) == 's' && bytes(i + 1) == 't' && bytes(i + 2) == 'r' && bytes(i + 3) == 'f') at = i
        i += 1
      }
      at + 8 + 8 // chunk header + biSize + biWidth
    }
    val negH = -h
    bytes(idx) = (negH & 0xFF).toByte
    bytes(idx + 1) = ((negH >> 8) & 0xFF).toByte
    bytes(idx + 2) = ((negH >> 16) & 0xFF).toByte
    bytes(idx + 3) = ((negH >> 24) & 0xFF).toByte
    val avi = AviCodec.parse(bytes)
    assert(avi.topDown && avi.height === h)
    val dec = AviCodec.open()
    val info = dec.decode(MediaRecord(1L, "video", bytes))
    // mean is orientation-invariant; the resize pins orientation: the
    // top-left target pixel of a 1×1 resize is source (0,0) = value 0
    val tiny = dec.resize(MediaRecord(1L, "video", bytes), 1, 1)
    val tinyAvi = AviCodec.parse(tiny.content)
    assert((tinyAvi.frames.head(0) & 0xFF) === 0)
    assert(info.height === h)
    dec.close()
  }

  test("MJPG frames decode through ImageIO; unknown codecs throw with the fourcc") {
    import java.awt.image.BufferedImage
    val img = new BufferedImage(4, 3, BufferedImage.TYPE_3BYTE_BGR)
    for (y <- 0 until 3; x <- 0 until 4; b <- 0 until 3)
      img.getRaster.setSample(x, y, b, 128)
    val baos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpg", baos)
    val bytes = AviCodec.write(4, 3, 25, "MJPG", Seq(baos.toByteArray))
    val dec = AviCodec.open()
    val info = dec.decode(MediaRecord(2L, "video", bytes))
    assert(info.width === 4 && info.height === 3 && info.n_frames === 1)
    // flat-gray JPEG decodes near-losslessly
    assert(math.abs(info.mean_byte - 128.0) < 2.0)

    val h264 = AviCodec.write(4, 3, 25, "H264", Seq(Array[Byte](0, 0, 1)))
    val err = intercept[IllegalArgumentException](dec.decode(MediaRecord(3L, "video", h264)))
    assert(err.getMessage.contains("H264"))
    dec.close()
  }

  test("resize preserves frame count and stays byte-exact for DIB") {
    val id = 12L
    val dec = AviCodec.open()
    val out = dec.resize(MediaRecord(id, "video", AviCodec.grayAvi(id)), 5, 3)
    val avi = AviCodec.parse(out.content)
    assert(avi.width === 5 && avi.height === 3)
    assert(avi.frames.length === (1 + id % 5).toInt)
    val srcW = (2 + id % 14).toInt; val srcH = (1 + id % 11).toInt
    val info = dec.decode(out)
    val expect = (for { f <- 0 until avi.frames.length; y <- 0 until 3; x <- 0 until 5 }
      yield (id * 31 + (x * srcW / 5) * 7 + (y * srcH / 3) * 13 + f * 17) % 256).sum
    assert(math.round(info.mean_byte * 5 * 3 * avi.frames.length) === expect)
    dec.close()
  }

  test("color DIB resize keeps all three BGR bands (no gray collapse)") {
    val (w, h) = (6, 4)
    // distinct per-band values: band b at (x,y) = 40*b + 3*x + 5*y
    val frame = AviCodec.bgrDibFrame(w, h)((x, y, b) => 40 * b + 3 * x + 5 * y)
    val bytes = AviCodec.write(w, h, 25, "DIB ", Seq(frame))
    val dec = AviCodec.open()
    val out = dec.resize(MediaRecord(7L, "video", bytes), 3, 2)
    val avi = AviCodec.parse(out.content)
    assert(avi.width === 3 && avi.height === 2)
    val stride = ((3 * avi.width + 3) / 4) * 4
    for (y <- 0 until 2; x <- 0 until 3; b <- 0 until 3) {
      // nearest-neighbor source sample: floor scaling, same as resize
      val (sx, sy) = (x * w / 3, y * h / 2)
      val row = avi.height - 1 - y
      val got = avi.frames(0)(row * stride + x * 3 + b) & 0xFF
      assert(got === 40 * b + 3 * sx + 5 * sy, s"band $b at ($x,$y)")
    }
  }

  test("two-video-stream AVI: only the first vids stream's chunks are parsed") {
    val f0 = (0 until 2).map(i =>
      AviCodec.dibFrame(4, 3)((x, y) => (10 * i + x + y) % 256))
    val f1 = (0 until 3).map(i =>
      AviCodec.dibFrame(8, 5)((x, y) => (99 + i + x * y) % 256))
    val bytes = AviCodec.writeTwoStream(4, 3, f0, 8, 5, f1)
    val avi = AviCodec.parse(bytes)
    assert(avi.width === 4 && avi.height === 3)
    assert(avi.frames.length === 2, "second stream's frames leaked in")
    avi.frames.zip(f0).foreach { case (got, want) =>
      assert(java.util.Arrays.equals(got, want))
    }
  }

  test("features: 16-bin histogram is L1-normalized over all frames") {
    val dec = AviCodec.open()
    val feat = dec.features(MediaRecord(9L, "video", AviCodec.grayAvi(9L)))
    assert(feat.feature.length === 16)
    assert(math.abs(feat.feature.map(_.toDouble).sum - 1.0) < 1e-5)
    dec.close()
  }

  test("JdkCodec routes RIFF video to AviCodec and non-AVI video to the stand-in") {
    val dec = Multimodal.JdkCodec.open()
    val real = dec.decode(MediaRecord(4L, "video", AviCodec.grayAvi(4L)))
    assert(real.width === (2 + 4 % 14) && real.n_frames === (1 + 4 % 5))
    // UTF-8 text bytes do not sniff as AVI → stand-in semantics
    // (dimensions derived from payload length)
    val fake = dec.decode(MediaRecord(5L, "video", "not a container".getBytes("UTF-8")))
    assert(fake.width > 0 && fake.n_frames === 1)
    dec.close()
  }

  test("frameDedup groups identical frames corpus-wide; container layout is irrelevant") {
    import spark.implicits._
    // ids 1 and 25 are congruent mod 24 → frame-for-frame identical
    // content (nf: 1→2 frames, 25→1 frame, so only frame 0 collides);
    // id 2 shares nothing. doc 99 is doc 1's frames re-wrapped in a
    // FRESH container (different header bytes, same rasters) — it must
    // land in doc 1's classes, proving the key is the decoded raster,
    // not the payload bytes.
    val rewrapped = {
      val a = AviCodec.parse(AviCodec.loopAvi(1L))
      AviCodec.write(a.width, a.height, 99, "DIB ", a.frames)
    }
    val recs = Seq(
      Multimodal.MediaRecord(1L, "video", AviCodec.loopAvi(1L)),
      Multimodal.MediaRecord(25L, "video", AviCodec.loopAvi(25L)),
      Multimodal.MediaRecord(2L, "video", AviCodec.loopAvi(2L)),
      Multimodal.MediaRecord(99L, "video", rewrapped)
    ).toDS()
    val out = AviCodec.frameDedup(recs).collect()
      .map(r => (r.getLong(0), r.getInt(1)) ->
        ((r.getLong(2), r.getLong(3), r.getInt(4)))).toMap
    // doc 1 frame 0: shared with 25's frame 0 and 99's frame 0 → df 3
    assert(out((1L, 0)) === ((3L, 1L, 0)))
    assert(out((25L, 0)) === ((3L, 1L, 0)))
    assert(out((99L, 0)) === ((3L, 1L, 0)))
    // doc 1 frame 1: only 99 duplicates it (25 has a single frame)
    assert(out((1L, 1)) === ((2L, 1L, 1)))
    assert(out((99L, 1)) === ((2L, 1L, 1)))
    // doc 2's frames are unique
    for (f <- 0 until (1 + 2 % 5)) assert(out((2L, f)) === ((1L, 2L, f)))
  }

  test("frameStats: one row per frame, sums match the closed form") {
    import spark.implicits._
    val ids = Seq(1L, 2L, 3L)
    val ds = ids.toDS().map(id => MediaRecord(id, "video", AviCodec.grayAvi(id)))
    val rows = AviCodec.frameStats(ds).collect()
      .map(r => (r.getLong(0), r.getInt(1)) -> r.getLong(4)).toMap
    val expectedRows = ids.map(id => (1 + id % 5).toInt).sum
    assert(rows.size === expectedRows)
    ids.foreach { id =>
      val (w, h) = ((2 + id % 14).toInt, (1 + id % 11).toInt)
      for (f <- 0 until (1 + id % 5).toInt) {
        val graySum = (for { y <- 0 until h; x <- 0 until w }
          yield (id * 31 + x * 7 + y * 13 + f * 17) % 256).sum
        assert(rows((id, f)) === 3 * graySum)
      }
    }
  }
}
