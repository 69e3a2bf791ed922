package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class MultimodalSpec extends SparkSpec {

  private lazy val media =
    Multimodal.mediaFromDocuments(
      spark.read.parquet(sf("sf0.01") + "/documents.parquet")).cache()

  test("media derivation: typed binary payloads with cycling media_type") {
    val types = media.groupBy("media_type").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(types.keySet === Set("image", "audio", "video"))
    assert(types.values.sum === 500L)
  }

  test("decode stub: partition-local, deterministic, length-consistent") {
    val recs = Multimodal.asRecords(spark, media)
    val infos = Multimodal.decode(recs).collect()
    assert(infos.length === 500)
    infos.foreach { i =>
      assert(i.width >= 1 && i.height >= 1)
      assert(i.mean_byte > 0.0 && i.mean_byte < 256.0)
      if (i.media_type != "video") assert(i.n_frames === 1)
    }
    // deterministic across runs
    val again = Multimodal.decode(recs).collect()
    assert(infos.map(_.mean_byte).sorted.toSeq === again.map(_.mean_byte).sorted.toSeq)
  }

  test("codec seam: a replacement codec drops in without touching the operators") {
    import Multimodal.{MediaCodec, MediaDecoder, MediaRecord, MediaInfo, MediaFeature}
    // a fake "real" codec with recognizably different kernels — constant
    // 2x3 dimensions, negated brightness, constant features
    object FixedCodec extends MediaCodec {
      def open(): MediaDecoder = new MediaDecoder {
        def decode(r: MediaRecord): MediaInfo =
          MediaInfo(r.doc_id, r.media_type, 2, 3, 7, -1.0)
        def resize(r: MediaRecord, w: Int, h: Int): MediaRecord =
          MediaRecord(r.doc_id, r.media_type, new Array[Byte](w * h))
        def features(r: MediaRecord): MediaFeature =
          MediaFeature(r.doc_id, Array(42f))
      }
    }
    val recs = Multimodal.asRecords(spark, media.limit(30))
    val swapped = Multimodal.decode(recs, FixedCodec).collect()
    assert(swapped.forall(i => i.width == 2 && i.height == 3 && i.mean_byte == -1.0))
    assert(Multimodal.features(recs, FixedCodec).collect()
      .forall(_.feature.toSeq == Seq(42f)))
    assert(Multimodal.resize(recs, 4, 4, FixedCodec).collect()
      .forall(_.content.length == 16))
    // ... and the default stand-in still answers as before (doc_id sets
    // identical, kernels differ)
    val std = Multimodal.decode(recs).collect()
    assert(std.map(_.doc_id).toSet == swapped.map(_.doc_id).toSet)
    assert(std.exists(i => i.width != 2 || i.mean_byte != -1.0))
  }

  test("resize stub: payload becomes exactly w*h bytes") {
    val out = Multimodal.resize(Multimodal.asRecords(spark, media.limit(20)), 8, 8)
      .collect()
    out.foreach(r => assert(r.content.length === 64))
  }

  test("frame sampling keeps every 4th fixed-size frame of video payloads") {
    val frames = Multimodal.frameSample(media, 4).collect()
    assert(frames.nonEmpty)
    frames.foreach { r =>
      assert(r.getInt(1) % 4 === 0)
      assert(r.getAs[Array[Byte]](2).length <= Multimodal.FrameBytes)
    }
  }

  test("feature stub: 16-dim L1-normalized histograms") {
    val feats = Multimodal.features(Multimodal.asRecords(spark, media.limit(50)))
      .collect()
    feats.foreach { f =>
      assert(f.feature.length === 16)
      assert(math.abs(f.feature.map(_.toDouble).sum - 1.0) < 1e-3)
    }
  }

  test("decoder lifecycle: close() runs exactly once per opened handle, even on failure") {
    import MultimodalSpec.{opens, closes, CountingCodec}
    val recs = Multimodal.asRecords(spark, media.limit(40)).repartition(4)

    opens.set(0); closes.set(0)
    Multimodal.decode(recs, new CountingCodec(failOn = -1L)).collect()
    assert(opens.get() > 0)
    assert(closes.get() === opens.get())

    // a row that throws mid-partition must still release the handle
    // (task completion listener) — and never double-close
    opens.set(0); closes.set(0)
    intercept[org.apache.spark.SparkException] {
      Multimodal.decode(recs, new CountingCodec(failOn =
        recs.head().doc_id)).collect()
    }
    assert(opens.get() > 0)
    assert(closes.get() === opens.get())
  }

  test("binary column prunes away: meta projection does not retain content") {
    val m = Multimodal.meta(media)
    assert(!m.columns.contains("content"))
    assert(m.count() === 500)
  }

  test("ImageIoCodec: gray PNG decode is sample-exact against the closed form") {
    import Multimodal.MediaRecord
    val ids = Seq(0L, 1L, 16L, 30L, 31L, 527L) // covers w/h extremes incl. 1x1
    val dec = Multimodal.ImageIoCodec.open()
    ids.foreach { id =>
      val info = dec.decode(MediaRecord(id, "image", Multimodal.grayPng(id)))
      val w = (1 + id % 31).toInt
      val h = (1 + id % 17).toInt
      assert(info.width === w)
      assert(info.height === h)
      assert(info.n_frames === 1)
      val expectedSum = (for { y <- 0 until h; x <- 0 until w }
        yield (id * 31 + x * 7 + y * 13) % 256).sum
      assert(math.round(info.mean_byte * w * h) === expectedSum)
    }
    dec.close()
  }

  test("ImageIoCodec: nearest-neighbor resize picks exact source samples") {
    import java.awt.image.BufferedImage
    import Multimodal.MediaRecord
    val dec = Multimodal.ImageIoCodec.open()
    // 4x4 gray ramp -> 2x2 keeps samples at (0,0),(2,0),(0,2),(2,2)
    val img = new BufferedImage(4, 4, BufferedImage.TYPE_BYTE_GRAY)
    for (y <- 0 until 4; x <- 0 until 4) img.getRaster.setSample(x, y, 0, y * 4 + x)
    val baos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", baos)
    val small = dec.resize(MediaRecord(1L, "image", baos.toByteArray), 2, 2)
    val back = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(small.content))
    assert(back.getWidth === 2 && back.getHeight === 2)
    val got = for (y <- 0 until 2; x <- 0 until 2) yield back.getRaster.getSample(x, y, 0)
    assert(got === Seq(0, 2, 8, 10))
    dec.close()
  }

  test("ImageIoCodec: RGB BMP decode averages every band; features L1-normalize") {
    import java.awt.image.BufferedImage
    import Multimodal.MediaRecord
    val dec = Multimodal.ImageIoCodec.open()
    val img = new BufferedImage(2, 1, BufferedImage.TYPE_3BYTE_BGR)
    // pixel 0: rgb(10,20,30); pixel 1: rgb(40,50,60) -> sample mean 35
    img.getRaster.setPixel(0, 0, Array(10, 20, 30))
    img.getRaster.setPixel(1, 0, Array(40, 50, 60))
    val baos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "bmp", baos)
    val info = dec.decode(MediaRecord(2L, "image", baos.toByteArray))
    assert(info.width === 2 && info.height === 1)
    assert(info.mean_byte === 35.0)
    val f = dec.features(MediaRecord(2L, "image", baos.toByteArray))
    assert(math.abs(f.feature.sum - 1f) < 1e-6)
    // samples 10..60 all land in bins 0..3
    assert(f.feature.drop(4).forall(_ == 0f))
    dec.close()
  }

  test("ImageIoCodec: animated GIF reports its true frame count") {
    import java.awt.image.BufferedImage
    import javax.imageio.ImageIO
    import Multimodal.MediaRecord
    // write a 3-frame GIF through the JDK's sequence writer
    val writer = ImageIO.getImageWritersByFormatName("gif").next()
    val baos = new java.io.ByteArrayOutputStream()
    val ios = ImageIO.createImageOutputStream(baos)
    writer.setOutput(ios)
    writer.prepareWriteSequence(null)
    for (f <- 0 until 3) {
      val img = new BufferedImage(4, 4, BufferedImage.TYPE_BYTE_GRAY)
      for (y <- 0 until 4; x <- 0 until 4)
        img.getRaster.setSample(x, y, 0, (f * 50 + x + y) % 256)
      writer.writeToSequence(new javax.imageio.IIOImage(img, null, null), null)
    }
    writer.endWriteSequence()
    ios.close(); writer.dispose()
    val dec = Multimodal.ImageIoCodec.open()
    val info = dec.decode(MediaRecord(9L, "image", baos.toByteArray))
    assert(info.n_frames === 3)
    assert(info.width === 4 && info.height === 4)
    dec.close()
  }

  test("WavCodec: PCM WAV decode is byte-exact; nearest-neighbor resample picks frames") {
    import Multimodal.MediaRecord
    val dec = Multimodal.WavCodec.open()
    val ids = Seq(0L, 7L, 399L, 1234L)
    ids.foreach { id =>
      val info = dec.decode(MediaRecord(id, "audio", Multimodal.pcmWav(id)))
      val n = (100 + id % 400).toInt
      assert(info.width === 8000)    // sample rate
      assert(info.height === 1)      // channels
      assert(info.n_frames === n)
      val expectedSum = (0 until n).map(i => (id * 31 + i * 7) % 256).sum
      assert(math.round(info.mean_byte * n) === expectedSum)
    }
    // resample 100+0 frames down to 5x2=10: frame j comes from source
    // frame (j*n)/10 — re-decode and check each picked byte
    val id = 0L
    val small = dec.resize(MediaRecord(id, "audio", Multimodal.pcmWav(id)), 5, 2)
    val back = dec.decode(small)
    assert(back.n_frames === 10)
    val n = 100
    val expect = (0 until 10).map { j =>
      val src = j * n / 10; (id * 31 + src * 7) % 256
    }
    assert(math.round(back.mean_byte * 10) === expect.sum)
    val f = dec.features(MediaRecord(id, "audio", Multimodal.pcmWav(id)))
    assert(math.abs(f.feature.sum - 1f) < 1e-6)
    dec.close()
  }

  test("JdkCodec dispatches by media_type: real image + real audio + stand-in video") {
    import Multimodal.MediaRecord
    val dec = Multimodal.JdkCodec.open()
    val img = dec.decode(MediaRecord(5L, "image", Multimodal.grayPng(5L)))
    assert(img.width === (1 + 5 % 31) && img.height === (1 + 5 % 17))
    val aud = dec.decode(MediaRecord(5L, "audio", Multimodal.pcmWav(5L)))
    assert(aud.width === 8000 && aud.n_frames === 105)
    // video falls through to the stand-in's length-derived shape
    val vid = dec.decode(MediaRecord(5L, "video", Array.fill[Byte](600)(1)))
    assert(vid.n_frames === (600 + Multimodal.FrameBytes - 1) / Multimodal.FrameBytes)
    dec.close()
  }

  test("aHash64: brightness shift and JPEG re-encode collide; distinct classes " +
    "stay >= 18 apart; banded pairing recovers exactly the same-class pairs") {
    import Multimodal.MediaRecord
    import spark.implicits._
    def hashOf(id: Long): Long = {
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(Multimodal.perturbedImage(id)))
      val r = img.getRaster
      Multimodal.aHash64(img.getWidth, img.getHeight, r.getNumBands,
        (x, y, b) => r.getSample(x, y, b))
    }
    // all three variants (base PNG, +30 PNG, JPEG) of a class collide
    val classes = (0L until 25L).map(hashOf)
    (0L until 75L).foreach { id =>
      assert(hashOf(id) === classes((id % 25).toInt),
        s"variant ${id / 25} of class ${id % 25} does not collide")
    }
    // distinct classes are far apart (measured minimum: 21)
    val minH = (for (i <- 0 until 25; j <- i + 1 until 25)
      yield java.lang.Long.bitCount(classes(i) ^ classes(j))).min
    assert(minH >= 18, s"cross-class hamming floor $minH")
    // end-to-end: decode + hash + banded pairing over 75 perturbed docs
    val recs = spark.range(75)
      .as[Long].map(id => MediaRecord(id, "image", Multimodal.perturbedImage(id)))
    val pairs = Dedup.hammingNearPairs64(
        Multimodal.imageAHash(recs)
          .select(col("doc_id").as("id"), col("ahash").as("h")))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    val expected = (for {
      a <- 0L until 75L; b <- a + 1 until 75L; if a % 25 == b % 25
    } yield (a, b, 0)).toSet
    assert(pairs.toSet === expected)
  }

  test("pHash64: sign-threshold DCT hash survives the luminance ramp that " +
    "defeats aHash64; within-class pairs always share a band; banded pairing " +
    "recovers exactly the same-class pairs") {
    import Multimodal.MediaRecord
    import spark.implicits._
    def raster(id: Long) = {
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(Multimodal.perturbedImageP(id)))
      (img.getWidth, img.getHeight, img.getRaster)
    }
    def pOf(id: Long): Long = {
      val (w, h, r) = raster(id)
      Multimodal.pHash64(w, h, r.getNumBands, (x, y, b) => r.getSample(x, y, b))
    }
    def aOf(id: Long): Long = {
      val (w, h, r) = raster(id)
      Multimodal.aHash64(w, h, r.getNumBands, (x, y, b) => r.getSample(x, y, b))
    }
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    val ph = (0L until 100L).map(pOf)
    // brightness shift is an EXACT invariance (mean-centering)
    (0 until 25).foreach(c => assert(ph(c) === ph(c + 25)))
    // ramp and JPEG variants stay within the pairing budget (measured
    // maxima: ramp 3, JPEG 2, any within-class pair 4), and the ramp's
    // flips are confined to the (u odd, v=0) bits {1,3,5,7} — one band
    val rampMask = (0 until 25).map(c => ph(c) ^ ph(c + 50)).reduce(_ | _)
    assert((rampMask & ~0xAAL) === 0L,
      f"ramp flipped bits outside {1,3,5,7}: $rampMask%016x")
    val withinMax = (for (c <- 0 until 25; i <- 0 until 4; j <- i + 1 until 4)
      yield ham(ph(c + 25 * i), ph(c + 25 * j))).max
    assert(withinMax <= 4, s"within-class pairwise hamming $withinMax")
    // every within-class pair shares one of the 4 16-bit bands (recall
    // under the banded join is exact, not probabilistic, on this corpus)
    def shareBand(a: Long, b: Long) =
      (0 until 4).exists(k => ((a >>> (k * 16)) & 0xFFFFL) == ((b >>> (k * 16)) & 0xFFFFL))
    for (c <- 0 until 25; i <- 0 until 4; j <- i + 1 until 4)
      assert(shareBand(ph(c + 25 * i), ph(c + 25 * j)))
    // distinct classes are far apart (measured minimum: 19)
    val minCross = (for (i <- 0 until 25; j <- i + 1 until 25)
      yield ham(ph(i), ph(j))).min
    assert(minCross >= 15, s"cross-class hamming floor $minCross")
    // the CONTRAST that justifies the operator: the same ramp variant
    // escapes the aHash budget for most classes (measured: 14 of 25,
    // mean 6.84) — a spatial-threshold hash cannot pair these copies
    val rampA = (0 until 25).map(c => ham(aOf(c), aOf(c + 50L)))
    assert(rampA.count(_ > 6) >= 10,
      s"expected the ramp to defeat aHash for most classes, got $rampA")
    // end-to-end: decode + pHash + banded pairing over 100 perturbed docs
    val recs = spark.range(100)
      .as[Long].map(id => MediaRecord(id, "image", Multimodal.perturbedImageP(id)))
    val pairs = Dedup.hammingNearPairs64(
        Multimodal.imagePHash(recs)
          .select(col("doc_id").as("id"), col("phash").as("h")))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val expected = (for {
      a <- 0L until 100L; b <- a + 1 until 100L; if a % 25 == b % 25
    } yield (a, b)).toSet
    assert(pairs === expected)
  }

  test("audioHash64: DC offset, re-gain and nearest-neighbor resample collide; " +
    "distinct clips stay far apart; pairing recovers the class pairs") {
    import Multimodal.MediaRecord
    import spark.implicits._
    def hashOf(id: Long): Long = {
      val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(Multimodal.perturbedWav(id)))
      val data = try in.readAllBytes() finally in.close()
      Multimodal.audioHash64(data.length, i => data(i) & 0xFF)
    }
    val classes = (0L until 25L).map(hashOf)
    (0L until 100L).foreach { id =>
      assert(hashOf(id) === classes((id % 25).toInt),
        s"variant ${id / 25} of class ${id % 25} does not collide")
    }
    val minH = (for (i <- 0 until 25; j <- i + 1 until 25)
      yield java.lang.Long.bitCount(classes(i) ^ classes(j))).min
    assert(minH > 6, s"cross-class hamming floor $minH")
    val recs = spark.range(100)
      .as[Long].map(id => MediaRecord(id, "audio", Multimodal.perturbedWav(id)))
    val pairs = Dedup.hammingNearPairs64(
        Multimodal.audioAHash(recs)
          .select(col("doc_id").as("id"), col("ahash").as("h")))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val expected = (for {
      a <- 0L until 100L; b <- a + 1 until 100L; if a % 25 == b % 25
    } yield (a, b, 0)).toSet
    assert(pairs === expected)
  }

  test("frameAHash: MJPG re-encode and shifted DIB frames pair with the base " +
    "footage at frame granularity") {
    import Multimodal.MediaRecord
    import spark.implicits._
    val recs = spark.range(75)
      .as[Long].map(id => MediaRecord(id, "video", AviCodec.perturbedAvi(id)))
    val pairs = Dedup.hammingNearPairs64(
        AviCodec.frameAHash(recs)
          .select((col("doc_id") * 4 + col("frame_idx")).as("id"),
            col("ahash").as("h")))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val expected = (for {
      a <- 0L until 75L; b <- a + 1 until 75L; if a % 25 == b % 25
      f <- 0 until 2
    } yield (a * 4 + f, b * 4 + f, 0)).toSet
    assert(pairs === expected)
  }

  test("ImageIoCodec through the operators: distributed decode matches local") {
    import Multimodal.MediaRecord
    import spark.implicits._
    val recs = spark.range(40)
      .as[Long].map(id => MediaRecord(id, "image", Multimodal.grayPng(id)))
      .repartition(4)
    val dist = Multimodal.decode(recs, Multimodal.ImageIoCodec).collect()
      .map(i => i.doc_id -> ((i.width, i.height, i.mean_byte))).toMap
    val dec = Multimodal.ImageIoCodec.open()
    (0L until 40L).foreach { id =>
      val local = dec.decode(MediaRecord(id, "image", Multimodal.grayPng(id)))
      assert(dist(id) === ((local.width, local.height, local.mean_byte)))
    }
    dec.close()
  }
}

object MultimodalSpec {
  import Multimodal.{MediaCodec, MediaDecoder, MediaRecord, MediaInfo, MediaFeature}

  // counters are JVM-static (local[*] executors share the JVM), so the
  // per-partition open/close pairing is observable from the driver
  val opens = new java.util.concurrent.atomic.AtomicInteger(0)
  val closes = new java.util.concurrent.atomic.AtomicInteger(0)

  // top-level class: no $outer capture, serializes cleanly to tasks
  class CountingCodec(failOn: Long) extends MediaCodec {
    def open(): MediaDecoder = { opens.incrementAndGet(); new MediaDecoder {
      def decode(r: MediaRecord): MediaInfo = {
        if (r.doc_id == failOn) throw new RuntimeException("decode blew up")
        MediaInfo(r.doc_id, r.media_type, 1, 1, 1, 0.0)
      }
      def resize(r: MediaRecord, w: Int, h: Int): MediaRecord = r
      def features(r: MediaRecord): MediaFeature = MediaFeature(r.doc_id, Array(0f))
      override def close(): Unit = closes.incrementAndGet()
    } }
  }
}
