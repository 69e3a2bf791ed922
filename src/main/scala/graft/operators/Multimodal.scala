package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Multimodal-column handling for LLM-data pipelines: image/audio/video
 * payloads ride as opaque `binary` columns with typed metadata, and the
 * compute-heavy steps (decode, feature-extract, resize, frame-sample)
 * run as partition-local typed transformations.
 *
 * The compute kernels live behind the [[MediaCodec]] seam: the
 * operators are written against the interface, so a decoder drops in
 * without touching the Spark-side plumbing. IMAGES use the real
 * [[ImageIoCodec]] (JDK `javax.imageio`: PNG/JPEG/BMP/GIF — true
 * dimensions, raster-exact pixel stats, oracle-gated round trip).
 * AUDIO uses the real [[WavCodec]] (JDK `javax.sound.sampled`: PCM
 * WAV/AU/AIFF — true sample rate/channels/frame counts, byte-exact
 * sample stats, oracle-gated round trip). VIDEO has no JDK decoder and
 * no media library exists in this environment, so it goes through
 * [[StandInCodec]], a clearly-marked DETERMINISTIC STAND-IN (a real
 * ffmpeg kernel implements the same three methods); [[JdkCodec]]
 * dispatches all three by `media_type`. The Spark-side contract
 * (schema, typed Dataset encoders, per-partition batching,
 * shuffle-free execution) is the real, tested design:
 *
 *  - payloads never pass through the driver;
 *  - kernels run via `mapPartitions` (the Scala analog of
 *    `mapInPandas`): the codec's `open()` is called ONCE PER PARTITION
 *    so decoder state (native handles, model weights) is amortized
 *    across the partition's rows;
 *  - derived columns (metadata, features) are small; the binary column
 *    is pruned away the moment it is no longer needed, which keeps
 *    scan width minimal at 100 TB.
 */
object Multimodal {

  /** A media row: payload + discriminator. */
  final case class MediaRecord(doc_id: Long, media_type: String, content: Array[Byte])

  /** Decoded media metadata (what a real codec would surface). */
  final case class MediaInfo(doc_id: Long, media_type: String,
    width: Int, height: Int, n_frames: Int, mean_byte: Double)

  /** Extracted feature vector. */
  final case class MediaFeature(doc_id: Long, feature: Array[Float])

  val FrameBytes = 256 // fake fixed-size frame for the video stand-in

  /**
   * The codec seam. A factory ships to executors (must serialize);
   * [[MediaCodec.open]] runs once per partition and returns the
   * per-partition decoder whose methods run once per row. Implement
   * these three methods over a real media stack and every operator
   * below works unchanged.
   */
  trait MediaCodec extends Serializable {
    def open(): MediaDecoder
  }

  /** Per-partition decoder handle (NOT required to be serializable —
    * it never leaves the executor that opened it). [[close]] releases
    * whatever [[MediaCodec.open]] acquired (native handles, model
    * weights, scratch buffers); the operators guarantee it runs
    * exactly once per opened handle, at partition end — on normal
    * exhaustion AND on task failure/cancellation (via the task
    * completion listener). The default is a no-op so pure-JVM codecs
    * need not care. */
  trait MediaDecoder {
    def decode(r: MediaRecord): MediaInfo
    def resize(r: MediaRecord, w: Int, h: Int): MediaRecord
    def features(r: MediaRecord): MediaFeature
    def close(): Unit = ()
  }

  /** Open a decoder for this partition and map the rows through it,
    * closing the handle exactly once when the partition ends. Two
    * triggers cover every exit path: the task completion listener fires
    * on success, failure, and cancellation (a real libjpeg/ffmpeg
    * handle must not leak on a thrown row); the exhaustion hook closes
    * eagerly as soon as the iterator drains, without waiting for task
    * teardown (driver-local iteration has no TaskContext). */
  private def mapWithDecoder[B](codec: MediaCodec, it: Iterator[MediaRecord])
                               (f: (MediaDecoder, MediaRecord) => B): Iterator[B] = {
    val dec = codec.open()
    var closed = false
    def closeOnce(): Unit = if (!closed) { closed = true; dec.close() }
    Option(org.apache.spark.TaskContext.get())
      .foreach(_.addTaskCompletionListener[Unit](_ => closeOnce()))
    new Iterator[B] {
      def hasNext: Boolean = {
        val h = it.hasNext
        if (!h) closeOnce()
        h
      }
      def next(): B = f(dec, it.next())
    }
  }

  /**
   * STAND-IN CODEC — the deterministic fake used where a real media
   * library would sit (none exists in this environment): "dimensions"
   * from payload length, brightness proxy from the byte mean, resize
   * as truncate/cycle, features as a 16-bin L1-normalized byte
   * histogram.
   */
  object StandInCodec extends MediaCodec {
    def open(): MediaDecoder = new MediaDecoder {
      def decode(r: MediaRecord): MediaInfo = {
        val len = r.content.length
        val w = math.max(1, math.sqrt(len.toDouble).toInt)
        val h = math.max(1, len / w)
        val frames = if (r.media_type == "video") (len + FrameBytes - 1) / FrameBytes else 1
        val mean = if (len == 0) 0.0
          else r.content.map(b => (b & 0xFF).toLong).sum.toDouble / len
        MediaInfo(r.doc_id, r.media_type, w, h, frames, mean)
      }
      def resize(r: MediaRecord, w: Int, h: Int): MediaRecord = {
        val target = w * h
        val out =
          if (r.content.isEmpty) new Array[Byte](target) // blank canvas
          else Array.tabulate(target)(i => r.content(i % r.content.length))
        MediaRecord(r.doc_id, r.media_type, out)
      }
      def features(r: MediaRecord): MediaFeature = {
        val hist = new Array[Float](16)
        r.content.foreach(b => hist((b & 0xFF) >> 4) += 1f)
        val n = math.max(1, r.content.length).toFloat
        MediaFeature(r.doc_id, hist.map(_ / n))
      }
    }
  }

  /**
   * REAL image codec over JDK `javax.imageio` (PNG/JPEG/BMP/GIF —
   * ships with every JRE, zero external deps). Image payloads only:
   * `decode` throws on bytes no installed reader recognizes, so callers
   * filter `media_type === "image"` first (audio has [[WavCodec]];
   * video keeps the stand-in).
   *
   *  - `decode`: true raster width/height; `n_frames` from
   *    `ImageReader.getNumImages` (multi-frame GIFs count correctly);
   *    `mean_byte` = mean over ALL raster samples (every band of every
   *    pixel) read straight off the `Raster` — no color-space
   *    conversion, so an 8-bit gray PNG round-trips its sample values
   *    exactly.
   *  - `resize`: nearest-neighbor sample copy raster-to-raster for
   *    component types (deterministic; `getRGB`/`Graphics2D` would
   *    gamma-convert gray↔sRGB and change values); INDEXED/BINARY
   *    sources (GIF palettes) copy COLORS via `getRGB` into ARGB
   *    instead — their raster samples are palette indices, and an
   *    index copy under a different palette would remap every color
   *    (sRGB palette lookups are exact, no gamma conversion applies).
   *    Re-encoded as PNG.
   *  - `features`: 16-bin L1-normalized histogram of raster samples —
   *    the decoded-domain twin of [[StandInCodec]]'s byte histogram.
   */
  object ImageIoCodec extends MediaCodec {
    import java.awt.image.BufferedImage
    import javax.imageio.ImageIO

    private def readImage(r: MediaRecord): (BufferedImage, Int) = {
      val iis = ImageIO.createImageInputStream(
        new java.io.ByteArrayInputStream(r.content))
      try {
        val readers = ImageIO.getImageReaders(iis)
        require(readers.hasNext, s"no image reader for doc ${r.doc_id}")
        val reader = readers.next()
        try {
          reader.setInput(iis, false, false)
          val n = reader.getNumImages(true)
          (reader.read(0), n)
        } finally reader.dispose()
      } finally iis.close()
    }

    def open(): MediaDecoder = new MediaDecoder {
      def decode(r: MediaRecord): MediaInfo = {
        val (img, nFrames) = readImage(r)
        val raster = img.getRaster
        val w = img.getWidth
        val h = img.getHeight
        val bands = raster.getNumBands
        var sum = 0L
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            var b = 0
            while (b < bands) { sum += raster.getSample(x, y, b); b += 1 }
            x += 1
          }
          y += 1
        }
        val mean = sum.toDouble / (w.toLong * h * bands)
        MediaInfo(r.doc_id, r.media_type, w, h, nFrames, mean)
      }

      def resize(r: MediaRecord, w: Int, h: Int): MediaRecord = {
        val (img, _) = readImage(r)
        // indexed/binary rasters hold PALETTE INDICES, not samples — a
        // raw index copy into an image with a different palette remaps
        // every color, so those (and custom types) copy resolved ARGB
        // colors instead; component types keep the exact sample copy
        val indexed = img.getType == BufferedImage.TYPE_CUSTOM ||
          img.getType == BufferedImage.TYPE_BYTE_INDEXED ||
          img.getType == BufferedImage.TYPE_BYTE_BINARY ||
          img.getColorModel.isInstanceOf[java.awt.image.IndexColorModel]
        val out = new BufferedImage(w, h,
          if (indexed) BufferedImage.TYPE_INT_ARGB else img.getType)
        if (indexed) {
          var y = 0
          while (y < h) {
            val sy = (y.toLong * img.getHeight / h).toInt
            var x = 0
            while (x < w) {
              val sx = (x.toLong * img.getWidth / w).toInt
              out.setRGB(x, y, img.getRGB(sx, sy))
              x += 1
            }
            y += 1
          }
        } else {
          val si = img.getRaster
          val so = out.getRaster
          val bands = math.min(si.getNumBands, so.getNumBands)
          var y = 0
          while (y < h) {
            val sy = (y.toLong * img.getHeight / h).toInt
            var x = 0
            while (x < w) {
              val sx = (x.toLong * img.getWidth / w).toInt
              var b = 0
              while (b < bands) { so.setSample(x, y, b, si.getSample(sx, sy, b)); b += 1 }
              x += 1
            }
            y += 1
          }
        }
        val baos = new java.io.ByteArrayOutputStream()
        ImageIO.write(out, "png", baos)
        MediaRecord(r.doc_id, r.media_type, baos.toByteArray)
      }

      def features(r: MediaRecord): MediaFeature = {
        val (img, _) = readImage(r)
        val raster = img.getRaster
        val hist = new Array[Float](16)
        var n = 0L
        var y = 0
        while (y < img.getHeight) {
          var x = 0
          while (x < img.getWidth) {
            var b = 0
            while (b < raster.getNumBands) {
              hist((raster.getSample(x, y, b) & 0xFF) >> 4) += 1f
              n += 1
              b += 1
            }
            x += 1
          }
          y += 1
        }
        MediaFeature(r.doc_id, hist.map(_ / math.max(1L, n)))
      }
    }
  }

  /**
   * REAL audio codec over JDK `javax.sound.sampled` (PCM WAV/AU/AIFF —
   * ships with every JRE, zero external deps). Audio payloads only;
   * `decode` throws on bytes no installed reader recognizes. Field
   * mapping (documented because [[MediaInfo]] is image-shaped):
   * `width` = sample rate (Hz), `height` = channels, `n_frames` =
   * PCM frame count, `mean_byte` = mean of the raw PCM data bytes
   * (for 8-bit unsigned mono, exactly the mean sample value).
   *
   *  - `resize`: nearest-neighbor RESAMPLE of the frame stream to
   *    `w·h` frames (the time-axis twin of the image resize),
   *    re-encoded as WAV with the source format;
   *  - `features`: 16-bin L1-normalized histogram of the data bytes.
   */
  object WavCodec extends MediaCodec {
    import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}

    private def readAll(r: MediaRecord): (AudioFormat, Array[Byte]) = {
      val in = AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(r.content))
      try (in.getFormat, in.readAllBytes()) finally in.close()
    }

    def open(): MediaDecoder = new MediaDecoder {
      def decode(r: MediaRecord): MediaInfo = {
        val (fmt, data) = readAll(r)
        val frames = data.length / fmt.getFrameSize
        val mean = if (data.length == 0) 0.0
          else data.map(b => (b & 0xFF).toLong).sum.toDouble / data.length
        MediaInfo(r.doc_id, r.media_type,
          fmt.getSampleRate.toInt, fmt.getChannels, frames, mean)
      }

      def resize(r: MediaRecord, w: Int, h: Int): MediaRecord = {
        val (fmt, data) = readAll(r)
        val fs = fmt.getFrameSize
        val srcFrames = data.length / fs
        val dstFrames = w * h
        val out = new Array[Byte](dstFrames * fs)
        // zero-frame source: leave the silence buffer (an arraycopy
        // from the empty data array would throw) — the audio twin of
        // the stand-in's blank canvas
        if (srcFrames > 0) {
          var i = 0
          while (i < dstFrames) {
            val src = (i.toLong * srcFrames / dstFrames).toInt
            System.arraycopy(data, src * fs, out, i * fs, fs)
            i += 1
          }
        }
        val baos = new java.io.ByteArrayOutputStream()
        AudioSystem.write(
          new AudioInputStream(new java.io.ByteArrayInputStream(out), fmt, dstFrames),
          AudioFileFormat.Type.WAVE, baos)
        MediaRecord(r.doc_id, r.media_type, baos.toByteArray)
      }

      def features(r: MediaRecord): MediaFeature = {
        val (_, data) = readAll(r)
        val hist = new Array[Float](16)
        data.foreach(b => hist((b & 0xFF) >> 4) += 1f)
        val n = math.max(1, data.length).toFloat
        MediaFeature(r.doc_id, hist.map(_ / n))
      }
    }
  }

  /**
   * The composite JDK codec: dispatch by `media_type` — images through
   * [[ImageIoCodec]], audio through [[WavCodec]], video through
   * [[AviCodec]] when the payload sniffs as a RIFF/AVI container
   * (raw-DIB and MJPG frames decode with the pure JDK; see
   * [[AviCodec]]). Only non-AVI video (H.264 in MP4 etc.) falls back
   * to [[StandInCodec]] — compressed codecs genuinely need a native
   * decoder the JVM does not ship. One decoder handle of each kind per
   * partition, opened lazily.
   */
  object JdkCodec extends MediaCodec {
    def open(): MediaDecoder = new MediaDecoder {
      private lazy val img = ImageIoCodec.open()
      private lazy val aud = WavCodec.open()
      private lazy val avi = AviCodec.open()
      private lazy val std = StandInCodec.open()
      private def route(r: MediaRecord): MediaDecoder = r.media_type match {
        case "image" => img
        case "audio" => aud
        case "video" if AviCodec.isAvi(r.content) => avi
        case _ => std
      }
      def decode(r: MediaRecord): MediaInfo = route(r).decode(r)
      def resize(r: MediaRecord, w: Int, h: Int): MediaRecord =
        route(r).resize(r, w, h)
      def features(r: MediaRecord): MediaFeature = route(r).features(r)
      override def close(): Unit = { img.close(); aud.close(); avi.close(); std.close() }
    }
  }

  /**
   * Deterministic mono 8-bit PCM WAV fixture for `doc_id`: 8 kHz,
   * `100 + id % 400` frames, sample `i = (id·31 + i·7) mod 256`
   * (unsigned), written through real `AudioSystem` WAV encoding — the
   * audio twin of [[grayPng]], closed-form so a SQL oracle recomputes
   * the expected frame count and sample sum without decoding.
   */
  def pcmWav(docId: Long): Array[Byte] = {
    import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}
    val n = (100 + docId % 400).toInt
    val data = Array.tabulate(n)(i => ((docId * 31 + i * 7) % 256).toByte)
    val fmt = new AudioFormat(AudioFormat.Encoding.PCM_UNSIGNED, 8000f, 8, 1, 1, 8000f, false)
    val baos = new java.io.ByteArrayOutputStream()
    AudioSystem.write(
      new AudioInputStream(new java.io.ByteArrayInputStream(data), fmt, n),
      AudioFileFormat.Type.WAVE, baos)
    baos.toByteArray
  }

  /**
   * Deterministic 8-bit gray PNG fixture for `doc_id`: dimensions
   * `(1 + id % 31) × (1 + id % 17)`, pixel `(x,y) = (id·31 + x·7 +
   * y·13) mod 256`, written through real `ImageIO` PNG encoding. The
   * same closed-form lets a SQL oracle recompute the expected
   * dimensions and pixel sum WITHOUT decoding — so a gate over
   * `decode(grayPng(id))` proves the encode→PNG→decode round trip
   * preserves every sample.
   */
  def grayPng(docId: Long): Array[Byte] = {
    import java.awt.image.BufferedImage
    val w = (1 + docId % 31).toInt
    val h = (1 + docId % 17).toInt
    val img = new BufferedImage(w, h, BufferedImage.TYPE_BYTE_GRAY)
    val raster = img.getRaster
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        raster.setSample(x, y, 0, ((docId * 31 + x * 7 + y * 13) % 256).toInt)
        x += 1
      }
      y += 1
    }
    val baos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", baos)
    baos.toByteArray
  }

  /**
   * 64-bit average-hash (aHash) over a decoded raster — the classic
   * perceptual image fingerprint (public knowledge: downscale to 8×8,
   * threshold each cell against the global mean), computed in EXACT
   * integer arithmetic so the result is bit-reproducible:
   *
   *  - cell `(i,j)` covers the pixel rectangle `[i·w/8,(i+1)·w/8) ×
   *    [j·h/8,(j+1)·h/8)`; its value is the truncated mean of the
   *    band-summed samples over the rectangle (area pooling — robust
   *    to JPEG block noise where point sampling is not);
   *  - bit `j·8+i` is set iff `cell·64 > Σ cells` (strict).
   *
   * Invariances that make it a NEAR-dup key where raster digests are
   * exact-only: a uniform brightness shift `+c` moves every cell mean
   * by exactly `bands·c` and the total by `64·bands·c` — bits
   * unchanged; a uniform band replication (gray DIB's 3×BGR vs a gray
   * JPEG's one band) scales both sides of the comparison — bits
   * unchanged up to truncation noise, far below the bimodal margins a
   * re-encode leaves intact. So a brightness-shifted copy hashes
   * IDENTICALLY and a JPEG/MJPG re-encode hashes identically for any
   * image whose cell means sit away from the global mean.
   */
  private[operators] def aHash64(w: Int, h: Int, bands: Int,
                                 get: (Int, Int, Int) => Int): Long = {
    require(w >= 8 && h >= 8, s"aHash needs a raster >= 8x8, got ${w}x$h")
    val m = new Array[Long](64)
    var total = 0L
    var j = 0
    while (j < 8) {
      val y0 = j * h / 8; val y1 = (j + 1) * h / 8
      var i = 0
      while (i < 8) {
        val x0 = i * w / 8; val x1 = (i + 1) * w / 8
        var s = 0L
        var y = y0
        while (y < y1) {
          var x = x0
          while (x < x1) {
            var b = 0
            while (b < bands) { s += get(x, y, b); b += 1 }
            x += 1
          }
          y += 1
        }
        m(j * 8 + i) = s / ((y1 - y0).toLong * (x1 - x0))
        total += m(j * 8 + i)
        i += 1
      }
      j += 1
    }
    var hash = 0L
    var k = 0
    while (k < 64) { if (m(k) * 64 > total) hash |= 1L << k; k += 1 }
    hash
  }

  /** Per-image perceptual hash: `(doc_id, ahash)` — real ImageIO
    * decode, then [[aHash64]] over the raster. Partition-local
    * (flatMap-shaped; the binary column never shuffles). */
  def imageAHash(media: Dataset[MediaRecord]): DataFrame = {
    import media.sparkSession.implicits._
    media.map { r =>
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(r.content))
      require(img != null, s"no image reader for doc ${r.doc_id}")
      val raster = img.getRaster
      (r.doc_id, aHash64(img.getWidth, img.getHeight, raster.getNumBands,
        (x, y, b) => raster.getSample(x, y, b)))
    }.toDF("doc_id", "ahash")
  }

  // DCT-II basis table for pHash64, fixed-point: C(u,x) =
  // round(cos((2x+1)·u·π/64) · 2^13), built with StrictMath (fdlibm —
  // bit-identical on every JVM, unlike Math.cos) so the hash is
  // reproducible across platforms. Row u=0 is the constant 8192. The
  // 2^13 scale keeps the worst-case (all energy in one coefficient)
  // 63-coefficient sum a 4× margin under Long.MaxValue by Parseval.
  private val DctC: Array[Array[Long]] = Array.tabulate(8, 32) { (u, x) =>
    StrictMath.round(StrictMath.cos((2 * x + 1) * u * StrictMath.PI / 64.0) * 8192.0)
  }

  /**
   * 64-bit DCT perceptual hash (pHash) over a decoded raster — the
   * frequency-domain sibling of [[aHash64]] (public knowledge:
   * downscale, 2-D DCT, threshold the low-frequency block), computed
   * in exact fixed-point integer arithmetic so the result is
   * bit-reproducible:
   *
   *  - the raster area-pools to 32×32 (cell = truncated mean of the
   *    band-summed rectangle, same pooling as [[aHash64]]);
   *  - each cell is mean-centered WITHOUT division: `v = p·1024 − T`
   *    where `T = Σ p` — a uniform brightness shift `+c` moves `p` by
   *    exactly `bands·c` and `T` by `1024·bands·c`, so `v` (and hence
   *    every DCT coefficient and every bit) is EXACTLY invariant;
   *  - a 2-D DCT-II over `v` via [[DctC]] (separable: 8 row passes,
   *    then 8 column passes — O(32·32·8) multiplies); coefficients
   *    stay < 2^56, no overflow;
   *  - bit `v·8+u` is set iff the coefficient is strictly positive
   *    (the sign-threshold pHash variant; bit 0's DC coefficient is
   *    exactly zero under centering, so it is always clear).
   *
   * What this buys over [[aHash64]]: spatial-domain cell thresholds
   * break under a LUMINANCE RAMP (vignette, scanner gradient, uneven
   * lighting) — the ramp moves edge cells across the global mean.
   * In frequency space a horizontal ramp is energy in the (u odd,
   * v=0) column — bits {1,3,5,7}, all inside ONE 16-bit band of
   * [[graft.operators.Dedup.hammingNearPairs64]]'s 4-band split — so
   * ramped copies still share 3 bands and pair, while the aHash of the
   * same pair scatters flips across all bands (spec-measured).
   */
  private[operators] def pHash64(w: Int, h: Int, bands: Int,
                                 get: (Int, Int, Int) => Int): Long = {
    require(w >= 32 && h >= 32, s"pHash needs a raster >= 32x32, got ${w}x$h")
    // area-pool to 32×32 (exact integer: floor of rectangle mean)
    val p = new Array[Long](1024)
    var total = 0L
    var j = 0
    while (j < 32) {
      val y0 = j * h / 32; val y1 = (j + 1) * h / 32
      var i = 0
      while (i < 32) {
        val x0 = i * w / 32; val x1 = (i + 1) * w / 32
        var s = 0L
        var y = y0
        while (y < y1) {
          var x = x0
          while (x < x1) {
            var b = 0
            while (b < bands) { s += get(x, y, b); b += 1 }
            x += 1
          }
          y += 1
        }
        p(j * 32 + i) = s / ((y1 - y0).toLong * (x1 - x0))
        total += p(j * 32 + i)
        i += 1
      }
      j += 1
    }
    // mean-center scaled by 1024 (exact; kills the DC dependence on
    // absolute brightness), then separable DCT-II restricted to the
    // 8×8 low-frequency block
    val row = Array.ofDim[Long](8, 32) // row(u)(y) = Σ_x C(u,x)·v(x,y)
    var u = 0
    while (u < 8) {
      var y = 0
      while (y < 32) {
        var s = 0L
        var x = 0
        while (x < 32) {
          s += DctC(u)(x) * (p(y * 32 + x) * 1024L - total)
          x += 1
        }
        row(u)(y) = s
        y += 1
      }
      u += 1
    }
    val coef = new Array[Long](64) // coef(v*8+u) = Σ_y C(v,y)·row(u)(y)
    var v = 0
    while (v < 8) {
      var u2 = 0
      while (u2 < 8) {
        var s = 0L
        var y = 0
        while (y < 32) { s += DctC(v)(y) * row(u2)(y); y += 1 }
        coef(v * 8 + u2) = s
        u2 += 1
      }
      v += 1
    }
    // sign threshold (not the median/mean variant): each bit depends
    // on ITS coefficient alone, so a perturbation confined to one
    // frequency column cannot leak into other bits through a moving
    // threshold — the property the banded pairing guarantee needs.
    // coef(0,0) = (Σ v)·C0² = 0 exactly (v is mean-centered), so bit 0
    // is naturally clear.
    var hash = 0L
    var k = 1
    while (k < 64) { if (coef(k) > 0) hash |= 1L << k; k += 1 }
    hash
  }

  /** Per-image DCT perceptual hash: `(doc_id, phash)` — real ImageIO
    * decode, then [[pHash64]]. Partition-local, same shape as
    * [[imageAHash]]. */
  def imagePHash(media: Dataset[MediaRecord]): DataFrame = {
    import media.sparkSession.implicits._
    media.map { r =>
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(r.content))
      require(img != null, s"no image reader for doc ${r.doc_id}")
      val raster = img.getRaster
      (r.doc_id, pHash64(img.getWidth, img.getHeight, raster.getNumBands,
        (x, y, b) => raster.getSample(x, y, b)))
    }.toDF("doc_id", "phash")
  }

  /**
   * 64-bit perceptual fingerprint of a PCM sample STREAM — the audio
   * twin of [[aHash64]]: the stream splits into 64 equal time windows,
   * each window's truncated mean compares against the global mean of
   * window means (`m·64 > Σ m`, strict). Invariant under any positive
   * AFFINE amplitude transform (gain and DC offset): windows and the
   * total move in lockstep, so the bits cannot change (up to per-sample
   * rounding noise, far below any real signal's window contrasts). The
   * near-dup key for re-leveled, re-gained, or DC-shifted copies of the
   * same audio that a byte digest can never match.
   */
  private[operators] def audioHash64(n: Int, get: Int => Int): Long = {
    require(n >= 64, s"audioHash64 needs >= 64 samples, got $n")
    val m = new Array[Long](64)
    var total = 0L
    var k = 0
    while (k < 64) {
      val i0 = k * n / 64; val i1 = (k + 1) * n / 64
      var s = 0L
      var i = i0
      while (i < i1) { s += get(i); i += 1 }
      m(k) = s / (i1 - i0)
      total += m(k)
      k += 1
    }
    var hash = 0L
    var k2 = 0
    while (k2 < 64) { if (m(k2) * 64 > total) hash |= 1L << k2; k2 += 1 }
    hash
  }

  /** Per-clip perceptual audio hash: `(doc_id, ahash)` — real
    * `javax.sound` decode to the PCM data bytes (unsigned 8-bit view),
    * then [[audioHash64]]. Partition-local; 8-byte keys shuffle. */
  def audioAHash(media: Dataset[MediaRecord]): DataFrame = {
    import media.sparkSession.implicits._
    media.map { r =>
      val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(r.content))
      val data = try in.readAllBytes() finally in.close()
      (r.doc_id, audioHash64(data.length, i => data(i) & 0xFF))
    }.toDF("doc_id", "ahash")
  }

  /**
   * Perceptual-dedup audio fixture for `doc_id`: class = `id % 25`,
   * variant = `(id / 25) % 4` — 0 the base clip, 1 a DC-offset (+10)
   * copy, 2 a re-gained copy (`(s-128)·3/4 + 128`), 3 a
   * nearest-neighbor RESAMPLE to 3/4 length (4800 frames). 6400 base
   * samples in 64 constant-plus-wiggle windows (loud 200 / quiet 56 by
   * the class's [[mix64]] bits — far apart, so rounding under the gain
   * transform cannot flip a bit). All variants of a class collide
   * under [[audioHash64]]: gain/offset by the affine invariance, the
   * resample because the hash's 64 windows are RELATIVE to stream
   * length — a sample-rate change realigns nothing. Distinct classes
   * stay far apart — same oracle strategy as [[perturbedImage]].
   */
  def perturbedWav(docId: Long): Array[Byte] = {
    import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}
    val cls = docId % 25
    val variant = (docId / 25) % 4
    val bits = mix64(1000L + cls)
    val nBase = 6400
    val base = Array.tabulate(nBase) { i =>
      val win = i * 64 / nBase
      val b = (if (((bits >>> win) & 1L) == 1L) 200 else 56) + i * 7 % 5 - 2
      variant match {
        case 1 => b + 10
        case 2 => (b - 128) * 3 / 4 + 128
        case _ => b
      }
    }
    val data =
      if (variant == 3)
        // nearest-neighbor resample (the WavCodec.resize rule):
        // source frame = target * srcLen / dstLen, floor
        Array.tabulate(nBase * 3 / 4)(i =>
          base((i.toLong * nBase / (nBase * 3 / 4)).toInt).toByte)
      else base.map(_.toByte)
    val n = data.length
    val fmt = new AudioFormat(AudioFormat.Encoding.PCM_UNSIGNED, 8000f, 8, 1, 1, 8000f, false)
    val baos = new java.io.ByteArrayOutputStream()
    AudioSystem.write(
      new AudioInputStream(new java.io.ByteArrayInputStream(data), fmt, n.toLong),
      AudioFileFormat.Type.WAVE, baos)
    baos.toByteArray
  }

  // splitmix64 finalizer (public-domain mixing constants) — the
  // deterministic pattern generator behind the perceptual fixtures
  private def mix64(v: Long): Long = {
    var z = v + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  /** Bimodal 32×32 class pattern: cell `(ci,cj)` (4×4 px) is light
    * (value 200) iff bit `cj·8+ci` of `mix64(seed)` is set, else dark
    * (40) — pairwise far apart in aHash space for distinct seeds
    * (spec-pinned), identical under the perturbations the fixtures
    * apply. */
  private[operators] def classPattern(seed: Long)(x: Int, y: Int): Int = {
    val cell = (y / 4) * 8 + (x / 4)
    if (((mix64(seed) >>> cell) & 1L) == 1L) 200 else 40
  }

  /**
   * Perceptual-dedup image fixture for `doc_id`: class = `id % 25`
   * (the pattern), variant = `(id / 25) % 3` — 0 the base PNG, 1 a
   * brightness-shifted (+30) PNG, 2 a JPEG re-encode of the base
   * raster. All variants of a class must collide under [[aHash64]]
   * (shift-invariance / pooling robustness) while distinct classes
   * stay far apart, so the near-dup gate's oracle can derive the pair
   * classes arithmetically (`id % 25`) while the engine has to earn
   * them via genuine decode + hash.
   */
  def perturbedImage(docId: Long): Array[Byte] = {
    import java.awt.image.BufferedImage
    val cls = docId % 25
    val variant = (docId / 25) % 3
    val shift = if (variant == 1) 30 else 0
    val img = new BufferedImage(32, 32, BufferedImage.TYPE_BYTE_GRAY)
    val raster = img.getRaster
    var y = 0
    while (y < 32) {
      var x = 0
      while (x < 32) {
        raster.setSample(x, y, 0, classPattern(cls)(x, y) + shift)
        x += 1
      }
      y += 1
    }
    val baos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, if (variant == 2) "jpg" else "png", baos)
    baos.toByteArray
  }

  /**
   * Perceptual-dedup fixture for the DCT hash: class = `id % 25`
   * (bimodal 75/175 pattern, seed space disjoint from
   * [[perturbedImage]]), variant = `(id / 25) % 4` — 0 the base PNG,
   * 1 a brightness-shifted (+30) PNG, 2 a HORIZONTAL LUMINANCE RAMP
   * (`+(x−16)·4`, ±64 — uneven lighting / scanner gradient; the
   * perturbation [[aHash64]] cannot survive: edge-column cells move
   * up to 62 while the bimodal margin is 50), 3 a JPEG re-encode.
   * All four variants of a class must stay within the pairing budget
   * under [[pHash64]] — brightness exactly, the ramp because its DCT
   * energy is confined to the (u odd, v=0) bits {1,3,5,7} plus a
   * small threshold shift, the re-encode because JPEG preserves
   * low-frequency content — while distinct classes stay far apart.
   * Values are clamp-free by construction: 75−64 = 11, 175+64 = 239.
   */
  def perturbedImageP(docId: Long): Array[Byte] = {
    import java.awt.image.BufferedImage
    val cls = docId % 25
    val variant = (docId / 25) % 4
    val img = new BufferedImage(32, 32, BufferedImage.TYPE_BYTE_GRAY)
    val raster = img.getRaster
    var y = 0
    while (y < 32) {
      var x = 0
      while (x < 32) {
        val cell = (y / 4) * 8 + (x / 4)
        val base = if (((mix64(2000L + cls) >>> cell) & 1L) == 1L) 175 else 75
        val v = variant match {
          case 1 => base + 30
          case 2 => base + (x - 16) * 4
          case _ => base
        }
        raster.setSample(x, y, 0, v)
        x += 1
      }
      y += 1
    }
    val baos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, if (variant == 3) "jpg" else "png", baos)
    baos.toByteArray
  }

  /**
   * Derive a deterministic media table from the `documents` fixture:
   * the UTF-8 text bytes stand in for an encoded payload; media_type
   * cycles by id. (Real pipelines read binary files or parquet binary
   * columns directly — the downstream operators don't care.)
   */
  def mediaFromDocuments(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (col("doc_id") % 3 + 1).cast("int")).as("media_type"),
      encode(col("text"), "UTF-8").as("content"))

  /** Payload metadata — pure column ops, fully pushdown/codegen friendly. */
  def meta(media: DataFrame): DataFrame =
    media.select(
      col("doc_id"), col("media_type"),
      octet_length(col("content")).cast("long").as("byte_len"),
      sha2(col("content"), 256).as("sha256"),
      expr(s"cast(div(octet_length(content) + ${FrameBytes - 1}, $FrameBytes) as bigint)")
        .as("n_frames"))

  /**
   * Decode payloads to metadata. Partition-local: one decoder handle
   * per partition ([[MediaCodec.open]]), rows stream through it.
   */
  def decode(media: Dataset[MediaRecord],
             codec: MediaCodec = StandInCodec): Dataset[MediaInfo] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      // per-partition handle (amortized setup), closed at partition end
      mapWithDecoder(codec, it)((dec, r) => dec.decode(r))
    }
  }

  /** Resize payloads to a (w, h) target. Keeps the binary column
    * partition-local end to end. */
  def resize(media: Dataset[MediaRecord], w: Int, h: Int,
             codec: MediaCodec = StandInCodec): Dataset[MediaRecord] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      mapWithDecoder(codec, it)((dec, r) => dec.resize(r, w, h))
    }
  }

  /** Frame sampling for "video" payloads: every `everyN`-th fixed-size
    * frame, exploded to one row per sampled frame — shuffle-free. */
  def frameSample(media: DataFrame, everyN: Int): DataFrame =
    media.filter(col("media_type") === "video")
      // empty payloads have zero frames; without the octet_length guard
      // sequence(0, -1) would yield [0, -1] (descending) and emit
      // phantom frames
      .filter(octet_length(col("content")) > 0)
      .select(col("doc_id"),
        posexplode(expr(
          s"""filter(transform(sequence(0, cast(div(octet_length(content) + ${FrameBytes - 1}, $FrameBytes) as int) - 1),
             i -> struct(i as idx, substring(content, i * $FrameBytes + 1, $FrameBytes) as frame)),
             s -> s.idx % $everyN = 0)""")))
      .select(col("doc_id"), col("col.idx").as("frame_idx"), col("col.frame").as("frame"))

  /** Extract feature vectors — where a real vision/audio model forward
    * pass runs (per-partition handle, exactly this shape). */
  def features(media: Dataset[MediaRecord],
               codec: MediaCodec = StandInCodec): Dataset[MediaFeature] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      mapWithDecoder(codec, it)((dec, r) => dec.features(r))
    }
  }

  def asRecords(spark: SparkSession, media: DataFrame): Dataset[MediaRecord] = {
    import spark.implicits._
    media.as[MediaRecord]
  }
}
