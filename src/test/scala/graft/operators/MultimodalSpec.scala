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
