package graft.multimodal

import graft.SparkSpec
import graft.multimodal.Multimodal._

class MultimodalSpec extends SparkSpec {

  private def docs = {
    import spark.implicits._
    Seq(
      (0L, "abc abc", "en", "s", 7L),
      (1L, "hello world", "en", "s", 11L),
      (2L, "0123456789" * 20, "en", "s", 200L)
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
  }

  test("mediaFromDocuments: schema, kinds, typed metadata") {
    val m = mediaFromDocuments(docs).collect().sortBy(_.media_id)
    assert(m.map(_.kind).toSeq == Seq("image", "audio", "video"))
    assert(m(0).width > 0 && m(0).height > 0 && m(0).n_frames == 1)
    assert(m(1).sample_rate == 16000 && m(1).width == 0)
    assert(m(2).n_frames == 200 / 64 + 1)
    assert(new String(m(1).content, "UTF-8") == "hello world")
  }

  test("extractFeatures: histogram is exact and batch size independent") {
    val media = mediaFromDocuments(docs)
    val f1 = extractFeatures(media, batchSize = 1).collect().sortBy(_.media_id)
    val f64 = extractFeatures(media, batchSize = 64).collect().sortBy(_.media_id)
    assert(f1.map(_.features.toSeq).toSeq == f64.map(_.features.toSeq).toSeq,
      "batching must not change results")
    // "abc abc": bytes a=97,b=98,c=99,space=32 → bins 1,2,3,0 with counts 2,2,2,1
    val h = f1(0)
    assert(h.n_bytes == 7)
    assert(h.features(1) == 2 && h.features(2) == 2 && h.features(3) == 2
      && h.features(0) == 1 && h.features.sum == 7)
  }

  test("resize scales payload with metadata, deterministic") {
    val rec = mediaFromDocuments(docs).filter(_.kind == "image").head()
    val small = MediaCodec.resize(rec, rec.width / 2 + 1, rec.height / 2 + 1)
    assert(small.width == rec.width / 2 + 1)
    assert(small.content.length <= rec.content.length && small.content.length > 0)
    assert(MediaCodec.resize(rec, small.width, small.height).content
      .sameElements(small.content))
  }

  test("frame sampling keeps every k-th frame of video only") {
    val video = mediaFromDocuments(docs).filter(_.kind == "video").head()
    val frames = MediaCodec.sampleFrames(video, everyK = 2, frameBytes = 50)
    val total = (video.content.length + 49) / 50
    assert(frames.length == (total + 1) / 2)
    assert(frames.forall(_.n_frames == 1))
    val image = mediaFromDocuments(docs).filter(_.kind == "image").head()
    assert(MediaCodec.sampleFrames(image, 2) == Seq(image))
  }

  test("hardening: resize overflow/kind guards, frame-id bounds, empty " +
      "payload passthrough, fail-fast batch size") {
    val img = mediaFromDocuments(docs).filter(_.kind == "image").head()
    // huge upscale: the byte count must clamp to the full payload, not
    // wrap negative and truncate to 1 byte
    val up = MediaCodec.resize(img, 65535, 65535)
    assert(up.content.length == img.content.length, up.content.length)
    // audio has no pixel dimensions: resize is a passthrough, never
    // stamping contradictory width/height metadata
    val audio = mediaFromDocuments(docs).filter(_.kind == "audio").head()
    assert(MediaCodec.resize(audio, 640, 480) == audio)
    // an empty video payload passes through instead of vanishing
    val emptyVid = Multimodal.MediaRecord(7L, "video",
      Array.emptyByteArray, 0, 0, 0, 1)
    assert(MediaCodec.sampleFrames(emptyVid, 2) == Seq(emptyVid))
    // frames carry kind="frame": resampling is passthrough (no double id
    // shift), and ids pack media id in the high bits
    val video = mediaFromDocuments(docs).filter(_.kind == "video").head()
    val frames = MediaCodec.sampleFrames(video, 1, frameBytes = 50)
    assert(frames.forall(_.kind == "frame"))
    assert(MediaCodec.sampleFrames(frames.head, 1) == Seq(frames.head))
    assert(frames.head.media_id == (video.media_id << 32))
    // media ids outside [0, 2^31) are refused, not silently corrupted
    intercept[IllegalArgumentException] {
      MediaCodec.frameId(1L << 31, 0)
    }
    intercept[IllegalArgumentException] {
      extractFeatures(mediaFromDocuments(docs), batchSize = 0)
    }
  }

  test("decode pipeline is partition-parallel, no driver collect") {
    val m = mediaFromDocuments(docs).repartition(3)
    val out = extractFeatures(m)
    assert(out.rdd.getNumPartitions == 3)
    assert(out.count() == 3)
  }
}
