package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal (image/audio/video) column plumbing for a training-data
  * pipeline: media as opaque `binary` columns with typed metadata, processed
  * by batched per-partition transforms.
  *
  * The Spark-side architecture here is real and tested — schema, typed
  * Dataset encoders, batch shape, partition balance — while the codec call
  * itself is STUBBED (this environment ships no image/audio libraries):
  * [[MediaCodec.decodeFeatures]] is a deterministic fake standing in for
  * e.g. JPEG decode + CNN features. Swap that one function for a real codec
  * and nothing else changes.
  *
  * Scale design: decode is the expensive step at 100 TB, so the transform
  *  - is per-partition batched (amortizes codec/model init across a batch,
  *    the same reason PySpark uses `mapInPandas` batches),
  *  - follows an optional `repartition(n)` so a few giant files can't skew
  *    executor load,
  *  - never collects binaries to the driver.
  */
object Multimodal {

  /** Canonical stub "frame" size in bytes — shared with the frames gate
    * query (`graft.queries.Media`) so the sampling operator and the
    * oracle always slice at the same boundary.
    */
  val FrameBytes = 64

  /** One media object: opaque payload + typed metadata. */
  case class MediaRecord(
      media_id: Long,
      kind: String, // image | audio | video
      content: Array[Byte],
      width: Int, // image/video pixels; 0 for audio
      height: Int,
      sample_rate: Int, // audio Hz; 0 otherwise
      n_frames: Int) // video frames; 1 for image, 0 for audio

  /** Fixed-shape feature row produced by the decode step. */
  case class MediaFeatures(
      media_id: Long,
      kind: String,
      n_bytes: Int,
      features: Array[Long]) // 16-bin byte histogram (stub codec output)

  /** The codec boundary. Everything inside this object is the STUB. */
  object MediaCodec {
    val FeatureBins = 16

    /** STUB — deterministic fake decode: a real implementation would
      * decode the codec format and run feature extraction; this computes a
      * 16-bin byte histogram so tests and oracles are exact. Deliberately
      * the ONLY place that interprets `content`.
      */
    def decodeFeatures(content: Array[Byte]): Array[Long] = {
      val bins = new Array[Long](FeatureBins)
      var i = 0
      while (i < content.length) {
        bins((content(i) & 0xff) % FeatureBins) += 1
        i += 1
      }
      bins
    }

    /** STUB resize: a real one re-encodes pixels; the fake scales metadata
      * and truncates payload proportionally (deterministic). Pixel
      * dimensions only exist for images and video — other kinds pass
      * through untouched so their metadata contract (width/height = 0
      * for audio) is never contradicted.
      */
    def resize(rec: MediaRecord, w: Int, h: Int): MediaRecord = {
      if (rec.kind != "image" && rec.kind != "video") return rec
      // long arithmetic in the guard too: 65536×65536 overflows Int to
      // exactly 0 and would silently no-op the resize
      val scale = if (rec.width.toLong * rec.height == 0) 1.0
        else (w.toLong * h).toDouble / (rec.width.toLong * rec.height)
      // clamp in LONG: a large upscale's round() exceeds Int.MaxValue,
      // and .toInt-before-min would wrap negative and truncate the
      // payload to 1 byte instead of keeping all of it
      val n = math.max(1L, math.min(rec.content.length.toLong,
        math.round(rec.content.length * scale))).toInt
      rec.copy(content = rec.content.take(n), width = w, height = h)
    }

    /** Frame-id packing: media id in the high bits, frame index in the
      * low 32. Requires media ids below 2^31 (positive int range) so the
      * shift can neither sign-flip nor collide two media ids — validated
      * loudly rather than silently corrupting ids at the claimed corpus
      * scale.
      */
    def frameId(mediaId: Long, idx: Int): Long = {
      require(mediaId >= 0 && mediaId < (1L << 31),
        s"media_id=$mediaId outside [0, 2^31): frame-id packing would " +
          "collide or sign-flip; re-key media ids before frame sampling")
      (mediaId << 32) + idx
    }

    /** STUB frame sampling: every k-th "frame" of a video payload, where a
      * frame is a fixed-size byte slice. Emitted frames carry
      * kind="frame": re-applying sampleFrames is then a passthrough
      * (re-slicing would double-shift the id and lose the media id), and
      * frame ids can never be confused with the unmodified ids of
      * non-video records in the same output.
      */
    def sampleFrames(rec: MediaRecord, everyK: Int,
        frameBytes: Int = FrameBytes): Seq[MediaRecord] = {
      require(everyK >= 1, s"everyK=$everyK must be >= 1")
      require(frameBytes >= 1, s"frameBytes=$frameBytes must be >= 1")
      // empty payload: nothing to slice, but the record must not vanish —
      // every other non-sampleable input passes through
      if (rec.kind != "video" || rec.n_frames == 0 || rec.content.isEmpty)
        Seq(rec)
      else rec.content.grouped(frameBytes).zipWithIndex
        .filter(_._2 % everyK == 0)
        .map { case (frame, idx) =>
          // high/low bit packing: a dense multiplier (×10000) collided
          // once a video exceeded 10000 frames — frame (1,10000) == (2,0)
          rec.copy(media_id = frameId(rec.media_id, idx), content = frame,
            kind = "frame", n_frames = 1)
        }.toSeq
    }
  }

  /** Deterministic synthetic media over the `documents` table: payload =
    * UTF-8 bytes of the text, kind round-robins image/audio/video, metadata
    * derived from doc stats. Stands in for `spark.read.format("binaryFile")`.
    */
  def mediaFromDocuments(docs: DataFrame): Dataset[MediaRecord] = {
    import docs.sparkSession.implicits._
    docs.select(
      col("doc_id").as("media_id"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (col("doc_id") % 3 + 1).cast("int")).as("kind"),
      // ASCII-sanitize before encoding so one payload byte == one source
      // character BY CONSTRUCTION — the DuckDB oracle recomputes the
      // histogram from character ordinals, which would silently diverge
      // from UTF-8 bytes on any multi-byte character. coalesce: a NULL
      // text row must become an empty payload, not a null content array
      // that NPEs inside the decode task
      encode(regexp_replace(coalesce(col("text"), lit("")),
        "[^\\x00-\\x7F]", "?"), "UTF-8").as("content"),
      when(col("doc_id") % 3 === 0, (col("n_chars") % 64 + 1).cast("int"))
        .otherwise(0).cast("int").as("width"),
      when(col("doc_id") % 3 === 0, (col("n_chars") % 48 + 1).cast("int"))
        .otherwise(0).cast("int").as("height"),
      when(col("doc_id") % 3 === 1, lit(16000)).otherwise(0).cast("int").as("sample_rate"),
      when(col("doc_id") % 3 === 2, (col("n_chars") / 64 + 1).cast("int"))
        .when(col("doc_id") % 3 === 0, lit(1)).otherwise(0).cast("int").as("n_frames"))
      .as[MediaRecord]
  }

  /** Batched decode: one codec "session" per batch (the expensive-init
    * pattern), streaming through each partition without materializing it.
    */
  def extractFeatures(media: Dataset[MediaRecord],
      batchSize: Int = 64): Dataset[MediaFeatures] = {
    // fail fast on the driver: Iterator.grouped would otherwise throw
    // the same complaint from inside every executor task at action time
    require(batchSize >= 1, s"batchSize=$batchSize must be >= 1")
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        // real codecs would init once here, decode the batch, release
        batch.iterator.map { rec =>
          // defensive: a record built outside mediaFromDocuments can
          // carry a null payload; treat as empty rather than NPE the stage
          val content =
            if (rec.content == null) Array.emptyByteArray else rec.content
          MediaFeatures(rec.media_id, rec.kind, content.length,
            MediaCodec.decodeFeatures(content))
        }
      }
    }
  }
}
