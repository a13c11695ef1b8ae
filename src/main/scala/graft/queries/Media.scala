package graft.queries

import graft.Tables
import graft.multimodal.Multimodal
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Driver-gate coverage for the multimodal path: synthetic media blobs from
  * `documents`, batched mapPartitions decode (stub codec = exact byte
  * histogram), features exploded to (media_id, bin, cnt) rows that DuckDB
  * recomputes from the source text (ASCII corpus ⇒ char ordinal == byte).
  */
object Media {

  def qMediaFeatures(s: SparkSession, d: String): DataFrame = {
    val media = Multimodal.mediaFromDocuments(Tables.documents(s, d))
    Multimodal.extractFeatures(media)
      .select(col("media_id"), col("kind"), col("n_bytes"),
        posexplode(col("features")).as(Seq("bin", "cnt")))
      .orderBy(col("media_id"), col("bin"))
  }

  /** Frame size for the sampling operator (bytes) — the canonical
    * constant lives with the operator so gate and operator cannot drift.
    */
  val FrameBytes: Int = graft.multimodal.Multimodal.FrameBytes

  /** Frame sampling: every media blob sliced into fixed 64-byte frames
    * with per-frame checksums — the video-frame-extraction stand-in, and
    * the chunking pass a multimodal pipeline runs before per-frame
    * featurization. Byte slicing needs no codec, so unlike the decode
    * stub this is REAL end-to-end: pure native expressions (binary
    * substr + md5), a narrow scan exploding to O(bytes/64) rows, zero
    * shuffles before the presentation sort.
    */
  def qMediaFrames(s: SparkSession, d: String): DataFrame = {
    val media = Multimodal.mediaFromDocuments(Tables.documents(s, d)).toDF()
    val n = length(col("content"))
    val frames = when(n >= 1,
      transform(
        sequence(lit(0), floor((n + FrameBytes - 1) / FrameBytes).cast("int") - 1),
        i => col("content").substr(i * FrameBytes + 1, lit(FrameBytes))))
      .otherwise(typedLit(Seq.empty[Array[Byte]]))
    media
      .select(col("media_id"), col("kind"),
        posexplode(frames).as(Seq("frame_idx", "frame")))
      .select(col("media_id"), col("kind"), col("frame_idx"),
        length(col("frame")).as("frame_len"),
        md5(col("frame")).as("frame_md5"))
      .orderBy(col("media_id"), col("frame_idx"))
  }

  val oracle: Map[String, String] = Map(
    "q_media_frames" ->
      s"""WITH d0 AS (SELECT doc_id,
         |    regexp_replace(text, '[^\\x00-\\x7F]', '?', 'g') AS text
         |  FROM documents)
         |SELECT doc_id AS media_id,
         |  CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'image'
         |    WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
         |  CAST(i AS INT) AS frame_idx,
         |  CAST(length(substr(text, CAST(i*$FrameBytes+1 AS INT), $FrameBytes))
         |    AS INT) AS frame_len,
         |  md5(substr(text, CAST(i*$FrameBytes+1 AS INT), $FrameBytes))
         |    AS frame_md5
         |FROM d0 CROSS JOIN
         |  unnest(range(0, (length(text)+${FrameBytes - 1})//$FrameBytes)) u(i)
         |ORDER BY media_id, frame_idx""".stripMargin,

    "q_media_features" ->
      """WITH d0 AS (SELECT doc_id,
        |    regexp_replace(text, '[^\x00-\x7F]', '?', 'g') AS text
        |  FROM documents),
        |bins AS (SELECT doc_id,
        |    unnest(list_transform(range(1, length(text)+1),
        |      i -> ord(substr(text, i, 1)) % 16)) AS bin
        |  FROM d0),
        |counts AS (SELECT doc_id, bin, count(*) AS cnt FROM bins GROUP BY 1, 2)
        |SELECT d.doc_id AS media_id,
        |  CASE CAST(d.doc_id % 3 AS INT) WHEN 0 THEN 'image'
        |    WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
        |  CAST(length(d.text) AS INT) AS n_bytes,
        |  CAST(b.range AS INT) AS bin,
        |  CAST(coalesce(c.cnt, 0) AS BIGINT) AS cnt
        |FROM documents d
        |CROSS JOIN range(0, 16) b
        |LEFT JOIN counts c ON c.doc_id = d.doc_id AND c.bin = b.range
        |ORDER BY media_id, bin""".stripMargin
  )

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_media_features" -> (qMediaFeatures _),
    "q_media_frames" -> (qMediaFrames _)
  )
}
