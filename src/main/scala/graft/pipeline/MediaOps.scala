package graft.pipeline

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video payloads ride as opaque
  * `binary` columns with typed metadata; decode / feature-extract / resize /
  * frame-sample run as partition-parallel functions over those bytes.
  *
  * The actual codecs are NOT in this container, so the decode kernel is a
  * clearly-marked deterministic stub ([[stubDecode]]); everything around it —
  * schema, batching, partitioning, projection discipline (never shuffle the
  * binary column; extract features in the same stage as the scan) — is the
  * real, tested Spark plumbing. Swapping [[stubDecode]] for a JNI/ffmpeg call
  * changes nothing structurally.
  */
object MediaOps {

  /** STUB decode: a real implementation would decode the media container.
    * Here: deterministic fake — "frames" are 256-byte slices, the "feature"
    * per frame is (min, max, sum%256, len) over the slice bytes. */
  def stubDecode(payload: Array[Byte], frameSize: Int): Seq[(Int, Int, Int, Int)] = {
    if (payload == null) return Seq.empty
    payload.grouped(frameSize).map { frame =>
      var mn = 255; var mx = 0; var sum = 0
      frame.foreach { b => val v = b & 0xff; if (v < mn) mn = v; if (v > mx) mx = v; sum += v }
      (mn, mx, sum % 256, frame.length)
    }.toSeq
  }

  val decodeUdf = udf((payload: Array[Byte], frameSize: Int) => stubDecode(payload, frameSize))

  /** Media table from documents: payload = UTF-8 bytes of text (a stand-in
    * for real image/audio bytes), with typed metadata columns. */
  def asMediaTable(docs: DataFrame): DataFrame =
    docs.select(col("doc_id").as("media_id"),
      encode(col("text"), "UTF-8").as("payload"),
      lit("fake/media").as("mime"),
      octet_length(encode(col("text"), "UTF-8")).as("n_bytes"))

  /** Frame-sample + feature-extract: one row per sampled frame with its stub
    * feature tuple. `sampleEvery` keeps every k-th frame (video frame
    * sampling shape). The explode happens before any shuffle, in the scan
    * stage, and the payload column is dropped immediately after decode. */
  def frameFeatures(docs: DataFrame, frameSize: Int = 256, sampleEvery: Int = 2): DataFrame =
    asMediaTable(docs)
      .select(col("media_id"), col("n_bytes"),
        posexplode(decodeUdf(col("payload"), lit(frameSize))).as(Seq("frame_no", "feat")))
      .filter(col("frame_no") % sampleEvery === 0)
      .select(col("media_id"), col("n_bytes"), col("frame_no"),
        col("feat._1").as("f_min"), col("feat._2").as("f_max"),
        col("feat._3").as("f_sum_mod"), col("feat._4").as("f_len"))

  /** Pure-metadata media accounting — fully oracle-checkable (no stub):
    * (media_id, n_bytes, n_frames) with n_frames = ceil(n_bytes/frameSize). */
  def mediaStats(docs: DataFrame, frameSize: Int = 256): DataFrame =
    asMediaTable(docs).select(col("media_id"), col("n_bytes"),
      floor((col("n_bytes") + frameSize - 1) / frameSize).cast("long").as("n_frames"))
}
