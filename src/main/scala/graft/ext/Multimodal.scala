package graft.ext

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: media payloads as opaque `binary` columns
  * with typed metadata, plus a decode/feature-extract stage shaped the way
  * a real pipeline would run it (partition-wise batch processing so a codec
  * could amortize init per partition).
  *
  * The actual image/audio decode is STUBBED — the container has no media
  * libraries — with a clearly-marked deterministic fake that derives pseudo
  * width/height/duration from the payload bytes. The Spark-side plumbing
  * (schema, encoders, partition batching, null handling) is real and tested;
  * swapping `stubDecode` for a JNI/javax codec changes nothing structural.
  */
object Multimodal {

  /** A media row: opaque payload + source metadata. */
  final case class MediaRecord(media_id: Long, kind: String, payload: Array[Byte])

  /** Extracted features (the decode output contract). */
  final case class MediaFeatures(
      media_id: Long, kind: String, n_bytes: Long,
      width: Int, height: Int, duration_ms: Long, checksum: Long)

  /** STUB decode: deterministic pseudo-features from the bytes. A real
    * implementation would parse the container format here (libjpeg/ffmpeg);
    * everything around this call is production plumbing.
    */
  def stubDecode(r: MediaRecord): MediaFeatures = {
    val bytes = if (r.payload == null) Array.empty[Byte] else r.payload
    var h = 0L
    bytes.foreach(b => h = (h * 31 + (b & 0xff)) % 1000000007L)
    MediaFeatures(
      media_id = r.media_id,
      kind = r.kind,
      n_bytes = bytes.length.toLong,
      width = (h % 640).toInt + 1,
      height = ((h / 640) % 480).toInt + 1,
      duration_ms = if (r.kind == "audio") (h % 300000L) else 0L,
      checksum = h)
  }

  /** Decode stage: typed, partition-wise (codec init once per partition —
    * the Scala analogue of a Pandas-UDF `mapInPandas` batch loop).
    */
  def decodeFeatures(media: Dataset[MediaRecord]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      // real codecs would initialize here, once per partition
      it.map(stubDecode)
    }
  }

  /** Resized media (the resize stage's output contract): the payload is
    * re-encoded for the target geometry; n_bytes/checksum summarize it.
    */
  final case class ResizedMedia(media_id: Long, kind: String,
      target_w: Int, target_h: Int, n_bytes_out: Long, checksum_out: Long)

  /** Resize stage: partition-wise, codec init amortized per partition. The
    * STUB "re-encode" takes the first target_w·target_h/64 payload bytes
    * (deterministic); a real implementation would decode → scale → encode
    * in the same per-partition loop.
    */
  def resize(media: Dataset[MediaRecord], targetW: Int, targetH: Int): Dataset[ResizedMedia] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.map { r =>
        val bytes = if (r.payload == null) Array.empty[Byte] else r.payload
        val keep = math.min(bytes.length, targetW * targetH / 64)
        var h = 0L
        var i = 0
        while (i < keep) { h = (h * 31 + (bytes(i) & 0xff)) % 1000000007L; i += 1 }
        ResizedMedia(r.media_id, r.kind, targetW, targetH, keep.toLong, h)
      }
    }
  }

  /** A sampled frame: one row per `everyMs` of stub duration, capped. */
  final case class MediaFrame(media_id: Long, frame_idx: Int, ts_ms: Long,
      frame_checksum: Long)

  /** Frame-sampling stage: typed partition-wise flatMap — the row-expanding
    * member of the media pipeline (decode 1:1, resize 1:1, sample 1:N with
    * the cardinality CAPPED so a corrupt duration cannot explode a task).
    * Stub duration for time-media (audio/video) derives from the payload
    * checksum (`checksum % 300000` ms); images sample a single frame.
    * Frame checksums are integer arithmetic over the payload hash — exact
    * and engine-portable, so the whole stage is value-oracled (q67).
    */
  def sampleFrames(media: Dataset[MediaRecord], everyMs: Long,
      maxFrames: Int): Dataset[MediaFrame] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.flatMap { r =>
        val f = stubDecode(r)
        val durMs = if (r.kind == "image") 0L else f.checksum % 300000L
        val n = math.min(durMs / everyMs + 1, maxFrames.toLong).toInt
        (0 until n).map { k =>
          MediaFrame(r.media_id, k, k * everyMs, (f.checksum * 31 + k) % 1000000007L)
        }
      }
    }
  }

  /** Build a media table from the documents corpus: payload = UTF-8 bytes of
    * the text (stand-in for image/audio bytes), kind assigned round-robin.
    * This is how a binary column enters the engine: `cast(string as binary)`
    * at ingest, or raw bytes from parquet/object storage.
    */
  def mediaFromDocuments(spark: SparkSession, docs: DataFrame): Dataset[MediaRecord] = {
    import spark.implicits._
    docs.select(
      col("doc_id").as("media_id"),
      when(col("doc_id") % 3 === 0, "image")
        .when(col("doc_id") % 3 === 1, "audio").otherwise("video").as("kind"),
      col("text").cast("binary").as("payload"))
      .as[MediaRecord]
  }

  /** Perceptual average-hash of a media payload, banded for LSH joining.
    * The STUB "decode to 8×8 grayscale" takes the first 64 payload bytes
    * as pixels (a real codec would decode + downscale here; everything
    * downstream is unchanged). aHash bit i = pixel_i > mean, computed in
    * exact integer math (`px·64 > Σpx` — no FP mean), packed as 4 band
    * keys of 16 bits each. Pigeonhole: two hashes within Hamming
    * distance 3 MUST agree on at least one of the 4 bands, so a
    * (band_idx, band_key) equi-join has guaranteed recall at d ≤ 3 —
    * the SimHash banding argument applied to image hashes. Payloads
    * under 64 bytes are dropped (no full pixel block).
    */
  final case class MediaHash(media_id: Long, n_bytes: Long, bands: Seq[Int])

  def aHashBands(media: Dataset[MediaRecord]): Dataset[MediaHash] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.flatMap { r =>
        val bytes = if (r.payload == null) Array.empty[Byte] else r.payload
        if (bytes.length < 64) Iterator.empty
        else {
          val px = bytes.take(64).map(b => (b & 0xff).toLong)
          val tot = px.sum
          val bands = (0 until 4).map { b =>
            var k = 0
            var j = 0
            while (j < 16) {
              k = k * 2 + (if (px(b * 16 + j) * 64 > tot) 1 else 0)
              j += 1
            }
            k
          }
          Iterator.single(MediaHash(r.media_id, bytes.length.toLong, bands))
        }
      }
    }
  }
}
