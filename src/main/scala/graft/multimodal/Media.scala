package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: media (image/audio/video) carried as opaque
  * `binary` payloads next to typed metadata, with decode / feature-extract
  * as partition-local batch transforms.
  *
  *   - schema: (id, media_type, payload binary, meta)
  *   - partition-sized batches through `mapPartitions` on a typed Dataset
  *     (the Scala analogue of `mapInPandas`: one iterator per partition,
  *     amortizing codec init across the batch, never per-row)
  *   - deterministic feature schema out, columnar-friendly
  *
  * Decoding is REAL for self-contained formats ([[Decoders]]: full PNG
  * pixel decode incl. zlib inflate + unfilter, WAV PCM16 with RMS/peak,
  * JPEG/GIF header decode) and routed by magic bytes; payloads that need
  * an external codec (video containers, entropy-coded image data) fall
  * back to [[StubDecoder]], a clearly-marked deterministic stand-in a
  * deployment replaces with libjpeg/ffmpeg bindings.
  */
object Media {

  final case class MediaRow(
      id: Long, media_type: String, payload: Array[Byte],
      width_hint: Int, duration_ms: Long)

  final case class MediaFeatures(
      id: Long, media_type: String, decoder: String, byte_len: Int,
      payload_hash: Long, width: Int, height: Int, channels: Int,
      n_frames: Int, mean_luma: Double, sample_rate: Int,
      audio_duration_ms: Long, rms: Double)

  private def payloadHash(payload: Array[Byte]): Long =
    payload.foldLeft(1125899906842597L)((a, b) => 31 * a + b)

  /** STUB decoder — deterministic fake features derived from payload
    * bytes, used ONLY when no pure-JVM decoder applies. A real deployment
    * replaces this function with a codec call; everything around it —
    * sniffing, batch iteration, schema, partitioning — is the production
    * shape. */
  object StubDecoder {
    def decode(row: MediaRow): MediaFeatures = {
      val h = payloadHash(row.payload)
      MediaFeatures(
        id = row.id,
        media_type = row.media_type,
        decoder = "stub",
        byte_len = row.payload.length,
        payload_hash = h,
        width = math.abs(h % 1920).toInt + 1,
        height = math.abs(h % 1080).toInt + 1,
        channels = 3,
        n_frames = if (row.media_type == "video") math.abs(h % 300).toInt + 1 else 1,
        mean_luma = math.abs(h % 256).toDouble / 255.0,
        sample_rate = 0, audio_duration_ms = 0L, rms = 0.0)
    }
  }

  /** Decode one payload: real decoder by magic bytes, stub otherwise.
    * A corrupt payload must never fail the whole ingest job (one bad blob
    * in a 100 TB scan would kill the stage), so any decoder throw degrades
    * to the stub features for that row. */
  def decode(row: MediaRow): MediaFeatures =
    scala.util.Try(decodeStrict(row)).getOrElse(StubDecoder.decode(row))

  private def decodeStrict(row: MediaRow): MediaFeatures = {
    val h = payloadHash(row.payload)
    def image(info: Decoders.ImageInfo, decoder: String) = MediaFeatures(
      row.id, row.media_type, decoder, row.payload.length, h,
      info.width, info.height, info.channels, 1, info.meanLuma,
      0, 0L, 0.0)
    Decoders.sniff(row.payload) match {
      case "png" =>
        Decoders.png(row.payload) match {
          case Some(info) => image(info, "png")
          case None => StubDecoder.decode(row)
        }
      case "jpeg" =>
        Decoders.jpeg(row.payload) match {
          case Some(info) => image(info, "jpeg-header")
          case None => StubDecoder.decode(row)
        }
      case "gif" =>
        Decoders.gif(row.payload) match {
          case Some(info) => image(info, "gif-header")
          case None => StubDecoder.decode(row)
        }
      case "wav" =>
        Decoders.wav(row.payload) match {
          case Some(a) => MediaFeatures(
            row.id, row.media_type, "wav", row.payload.length, h,
            0, 0, a.channels, 1, -1.0, a.sampleRate, a.durationMs, a.rms)
          case None => StubDecoder.decode(row)
        }
      case _ => StubDecoder.decode(row)
    }
  }

  /** Wrap a text corpus as a fake media table: payload = utf8 bytes.
    * Stands in for `spark.read.format("binaryFile")` at production. */
  def fromDocuments(docs: DataFrame): Dataset[MediaRow] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(
        col("doc_id").as("id"),
        when(col("doc_id") % 3 === 0, "image")
          .when(col("doc_id") % 3 === 1, "audio")
          .otherwise("video").as("media_type"),
        encode(col("text"), "UTF-8").as("payload"),
        lit(0).as("width_hint"),
        (col("n_chars") * 10L).as("duration_ms"))
      .as[MediaRow]
  }

  /** Partition-local batch decode: one decoder instance per partition,
    * rows streamed through it. */
  def extractFeatures(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { rows =>
      // per-partition init would go here (codec handles, model weights)
      rows.map(decode)
    }
  }

  final case class ResizedMedia(
      id: Long, decoder: String, width: Int, height: Int,
      payload: Array[Byte])

  /** Batch image resize: REAL for decodable PNGs (pixel decode →
    * nearest-neighbor resample → PNG re-encode, all pure JVM), stub
    * pass-through for payloads needing an external codec. Same
    * partition-local batch shape as [[extractFeatures]] — at 100 TB this
    * is a map-only stage, no shuffle, output columnar alongside the
    * original. */
  def resizeImages(
      media: Dataset[MediaRow], w: Int, h: Int): Dataset[ResizedMedia] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { rows =>
      rows.map { r =>
        Decoders.pngPixels(r.payload) match {
          case Some(img) =>
            val out = Decoders.resizeNearest(img, w, h)
            ResizedMedia(r.id, "png", w, h, Decoders.encodePng(out))
          case None => // stub: a deployment calls its codec here
            ResizedMedia(r.id, "stub", w, h, r.payload)
        }
      }
    }
  }

  final case class FrameSample(
      id: Long, frame_idx: Int, ts_ms: Long, payload_hash: Long,
      mean_luma: Double)

  /** Uniform-stride video frame sampling: one row per sampled frame at
    * `intervalMs` spacing, capped at `maxFrames` per video. The SELECTION
    * and row fan-out are the real production plumbing (flatMap, one
    * output row per sampled timestamp, deterministic cap so a 10-hour
    * video cannot explode a partition); the per-frame DECODE is stubbed
    * with deterministic fake features — video containers need an external
    * codec (ffmpeg binding) which a deployment drops into the marked
    * line. */
  def sampleFrames(
      media: Dataset[MediaRow], intervalMs: Long,
      maxFrames: Int = 64): Dataset[FrameSample] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.filter(_.media_type == "video").flatMap { r =>
      val wanted = (r.duration_ms / math.max(1L, intervalMs)) + 1
      val n = math.max(1L, math.min(maxFrames.toLong, wanted)).toInt
      val h = payloadHash(r.payload)
      (0 until n).iterator.map { i =>
        // STUB frame decode — deterministic features per (payload, frame)
        FrameSample(r.id, i, i * intervalMs, h,
          math.floorMod(h * 31 + i, 256).toDouble / 255.0)
      }
    }
  }
}
