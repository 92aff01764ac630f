package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: media (image/audio/video) carried as opaque
  * `binary` payloads next to typed metadata, with decode / feature-extract
  * as partition-local batch transforms.
  *
  * The decode step itself is STUBBED (no image/audio codecs in this
  * container — see [[StubDecoder]], clearly marked): what is real and
  * tested is the Spark-side shape a 100 TB media pipeline needs —
  *   - schema: (id, media_type, payload binary, meta struct)
  *   - partition-sized batches through `mapPartitions` on a typed Dataset
  *     (the Scala analogue of `mapInPandas`: one iterator per partition,
  *     amortizing model/codec init across the batch, never per-row)
  *   - deterministic feature schema out, columnar-friendly
  */
object Media {

  final case class MediaRow(
      id: Long, media_type: String, payload: Array[Byte],
      width_hint: Int, duration_ms: Long)

  final case class MediaFeatures(
      id: Long, media_type: String, byte_len: Int, payload_hash: Long,
      width: Int, height: Int, n_frames: Int, mean_luma: Double)

  /** STUB decoder — deterministic fake features derived from payload bytes.
    * A real deployment replaces ONLY this function with a codec call
    * (e.g. javax.imageio / ffmpeg bindings); everything around it — batch
    * iteration, schema, partitioning — is the production shape. */
  object StubDecoder {
    def decode(row: MediaRow): MediaFeatures = {
      val h = row.payload.foldLeft(1125899906842597L)((a, b) => 31 * a + b)
      MediaFeatures(
        id = row.id,
        media_type = row.media_type,
        byte_len = row.payload.length,
        payload_hash = h,
        width = math.abs(h % 1920).toInt + 1,
        height = math.abs(h % 1080).toInt + 1,
        n_frames = if (row.media_type == "video") math.abs(h % 300).toInt + 1 else 1,
        mean_luma = math.abs(h % 256).toDouble / 255.0)
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
      rows.map(StubDecoder.decode)
    }
  }
}
