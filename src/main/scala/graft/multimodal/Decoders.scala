package graft.multimodal

import java.util.zip.Inflater

/** Pure-JVM media decoders — REAL codec work, no external libraries:
  *
  *   - [[png]] — full pixel decode of non-interlaced 8-bit PNG: chunk
  *     walk, zlib inflate of the IDAT stream (`java.util.zip.Inflater`),
  *     per-scanline unfilter (None/Sub/Up/Average/Paeth, the PNG spec's
  *     filter algebra), and mean-luma feature extraction over the
  *     reconstructed pixels.
  *   - [[jpeg]] — header decode: marker-segment walk to the SOF frame for
  *     dimensions/channels (entropy decode of the scan data is out of
  *     scope — that is where a deployment links libjpeg).
  *   - [[gif]] — logical-screen descriptor decode.
  *   - [[wav]] — RIFF chunk walk + full PCM16 sample decode with RMS and
  *     peak amplitude extraction.
  *
  * These upgrade the multimodal surface from "stubbed decode" to real
  * partition-local decode for self-contained formats; [[Media]] routes by
  * [[sniff]] and falls back to the deterministic stub only for payloads
  * that genuinely need an external codec (video containers, entropy-coded
  * image data).
  */
object Decoders {

  final case class ImageInfo(
      format: String, width: Int, height: Int, channels: Int,
      meanLuma: Double) // meanLuma = -1 when only the header was decoded

  final case class AudioInfo(
      format: String, channels: Int, sampleRate: Int, bitsPerSample: Int,
      durationMs: Long, rms: Double, peak: Double)

  /** Magic-byte container sniffing. */
  def sniff(b: Array[Byte]): String =
    if (b.length >= 8 && (b(0) & 0xff) == 0x89 && b(1) == 'P' &&
      b(2) == 'N' && b(3) == 'G') "png"
    else if (b.length >= 3 && (b(0) & 0xff) == 0xff && (b(1) & 0xff) == 0xd8)
      "jpeg"
    else if (b.length >= 6 && b(0) == 'G' && b(1) == 'I' && b(2) == 'F') "gif"
    else if (b.length >= 12 && b(0) == 'R' && b(1) == 'I' && b(2) == 'F' &&
      b(3) == 'F' && b(8) == 'W' && b(9) == 'A' && b(10) == 'V' &&
      b(11) == 'E') "wav"
    else "unknown"

  private def be32(b: Array[Byte], i: Int): Int =
    ((b(i) & 0xff) << 24) | ((b(i + 1) & 0xff) << 16) |
      ((b(i + 2) & 0xff) << 8) | (b(i + 3) & 0xff)
  private def be16(b: Array[Byte], i: Int): Int =
    ((b(i) & 0xff) << 8) | (b(i + 1) & 0xff)
  private def le32(b: Array[Byte], i: Int): Int =
    (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8) |
      ((b(i + 2) & 0xff) << 16) | ((b(i + 3) & 0xff) << 24)
  private def le16(b: Array[Byte], i: Int): Int =
    (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8)

  /** Reconstructed 8-bit image: channel-interleaved row-major pixels. */
  final case class PixelImage(
      width: Int, height: Int, channels: Int, colorType: Int,
      pixels: Array[Int])

  private final case class PngChunks(
      width: Int, height: Int, bitDepth: Int, colorType: Int,
      interlace: Int, idat: Array[Byte])

  private def pngChunks(b: Array[Byte]): Option[PngChunks] = {
    if (sniff(b) != "png" || b.length < 33) return None
    var width, height, bitDepth, colorType, interlace = -1
    val idat = new java.io.ByteArrayOutputStream()
    var i = 8
    var done = false
    while (!done && i + 8 <= b.length) {
      val len = be32(b, i)
      val ctype = new String(b, i + 4, 4, "US-ASCII")
      val dataAt = i + 8
      // a corrupt negative length would stall the walk (i = dataAt+len+4
      // is stationary at len = -12) or crash the IDAT copy — reject it
      if (len < 0 || dataAt + len > b.length) return None
      ctype match {
        case "IHDR" =>
          width = be32(b, dataAt); height = be32(b, dataAt + 4)
          bitDepth = b(dataAt + 8) & 0xff; colorType = b(dataAt + 9) & 0xff
          interlace = b(dataAt + 12) & 0xff
        case "IDAT" => idat.write(b, dataAt, len)
        case "IEND" => done = true
        case _ => // ancillary chunk, skip
      }
      i = dataAt + len + 4 // skip CRC
    }
    if (width <= 0 || height <= 0) None
    else Some(PngChunks(
      width, height, bitDepth, colorType, interlace, idat.toByteArray))
  }

  private def channelsOf(colorType: Int): Int = colorType match {
    case 0 => 1; case 2 => 3; case 4 => 2; case 6 => 4; case _ => -1
  }

  /** Inflate + unfilter the scanline stream; None when the payload needs
    * an unsupported mode (non-8-bit, interlaced) or is truncated. */
  private def pixelsFrom(h: PngChunks): Option[PixelImage] = {
    val channels = channelsOf(h.colorType)
    if (channels < 0 || h.bitDepth != 8 || h.interlace != 0) return None

    // inflate the filtered scanline stream
    val stride = h.width * channels
    val raw = new Array[Byte]((stride + 1) * h.height)
    val inf = new Inflater()
    inf.setInput(h.idat)
    var off = 0
    while (!inf.finished() && off < raw.length) {
      val n = inf.inflate(raw, off, raw.length - off)
      if (n == 0 && inf.needsInput()) return None // truncated
      off += n
    }
    inf.end()
    if (off < raw.length) return None

    // unfilter: PNG spec filters 0-4 per scanline
    val img = new Array[Int](stride * h.height)
    var y = 0
    while (y < h.height) {
      val filter = raw(y * (stride + 1)) & 0xff
      val rowAt = y * (stride + 1) + 1
      var x = 0
      while (x < stride) {
        val cur = raw(rowAt + x) & 0xff
        val left = if (x >= channels) img(y * stride + x - channels) else 0
        val up = if (y > 0) img((y - 1) * stride + x) else 0
        val upLeft =
          if (y > 0 && x >= channels) img((y - 1) * stride + x - channels)
          else 0
        val rec = filter match {
          case 0 => cur
          case 1 => cur + left
          case 2 => cur + up
          case 3 => cur + (left + up) / 2
          case 4 => // Paeth predictor
            val p = left + up - upLeft
            val pa = math.abs(p - left); val pb = math.abs(p - up)
            val pc = math.abs(p - upLeft)
            cur + (if (pa <= pb && pa <= pc) left
              else if (pb <= pc) up else upLeft)
          case _ => return None
        }
        img(y * stride + x) = rec & 0xff
        x += 1
      }
      y += 1
    }
    Some(PixelImage(h.width, h.height, channels, h.colorType, img))
  }

  /** Mean luma over reconstructed pixels (BT.601 weights for color). */
  def meanLuma(img: PixelImage): Double = {
    val stride = img.width * img.channels
    var sum = 0.0
    var p = 0
    while (p < stride * img.height) {
      sum += (img.colorType match {
        case 0 | 4 => img.pixels(p).toDouble
        case _ =>
          0.299 * img.pixels(p) + 0.587 * img.pixels(p + 1) +
            0.114 * img.pixels(p + 2)
      })
      p += img.channels
    }
    sum / (img.width.toLong * img.height) / 255.0
  }

  /** Full pixel decode of non-interlaced 8-bit PNG. */
  def pngPixels(b: Array[Byte]): Option[PixelImage] =
    pngChunks(b).flatMap(pixelsFrom)

  /** Full PNG decode: 8-bit depth, color types 0/2/4/6, non-interlaced;
    * header-only (meanLuma = -1) when pixels need an unsupported mode. */
  def png(b: Array[Byte]): Option[ImageInfo] =
    pngChunks(b).map { h =>
      pixelsFrom(h) match {
        case Some(img) =>
          ImageInfo("png", h.width, h.height, img.channels, meanLuma(img))
        case None => ImageInfo("png", h.width, h.height,
          math.max(channelsOf(h.colorType), 0), -1.0)
      }
    }

  /** Nearest-neighbor resize over decoded pixels — real image transform
    * work, partition-local, allocation-exact. */
  def resizeNearest(img: PixelImage, w: Int, h: Int): PixelImage = {
    val out = new Array[Int](w * h * img.channels)
    var y = 0
    while (y < h) {
      val sy = (y.toLong * img.height / h).toInt
      var x = 0
      while (x < w) {
        val sx = (x.toLong * img.width / w).toInt
        var c = 0
        while (c < img.channels) {
          out((y * w + x) * img.channels + c) =
            img.pixels((sy * img.width + sx) * img.channels + c)
          c += 1
        }
        x += 1
      }
      y += 1
    }
    PixelImage(w, h, img.channels, img.colorType, out)
  }

  /** Real PNG encoder: IHDR + one deflated filter-0 IDAT + IEND, CRC32
    * per chunk — round-trips through [[png]]/[[pngPixels]]. */
  def encodePng(img: PixelImage): Array[Byte] = {
    val stride = img.width * img.channels
    val raw = new Array[Byte]((stride + 1) * img.height)
    var y = 0
    while (y < img.height) {
      // raw(y*(stride+1)) is already 0 = filter None
      var x = 0
      while (x < stride) {
        raw(y * (stride + 1) + 1 + x) = img.pixels(y * stride + x).toByte
        x += 1
      }
      y += 1
    }
    val defl = new java.util.zip.Deflater()
    defl.setInput(raw); defl.finish()
    val idat = new java.io.ByteArrayOutputStream()
    val buf = new Array[Byte](8192)
    while (!defl.finished()) idat.write(buf, 0, defl.deflate(buf))
    defl.end()

    val out = new java.io.ByteArrayOutputStream()
    out.write(Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a,
      0x0a), 0, 8)
    def writeBe32(v: Int): Unit = {
      out.write((v >>> 24) & 0xff); out.write((v >>> 16) & 0xff)
      out.write((v >>> 8) & 0xff); out.write(v & 0xff)
    }
    def chunk(ctype: String, data: Array[Byte]): Unit = {
      writeBe32(data.length)
      val tb = ctype.getBytes("US-ASCII")
      val crc = new java.util.zip.CRC32()
      crc.update(tb); crc.update(data)
      out.write(tb, 0, 4)
      out.write(data, 0, data.length)
      writeBe32(crc.getValue.toInt)
    }
    val ihdr = new java.io.ByteArrayOutputStream()
    def ihdrBe32(v: Int): Unit = {
      ihdr.write((v >>> 24) & 0xff); ihdr.write((v >>> 16) & 0xff)
      ihdr.write((v >>> 8) & 0xff); ihdr.write(v & 0xff)
    }
    ihdrBe32(img.width); ihdrBe32(img.height)
    ihdr.write(8) // bit depth
    ihdr.write(img.colorType)
    ihdr.write(0); ihdr.write(0); ihdr.write(0) // deflate, filter0, no interlace
    chunk("IHDR", ihdr.toByteArray)
    chunk("IDAT", idat.toByteArray)
    chunk("IEND", Array.emptyByteArray)
    out.toByteArray
  }

  /** JPEG header decode: dimensions + channel count from the SOF marker. */
  def jpeg(b: Array[Byte]): Option[ImageInfo] = {
    if (sniff(b) != "jpeg") return None
    var i = 2
    while (i + 9 < b.length) {
      if ((b(i) & 0xff) != 0xff) return None
      var code = b(i + 1) & 0xff
      while (code == 0xff && i + 2 < b.length) { i += 1; code = b(i + 1) & 0xff }
      if (code >= 0xc0 && code <= 0xcf &&
        code != 0xc4 && code != 0xc8 && code != 0xcc) {
        val height = be16(b, i + 5); val width = be16(b, i + 7)
        val channels = b(i + 9) & 0xff
        return Some(ImageInfo("jpeg", width, height, channels, -1.0))
      }
      if (code == 0xd8 || (code >= 0xd0 && code <= 0xd7)) i += 2
      else i += 2 + be16(b, i + 2)
    }
    None
  }

  /** GIF logical-screen descriptor. */
  def gif(b: Array[Byte]): Option[ImageInfo] =
    if (sniff(b) == "gif" && b.length >= 10)
      Some(ImageInfo("gif", le16(b, 6), le16(b, 8), 3, -1.0))
    else None

  /** WAV decode: fmt chunk + full PCM16 sample pass (RMS, peak). */
  def wav(b: Array[Byte]): Option[AudioInfo] = {
    if (sniff(b) != "wav") return None
    var channels, sampleRate, bitsPerSample, byteRate = -1
    var audioFormat = -1
    var dataAt = -1; var dataLen = 0
    var i = 12
    while (i + 8 <= b.length) {
      val id = new String(b, i, 4, "US-ASCII")
      val len = le32(b, i + 4)
      // corrupt negative length: i += 8 + len + (len & 1) stops advancing
      // at len = -8/-9 — reject the payload instead of looping forever
      if (len < 0) return None
      id match {
        case "fmt " if i + 8 + 16 <= b.length =>
          audioFormat = le16(b, i + 8)
          channels = le16(b, i + 10)
          sampleRate = le32(b, i + 12)
          byteRate = le32(b, i + 16)
          bitsPerSample = le16(b, i + 22)
        case "data" =>
          dataAt = i + 8; dataLen = math.min(len, b.length - dataAt)
        case _ =>
      }
      i += 8 + len + (len & 1) // chunks are word-aligned
    }
    if (channels <= 0 || byteRate <= 0 || dataAt < 0) return None
    val durationMs = dataLen.toLong * 1000L / byteRate
    if (audioFormat != 1 || bitsPerSample != 16)
      return Some(AudioInfo("wav", channels, sampleRate, bitsPerSample,
        durationMs, -1.0, -1.0)) // non-PCM16 payload: header only
    var sumSq = 0.0; var peak = 0.0; var n = 0
    var j = dataAt
    while (j + 1 < dataAt + dataLen) {
      val s = (le16(b, j).toShort).toDouble / 32768.0
      sumSq += s * s; peak = math.max(peak, math.abs(s)); n += 1
      j += 2
    }
    Some(AudioInfo("wav", channels, sampleRate, bitsPerSample, durationMs,
      if (n > 0) math.sqrt(sumSq / n) else 0.0, peak))
  }
}
