package graft.multimodal

import java.io.ByteArrayOutputStream
import java.util.zip.{CRC32, Deflater}

/** Deterministic media-payload builders: hand-constructed valid PNG
  * (chunks, CRCs, deflate), PCM16 WAV, JPEG SOF header and GIF descriptor.
  * These are the pinned fixtures behind both the decoder unit tests
  * (MediaSpec) and the driver-gated decode envelope (q277): the decode
  * math is checked against known pixel/sample values, not another codec.
  * Pure byte arithmetic — every builder is a function of its arguments
  * only, so the same call yields the same bytes on every JVM. */
object MediaFixtures {

  private def be32(v: Int) = Array[Byte](
    (v >>> 24).toByte, (v >>> 16).toByte, (v >>> 8).toByte, v.toByte)

  def chunk(ctype: String, data: Array[Byte]): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    out.write(be32(data.length))
    val body = ctype.getBytes("US-ASCII") ++ data
    out.write(body)
    val crc = new CRC32(); crc.update(body)
    out.write(be32(crc.getValue.toInt))
    out.toByteArray
  }

  /** Minimal valid non-interlaced 8-bit RGB PNG from raw pixels. */
  def buildPng(width: Int, height: Int,
      px: (Int, Int) => (Int, Int, Int)): Array[Byte] = {
    val sig = Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a)
    val ihdr = {
      val b = java.nio.ByteBuffer.allocate(13)
      b.putInt(width).putInt(height)
      b.put(8.toByte).put(2.toByte) // bit depth 8, color type 2 (RGB)
      b.put(0.toByte).put(0.toByte).put(0.toByte) // deflate/adaptive/no-interlace
      b.array()
    }
    val raw = new ByteArrayOutputStream()
    (0 until height).foreach { y =>
      raw.write(0) // filter: None
      (0 until width).foreach { x =>
        val (r, g, bl) = px(x, y)
        raw.write(r); raw.write(g); raw.write(bl)
      }
    }
    val deflater = new Deflater()
    deflater.setInput(raw.toByteArray); deflater.finish()
    // loop until finished(): a single deflate() call can fill the buffer
    // without draining the stream (worst case ~5 bytes per 16 KiB block
    // over the raw size), silently truncating the IDAT
    val comp = new ByteArrayOutputStream()
    val buf = new Array[Byte](8192)
    while (!deflater.finished())
      comp.write(buf, 0, deflater.deflate(buf))
    deflater.end()
    sig ++ chunk("IHDR", ihdr) ++ chunk("IDAT", comp.toByteArray) ++
      chunk("IEND", Array.empty)
  }

  /** Minimal PCM16 mono WAV with every sample = `amp`. */
  def buildWav(sampleRate: Int, nSamples: Int, amp: Short): Array[Byte] = {
    val dataLen = nSamples * 2
    val b = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    b.put("RIFF".getBytes); b.putInt(36 + dataLen); b.put("WAVE".getBytes)
    b.put("fmt ".getBytes); b.putInt(16)
    b.putShort(1) // PCM
    b.putShort(1) // mono
    b.putInt(sampleRate)
    b.putInt(sampleRate * 2) // byte rate
    b.putShort(2); b.putShort(16) // block align, bits
    b.put("data".getBytes); b.putInt(dataLen)
    (0 until nSamples).foreach(_ => b.putShort(amp))
    b.array()
  }

  /** JPEG SOI + JFIF APP0 + baseline SOF0 declaring width × height, 3
    * components — enough for the header decoder, no entropy-coded data. */
  def buildJpegHeader(width: Int, height: Int): Array[Byte] = {
    val app0 = Array[Byte](0xff.toByte, 0xe0.toByte, 0, 16) ++
      new Array[Byte](14) // JFIF segment, length 16
    val sof = Array[Byte](0xff.toByte, 0xc0.toByte, 0, 17, 8,
      (height >>> 8).toByte, height.toByte,
      (width >>> 8).toByte, width.toByte, 3) ++ new Array[Byte](9)
    Array[Byte](0xff.toByte, 0xd8.toByte) ++ app0 ++ sof
  }

  /** GIF89a logical-screen descriptor declaring width × height
    * (little-endian u16 pair), no image data. */
  def buildGif(width: Int, height: Int): Array[Byte] =
    "GIF89a".getBytes("US-ASCII") ++ Array[Byte](
      (width & 0xff).toByte, ((width >>> 8) & 0xff).toByte,
      (height & 0xff).toByte, ((height >>> 8) & 0xff).toByte) ++
      new Array[Byte](4)
}
