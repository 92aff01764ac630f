package graft.multimodal

import graft.SparkSpec

/** Real-decoder tests over hand-constructed payloads ([[MediaFixtures]]:
  * a valid PNG built byte-by-byte with chunks, CRCs, deflate; a PCM16
  * WAV; a JPEG SOF header; a GIF descriptor) — the decode math is checked
  * against known pixel and sample values, not against another codec. The
  * same builders feed the driver-gated decode envelope (q277). */
class MediaSpec extends SparkSpec {

  import MediaFixtures.{buildPng, buildWav, buildJpegHeader}

  // ---- tests ------------------------------------------------------------

  test("PNG: full pixel decode recovers dimensions and exact mean luma") {
    // left half white, right half black, 4x2 → mean luma 0.5
    val png = buildPng(4, 2, (x, _) => if (x < 2) (255, 255, 255) else (0, 0, 0))
    val info = Decoders.png(png).get
    assert(info.width == 4 && info.height == 2 && info.channels == 3)
    assert(math.abs(info.meanLuma - 0.5) < 1e-9, s"luma ${info.meanLuma}")
  }

  test("PNG: filtered scanlines decode through Sub/Up/Paeth reconstruction") {
    // a gradient exercises non-trivial filter payoffs; decode must be exact
    val png = buildPng(16, 16, (x, y) => (x * 16, y * 16, (x + y) * 8))
    val info = Decoders.png(png).get
    val expected = (for { y <- 0 until 16; x <- 0 until 16 } yield
      0.299 * (x * 16) + 0.587 * (y * 16) + 0.114 * ((x + y) * 8))
      .sum / 256.0 / 255.0
    assert(math.abs(info.meanLuma - expected) < 1e-9)
  }

  test("WAV: PCM16 decode computes duration and exact RMS") {
    val a = Decoders.wav(buildWav(8000, 4000, 16384)).get
    assert(a.channels == 1 && a.sampleRate == 8000 && a.bitsPerSample == 16)
    assert(a.durationMs == 500, s"4000 samples at 8kHz = 500ms, got ${a.durationMs}")
    assert(math.abs(a.rms - 0.5) < 1e-9 && math.abs(a.peak - 0.5) < 1e-9)
  }

  test("JPEG/GIF: header decode yields dimensions") {
    val j = Decoders.jpeg(buildJpegHeader(640, 480)).get
    assert(j.width == 640 && j.height == 480 && j.channels == 3)
    val g = Decoders.gif(MediaFixtures.buildGif(320, 240)).get
    assert(g.width == 320 && g.height == 240)
  }

  test("decoders degrade gracefully on corrupt payloads") {
    val png = buildPng(4, 2, (_, _) => (1, 2, 3))
    // truncate into the IDAT data: no exception, and no fake pixel stats
    val truncated = png.take(45)
    val info = Decoders.png(truncated)
    assert(info.forall(i => i.width == 4 && i.meanLuma == -1.0))
    // random garbage sniffs unknown everywhere
    val rnd = new scala.util.Random(9)
    val junk = Array.fill(256)(rnd.nextInt().toByte)
    assert(Decoders.sniff(junk) != "png" || Decoders.png(junk).isEmpty ||
      Decoders.png(junk).get.meanLuma == -1.0)
    assert(Decoders.wav("RIFFxxxxWAVE".getBytes ++ new Array[Byte](4)).isEmpty)
    assert(Decoders.jpeg(Array[Byte](0xff.toByte, 0xd8.toByte, 0x00, 0x01))
      .isEmpty)
  }

  test("negative chunk lengths are rejected, not walked forever") {
    // PNG: ancillary chunk declaring len = -12 makes the naive walk
    // stationary (i = dataAt + len + 4 = i); must return None instead
    def be32(v: Int) = Array[Byte](
      (v >>> 24).toByte, (v >>> 16).toByte, (v >>> 8).toByte, v.toByte)
    val sig = Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a)
    val evilPng = sig ++ be32(-12) ++ "tEXt".getBytes("US-ASCII") ++
      new Array[Byte](16)
    assert(Decoders.png(evilPng).isEmpty)
    // PNG: negative IDAT length must not reach the ByteArrayOutputStream
    val evilIdat = sig ++ be32(-5) ++ "IDAT".getBytes("US-ASCII") ++
      new Array[Byte](16)
    assert(Decoders.png(evilIdat).isEmpty)
    // WAV: chunk len = -8 makes i += 8 + len + (len & 1) loop in place
    val le = java.nio.ByteBuffer.allocate(32)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    le.put("RIFF".getBytes); le.putInt(24); le.put("WAVE".getBytes)
    le.put("junk".getBytes); le.putInt(-8); le.put(new Array[Byte](8))
    assert(Decoders.wav(le.array()).isEmpty)
    // Media.decode never throws on arbitrary corrupt payloads
    val rnd = new scala.util.Random(123)
    (0 until 50).foreach { i =>
      val junk = Array.fill(64 + i)(rnd.nextInt().toByte)
      // force a media-looking prefix some of the time
      if (i % 4 == 0) Array(sig, "RIFF".getBytes).apply((i / 4) % 2)
        .copyToArray(junk)
      val f = Media.decode(Media.MediaRow(i.toLong, "image", junk, 0, 0L))
      assert(f.byte_len == junk.length)
    }
  }

  test("Media routes by magic bytes: real decoders for media, stub for text") {
    import spark.implicits._
    val rows = Seq(
      Media.MediaRow(1L, "image", buildPng(4, 2, (_, _) => (10, 20, 30)), 0, 0L),
      Media.MediaRow(2L, "audio", buildWav(8000, 100, 0), 0, 0L),
      Media.MediaRow(3L, "image", buildJpegHeader(99, 7), 0, 0L),
      Media.MediaRow(4L, "text", "just some text".getBytes("UTF-8"), 0, 0L))
    val feats = Media.extractFeatures(spark.createDataset(rows))
      .collect().map(f => f.id -> f).toMap
    assert(feats(1L).decoder == "png" && feats(1L).width == 4)
    assert(feats(2L).decoder == "wav" && feats(2L).sample_rate == 8000)
    assert(feats(3L).decoder == "jpeg-header" && feats(3L).width == 99)
    assert(feats(4L).decoder == "stub")
  }

  test("PNG encode/resize round-trip: real pixels through the whole loop") {
    // 2x2 quadrant image: known colors at known positions
    val quad = buildPng(2, 2, (x, y) =>
      if (x == 0 && y == 0) (255, 0, 0)
      else if (x == 1 && y == 0) (0, 255, 0)
      else if (x == 0 && y == 1) (0, 0, 255) else (255, 255, 255))

    // encoder round-trip: decode → encode → decode preserves every pixel
    val img = Decoders.pngPixels(quad).get
    val again = Decoders.pngPixels(Decoders.encodePng(img)).get
    assert(again.width == 2 && again.height == 2 && again.channels == 3)
    assert(again.pixels.toSeq == img.pixels.toSeq)

    // nearest-neighbor 2x upscale: each quadrant becomes a 2x2 block
    val up = Decoders.resizeNearest(img, 4, 4)
    def rgb(i: Decoders.PixelImage, x: Int, y: Int) = (
      i.pixels((y * i.width + x) * 3), i.pixels((y * i.width + x) * 3 + 1),
      i.pixels((y * i.width + x) * 3 + 2))
    assert(rgb(up, 0, 0) == ((255, 0, 0)) && rgb(up, 1, 1) == ((255, 0, 0)))
    assert(rgb(up, 2, 0) == ((0, 255, 0)) && rgb(up, 3, 1) == ((0, 255, 0)))
    assert(rgb(up, 0, 2) == ((0, 0, 255)) && rgb(up, 3, 3) == ((255, 255, 255)))
    // luma is resize-invariant for an exact block upscale
    assert(math.abs(Decoders.meanLuma(up) - Decoders.meanLuma(img)) < 1e-12)

    // and the Dataset-level transform re-encodes a decodable PNG
    import spark.implicits._
    val rows = Seq(
      Media.MediaRow(1L, "image", quad, 0, 0L),
      Media.MediaRow(2L, "text", "not an image".getBytes("UTF-8"), 0, 0L))
    val resized = Media.resizeImages(spark.createDataset(rows), 4, 4)
      .collect().map(r => r.id -> r).toMap
    assert(resized(1L).decoder == "png")
    val back = Decoders.pngPixels(resized(1L).payload).get
    assert(back.width == 4 && back.height == 4)
    assert(back.pixels.toSeq == up.pixels.toSeq)
    assert(resized(2L).decoder == "stub")
  }

  test("frame sampling: uniform stride, bounded fan-out, video only") {
    import spark.implicits._
    val rows = Seq(
      Media.MediaRow(1L, "video", Array[Byte](1, 2, 3), 0, 1000L),
      Media.MediaRow(2L, "video", Array[Byte](9, 9), 0, 100000L),
      Media.MediaRow(3L, "image", Array[Byte](4), 0, 1000L))
    val frames = Media.sampleFrames(
        spark.createDataset(rows), intervalMs = 250L, maxFrames = 16)
      .collect().groupBy(_.id)
    // 1000 ms at 250 ms stride → frames at 0,250,500,750,1000
    assert(frames(1L).map(_.ts_ms).sorted.toSeq ==
      Seq(0L, 250L, 500L, 750L, 1000L))
    assert(frames(2L).length == 16, "cap bounds the fan-out")
    assert(!frames.contains(3L), "images are not frame-sampled")
    // deterministic stub features: same payload → same features
    val rerun = Media.sampleFrames(
        spark.createDataset(rows), intervalMs = 250L, maxFrames = 16)
      .collect().groupBy(_.id)
    assert(rerun(1L).sortBy(_.frame_idx).toSeq ==
      frames(1L).sortBy(_.frame_idx).toSeq)
  }
}
