package graft.ext

import graft.SparkSpec
import graft.ext.MediaOps.{MediaRecord, Raster}

/** The REAL image path of the media module: fixture PNGs generated
  * in-test (javax.imageio is plain JDK), decoded, resized and
  * perceptually hashed on actual pixels — end-to-end through the same
  * `mapPartitions` kernels the table queries run, driven via the
  * `*Of(ds)` seams. The text-payload fallback (the oracle path) is
  * pinned to stay byte-identical to round 5's behavior. */
class MediaKernelsSpec extends SparkSpec {
  import spark.implicits._

  /** Deterministic RGB test card: pixel (x,y) = f(x,y) so every
    * decode of the same (w,h,seed) sees identical pixels. */
  private def pngBytes(w: Int, h: Int, seed: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) {
      val r = (x * 7 + seed) % 256
      val g = (y * 11 + 2 * seed) % 256
      val b = (x + y + 3 * seed) % 256
      img.setRGB(x, y, (r << 16) | (g << 8) | b)
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  private def rec(id: Long, payload: Array[Byte], w: Long = 0, h: Long = 0) =
    MediaRecord(id, "image", payload, w, h, 0L)

  test("decodeRaster: PNG round-trips to the exact integer luma plane") {
    val bytes = pngBytes(8, 5, seed = 1)
    val ras = MediaOps.decodeRaster(bytes).get
    assert(ras.width == 8 && ras.height == 5)
    // independently recompute the fixed-point Rec.601 luma of pixel (3,2)
    val (r, g, b) = ((3 * 7 + 1) % 256, (2 * 11 + 2) % 256, (3 + 2 + 3) % 256)
    val expected = ((77 * r + 150 * g + 29 * b) >> 8).toByte
    assert(ras.luma(2 * 8 + 3) == expected)
  }

  test("decodeRaster: text bytes and truncated images fall back to None") {
    assert(MediaOps.decodeRaster("just some text payload".getBytes("UTF-8")).isEmpty)
    assert(MediaOps.decodeRaster(pngBytes(4, 4, 0).take(10)).isEmpty)
    assert(MediaOps.decodeRaster(Array.emptyByteArray).isEmpty)
    assert(MediaOps.decodeRaster(null).isEmpty)
  }

  test("resizeRaster is exact nearest-neighbor (integer index math)") {
    // 4x2 plane with distinct values; downscale to 2x1
    val src = Raster(4, 2, Array[Byte](10, 20, 30, 40, 50, 60, 70, 80))
    val out = MediaOps.resizeRaster(src, 2, 1)
    // sx = floor(x*4/2) -> pixels 0 and 2 of row sy = floor(0*2/1) = 0
    assert(out.luma.toSeq == Seq[Byte](10, 30))
    // upscale replicates: 2x1 -> 4x1 takes sx = 0,0,1,1
    val up = MediaOps.resizeRaster(Raster(2, 1, Array[Byte](5, 9)), 4, 1)
    assert(up.luma.toSeq == Seq[Byte](5, 5, 9, 9))
  }

  test("averageHash16: stable on identical pixels, near on mild edits, 0 on flat") {
    val a = MediaOps.decodeRaster(pngBytes(64, 64, seed = 3)).get
    val b = MediaOps.decodeRaster(pngBytes(64, 64, seed = 3)).get
    assert(MediaOps.averageHash16(a) == MediaOps.averageHash16(b))
    // a re-encode after resize is a mild edit: hash moves few bits
    val resized = MediaOps.resizeRaster(a, 48, 48)
    val d = Integer.bitCount(
      MediaOps.averageHash16(a) ^ MediaOps.averageHash16(resized))
    assert(d <= 2, s"resize moved $d of 16 aHash bits")
    // flat image: strictly-above-mean never fires
    assert(MediaOps.averageHash16(Raster(4, 4, Array.fill(16)(100.toByte))) == 0)
  }

  test("decodeFeaturesOf: real pixels drive checksum/feature/phash; text keeps the byte kernel") {
    val png = pngBytes(16, 12, seed = 7)
    val txt = "plain text payload".getBytes("UTF-8")
    val feats = MediaOps.decodeFeaturesOf(
        Seq(rec(1L, png), rec(2L, txt)).toDS())
      .collect().map(f => f.doc_id -> f).toMap

    val ras = MediaOps.decodeRaster(png).get
    val lumaSum = ras.luma.map(_ & 0xff).map(_.toLong).sum
    val real = feats(1L)
    assert(real.n_bytes == png.length)
    assert(real.checksum == lumaSum % 997, "image checksum must be over PIXELS, not file bytes")
    assert(real.feature(0) == 16f && real.feature(1) == 12f)
    assert(real.phash == MediaOps.averageHash16(ras) && real.phash >= 0)

    val stub = feats(2L)
    assert(stub.checksum == txt.map(_ & 0xff).map(_.toLong).sum % 997)
    assert(stub.phash == -1, "fallback rows must carry the -1 sentinel")
  }

  test("decode coverage rides along as an observed metric (image/audio vs byte fallback)") {
    // VERDICT r6 item 8: a corpus drifting toward undecodable formats
    // must move a MONITORED metric, not silently degrade to byte
    // checksums. Mixed fixture: one real PNG, one real WAV, two text
    // payloads → n_real_decoded = 2, n_byte_fallback = 2.
    val feats = MediaOps.decodeFeaturesOf(Seq(
        rec(1L, pngBytes(16, 12, seed = 7)),
        rec(2L, wavBytes(8000, Array[Short](0, 100, -100, 50))),
        rec(3L, "plain text payload".getBytes("UTF-8")),
        rec(4L, "another undecodable".getBytes("UTF-8"))).toDS())
    val observed = MediaOps.observedDecode(feats.toDF())
    observed.collect()
    val m = observed.queryExecution.observedMetrics(MediaOps.DecodeObservation)
    assert(m.getAs[Long]("n_rows") == 4L)
    assert(m.getAs[Long]("n_real_decoded") == 2L,
      "the PNG and the WAV must be counted as real decodes")
    assert(m.getAs[Long]("n_byte_fallback") == 2L,
      "the text payloads must be counted as fallbacks")
    // and the paths themselves are classified per row
    val paths = feats.collect().map(f => f.doc_id -> f.decode_path).toMap
    assert(paths == Map(1L -> "image", 2L -> "audio", 3L -> "bytes", 4L -> "bytes"))
  }

  test("resizeOf: image payloads are re-encoded at target size and re-decode to the resampled plane") {
    val png = pngBytes(20, 10, seed = 5)
    val out = MediaOps.resizeOf(Seq(rec(1L, png, 20, 10)).toDS(), 10, 5)
      .collect().head
    assert(out.width == 10 && out.height == 5)
    val decoded = MediaOps.decodeRaster(out.payload).get
    assert(decoded.width == 10 && decoded.height == 5)
    // the re-encoded PNG must hold EXACTLY the nearest-neighbor plane
    val expected = MediaOps.resizeRaster(MediaOps.decodeRaster(png).get, 10, 5)
    assert(decoded.luma.toSeq == expected.luma.toSeq,
      "PNG round-trip must preserve the resampled luma exactly (grayscale PNG is lossless)")
  }

  /** Minimal 16-bit PCM WAV: 44-byte canonical header + little-endian
    * samples. */
  private def wavBytes(rate: Int, samples: Array[Short]): Array[Byte] = {
    val dataLen = samples.length * 2
    val bb = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(1).putInt(rate).putInt(rate * 2)
      .putShort(2).putShort(16)
      .put("data".getBytes("US-ASCII")).putInt(dataLen)
    samples.foreach(bb.putShort)
    bb.array()
  }

  test("decodeWav: PCM round-trips exactly; non-WAV and truncated payloads fall back") {
    val samples = Array[Short](0, 1000, -1000, 2000, -2000, 0, 500, -500)
    val wav = wavBytes(8000, samples)
    val pcm = MediaOps.decodeWav(wav).get
    assert(pcm.sampleRate == 8000 && pcm.channels == 1)
    assert(pcm.samples.toSeq == samples.toSeq)
    assert(MediaOps.decodeWav("not audio at all, just text".getBytes).isEmpty)
    assert(MediaOps.decodeWav(wav.take(30)).isEmpty)
  }

  test("decodeFeaturesOf: WAV payloads get sample-statistics features") {
    val samples = Array[Short](100, -100, 100, -100, 100, -100, 100, -100)
    val f = MediaOps.decodeFeaturesOf(
        Seq(rec(5L, wavBytes(16000, samples))).toDS())
      .collect().head
    assert(f.checksum == (800L % 997))
    assert(f.feature(0) == 16000f)      // sample rate
    assert(f.feature(1) == 8f)          // n samples
    assert(f.feature(2) == 100f)        // mean |amplitude|
    assert(f.feature(3) == 7f)          // sign alternates every step
    assert(f.phash == -1, "audio must not enter the image near-dup join")
  }

  /** Multi-frame GIF via the JDK's sequence writer. */
  private def gifBytes(frames: Seq[java.awt.image.BufferedImage]): Array[Byte] = {
    val writer = javax.imageio.ImageIO.getImageWritersByFormatName("gif").next()
    val bos = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
    writer.setOutput(ios)
    writer.prepareWriteSequence(null)
    frames.foreach { img =>
      val meta = writer.getDefaultImageMetadata(
        javax.imageio.ImageTypeSpecifier.createFromRenderedImage(img),
        writer.getDefaultWriteParam)
      writer.writeToSequence(
        new javax.imageio.IIOImage(img, null, meta), writer.getDefaultWriteParam)
    }
    writer.endWriteSequence()
    ios.close()
    writer.dispose()
    bos.toByteArray
  }

  private def flatFrame(w: Int, h: Int, level: Int): java.awt.image.BufferedImage = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    val g = img.getRaster
    for (y <- 0 until h; x <- 0 until w) g.setSample(x, y, 0, level)
    img
  }

  test("sampleFramesOf: animated GIF emits one real frame per stored frame") {
    // 16x16, not smaller: the JDK GIF codec truncates the final LZW
    // sub-block on very small images (6x4 loses its last row) — a codec
    // quirk, not a kernel defect
    val gif = gifBytes(Seq(flatFrame(16, 16, 40), flatFrame(16, 16, 140),
      flatFrame(16, 16, 240)))
    assert(MediaOps.decodeGifFrames(gif).get.size == 3)
    val frames = MediaOps.sampleFramesOf(
        Seq(MediaOps.MediaRecord(9L, "video", gif, 16L, 16L, 300000L)).toDS(),
        everyMs = 1000L)
      .collect().sortBy(_.frame_idx)
    assert(frames.length == 3, s"expected 3 real frames, got ${frames.length}")
    assert(frames.map(_.offset_ms).toSeq == Seq(0L, 1000L, 2000L))
    // each emitted frame is a PNG of the stored frame's luma plane
    frames.zip(Seq(40, 140, 240)).foreach { case (f, level) =>
      val ras = MediaOps.decodeRaster(f.frame).get
      assert(ras.width == 16 && ras.height == 16)
      assert(ras.luma.forall(b => (b & 0xff) == level),
        s"frame ${f.frame_idx} luma should be flat $level")
    }
    // a non-GIF "video" payload keeps the byte-slice stub
    val stub = MediaOps.sampleFramesOf(
        Seq(MediaOps.MediaRecord(10L, "video", "textbytes".getBytes, 0L, 0L, 120000L)).toDS(),
        everyMs = 60000L)
      .collect()
    assert(stub.length == 2 && stub.forall(_.frame.length <= 16))
  }

  test("near-duplicate detection on real pixels: re-encode collides, distinct images differ") {
    val a = pngBytes(32, 32, seed = 11)
    // near-dup: same pixels re-encoded through a resize-to-same-size pass
    val aAgain = MediaOps.resizeOf(Seq(rec(1L, a, 32, 32)).toDS(), 32, 32)
      .collect().head.payload
    val c = pngBytes(32, 32, seed = 200) // unrelated content
    val sigs = MediaOps.phashSignaturesOf(MediaOps.decodeFeaturesOf(
        Seq(rec(1L, a), rec(2L, aAgain), rec(3L, c)).toDS()))
      .collect().map(r => r.getLong(0) -> r.getAs[Number]("phash").intValue).toMap
    assert(Integer.bitCount(sigs(1L) ^ sigs(2L)) <= 1,
      "re-encoded image must sit within the Hamming-1 near-dup radius")
    assert(Integer.bitCount(sigs(1L) ^ sigs(3L)) > 1,
      "unrelated images must not collide within the near-dup radius")
  }
}
