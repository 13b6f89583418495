package graft

import java.io.ByteArrayOutputStream
import java.nio.{ByteBuffer, ByteOrder}

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Multimodal
import graft.ops.Multimodal.{MediaFeatures, MediaRow}

/** The header decoder on REAL container bytes: hand-assembled but
  * spec-conformant PNG / JPEG / GIF / BMP / WAV headers go through the
  * distributed mapPartitions decode path and come back with the
  * dimensions the headers declare; junk falls back to pseudo-features.
  */
class MultimodalSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkTestSession.get

  private def bytes(xs: Int*): Array[Byte] = xs.map(_.toByte).toArray

  private def pngBytes(w: Int, h: Int, colorType: Int): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    out.write(bytes(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a))
    val ihdr = ByteBuffer.allocate(25).order(ByteOrder.BIG_ENDIAN)
    ihdr.putInt(13) // IHDR length
    ihdr.put("IHDR".getBytes("ASCII"))
    ihdr.putInt(w).putInt(h)
    ihdr.put(8.toByte).put(colorType.toByte) // bit depth, color type
    ihdr.put(0.toByte).put(0.toByte).put(0.toByte) // compression etc.
    out.write(ihdr.array())
    out.write(bytes(0, 0, 0, 0)) // fake CRC
    out.toByteArray
  }

  private def jpegBytes(w: Int, h: Int, comps: Int): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    out.write(bytes(0xff, 0xd8)) // SOI
    out.write(bytes(0xff, 0xe0, 0x00, 0x04, 0x4a, 0x46)) // APP0, len 4
    // SOF0: len = 8 + 3*comps, precision, height, width, comps
    val sofLen = 8 + 3 * comps
    out.write(bytes(0xff, 0xc0, sofLen >> 8, sofLen & 0xff, 8,
      h >> 8, h & 0xff, w >> 8, w & 0xff, comps))
    (1 to comps).foreach(c => out.write(bytes(c, 0x11, 0)))
    out.write(bytes(0xff, 0xd9)) // EOI
    out.toByteArray
  }

  private def gifBytes(w: Int, h: Int): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    out.write("GIF89a".getBytes("ASCII"))
    out.write(bytes(w & 0xff, w >> 8, h & 0xff, h >> 8, 0, 0, 0))
    out.toByteArray
  }

  private def wavBytes(channels: Int, rate: Int, bits: Int,
      dataBytes: Int): Array[Byte] = {
    val b = ByteBuffer.allocate(44 + dataBytes).order(ByteOrder.LITTLE_ENDIAN)
    b.put("RIFF".getBytes("ASCII")).putInt(36 + dataBytes)
    b.put("WAVE".getBytes("ASCII"))
    b.put("fmt ".getBytes("ASCII")).putInt(16)
    b.putShort(1) // PCM
    b.putShort(channels.toShort).putInt(rate)
    b.putInt(rate * channels * bits / 8)
    b.putShort((channels * bits / 8).toShort).putShort(bits.toShort)
    b.put("data".getBytes("ASCII")).putInt(dataBytes)
    b.array()
  }

  private def decodeAll(rows: Seq[MediaRow]): Map[Long, MediaFeatures] = {
    import spark.implicits._
    Multimodal.extractFeatures(rows.toDS())
      .collect().map(f => f.media_id -> f).toMap
  }

  test("real container headers decode through the mapPartitions path") {
    val fs = decodeAll(Seq(
      MediaRow(1, "image", pngBytes(320, 200, colorType = 6)),
      MediaRow(2, "image", jpegBytes(100, 240, comps = 3)),
      MediaRow(3, "image", gifBytes(77, 55)),
      MediaRow(4, "audio", wavBytes(channels = 2, rate = 44100,
        bits = 16, dataBytes = 400))))
    assert(fs(1).kind == "png" && fs(1).width == 320 && fs(1).height == 200
      && fs(1).channels == 4 && fs(1).n_frames == 1)
    assert(fs(2).kind == "jpeg" && fs(2).width == 100 && fs(2).height == 240
      && fs(2).channels == 3)
    assert(fs(3).kind == "gif" && fs(3).width == 77 && fs(3).height == 55)
    // 400 data bytes / (2 ch · 2 bytes) = 100 sample frames @ 44.1 kHz
    assert(fs(4).kind == "wav" && fs(4).channels == 2 && fs(4).width == 44100
      && fs(4).n_frames == 100)
  }

  test("JDK-codec content decode: real pixels and PCM samples") {
    import spark.implicits._
    // a solid-color 8x4 RGB image written by the JDK's own PNG encoder:
    // every red sample is 200/255, green 100/255, blue 50/255
    val img = new java.awt.image.BufferedImage(
      8, 4, java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
    for (y <- 0 until 4; x <- 0 until 8)
      img.setRGB(x, y, new java.awt.Color(200, 100, 50).getRGB)
    val pngOut = new ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", pngOut)
    val bmpOut = new ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "bmp", bmpOut)

    // a full-scale square wave: every 16-bit sample is ±16384 → RMS 0.5
    val n = 1000
    val wav = ByteBuffer.allocate(44 + 2 * n).order(ByteOrder.LITTLE_ENDIAN)
    wav.put(wavBytes(channels = 1, rate = 8000, bits = 16, dataBytes = 0)
      .take(40))
    wav.putInt(2 * n) // rewrite the data-chunk size
    for (i <- 0 until n)
      wav.putShort(if (i % 2 == 0) 16384.toShort else (-16384).toShort)

    // indexed-color GIF: raster holds palette INDICES — the decoder
    // must normalize through the color model, not raw samples
    val gifOut = new ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "gif", gifOut)

    val rows = Seq(
      MediaRow(1, "image", pngOut.toByteArray),
      MediaRow(2, "image", bmpOut.toByteArray),
      MediaRow(3, "audio", wav.array()),
      MediaRow(4, "text", "plain text".getBytes("UTF-8")),
      MediaRow(5, "image", gifOut.toByteArray))
    val got = Multimodal.decodeContent(rows.toDS())
      .collect().map(c => c.media_id -> c).toMap

    val expMean = (200.0 + 100.0 + 50.0) / 3 / 255.0
    for (id <- Seq(1L, 2L)) {
      val c = got(id)
      assert(c.kind == "image" && c.width == 8 && c.height == 4
        && c.channels == 3 && c.n_samples == 8L * 4 * 3)
      assert(math.abs(c.mean_level - expMean) < 1e-9, s"$id: ${c.mean_level}")
    }
    val w = got(3L)
    assert(w.kind == "wav" && w.width == 8000 && w.channels == 1
      && w.n_samples == n)
    assert(math.abs(w.rms - 0.5) < 1e-3, s"rms=${w.rms}")
    assert(math.abs(w.mean_level) < 1e-3) // symmetric square wave
    val t = got(4L)
    assert(t.kind == "text" && t.n_samples == 0 && t.rms == 0.0)
    // GIF quantizes the palette — allow coarse tolerance, but a
    // palette-index misread would report ~0 (black), not ~expMean
    val g = got(5L)
    assert(g.kind == "image" && g.width == 8 && g.height == 4)
    assert(math.abs(g.mean_level - expMean) < 0.05, s"gif: ${g.mean_level}")
  }

  test("unrecognized and truncated payloads fall back deterministically") {
    val text = "just some text".getBytes("UTF-8")
    val truncatedPng = pngBytes(320, 200, 6).take(12) // magic, no IHDR
    val fs = decodeAll(Seq(
      MediaRow(10, "text", text),
      MediaRow(11, "image", truncatedPng)))
    // pseudo-features: the oracle arithmetic from m_media_features
    val n = text.length.toLong
    assert(fs(10).kind == "text" && fs(10).n_bytes == n
      && fs(10).width == (16 + n % 64).toInt
      && fs(10).height == (16 + (n * 7) % 64).toInt)
    assert(fs(11).kind == "image") // too short to sniff → fallback
  }

  test("a truncated trailing fmt chunk must not throw (regression)") {
    // RIFF/WAVE whose final chunk says 'fmt ' but the payload ends
    // before the fmt fields: the walk sees i+8 <= length yet the
    // field reads extend to at+23 — previously AIOOBE'd the task
    val b = ByteBuffer.allocate(64).order(ByteOrder.LITTLE_ENDIAN)
    b.put("RIFF".getBytes("ASCII")).putInt(56)
    b.put("WAVE".getBytes("ASCII"))
    b.put("JUNK".getBytes("ASCII")).putInt(36)
    b.position(12 + 8 + 36) // skip junk body
    b.put("fmt ".getBytes("ASCII")).putInt(0) // truncated: no fields
    val fs = decodeAll(Seq(MediaRow(12, "audio", b.array())))
    assert(fs(12).n_bytes == 64) // decoded, not crashed
  }

  test("strided frame sampling: offsets, tail length, fingerprints") {
    import spark.implicits._
    val payload = Array.tabulate(150)(i => (i % 251).toByte) // 3 frames
    val rows = Multimodal.sampleFrames(
      Seq(MediaRow(1, "video", payload)).toDS(), stride = 2)
      .collect().sortBy(_.frame_idx)
    // frames 0,1,2 (64+64+22 bytes); stride 2 samples 0 and 2
    assert(rows.map(_.frame_idx).toSeq == Seq(0, 2))
    assert(rows.map(_.frame_off).toSeq == Seq(0L, 128L))
    assert(rows.map(_.frame_len).toSeq == Seq(64, 22))
    val md = java.security.MessageDigest.getInstance("MD5")
    md.update(payload, 128, 22)
    val wantTail = md.digest().map("%02x".format(_)).mkString
    assert(rows(1).frame_fp == wantTail)
  }

  test("windowed PCM stand-in: per-window counts, energy, micro mean") {
    import spark.implicits._
    // 5 tokens of lengths 1,2,3,4,5; window=2 → (1,2),(3,4),(5)
    val payload = "a bb ccc dddd eeeee".getBytes("UTF-8")
    val rows = Multimodal.windowedPcm(
      Seq(MediaRow(2, "audio", payload)).toDS(), window = 2)
      .collect().sortBy(_.win_idx)
    assert(rows.map(r => (r.win_idx, r.n_samples, r.energy)).toSeq ==
      Seq((0, 2L, 5L), (1, 2L, 25L), (2, 1L, 25L)))
    assert(rows.map(_.mean_micro).toSeq ==
      Seq(1500000L, 3500000L, 5000000L))
  }

  test("nearest-neighbor resize: geometry, sampling grid, padding") {
    import spark.implicits._
    // 40 bytes → 16-wide grid, src_h = 3; resize to 2×2 samples
    // (row 0, col 0), (row 0, col 8), (row 1, col 0), (row 1, col 8):
    // out row 1 maps to src row 1*3/2 = 1, out col 1 to 1*16/2 = 8
    val payload = (0 until 40).map(i => (i + 10).toByte).toArray
    val r = Multimodal.resizeNearest(
      Seq(Multimodal.MediaRow(7, "image", payload)).toDS(),
      outW = 2, outH = 2).collect().head
    assert((r.src_w, r.src_h, r.out_w, r.out_h) == (16, 3, 2, 2))
    // sampled bytes: idx 0 → 10, idx 8 → 18, idx 16 → 26, idx 24 → 34
    assert(r.px_sum == 10L + 18L + 26L + 34L)
    // out-of-range cells pad with 0: a 1-byte payload with src_h = 1
    // samples idx 0 for BOTH out rows (nearest row 0), col 8 pads
    val tiny = Multimodal.resizeNearest(
      Seq(Multimodal.MediaRow(8, "image", Array(42.toByte))).toDS(),
      outW = 2, outH = 2).collect().head
    assert(tiny.src_h == 1 && tiny.px_sum == 84L)
  }

  test("dHash: brightness-invariant gradient bits, 16 hex nibbles, " +
      "banding finds every hamming<=3 pair") {
    import spark.implicits._
    val base = Array.tabulate(64)(i => ((i * 37 + 11) % 200).toByte)
    // uniform brightness shift flips NO gradient comparisons
    val brighter = base.map(b => ((b & 0xff) + 30).toByte)
    val rows = Multimodal.dhash(Seq(
      Multimodal.MediaRow(1, "image", base),
      Multimodal.MediaRow(2, "image", brighter)).toDS())
      .collect().map(r => r.media_id -> r.dhash).toMap
    assert(rows(1).length == 16 &&
      rows(1).forall("0123456789abcdef".contains(_)))
    assert(rows(1) == rows(2),
      s"dhash not brightness-invariant: ${rows(1)} vs ${rows(2)}")
    // banding recall on the corpus: every hamming<=3 pair (pigeonhole
    // over 4 disjoint 16-bit bands) appears in m_phash_pairs
    val dir = "/root/testdata/sf0.001"
    val hx = graft.queries.MultimodalQ.defs("m_phash")(spark, dir)
      .as[(Long, String)].collect()
    def bits(h: String): Long = java.lang.Long.parseUnsignedLong(h, 16)
    val brute = (for {
      (a, ha) <- hx; (b, hb) <- hx if a < b
      d = java.lang.Long.bitCount(bits(ha) ^ bits(hb)) if d <= 3
    } yield (a, b)).toSet
    val banded = graft.queries.MultimodalQ
      .defs("m_phash_pairs")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(brute.subsetOf(banded),
      s"banding missed ${brute -- banded}")
  }
}
