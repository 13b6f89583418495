package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing (north-star M6): media payloads ride as
  * opaque `binary` columns with typed metadata, and decode /
  * feature-extract runs batch-at-a-time over partitions — the schema,
  * partitioning, and batch shape a real image/audio decoder would use
  * with `mapInPandas`-style vectorized UDFs.
  *
  * The decode step REALLY parses media container headers —
  * PNG / JPEG / GIF / BMP / WAV are sniffed by magic bytes and their
  * dimensions / channels / frame counts read from the actual header
  * structures ([[HeaderDecoder]]). Deep payload decode (pixels,
  * samples) needs codec libraries this environment doesn't ship;
  * unrecognized payloads (e.g. the text fixtures) get deterministic
  * pseudo-features derived from byte stats, which is what the
  * `m_media_features` oracle checks.
  */
object Multimodal {

  /** Typed media row: payload + envelope metadata. */
  case class MediaRow(media_id: Long, kind: String, payload: Array[Byte])

  /** Typed decoded features (what a real decoder would emit). */
  case class MediaFeatures(
      media_id: Long, kind: String, n_bytes: Long,
      width: Int, height: Int, channels: Int, n_frames: Int)

  /** Real container-header decode: sniffs the payload's magic bytes
    * and reads dimensions / channels / frames from the format's actual
    * header layout. Anything unrecognized (or truncated mid-header)
    * falls back to deterministic pseudo-features so the pipeline never
    * throws on a corrupt payload — it tags the row instead.
    */
  object HeaderDecoder {

    def decodeBatch(rows: Iterator[MediaRow]): Iterator[MediaFeatures] =
      rows.map(decode)

    def decode(r: MediaRow): MediaFeatures = {
      val p = r.payload
      try {
        if (isPng(p)) png(r)
        else if (isJpeg(p)) jpeg(r)
        else if (isGif(p)) gif(r)
        else if (isBmp(p)) bmp(r)
        else if (isWav(p)) wav(r)
        else pseudo(r)
      } catch {
        // truncated/corrupt header: deterministic fallback, no throw
        case _: IndexOutOfBoundsException | _: ArithmeticException =>
          pseudo(r)
      }
    }

    // ---- byte readers ----
    private def u8(p: Array[Byte], i: Int): Int = p(i) & 0xff
    private def be16(p: Array[Byte], i: Int): Int =
      (u8(p, i) << 8) | u8(p, i + 1)
    private def be32(p: Array[Byte], i: Int): Int =
      (u8(p, i) << 24) | (u8(p, i + 1) << 16) | (u8(p, i + 2) << 8) | u8(p, i + 3)
    private def le16(p: Array[Byte], i: Int): Int =
      u8(p, i) | (u8(p, i + 1) << 8)
    private def le32(p: Array[Byte], i: Int): Long =
      (u8(p, i) | (u8(p, i + 1) << 8) | (u8(p, i + 2) << 16) |
        (u8(p, i + 3).toLong << 24)) & 0xffffffffL
    private def ascii(p: Array[Byte], i: Int, s: String): Boolean =
      p.length >= i + s.length && s.indices.forall(k => p(i + k) == s(k).toByte)

    // ---- PNG: 8-byte signature, then the IHDR chunk (always first):
    // width/height as big-endian u32 at 16/20, bit depth at 24,
    // color type at 25 (channels: 0→1, 2→3, 3→1, 4→2, 6→4) ----
    private def isPng(p: Array[Byte]) =
      p.length > 26 && u8(p, 0) == 0x89 && ascii(p, 1, "PNG")
    private def png(r: MediaRow): MediaFeatures = {
      val p = r.payload
      val channels = u8(p, 25) match {
        case 0 => 1; case 2 => 3; case 3 => 1; case 4 => 2; case 6 => 4
        case _ => 1
      }
      MediaFeatures(r.media_id, "png", p.length.toLong,
        be32(p, 16), be32(p, 20), channels, 1)
    }

    // ---- JPEG: FF D8, then marker segments; the SOFn marker (C0–CF
    // minus C4/C8/CC) carries height/width as big-endian u16 at
    // payload+3/+5 and the component count at +7 ----
    private def isJpeg(p: Array[Byte]) =
      p.length > 3 && u8(p, 0) == 0xff && u8(p, 1) == 0xd8
    private def jpeg(r: MediaRow): MediaFeatures = {
      val p = r.payload
      var i = 2
      while (i + 9 < p.length) {
        if (u8(p, i) != 0xff) return pseudo(r) // marker desync
        val m = u8(p, i + 1)
        if (m >= 0xc0 && m <= 0xcf && m != 0xc4 && m != 0xc8 && m != 0xcc)
          return MediaFeatures(r.media_id, "jpeg", p.length.toLong,
            be16(p, i + 7), be16(p, i + 5), u8(p, i + 9), 1)
        if (m == 0xd9 || m == 0xda) return pseudo(r) // EOI/SOS before SOF
        i += 2 + be16(p, i + 2)
      }
      pseudo(r)
    }

    // ---- GIF: "GIF87a"/"GIF89a", logical screen w/h as le16 at 6/8;
    // frames = number of image descriptors (0x2C introducers at block
    // boundaries is involved — headers only, so count the trailer-free
    // introducer bytes conservatively as 1) ----
    private def isGif(p: Array[Byte]) = p.length > 10 && ascii(p, 0, "GIF8")
    private def gif(r: MediaRow): MediaFeatures =
      MediaFeatures(r.media_id, "gif", r.payload.length.toLong,
        le16(r.payload, 6), le16(r.payload, 8), 3, 1)

    // ---- BMP: "BM", BITMAPINFOHEADER: width/height as le32 at 18/22,
    // bit count at 28 → channels = bits/8 (common 8/24/32) ----
    private def isBmp(p: Array[Byte]) = p.length > 30 && ascii(p, 0, "BM")
    private def bmp(r: MediaRow): MediaFeatures = {
      val p = r.payload
      MediaFeatures(r.media_id, "bmp", p.length.toLong,
        le32(p, 18).toInt, math.abs(le32(p, 22).toInt),
        math.max(1, le16(p, 28) / 8), 1)
    }

    // ---- WAV: RIFF/WAVE chunk walk; "fmt " carries channel count
    // (le16 at +2) and bits/sample (le16 at +14), "data" carries the
    // sample byte count → n_frames = data / (channels · bits/8);
    // width = sample rate (the time-axis resolution), height = 0 ----
    private def isWav(p: Array[Byte]) =
      p.length > 44 && ascii(p, 0, "RIFF") && ascii(p, 8, "WAVE")
    private[ops] def looksLikeWav(p: Array[Byte]) = isWav(p)
    private def wav(r: MediaRow): MediaFeatures = {
      val p = r.payload
      var channels = 1
      var bits = 8
      var rate = 0
      var dataBytes = 0L
      var i = 12L
      var ok = true
      while (ok && i + 8 <= p.length) {
        val at = i.toInt
        val size = le32(p, at + 4)
        // the fmt branch reads fields up to at+23 — a truncated
        // trailing fmt chunk must fall out of the walk, not throw
        if (ascii(p, at, "fmt ") && at + 24 <= p.length) {
          channels = math.max(1, le16(p, at + 10))
          rate = le32(p, at + 12).toInt
          bits = math.max(8, le16(p, at + 22))
        } else if (ascii(p, at, "data")) {
          dataBytes = size
        }
        // word-aligned advance, computed in Long: a corrupt unsigned
        // size >= 2^31 must not wrap negative and cycle the walk
        val next = i + 8L + size + (size & 1L)
        if (next <= i || next > Int.MaxValue) ok = false else i = next
      }
      if (!ok && dataBytes == 0L && rate == 0) return pseudo(r)
      val frames = (dataBytes / (channels.toLong * (bits / 8))).toInt
      MediaFeatures(r.media_id, "wav", p.length.toLong,
        rate, 0, channels, frames)
    }

    /** deterministic pseudo-features from byte stats — the documented
      * fallback for payloads no header parser recognizes (and the
      * oracle arithmetic for the text fixtures)
      */
    private[ops] def pseudo(r: MediaRow): MediaFeatures = {
      val n = r.payload.length.toLong
      MediaFeatures(r.media_id, r.kind, n,
        width = (16 + n % 64).toInt,
        height = (16 + (n * 7) % 64).toInt,
        channels = (1 + r.media_id % 3).toInt,
        n_frames = (1 + n / 1000).toInt)
    }
  }

  /** Typed deep-decoded content: pixel / sample statistics a training
    * pipeline filters on (resolution gates, black-frame detection,
    * silence detection).
    */
  case class MediaContent(
      media_id: Long, kind: String, width: Int, height: Int,
      channels: Int, n_samples: Long, mean_level: Double, rms: Double)

  /** REAL payload decode with the JDK's own codecs — no external
    * libraries: `javax.imageio` decodes PNG/BMP/GIF/JPEG pixels,
    * `javax.sound.sampled` decodes WAV PCM samples. Emits per-payload
    * content statistics (mean sample level, RMS). Payloads neither
    * codec recognizes (e.g. the text fixtures) yield a zeroed row
    * tagged with the envelope kind — never a throw.
    */
  object ContentDecoder {

    def decodeBatch(rows: Iterator[MediaRow]): Iterator[MediaContent] = {
      // payloads are already in memory — keep ImageIO from spooling
      // each one through an executor temp file (default useCache=true)
      javax.imageio.ImageIO.setUseCache(false)
      rows.map(decode)
    }

    def decode(r: MediaRow): MediaContent =
      try {
        if (r.payload.length > 12 &&
            HeaderDecoder.looksLikeWav(r.payload)) wav(r)
        else image(r)
      } catch { case _: Exception => fallback(r) }

    private def image(r: MediaRow): MediaContent = {
      val decoded = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(r.payload))
      if (decoded == null) return fallback(r)
      // normalize through the color model: indexed-color rasters (GIF,
      // palette PNG/BMP) hold palette INDICES and 16-bit images hold
      // 0..65535 samples — raw-sample/255 statistics would misread a
      // white GIF frame as black. Redraw anything that is not already
      // 8-bit component RGB.
      val img =
        if (decoded.getType == java.awt.image.BufferedImage.TYPE_3BYTE_BGR ||
            decoded.getType == java.awt.image.BufferedImage.TYPE_INT_RGB ||
            decoded.getType == java.awt.image.BufferedImage.TYPE_INT_BGR)
          decoded
        else {
          val rgb = new java.awt.image.BufferedImage(decoded.getWidth,
            decoded.getHeight, java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
          val g = rgb.createGraphics()
          try g.drawImage(decoded, 0, 0, null) finally g.dispose()
          rgb
        }
      val (w, h) = (img.getWidth, img.getHeight)
      val raster = img.getRaster
      val bands = raster.getNumBands
      var sum = 0.0
      var sumSq = 0.0
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          var b = 0
          while (b < bands) {
            val v = raster.getSampleDouble(x, y, b) / 255.0
            sum += v; sumSq += v * v; b += 1
          }
          x += 1
        }
        y += 1
      }
      val n = w.toLong * h * bands
      MediaContent(r.media_id, "image", w, h, bands, n,
        if (n == 0) 0.0 else sum / n,
        if (n == 0) 0.0 else math.sqrt(sumSq / n))
    }

    private def wav(r: MediaRow): MediaContent = {
      val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(r.payload))
      try {
        val fmt = in.getFormat
        val bytes = in.readAllBytes()
        val ch = fmt.getChannels
        val bits = fmt.getSampleSizeInBits
        if (bits != 16) return fallback(r) // 16-bit PCM only
        val le = !fmt.isBigEndian
        val n = bytes.length / 2
        var sum = 0.0
        var sumSq = 0.0
        var i = 0
        while (i + 1 < bytes.length) {
          val s = (if (le) ((bytes(i + 1) << 8) | (bytes(i) & 0xff))
            else ((bytes(i) << 8) | (bytes(i + 1) & 0xff))).toShort
          val v = s / 32768.0
          sum += v; sumSq += v * v
          i += 2
        }
        MediaContent(r.media_id, "wav",
          fmt.getSampleRate.toInt, 0, ch, n / math.max(1, ch),
          if (n == 0) 0.0 else sum / n,
          if (n == 0) 0.0 else math.sqrt(sumSq / n))
      } finally in.close()
    }

    private def fallback(r: MediaRow): MediaContent =
      MediaContent(r.media_id, r.kind, 0, 0, 0, 0L, 0.0, 0.0)
  }

  /** Partition-batched decode: `mapPartitions` keeps the decoder
    * amortized per batch (decoder init happens once per partition, as
    * with Pandas UDF batches).
    */
  def extractFeatures(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions(HeaderDecoder.decodeBatch _)
  }

  /** Deep content decode (pixels / PCM samples) over the same
    * partition-batched shape.
    */
  def decodeContent(media: Dataset[MediaRow]): Dataset[MediaContent] = {
    import media.sparkSession.implicits._
    media.mapPartitions(ContentDecoder.decodeBatch _)
  }

  /** Documents→media bridge used by tests and the oracle query: text
    * bytes stand in for a media payload.
    */
  def documentsAsMedia(docs: DataFrame): Dataset[MediaRow] = {
    import docs.sparkSession.implicits._
    docs.select(
      col("doc_id").as("media_id"),
      lit("text").as("kind"),
      encode(col("text"), "UTF-8").as("payload"))
      .as[MediaRow]
  }

  /** One sampled frame of a framed container: byte offset, length and
    * content fingerprint — what a video frame-sampling stage hands to
    * a downstream embedder.
    */
  case class FrameSample(media_id: Long, frame_idx: Int, frame_off: Long,
      frame_len: Int, frame_fp: String)

  /** Strided frame sampling over a framed container (the video
    * decode shape: pick every k-th frame, fingerprint its bytes for
    * downstream dedup/embedding). The container codec is STUBBED as
    * fixed [[FrameBytes]]-byte frames of the payload — the fixture
    * corpus has no real video — but the plumbing is the real thing:
    * typed mapPartitions with a per-partition digest instance, one
    * output row per sampled frame (explode-shaped), deterministic
    * offsets a real demuxer would produce from its frame index.
    */
  val FrameBytes = 64
  def sampleFrames(media: Dataset[MediaRow], stride: Int)
      : Dataset[FrameSample] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      // one digest per partition batch, reset per frame (the same
      // amortization a real decoder needs for its codec context)
      val md = java.security.MessageDigest.getInstance("MD5")
      rows.flatMap { r =>
        val n = r.payload.length
        val nFrames = (n + FrameBytes - 1) / FrameBytes
        Iterator.range(0, nFrames, stride).map { fi =>
          val off = fi.toLong * FrameBytes
          val len = math.min(FrameBytes, n - off.toInt)
          md.reset()
          md.update(r.payload, off.toInt, len)
          val fp = md.digest().map("%02x".format(_)).mkString
          FrameSample(r.media_id, fi, off, len, fp)
        }
      }
    }
  }

  /** Fixed-grid patch extraction (the ViT patchify shape): every
    * FrameBytes frame splits into patchBytes patches, and each patch
    * reports offset/length, md5, and its integer byte sum — the
    * per-patch features a vision tokenizer computes before
    * projection. Same explode-shaped typed mapPartitions as
    * sampleFrames; the ASCII corpus makes the char-sliced oracle
    * byte-exact.
    */
  case class Patch(media_id: Long, frame_idx: Int, patch_idx: Int,
      off: Long, len: Int, fp: String, byte_sum: Long)

  def patchify(media: Dataset[MediaRow], patchBytes: Int)
      : Dataset[Patch] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      val md = java.security.MessageDigest.getInstance("MD5")
      rows.flatMap { r =>
        val n = r.payload.length
        val nFrames = (n + FrameBytes - 1) / FrameBytes
        Iterator.range(0, nFrames).flatMap { fi =>
          val foff = fi * FrameBytes
          val flen = math.min(FrameBytes, n - foff)
          val nPatches = (flen + patchBytes - 1) / patchBytes
          Iterator.range(0, nPatches).map { pi =>
            val off = foff + pi * patchBytes
            val len = math.min(patchBytes, n - off)
            md.reset()
            md.update(r.payload, off, len)
            val fp = md.digest().map("%02x".format(_)).mkString
            var s = 0L
            var i = off
            while (i < off + len) { s += r.payload(i) & 0xff; i += 1 }
            Patch(r.media_id, fi, pi, off.toLong, len, fp, s)
          }
        }
      }
    }
  }

  /** Windowed sample statistics (media_id, window) — the audio
    * feature-extraction shape: fixed-size sample windows, per-window
    * energy and integer-micro mean. Samples are STUBBED as the
    * payload's whitespace-token byte lengths (a deterministic PCM
    * stand-in the oracle can replay); the imperative payload parse
    * and the per-window fold run inside the same typed mapPartitions
    * batch a real PCM decoder would use.
    */
  case class PcmWindow(media_id: Long, win_idx: Int, n_samples: Long,
      energy: Long, mean_micro: Long)

  def windowedPcm(media: Dataset[MediaRow], window: Int)
      : Dataset[PcmWindow] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.flatMap { r =>
        val samples = new String(r.payload,
          java.nio.charset.StandardCharsets.UTF_8)
          .trim.split("\\s+").map(_.length.toLong)
        samples.grouped(window).zipWithIndex.map { case (w, i) =>
          PcmWindow(r.media_id, i, w.length.toLong,
            w.map(v => v * v).sum, w.sum * 1000000L / w.length)
        }
      }
    }
  }

  /** One resized image per media row: source/target geometry, the
    * integer pixel sum and a fingerprint of the resized grid — what
    * an image-normalization stage hands to an embedder.
    */
  case class ResizedImage(media_id: Long, src_w: Int, src_h: Int,
      out_w: Int, out_h: Int, px_sum: Long, px_fp: String)

  /** Nearest-neighbor resize to a fixed (outW × outH) grid (the
    * image-preprocessing shape: every vision pipeline normalizes
    * geometry before embedding). The image decode is STUBBED as a
    * 16-byte-per-row grid over the payload (out-of-range cells are
    * 0) — the fixture corpus has no real images — but the plumbing
    * is the real thing: per-row imperative resampling inside one
    * typed mapPartitions batch, integer-exact arithmetic the oracle
    * replays, one output row per media.
    */
  val RowBytes = 16
  def resizeNearest(media: Dataset[MediaRow], outW: Int, outH: Int)
      : Dataset[ResizedImage] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      val md = java.security.MessageDigest.getInstance("MD5")
      rows.map { r =>
        val n = r.payload.length
        val srcH = math.max(1, (n + RowBytes - 1) / RowBytes)
        val px = new Array[Int](outW * outH)
        var i = 0
        while (i < px.length) {
          val sr = (i / outW) * srcH / outH
          val sc = (i % outW) * RowBytes / outW
          val idx = sr * RowBytes + sc
          px(i) = if (idx < n) r.payload(idx) & 0xff else 0
          i += 1
        }
        md.reset()
        val fp = md.digest(px.mkString(",").getBytes("UTF-8"))
          .map("%02x".format(_)).mkString
        ResizedImage(r.media_id, RowBytes, srcH, outW, outH,
          px.foldLeft(0L)(_ + _), fp)
      }
    }
  }

  case class DHashRow(media_id: Long, dhash: String)

  /** Perceptual difference-hash (dHash, the classic image near-dup
    * fingerprint): resample to a 9×8 grid with the same stubbed
    * nearest-neighbor sampling resizeNearest uses, then bit k
    * (row k/8, col k%8) is 1 iff the pixel is darker than its right
    * neighbor — 64 gradient bits, robust to uniform brightness
    * shifts. Rendered as 16 hex nibbles MSB-first so a 16-bit band
    * is exactly a 4-character substring (m_phash_pairs bands on
    * that, SimHash-style). Pure per-row typed work; the oracle
    * replays every pixel and bit.
    */
  def dhash(media: Dataset[MediaRow]): Dataset[DHashRow] = {
    import media.sparkSession.implicits._
    val outW = 9; val outH = 8
    media.mapPartitions { rows =>
      rows.map { r =>
        val n = r.payload.length
        val srcH = math.max(1, (n + RowBytes - 1) / RowBytes)
        val px = new Array[Int](outW * outH)
        var i = 0
        while (i < px.length) {
          val sr = (i / outW) * srcH / outH
          val sc = (i % outW) * RowBytes / outW
          val idx = sr * RowBytes + sc
          px(i) = if (idx < n) r.payload(idx) & 0xff else 0
          i += 1
        }
        var h = 0L
        var k = 0
        while (k < 64) {
          val row = k / 8; val col = k % 8
          if (px(row * outW + col) < px(row * outW + col + 1))
            h |= 1L << (63 - k)
          k += 1
        }
        DHashRow(r.media_id, f"$h%016x")
      }
    }
  }
}
