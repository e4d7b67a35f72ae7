package graft.multimodal

import java.nio.{ByteBuffer, ByteOrder}
import java.util.zip.CRC32
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.Catalog.Q

/** One file from the binaryFile datasource. */
final case class RawMedia(file_name: String, byte_len: Long, content: Array[Byte])

/** Decoded container metadata. Nullable fields don't apply to the
  * format (images have no sample rate, audio no raster).
  */
final case class MediaInfo(
    file_name: String, format: String, supported: Boolean, byte_len: Long,
    width: Option[Int], height: Option[Int],
    channels: Option[Int], sample_rate: Option[Int],
    n_samples: Option[Long], duration_ms: Option[Long])

/** A resized image: new dims, re-encoded payload checksum, and exact
  * per-channel sums of the RESIZED raster — the sums are what the
  * DuckDB oracle replays (nearest-neighbor picks sit at closed-form
  * source offsets); the checksum pins the re-encode byte-exactly in
  * the spec.
  */
final case class ResizedImage(
    file_name: String, width: Int, height: Int,
    new_width: Int, new_height: Int, out_bytes: Int, crc32: Long,
    sum_r: Long, sum_g: Long, sum_b: Long)

/** One audio analysis window. */
final case class AudioWindow(
    file_name: String, window_idx: Int, n_samples: Long, mean_abs: Double)

/** One sampled clip frame: dims + exact per-channel byte sums. */
final case class FrameSample(
    file_name: String, frame_idx: Int, width: Int, height: Int,
    sum_r: Long, sum_g: Long, sum_b: Long)

/** A fully-decoded PNG: dims + exact per-channel pixel sums. */
final case class PngPixels(
    file_name: String, width: Int, height: Int,
    sum_r: Long, sum_g: Long, sum_b: Long)

/** A fully-decoded JPEG: dims + band count + exact per-channel sums
  * of the decoded raster.
  */
final case class JpegPixels(
    file_name: String, width: Int, height: Int, n_bands: Int,
    sum_r: Long, sum_g: Long, sum_b: Long)

/** REAL multimodal decode — container formats that are pure byte
  * arithmetic (P6 PPM: ASCII header + raw RGB raster; 24-bit
  * uncompressed BMP: fixed LE headers + padded BGR rows; PCM WAV:
  * RIFF chunks + raw LE16 samples), PNG via this file's own
  * inflate + un-filter pipeline (`decodePng`), and JPEG via the
  * JDK's built-in ImageIO codec (`jpegSums` — the one compressed
  * format every JVM ships a real decoder for, so "no codec libs in
  * the container" was never true for it). Remaining codecs
  * (MP3/H.264) keep the documented unsupported fallback
  * (`Multimodal.decode` stays the stub for those).
  *
  * Source is Spark's `binaryFile` DSv2 datasource over the committed
  * fixtures (`tools/gen_media_fixture.py`). Scale shape: files
  * partition across executors at read, every operator below is
  * map-only (`mapPartitions`, codec-state amortized per partition),
  * and the payload column is pruned the moment metadata is extracted
  * — bytes never cross a shuffle.
  */
object MediaCodecs {

  val MediaDir = graft.sources.Fixtures.path("fixtures/media")

  // -- parsers (pure JVM, no libraries) --------------------------------

  /** P6 PPM: `P6 <ws> width <ws> height <ws> maxval <single-ws>` then
    * raw RGB. Returns (width, height, rasterOffset) or None.
    */
  def parsePpm(b: Array[Byte]): Option[(Int, Int, Int)] =
    parsePpmAt(b, 0)

  /** [[parsePpm]] generalized to a frame at byte offset `start` — the
    * shared header parser for single images and concatenated-frame
    * clip streams ([[parseP6Stream]]). The returned rasterOffset is
    * absolute in `b`.
    */
  def parsePpmAt(b: Array[Byte], start: Int): Option[(Int, Int, Int)] = {
    if (start < 0 || b.length - start < 10 ||
        b(start) != 'P' || b(start + 1) != '6') return None
    var i = start + 2
    def skipWs(): Unit = {
      while (i < b.length &&
        (b(i) == ' ' || b(i) == '\n' || b(i) == '\r' || b(i) == '\t')) i += 1
      if (i < b.length && b(i) == '#') { // comment to end of line
        while (i < b.length && b(i) != '\n') i += 1
        skipWs()
      }
    }
    def int(): Long = {
      skipWs()
      var v = 0L
      // cap the accumulator so absurd headers can't wrap; anything
      // past 8 digits is already far beyond a sane raster dimension
      while (i < b.length && b(i) >= '0' && b(i) <= '9') {
        v = math.min(v * 10 + (b(i) - '0'), 100000000L); i += 1
      }
      v
    }
    val (w, h, maxv) = (int(), int(), int())
    // exactly ONE whitespace byte separates maxval from the raster
    // (PPM spec) — reject a non-whitespace terminator, and reject the
    // ambiguous CRLF pair outright: treating '\r' as the separator
    // would shift the raster offset by one and silently mis-read
    // every pixel while still passing the length check.
    if (i >= b.length ||
        !(b(i) == ' ' || b(i) == '\n' || b(i) == '\r' || b(i) == '\t'))
      return None
    if (b(i) == '\r' && i + 1 < b.length && b(i + 1) == '\n') return None
    i += 1
    // Long arithmetic for the raster bound: a crafted 50000x50000
    // header would overflow w*h*3 as Int, sneak past the length
    // check, and read out of bounds downstream
    if (w <= 0 || h <= 0 || w > 65535 || h > 65535 || maxv != 255 ||
        b.length.toLong < i.toLong + w * h * 3) None
    else Some((w.toInt, h.toInt, i))
  }

  /** P6 clip stream (`.p6v`): back-to-back same-dimension P6 frames —
    * the no-codec stand-in for a video container. Returns one
    * (absolute rasterOffset) per frame, or Nil if any frame is
    * malformed, dimensions drift mid-stream, or there is trailing
    * garbage — a corrupt clip degrades whole, never half-decodes.
    */
  def parseP6Stream(b: Array[Byte]): (Int, Int, Seq[Int]) = {
    val none = (0, 0, Seq.empty[Int])
    parsePpmAt(b, 0) match {
      case None => none
      case Some((w0, h0, off0)) =>
        val frame = w0 * h0 * 3
        val offs = Seq.newBuilder[Int]
        offs += off0
        var next = off0 + frame
        while (next < b.length) {
          parsePpmAt(b, next) match {
            case Some((w, h, off)) if w == w0 && h == h0 =>
              offs += off; next = off + frame
            case _ => return none
          }
        }
        if (next != b.length) none else (w0, h0, offs.result())
    }
  }

  /** 24-bit uncompressed BMP (BI_RGB): BITMAPFILEHEADER (14 bytes) +
    * BITMAPINFOHEADER (40 bytes), rows bottom-up and padded to 4
    * bytes. Returns (width, |height|, rasterOffset) — a negative
    * stored height means top-down row order, also a valid layout.
    */
  def parseBmp(b: Array[Byte]): Option[(Int, Int, Int)] = {
    if (b.length < 54 || b(0) != 'B' || b(1) != 'M') return None
    val bb = ByteBuffer.wrap(b).order(ByteOrder.LITTLE_ENDIAN)
    val pixelOff = bb.getInt(10)
    val hdrSize = bb.getInt(14)
    val w = bb.getInt(18)
    val hRaw = bb.getInt(22)
    val planes = bb.getShort(26).toInt
    val bpp = bb.getShort(28).toInt
    val compression = bb.getInt(30)
    val h = math.abs(hRaw) // Int.MinValue stays negative → h <= 0 rejects
    // Long stride math: a crafted width would overflow w*3 as Int,
    // sneak past the length check, and read out of bounds downstream
    val stride = (w.toLong * 3 + 3) / 4 * 4
    if (hdrSize < 40 || planes != 1 || bpp != 24 || compression != 0 ||
        w <= 0 || w > 65535 || h <= 0 || h > 65535 ||
        pixelOff < 54 || pixelOff.toLong + stride * h > b.length) None
    else Some((w, h, pixelOff))
  }

  /** PCM WAV: RIFF/WAVE with an `fmt ` chunk (PCM=1, 16-bit) and a
    * `data` chunk. Returns (channels, sampleRate, nSamples, dataOffset).
    */
  def parseWav(b: Array[Byte]): Option[(Int, Int, Long, Int)] = {
    if (b.length < 44) return None
    val bb = ByteBuffer.wrap(b).order(ByteOrder.LITTLE_ENDIAN)
    def tag(off: Int): String = new String(b, off, 4, "US-ASCII")
    if (tag(0) != "RIFF" || tag(8) != "WAVE") return None
    var off = 12
    var fmt: Option[(Int, Int, Int)] = None // channels, rate, bits
    var data: Option[(Int, Int)] = None     // offset, len
    while (off + 8 <= b.length && (fmt.isEmpty || data.isEmpty)) {
      val id = tag(off)
      val len = bb.getInt(off + 4)
      // a malformed chunk length (negative, or past the buffer) must
      // fall through to the unsupported-format path, not spin the
      // chunk walk in place (len = -8 would advance off by zero) or
      // run the cursor out of bounds
      if (len < 0 || off.toLong + 8 + len > b.length) return None
      if (id == "fmt " && len >= 16) {
        val audioFormat = bb.getShort(off + 8).toInt
        if (audioFormat != 1) return None // PCM only
        fmt = Some((bb.getShort(off + 10).toInt, bb.getInt(off + 12),
          bb.getShort(off + 22).toInt))
      } else if (id == "data") {
        data = Some((off + 8, len))
      }
      off += 8 + len + (len & 1) // chunks are 2-byte aligned
    }
    for ((ch, rate, bits) <- fmt; (doff, dlen) <- data;
         if bits == 16 && ch > 0 && rate > 0 && doff + dlen <= b.length)
      yield (ch, rate, dlen.toLong / (ch * 2), doff)
  }

  /** PNG signature + IHDR for the supported subtype: 8-bit RGB
    * (color type 2), deflate compression, filter method 0,
    * non-interlaced — the layout every real RGB training image uses.
    * Returns (width, height) or None (other subtypes fall through to
    * the unsupported path row-wise, like every codec here).
    */
  def parsePngHeader(b: Array[Byte]): Option[(Int, Int)] = {
    val sig = Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a)
    if (b.length < 33) return None
    var i = 0
    while (i < 8) { if ((b(i) & 0xff) != sig(i)) return None; i += 1 }
    val bb = ByteBuffer.wrap(b) // PNG ints are big-endian (buffer default)
    if (bb.getInt(8) != 13 ||
        new String(b, 12, 4, "US-ASCII") != "IHDR") return None
    val w = bb.getInt(16)
    val h = bb.getInt(20)
    val (depth, ctype) = (b(24) & 0xff, b(25) & 0xff)
    val (comp, filt, inter) = (b(26) & 0xff, b(27) & 0xff, b(28) & 0xff)
    if (w <= 0 || w > 65535 || h <= 0 || h > 65535 ||
        depth != 8 || ctype != 2 || comp != 0 || filt != 0 || inter != 0)
      None
    else Some((w, h))
  }

  private def paeth(a: Int, b: Int, c: Int): Int = {
    val p = a + b - c
    val (pa, pb, pc) = (math.abs(p - a), math.abs(p - b), math.abs(p - c))
    if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
  }

  /** Full PNG decode, pure JVM: chunk walk → concatenated IDAT
    * payloads → `java.util.zip.Inflater` (PNG's zlib stream needs no
    * external codec — the JDK ships the inflate half of DEFLATE) →
    * per-row un-filter, all five filter types (None/Sub/Up/Average/
    * Paeth). Returns (width, height, raster) with the raster in
    * row-major RGB, or None for anything malformed: bad chunk
    * lengths, truncated or corrupt zlib data (DataFormatException /
    * short output), an unknown filter type, a missing IEND. A corrupt
    * file degrades to one dropped row, never a failed task.
    */
  def decodePng(b: Array[Byte]): Option[(Int, Int, Array[Byte])] = {
    val hdr = parsePngHeader(b)
    if (hdr.isEmpty) return None
    val (w, h) = hdr.get
    val bb = ByteBuffer.wrap(b)
    val idat = new java.io.ByteArrayOutputStream()
    var off = 33 // first chunk after IHDR (8 sig + 25 IHDR)
    var sawEnd = false
    while (off + 8 <= b.length && !sawEnd) {
      val len = bb.getInt(off)
      if (len < 0 || off.toLong + 12 + len > b.length) return None
      val typ = new String(b, off + 4, 4, "US-ASCII")
      if (typ == "IDAT") idat.write(b, off + 8, len)
      else if (typ == "IEND") sawEnd = true
      off += 12 + len // len + type + data + crc
    }
    if (!sawEnd || idat.size == 0) return None

    val stride = 3 * w
    val raw = new Array[Byte](h * (1 + stride)) // filter byte + row, per row
    val inf = new java.util.zip.Inflater()
    inf.setInput(idat.toByteArray)
    try {
      var got = 0
      while (got < raw.length && !inf.finished()) {
        val n = inf.inflate(raw, got, raw.length - got)
        if (n == 0 && inf.needsInput()) return None // truncated stream
        got += n
      }
      if (got < raw.length) return None
    } catch {
      case _: java.util.zip.DataFormatException => return None
    } finally inf.end()

    val out = new Array[Byte](h * stride)
    var y = 0
    while (y < h) {
      val ft = raw(y * (1 + stride)) & 0xff
      if (ft > 4) return None
      val src = y * (1 + stride) + 1
      val dst = y * stride
      var x = 0
      while (x < stride) {
        val cur = raw(src + x) & 0xff
        // neighbors are in RECONSTRUCTED bytes, offset by one pixel
        // (3 bytes), per the PNG spec
        val left = if (x >= 3) out(dst + x - 3) & 0xff else 0
        val up = if (y > 0) out(dst - stride + x) & 0xff else 0
        val ul = if (y > 0 && x >= 3) out(dst - stride + x - 3) & 0xff else 0
        val v = ft match {
          case 0 => cur
          case 1 => cur + left
          case 2 => cur + up
          case 3 => cur + (left + up) / 2
          case 4 => cur + paeth(left, up, ul)
        }
        out(dst + x) = (v & 0xff).toByte
        x += 1
      }
      y += 1
    }
    Some((w, h, out))
  }

  /** JPEG frame-header metadata: (width, height, components) from
    * the SOF0/SOF2 segment, found by the standard marker walk
    * (FF D8, then FF-prefixed segments with big-endian lengths; SOF
    * always precedes SOS, so the walk never touches entropy-coded
    * bytes). Pure segment arithmetic — the full pixel decode is
    * [[jpegSums]]'s ImageIO path; this is the header surface m2
    * reports and the DuckDB oracle re-derives via a recursive-CTE
    * marker walk over the hex payload.
    */
  def parseJpegSof(b: Array[Byte]): Option[(Int, Int, Int)] = {
    def u8(i: Int) = b(i) & 0xff
    def be16(i: Int) = (u8(i) << 8) | u8(i + 1)
    if (b.length < 4 || u8(0) != 0xff || u8(1) != 0xd8) return None
    var p = 2
    var guard = 0
    while (p + 9 < b.length && guard < 256) {
      if (u8(p) != 0xff) return None
      u8(p + 1) match {
        case 0xc0 | 0xc2 => return Some((be16(p + 7), be16(p + 5), u8(p + 9)))
        case 0xda => return None // SOS before any SOF: malformed
        case _ => p += 2 + be16(p + 2)
      }
      guard += 1
    }
    None
  }

  /** m7's per-file artifact: full entropy decode through the JDK's
    * ImageIO JPEG codec → dims, band count, exact per-channel sums
    * of the DECODED raster. Corrupt/truncated scans drop row-wise
    * (ImageIO throws mid-scan); null returns (no registered reader
    * claiming the bytes) drop too. The codec-state/cache toggle is
    * process-wide and set once.
    */
  def jpegSums(m: RawMedia): Option[JpegPixels] = {
    javax.imageio.ImageIO.setUseCache(false) // no temp-file churn per record
    val b = m.content
    // integrity gate BEFORE decode: a JPEG stream ends with the EOI
    // marker (FF D9). ImageIO silently gray-fills a truncated scan's
    // missing MCUs instead of failing, so without this check the
    // judged artifact for a corrupt file would be
    // decoder-implementation-defined fill, not content.
    val eoi = b.length >= 4 &&
      (b(b.length - 2) & 0xff) == 0xff && (b(b.length - 1) & 0xff) == 0xd9
    (if (!eoi) None
    else try Option(javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(b)))
    catch { case _: Exception => None })
      .map { img =>
        val (w, h) = (img.getWidth, img.getHeight)
        var (sr, sg, sb) = (0L, 0L, 0L)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val rgb = img.getRGB(x, y)
            sr += (rgb >> 16) & 0xff; sg += (rgb >> 8) & 0xff; sb += rgb & 0xff
            x += 1
          }
          y += 1
        }
        JpegPixels(m.file_name, w, h, img.getRaster.getNumBands, sr, sg, sb)
      }
  }

  /** m6's per-file artifact: full decode → exact per-channel pixel
    * sums (integers, so a second decoder can replay them exactly).
    */
  def pngSums(m: RawMedia): Option[PngPixels] =
    (try decodePng(m.content) catch { case _: RuntimeException => None })
      .map { case (w, h, px) =>
        var (sr, sg, sb) = (0L, 0L, 0L)
        var p = 0
        while (p < px.length) {
          sr += px(p) & 0xff; sg += px(p + 1) & 0xff; sb += px(p + 2) & 0xff
          p += 3
        }
        PngPixels(m.file_name, w, h, sr, sg, sb)
      }

  // -- source ----------------------------------------------------------

  /** binaryFile DSv2 read: (path, modificationTime, length, content).
    * Payload pruned to (file_name, length, content) immediately.
    */
  def readMedia(s: SparkSession, dir: String = MediaDir): Dataset[RawMedia] = {
    import s.implicits._
    s.read.format("binaryFile").load(dir)
      .select(
        regexp_extract(col("path"), "([^/]+)$", 1).as("file_name"),
        col("length").as("byte_len"),
        col("content"))
      .as[RawMedia]
  }

  private def fmtOf(name: String): String =
    name.substring(name.lastIndexOf('.') + 1).toLowerCase

  // -- operators (all map-only) ----------------------------------------

  def decodeInfo(it: Iterator[RawMedia]): Iterator[MediaInfo] =
    it.map { m =>
      val f = fmtOf(m.file_name)
      // belt over the parsers' own bounds checks: a corrupt file must
      // degrade to supported=false, never fail the whole task
      (try {
        f match {
          case "ppm" => parsePpm(m.content).map { case (w, h, _) =>
            MediaInfo(m.file_name, f, supported = true, m.byte_len,
              Some(w), Some(h), None, None, None, None)
          }
          case "bmp" => parseBmp(m.content).map { case (w, h, _) =>
            MediaInfo(m.file_name, f, supported = true, m.byte_len,
              Some(w), Some(h), None, None, None, None)
          }
          case "wav" => parseWav(m.content).map { case (ch, rate, n, _) =>
            MediaInfo(m.file_name, f, supported = true, m.byte_len,
              None, None, Some(ch), Some(rate), Some(n),
              Some(n * 1000L / rate))
          }
          case "png" => parsePngHeader(m.content).map { case (w, h) =>
            MediaInfo(m.file_name, f, supported = true, m.byte_len,
              Some(w), Some(h), None, None, None, None)
          }
          case "jpg" => parseJpegSof(m.content).map { case (w, h, _) =>
            MediaInfo(m.file_name, f, supported = true, m.byte_len,
              Some(w), Some(h), None, None, None, None)
          }
          case _ => None
        }
      } catch { case _: RuntimeException => None })
        .getOrElse(MediaInfo(m.file_name, f, supported = false,
          m.byte_len, None, None, None, None, None, None))
    }

  /** Nearest-neighbor downsample by an integer factor, re-encoded as
    * P6 — a real raster transform, not a metadata fake. Non-image
    * rows are dropped (the operator is format-typed).
    */
  def resizePpm(m: RawMedia, factor: Int): Option[ResizedImage] =
    parsePpm(m.content).map { case (w, h, off) =>
      val nw = math.max(1, w / factor)
      val nh = math.max(1, h / factor)
      val header = s"P6\n$nw $nh\n255\n".getBytes("US-ASCII")
      val out = new Array[Byte](header.length + nw * nh * 3)
      System.arraycopy(header, 0, out, 0, header.length)
      var p = header.length
      var ny = 0
      var (sr, sg, sb) = (0L, 0L, 0L)
      while (ny < nh) {
        var nx = 0
        while (nx < nw) {
          val src = off + ((ny * factor) * w + (nx * factor)) * 3
          out(p) = m.content(src); out(p + 1) = m.content(src + 1)
          out(p + 2) = m.content(src + 2)
          sr += out(p) & 0xff; sg += out(p + 1) & 0xff; sb += out(p + 2) & 0xff
          p += 3; nx += 1
        }
        ny += 1
      }
      val crc = new CRC32
      crc.update(out)
      ResizedImage(m.file_name, w, h, nw, nh, out.length, crc.getValue,
        sr, sg, sb)
    }

  /** Fixed-duration window stats over PCM samples (all channels
    * interleaved): per-window count + mean absolute amplitude —
    * the frame-sample/feature-extract step of an audio pipeline.
    */
  def wavWindows(m: RawMedia, windowMs: Int): Seq[AudioWindow] =
    parseWav(m.content).toSeq.flatMap { case (ch, rate, nSamples, off) =>
      val bb = ByteBuffer.wrap(m.content).order(ByteOrder.LITTLE_ENDIAN)
      val perWindow = rate.toLong * windowMs / 1000
      if (perWindow == 0) Seq.empty
      else (0L until nSamples).grouped(perWindow.toInt).zipWithIndex.map {
        case (idx, win) =>
          var sum = 0L
          idx.foreach { s =>
            var c = 0
            while (c < ch) {
              sum += math.abs(bb.getShort(off + (s.toInt * ch + c) * 2).toInt)
              c += 1
            }
          }
          AudioWindow(m.file_name, win, idx.length.toLong,
            sum.toDouble / (idx.length.toLong * ch))
      }.toSeq
    }

  /** Every `stride`-th frame of a clip stream, with exact per-channel
    * byte sums — the frame-sample / feature-extract step of a video
    * pipeline (sample 1-in-N frames, featurize, drop the payload).
    * Map-only like the other codecs; the sums are integers so the
    * DuckDB hex decoder can replay them exactly.
    */
  def frameSamples(m: RawMedia, stride: Int): Seq[FrameSample] = {
    val (w, h, offs) = parseP6Stream(m.content)
    offs.zipWithIndex.collect { case (off, idx) if idx % stride == 0 =>
      var (sr, sg, sb) = (0L, 0L, 0L)
      var p = off
      val end = off + w * h * 3
      while (p < end) {
        sr += m.content(p) & 0xff
        sg += m.content(p + 1) & 0xff
        sb += m.content(p + 2) & 0xff
        p += 3
      }
      FrameSample(m.file_name, idx, w, h, sr, sg, sb)
    }
  }

  // -- judged queries --------------------------------------------------
  // m2 is oracle-checked: DuckDB re-decodes the SAME container
  // headers independently (read_blob → hex-string byte arithmetic +
  // an ASCII-prefix regex), so two unrelated decoders must agree on
  // every metadata field. m3 is oracle-checked too: nearest-neighbor
  // picks sit at closed-form SOURCE offsets, so DuckDB replays the
  // resized raster's channel sums without performing the resize
  // (crc32 of the re-encode is spec-pinned, not judged — no SQL
  // engine replays CRC). m4 is oracle-checked the same way: the
  // fixtures' PCM samples sit at closed-form LE offsets after the
  // canonical 44-byte header, so the windowed mean-absolute
  // amplitudes are byte arithmetic DuckDB replays exactly (one
  // integer-sum division per window — no float accumulation order).

  def m2MediaDecode(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    readMedia(s).mapPartitions(decodeInfo).toDF().orderBy(col("file_name"))
  }

  def m3ImageResize(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    // format-typed: single-image PPMs only. A .p6v clip's FIRST frame
    // also parses as a valid PPM header (the stream is back-to-back
    // PPMs by construction), so without the extension filter the
    // image operator would silently resize frame 0 of every clip —
    // clips belong to m5.
    readMedia(s)
      .where(col("file_name").endsWith(".ppm"))
      .mapPartitions(_.flatMap(resizePpm(_, 2))).toDF()
      .drop("crc32") // judged surface = SQL-replayable columns
      .orderBy(col("file_name"))
  }

  def m4AudioWindows(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    readMedia(s).mapPartitions(_.flatMap(wavWindows(_, 100))).toDF()
      .orderBy(col("file_name"), col("window_idx"))
  }

  def m5FrameSample(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    readMedia(s)
      .where(col("file_name").endsWith(".p6v"))
      .mapPartitions(_.flatMap(frameSamples(_, 2))).toDF()
      .orderBy(col("file_name"), col("frame_idx"))
  }

  /** Judged full-PNG-decode query: inflate + un-filter every
    * supported fixture PNG and emit exact per-channel pixel sums.
    * Unsupported subtypes (the planted RGBA file) and corrupt files
    * drop row-wise. Map-only like every codec here.
    */
  def m6PngDecode(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    readMedia(s)
      .where(col("file_name").endsWith(".png"))
      .mapPartitions(_.flatMap(pngSums(_))).toDF()
      .orderBy(col("file_name"))
  }

  /** Judged full-JPEG-decode query: real entropy decode of every
    * fixture JPEG through the JDK codec, exact per-channel sums of
    * the decoded raster. The truncated fixture (valid headers, cut
    * mid-scan) drops row-wise — the header-level m2 still lists it,
    * which is the judged demonstration that metadata extraction and
    * payload decode fail independently. Rows-only: no SQL engine
    * re-decodes entropy-coded JPEG, so content is pinned by
    * MediaCodecsSpec (encode→decode error bounds on known rasters,
    * SOF-vs-decoded dimension agreement, corrupt degradation).
    */
  def m7JpegDecode(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    readMedia(s)
      .where(col("file_name").endsWith(".jpg"))
      .mapPartitions(_.flatMap(jpegSums(_))).toDF()
      .orderBy(col("file_name"))
  }

  /** Little-endian int of `n` bytes at 1-indexed byte offset `p` of
    * the hex-string column `h` — DuckDB 1.0 has no blob substring,
    * but hex() of the whole payload plus string slicing is equivalent.
    */
  private def le(p: Int, n: Int): String =
    "CAST('0x' || " +
      (p + n - 1).to(p, -1).map(i => s"substr(h, ${2 * i - 1}, 2)")
        .mkString(" || ") + " AS INTEGER)"

  /** The independent SQL decoder: fixture layouts are canonical
    * (fmt/data chunks at fixed RIFF offsets, headers as the
    * generator writes them), so fixed-offset arithmetic is a valid
    * second decoder for this corpus — the Scala side still does the
    * general chunk walk, and the two must agree field by field.
    */
  /** The IHDR subtype gate replicated in SQL: signature + 13-byte
    * IHDR + (depth 8, color type 2, deflate, filter 0, non-
    * interlaced) — hex() is uppercase in DuckDB. PNG ints are
    * big-endian, so a BE field is just a CONTIGUOUS hex slice.
    */
  private val pngOk: String =
    "(substr(h, 1, 32) = '89504E470D0A1A0A0000000D49484452'" +
      " AND substr(h, 49, 10) = '0802000000')"

  /** m7's oracle: an identity read of the COMMITTED golden table.
    * A JPEG entropy decode has no DuckDB twin (no Huffman/IDCT in
    * SQL), so the expected per-channel sums are minted by a second,
    * fully independent decoder — `tools/jpeg_decode.py`, a
    * from-scratch Python implementation of the published libjpeg-6b
    * algorithms (baseline Huffman, islow integer IDCT, h2v2 fancy
    * upsampling, table-based YCbCr→RGB) — which agrees with the
    * JDK's ImageIO codec bit-exactly on every committed fixture.
    * The golden parquet is the committed artifact of that agreement;
    * the gate then hash-compares Spark's live decode against it, so
    * a codec regression on either side goes loudly red.
    */
  private val GoldenM7 = graft.sources.Fixtures.path(
    "fixtures/golden/m7_expected.parquet")
  private val m7Oracle: String =
    s"SELECT * FROM read_parquet('$GoldenM7')"

  private val m2Oracle: String = {
    val ppmHdr = """P6\n(\d+) (\d+)\n255\n"""
    s"""
      WITH RECURSIVE b AS (
        SELECT regexp_extract(filename, '([^/]+)$$', 1) AS file_name,
               lower(regexp_extract(filename, '\\.([^.]+)$$', 1)) AS format,
               size AS byte_len,
               hex(content) AS h
        FROM read_blob('$MediaDir/*')),
      f AS (
        SELECT *,
               CASE WHEN format = 'ppm' THEN
                 list_aggregate(list_transform(
                   range(1, CAST(least(byte_len, 20) AS INTEGER) + 1),
                   i -> chr(CAST('0x' || substr(h, 2*i-1, 2) AS INTEGER))),
                   'string_agg', '')
               END AS hdr
        FROM b),
      -- the independent JPEG decoder: walk FF-prefixed segments from
      -- byte 3 (1-indexed; bytes 1-2 are FFD8) until SOF0/SOF2; each
      -- segment is [FF, marker, be16 len incl. itself], so the next
      -- segment starts at p + 2 + len. SOF precedes SOS, so the walk
      -- never enters entropy-coded bytes; the len >= 2 guard stops
      -- malformed zero-length segments from looping.
      jwalk(file_name, p, h) AS (
        SELECT file_name, 3, h FROM b
        WHERE format = 'jpg' AND substr(h, 1, 4) = 'FFD8'
        UNION ALL
        SELECT file_name,
               p + 2 + CAST('0x' || substr(h, 2*(p+2)-1, 4) AS INTEGER), h
        FROM jwalk
        WHERE 2*(p+9) <= length(h)
          AND substr(h, 2*p-1, 2) = 'FF'
          AND substr(h, 2*(p+1)-1, 2) NOT IN ('C0','C2','DA')
          AND CAST('0x' || substr(h, 2*(p+2)-1, 4) AS INTEGER) >= 2),
      jdims AS (
        SELECT file_name,
               CAST('0x' || substr(h, 2*(p+7)-1, 4) AS INTEGER) AS jpg_w,
               CAST('0x' || substr(h, 2*(p+5)-1, 4) AS INTEGER) AS jpg_h
        FROM jwalk
        WHERE 2*(p+9) <= length(h)
          AND substr(h, 2*p-1, 2) = 'FF'
          AND substr(h, 2*(p+1)-1, 2) IN ('C0','C2'))
      SELECT f.file_name, format,
             format IN ('ppm','bmp','wav')
               OR (format = 'png' AND $pngOk)
               OR (format = 'jpg' AND jd.jpg_w IS NOT NULL) AS supported,
             CAST(byte_len AS BIGINT) AS byte_len,
             CAST(CASE WHEN format = 'ppm' THEN regexp_extract(hdr, '$ppmHdr', 1)
                       WHEN format = 'bmp' THEN CAST(${le(19, 2)} AS VARCHAR)
                       WHEN format = 'png' AND $pngOk
                         THEN CAST(CAST('0x' || substr(h, 33, 8) AS INTEGER) AS VARCHAR)
                       WHEN format = 'jpg' THEN CAST(jd.jpg_w AS VARCHAR)
                  END AS INTEGER) AS width,
             CAST(CASE WHEN format = 'ppm' THEN regexp_extract(hdr, '$ppmHdr', 2)
                       WHEN format = 'bmp' THEN CAST(${le(23, 2)} AS VARCHAR)
                       WHEN format = 'png' AND $pngOk
                         THEN CAST(CAST('0x' || substr(h, 41, 8) AS INTEGER) AS VARCHAR)
                       WHEN format = 'jpg' THEN CAST(jd.jpg_h AS VARCHAR)
                  END AS INTEGER) AS height,
             CAST(CASE WHEN format = 'wav' THEN ${le(23, 2)} END AS INTEGER) AS channels,
             CAST(CASE WHEN format = 'wav' THEN ${le(25, 4)} END AS INTEGER) AS sample_rate,
             CAST(CASE WHEN format = 'wav' THEN ${le(41, 4)} // (${le(23, 2)} * 2)
                  END AS BIGINT) AS n_samples,
             CAST(CASE WHEN format = 'wav' THEN
                    (${le(41, 4)} // (${le(23, 2)} * 2)) * 1000 // ${le(25, 4)}
                  END AS BIGINT) AS duration_ms
      FROM f LEFT JOIN jdims jd ON f.file_name = jd.file_name
      ORDER BY f.file_name"""
  }

  /** The independent SQL decoder for clip streams: same-dims frames
    * make every offset closed-form (header length from the decoded
    * dims string, frame pitch = header + raster), so DuckDB can
    * replay the sampled frames' exact channel sums from the hex
    * payload — two unrelated decoders agreeing again, this time on
    * pixel CONTENT, not just metadata.
    */
  private val m5Oracle: String = s"""
    WITH b AS (
      SELECT regexp_extract(filename, '([^/]+)$$', 1) AS file_name,
             size AS byte_len,
             hex(content) AS h
      FROM read_blob('$MediaDir/*.p6v')),
    hdr AS (
      SELECT *,
             list_aggregate(list_transform(
               range(1, CAST(least(byte_len, 20) AS INTEGER) + 1),
               i -> chr(CAST('0x' || substr(h, 2*i-1, 2) AS INTEGER))),
               'string_agg', '') AS pfx
      FROM b),
    geom AS (
      SELECT file_name, h, byte_len,
             CAST(regexp_extract(pfx, 'P6\\n(\\d+) (\\d+)\\n255\\n', 1)
               AS INTEGER) AS w,
             CAST(regexp_extract(pfx, 'P6\\n(\\d+) (\\d+)\\n255\\n', 2)
               AS INTEGER) AS ht
      FROM hdr),
    pitch AS (
      SELECT *,
             length('P6' || chr(10) || w || ' ' || ht || chr(10)
               || '255' || chr(10)) + w * ht * 3 AS frame_pitch,
             length('P6' || chr(10) || w || ' ' || ht || chr(10)
               || '255' || chr(10)) AS hlen
      FROM geom),
    fr AS (
      SELECT file_name, h, w, ht, hlen, frame_pitch,
             unnest(range(0, CAST(byte_len // frame_pitch AS BIGINT), 2))
               AS frame_idx
      FROM pitch)
    SELECT file_name,
           CAST(frame_idx AS INTEGER) AS frame_idx,
           w AS width, ht AS height,
           CAST(list_aggregate(list_transform(range(0, w*ht), p ->
             CAST('0x' || substr(h,
               CAST(2*(frame_idx*frame_pitch + hlen + 3*p) + 1 AS BIGINT), 2)
               AS INTEGER)), 'sum') AS BIGINT) AS sum_r,
           CAST(list_aggregate(list_transform(range(0, w*ht), p ->
             CAST('0x' || substr(h,
               CAST(2*(frame_idx*frame_pitch + hlen + 3*p + 1) + 1 AS BIGINT), 2)
               AS INTEGER)), 'sum') AS BIGINT) AS sum_g,
           CAST(list_aggregate(list_transform(range(0, w*ht), p ->
             CAST('0x' || substr(h,
               CAST(2*(frame_idx*frame_pitch + hlen + 3*p + 2) + 1 AS BIGINT), 2)
               AS INTEGER)), 'sum') AS BIGINT) AS sum_b
    FROM fr
    ORDER BY file_name, frame_idx"""

  /** The independent SQL replay of the m3 resize: a nearest-neighbor
    * ÷2 downsample never synthesizes bytes — output pixel (nx, ny)
    * channel c IS the source byte at hlen + ((2·ny)·w + 2·nx)·3 + c —
    * so DuckDB reproduces the resized raster's exact channel sums
    * (and the re-encoded byte count, closed-form from the new dims)
    * straight from the ORIGINAL file's hex payload, without ever
    * performing the resize. Two unrelated implementations must agree
    * on transform CONTENT; the re-encode's crc32 stays spec-pinned.
    */
  private def m3ChanSum(c: Int): String =
    s"""CAST(list_aggregate(list_transform(range(0, nw*nh), p ->
       CAST('0x' || substr(h,
         2*(hlen + ((p//nw)*2*w + (p%nw)*2)*3 + $c) + 1, 2)
         AS INTEGER)), 'sum') AS BIGINT)"""

  private val m3Oracle: String = s"""
    WITH b AS (
      SELECT regexp_extract(filename, '([^/]+)$$', 1) AS file_name,
             size AS byte_len,
             hex(content) AS h
      FROM read_blob('$MediaDir/*.ppm')),
    hdr AS (
      SELECT *,
             list_aggregate(list_transform(
               range(1, CAST(least(byte_len, 20) AS INTEGER) + 1),
               i -> chr(CAST('0x' || substr(h, 2*i-1, 2) AS INTEGER))),
               'string_agg', '') AS pfx
      FROM b),
    geom AS (
      SELECT file_name, h,
             CAST(regexp_extract(pfx, 'P6\\n(\\d+) (\\d+)\\n255\\n', 1)
               AS INTEGER) AS w,
             CAST(regexp_extract(pfx, 'P6\\n(\\d+) (\\d+)\\n255\\n', 2)
               AS INTEGER) AS ht,
             length('P6' || chr(10)
               || regexp_extract(pfx, 'P6\\n(\\d+) (\\d+)\\n255\\n', 1)
               || ' '
               || regexp_extract(pfx, 'P6\\n(\\d+) (\\d+)\\n255\\n', 2)
               || chr(10) || '255' || chr(10)) AS hlen
      FROM hdr),
    rs AS (
      SELECT file_name, h, w, ht, hlen,
             greatest(1, w // 2) AS nw,
             greatest(1, ht // 2) AS nh
      FROM geom)
    SELECT file_name, w AS width, ht AS height,
           nw AS new_width, nh AS new_height,
           CAST(length('P6' || chr(10) || nw || ' ' || nh || chr(10)
             || '255' || chr(10)) + nw*nh*3 AS INTEGER) AS out_bytes,
           ${m3ChanSum(0)} AS sum_r,
           ${m3ChanSum(1)} AS sum_g,
           ${m3ChanSum(2)} AS sum_b
    FROM rs
    ORDER BY file_name"""

  /** One channel's pixel sum replayed from the hex payload. Valid
    * because the committed PNG fixtures are CANONICAL (single IDAT,
    * single stored deflate block, filter 0 rows — see
    * tools/gen_png_fixture.py): raw scanlines sit at closed-form
    * offsets (sig 8 + IHDR 25 + IDAT len/type 8 + zlib hdr 2 +
    * stored-block hdr 5 = byte 48), each row is a filter byte + 3w
    * pixel bytes. The Scala side still runs the general Inflater
    * path — two unrelated decoders agreeing on pixel CONTENT.
    * Compressed streams and filters 1–4, where no SQL replay exists,
    * are gated in MediaCodecsSpec against Deflater-encoded images.
    */
  private def pngChanSum(c: Int): String =
    s"""CAST(list_aggregate(list_transform(range(0, w*ht), p ->
       CAST('0x' || substr(h, 2*(48 + (p//w)*(1+3*w) + 3*(p%w) + ${1 + c}) + 1, 2)
         AS INTEGER)), 'sum') AS BIGINT)"""

  private val m6Oracle: String = s"""
    WITH b AS (
      SELECT regexp_extract(filename, '([^/]+)$$', 1) AS file_name,
             hex(content) AS h
      FROM read_blob('$MediaDir/*.png')),
    g AS (
      SELECT file_name, h,
             CAST('0x' || substr(h, 33, 8) AS INTEGER) AS w,
             CAST('0x' || substr(h, 41, 8) AS INTEGER) AS ht
      FROM b
      WHERE $pngOk)
    SELECT file_name, w AS width, ht AS height,
           ${pngChanSum(0)} AS sum_r,
           ${pngChanSum(1)} AS sum_g,
           ${pngChanSum(2)} AS sum_b
    FROM g
    ORDER BY file_name"""

  /** The independent SQL replay of m4: PCM samples sit at closed-form
    * offsets (canonical 44-byte header, 16-bit LE interleaved), so
    * each window's mean absolute amplitude is hex byte arithmetic —
    * sample-channel index i lives at bytes 44+2i/45+2i, the signed
    * conversion is the branchless ((v+32768) % 65536) − 32768, and
    * the mean is ONE double division of two exact integers, so the
    * two engines cannot disagree on accumulation order.
    */
  private val m4Oracle: String = s"""
    WITH b AS (
      SELECT regexp_extract(filename, '([^/]+)$$', 1) AS file_name,
             hex(content) AS h
      FROM read_blob('$MediaDir/*.wav')),
    g AS (
      SELECT file_name, h,
             ${le(23, 2)} AS ch,
             ${le(25, 4)} AS rate,
             ${le(41, 4)} // (${le(23, 2)} * 2) AS n_samples
      FROM b),
    w AS (
      SELECT *, rate // 10 AS per_win FROM g WHERE rate // 10 > 0),
    wins AS (
      SELECT file_name, h, ch, per_win, n_samples,
             unnest(range(0, (n_samples + per_win - 1) // per_win))
               AS window_idx
      FROM w),
    stats AS (
      SELECT file_name, window_idx, ch,
             least(n_samples, (window_idx + 1) * per_win)
               - window_idx * per_win AS n_in_win,
             list_aggregate(list_transform(
               range(window_idx * per_win * ch,
                     least(n_samples, (window_idx + 1) * per_win) * ch),
               i -> abs(((CAST('0x' || substr(h, 2*(44 + 2*i) + 3, 2)
                                    || substr(h, 2*(44 + 2*i) + 1, 2)
                          AS INTEGER) + 32768) % 65536) - 32768)),
               'sum') AS s
      FROM wins)
    SELECT file_name,
           CAST(window_idx AS INTEGER) AS window_idx,
           CAST(n_in_win AS BIGINT) AS n_samples,
           CAST(s AS DOUBLE) / (n_in_win * ch) AS mean_abs
    FROM stats
    ORDER BY file_name, window_idx"""

  val queries: Seq[Q] = Seq(
    Q("m2_media_decode", m2MediaDecode, Some(m2Oracle)),
    Q("m3_image_resize", m3ImageResize, Some(m3Oracle)),
    Q("m4_audio_windows", m4AudioWindows, Some(m4Oracle)),
    Q("m5_frame_sample", m5FrameSample, Some(m5Oracle)),
    Q("m6_png_decode", m6PngDecode, Some(m6Oracle)),
    Q("m7_jpeg_decode", m7JpegDecode, Some(m7Oracle)))
}
