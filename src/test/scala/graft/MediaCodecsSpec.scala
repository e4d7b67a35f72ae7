package graft

import org.apache.spark.sql.functions._
import graft.multimodal.MediaCodecs

/** Real-decode multimodal tests over the committed fixtures — exact
  * header facts (known from the generator), raster-transform
  * properties, and the map-only plan shape.
  */
class MediaCodecsSpec extends SparkTestBase {

  test("m2: PPM/BMP/WAV containers decode to exact known metadata; fallback flags") {
    val rows = MediaCodecs.m2MediaDecode(spark, "unused").collect()
      .map(r => r.getString(0) -> r).toMap
    assert(rows.size === 17)

    // JPEG: header-level SOF metadata for all three fixtures —
    // including the mid-scan truncation (intact frame header; only
    // m7's full decode rejects it)
    Seq(("img_16x8.jpg", 16, 8), ("img_9x5.jpg", 9, 5),
      ("img_trunc.jpg", 12, 10)).foreach { case (n, w, h) =>
      val j = rows(n)
      assert(j.getString(1) === "jpg" && j.getBoolean(2), s"$n supported")
      assert(j.getInt(4) === w && j.getInt(5) === h, s"$n dims")
    }

    val png = rows("img_6x4.png")
    assert(png.getString(1) === "png" && png.getBoolean(2))
    assert(png.getInt(4) === 6 && png.getInt(5) === 4)
    // RGBA is a valid PNG but not the supported 8-bit-RGB subtype
    assert(!rows("img_rgba_7x3.png").getBoolean(2))

    // clip streams are NOT single-image PPMs: m2 must flag them
    // unsupported (m5 is their decoder), not half-read frame 0
    Seq("clip_6x4_8f.p6v", "clip_3x2_5f.p6v").foreach { c =>
      assert(!rows(c).getBoolean(2), s"$c must be unsupported in m2")
    }

    val img = rows("img_16x16.ppm")
    assert(img.getString(1) === "ppm" && img.getBoolean(2))
    assert(img.getInt(4) === 16 && img.getInt(5) === 16)

    val wide = rows("img_64x3.ppm")
    assert(wide.getInt(4) === 64 && wide.getInt(5) === 3)

    val bmp = rows("img_10x7.bmp")
    assert(bmp.getString(1) === "bmp" && bmp.getBoolean(2))
    assert(bmp.getInt(4) === 10 && bmp.getInt(5) === 7)

    val bmpPad = rows("img_5x5.bmp") // 15-byte rows → 1 pad byte each
    assert(bmpPad.getBoolean(2))
    assert(bmpPad.getInt(4) === 5 && bmpPad.getInt(5) === 5)

    val mono = rows("tone_mono_8k.wav")
    assert(mono.getBoolean(2) && mono.getInt(6) === 1)
    assert(mono.getInt(7) === 8000 && mono.getLong(8) === 4000L)
    assert(mono.getLong(9) === 500L, "0.5 s of 8 kHz mono")

    val stereo = rows("tone_stereo_4k.wav")
    assert(stereo.getInt(6) === 2 && stereo.getInt(7) === 4000)
    assert(stereo.getLong(8) === 1000L && stereo.getLong(9) === 250L)

    val opaque = rows("opaque.bin")
    assert(!opaque.getBoolean(2), "unknown format must flag unsupported")
    assert(opaque.isNullAt(4) && opaque.isNullAt(6))
  }

  test("m3: nearest-neighbor resize halves dims and keeps corner pixels") {
    val rows = MediaCodecs.m3ImageResize(spark, "unused").collect()
      .map(r => (r.getString(0), r.getInt(1), r.getInt(2), r.getInt(3), r.getInt(4)))
    assert(rows.toSet === Set(
      ("img_16x16.ppm", 16, 16, 8, 8),
      ("img_64x3.ppm", 64, 3, 32, 1),
      ("img_8x5.ppm", 8, 5, 4, 2)))
    // transform-level check, independent of Spark: resized (0,0) pixel
    // must equal source (0,0) pixel under nearest-neighbor
    val bytes = java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(s"${MediaCodecs.MediaDir}/img_16x16.ppm"))
    val raw = graft.multimodal.RawMedia("img_16x16.ppm", bytes.length.toLong, bytes)
    val resized = MediaCodecs.resizePpm(raw, 2).get
    assert(resized.new_width === 8 && resized.out_bytes === "P6\n8 8\n255\n".length + 8 * 8 * 3)
    // determinism: same input → same checksum
    assert(MediaCodecs.resizePpm(raw, 2).get.crc32 === resized.crc32)
    // the judged sum columns ARE the resized raster: recompute them
    // by brute force from the source bytes (nearest-neighbor picks)
    val srcOff = bytes.indexOfSlice("255\n".getBytes("US-ASCII")) + 4
    val picks = for (ny <- 0 until 8; nx <- 0 until 8)
      yield srcOff + ((ny * 2) * 16 + nx * 2) * 3
    assert(resized.sum_r === picks.map(p => (bytes(p) & 0xff).toLong).sum)
    assert(resized.sum_g === picks.map(p => (bytes(p + 1) & 0xff).toLong).sum)
    assert(resized.sum_b === picks.map(p => (bytes(p + 2) & 0xff).toLong).sum)
    // and the judged projection drops the non-replayable checksum
    assert(!MediaCodecs.m3ImageResize(spark, "unused").columns.contains("crc32"))
  }

  test("m4: audio windows cover the stream exactly; amplitudes sane") {
    val rows = MediaCodecs.m4AudioWindows(spark, "unused").collect()
    val byFile = rows.groupBy(_.getString(0))
    // 0.5 s mono at 100 ms windows → 5; 0.25 s stereo → 3 (2 full + remainder)
    assert(byFile("tone_mono_8k.wav").length === 5)
    assert(byFile("tone_stereo_4k.wav").length === 3)
    // windows partition the samples exactly
    assert(byFile("tone_mono_8k.wav").map(_.getLong(2)).sum === 4000L)
    assert(byFile("tone_stereo_4k.wav").map(_.getLong(2)).sum === 1000L)
    // a 440 Hz tone at amplitude 12000: mean |x| ≈ 2/π · 12000 ≈ 7639
    rows.foreach { r =>
      val m = r.getDouble(3)
      assert(m > 1000 && m < 12000, s"implausible mean_abs $m")
    }
  }

  test("corrupt containers degrade to unsupported, never hang or throw") {
    import java.nio.{ByteBuffer, ByteOrder}
    // WAV whose first chunk declares len = -8: a naive walk advances
    // by zero and spins forever
    val spin = {
      val b = ByteBuffer.allocate(64).order(ByteOrder.LITTLE_ENDIAN)
      b.put("RIFF".getBytes); b.putInt(56); b.put("WAVE".getBytes)
      b.put("junk".getBytes); b.putInt(-8)
      b.array()
    }
    assert(MediaCodecs.parseWav(spin).isEmpty)
    // WAV whose chunk runs past the buffer
    val overrun = {
      val b = ByteBuffer.allocate(64).order(ByteOrder.LITTLE_ENDIAN)
      b.put("RIFF".getBytes); b.putInt(56); b.put("WAVE".getBytes)
      b.put("fmt ".getBytes); b.putInt(100000)
      b.array()
    }
    assert(MediaCodecs.parseWav(overrun).isEmpty)
    // PPM whose header claims a raster whose Int byte-count overflows
    val bloat = "P6\n50000 50000\n255\n".getBytes ++ Array.fill(100)(0.toByte)
    assert(MediaCodecs.parsePpm(bloat).isEmpty)
    // truncated PPM: header fine, raster short
    val short = "P6\n4 4\n255\n".getBytes ++ Array.fill(10)(1.toByte)
    assert(MediaCodecs.parsePpm(short).isEmpty)
    // CRLF after maxval: a one-byte advance would silently shift the
    // raster offset and mis-read every pixel — must reject, not guess
    val crlf = "P6\n4 4\n255\r\n".getBytes ++ Array.fill(4 * 4 * 3)(1.toByte)
    assert(MediaCodecs.parsePpm(crlf).isEmpty)
    // ...while each single-whitespace terminator is accepted
    Seq("\n", " ", "\t", "\r").foreach { ws =>
      val good = s"P6\n4 4\n255$ws".getBytes ++ Array.fill(4 * 4 * 3)(1.toByte)
      assert(MediaCodecs.parsePpm(good).contains((4, 4, 11)), s"ws=${ws.head.toInt}")
    }
    // BMP: truncated raster, compressed (BI_RLE8), and 8-bit variants
    // all fall through to unsupported
    val bmpOk = java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(s"${MediaCodecs.MediaDir}/img_10x7.bmp"))
    assert(MediaCodecs.parseBmp(bmpOk).contains((10, 7, 54)))
    assert(MediaCodecs.parseBmp(bmpOk.dropRight(5)).isEmpty, "short raster")
    val bmpRle = bmpOk.clone; bmpRle(30) = 1 // compression = BI_RLE8
    assert(MediaCodecs.parseBmp(bmpRle).isEmpty)
    val bmp8 = bmpOk.clone; bmp8(28) = 8 // bpp = 8 (palette)
    assert(MediaCodecs.parseBmp(bmp8).isEmpty)
    // the row-level decode wraps all of these as supported=false
    val infos = MediaCodecs.decodeInfo(Iterator(
      graft.multimodal.RawMedia("x.wav", spin.length.toLong, spin),
      graft.multimodal.RawMedia("y.ppm", bloat.length.toLong, bloat))).toSeq
    assert(infos.forall(!_.supported))
  }

  test("m5: clip frame-sampling hits every 2nd frame with exact channel sums") {
    val rows = MediaCodecs.m5FrameSample(spark, "unused").collect()
      .map(r => (r.getString(0), r.getInt(1), r.getInt(2), r.getInt(3),
        r.getLong(4), r.getLong(5), r.getLong(6)))
    // 8 frames strided by 2 → 0,2,4,6; 5 frames → 0,2,4
    assert(rows.count(_._1 == "clip_6x4_8f.p6v") === 4)
    assert(rows.count(_._1 == "clip_3x2_5f.p6v") === 3)
    assert(rows.filter(_._1 == "clip_6x4_8f.p6v").map(_._2).toSeq
      === Seq(0, 2, 4, 6))
    // channel sums must equal the generator's closed form
    def expected(w: Int, h: Int, fr: Int): (Long, Long, Long) = {
      var (sr, sg, sb) = (0L, 0L, 0L)
      for (y <- 0 until h; x <- 0 until w) {
        sr += (fr * 29 + x * 7 + y * 3) % 256
        sg += (fr * 31 + x * 5 + y * 11) % 256
        sb += (fr * 37 + x * 13 + y) % 256
      }
      (sr, sg, sb)
    }
    rows.foreach { case (f, fr, w, h, sr, sg, sb) =>
      val dims = if (f.startsWith("clip_6x4")) (6, 4) else (3, 2)
      assert((w, h) === dims, f)
      assert((sr, sg, sb) === expected(w, h, fr), s"$f frame $fr")
    }
  }

  test("corrupt clip streams degrade whole, never half-decode") {
    def frame(w: Int, h: Int, fill: Byte): Array[Byte] =
      s"P6\n$w $h\n255\n".getBytes ++ Array.fill(w * h * 3)(fill)
    // well-formed two-frame stream parses fully
    val ok = frame(4, 3, 1) ++ frame(4, 3, 2)
    val (w, h, offs) = MediaCodecs.parseP6Stream(ok)
    assert((w, h) === (4, 3) && offs.length === 2)
    // dimension drift mid-stream: reject the WHOLE clip
    assert(MediaCodecs.parseP6Stream(frame(4, 3, 1) ++ frame(2, 2, 2))
      ._3.isEmpty)
    // trailing garbage after the last frame: reject
    assert(MediaCodecs.parseP6Stream(ok ++ Array[Byte](9, 9))._3.isEmpty)
    // truncated final frame: reject
    assert(MediaCodecs.parseP6Stream(ok.dropRight(3))._3.isEmpty)
  }

  // -- PNG: test-side encoder so the judged decoder can be exercised
  // against REAL deflate streams and all five filter types, which the
  // stored-block fixtures (kept canonical for the SQL oracle) don't
  // cover. Encoding forward-filters against the true raster; decode
  // must invert it exactly.

  private def pngChunk(typ: String, data: Array[Byte]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(12 + data.length)
    bb.putInt(data.length).put(typ.getBytes("US-ASCII")).put(data)
    val crc = new java.util.zip.CRC32
    crc.update(typ.getBytes("US-ASCII")); crc.update(data)
    bb.putInt(crc.getValue.toInt)
    bb.array()
  }

  private def paethRef(a: Int, b: Int, c: Int): Int = {
    val p = a + b - c
    val (pa, pb, pc) = (math.abs(p - a), math.abs(p - b), math.abs(p - c))
    if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
  }

  private def encodePng(w: Int, h: Int, raster: Array[Byte],
      filterOf: Int => Int, splitIdat: Boolean = false): Array[Byte] = {
    val stride = 3 * w
    val raw = new Array[Byte](h * (1 + stride))
    for (y <- 0 until h) {
      val ft = filterOf(y)
      raw(y * (1 + stride)) = ft.toByte
      for (x <- 0 until stride) {
        val cur = raster(y * stride + x) & 0xff
        val left = if (x >= 3) raster(y * stride + x - 3) & 0xff else 0
        val up = if (y > 0) raster((y - 1) * stride + x) & 0xff else 0
        val ul = if (y > 0 && x >= 3) raster((y - 1) * stride + x - 3) & 0xff else 0
        val enc = ft match {
          case 0 => cur
          case 1 => cur - left
          case 2 => cur - up
          case 3 => cur - (left + up) / 2
          case 4 => cur - paethRef(left, up, ul)
          case _ => cur // deliberately-invalid filter ids pass through
        }
        raw(y * (1 + stride) + 1 + x) = (enc & 0xff).toByte
      }
    }
    val defl = new java.util.zip.Deflater()
    defl.setInput(raw); defl.finish()
    val out = new java.io.ByteArrayOutputStream()
    val tmp = new Array[Byte](256)
    while (!defl.finished()) out.write(tmp, 0, defl.deflate(tmp))
    defl.end()
    val z = out.toByteArray
    val ihdr = java.nio.ByteBuffer.allocate(13)
      .putInt(w).putInt(h).put(8.toByte).put(2.toByte)
      .put(0.toByte).put(0.toByte).put(0.toByte).array()
    val sig = Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)
    val idats =
      if (splitIdat) pngChunk("IDAT", z.take(z.length / 2)) ++
        pngChunk("IDAT", z.drop(z.length / 2))
      else pngChunk("IDAT", z)
    sig ++ pngChunk("IHDR", ihdr) ++ idats ++ pngChunk("IEND", Array.empty)
  }

  test("png decode inverts real deflate + all five filter types exactly") {
    val (w, h) = (12, 9)
    val raster = Array.tabulate(h * w * 3)(i => ((i * 31 + 7) % 256).toByte)
    val filters = Array(0, 1, 2, 3, 4, 2, 4, 1, 3)
    val got = MediaCodecs.decodePng(encodePng(w, h, raster, filters(_)))
    assert(got.isDefined, "compressed PNG failed to decode")
    assert(got.get._1 === w && got.get._2 === h)
    assert(java.util.Arrays.equals(got.get._3, raster),
      "un-filter did not invert the forward filter")
    // the zlib stream split across two IDAT chunks is the same stream
    val split = MediaCodecs.decodePng(
      encodePng(w, h, raster, filters(_), splitIdat = true))
    assert(java.util.Arrays.equals(split.get._3, raster))
  }

  test("corrupt PNGs degrade row-wise, never throw") {
    val (w, h) = (6, 5)
    val raster = Array.tabulate(h * w * 3)(i => ((i * 13) % 256).toByte)
    val ok = encodePng(w, h, raster, _ => 4)
    assert(MediaCodecs.decodePng(ok).isDefined)
    // truncation mid-IDAT: chunk length now runs past the buffer
    assert(MediaCodecs.decodePng(ok.dropRight(20)).isEmpty)
    // zeroed zlib payload: invalid CMF byte → DataFormatException path
    val zeroed = ok.clone
    (41 until zeroed.length - 16).foreach(i => zeroed(i) = 0.toByte)
    assert(MediaCodecs.decodePng(zeroed).isEmpty)
    // unknown filter type on a row (5): must reject, not misread
    assert(MediaCodecs.decodePng(encodePng(w, h, raster, _ => 5)).isEmpty)
    // unsupported subtype: RGBA color type
    val rgba = ok.clone; rgba(25) = 6
    assert(MediaCodecs.parsePngHeader(rgba).isEmpty)
    // and the row-level wrapper flags all of these unsupported
    assert(MediaCodecs.pngSums(graft.multimodal.RawMedia(
      "x.png", zeroed.length.toLong, zeroed)).isEmpty)
  }

  test("m6: stored-block fixtures decode with exact generator pixel sums") {
    val rows = MediaCodecs.m6PngDecode(spark, "unused").collect()
      .map(r => (r.getString(0), r.getInt(1), r.getInt(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))
    // 3 RGB fixtures decode; the RGBA plant is excluded row-wise
    assert(rows.map(_._1).toSeq ===
      Seq("img_16x8.png", "img_6x4.png", "img_9x5.png"))
    def expected(w: Int, h: Int): (Long, Long, Long) = {
      var (sr, sg, sb) = (0L, 0L, 0L)
      for (y <- 0 until h; x <- 0 until w) {
        sr += (x * 11 + y * 17) % 256
        sg += (x * 5 + 3) % 256
        sb += (y * 7 + 1) % 256
      }
      (sr, sg, sb)
    }
    rows.foreach { case (f, w, h, sr, sg, sb) =>
      assert((sr, sg, sb) === expected(w, h), s"$f pixel sums")
    }
    assert(rows.map(r => (r._1, r._2, r._3)).toSet ===
      Set(("img_6x4.png", 6, 4), ("img_9x5.png", 9, 5),
        ("img_16x8.png", 16, 8)))
  }

  test("m7: JPEG roundtrip recovers a known raster within codec error bounds") {
    import graft.multimodal.{GenJpegFixtures, RawMedia}
    // fresh encode → full entropy decode: dims exact, per-channel
    // MEAN within a small lossy-codec tolerance (quality 0.95, the
    // fixture setting). The bound is loose enough for any conformant
    // IDCT, tight enough that a gray-fill or channel swap fails.
    val (w, h) = (16, 8)
    def px(x: Int, y: Int) = (x * 16, y * 32, (x + y) * 8 % 256)
    val bytes = GenJpegFixtures.encode(GenJpegFixtures.raster(w, h)(px), 0.95f)
    val got = MediaCodecs.jpegSums(RawMedia("t.jpg", bytes.length.toLong, bytes))
    assert(got.isDefined, "fresh JPEG failed to decode")
    val j = got.get
    assert((j.width, j.height, j.n_bands) === (w, h, 3))
    var (er, eg, eb) = (0L, 0L, 0L)
    for (y <- 0 until h; x <- 0 until w) {
      val (r, g, b) = px(x, y); er += r; eg += g; eb += b
    }
    val n = (w * h).toDouble
    assert(math.abs(j.sum_r - er) / n < 3.0, s"red mean off: ${j.sum_r} vs $er")
    assert(math.abs(j.sum_g - eg) / n < 3.0, s"green mean off: ${j.sum_g} vs $eg")
    assert(math.abs(j.sum_b - eb) / n < 3.0, s"blue mean off: ${j.sum_b} vs $eb")
  }

  test("m7: header walk and entropy decode agree; truncation drops only the decode") {
    import graft.multimodal.RawMedia
    val dir = new java.io.File(graft.sources.Fixtures.path("fixtures/media"))
    val jpgs = dir.listFiles().filter(_.getName.endsWith(".jpg"))
      .map(f => f.getName ->
        java.nio.file.Files.readAllBytes(f.toPath)).toMap
    assert(jpgs.keySet === Set("img_16x8.jpg", "img_9x5.jpg", "img_trunc.jpg"))
    // SOF header metadata exists for ALL three (m2's surface) —
    // including the mid-scan truncation, whose frame header is intact
    assert(jpgs.map { case (n, b) =>
      n -> MediaCodecs.parseJpegSof(b).map(t => (t._1, t._2)) } ===
      Map("img_16x8.jpg" -> Some((16, 8)), "img_9x5.jpg" -> Some((9, 5)),
        "img_trunc.jpg" -> Some((12, 10))))
    // full decode (m7's surface): intact files match the header dims,
    // the truncated scan is rejected by the EOI integrity gate —
    // ImageIO would otherwise gray-fill the missing MCUs and the
    // judged artifact would be decoder-defined fill, not content
    def dec(n: String) =
      MediaCodecs.jpegSums(RawMedia(n, jpgs(n).length.toLong, jpgs(n)))
    assert(dec("img_16x8.jpg").map(j => (j.width, j.height)) === Some((16, 8)))
    assert(dec("img_9x5.jpg").map(j => (j.width, j.height)) === Some((9, 5)))
    assert(dec("img_trunc.jpg").isEmpty, "truncated scan must drop row-wise")
    // and not because the gate rejects everything: intact files end
    // with EOI, the truncated one does not
    val t = jpgs("img_trunc.jpg")
    assert((t(t.length - 2) & 0xff, t(t.length - 1) & 0xff) !== (0xff, 0xd9))
  }

  test("media pipeline is map-only: no shuffle in the decode stage") {
    import spark.implicits._
    val decoded = MediaCodecs.readMedia(spark)
      .mapPartitions(MediaCodecs.decodeInfo).toDF()
    val plan = decoded.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"decode plan shuffles:\n$plan")
  }
}
