package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite
import graft.sources.{MediaSynth, PagesSynth}

/** Multimodal plumbing unit coverage (previously only exercised through
  * q33's rows-only driver check): stub determinism, null/empty safety,
  * histogram/entropy invariants, and the no-shuffle narrow-plan property.
  */
class MultimodalSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("decodeStub: deterministic, histogram sums to length, entropy bounded") {
    val rnd = new scala.util.Random(3)
    (0 until 200).foreach { i =>
      val b = new Array[Byte](rnd.nextInt(5000))
      rnd.nextBytes(b)
      val f1 = Multimodal.decodeStub(s"u$i", b)
      val f2 = Multimodal.decodeStub(s"u$i", b.clone())
      assert(f1.copy(histogram = null) === f2.copy(histogram = null) &&
        f1.histogram.sameElements(f2.histogram),
        "stub must be a pure function of the bytes")
      assert(f1.histogram.sum === b.length)
      // 16-bin entropy is in [0, ln 16] nats
      assert(f1.entropy_x1000 >= 0 && f1.entropy_x1000 <= math.round(math.log(16) * 1000))
      assert(f1.byte_len === b.length)
      assert(f1.width >= 1 && f1.height >= 1)
    }
    val empty = Multimodal.decodeStub("e", Array.emptyByteArray)
    assert(empty.kind === "empty" && empty.entropy_x1000 === 0L)
    assert(Multimodal.decodeStub("m", "<html>".getBytes).kind === "markup")
  }

  test("features: null-safe, and the plan is narrow (blob never shuffled)") {
    val s = spark
    import s.implicits._
    val df = Seq(("u1", "<p>x</p>".getBytes("UTF-8")), ("u2", null: Array[Byte]))
      .toDF("url", "html")
    val feats = Multimodal.features(df)
    val out = feats.collect().map(f => f.url -> f).toMap
    assert(out("u2").kind === "empty")
    assert(out("u1").kind === "markup")
    // no Exchange anywhere in the feature plan: single narrow pass
    val plan = feats.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan.take(800))
  }

  test("imageHeader: real dims for spec-valid PNG/JPEG/GIF; independent ImageIO cross-check") {
    import graft.sources.MediaSynth
    val cases = Seq(
      ("png", MediaSynth.pngBytes(640, 480), 640, 480),
      ("jpeg", MediaSynth.jpegBytes(1024, 7), 1024, 7),
      ("gif", MediaSynth.gifBytes(3, 65535), 3, 65535),
      ("png", MediaSynth.pngBytes(1, 1), 1, 1))
    cases.foreach { case (kind, bytes, w, h) =>
      assert(Multimodal.imageHeader(bytes) === Some((kind, w, h)), kind)
      val f = Multimodal.decodeStub("u", bytes)
      assert(f.kind === kind && f.width === w && f.height === h)
    }
    // independent decoder: the JDK's ImageIO readers parse the same headers
    // without needing pixel data — dims must agree exactly
    cases.filter(_._4 <= 480).foreach { case (kind, bytes, w, h) =>
      val iis = javax.imageio.ImageIO.createImageInputStream(
        new java.io.ByteArrayInputStream(bytes))
      val readers = javax.imageio.ImageIO.getImageReaders(iis)
      assert(readers.hasNext, s"JDK has no reader for $kind fixture — fixture invalid?")
      val r = readers.next()
      r.setInput(iis)
      assert((r.getWidth(0), r.getHeight(0)) === ((w, h)), s"ImageIO disagrees on $kind")
      r.dispose()
    }
  }

  test("imageHeader: truncated and garbage image bytes never throw") {
    import graft.sources.MediaSynth
    val blobs = Seq(MediaSynth.pngBytes(9, 9), MediaSynth.jpegBytes(9, 9),
      MediaSynth.gifBytes(9, 9))
    blobs.foreach { b =>
      (0 to b.length).foreach { k =>
        Multimodal.imageHeader(java.util.Arrays.copyOf(b, k)) // no throw
        Multimodal.decodeStub("u", java.util.Arrays.copyOf(b, k))
      }
    }
    // JPEG with garbage after SOI: kind detected, dims unknown → (0,0)
    val damaged = Array(0xFF, 0xD8, 0x00, 0x11, 0x22, 0x33).map(_.toByte)
    assert(Multimodal.imageHeader(damaged) === Some(("jpeg", 0, 0)))
    val rnd = new scala.util.Random(11)
    (0 until 200).foreach { _ =>
      val b = new Array[Byte](rnd.nextInt(64))
      rnd.nextBytes(b)
      Multimodal.imageHeader(b) // no throw on anything
    }
  }

  test("wavHeader: real rate/channels for spec-valid WAV; independent AudioSystem cross-check") {
    import graft.sources.MediaSynth
    val cases = Seq((8000, 1), (44100, 2), (48000, 1), (192000, 2))
    cases.foreach { case (rate, ch) =>
      val bytes = MediaSynth.wavBytes(rate, ch)
      assert(Multimodal.wavHeader(bytes) === Some((rate, ch)))
      val f = Multimodal.decodeStub("u", bytes)
      assert(f.kind === "wav" && f.sample_rate === rate && f.channels === ch)
      // independent decoder: the JDK's sampled-audio stack parses the same
      // fmt chunk — values must agree exactly
      val fmt = javax.sound.sampled.AudioSystem.getAudioFileFormat(
        new java.io.ByteArrayInputStream(bytes)).getFormat
      assert(fmt.getSampleRate.toInt === rate && fmt.getChannels === ch,
        "AudioSystem disagrees")
    }
    // images must not report audio fields and vice versa
    assert(Multimodal.decodeStub("u", MediaSynth.pngBytes(4, 4)).sample_rate === 0)
    assert(Multimodal.decodeStub("u", MediaSynth.wavBytes(8000, 1)).width === 0)
  }

  test("wavHeader: truncated and garbage RIFF bytes never throw") {
    import graft.sources.MediaSynth
    val b = MediaSynth.wavBytes(44100, 2)
    (0 to b.length).foreach { k =>
      Multimodal.wavHeader(java.util.Arrays.copyOf(b, k)) // no throw
      Multimodal.decodeStub("u", java.util.Arrays.copyOf(b, k))
    }
    // RIFF/WAVE with a lying chunk size must terminate, not loop/throw
    val lying = b.clone()
    lying(16) = 0xFF.toByte; lying(17) = 0xFF.toByte
    lying(18) = 0xFF.toByte; lying(19) = 0x7F.toByte
    Multimodal.wavHeader(lying)
    val negative = b.clone()
    negative(19) = 0xFF.toByte // negative LE32 size
    assert(Multimodal.wavHeader(negative) === Some((0, 0)))
    // a POSITIVE near-Int.MaxValue size on a pre-fmt chunk must walk off
    // the end (Long cursor), not wrap the index negative and throw
    val bigChunk = "RIFF".getBytes ++ Array[Byte](0, 0, 0, 0) ++
      "WAVE".getBytes ++ "JUNK".getBytes ++
      Array(0xF0, 0xFF, 0xFF, 0x7F).map(_.toByte) ++ new Array[Byte](16)
    assert(Multimodal.wavHeader(bigChunk) === Some((0, 0)))
  }

  test("rasterPixels: REAL BMP pixel decode, cross-checked against JDK ImageIO") {
    import graft.sources.MediaSynth
    for ((w, h) <- Seq((1, 1), (2, 2), (5, 3), (16, 9), (33, 17), (64, 64))) {
      val bytes = MediaSynth.bmpBytes(w, h)
      val (expPix, expMean, expPeak) = MediaSynth.rasterTruth(w, h)
      val got = Multimodal.rasterPixels(bytes)
      assert(got === Some(Multimodal.RasterStats("bmp", w, h, expPix, expMean, expPeak)),
        s"bmp $w x $h")
      // independent decoder: the JDK ships a BMP reader — recompute the
      // same integer luma stats from ITS pixels and require equality
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      assert(img != null, "JDK could not read the BMP fixture — fixture invalid?")
      var sum = 0L; var peak = 0
      for (y <- 0 until h; x <- 0 until w) {
        val rgb = img.getRGB(x, y)
        val l = (2126 * ((rgb >> 16) & 0xff) + 7152 * ((rgb >> 8) & 0xff) +
          722 * (rgb & 0xff)) / 10000
        sum += l; if (l > peak) peak = l
      }
      val pix = w.toLong * h
      assert((pix, (sum * 1000 + pix / 2) / pix, peak) === ((expPix, expMean, expPeak)),
        s"ImageIO disagrees on $w x $h")
      val f = Multimodal.decodeStub("u", bytes)
      assert(f.kind === "bmp" && f.decoded && f.frames === expPix &&
        f.mean_x1000 === expMean && f.peak === expPeak)
    }
  }

  test("rasterPixels: REAL PPM pixel decode incl. header comments") {
    import graft.sources.MediaSynth
    for ((w, h) <- Seq((1, 1), (3, 7), (40, 25))) {
      val bytes = MediaSynth.ppmBytes(w, h)
      val (expPix, expMean, expPeak) = MediaSynth.rasterTruth(w, h)
      assert(Multimodal.rasterPixels(bytes) ===
        Some(Multimodal.RasterStats("ppm", w, h, expPix, expMean, expPeak)))
      val f = Multimodal.decodeStub("u", bytes)
      assert(f.kind === "ppm" && f.decoded && f.width === w && f.height === h)
    }
    // PPM whose first pixel byte doubles as the header terminator trap:
    // maxval must be followed by EXACTLY one whitespace byte
    assert(Multimodal.rasterPixels("P6\n2 2\n255".getBytes).isEmpty)
    // 16-bit PPM (maxval > 255) is out of scope → header-only stub path
    val deep = "P6\n1 1\n65535\n      ".getBytes("ISO-8859-1")
    assert(Multimodal.rasterPixels(deep).isEmpty)
  }

  test("wavPcmStats: REAL sample decode, cross-checked against JDK AudioSystem") {
    import graft.sources.MediaSynth
    for ((rate, ch, frames) <- Seq((8000, 1, 50), (44100, 2, 64), (16000, 2, 1), (22050, 1, 0))) {
      val (bytes, (expFr, expMean, expPeak)) = MediaSynth.wavToneBytes(rate, ch, frames)
      assert(Multimodal.wavPcmStats(bytes) === Some((expFr, expMean, expPeak)),
        s"wav $rate/$ch/$frames")
      val f = Multimodal.decodeStub("u", bytes)
      assert(f.kind === "wav" && f.decoded && f.sample_rate === rate &&
        f.channels === ch && f.frames === expFr &&
        f.mean_x1000 === expMean && f.peak === expPeak)
      if (frames > 0) {
        // independent decoder: JDK sampled-audio stream yields the same
        // s16le samples — recompute mean/peak from ITS bytes
        val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
          new java.io.ByteArrayInputStream(bytes))
        val raw = ais.readAllBytes()
        assert(raw.length === frames * ch * 2)
        var sumAbs = 0L; var peak = 0
        var k = 0
        while (k + 1 < raw.length) {
          val v = ((raw(k) & 0xff) | ((raw(k + 1) & 0xff) << 8)).toShort.toInt
          val a = math.abs(v); sumAbs += a; if (a > peak) peak = a
          k += 2
        }
        val samples = frames.toLong * ch
        val scale = 32768L * samples
        assert(((sumAbs * 1000 + scale / 2) / scale, peak) === ((expMean, expPeak)),
          "AudioSystem disagrees")
      }
    }
    // the silent legacy fixture decodes to zeros, not a stub
    val silent = MediaSynth.wavBytes(8000, 1)
    assert(Multimodal.wavPcmStats(silent) === Some((4L, 0L, 0)))
    assert(Multimodal.decodeStub("u", silent).decoded)
  }

  test("rasterPixels/wavPcmStats: truncated and garbage bytes never throw") {
    import graft.sources.MediaSynth
    val blobs = Seq(MediaSynth.bmpBytes(7, 5), MediaSynth.ppmBytes(7, 5),
      MediaSynth.wavToneBytes(8000, 2, 9)._1)
    blobs.foreach { b =>
      (0 to b.length).foreach { k =>
        val cut = java.util.Arrays.copyOf(b, k)
        Multimodal.rasterPixels(cut) // no throw
        Multimodal.wavPcmStats(cut)  // no throw
        val f = Multimodal.decodeStub("u", cut)
        // a truncated payload must NEVER claim a content decode
        if (k < b.length) assert(!f.decoded, s"truncated at $k claimed decoded")
      }
    }
    // lying BMP dims (huge w/h) must not allocate or overflow
    val lying = MediaSynth.bmpBytes(4, 4)
    lying(18) = 0xFF.toByte; lying(19) = 0xFF.toByte
    lying(20) = 0xFF.toByte; lying(21) = 0x7F.toByte
    assert(Multimodal.rasterPixels(lying).isEmpty)
    val rnd = new scala.util.Random(23)
    (0 until 300).foreach { _ =>
      val b = new Array[Byte](rnd.nextInt(80))
      rnd.nextBytes(b)
      Multimodal.rasterPixels(b)
      Multimodal.wavPcmStats(b)
    }
  }

  test("pngPixels: REAL IDAT decode, all five filters, four color types, ImageIO cross-check") {
    import graft.sources.MediaSynth
    // heights ≥ 5 so the y%5 filter rotation covers None/Sub/Up/Average/
    // Paeth; widths chosen to hit bpp-boundary edge cases (x < bpp left
    // neighbors) and a multi-KB raster that spans both IDAT chunks
    for {
      (w, h) <- Seq((1, 6), (2, 5), (16, 9), (33, 17), (64, 64), (127, 40))
      ct <- Seq(0, 2, 4, 6)
    } {
      val bytes = MediaSynth.pngPixelBytes(w, h, ct)
      val (expPix, expMean, expPeak) =
        if (ct == 0 || ct == 4) MediaSynth.grayTruth(w, h)
        else MediaSynth.rasterTruth(w, h)
      val got = Multimodal.pngPixels(bytes)
      assert(got === Some(Multimodal.RasterStats("png", w, h, expPix, expMean, expPeak)),
        s"png $w x $h ct=$ct")
      // independent decoder: the JDK's PNG reader — recompute the same
      // integer luma stats from ITS pixels and require exact equality.
      // Gray PNGs land in a TYPE_BYTE_GRAY image whose getRGB applies a
      // linear→sRGB gamma conversion, so for ct 0/4 read the RAW raster
      // samples (the stored gray bytes) instead
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      assert(img != null, s"JDK could not read the PNG fixture ct=$ct — fixture invalid?")
      var sum = 0L; var peak = 0
      for (y <- 0 until h; x <- 0 until w) {
        val l =
          if (ct == 0 || ct == 4) img.getRaster.getSample(x, y, 0)
          else {
            val rgb = img.getRGB(x, y)
            (2126 * ((rgb >> 16) & 0xff) + 7152 * ((rgb >> 8) & 0xff) +
              722 * (rgb & 0xff)) / 10000
          }
        sum += l; if (l > peak) peak = l
      }
      val pix = w.toLong * h
      assert((pix, (sum * 1000 + pix / 2) / pix, peak) === ((expPix, expMean, expPeak)),
        s"ImageIO disagrees on png $w x $h ct=$ct")
      val f = Multimodal.decodeStub("u", bytes)
      assert(f.kind === "png" && f.decoded && f.width === w && f.height === h &&
        f.frames === expPix && f.mean_x1000 === expMean && f.peak === expPeak)
    }
    // unsupported variants stay header-only (decoded=false, dims real):
    // the legacy IDAT-less fixture, and a 16-bit-depth header
    val hdrOnly = Multimodal.decodeStub("u", MediaSynth.pngBytes(9, 9))
    assert(hdrOnly.kind === "png" && !hdrOnly.decoded && hdrOnly.width === 9)
    val deep = MediaSynth.pngPixelBytes(4, 6, 2)
    deep(24) = 16 // bit depth field inside IHDR (CRC now wrong, also fine)
    assert(Multimodal.pngPixels(deep).isEmpty)
    // zip-bomb guard: a header promising 2^21 x 2^21 pixels is refused
    // before any inflate work
    val bomb = MediaSynth.pngPixelBytes(4, 6, 2)
    bomb(16) = 0; bomb(17) = 0x20; bomb(18) = 0; bomb(19) = 0
    bomb(20) = 0; bomb(21) = 0x20; bomb(22) = 0; bomb(23) = 0
    assert(Multimodal.pngPixels(bomb).isEmpty)
  }

  test("gifPixels: REAL LZW decode incl. code-width growth and dict reset, ImageIO cross-check") {
    import graft.sources.MediaSynth
    // 300x200 = 60000 pixels forces the dictionary past every 9→12-bit
    // width transition and through at least one full-dict clear/reset;
    // the small cases pin the early-stream and KwKwK behavior
    for ((w, h) <- Seq((1, 1), (3, 2), (16, 9), (40, 25), (300, 200))) {
      val bytes = MediaSynth.gifPixelBytes(w, h)
      val (expPix, expMean, expPeak) = MediaSynth.gifTruth(w, h)
      val got = Multimodal.gifPixels(bytes)
      assert(got === Some(Multimodal.RasterStats("gif", w, h, expPix, expMean, expPeak)),
        s"gif $w x $h")
      // independent decoder: the JDK's GIF reader decodes the same LZW
      // stream — recompute the luma stats from ITS pixels
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      assert(img != null, "JDK could not read the GIF fixture — fixture invalid?")
      var sum = 0L; var peak = 0
      for (y <- 0 until h; x <- 0 until w) {
        val rgb = img.getRGB(x, y)
        val l = (2126 * ((rgb >> 16) & 0xff) + 7152 * ((rgb >> 8) & 0xff) +
          722 * (rgb & 0xff)) / 10000
        sum += l; if (l > peak) peak = l
      }
      val pix = w.toLong * h
      assert((pix, (sum * 1000 + pix / 2) / pix, peak) === ((expPix, expMean, expPeak)),
        s"ImageIO disagrees on gif $w x $h")
      val f = Multimodal.decodeStub("u", bytes)
      assert(f.kind === "gif" && f.decoded && f.frames === expPix &&
        f.mean_x1000 === expMean && f.peak === expPeak)
    }
    // the legacy palette-less fixture stays header-only
    val hdrOnly = Multimodal.decodeStub("u", MediaSynth.gifBytes(9, 9))
    assert(hdrOnly.kind === "gif" && !hdrOnly.decoded && hdrOnly.width === 9)
  }

  test("mp4Header: real dims + duration from tkhd/mvhd box walk") {
    import graft.sources.MediaSynth
    for ((w, h, durMs) <- Seq((640, 360, 1000L), (1920, 1080, 123456L), (16, 9, 33L))) {
      val bytes = MediaSynth.mp4Bytes(w, h, durMs)
      assert(Multimodal.mp4Header(bytes) === Some((w, h, durMs)), s"mp4 $w x $h")
      val f = Multimodal.decodeStub("u", bytes)
      assert(f.kind === "mp4" && f.width === w && f.height === h &&
        f.frames === durMs && !f.decoded,
        "mp4 is a header-only kind: dims + duration real, decoded must stay false")
    }
    // non-MP4 bytes: no ftyp at offset 4
    assert(Multimodal.mp4Header("RIFFxxxxWAVE".getBytes).isEmpty)
    assert(Multimodal.mp4Header(Array.emptyByteArray).isEmpty)
  }

  test("imageHeader: WEBP dims from VP8, VP8L and VP8X chunks; truncation never throws") {
    import graft.sources.MediaSynth
    for ((w, h) <- Seq((1, 1), (16, 9), (640, 360), (16383, 16383))) {
      assert(Multimodal.imageHeader(MediaSynth.webpBytes(w, h))
        === Some(("webp", w, h)), s"VP8 $w x $h")
      assert(Multimodal.imageHeader(MediaSynth.webpLBytes(w, h))
        === Some(("webp", w, h)), s"VP8L $w x $h")
      val f = Multimodal.decodeStub("u", MediaSynth.webpLBytes(w, h))
      assert(f.kind === "webp" && f.width === w && f.height === h && !f.decoded,
        "webp is a header-only kind: dims real, decoded must stay false")
    }
    // VP8X extended container: canvas dims are 24-bit LE minus one
    val vp8x = "RIFF".getBytes ++ Array[Byte](30, 0, 0, 0) ++
      "WEBPVP8X".getBytes ++ Array[Byte](10, 0, 0, 0) ++
      Array[Byte](2, 0, 0, 0) ++ // flags + reserved
      Array[Byte](0x1F, 2, 0) ++ // width-1 = 543
      Array[Byte](0x0F, 1, 0)    // height-1 = 271
    assert(Multimodal.imageHeader(vp8x) === Some(("webp", 544, 272)))
    // a WAVE RIFF must not be claimed as webp
    assert(Multimodal.imageHeader(MediaSynth.wavBytes(8000, 1)).isEmpty)
    // truncation: every prefix parses without a throw; unknown-chunk
    // RIFF/WEBP stays kind=webp with zero dims (never misparsed)
    val full = MediaSynth.webpBytes(320, 240)
    (0 to full.length).foreach { k =>
      Multimodal.imageHeader(java.util.Arrays.copyOf(full, k))
      Multimodal.decodeStub("u", java.util.Arrays.copyOf(full, k))
    }
    assert(Multimodal.imageHeader(
      "RIFF0000WEBPJUNKxxxxxxxxxxxxxxxxxxxx".getBytes) === Some(("webp", 0, 0)))
  }

  test("pngPixels/gifPixels/mp4Header: truncated and garbage bytes never throw") {
    import graft.sources.MediaSynth
    val blobs = Seq(MediaSynth.pngPixelBytes(16, 9, 2),
      MediaSynth.pngPixelBytes(7, 6, 0),
      MediaSynth.gifPixelBytes(16, 9),
      MediaSynth.mp4Bytes(640, 360, 999L))
    blobs.foreach { b =>
      (0 to b.length).foreach { k =>
        val cut = java.util.Arrays.copyOf(b, k)
        Multimodal.pngPixels(cut) // no throw
        Multimodal.gifPixels(cut)
        Multimodal.mp4Header(cut)
        val f = Multimodal.decodeStub("u", cut)
        // cuts in the last ~24 bytes may only remove pure trailer data
        // (IEND, zlib adler32, GIF terminator) and legitimately still
        // decode; anything shorter is inside the pixel stream and MUST
        // refuse the content decode
        if (k < b.length - 24) assert(!f.decoded, s"truncated at $k claimed decoded")
      }
    }
    // bit-flip fuzz over the compressed payloads: damage must yield
    // None/fallback, never a throw
    val rnd = new scala.util.Random(31)
    (0 until 300).foreach { _ =>
      val src = blobs(rnd.nextInt(blobs.length))
      val b = src.clone()
      (0 until 1 + rnd.nextInt(4)).foreach { _ =>
        b(rnd.nextInt(b.length)) = rnd.nextInt(256).toByte
      }
      Multimodal.pngPixels(b)
      Multimodal.gifPixels(b)
      Multimodal.mp4Header(b)
      Multimodal.decodeStub("u", b)
    }
  }

  test("JpegDecoder: baseline gray decode is pixel-exact (±1) vs JDK ImageIO") {
    import graft.sources.MediaSynth
    // single-component streams have no chroma upsampling, so the only
    // legal divergence between two conforming decoders is IDCT rounding
    // (T.81 Annex K) — assert ≤1 per pixel against the JDK's decoder on
    // the IDENTICAL bytes, plus dims and the luma-stats contract
    for ((w, h) <- Seq((1, 1), (8, 8), (16, 9), (43, 27), (64, 64), (81, 57), (200, 120))) {
      val bytes = MediaSynth.jpegPixelBytes(w, h, gray = true)
      val Some((dw, dh, px)) = JpegDecoder.decodeRgb(bytes)
      assert(dw === w && dh === h)
      val ref = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      assert(ref != null, "JDK could not read the JPEG fixture — fixture invalid?")
      var maxD = 0
      for (y <- 0 until h; x <- 0 until w) {
        // getRGB gamma-converts TYPE_BYTE_GRAY — compare raw raster samples
        val d = math.abs((px(y * w + x) & 0xff) - ref.getRaster.getSample(x, y, 0))
        if (d > maxD) maxD = d
      }
      assert(maxD <= 1, s"gray $w x $h: max pixel diff $maxD vs ImageIO")
      // stats path agrees with the raster path
      val st = JpegDecoder.lumaStats(bytes).get
      assert(st.width === w && st.height === h && st.pixels === w.toLong * h)
    }
  }

  test("JpegDecoder: color 4:2:0 decode within chroma-interpolation drift of ImageIO") {
    import graft.sources.MediaSynth
    // three-component streams diverge where the JDK's fancy (triangular)
    // chroma upsampling differs from our nearest-neighbor replication —
    // bounded, largest at tiny-image borders; measured ≤17 max / ≤8.2
    // mean on these fixtures, pinned with margin
    for ((w, h) <- Seq((16, 9), (31, 7), (43, 27), (64, 64), (81, 57), (200, 120))) {
      val bytes = MediaSynth.jpegPixelBytes(w, h, gray = false)
      val Some((dw, dh, px)) = JpegDecoder.decodeRgb(bytes)
      assert(dw === w && dh === h)
      val ref = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      var maxD = 0
      var sumD = 0L
      for (y <- 0 until h; x <- 0 until w) {
        val a = px(y * w + x)
        val b = ref.getRGB(x, y)
        for (sh <- Seq(16, 8, 0)) {
          val d = math.abs(((a >> sh) & 0xff) - ((b >> sh) & 0xff))
          if (d > maxD) maxD = d
          sumD += d
        }
      }
      val meanD = sumD.toDouble / (w.toLong * h * 3)
      assert(maxD <= 24, s"color $w x $h: max pixel diff $maxD vs ImageIO")
      assert(meanD <= 12.0, s"color $w x $h: mean pixel diff $meanD vs ImageIO")
      // content stats stay within the lossy bound of the PRE-ENCODING
      // truth (the q33 contract): frames exact, mean/peak bounded
      val st = JpegDecoder.lumaStats(bytes).get
      val (pix, tMean, tPeak) = MediaSynth.jpegTruth(w, h)
      assert(st.pixels === pix)
      assert(math.abs(st.meanLumaX1000 - tMean) <= 1500,
        s"color $w x $h mean drift ${st.meanLumaX1000 - tMean}")
      assert(math.abs(st.peakLuma - tPeak) <= 8,
        s"color $w x $h peak drift ${st.peakLuma - tPeak}")
      // decodeStub surfaces the decode (kind jpeg, decoded=true)
      val f = Multimodal.decodeStub("u", bytes)
      assert(f.kind === "jpeg" && f.decoded && f.width === w && f.height === h)
    }
  }

  test("JpegDecoder: DRI/RSTn restart markers reset the DC predictor") {
    // hand-built baseline stream, 16x16 gray = 4 MCUs, restart interval 1:
    // trivial canonical Huffman tables (DC: len-1 '0'→cat 0, len-2 '10'→
    // cat 1; AC: len-1 '0'→EOB), q[0]=16, every MCU encodes DC diff +1
    // then EOB → 4 bits '1010' padded to 0xAF per segment. With correct
    // per-restart predictor resets every block decodes DC=16 → all pixels
    // 128 + 16/8 = 130; WITHOUT resets they would ramp 130/132/134/136.
    def b(xs: Int*): Array[Byte] = xs.map(_.toByte).toArray
    val stream =
      b(0xFF, 0xD8) ++                                    // SOI
      b(0xFF, 0xDB, 0, 67, 0) ++ Array.fill(64)(16.toByte) ++ // DQT tq0, all 16
      b(0xFF, 0xC0, 0, 11, 8, 0, 16, 0, 16, 1, 1, 0x11, 0) ++ // SOF0 16x16 1comp
      (b(0xFF, 0xC4, 0, 21, 0x00) ++                      // DHT DC0
        b(1, 1, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0) ++ b(0, 1)) ++
      (b(0xFF, 0xC4, 0, 20, 0x10) ++                      // DHT AC0
        b(1, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0) ++ b(0x00)) ++
      b(0xFF, 0xDD, 0, 4, 0, 1) ++                        // DRI interval=1
      b(0xFF, 0xDA, 0, 8, 1, 1, 0x00, 0, 63, 0) ++        // SOS
      b(0xAF, 0xFF, 0xD0, 0xAF, 0xFF, 0xD1, 0xAF, 0xFF, 0xD2, 0xAF) ++
      b(0xFF, 0xD9)                                       // EOI
    val Some((w, h, px)) = JpegDecoder.decodeRgb(stream)
    assert(w === 16 && h === 16)
    assert(px.forall(_ == 0x828282), // 130 everywhere ⇒ predictors reset
      s"distinct pixel values: ${px.distinct.map(_.toHexString).mkString(",")}")
    // the JDK's decoder agrees on the same hand-built bytes
    val ref = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(stream))
    assert(ref != null)
    for (y <- 0 until 16; x <- 0 until 16)
      assert(ref.getRaster.getSample(x, y, 0) === 130, s"ImageIO at $x,$y")
    val st = JpegDecoder.lumaStats(stream).get
    assert(st.pixels === 256L && st.meanLumaX1000 === 130000L && st.peakLuma === 130)
  }

  test("JpegDecoder: scan-less header, truncation and bit-flip fuzz") {
    import graft.sources.MediaSynth
    val hdrOnly = MediaSynth.jpegBytes(33, 21)
    assert(JpegDecoder.lumaStats(hdrOnly).isEmpty) // no entropy data
    val f = Multimodal.decodeStub("u", hdrOnly)
    assert(f.kind === "jpeg" && !f.decoded && f.width === 33 && f.height === 21)
    // truncation: every prefix must decode-or-refuse without throwing,
    // and anything cut inside the entropy stream must refuse
    val base = MediaSynth.jpegPixelBytes(64, 48, gray = false)
    (0 to base.length).foreach { k =>
      val cut = java.util.Arrays.copyOf(base, k)
      val r = JpegDecoder.lumaStats(cut) // no throw
      // cuts in the last 4 bytes may only remove the EOI marker /
      // entropy padding and can legitimately still decode; anything
      // shorter is inside the entropy stream and MUST refuse
      if (k < base.length - 4) assert(r.isEmpty, s"truncated at $k claimed decoded")
    }
    // bit-flip fuzz over header + entropy bytes: None or a decode, never
    // a throw (2000 cases, seeded)
    val rnd = new scala.util.Random(42)
    (0 until 2000).foreach { _ =>
      val b = base.clone()
      val at = rnd.nextInt(b.length)
      b(at) = (b(at) ^ (1 << rnd.nextInt(8))).toByte
      JpegDecoder.lumaStats(b)
      Multimodal.decodeStub("u", b)
    }
    // garbage
    (0 until 300).foreach { _ =>
      val b = new Array[Byte](rnd.nextInt(120))
      rnd.nextBytes(b)
      JpegDecoder.lumaStats(b)
    }
  }

  test("dhash64: matches a naive ImageIO-based reference on PNG, GIF and BMP") {
    import graft.sources.MediaSynth
    // independent reference: decode the WHOLE raster with the JDK, then
    // compute the 9x8 block means and gradient signs the obvious way
    def naive(bytes: Array[Byte]): Long = {
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      val (w, h) = (img.getWidth, img.getHeight)
      val sums = Array.ofDim[Long](8, 9)
      val cnts = Array.ofDim[Long](8, 9)
      for (y <- 0 until h; x <- 0 until w) {
        val rgb = img.getRGB(x, y)
        val l = (2126 * ((rgb >> 16) & 0xff) + 7152 * ((rgb >> 8) & 0xff) +
          722 * (rgb & 0xff)) / 10000
        val cx = (x.toLong * 9 / w).toInt
        val cy = (y.toLong * 8 / h).toInt
        sums(cy)(cx) += l
        cnts(cy)(cx) += 1
      }
      var bits = 0L
      for (y <- 0 until 8; x <- 0 until 8)
        if (sums(y)(x + 1) * cnts(y)(x) > sums(y)(x) * cnts(y)(x + 1))
          bits |= 1L << (y * 8 + x)
      bits
    }
    for ((w, h) <- Seq((90, 80), (64, 48), (127, 33), (9, 8))) {
      val png = MediaSynth.pngPixelBytes(w, h, 2)
      assert(Multimodal.dhash64(png) === Some(naive(png)), s"png ${w}x$h")
      val gif = MediaSynth.gifPixelBytes(w, h)
      assert(Multimodal.dhash64(gif) === Some(naive(gif)), s"gif ${w}x$h")
      val bmp = MediaSynth.bmpBytes(w, h)
      assert(Multimodal.dhash64(bmp) === Some(naive(bmp)), s"bmp ${w}x$h")
      // pngPixelBytes / bmpBytes / ppmBytes carry the SAME rgbAt picture:
      // the hash must be container-independent
      assert(Multimodal.dhash64(png) === Multimodal.dhash64(bmp))
      assert(Multimodal.dhash64(MediaSynth.ppmBytes(w, h)) ===
        Multimodal.dhash64(bmp))
    }
    // below the 9x8 grid: None, not a degenerate hash
    assert(Multimodal.dhash64(MediaSynth.pngPixelBytes(8, 8, 2)).isEmpty)
    assert(Multimodal.dhash64(MediaSynth.pngPixelBytes(9, 7, 2)).isEmpty)
  }

  test("dhash64: GIF interlaced == non-interlaced (row re-mapping is exact)") {
    import graft.sources.MediaSynth
    for ((w, h) <- Seq((90, 80), (40, 21), (16, 9))) {
      val plain = MediaSynth.gifPixelBytes(w, h)
      val inter = MediaSynth.gifPixelBytes(w, h, interlaced = true)
      assert(!java.util.Arrays.equals(plain, inter)) // genuinely different bytes
      // order-free stats agree...
      assert(Multimodal.gifPixels(plain) === Multimodal.gifPixels(inter))
      // ...and so does the SPATIAL hash — only true if rowToY is right
      if (w >= 9 && h >= 8)
        assert(Multimodal.dhash64(plain) === Multimodal.dhash64(inter),
          s"interlace mapping broke at ${w}x$h")
    }
  }

  test("dhash64: seeded near-dup family has the planted hamming structure") {
    import graft.sources.MediaSynth
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    val seeds = (0 until 20).map(i => 0xA11CE000L + i * 7919L)
    val hashes = seeds.map(s => Multimodal.dhash64(MediaSynth.seededPng(s)).get)
    seeds.zip(hashes).foreach { case (s, base) =>
      // cross-container dup: exactly equal
      assert(Multimodal.dhash64(MediaSynth.seededBmp(s)) === Some(base))
      // sum-cancelling noise: exactly equal despite every byte differing
      assert(Multimodal.dhash64(MediaSynth.seededNoisyPng(s)) === Some(base))
      // one-block bump: within the detection radius
      val bumped = Multimodal.dhash64(MediaSynth.seededBumpPng(s)).get
      assert(ham(base, bumped) <= 2, s"seed $s bump hamming ${ham(base, bumped)}")
    }
    // distinct seeds are far apart — no cross-group false positives at
    // radius 3 (deterministic corpus: this either always holds or never)
    for (i <- hashes.indices; j <- hashes.indices if i < j)
      assert(ham(hashes(i), hashes(j)) > 3, s"seeds $i/$j too close")
  }

  test("ahash64: volume/jitter invariance, bump bound, naive-reference equality") {
    import graft.sources.MediaSynth
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    // independent reference: decode samples with JDK AudioSystem, window
    // sums the obvious way
    def naive(bytes: Array[Byte]): Long = {
      val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(bytes))
      val raw = in.readAllBytes()
      val n = raw.length / 2
      val sums = new Array[Long](65)
      val cnts = new Array[Long](65)
      for (k <- 0 until n) {
        val v = ((raw(2 * k) & 0xff) | ((raw(2 * k + 1) & 0xff) << 8)).toShort
        val w = (k.toLong * 65 / n).toInt
        sums(w) += math.abs(v.toInt)
        cnts(w) += 1
      }
      (0 until 64).foldLeft(0L) { (acc, i) =>
        if (sums(i + 1) * cnts(i) > sums(i) * cnts(i + 1)) acc | (1L << i) else acc
      }
    }
    val seeds = (0 until 20).map(i => 0xBEA7000L + i * 6007L)
    val hashes = seeds.map(s => Multimodal.ahash64(MediaSynth.seededWav(s)).get)
    seeds.zip(hashes).foreach { case (s, base) =>
      assert(naive(MediaSynth.seededWav(s)) === base)
      // 5/8-volume re-master: envelope gradient signs survive scaling
      assert(Multimodal.ahash64(
        MediaSynth.seededWav(s, volNum = 5, volDen = 8)) === Some(base))
      // within-window time jitter: order-free sums, hash unchanged
      assert(Multimodal.ahash64(
        MediaSynth.seededWav(s, rotate = true)) === Some(base))
      // one-window level bump: at most the two adjacent comparisons flip
      val bump = (Math.floorMod(
        (s * 0x9E3779B97F4A7C15L) ^ s, 65L)).toInt // any in-range window
      val bumped = Multimodal.ahash64(
        MediaSynth.seededWav(s, bumpWin = bump)).get
      assert(ham(base, bumped) <= 2, s"seed $s bump hamming ${ham(base, bumped)}")
    }
    for (i <- hashes.indices; j <- hashes.indices if i < j)
      assert(ham(hashes(i), hashes(j)) > 3, s"seeds $i/$j too close")
    // truncation + bit-flip fuzz
    val base = MediaSynth.seededWav(99L)
    val rnd = new scala.util.Random(11)
    (0 until 60).foreach { _ =>
      Multimodal.ahash64(java.util.Arrays.copyOf(base, rnd.nextInt(base.length)))
    }
    (0 until 400).foreach { _ =>
      val b = base.clone()
      val at = rnd.nextInt(b.length)
      b(at) = (b(at) ^ (1 << rnd.nextInt(8))).toByte
      Multimodal.ahash64(b)
    }
  }

  test("dhash64: truncation and bit-flip fuzz never throws") {
    import graft.sources.MediaSynth
    val fixtures = Seq(MediaSynth.seededPng(42L), MediaSynth.gifPixelBytes(40, 30),
      MediaSynth.bmpBytes(40, 30), MediaSynth.ppmBytes(40, 30))
    val rnd = new scala.util.Random(7)
    for (base <- fixtures) {
      (0 until 60).foreach { _ =>
        Multimodal.dhash64(java.util.Arrays.copyOf(base, rnd.nextInt(base.length)))
      }
      (0 until 400).foreach { _ =>
        val b = base.clone()
        val at = rnd.nextInt(b.length)
        b(at) = (b(at) ^ (1 << rnd.nextInt(8))).toByte
        Multimodal.dhash64(b)
      }
    }
  }

  // --- EXIF/TIFF metadata ---

  /** The JDK's independent TIFF metadata tree: TIFFField values for the
    * given tag numbers (e.g. 271 Make, 274 Orientation, 306 DateTime).
    */
  private def imageIoTiffFields(bytes: Array[Byte], tags: Set[String]): Map[String, String] = {
    val in = javax.imageio.ImageIO.createImageInputStream(
      new java.io.ByteArrayInputStream(bytes))
    val rs = javax.imageio.ImageIO.getImageReaders(in)
    assert(rs.hasNext, "JDK has no TIFF reader for the fixture")
    val r = rs.next()
    r.setInput(in)
    val tree = r.getImageMetadata(0).getAsTree("javax_imageio_tiff_image_1.0")
    val out = scala.collection.mutable.Map[String, String]()
    def walk(n: org.w3c.dom.Node): Unit = {
      if (n.getNodeName == "TIFFField") {
        val num = n.getAttributes.getNamedItem("number").getNodeValue
        if (tags.contains(num)) {
          val sb = new StringBuilder
          val kids = n.getChildNodes
          for (i <- 0 until kids.getLength) {
            val vals = kids.item(i).getChildNodes
            for (k <- 0 until vals.getLength) {
              val va = vals.item(k).getAttributes
              if (va != null && va.getNamedItem("value") != null)
                sb.append(va.getNamedItem("value").getNodeValue)
            }
          }
          out(num) = sb.toString
        }
      }
      val ks = n.getChildNodes
      for (i <- 0 until ks.getLength) walk(ks.item(i))
    }
    walk(tree)
    out.toMap
  }

  test("exifMeta: ImageIO TIFF reference equality — dims, pixels, Make/Orientation/DateTime") {
    for (big <- Seq(false, true); gps <- Seq(false, true); o <- Seq(1, 3, 6, 8);
         (w, h) <- Seq((33, 21), (7, 5))) {
      val t = MediaSynth.tiffBytes(w, h, o, gps, big)
      val m = Multimodal.exifMeta(t).get
      assert(m.container == "tiff" && m.bigEndian == big && m.gpsPresent == gps)
      // dims + every pixel against the JDK's independent TIFF decoder
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(t))
      assert(img != null && img.getWidth == w && img.getHeight == h)
      assert(m.width == img.getWidth && m.height == img.getHeight)
      for (y <- 0 until h; x <- 0 until w)
        assert(img.getRaster.getSample(x, y, 0) == (x * 11 + y * 17) % 256,
          s"pixel ($x,$y) big=$big")
      // metadata fields against the JDK's metadata tree
      val fields = imageIoTiffFields(t, Set("271", "274", "306"))
      assert(fields.get("271").contains(m.make), s"Make big=$big o=$o")
      assert(fields.get("274").contains(m.orientation.toString))
      assert(fields.get("306").contains(m.dateTime))
    }
  }

  test("exifMeta: JPEG APP1 embedding == standalone TIFF; near-misses yield None") {
    for (big <- Seq(false, true); gps <- Seq(false, true); o <- Seq(1, 6)) {
      val t = Multimodal.exifMeta(MediaSynth.tiffBytes(31, 17, o, gps, big)).get
      val j = Multimodal.exifMeta(MediaSynth.jpegExifBytes(31, 17, o, gps, big)).get
      assert(j == t.copy(container = "jpeg"),
        "the embedded TIFF must parse identically through the APP1 wrapper")
    }
    assert(Multimodal.exifMeta(MediaSynth.jpegBytes(20, 10)).isEmpty,
      "JPEG without an Exif APP1 has no metadata")
    assert(Multimodal.exifMeta(MediaSynth.pngBytes(20, 10)).isEmpty)
    assert(Multimodal.exifMeta(Array.emptyByteArray).isEmpty)
    assert(Multimodal.exifMeta("II??junk".getBytes).isEmpty,
      "an II prefix without the 42 magic is not a TIFF")
  }

  test("exifMeta: truncation and bit-flip fuzz never throws") {
    val rnd = new scala.util.Random(41)
    for (big <- Seq(false, true)) {
      val base = MediaSynth.tiffBytes(25, 14, 6, gps = true, big)
      val jpg = MediaSynth.jpegExifBytes(25, 14, 6, gps = true, big)
      for (cut <- 0 to base.length) Multimodal.exifMeta(base.take(cut))
      for (cut <- 0 to jpg.length by 3) Multimodal.exifMeta(jpg.take(cut))
      for (_ <- 1 to 500) {
        val c = base.clone()
        c(rnd.nextInt(c.length)) = rnd.nextInt(256).toByte
        Multimodal.exifMeta(c) // lying offsets/counts must be contained
      }
    }
    for (_ <- 1 to 2000) {
      val g = new Array[Byte](rnd.nextInt(300))
      rnd.nextBytes(g)
      Multimodal.exifMeta(g)
    }
  }

  test("mp3Meta: tag-skip invariance, all text encodings, and fuzz") {
    // frame facts must be identical with and without the ID3 tag in front
    for (brIdx <- Seq(1, 9, 14); srIdx <- 0 to 2; mono <- Seq(true, false)) {
      val bare = MediaSynth.mp3Bytes(brIdx, srIdx, 4, mono, "", "",
        v24 = false, enc = 0, withTag = false)
      val tagged = MediaSynth.mp3Bytes(brIdx, srIdx, 4, mono, "T", "A",
        v24 = false, enc = 0, withTag = true)
      val a = Multimodal.mp3Meta(bare).get
      val b = Multimodal.mp3Meta(tagged).get
      assert((a.bitrateKbps, a.sampleRate, a.channels, a.durMs) ===
        (b.bitrateKbps, b.sampleRate, b.channels, b.durMs), s"br=$brIdx sr=$srIdx")
      assert(a.title === "" && b.title === "T" && b.artist === "A")
    }
    // the three ID3 text encodings and both tag majors round-trip a
    // non-ASCII title exactly (latin-1 only for its own repertoire)
    for (enc <- 0 to 2; v24 <- Seq(false, true)) {
      val title = if (enc == 0) "Café Track" else "Café 漢 Track"
      val m = Multimodal.mp3Meta(MediaSynth.mp3Bytes(5, 0, 2, mono = false,
        title, "Artist", v24, enc, withTag = true)).get
      assert(m.title === title && m.artist === "Artist", s"enc=$enc v24=$v24")
    }
    // never throws: truncations, bit flips, garbage
    val base = MediaSynth.mp3Bytes(9, 1, 3, mono = false, "T", "A",
      v24 = true, enc = 1, withTag = true)
    for (cut <- 0 to base.length) Multimodal.mp3Meta(base.take(cut))
    val rnd = new scala.util.Random(43)
    for (_ <- 1 to 500) {
      val c = base.clone()
      c(rnd.nextInt(c.length)) = rnd.nextInt(256).toByte
      Multimodal.mp3Meta(c)
    }
    for (_ <- 1 to 2000) {
      val g = new Array[Byte](rnd.nextInt(300))
      rnd.nextBytes(g)
      Multimodal.mp3Meta(g)
    }
    assert(Multimodal.mp3Meta(MediaSynth.wavBytes(8000, 1)).isEmpty,
      "a RIFF/WAVE stream is not an MP3")
  }

  test("features match the driver query row-for-row on synthetic pages") {
    val pages = PagesSynth.pagesDF(spark, 50L)
    val got = Multimodal.features(pages)
      .select(col("url"), col("byte_len"), col("entropy_x1000"))
      .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2))).toSet
    val expected = (0L until 50L).map(PagesSynth.pageFor).map { p =>
      val f = Multimodal.decodeStub(p.url, p.html)
      (p.url, f.byte_len, f.entropy_x1000)
    }.toSet
    assert(got === expected)
  }
}
