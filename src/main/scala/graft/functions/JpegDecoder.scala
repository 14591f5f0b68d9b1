package graft.functions

/** REAL pure-JVM baseline JPEG decoder (ITU-T T.81 / ISO 10918-1): marker
  * walk (DQT/DHT/SOF0-1/DRI/SOS), canonical Huffman entropy decode with
  * byte-stuffing and restart markers, dequantization, 8×8 inverse DCT
  * (double-precision separable — the spec's Annex A reference transform),
  * nearest-neighbor chroma upsampling and JFIF YCbCr→RGB. Baseline and
  * extended-sequential Huffman frames only; progressive (SOF2),
  * arithmetic-coded, hierarchical, 12-bit and 4-component (CMYK) streams
  * return None so [[Multimodal]]'s header-only path keeps the dims.
  *
  * JPEG is lossy, so unlike the PNG/GIF/BMP/PPM decoders there is no
  * bit-exact pre-encoding ground truth; correctness is pinned two ways
  * instead: MultimodalSpec cross-checks every pixel against the JDK's
  * ImageIO decoder on identical bytes (small bounded tolerance — decoders
  * legitimately differ in IDCT rounding and chroma interpolation, T.81
  * Annex K quantifies the allowed drift), and q33 checks decoded stats
  * against the raw pre-encoding pattern within a lossy-compression bound.
  *
  * Scale shape: decoding streams one MCU band at a time (memory
  * O(width × 16 × components), never the whole raster) and a total-pixel
  * work cap defuses lying headers; the decoder runs inside the same
  * narrow per-partition pass as every other media feature — the blob is
  * never shuffled. Never throws on truncated/garbage input.
  */
object JpegDecoder {

  /** Decoded luma statistics — same integer Rec.709 contract as the other
    * raster decoders in [[Multimodal]].
    */
  final case class JpegStats(width: Int, height: Int, pixels: Long,
                             meanLumaX1000: Long, peakLuma: Int)

  /** Work cap: rasters promising more pixels than this are left to the
    * header-only path (zip-bomb guard, same bound as the PNG decoder).
    */
  final val MaxPixels = 1L << 26

  private final class Corrupt extends RuntimeException(null, null, false, false)
  private val corrupt = new Corrupt // stackless, reused — control flow only

  // ---- canonical Huffman table (spec Annex C/F decode arrays) ----
  private final class HuffTable(bits: Array[Int], vals: Array[Byte]) {
    // mincode/maxcode/valptr indexed by code length 1..16
    val minCode = new Array[Int](17)
    val maxCode = new Array[Int](17)
    val valPtr = new Array[Int](17)
    val values: Array[Byte] = vals
    locally {
      var code = 0
      var k = 0
      var l = 1
      while (l <= 16) {
        valPtr(l) = k
        minCode(l) = code
        code += bits(l)
        maxCode(l) = if (bits(l) > 0) code - 1 else -1
        k += bits(l)
        code <<= 1
        l += 1
      }
    }
  }

  // ---- entropy-coded segment bit reader with 0xFF00 stuffing ----
  private final class BitReader(b: Array[Byte], var pos: Int) {
    private var buf = 0
    private var cnt = 0

    @inline private def u8(i: Int): Int = b(i) & 0xff

    def nextBit(): Int = {
      if (cnt == 0) {
        if (pos >= b.length) throw corrupt
        var byt = u8(pos); pos += 1
        if (byt == 0xff) {
          if (pos >= b.length) throw corrupt
          val m = u8(pos)
          if (m == 0x00) pos += 1 // stuffed 0xFF data byte
          else if (m >= 0xd0 && m <= 0xd7) {
            // unexpected restart marker mid-block: corrupt stream
            throw corrupt
          } else throw corrupt // EOI or another marker before data ran out
        }
        buf = byt; cnt = 8
      }
      cnt -= 1
      (buf >> cnt) & 1
    }

    def receive(n: Int): Int = {
      var v = 0
      var i = 0
      while (i < n) { v = (v << 1) | nextBit(); i += 1 }
      v
    }

    def decodeHuff(t: HuffTable): Int = {
      var code = nextBit()
      var l = 1
      while (l <= 16) {
        if (t.maxCode(l) >= 0 && code <= t.maxCode(l))
          return t.values(t.valPtr(l) + code - t.minCode(l)) & 0xff
        code = (code << 1) | nextBit()
        l += 1
      }
      throw corrupt // code longer than 16 bits
    }

    /** Byte-align and consume an expected RSTn marker. */
    def restart(expected: Int): Unit = {
      cnt = 0
      if (pos + 1 >= b.length) throw corrupt
      if (u8(pos) != 0xff || u8(pos + 1) != (0xd0 | (expected & 7)))
        throw corrupt
      pos += 2
    }
  }

  /** DC/AC value extension (spec F.2.2.1 EXTEND). */
  @inline private def extend(v: Int, t: Int): Int =
    if (t == 0) 0 else if (v < (1 << (t - 1))) v - (1 << t) + 1 else v

  // zigzag index -> natural (row-major) index
  private val ZigZag: Array[Int] = Array(
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63)

  // IDCT basis: COS(u)(x) = c(u) * cos((2x+1)uπ/16), c(0)=1/√2 else 1
  private val Cos: Array[Array[Double]] = Array.tabulate(8, 8) { (u, x) =>
    val c = if (u == 0) 1.0 / math.sqrt(2.0) else 1.0
    c * math.cos((2 * x + 1) * u * math.Pi / 16.0)
  }

  /** Reference separable 2-D inverse DCT: coef (natural order, already
    * dequantized) → samples (level-shifted +128, clamped to 0..255) into
    * `out`.
    */
  private def idct8x8(coef: Array[Int], out: Array[Int]): Unit = {
    val tmp = new Array[Double](64)
    // columns first: tmp(y*8+u) = Σv Cv(y) F(u,v)
    var u = 0
    while (u < 8) {
      var y = 0
      while (y < 8) {
        var s = 0.0
        var v = 0
        while (v < 8) {
          val f = coef(v * 8 + u)
          if (f != 0) s += Cos(v)(y) * f
          v += 1
        }
        tmp(y * 8 + u) = s
        y += 1
      }
      u += 1
    }
    // rows: s(x,y) = 1/4 Σu Cu(x) tmp(y,u)
    var y = 0
    while (y < 8) {
      var x = 0
      while (x < 8) {
        var s = 0.0
        var uu = 0
        while (uu < 8) { s += Cos(uu)(x) * tmp(y * 8 + uu); uu += 1 }
        val p = math.round(s / 4.0 + 128.0).toInt
        out(y * 8 + x) = if (p < 0) 0 else if (p > 255) 255 else p
        x += 1
      }
      y += 1
    }
  }

  private final class Component {
    var id = 0
    var h = 1
    var v = 1
    var tq = 0
    var dcTab: HuffTable = null
    var acTab: HuffTable = null
    var dcPred = 0
    // per-MCU-band sample plane: (mcusX * 8h) wide × (8v) tall
    var plane: Array[Int] = null
    var planeW = 0
  }

  /** Decode, streaming MCU bands to `onBand(yStart, rows, width, rgb)`
    * where `rgb` holds at least `rows * width` packed 0xRRGGBB ints (rows
    * beyond `rows` are stale — callers must honor the bound). Returns
    * (w, h) on success.
    */
  private def decode(b: Array[Byte],
                     onBand: (Int, Int, Int, Array[Int]) => Unit): Option[(Int, Int)] = {
    val n = b.length
    @inline def u8(i: Int): Int = if (i < n) b(i) & 0xff else throw corrupt
    @inline def be16(i: Int): Int = (u8(i) << 8) | u8(i + 1)
    try {
      if (n < 4 || u8(0) != 0xff || u8(1) != 0xd8) return None
      val quant = Array.fill(4)(null: Array[Int])
      val huffDc = Array.fill(4)(null: HuffTable)
      val huffAc = Array.fill(4)(null: HuffTable)
      var restartInterval = 0
      var width = 0
      var height = 0
      var comps: Array[Component] = null
      var i = 2
      var sosAt = -1
      var scanOrder: Array[Component] = null
      while (sosAt < 0) {
        // marker alignment: skip fill bytes
        if (u8(i) != 0xff) throw corrupt
        while (u8(i) == 0xff) i += 1
        val marker = u8(i)
        i += 1
        marker match {
          case 0xd8 => // stray SOI
          case 0xd9 => return None // EOI before any scan
          case 0xc0 | 0xc1 => // SOF0 baseline / SOF1 extended sequential
            val len = be16(i)
            if (u8(i + 2) != 8) return None // 12-bit precision unsupported
            height = be16(i + 3)
            width = be16(i + 5)
            val nc = u8(i + 7)
            if (width <= 0 || height <= 0) return None
            if (width.toLong * height > MaxPixels) return None
            if (nc != 1 && nc != 3) return None // CMYK/unknown layouts
            comps = Array.fill(nc)(new Component)
            var c = 0
            while (c < nc) {
              val at = i + 8 + c * 3
              comps(c).id = u8(at)
              comps(c).h = u8(at + 1) >> 4
              comps(c).v = u8(at + 1) & 0x0f
              comps(c).tq = u8(at + 2)
              if (comps(c).h < 1 || comps(c).h > 4 || comps(c).v < 1 ||
                  comps(c).v > 4 || comps(c).tq > 3) return None
              c += 1
            }
            i += len
          case 0xc2 | 0xc3 | 0xc5 | 0xc6 | 0xc7 | 0xc9 | 0xca | 0xcb |
               0xcd | 0xce | 0xcf =>
            return None // progressive / arithmetic / hierarchical
          case 0xc4 => // DHT: one or more tables
            val len = be16(i)
            var at = i + 2
            while (at < i + len) {
              val tc = u8(at) >> 4
              val th = u8(at) & 0x0f
              if (tc > 1 || th > 3) throw corrupt
              val bits = new Array[Int](17)
              var total = 0
              var l = 1
              while (l <= 16) { bits(l) = u8(at + l); total += bits(l); l += 1 }
              if (total > 256) throw corrupt
              val vals = new Array[Byte](total)
              var k = 0
              while (k < total) { vals(k) = b(at + 17 + k); k += 1 }
              val t = new HuffTable(bits, vals)
              if (tc == 0) huffDc(th) = t else huffAc(th) = t
              at += 17 + total
            }
            i += len
          case 0xdb => // DQT: one or more tables
            val len = be16(i)
            var at = i + 2
            while (at < i + len) {
              val pq = u8(at) >> 4
              val tq = u8(at) & 0x0f
              if (pq > 1 || tq > 3) throw corrupt
              val q = new Array[Int](64)
              var k = 0
              while (k < 64) {
                q(k) = if (pq == 0) u8(at + 1 + k)
                       else be16(at + 1 + 2 * k)
                k += 1
              }
              quant(tq) = q
              at += 1 + (if (pq == 0) 64 else 128)
            }
            i += len
          case 0xdd => // DRI
            restartInterval = be16(i + 2)
            i += be16(i)
          case 0xda => // SOS
            val len = be16(i)
            if (comps == null) return None
            val ns = u8(i + 2)
            if (ns != comps.length) return None // multi-scan not supported
            scanOrder = new Array[Component](ns)
            var c = 0
            while (c < ns) {
              val cid = u8(i + 3 + c * 2)
              val tabs = u8(i + 4 + c * 2)
              val comp = comps.find(_.id == cid).getOrElse(throw corrupt)
              comp.dcTab = huffDc(tabs >> 4)
              comp.acTab = huffAc(tabs & 0x0f)
              if (comp.dcTab == null || comp.acTab == null ||
                  quant(comp.tq) == null) throw corrupt
              scanOrder(c) = comp
              c += 1
            }
            sosAt = i + len
          case m if m >= 0xd0 && m <= 0xd7 => // stray RST outside a scan
            throw corrupt
          case 0x01 => // TEM, parameterless
          case _ => // APPn / COM / anything with a length field
            i += be16(i)
        }
      }
      // ---- entropy-coded scan ----
      val hMax = comps.map(_.h).max
      val vMax = comps.map(_.v).max
      val mcusX = (width + 8 * hMax - 1) / (8 * hMax)
      val mcusY = (height + 8 * vMax - 1) / (8 * vMax)
      comps.foreach { c =>
        c.planeW = mcusX * 8 * c.h
        c.plane = new Array[Int](c.planeW * 8 * c.v)
      }
      val br = new BitReader(b, sosAt)
      val coef = new Array[Int](64)
      val block = new Array[Int](64)
      val bandH = 8 * vMax
      val rgb = new Array[Int](width * bandH)
      var mcuCount = 0
      var rstIdx = 0
      var my = 0
      while (my < mcusY) {
        var mx = 0
        while (mx < mcusX) {
          if (restartInterval > 0 && mcuCount > 0 &&
              mcuCount % restartInterval == 0) {
            br.restart(rstIdx)
            rstIdx = (rstIdx + 1) & 7
            comps.foreach(_.dcPred = 0)
          }
          var ci = 0
          while (ci < scanOrder.length) {
            val c = scanOrder(ci)
            val q = quant(c.tq)
            var by = 0
            while (by < c.v) {
              var bx = 0
              while (bx < c.h) {
                // -- decode one block --
                java.util.Arrays.fill(coef, 0)
                val t = br.decodeHuff(c.dcTab)
                if (t > 11) throw corrupt
                c.dcPred += extend(br.receive(t), t)
                coef(0) = c.dcPred * q(0)
                var k = 1
                var eob = false
                while (!eob && k < 64) {
                  val rs = br.decodeHuff(c.acTab)
                  val r = rs >> 4
                  val s = rs & 0x0f
                  if (s == 0) {
                    if (r == 15) k += 16 // ZRL
                    else eob = true
                  } else {
                    k += r
                    if (k > 63) throw corrupt
                    coef(ZigZag(k)) = extend(br.receive(s), s) * q(k)
                    k += 1
                  }
                }
                idct8x8(coef, block)
                // place into the component's band plane
                val px = (mx * c.h + bx) * 8
                val py = by * 8
                var yy = 0
                while (yy < 8) {
                  var xx = 0
                  val dst = (py + yy) * c.planeW + px
                  while (xx < 8) {
                    c.plane(dst + xx) = block(yy * 8 + xx)
                    xx += 1
                  }
                  yy += 1
                }
                bx += 1
              }
              by += 1
            }
            ci += 1
          }
          mcuCount += 1
          mx += 1
        }
        // ---- color-convert + emit this band ----
        val yStart = my * bandH
        val rows = math.min(bandH, height - yStart)
        if (comps.length == 1) {
          val c0 = comps(0)
          var y = 0
          while (y < rows) {
            val srcY = y * c0.v / vMax
            var x = 0
            while (x < width) {
              val g = c0.plane(srcY * c0.planeW + x * c0.h / hMax)
              rgb(y * width + x) = (g << 16) | (g << 8) | g
              x += 1
            }
            y += 1
          }
        } else {
          val cy = comps(0); val cb = comps(1); val cr = comps(2)
          var y = 0
          while (y < rows) {
            val yY = y * cy.v / vMax
            val yB = y * cb.v / vMax
            val yR = y * cr.v / vMax
            var x = 0
            while (x < width) {
              val lum = cy.plane(yY * cy.planeW + x * cy.h / hMax)
              val pb = cb.plane(yB * cb.planeW + x * cb.h / hMax) - 128
              val pr = cr.plane(yR * cr.planeW + x * cr.h / hMax) - 128
              // JFIF full-range YCbCr → RGB (fixed point ×65536)
              var r = lum + ((91881 * pr) >> 16)
              var g = lum - ((22554 * pb + 46802 * pr) >> 16)
              var bl = lum + ((116130 * pb) >> 16)
              if (r < 0) r = 0 else if (r > 255) r = 255
              if (g < 0) g = 0 else if (g > 255) g = 255
              if (bl < 0) bl = 0 else if (bl > 255) bl = 255
              rgb(y * width + x) = (r << 16) | (g << 8) | bl
              x += 1
            }
            y += 1
          }
        }
        onBand(yStart, rows, width, rgb)
        my += 1
      }
      Some((width, height))
    } catch {
      case _: Corrupt | _: ArrayIndexOutOfBoundsException |
           _: NegativeArraySizeException | _: MatchError => None
    }
  }

  /** Streaming luma statistics (integer Rec.709, identical to the other
    * raster decoders) — never materializes the raster. None on anything
    * but a well-formed baseline/extended-sequential Huffman JPEG.
    */
  def lumaStats(b: Array[Byte]): Option[JpegStats] = {
    var sum = 0L
    var peak = 0
    decode(b, (_, rows, w, rgb) => {
      var i = 0
      val m = rows * w
      while (i < m) {
        val p = rgb(i)
        val l = (2126 * ((p >> 16) & 0xff) + 7152 * ((p >> 8) & 0xff) +
          722 * (p & 0xff)) / 10000
        sum += l
        if (l > peak) peak = l
        i += 1
      }
    }) match {
      case Some((w, h)) =>
        val pix = w.toLong * h
        Some(JpegStats(w, h, pix, (sum * 1000 + pix / 2) / pix, peak))
      case None => None
    }
  }

  /** Full-raster decode for tests/cross-checks (bounded by [[MaxPixels]]):
    * packed 0xRRGGBB ints, row-major. Single pass — bands are copied as
    * they stream.
    */
  def decodeRgb(b: Array[Byte]): Option[(Int, Int, Array[Int])] = {
    val bands = scala.collection.mutable.ArrayBuffer.empty[(Int, Int, Array[Int])]
    decode(b, (yStart, rows, w, rgb) =>
      bands += ((yStart, rows, java.util.Arrays.copyOf(rgb, rows * w)))
    ).map { case (w, h) =>
      val full = new Array[Int](w * h)
      bands.foreach { case (y0, rows, px) =>
        System.arraycopy(px, 0, full, y0 * w, rows * w)
      }
      (w, h, full)
    }
  }
}
