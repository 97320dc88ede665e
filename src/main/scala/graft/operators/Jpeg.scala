package graft.operators

/** Pure-JVM baseline JPEG (JFIF) codec — closes the compressed-image
  * leg of the reference's image ingest surface (the reference consumes
  * JPEG via HIPI/Lire: mr/EmdGenerate.java:109-145,
  * mr/generate/CrawlReducer.java:96-201) without external codec jars.
  *
  * Decoder: baseline sequential DCT (SOF0/SOF1), 8-bit, 1- or
  * 3-component, arbitrary sampling factors 1..4 (4:4:4, 4:2:2, 4:2:0,
  * ...), canonical Huffman tables from DHT, DRI/RSTn restart intervals,
  * APPn/COM skipping, FF00 byte-stuffing. Unsupported (progressive
  * SOF2, arithmetic coding, 12-bit, 4-component CMYK) and malformed
  * payloads return None — reject, not crash, at corpus scale.
  *
  * Encoder (grayscale, for payload synthesis): standard Annex K
  * luminance Huffman tables, caller-supplied quantization. With a
  * unit quant table, an image whose every 8x8 block is CONSTANT
  * round-trips bit-exactly (DC-only blocks: FDCT puts the block in the
  * DC coefficient exactly, AC terms cancel below the rounding
  * threshold), which is what makes a lossy codec DuckDB-oracle-able —
  * the declared q_jpeg_hist row synthesizes exactly such images.
  *
  * The spec cross-checks this decoder against the JDK's independent
  * ImageIO JPEG implementation on BOTH directions: ImageIO decodes
  * this encoder's files, and this decoder reads ImageIO-encoded
  * bitstreams (including 4:2:0 chroma-subsampled color).
  */
object Jpeg {

  /** Decoded image: full-resolution component planes (values 0..255).
    * 1 component = gray; 3 components = Y, Cb, Cr (use [[toRgb]]). */
  final case class Image(width: Int, height: Int,
                         planes: Array[Array[Int]]) {
    def nComps: Int = planes.length
  }

  // zigzag scan position -> natural (row-major) coefficient index
  private val Zigzag: Array[Int] = Array(
    0, 1, 8, 16, 9, 2, 3, 10,
    17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63)

  // 1-D DCT basis: CosT(u)(x) = C(u)/2 * cos((2x+1) u pi / 16)
  private val CosT: Array[Array[Double]] = Array.tabulate(8, 8) { (u, x) =>
    val cu = if (u == 0) 1.0 / math.sqrt(2.0) else 1.0
    0.5 * cu * math.cos((2 * x + 1) * u * math.Pi / 16)
  }

  // ==== Huffman ====

  /** Canonical Huffman table from the DHT (bits, vals) form. */
  private final class HuffTable(bits: Array[Int], vals: Array[Int]) {
    // mincode/maxcode/valptr per code length 1..16 (maxcode -1 = none)
    private val minCode = new Array[Int](17)
    private val maxCode = Array.fill(17)(-1)
    private val valPtr = new Array[Int](17)
    locally {
      var code = 0
      var k = 0
      var l = 1
      while (l <= 16) {
        if (bits(l - 1) > 0) {
          valPtr(l) = k
          minCode(l) = code
          code += bits(l - 1)
          k += bits(l - 1)
          maxCode(l) = code - 1
        }
        code <<= 1
        l += 1
      }
    }
    /** Decode one symbol; -1 on exhausted input / invalid code. */
    def decode(br: BitReader): Int = {
      var code = 0
      var l = 0
      while (l < 16) {
        val b = br.readBit()
        if (b < 0) return -1
        code = (code << 1) | b
        l += 1
        if (maxCode(l) >= 0 && code <= maxCode(l)) {
          val idx = valPtr(l) + code - minCode(l)
          if (idx >= vals.length) return -1
          return vals(idx)
        }
      }
      -1
    }
  }

  /** MSB-first bit reader over the entropy-coded segment, FF00
    * byte-stuffing unstuffed on the fly; stops (returns -1) at any
    * non-stuffing marker. */
  private final class BitReader(data: Array[Byte], var pos: Int) {
    private var cur = 0
    private var cnt = 0
    def readBit(): Int = {
      if (cnt == 0) {
        if (pos >= data.length) return -1
        var b = data(pos) & 0xff
        pos += 1
        if (b == 0xff) {
          if (pos >= data.length) return -1
          val b2 = data(pos) & 0xff
          if (b2 == 0x00) pos += 1 // stuffed FF
          else { pos -= 1; return -1 } // a real marker: stop
          b = 0xff
        }
        cur = b
        cnt = 8
      }
      cnt -= 1
      (cur >> cnt) & 1
    }
    def receive(n: Int): Int = {
      var v = 0
      var i = 0
      while (i < n) {
        val b = readBit()
        if (b < 0) return -1
        v = (v << 1) | b
        i += 1
      }
      v
    }
    /** Byte-align and consume an expected RSTn marker; false if absent. */
    def restart(n: Int): Boolean = {
      cnt = 0
      if (pos + 1 >= data.length) return false
      if ((data(pos) & 0xff) != 0xff ||
        (data(pos + 1) & 0xff) != (0xd0 + n)) return false
      pos += 2
      true
    }
  }

  private def extend(v: Int, t: Int): Int =
    if (t == 0) 0 else if (v < (1 << (t - 1))) v - (1 << t) + 1 else v

  // ==== Decoder ====

  private final case class Comp(id: Int, h: Int, v: Int, tq: Int,
                                var td: Int = 0, var ta: Int = 0)

  /** Decode a baseline JFIF payload; None on malformed/unsupported. */
  def decode(payload: Array[Byte]): Option[Image] =
    try decodeImpl(payload)
    catch { case _: ArrayIndexOutOfBoundsException |
                 _: NegativeArraySizeException |
                 _: OutOfMemoryError => None }

  private def decodeImpl(d: Array[Byte]): Option[Image] = {
    if (d.length < 4 || (d(0) & 0xff) != 0xff || (d(1) & 0xff) != 0xd8)
      return None
    val qt = Array.ofDim[Int](4, 64) // zigzag order
    val qtSeen = new Array[Boolean](4)
    val dcTabs = new Array[HuffTable](4)
    val acTabs = new Array[HuffTable](4)
    var comps: Array[Comp] = null
    var width = 0
    var height = 0
    var restartInterval = 0
    var pos = 2
    while (pos + 4 <= d.length) {
      if ((d(pos) & 0xff) != 0xff) return None
      val marker = d(pos + 1) & 0xff
      if (marker == 0xff) {
        pos += 1 // fill byte before a marker
      } else if (marker == 0xd8 || marker == 0x01 ||
        (marker >= 0xd0 && marker <= 0xd7)) {
        pos += 2 // standalone (unexpected here, but skip)
      } else if (marker == 0xd9) {
        return None // EOI before SOS
      } else {
        val len = ((d(pos + 2) & 0xff) << 8) | (d(pos + 3) & 0xff)
        if (len < 2 || pos + 2 + len > d.length) return None
        val seg = pos + 4
        val segEnd = pos + 2 + len
        marker match {
          case 0xdb => // DQT (possibly several tables)
            var p = seg
            while (p < segEnd) {
              val pq = (d(p) & 0xff) >> 4
              val tq = d(p) & 0x0f
              if (pq != 0 || tq > 3 || p + 65 > segEnd) return None // 8-bit only
              var k = 0
              while (k < 64) { qt(tq)(k) = d(p + 1 + k) & 0xff; k += 1 }
              qtSeen(tq) = true
              p += 65
            }
          case 0xc4 => // DHT (possibly several tables)
            var p = seg
            while (p < segEnd) {
              val tc = (d(p) & 0xff) >> 4
              val th = d(p) & 0x0f
              if (tc > 1 || th > 3 || p + 17 > segEnd) return None
              val bits = Array.tabulate(16)(i => d(p + 1 + i) & 0xff)
              val n = bits.sum
              if (n > 256 || p + 17 + n > segEnd) return None
              val vals = Array.tabulate(n)(i => d(p + 17 + i) & 0xff)
              val t = new HuffTable(bits, vals)
              if (tc == 0) dcTabs(th) = t else acTabs(th) = t
              p += 17 + n
            }
          case 0xc0 | 0xc1 => // SOF0 baseline / SOF1 ext. sequential
            if (comps != null) return None
            val prec = d(seg) & 0xff
            height = ((d(seg + 1) & 0xff) << 8) | (d(seg + 2) & 0xff)
            width = ((d(seg + 3) & 0xff) << 8) | (d(seg + 4) & 0xff)
            val nc = d(seg + 5) & 0xff
            if (prec != 8 || width == 0 || height == 0 ||
              (nc != 1 && nc != 3) || seg + 6 + 3 * nc > segEnd) return None
            comps = Array.tabulate(nc) { i =>
              val b = seg + 6 + 3 * i
              val c = Comp(d(b) & 0xff, (d(b + 1) & 0xff) >> 4,
                d(b + 1) & 0x0f, d(b + 2) & 0xff)
              if (c.h < 1 || c.h > 4 || c.v < 1 || c.v > 4 || c.tq > 3)
                return None
              c
            }
          case 0xc2 | 0xc3 | 0xc5 | 0xc6 | 0xc7 | 0xc9 | 0xca | 0xcb |
               0xcd | 0xce | 0xcf =>
            return None // progressive/arith/lossless: unsupported
          case 0xdd => // DRI
            if (len != 4) return None
            restartInterval = ((d(seg) & 0xff) << 8) | (d(seg + 1) & 0xff)
          case 0xda => // SOS: scan header then entropy data
            if (comps == null) return None
            val ns = d(seg) & 0xff
            if (ns != comps.length || seg + 1 + 2 * ns + 3 > segEnd)
              return None
            var i = 0
            while (i < ns) {
              val cs = d(seg + 1 + 2 * i) & 0xff
              val c = comps.find(_.id == cs).getOrElse(return None)
              c.td = (d(seg + 2 + 2 * i) & 0xff) >> 4
              c.ta = d(seg + 2 + 2 * i) & 0x0f
              if (c.td > 3 || c.ta > 3) return None
              i += 1
            }
            return decodeScan(d, segEnd, comps, width, height, qt, qtSeen,
              dcTabs, acTabs, restartInterval)
          case _ => () // APPn, COM, others: skip
        }
        pos = segEnd
      }
    }
    None // no SOS reached
  }

  private def decodeScan(d: Array[Byte], dataStart: Int, comps: Array[Comp],
                         width: Int, height: Int, qt: Array[Array[Int]],
                         qtSeen: Array[Boolean], dcTabs: Array[HuffTable],
                         acTabs: Array[HuffTable],
                         restartInterval: Int): Option[Image] = {
    val hMax = comps.map(_.h).max
    val vMax = comps.map(_.v).max
    val mcusX = (width + 8 * hMax - 1) / (8 * hMax)
    val mcusY = (height + 8 * vMax - 1) / (8 * vMax)
    // sanity: reject absurd dimension products before allocating
    // (2^22 blocks = 256M component pixels)
    if (mcusX.toLong * mcusY * comps.map(c => c.h * c.v).sum > (1L << 22))
      return None
    comps.foreach { c =>
      if (!qtSeen(c.tq) || dcTabs(c.td) == null || acTabs(c.ta) == null)
        return None
    }
    // per-component storage at its own resolution, padded to whole blocks
    val planeW = comps.map(c => mcusX * c.h * 8)
    val planeH = comps.map(c => mcusY * c.v * 8)
    val planes = Array.tabulate(comps.length)(ci =>
      new Array[Int](planeW(ci) * planeH(ci)))
    val dcPred = new Array[Int](comps.length)
    val coef = new Array[Double](64)
    val br = new BitReader(d, dataStart)
    var rstIdx = 0
    var mcusSinceRestart = 0
    var my = 0
    while (my < mcusY) {
      var mx = 0
      while (mx < mcusX) {
        if (restartInterval > 0 && mcusSinceRestart == restartInterval) {
          if (!br.restart(rstIdx)) return None
          rstIdx = (rstIdx + 1) & 7
          java.util.Arrays.fill(dcPred, 0)
          mcusSinceRestart = 0
        }
        var ci = 0
        while (ci < comps.length) {
          val c = comps(ci)
          var by = 0
          while (by < c.v) {
            var bx = 0
            while (bx < c.h) {
              java.util.Arrays.fill(coef, 0.0)
              // DC
              val t = dcTabs(c.td).decode(br)
              if (t < 0 || t > 15) return None
              val diffBits = br.receive(t)
              if (diffBits < 0) return None
              dcPred(ci) += extend(diffBits, t)
              coef(0) = dcPred(ci).toDouble * qt(c.tq)(0)
              // AC
              var k = 1
              var run = true
              while (run && k < 64) {
                val rs = acTabs(c.ta).decode(br)
                if (rs < 0) return None
                val r = rs >> 4
                val s = rs & 15
                if (s == 0) {
                  if (r == 15) k += 16 else run = false // EOB
                } else {
                  k += r
                  if (k > 63) return None
                  val bitsV = br.receive(s)
                  if (bitsV < 0) return None
                  coef(Zigzag(k)) = extend(bitsV, s).toDouble * qt(c.tq)(k)
                  k += 1
                }
              }
              writeBlock(coef, planes(ci), planeW(ci),
                (mx * c.h + bx) * 8, (my * c.v + by) * 8)
              bx += 1
            }
            by += 1
          }
          ci += 1
        }
        mcusSinceRestart += 1
        mx += 1
      }
      my += 1
    }
    // crop + replication-upsample every component to full resolution
    val out = Array.tabulate(comps.length) { ci =>
      val c = comps(ci)
      val p = new Array[Int](width * height)
      var y = 0
      while (y < height) {
        val sy = y * c.v / vMax
        var x = 0
        while (x < width) {
          p(y * width + x) = planes(ci)(sy * planeW(ci) + x * c.h / hMax)
          x += 1
        }
        y += 1
      }
      p
    }
    Some(Image(width, height, out))
  }

  /** IDCT one dequantized block into a plane at (x0, y0), +128 level
    * shift, rounded and clamped to 0..255. */
  private def writeBlock(coef: Array[Double], plane: Array[Int],
                         planeW: Int, x0: Int, y0: Int): Unit = {
    val tmp = new Array[Double](64)
    // rows: for each row y, tmp(y)(x) = sum_u coef(y)(u) * CosT(u)(x)
    var y = 0
    while (y < 8) {
      var x = 0
      while (x < 8) {
        var s = 0.0
        var u = 0
        while (u < 8) { s += coef(y * 8 + u) * CosT(u)(x); u += 1 }
        tmp(y * 8 + x) = s
        x += 1
      }
      y += 1
    }
    // cols + level shift + clamp
    var x = 0
    while (x < 8) {
      var yy = 0
      while (yy < 8) {
        var s = 0.0
        var v = 0
        while (v < 8) { s += tmp(v * 8 + x) * CosT(v)(yy); v += 1 }
        val px = math.round(s + 128.0).toInt
        plane((y0 + yy) * planeW + x0 + x) =
          if (px < 0) 0 else if (px > 255) 255 else px
        yy += 1
      }
      x += 1
    }
  }

  /** YCbCr planes -> packed RGB bytes (3 per pixel), JFIF full-range
    * conversion, rounded and clamped. */
  def toRgb(img: Image): Array[Byte] = {
    val n = img.width * img.height
    val out = new Array[Byte](3 * n)
    if (img.nComps == 1) {
      var i = 0
      while (i < n) {
        val g = img.planes(0)(i).toByte
        out(3 * i) = g; out(3 * i + 1) = g; out(3 * i + 2) = g
        i += 1
      }
    } else {
      def clamp(v: Double): Byte = {
        val r = math.round(v).toInt
        (if (r < 0) 0 else if (r > 255) 255 else r).toByte
      }
      var i = 0
      while (i < n) {
        val y = img.planes(0)(i).toDouble
        val cb = img.planes(1)(i) - 128.0
        val cr = img.planes(2)(i) - 128.0
        out(3 * i) = clamp(y + 1.402 * cr)
        out(3 * i + 1) = clamp(y - 0.344136 * cb - 0.714136 * cr)
        out(3 * i + 2) = clamp(y + 1.772 * cb)
        i += 1
      }
    }
    out
  }

  // ==== Encoder (grayscale) ====

  // Annex K.3 luminance Huffman specs
  private val DcLumBits =
    Array(0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0)
  private val DcLumVals = Array.tabulate(12)(identity)
  private val AcLumBits =
    Array(0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7d)
  private val AcLumVals = Array(
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
    0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
    0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xa1, 0x08,
    0x23, 0x42, 0xb1, 0xc1, 0x15, 0x52, 0xd1, 0xf0,
    0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0a, 0x16,
    0x17, 0x18, 0x19, 0x1a, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2a, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
    0x3a, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
    0x4a, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5a, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
    0x6a, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7a, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8a, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
    0x99, 0x9a, 0xa2, 0xa3, 0xa4, 0xa5, 0xa6, 0xa7,
    0xa8, 0xa9, 0xaa, 0xb2, 0xb3, 0xb4, 0xb5, 0xb6,
    0xb7, 0xb8, 0xb9, 0xba, 0xc2, 0xc3, 0xc4, 0xc5,
    0xc6, 0xc7, 0xc8, 0xc9, 0xca, 0xd2, 0xd3, 0xd4,
    0xd5, 0xd6, 0xd7, 0xd8, 0xd9, 0xda, 0xe1, 0xe2,
    0xe3, 0xe4, 0xe5, 0xe6, 0xe7, 0xe8, 0xe9, 0xea,
    0xf1, 0xf2, 0xf3, 0xf4, 0xf5, 0xf6, 0xf7, 0xf8,
    0xf9, 0xfa)

  /** (code, length) per symbol from a canonical (bits, vals) spec. */
  private def buildCodes(bits: Array[Int],
                         vals: Array[Int]): Array[(Int, Int)] = {
    val codes = new Array[(Int, Int)](256)
    var code = 0
    var k = 0
    var l = 1
    while (l <= 16) {
      var i = 0
      while (i < bits(l - 1)) {
        codes(vals(k)) = (code, l)
        code += 1; k += 1; i += 1
      }
      code <<= 1
      l += 1
    }
    codes
  }
  private lazy val DcLumCodes = buildCodes(DcLumBits, DcLumVals)
  private lazy val AcLumCodes = buildCodes(AcLumBits, AcLumVals)

  private final class BitWriter {
    private val buf = new java.io.ByteArrayOutputStream()
    private var cur = 0
    private var cnt = 0
    def put(code: Int, len: Int): Unit = {
      var i = len - 1
      while (i >= 0) {
        cur = (cur << 1) | ((code >> i) & 1)
        cnt += 1
        if (cnt == 8) {
          buf.write(cur)
          if (cur == 0xff) buf.write(0x00) // stuffing
          cur = 0; cnt = 0
        }
        i -= 1
      }
    }
    def flush(): Unit = if (cnt > 0) { put(0xff, 8 - cnt) } // 1-pad
    /** Byte-align and emit a raw marker (no stuffing). */
    def putMarker(m: Int): Unit = { flush(); buf.write(0xff); buf.write(m) }
    def bytes: Array[Byte] = buf.toByteArray
  }

  private def category(v: Int): Int = 32 - Integer.numberOfLeadingZeros(
    math.abs(v)) // 0 for v == 0

  /** Encode an 8-bit grayscale plane as baseline JFIF. `quant` is the
    * 64-entry luminance quantization table in NATURAL (row-major)
    * order, entries 1..255; all-1s makes constant blocks lossless.
    * `restartInterval` > 0 emits DRI + RSTn markers every that many
    * MCUs (with DC-predictor resets), exercising the decoder's restart
    * machinery with a real bitstream. */
  def encodeGray(width: Int, height: Int, pixels: Array[Byte],
                 quant: Array[Int] = Array.fill(64)(1),
                 restartInterval: Int = 0): Array[Byte] = {
    require(pixels.length == width * height, "pixel buffer size mismatch")
    require(quant.length == 64 && quant.forall(q => q >= 1 && q <= 255),
      "quant table must be 64 entries in 1..255")
    require(restartInterval >= 0, "restartInterval must be >= 0")
    val out = new java.io.ByteArrayOutputStream()
    def w8(v: Int): Unit = out.write(v & 0xff)
    def w16(v: Int): Unit = { w8(v >> 8); w8(v) }
    w16(0xffd8) // SOI
    // APP0 JFIF
    w16(0xffe0); w16(16)
    out.write("JFIF".getBytes("US-ASCII")); w8(0)
    w16(0x0101); w8(0); w16(1); w16(1); w8(0); w8(0)
    // DQT (table 0, zigzag order)
    w16(0xffdb); w16(67); w8(0)
    var k = 0
    while (k < 64) { w8(quant(Zigzag(k))); k += 1 }
    // SOF0: 8-bit, 1 component, no subsampling
    w16(0xffc0); w16(11); w8(8); w16(height); w16(width); w8(1)
    w8(1); w8(0x11); w8(0)
    // DRI
    if (restartInterval > 0) { w16(0xffdd); w16(4); w16(restartInterval) }
    // DHT: DC 0 + AC 0
    w16(0xffc4); w16(2 + 17 + DcLumVals.length + 17 + AcLumVals.length)
    w8(0x00); DcLumBits.foreach(w8); DcLumVals.foreach(w8)
    w8(0x10); AcLumBits.foreach(w8); AcLumVals.foreach(w8)
    // SOS
    w16(0xffda); w16(8); w8(1); w8(1); w8(0x00); w8(0); w8(63); w8(0)
    // entropy-coded data
    val bw = new BitWriter
    val blocksX = (width + 7) / 8
    val blocksY = (height + 7) / 8
    val coef = new Array[Double](64)
    val zz = new Array[Int](64)
    var dcPred = 0
    var mcusDone = 0
    var rstIdx = 0
    var by = 0
    while (by < blocksY) {
      var bx = 0
      while (bx < blocksX) {
        if (restartInterval > 0 && mcusDone == restartInterval) {
          bw.putMarker(0xd0 + rstIdx)
          rstIdx = (rstIdx + 1) & 7
          dcPred = 0
          mcusDone = 0
        }
        // level-shifted block, edge-replicated padding
        var y = 0
        while (y < 8) {
          val sy = math.min(by * 8 + y, height - 1)
          var x = 0
          while (x < 8) {
            val sx = math.min(bx * 8 + x, width - 1)
            coef(y * 8 + x) = (pixels(sy * width + sx) & 0xff) - 128.0
            x += 1
          }
          y += 1
        }
        fdctInPlace(coef)
        k = 0
        while (k < 64) {
          zz(k) = math.round(coef(Zigzag(k)) / quant(Zigzag(k))).toInt
          k += 1
        }
        // DC
        val diff = zz(0) - dcPred
        dcPred = zz(0)
        val t = category(diff)
        val (dcode, dlen) = DcLumCodes(t)
        bw.put(dcode, dlen)
        if (t > 0)
          bw.put(if (diff < 0) diff + (1 << t) - 1 else diff, t)
        // AC with run-lengths, ZRL, EOB
        var run = 0
        k = 1
        while (k < 64) {
          if (zz(k) == 0) run += 1
          else {
            while (run > 15) {
              val (zc, zl) = AcLumCodes(0xf0); bw.put(zc, zl); run -= 16
            }
            val s = category(zz(k))
            val (ac, al) = AcLumCodes((run << 4) | s)
            bw.put(ac, al)
            bw.put(if (zz(k) < 0) zz(k) + (1 << s) - 1 else zz(k), s)
            run = 0
          }
          k += 1
        }
        if (run > 0) { val (ec, el) = AcLumCodes(0x00); bw.put(ec, el) }
        mcusDone += 1
        bx += 1
      }
      by += 1
    }
    bw.flush()
    out.write(bw.bytes)
    w16(0xffd9) // EOI
    out.toByteArray
  }

  /** In-place 2-D FDCT (rows then columns with the shared basis). */
  private def fdctInPlace(block: Array[Double]): Unit = {
    val tmp = new Array[Double](64)
    var y = 0
    while (y < 8) {
      var u = 0
      while (u < 8) {
        var s = 0.0
        var x = 0
        while (x < 8) { s += block(y * 8 + x) * CosT(u)(x); x += 1 }
        tmp(y * 8 + u) = s
        u += 1
      }
      y += 1
    }
    var u = 0
    while (u < 8) {
      var v = 0
      while (v < 8) {
        var s = 0.0
        var yy = 0
        while (yy < 8) { s += tmp(yy * 8 + u) * CosT(v)(yy); yy += 1 }
        block(v * 8 + u) = s
        v += 1
      }
      u += 1
    }
  }
}
