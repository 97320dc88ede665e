package graft.operators

import java.util.zip.{CRC32, Deflater, Inflater}

/** Pure-JVM PNG codec — the second compressed leg of the reference's
  * image ingest surface (mr/EmdGenerate.java:109-145 consumes crawled
  * images via HIPI/Lire, format-agnostic) built on the JDK's public
  * zlib (java.util.zip) with no external jars.
  *
  * Decoder: 8-bit-depth PNGs, color types gray (0), RGB (2), palette
  * (3), gray+alpha (4), RGBA (6); all five row filters
  * (None/Sub/Up/Average/Paeth); multi-IDAT streams; CRC32-verified
  * chunks. Interlaced (Adam7), 16-bit, and malformed payloads return
  * None — reject, not crash, at corpus scale.
  *
  * Encoder: grayscale or RGB, filter-0 rows, one deflated IDAT. PNG is
  * lossless, so every image round-trips bit-exactly — the declared
  * q_png_hist row leans on that (the decoded pixels are the synthesized
  * analytic function of the text, no DC-only trick needed).
  *
  * The spec cross-checks both directions against the JDK's independent
  * ImageIO PNG implementation (it reads our streams; we read its,
  * including palette and RGBA files it writes).
  */
object Png {

  /** Decoded image: `channels` interleaved 8-bit samples per pixel
    * (1 = gray, 3 = RGB; alpha is composited away by [[decode]] only
    * when `keepAlpha` is false — default keeps it: 2 = gray+alpha,
    * 4 = RGBA). */
  final case class Image(width: Int, height: Int, channels: Int,
                         pixels: Array[Byte])

  private val Signature: Array[Int] =
    Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a)

  // ==== Decoder ====

  /** Decode a PNG payload; None on malformed/unsupported. */
  def decode(payload: Array[Byte]): Option[Image] =
    try decodeImpl(payload)
    catch { case _: ArrayIndexOutOfBoundsException |
                 _: NegativeArraySizeException |
                 _: OutOfMemoryError => None }

  private def decodeImpl(d: Array[Byte]): Option[Image] = {
    if (d.length < 8) return None
    var i = 0
    while (i < 8) { if ((d(i) & 0xff) != Signature(i)) return None; i += 1 }
    def u32(at: Int): Long =
      ((d(at) & 0xffL) << 24) | ((d(at + 1) & 0xffL) << 16) |
        ((d(at + 2) & 0xffL) << 8) | (d(at + 3) & 0xffL)
    var pos = 8
    var width = 0
    var height = 0
    var colorType = -1
    var palette: Array[Byte] = null
    val idat = new java.io.ByteArrayOutputStream()
    var sawIhdr = false
    var sawIend = false
    while (!sawIend) {
      if (pos + 12 > d.length) return None
      val len = u32(pos)
      if (len > Int.MaxValue - 12 || pos + 12 + len > d.length) return None
      val ctype = new String(d, pos + 4, 4, "US-ASCII")
      val crc = new CRC32()
      crc.update(d, pos + 4, 4 + len.toInt)
      if (crc.getValue != u32(pos + 8 + len.toInt)) return None
      val body = pos + 8
      ctype match {
        case "IHDR" =>
          if (sawIhdr || len != 13) return None
          sawIhdr = true
          width = u32(body).toInt
          height = u32(body + 4).toInt
          val bitDepth = d(body + 8) & 0xff
          colorType = d(body + 9) & 0xff
          val compression = d(body + 10) & 0xff
          val filterMethod = d(body + 11) & 0xff
          val interlace = d(body + 12) & 0xff
          if (width <= 0 || height <= 0 ||
            width.toLong * height > (1L << 26) ||
            bitDepth != 8 || compression != 0 || filterMethod != 0 ||
            interlace != 0 ||
            !Set(0, 2, 3, 4, 6).contains(colorType)) return None
        case "PLTE" =>
          if (!sawIhdr || len % 3 != 0 || len > 768) return None
          palette = java.util.Arrays.copyOfRange(d, body, body + len.toInt)
        case "IDAT" =>
          if (!sawIhdr) return None
          idat.write(d, body, len.toInt)
        case "IEND" => sawIend = true
        case _ => () // ancillary chunks: skip (CRC already verified)
      }
      pos += 12 + len.toInt
    }
    if (!sawIhdr) return None
    if (colorType == 3 && palette == null) return None
    val srcCh = colorType match {
      case 0 => 1; case 2 => 3; case 3 => 1; case 4 => 2; case 6 => 4
    }
    // inflate the filtered scanlines
    val rowBytes = srcCh * width
    val raw = new Array[Byte]((rowBytes + 1) * height)
    val inf = new Inflater()
    inf.setInput(idat.toByteArray)
    var off = 0
    try {
      while (off < raw.length && !inf.finished()) {
        val n = inf.inflate(raw, off, raw.length - off)
        if (n == 0 && inf.needsInput()) return None // truncated stream
        off += n
      }
    } catch { case _: java.util.zip.DataFormatException => return None }
    finally inf.end()
    if (off != raw.length) return None
    // unfilter
    val out = new Array[Byte](rowBytes * height)
    var y = 0
    while (y < height) {
      val f = raw(y * (rowBytes + 1)) & 0xff
      val rs = y * (rowBytes + 1) + 1
      val os = y * rowBytes
      var x = 0
      while (x < rowBytes) {
        val cur = raw(rs + x) & 0xff
        val a = if (x >= srcCh) out(os + x - srcCh) & 0xff else 0
        val b = if (y > 0) out(os - rowBytes + x) & 0xff else 0
        val c = if (x >= srcCh && y > 0) out(os - rowBytes + x - srcCh) & 0xff
                else 0
        val v = f match {
          case 0 => cur
          case 1 => cur + a
          case 2 => cur + b
          case 3 => cur + (a + b) / 2
          case 4 =>
            val p = a + b - c
            val pa = math.abs(p - a)
            val pb = math.abs(p - b)
            val pc = math.abs(p - c)
            cur + (if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c)
          case _ => return None
        }
        out(os + x) = (v & 0xff).toByte
        x += 1
      }
      y += 1
    }
    // palette expansion
    if (colorType == 3) {
      val px = new Array[Byte](3 * width * height)
      var j = 0
      while (j < width * height) {
        val idx = out(j) & 0xff
        if (3 * idx + 2 >= palette.length) return None
        px(3 * j) = palette(3 * idx)
        px(3 * j + 1) = palette(3 * idx + 1)
        px(3 * j + 2) = palette(3 * idx + 2)
        j += 1
      }
      Some(Image(width, height, 3, px))
    } else Some(Image(width, height, srcCh, out))
  }

  /** Drop an alpha channel if present (straight copy of the color
    * samples; PNG alpha is unassociated). */
  def dropAlpha(img: Image): Image = img.channels match {
    case 2 | 4 =>
      val keep = img.channels - 1
      val px = new Array[Byte](keep * img.width * img.height)
      var j = 0
      while (j < img.width * img.height) {
        var c = 0
        while (c < keep) {
          px(keep * j + c) = img.pixels(img.channels * j + c); c += 1
        }
        j += 1
      }
      Image(img.width, img.height, keep, px)
    case _ => img
  }

  // ==== Encoder ====

  /** Encode 8-bit samples as a PNG (channels 1 = gray, 3 = RGB),
    * filter-0 rows, single deflated IDAT. Bit-exact lossless. */
  def encode(width: Int, height: Int, channels: Int,
             pixels: Array[Byte]): Array[Byte] = {
    require(channels == 1 || channels == 3, s"channels must be 1 or 3")
    require(pixels.length == channels * width * height, "pixel size mismatch")
    val out = new java.io.ByteArrayOutputStream()
    Signature.foreach(out.write)
    def chunk(ctype: String, body: Array[Byte]): Unit = {
      val len = body.length
      out.write((len >> 24) & 0xff); out.write((len >> 16) & 0xff)
      out.write((len >> 8) & 0xff); out.write(len & 0xff)
      val tb = ctype.getBytes("US-ASCII")
      out.write(tb, 0, 4)
      out.write(body, 0, len)
      val crc = new CRC32()
      crc.update(tb, 0, 4)
      crc.update(body, 0, len)
      val v = crc.getValue
      out.write(((v >> 24) & 0xff).toInt); out.write(((v >> 16) & 0xff).toInt)
      out.write(((v >> 8) & 0xff).toInt); out.write((v & 0xff).toInt)
    }
    val ihdr = new Array[Byte](13)
    def put32(arr: Array[Byte], at: Int, v: Int): Unit = {
      arr(at) = ((v >> 24) & 0xff).toByte; arr(at + 1) = ((v >> 16) & 0xff).toByte
      arr(at + 2) = ((v >> 8) & 0xff).toByte; arr(at + 3) = (v & 0xff).toByte
    }
    put32(ihdr, 0, width); put32(ihdr, 4, height)
    ihdr(8) = 8 // bit depth
    ihdr(9) = (if (channels == 1) 0 else 2).toByte // color type
    chunk("IHDR", ihdr)
    // filter-0 scanlines -> deflate
    val rowBytes = channels * width
    val raw = new Array[Byte]((rowBytes + 1) * height)
    var y = 0
    while (y < height) {
      raw(y * (rowBytes + 1)) = 0
      System.arraycopy(pixels, y * rowBytes, raw, y * (rowBytes + 1) + 1,
        rowBytes)
      y += 1
    }
    val deflater = new Deflater(Deflater.DEFAULT_COMPRESSION)
    deflater.setInput(raw)
    deflater.finish()
    val zBuf = new java.io.ByteArrayOutputStream()
    val tmp = new Array[Byte](8192)
    while (!deflater.finished()) zBuf.write(tmp, 0, deflater.deflate(tmp))
    deflater.end()
    chunk("IDAT", zBuf.toByteArray)
    chunk("IEND", Array.emptyByteArray)
    out.toByteArray
  }
}
