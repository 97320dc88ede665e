package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** PNG codec: bit-exact lossless roundtrips, both-direction cross-checks
  * against the JDK's independent ImageIO PNG implementation (which
  * writes real filtered scanlines, palette and RGBA variants), and
  * reject-not-crash on malformed payloads. */
class PngSpec extends AnyFunSuite {

  private def grayPx(w: Int, h: Int)(f: (Int, Int) => Int): Array[Byte] =
    Array.tabulate(w * h)(i => f(i % w, i / w).toByte)

  test("gray and RGB images round-trip bit-exactly") {
    val g = grayPx(23, 11)((x, y) => (x * 31 + y * 17) % 256)
    val gi = Png.decode(Png.encode(23, 11, 1, g)).get
    assert(gi.width == 23 && gi.height == 11 && gi.channels == 1)
    assert(gi.pixels.sameElements(g))
    val rgb = Array.tabulate(3 * 9 * 7)(i => ((i * 89) % 256).toByte)
    val ci = Png.decode(Png.encode(9, 7, 3, rgb)).get
    assert(ci.channels == 3 && ci.pixels.sameElements(rgb))
  }

  test("ImageIO (independent JDK codec) reads our PNGs identically") {
    val g = grayPx(16, 16)((x, y) => (x * 16 + y) % 256)
    val bi = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(Png.encode(16, 16, 1, g)))
    assert(bi != null)
    for (y <- 0 until 16; x <- 0 until 16)
      assert(bi.getRaster.getSample(x, y, 0) == (g(y * 16 + x) & 0xff))
    val rgb = Array.tabulate(3 * 8 * 8)(i => ((i * 53 + 7) % 256).toByte)
    val bc = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(Png.encode(8, 8, 3, rgb)))
    for (y <- 0 until 8; x <- 0 until 8) {
      val p = bc.getRGB(x, y)
      val i = 3 * (y * 8 + x)
      assert(((p >> 16) & 0xff) == (rgb(i) & 0xff) &&
        ((p >> 8) & 0xff) == (rgb(i + 1) & 0xff) &&
        (p & 0xff) == (rgb(i + 2) & 0xff))
    }
  }

  test("we read ImageIO-written PNGs exactly (filters, palette, RGBA)") {
    import java.awt.image.BufferedImage
    // TYPE_BYTE_GRAY gradient: ImageIO picks real non-zero row filters
    val g = new BufferedImage(33, 21, BufferedImage.TYPE_BYTE_GRAY)
    for (y <- 0 until 21; x <- 0 until 33)
      g.getRaster.setSample(x, y, 0, (x * 7 + y * 29) % 256)
    val gos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(g, "png", gos))
    val gOurs = Png.decode(gos.toByteArray).get
    assert(gOurs.channels == 1)
    for (y <- 0 until 21; x <- 0 until 33)
      assert((gOurs.pixels(y * 33 + x) & 0xff) == (x * 7 + y * 29) % 256)
    // palette: TYPE_BYTE_INDEXED forces a PLTE chunk
    val p = new BufferedImage(10, 10, BufferedImage.TYPE_BYTE_INDEXED)
    for (y <- 0 until 10; x <- 0 until 10)
      p.setRGB(x, y, if ((x + y) % 2 == 0) 0xff0000 else 0x0000ff)
    val pos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(p, "png", pos))
    val pOurs = Png.decode(pos.toByteArray).get
    assert(pOurs.channels == 3, "palette must expand to RGB")
    val pRef = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(pos.toByteArray))
    for (y <- 0 until 10; x <- 0 until 10) {
      val want = pRef.getRGB(x, y)
      val i = 3 * (y * 10 + x)
      assert(((want >> 16) & 0xff) == (pOurs.pixels(i) & 0xff) &&
        ((want >> 8) & 0xff) == (pOurs.pixels(i + 1) & 0xff) &&
        (want & 0xff) == (pOurs.pixels(i + 2) & 0xff))
    }
    // RGBA: TYPE_INT_ARGB with varying alpha
    val a = new BufferedImage(6, 5, BufferedImage.TYPE_INT_ARGB)
    for (y <- 0 until 5; x <- 0 until 6)
      a.setRGB(x, y, ((40 * x + 55) << 24) | (x * 40 << 16) | (y * 50 << 8) | 0x33)
    val aos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(a, "png", aos))
    val aOurs = Png.decode(aos.toByteArray).get
    assert(aOurs.channels == 4, "RGBA must decode with alpha")
    for (y <- 0 until 5; x <- 0 until 6) {
      val want = a.getRGB(x, y)
      val i = 4 * (y * 6 + x)
      assert(((want >> 16) & 0xff) == (aOurs.pixels(i) & 0xff), "R")
      assert(((want >> 8) & 0xff) == (aOurs.pixels(i + 1) & 0xff), "G")
      assert((want & 0xff) == (aOurs.pixels(i + 2) & 0xff), "B")
      assert(((want >> 24) & 0xff) == (aOurs.pixels(i + 3) & 0xff), "A")
    }
    assert(Png.dropAlpha(aOurs).channels == 3)
  }

  test("malformed payloads are rejected, not crashed") {
    val good = Png.encode(16, 16, 1, grayPx(16, 16)((x, y) => x + y))
    assert(Png.decode(Array[Byte]()).isEmpty)
    assert(Png.decode("not a png at all".getBytes).isEmpty)
    assert(Png.decode(good.take(20)).isEmpty, "truncated after IHDR start")
    assert(Png.decode(good.dropRight(10)).isEmpty, "truncated IEND")
    // flip one IDAT byte: CRC must catch it
    val bad = good.clone()
    bad(good.length - 30) = (bad(good.length - 30) ^ 0x5a).toByte
    assert(Png.decode(bad).isEmpty, "corrupt chunk must fail CRC")
    // interlaced flag set (with CRC fixed up) must be rejected as
    // unsupported, not mis-decoded
    val adam = good.clone()
    adam(28) = 1 // IHDR interlace byte (8 sig + 4 len + 4 type + body[12])
    val crc = new java.util.zip.CRC32()
    crc.update(adam, 12, 17)
    val v = crc.getValue
    var k = 0
    while (k < 4) {
      adam(29 + k) = ((v >> (24 - 8 * k)) & 0xff).toByte; k += 1
    }
    assert(Png.decode(adam).isEmpty, "Adam7 must be rejected")
  }
}
