package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** Baseline JFIF codec: exact losslessness on DC-only (constant-block)
  * images, bounded error on general content, BOTH-direction cross-checks
  * against the JDK's independent ImageIO JPEG implementation (ImageIO
  * reads our bitstreams; we read ImageIO's, including 4:2:0 color), and
  * reject-not-crash on malformed/unsupported payloads. */
class JpegSpec extends AnyFunSuite {

  private def gray(w: Int, h: Int)(f: (Int, Int) => Int): Array[Byte] =
    Array.tabulate(w * h)(i => f(i % w, i / w).toByte)

  test("constant 8x8 blocks round-trip bit-exactly (unit quant)") {
    // all four block values, including extremes
    val vals = Array(0, 37, 128, 255)
    val px = gray(16, 16)((x, y) => vals((y / 8) * 2 + x / 8))
    val jpeg = Jpeg.encodeGray(16, 16, px)
    val img = Jpeg.decode(jpeg).get
    assert(img.width == 16 && img.height == 16 && img.nComps == 1)
    assert(img.planes(0).map(_.toByte).sameElements(px),
      "DC-only blocks must be exactly lossless")
  }

  test("general gray content round-trips within the DCT rounding bound") {
    // gradients + checkerboard exercise every AC frequency; with a unit
    // quant table the only loss is coefficient rounding (|err| <= 2)
    val px = gray(24, 17)((x, y) =>
      (x * 10 + y * 7 + (if ((x + y) % 2 == 0) 30 else 0)) % 256)
    val img = Jpeg.decode(Jpeg.encodeGray(24, 17, px)).get
    assert(img.width == 24 && img.height == 17)
    val maxErr = px.indices.map(i =>
      math.abs((px(i) & 0xff) - img.planes(0)(i))).max
    assert(maxErr <= 2, s"max roundtrip error $maxErr")
  }

  test("ImageIO (independent JDK codec) decodes our bitstreams identically") {
    val vals = Array(12, 99, 200, 255)
    val px = gray(16, 16)((x, y) => vals((y / 8) * 2 + x / 8))
    val jpeg = Jpeg.encodeGray(16, 16, px)
    val bi = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(jpeg))
    assert(bi != null, "ImageIO must accept our JFIF output")
    assert(bi.getWidth == 16 && bi.getHeight == 16)
    for (y <- 0 until 16; x <- 0 until 16) {
      val want = vals((y / 8) * 2 + x / 8)
      val got = bi.getRaster.getSample(x, y, 0)
      assert(got == want, s"ImageIO pixel ($x,$y): $got != $want")
    }
    // general content: two independent IDCTs may differ by rounding only
    val px2 = gray(24, 17)((x, y) => (x * 11 + y * 5) % 256)
    val jpeg2 = Jpeg.encodeGray(24, 17, px2)
    val bi2 = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(jpeg2))
    val ours2 = Jpeg.decode(jpeg2).get
    val maxDelta = (for (y <- 0 until 17; x <- 0 until 24) yield
      math.abs(bi2.getRaster.getSample(x, y, 0) -
        ours2.planes(0)(y * 24 + x))).max
    assert(maxDelta <= 1, s"IDCT disagreement $maxDelta > 1")
  }

  test("we decode ImageIO-encoded bitstreams (gray + 4:2:0 color)") {
    import java.awt.image.BufferedImage
    // gray gradient through ImageIO's encoder
    val g = new BufferedImage(20, 14, BufferedImage.TYPE_BYTE_GRAY)
    for (y <- 0 until 14; x <- 0 until 20)
      g.getRaster.setSample(x, y, 0, (x * 9 + y * 13) % 256)
    val gos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(g, "jpg", gos))
    val gBytes = gos.toByteArray
    val gOurs = Jpeg.decode(gBytes).get
    assert(gOurs.width == 20 && gOurs.height == 14)
    val gRef = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(gBytes))
    val gDelta = (for (y <- 0 until 14; x <- 0 until 20) yield
      math.abs(gRef.getRaster.getSample(x, y, 0) -
        gOurs.planes(0)(y * 20 + x))).max
    assert(gDelta <= 1, s"gray decode disagreement $gDelta")

    // constant-color image: ImageIO emits 4:2:0-subsampled 3-component
    // JPEG; constant chroma makes any upsampling filter agree, so the
    // two decoders must match within color-conversion rounding
    val c = new BufferedImage(32, 24, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 24; x <- 0 until 32) c.setRGB(x, y, 0x3a7fc2)
    val cos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(c, "jpg", cos))
    val cBytes = cos.toByteArray
    val cOurs = Jpeg.decode(cBytes).get
    assert(cOurs.nComps == 3, "expected a 3-component scan")
    val rgb = Jpeg.toRgb(cOurs)
    val cRef = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(cBytes))
    val cDelta = (for (y <- 0 until 24; x <- 0 until 32) yield {
      val p = cRef.getRGB(x, y)
      val i = 3 * (y * 32 + x)
      math.max(math.abs(((p >> 16) & 0xff) - (rgb(i) & 0xff)),
        math.max(math.abs(((p >> 8) & 0xff) - (rgb(i + 1) & 0xff)),
          math.abs((p & 0xff) - (rgb(i + 2) & 0xff))))
    }).max
    assert(cDelta <= 2, s"color decode disagreement $cDelta")
  }

  test("malformed and unsupported payloads are rejected, not crashed") {
    val good = Jpeg.encodeGray(16, 16, gray(16, 16)((x, y) => x * 16 + y))
    assert(Jpeg.decode(Array[Byte]()).isEmpty)
    assert(Jpeg.decode(Array[Byte](1, 2, 3)).isEmpty)
    assert(Jpeg.decode(good.take(20)).isEmpty, "truncated header")
    assert(Jpeg.decode(good.dropRight(30)).isEmpty, "truncated entropy data")
    // progressive: flip SOF0 (FFC0) to SOF2 (FFC2)
    val prog = good.clone()
    val sof = prog.indices.find(i => (prog(i) & 0xff) == 0xff &&
      i + 1 < prog.length && (prog(i + 1) & 0xff) == 0xc0).get
    prog(sof + 1) = 0xc2.toByte
    assert(Jpeg.decode(prog).isEmpty, "progressive must be rejected")
    // corrupt a DQT segment length to point past the end
    val bad = good.clone()
    val dqt = bad.indices.find(i => (bad(i) & 0xff) == 0xff &&
      i + 1 < bad.length && (bad(i + 1) & 0xff) == 0xdb).get
    bad(dqt + 2) = 0x7f.toByte
    assert(Jpeg.decode(bad).isEmpty, "oversize segment length")
    // not a JPEG at all
    assert(Jpeg.decode("P6\n16 16\n255\n".getBytes("US-ASCII")).isEmpty)
  }

  test("restart markers: DRI bitstreams decode exactly, ImageIO agrees") {
    // our encoder emits DRI + RSTn every MCU (byte-aligned, DC predictor
    // reset); the decoder's restart machinery must reproduce the pixels
    // bit-exactly on DC-only blocks, and the independent ImageIO decoder
    // must accept the same bitstream and agree
    val vals = Array(7, 77, 177, 250)
    val px = gray(16, 16)((x, y) => vals((y / 8) * 2 + x / 8))
    val jpeg = Jpeg.encodeGray(16, 16, px, restartInterval = 1)
    // the stream really contains restart markers
    assert(jpeg.sliding(2).exists(p => (p(0) & 0xff) == 0xff &&
      (p(1) & 0xff) >= 0xd0 && (p(1) & 0xff) <= 0xd7), "no RSTn emitted")
    val ours = Jpeg.decode(jpeg).get
    assert(ours.planes(0).map(_.toByte).sameElements(px),
      "restart decode must stay exactly lossless")
    val bi = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(jpeg))
    assert(bi != null)
    for (y <- 0 until 16; x <- 0 until 16)
      assert(bi.getRaster.getSample(x, y, 0) == vals((y / 8) * 2 + x / 8))
    // interval 3 over a 2x2-MCU image: a reset mid-row and across rows
    val px2 = gray(16, 16)((x, y) => (x * 3 + y * 5) % 256)
    val j2 = Jpeg.encodeGray(16, 16, px2, restartInterval = 3)
    val o2 = Jpeg.decode(j2).get
    val bi2 = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(j2))
    val d2 = (for (y <- 0 until 16; x <- 0 until 16) yield
      math.abs(bi2.getRaster.getSample(x, y, 0) -
        o2.planes(0)(y * 16 + x))).max
    assert(d2 <= 1, s"restart general-content disagreement $d2")
  }
}
