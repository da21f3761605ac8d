package graft.llm

import java.util.Base64

import org.scalatest.funsuite.AnyFunSuite

import graft.llm.Multimodal.ImageIoCodec

/** The real-codec contract: genuine image bytes decode to their true pixel
  * geometry, the resize really rewrites pixels, and non-image payloads
  * surface as honest opaque binary so the seam stays total.
  */
class ImageIoCodecSpec extends AnyFunSuite {

  /** A hand-crafted (not ImageIO-produced) 3×2 8-bit RGB PNG: row 1 =
    * red, green, blue; row 2 = cyan, magenta, yellow. Built externally
    * from the PNG spec (signature + IHDR + zlib IDAT + IEND), so decoding
    * it exercises a real parser against a file our own encoder never saw. */
  private val png3x2: Array[Byte] = Base64.getDecoder.decode(
    "iVBORw0KGgoAAAANSUhEUgAAAAMAAAACCAIAAAASFvFNAAAAE0lEQVR4nGP4z8DAAMX/" +
      "//8HYwBKyQj4vMWn+QAAAABJRU5ErkJggg==")

  test("hand-crafted PNG decodes to true dimensions and pixel values") {
    assert(ImageIoCodec.sniff(png3x2).contains("png"))
    val img = ImageIoCodec.decodeImage(png3x2).get
    assert(img.getWidth == 3 && img.getHeight == 2)
    // the decoder must surface the actual pixels, not just the header
    assert((img.getRGB(0, 0) & 0xffffff) == 0xff0000, "pixel (0,0) not red")
    assert((img.getRGB(1, 0) & 0xffffff) == 0x00ff00, "pixel (1,0) not green")
    assert((img.getRGB(2, 1) & 0xffffff) == 0xffff00, "pixel (2,1) not yellow")
    val meta = ImageIoCodec.decode(7L, png3x2, "89504E47")
    assert(meta.modality == "image" && meta.width == 3 && meta.height == 2)
    assert(meta.channels == 3 && meta.n_frames == 1)
  }

  test("GIF and BMP round-trip through the JDK writers and our sniffer") {
    import java.awt.image.BufferedImage
    import java.io.ByteArrayOutputStream
    for (fmt <- Seq("gif", "bmp")) {
      val src = new BufferedImage(5, 4, BufferedImage.TYPE_3BYTE_BGR)
      val bos = new ByteArrayOutputStream()
      assert(javax.imageio.ImageIO.write(src, fmt, bos), s"no JDK $fmt writer")
      val bytes = bos.toByteArray
      assert(ImageIoCodec.sniff(bytes).contains(fmt), fmt)
      val img = ImageIoCodec.decodeImage(bytes).get
      assert(img.getWidth == 5 && img.getHeight == 4, fmt)
    }
  }

  test("resizeBytes really re-encodes: downscale, clamp, and no-op paths") {
    val big = ImageIoCodec.encodePng(128, 50)
    val resized = ImageIoCodec.resizeBytes(big, 64)
    assert(!(resized sameElements big), "resize returned the original bytes")
    val img = ImageIoCodec.decodeImage(resized).get
    // scale = 64/128 = 0.5 exactly: 128→64, floor(50*0.5)=25
    assert(img.getWidth == 64 && img.getHeight == 25)
    // within bounds → byte-identical no-op
    val small = ImageIoCodec.encodePng(60, 30)
    assert(ImageIoCodec.resizeBytes(small, 64) sameElements small)
    // extreme aspect ratio: the short side clamps to 1, never 0
    val thin = ImageIoCodec.encodePng(600, 2)
    val thinR = ImageIoCodec.decodeImage(ImageIoCodec.resizeBytes(thin, 64)).get
    assert(thinR.getWidth == 64 && thinR.getHeight == 1)
  }

  test("non-image payloads surface as opaque binary (seam is total)") {
    val text = "not an image at all".getBytes("UTF-8")
    assert(ImageIoCodec.sniff(text).isEmpty)
    val meta = ImageIoCodec.decode(5L, text, "4E4F5420")
    assert(meta.modality == "binary" && meta.width == 0 && meta.height == 0 &&
      meta.n_bytes == text.length.toLong, "no fabricated media numbers")
    // truncated magic (short payload) must not throw
    assert(ImageIoCodec.sniff(Array[Byte](0x89.toByte, 'P')).isEmpty)
  }

  test("hand-written BMP bytes decode through the real JDK BMP reader") {
    // encoder and decoder are INDEPENDENT here: encodeBmp lays out bytes
    // from the BMP spec; ImageIO's reader was written by neither this
    // library nor the spec fixture
    val bmp = ImageIoCodec.encodeBmp(13, 9) // odd width exercises row pad
    assert(ImageIoCodec.sniff(bmp).contains("bmp"))
    assert(bmp.length == 54 + 9 * ((3 * 13 + 3) / 4 * 4),
      "BMP size must match the layout arithmetic the oracle uses")
    val img = ImageIoCodec.decodeImage(bmp).get
    assert(img.getWidth == 13 && img.getHeight == 9)
    assert(img.getRaster.getNumBands == 3)
    // pixel content round-trips: row y is the constant (7y + 13) & 0xff
    assert(img.getRaster.getSample(0, 0, 0) == 13, "top row (y=0) value")
    assert(img.getRaster.getSample(5, 8, 0) == (8 * 7 + 13),
      "bottom row value — bottom-up file order decoded to top-down raster")
  }
}
