package graft.functions

import java.awt.image.BufferedImage
import javax.imageio.ImageIO

import org.scalatest.funsuite.AnyFunSuite

/** Every in-repo media codec with a JDK counterpart, pinned against it
  * in BOTH directions — the same independent-decoder discipline that
  * caught the TIFF LZW early-change bug (a self-consistent
  * encoder/decoder pair can be wrong on the wire and every roundtrip
  * test still passes). PNG, GIF, BMP, baseline JPEG via javax.imageio;
  * WAV via javax.sound.sampled. WebP/FLAC/G.711 have no JDK codec and
  * stay pinned by their format-spec vectors instead. */
class MediaInteropSpec extends AnyFunSuite {

  private val W = 40; private val H = 25
  private def gray(i: Int): Int = ((i * 37) ^ (i >> 4)) & 0xFF
  private def rgb(i: Int): Int =
    (((i * 37) & 0xFF) << 16) | (((i * 91 + 5) & 0xFF) << 8) | ((i * 53 + 11) & 0xFF)

  private def imageIoBytes(img: BufferedImage, format: String): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    assert(ImageIO.write(img, format, bos), s"ImageIO cannot write $format")
    bos.toByteArray
  }
  private def imageIoRead(bytes: Array[Byte]): BufferedImage = {
    val img = ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    assert(img != null, "ImageIO returned null")
    img
  }
  private def grayImage(): BufferedImage = {
    val img = new BufferedImage(W, H, BufferedImage.TYPE_BYTE_GRAY)
    for (y <- 0 until H; x <- 0 until W)
      img.getRaster.setSample(x, y, 0, gray(y * W + x))
    img
  }
  private def rgbImage(): BufferedImage = {
    val img = new BufferedImage(W, H, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until H; x <- 0 until W)
      img.setRGB(x, y, rgb(y * W + x))
    img
  }

  test("PNG: ImageIO-written grayscale and RGB decode here exactly; ours reads back there") {
    // ImageIO -> repo, gray
    val (w1, h1, s1) = graft.sources.grib.Png.decode(imageIoBytes(grayImage(), "png"))
    assert(w1 == W && h1 == H)
    for (i <- 0 until W * H) assert(s1(i) == gray(i), s"gray pixel $i")
    // ImageIO -> repo, RGB (packed into one long per pixel, MSB-first)
    val (w2, h2, s2) = graft.sources.grib.Png.decode(imageIoBytes(rgbImage(), "png"))
    assert(w2 == W && h2 == H)
    for (i <- 0 until W * H) assert((s2(i) & 0xFFFFFF) == rgb(i), s"rgb pixel $i")
    // repo -> ImageIO, gray 8-bit
    val mine = graft.sources.grib.Png.encode(W, H, 8,
      Array.tabulate(W * H)(i => gray(i).toLong))
    val back = imageIoRead(mine)
    for (y <- 0 until H; x <- 0 until W)
      assert(back.getRaster.getSample(x, y, 0) == gray(y * W + x))
  }

  test("GIF: ImageIO-written frames decode here exactly; ours reads back there") {
    // GIF is palettized: use few distinct colors so ImageIO quantizes losslessly
    val img = new BufferedImage(W, H, BufferedImage.TYPE_BYTE_INDEXED)
    for (y <- 0 until H; x <- 0 until W) {
      val v = ((y * W + x) % 16) * 0x111111
      img.setRGB(x, y, v)
    }
    val decoded = Gif.decode(imageIoBytes(img, "gif"))
    val f = decoded.frames.head
    assert(decoded.width == W && decoded.height == H)
    for (y <- 0 until H; x <- 0 until W)
      assert((f.rgb(y * W + x) & 0xFFFFFF) == (img.getRGB(x, y) & 0xFFFFFF),
        s"gif pixel ($x,$y)")
    // repo -> ImageIO
    val palettePx = Array.tabulate(W * H)(i => ((i % 8) * 0x1B1B1B))
    val mine = Gif.encode(W, H, palettePx)
    val back = imageIoRead(mine)
    for (y <- 0 until H; x <- 0 until W)
      assert((back.getRGB(x, y) & 0xFFFFFF) == palettePx(y * W + x),
        s"gif back pixel ($x,$y)")
  }

  test("BMP: ImageIO-written 24-bit decodes through BmpDecoder's luminance exactly") {
    val bytes = imageIoBytes(rgbImage(), "bmp")
    val d = Multimodal.BmpDecoder(1L, bytes, W, H) // native size: no resize
    assert(d.width == W && d.height == H)
    for (i <- 0 until W * H) {
      val c = rgb(i)
      val lum = (((c >> 16) & 0xFF) + ((c >> 8) & 0xFF) + (c & 0xFF)) / (3f * 255f)
      assert(math.abs(d.pixels(i) - lum) < 1e-6, s"bmp pixel $i")
    }
  }

  test("JPEG: ImageIO-written baseline decodes here within codec tolerance, and vice versa") {
    // smooth gradient: DCT-friendly, so decoder differences stay tiny
    val img = new BufferedImage(W, H, BufferedImage.TYPE_BYTE_GRAY)
    for (y <- 0 until H; x <- 0 until W)
      img.getRaster.setSample(x, y, 0, 60 + x * 2 + y)
    val theirs = imageIoBytes(img, "jpg")
    val mine = Jpeg.decode(theirs)
    assert(mine.width == W && mine.height == H)
    val reference = imageIoRead(theirs)
    for (y <- 0 until H; x <- 0 until W) {
      val a = mine.pixels(y * W + x)
      val b = reference.getRaster.getSample(x, y, 0)
      // two independent IDCT/rounding pipelines on the same stream
      assert(math.abs(a - b) <= 2, s"jpeg pixel ($x,$y): $a vs $b")
    }
    // repo-encoded (all-ones quant) must read in ImageIO near-losslessly
    val px = Array.tabulate(W * H)(i => 60 + (i % W) * 2 + i / W)
    val ours = Jpeg.encode(W, H, px)
    val back = imageIoRead(ours)
    for (y <- 0 until H; x <- 0 until W)
      assert(math.abs(back.getRaster.getSample(x, y, 0) - px(y * W + x)) <= 2,
        s"jpeg back pixel ($x,$y)")
  }

  test("WAV: javax.sound-written 16-bit PCM decodes here exactly, and vice versa") {
    import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}
    val n = 500
    val samples = Array.tabulate(n)(i => (((i * 131) % 2001) - 1000).toShort)
    val pcm = new Array[Byte](n * 2)
    for (i <- 0 until n) {
      pcm(2 * i) = (samples(i) & 0xFF).toByte
      pcm(2 * i + 1) = ((samples(i) >> 8) & 0xFF).toByte
    }
    val fmt = new AudioFormat(8000f, 16, 1, true, false)
    val ais = new AudioInputStream(new java.io.ByteArrayInputStream(pcm), fmt, n.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    AudioSystem.write(ais, AudioFileFormat.Type.WAVE, bos)
    val d = Audio.decodeWav(1L, bos.toByteArray)
    assert(d.sampleRate == 8000 && d.samples.length == n)
    for (i <- 0 until n)
      assert(d.samples(i) == samples(i) / 32768f, s"wav sample $i")
    // repo -> javax.sound
    val ours = Audio.encodeWav(samples.map(_.toInt), 8000)
    val back = AudioSystem.getAudioInputStream(new java.io.ByteArrayInputStream(ours))
    assert(back.getFormat.getSampleRate == 8000f &&
      back.getFormat.getSampleSizeInBits == 16)
    val buf = back.readAllBytes()
    assert(buf.length == n * 2)
    for (i <- 0 until n) {
      val v = ((buf(2 * i) & 0xFF) | (buf(2 * i + 1) << 8)).toShort
      assert(v == samples(i), s"wav back sample $i")
    }
  }
}
