package graft.sources.tiff

import java.awt.image.BufferedImage
import javax.imageio.{ImageIO, ImageWriteParam}

import org.scalatest.funsuite.AnyFunSuite

/** Wire-format interop against the JDK's INDEPENDENT TIFF codec
  * (javax.imageio, shipped since JDK 9): both directions, per
  * compression. This is the spec that catches self-consistent
  * encoder/decoder bugs the roundtrip matrix cannot — the LZW
  * early-change off-by-one lived exactly there. */
class TiffInteropSpec extends AnyFunSuite {

  private val W = 64; private val H = 48
  // enough entropy to grow the LZW dictionary well past the 511-entry
  // width bump (the wire-format divergence point)
  private def px(i: Int): Int = ((i * 131) ^ (i >> 3)) & 0xFF

  private def decodeAll(bytes: Array[Byte]): (TiffFormat.TiffRaster, Array[Double]) = {
    def readAt(off: Long, len: Int): Array[Byte] =
      bytes.slice(off.toInt, math.min(bytes.length, off.toInt + len))
    val r = TiffFormat.parse(readAt, bytes.length.toLong)
    val out = new Array[Double](r.width * r.height)
    for (t <- r.tileOffsets.indices) {
      val tx = t % r.tilesAcross; val ty = t / r.tilesAcross
      val pix = TiffFormat.decodeTile(r,
        readAt(r.tileOffsets(t), r.tileByteCounts(t).toInt), ty)
      for (y <- 0 until r.rowsInTile(ty); x <- 0 until r.tileWidth) {
        val gy = ty * r.tileHeight + y; val gx = tx * r.tileWidth + x
        if (gy < r.height && gx < r.width)
          out(gy * r.width + gx) = pix(y * r.tileWidth + x)
      }
    }
    (r, out)
  }

  private def imageIoWrite(compression: String): Array[Byte] = {
    val img = new BufferedImage(W, H, BufferedImage.TYPE_BYTE_GRAY)
    for (y <- 0 until H; x <- 0 until W)
      img.getRaster.setSample(x, y, 0, px(y * W + x))
    val writer = ImageIO.getImageWritersByFormatName("tiff").next()
    val param = writer.getDefaultWriteParam
    param.setCompressionMode(ImageWriteParam.MODE_EXPLICIT)
    param.setCompressionType(compression)
    val bos = new java.io.ByteArrayOutputStream()
    val ios = ImageIO.createImageOutputStream(bos)
    writer.setOutput(ios)
    writer.write(null, new javax.imageio.IIOImage(img, null, null), param)
    ios.close(); writer.dispose()
    bos.toByteArray
  }

  private def imageIoRead(bytes: Array[Byte]): BufferedImage =
    ImageIO.read(new java.io.ByteArrayInputStream(bytes))

  for (comp <- Seq("LZW" -> 5, "Deflate" -> 8, "PackBits" -> 32773)) {
    val (name, code) = comp

    test(s"JDK-ImageIO-written $name TIFF decodes here, exactly") {
      val bytes = imageIoWrite(name)
      val (r, out) = decodeAll(bytes)
      // ImageIO labels Deflate with the legacy 32946 code
      assert(r.compression == code || (code == 8 && r.compression == 32946),
        s"expected $code got ${r.compression}")
      for (i <- 0 until W * H)
        assert(out(i) == px(i), s"$name pixel $i: ${out(i)} vs ${px(i)}")
    }

    test(s"repo-written $name TIFF decodes in JDK ImageIO, exactly") {
      val vals = Array.tabulate(W * H)(i => px(i).toDouble)
      val bytes = TiffFormat.write(W, H, Array(vals), 1, 8, 0, H, 1.0, 1.0,
        TiffFormat.WriteOpts(rowsPerStrip = 7, // 48 % 7 != 0: short last strip
          compression = code))
      val img = imageIoRead(bytes)
      assert(img != null, s"ImageIO could not read the repo's $name TIFF")
      assert(img.getWidth == W && img.getHeight == H)
      for (y <- 0 until H; x <- 0 until W)
        assert(img.getRaster.getSample(x, y, 0) == px(y * W + x),
          s"$name pixel ($x,$y)")
    }
  }

  test("JDK-ImageIO stripped files with a SHORT last strip decode here") {
    // ImageIO writes unpadded final strips — the TIFF 6.0 shape
    val bytes = imageIoWrite("Deflate")
    val (r, _) = decodeAll(bytes)
    assert(r.stripped, "ImageIO writes stripped layout")
  }
}
