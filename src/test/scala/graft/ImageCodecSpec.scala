package graft

import org.scalatest.funsuite.AnyFunSuite

/** The REAL image codec path (`Multimodal.decodeImages` / `resizeImages` /
  * `encodePng`, JDK javax.imageio): PNG round-trip exactness, deterministic
  * nearest-neighbor resampling, undecodable-bytes flow-through, and JPEG
  * acceptance. q85/q86 gate the same path against closed-form DuckDB
  * oracles; these tests pin the pixel-level properties those oracles
  * summarize.
  */
class ImageCodecSpec extends AnyFunSuite {
  lazy val spark = GraftSpark.spark
  import graft.ops.Multimodal

  test("PNG encode -> decode reproduces every pixel exactly") {
    import spark.implicits._
    def pix(x: Int, y: Int): Int = ((x * 11 + y * 7) % 256 << 16) |
      ((x ^ y) % 256 << 8) | ((x + 3 * y) % 256)
    val bytes = Multimodal.encodePng(13, 9)(pix)
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    assert(img.getWidth === 13 && img.getHeight === 9)
    for (y <- 0 until 9; x <- 0 until 13)
      assert((img.getRGB(x, y) & 0xFFFFFF) === pix(x, y), s"pixel ($x,$y)")
    // and through the distributed operator: exact channel means
    val meta = Multimodal.decodeImages(
      Seq(Multimodal.ImageRow(1L, bytes)).toDS()).collect().head
    val n = 13.0 * 9
    assert(meta.ok && meta.width === 13 && meta.height === 9)
    val expR = (for (y <- 0 until 9; x <- 0 until 13) yield (pix(x, y) >> 16) & 0xFF).sum / n
    assert(meta.mean_r === expR)
  }

  test("nearest-neighbor resize picks sx = x*srcW/dstW exactly") {
    import spark.implicits._
    // 4x2 image with unique pixels; resize to 2x1 must keep (0,0) and (2,0)
    def pix(x: Int, y: Int): Int = (y * 4 + x) * 10
    val in = Seq(Multimodal.ImageRow(7L, Multimodal.encodePng(4, 2)(pix))).toDS()
    val out = Multimodal.resizeImages(in, 2, 1).collect().head
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(out.bytes))
    assert(img.getWidth === 2 && img.getHeight === 1)
    assert((img.getRGB(0, 0) & 0xFFFFFF) === pix(0, 0))
    assert((img.getRGB(1, 0) & 0xFFFFFF) === pix(2, 0))
  }

  test("undecodable bytes: ok=false meta row; resize passes the row through") {
    import spark.implicits._
    val junk = Multimodal.ImageRow(9L, Array[Byte](1, 2, 3, 4, 5))
    val meta = Multimodal.decodeImages(Seq(junk).toDS()).collect().head
    assert(!meta.ok && meta.width === 0 && meta.mean_r === 0.0)
    val through = Multimodal.resizeImages(Seq(junk).toDS(), 8, 8).collect().head
    assert(through.bytes.toSeq === junk.bytes.toSeq)
  }

  test("decompression-bomb guard rejects over-limit rasters from the header") {
    // the guard must fire on the HEADER's declared dimensions without
    // allocating the raster — exercised with a small limit so the test
    // itself stays cheap
    val png = Multimodal.encodePng(200, 200)((x, y) => (x * y) & 0xFFFFFF)
    assert(Multimodal.decodeOne(png, maxPixels = 100L * 100).isEmpty)
    assert(Multimodal.decodeOne(png, maxPixels = 200L * 200).nonEmpty,
      "an image exactly at the limit must decode")
    assert(Multimodal.decodeOne(png).nonEmpty) // default limit unaffected
    // and a jpeg goes through the same reader-header path
    val jpg = Multimodal.encodeJpeg(64, 64)((_, _) => 0x808080)
    assert(Multimodal.decodeOne(jpg, maxPixels = 10L).isEmpty)
    assert(Multimodal.decodeOne(jpg).nonEmpty)
  }

  test("bomb-header fixture parses as a header and is rejected by the pixel guard") {
    // the synthetic IHDR must be a VALID header (a real reader claims it
    // and reports the declared dimensions) so q93's bomb row exercises the
    // guard, not a generic parse failure
    val bomb = Multimodal.bombHeaderPng(16384, 16384)
    val iis = javax.imageio.ImageIO.createImageInputStream(
      new java.io.ByteArrayInputStream(bomb))
    val readers = javax.imageio.ImageIO.getImageReaders(iis)
    assert(readers.hasNext, "no ImageIO reader claims the bomb-header PNG")
    val r = readers.next(); r.setInput(iis)
    assert(r.getWidth(0) === 16384 && r.getHeight(0) === 16384)
    r.dispose(); iis.close()
    assert(Multimodal.decodeOne(bomb).isEmpty, "2^28 px must trip the 2^26 guard")
  }

  test("JPEG bytes decode through the same operator") {
    import spark.implicits._
    val img = new java.awt.image.BufferedImage(20, 10,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    val g = img.createGraphics(); g.setColor(java.awt.Color.ORANGE)
    g.fillRect(0, 0, 20, 10); g.dispose()
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpg", out)
    val meta = Multimodal.decodeImages(
      Seq(Multimodal.ImageRow(3L, out.toByteArray)).toDS()).collect().head
    assert(meta.ok && meta.width === 20 && meta.height === 10)
    assert(meta.mean_r > 200, s"orange should be red-dominant, got ${meta.mean_r}")
  }
}
