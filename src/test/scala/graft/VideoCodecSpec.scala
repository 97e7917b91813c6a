package graft

import org.scalatest.funsuite.AnyFunSuite

/** The REAL video path (`Multimodal.sampleVideoFrames` / `encodeMjpegAvi` /
  * `encodeJpeg`): a spec-conformant RIFF/AVI container around frames
  * encoded and decoded by the JDK's actual JPEG codec. q89 gates the same
  * path against a closed-form DuckDB oracle; these tests pin the
  * container layout, the stride selection, JPEG noise staying inside the
  * gray-bucket margin, and corrupt-bytes flow-through.
  */
class VideoCodecSpec extends AnyFunSuite {
  lazy val spark = GraftSpark.spark
  import graft.ops.Multimodal

  private def solid(v: Int): Array[Byte] =
    Multimodal.encodeJpeg(16, 16)((_, _) => (v << 16) | (v << 8) | v)

  test("container layout: RIFF/AVI magic, MJPG fourcc, movi frame chunks") {
    val avi = Multimodal.encodeMjpegAvi(16, 16, 10, Seq(solid(16), solid(48)))
    assert(new String(avi.take(4), "US-ASCII") === "RIFF")
    assert(new String(avi.slice(8, 12), "US-ASCII") === "AVI ")
    val s = new String(avi.map(b => if (b >= 32 && b < 127) b.toChar else '.'))
    assert(s.contains("hdrl") && s.contains("strl") && s.contains("movi"))
    assert(s.contains("vids") && s.contains("MJPG") && s.contains("00dc"))
  }

  test("frame sampling keeps exactly the stride-th frames, levels within bucket") {
    import spark.implicits._
    // 6 frames at levels 0..5 (gray 16, 48, ..., 176); stride 3 -> 0, 3
    val frames = (0 until 6).map(i => solid(32 * i + 16))
    val in = Seq(Multimodal.VideoRow(5L, Multimodal.encodeMjpegAvi(16, 16, 10, frames))).toDS()
    val out = Multimodal.sampleVideoFrames(in, 3).collect().sortBy(_.frame_idx)
    assert(out.map(_.frame_idx).toSeq === Seq(0, 3))
    assert(out.forall(f => f.ok && f.width === 16 && f.height === 16))
    assert(out.map(_.level).toSeq === Seq(0, 3))
  }

  test("JPEG decode noise on solid frames stays well inside the 32-bucket") {
    // directly measure the codec's round-trip error on every bucket level
    for (k <- 0 until 8) {
      val v = 32 * k + 16
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(solid(v)))
      var sum = 0L
      for (y <- 0 until 16; x <- 0 until 16) {
        val p = img.getRGB(x, y)
        sum += (((p >> 16) & 0xFF) + ((p >> 8) & 0xFF) + (p & 0xFF)) / 3
      }
      val mean = sum.toDouble / 256
      assert(math.abs(mean - v) < 8, s"level $k: mean $mean vs encoded $v")
    }
  }

  test("non-AVI bytes yield one ok=false row; truncated container stops cleanly") {
    import spark.implicits._
    val junk = Seq(Multimodal.VideoRow(9L, Array[Byte](1, 2, 3, 4, 5))).toDS()
    val out = Multimodal.sampleVideoFrames(junk, 1).collect()
    assert(out.length === 1 && !out.head.ok && out.head.frame_idx === -1)
    // truncate a valid AVI mid-frame: the walk must not throw, and only
    // fully-contained frames survive
    val avi = Multimodal.encodeMjpegAvi(16, 16, 10, Seq(solid(16), solid(48)))
    val cut = Seq(Multimodal.VideoRow(3L, avi.take(avi.length - 40))).toDS()
    val got = Multimodal.sampleVideoFrames(cut, 1).collect()
    assert(got.forall(f => f.frame_idx <= 0))
  }

  test("garbage frame bytes inside a valid container: ok=false at that index") {
    import spark.implicits._
    // hand-assemble: frame 0 valid, frame 1 garbage (not JPEG)
    val avi = Multimodal.encodeMjpegAvi(16, 16, 10,
      Seq(solid(80), Array[Byte](0x42, 0x42, 0x42, 0x42)))
    val out = Multimodal.sampleVideoFrames(
      Seq(Multimodal.VideoRow(7L, avi)).toDS(), 1).collect().sortBy(_.frame_idx)
    assert(out.map(_.frame_idx).toSeq === Seq(0, 1))
    assert(out(0).ok && out(0).level === 2)
    assert(!out(1).ok && out(1).width === -1)
  }
}
