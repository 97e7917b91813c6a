package graft

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** Property-based invariants for the real media codecs: lossless PNG and
  * WAV round trips on arbitrary rasters/signals (not just the closed-form
  * shapes the q85-q88 oracles use), and the MJPEG-AVI container walk
  * yielding exactly ceil(n/stride) frames for arbitrary frame counts and
  * strides.
  */
class CodecPropertySpec extends AnyFunSuite {
  lazy val spark = GraftSpark.spark
  import graft.ops.Multimodal

  private def check(p: Prop, n: Int): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(n), p)
    assert(res.passed, res.status.toString)
  }

  test("PNG round trip is lossless for arbitrary rasters") {
    val gen = for {
      w <- Gen.chooseNum(1, 24)
      h <- Gen.chooseNum(1, 24)
      seed <- Gen.chooseNum(0, Int.MaxValue)
    } yield (w, h, seed)
    check(Prop.forAll(gen) { case (w, h, seed) =>
      def pix(x: Int, y: Int): Int =
        scala.util.hashing.MurmurHash3.productHash((seed, x, y)) & 0xFFFFFF
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(Multimodal.encodePng(w, h)(pix)))
      img.getWidth == w && img.getHeight == h &&
        (0 until h).forall(y => (0 until w).forall(x =>
          (img.getRGB(x, y) & 0xFFFFFF) == pix(x, y)))
    }, 60)
  }

  test("WAV round trip is lossless for arbitrary PCM16 signals") {
    val gen = for {
      rate <- Gen.chooseNum(1, 48000)
      n <- Gen.chooseNum(0, 300)
      seed <- Gen.chooseNum(0, Int.MaxValue)
    } yield (rate, n, seed)
    check(Prop.forAll(gen) { case (rate, n, seed) =>
      val samples = Array.tabulate(n)(i =>
        (scala.util.hashing.MurmurHash3.productHash((seed, i)) & 0xFFFF).toShort)
      val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(Multimodal.encodeWav(rate, samples)))
      val fmt = in.getFormat
      val raw = in.readAllBytes()
      val back = Array.tabulate(raw.length / 2)(i =>
        (((raw(2 * i + 1) & 0xFF) << 8) | (raw(2 * i) & 0xFF)).toShort)
      fmt.getSampleRate.toInt == rate && !fmt.isBigEndian &&
        back.toSeq == samples.toSeq
    }, 60)
  }

  test("AVI walk yields exactly ceil(n/stride) frames at the right indices") {
    import spark.implicits._
    val gen = for {
      n <- Gen.chooseNum(0, 10)
      stride <- Gen.chooseNum(1, 4)
    } yield (n, stride)
    // one solid JPEG reused for every frame keeps the cases fast; the
    // per-frame identity (level) is covered by VideoCodecSpec/q89
    val jpeg = Multimodal.encodeJpeg(16, 16)((_, _) => 0x505050)
    check(Prop.forAll(gen) { case (n, stride) =>
      val avi = Multimodal.encodeMjpegAvi(16, 16, 10, Seq.fill(n)(jpeg))
      val got = Multimodal.sampleVideoFrames(
          Seq(Multimodal.VideoRow(1L, avi)).toDS(), stride)
        .collect().map(_.frame_idx).sorted.toSeq
      got == (0 until n by stride).toSeq
    }, 15)
  }
}
