package graft

import org.scalatest.funsuite.AnyFunSuite

/** The REAL audio codec path (`Multimodal.decodeAudio` / `downsampleAudio` /
  * `encodeWav`, JDK javax.sound.sampled): WAV PCM16 round-trip exactness,
  * deterministic integer-stride downsampling, and undecodable-bytes
  * flow-through. q87/q88 gate the same path against closed-form DuckDB
  * oracles; these tests pin the sample-level properties those oracles
  * summarize.
  */
class AudioCodecSpec extends AnyFunSuite {
  lazy val spark = GraftSpark.spark
  import graft.ops.Multimodal

  private def sig(n: Int)(f: Int => Int): Array[Short] =
    Array.tabulate(n)(i => f(i).toShort)

  test("WAV encode -> decode reproduces every PCM16 sample exactly") {
    import spark.implicits._
    // full-range signal including the endpoints and sign flips
    val samples = sig(100)(i => ((i * 1231) % 65536) - 32768)
    val bytes = Multimodal.encodeWav(16000, samples)
    // the container really is WAV (RIFF magic) produced by the JDK writer
    assert(new String(bytes.take(4), "US-ASCII") === "RIFF")
    val meta = Multimodal.decodeAudio(
      Seq(Multimodal.AudioRow(1L, bytes)).toDS()).collect().head
    assert(meta.ok && meta.sample_rate === 16000 && meta.channels === 1)
    assert(meta.n_frames === 100L)
    assert(meta.duration_ms === 100 * 1000.0 / 16000)
    val expMean = samples.map(_.toLong).sum.toDouble / 100
    val expAbs = samples.map(s => math.abs(s.toInt).toLong).sum.toDouble / 100
    assert(meta.mean_amp === expMean)
    assert(meta.mean_abs === expAbs)
  }

  test("downsample stride k keeps exactly the frames at i*k, rate/k") {
    import spark.implicits._
    val samples = sig(60)(i => i * 500 - 15000)
    val in = Seq(Multimodal.AudioRow(7L, Multimodal.encodeWav(9000, samples))).toDS()
    val out = Multimodal.downsampleAudio(in, 3).collect().head
    val meta = Multimodal.decodeAudio(Seq(out).toDS()).collect().head
    assert(meta.ok && meta.sample_rate === 3000 && meta.n_frames === 20L)
    val kept = (0 until 60 by 3).map(samples)
    assert(meta.mean_amp === kept.map(_.toLong).sum.toDouble / 20)
  }

  test("stereo round trip: frame-wise downsample preserves channels and never de-interleaves") {
    import spark.implicits._
    // interleaved L/R: L_i = 100*i, R_i = -100*i - 1 (channels always
    // differ, so any de-interleave or channel swap changes the samples)
    val nFrames = 40
    val inter = new Array[Short](nFrames * 2)
    for (i <- 0 until nFrames) {
      inter(2 * i) = (100 * i).toShort
      inter(2 * i + 1) = (-100 * i - 1).toShort
    }
    val bytes = Multimodal.encodeWav(8000, inter, channels = 2)
    val meta = Multimodal.decodeAudio(
      Seq(Multimodal.AudioRow(11L, bytes)).toDS()).collect().head
    assert(meta.ok && meta.channels === 2 && meta.n_frames === nFrames.toLong)
    // stride 4 must keep FRAMES 0,4,8,... — both channels of each
    val out = Multimodal.downsampleAudio(
      Seq(Multimodal.AudioRow(11L, bytes)).toDS(), 4).collect().head
    val ain = javax.sound.sampled.AudioSystem.getAudioInputStream(
      new java.io.ByteArrayInputStream(out.bytes))
    assert(ain.getFormat.getChannels === 2)
    assert(ain.getFormat.getSampleRate === 2000f)
    val raw = ain.readAllBytes()
    val got = Array.tabulate(raw.length / 2)(i =>
      (((raw(2 * i + 1) & 0xFF) << 8) | (raw(2 * i) & 0xFF)).toShort)
    val want = (0 until nFrames by 4).flatMap(f => Seq(inter(2 * f), inter(2 * f + 1)))
    assert(got.toSeq === want, "frame-wise stride must keep L/R pairs intact")
  }

  test("undecodable bytes: ok=false meta row; downsample passes the row through") {
    import spark.implicits._
    val junk = Multimodal.AudioRow(9L, Array[Byte](1, 2, 3, 4, 5, 6, 7, 8))
    val meta = Multimodal.decodeAudio(Seq(junk).toDS()).collect().head
    assert(!meta.ok && meta.sample_rate === 0 && meta.mean_amp === 0.0)
    val through = Multimodal.downsampleAudio(Seq(junk).toDS(), 2).collect().head
    assert(through.bytes.toSeq === junk.bytes.toSeq)
  }

  test("real but non-PCM16 audio (8-bit unsigned WAV) is declined as ok=false data") {
    import spark.implicits._
    // a parseable container the decoder must DECLINE, not misinterpret:
    // dropping the PCM16 gate would read the 8-bit bytes as garbage shorts
    val fmt = new javax.sound.sampled.AudioFormat(8000f, 8, 1, false, false)
    val pcm = Array.tabulate[Byte](64)(i => (i * 3 % 256).toByte)
    val st = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, 64L)
    val out = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(st,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, out)
    val meta = Multimodal.decodeAudio(
      Seq(Multimodal.AudioRow(13L, out.toByteArray)).toDS()).collect().head
    assert(!meta.ok && meta.sample_rate === 0 && meta.n_frames === 0L)
  }

  test("AU container (big-endian PCM16) decodes through the same operator") {
    import spark.implicits._
    // write big-endian PCM16 into an AU container with the JDK writer;
    // decodeAudio must honor the endianness flag when reassembling samples
    val samples = sig(32)(i => i * 1000 - 16000)
    val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, 1, true, true)
    val pcm = new Array[Byte](samples.length * 2)
    for (i <- samples.indices) {
      pcm(2 * i) = ((samples(i) >> 8) & 0xFF).toByte
      pcm(2 * i + 1) = (samples(i) & 0xFF).toByte
    }
    val stream = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, samples.length.toLong)
    val out = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(stream,
      javax.sound.sampled.AudioFileFormat.Type.AU, out)
    val meta = Multimodal.decodeAudio(
      Seq(Multimodal.AudioRow(3L, out.toByteArray)).toDS()).collect().head
    assert(meta.ok && meta.sample_rate === 8000 && meta.n_frames === 32L)
    assert(meta.mean_amp === samples.map(_.toLong).sum.toDouble / 32)
  }
}
