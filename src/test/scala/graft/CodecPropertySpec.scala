package graft

import graft.operators.{AudioCodec, ImageCodec, VideoCodec}
import graft.operators.AudioCodec.DecodedAudio
import graft.operators.ImageCodec.Decoded
import graft.operators.VideoCodec.DecodedVideo

import org.scalacheck.Gen
import org.scalacheck.Prop.forAll
import org.scalacheck.Test.{check, Parameters}
import org.scalatest.funsuite.AnyFunSuite

/** Property coverage for both real codecs: round-trips over the whole
  * parameter space (not just the handful of hand-picked shapes in
  * ImageCodecSpec/AudioCodecSpec), and fuzzed corrupt inputs — random
  * bytes, random truncations, random single-byte mutations of VALID
  * files — which must land on the null path, never throw. At corpus
  * scale the decode projections see every corruption the crawl
  * contains; "null, not crash" is the contract that keeps a
  * 1000-executor stage alive. */
class CodecPropertySpec extends AnyFunSuite {

  private val params = Parameters.default.withMinSuccessfulTests(200)

  // ---- generators ------------------------------------------------------

  private val genClip: Gen[DecodedAudio] = for {
    channels <- Gen.oneOf(1, 2)
    bits <- Gen.oneOf(8, 16)
    nFrames <- Gen.chooseNum(1, 50)
    max = if (bits == 8) 127 else 32767
    samples <- Gen.listOfN(nFrames * channels, Gen.chooseNum(-max - 1, max))
    rate <- Gen.chooseNum(1, 192000)
  } yield DecodedAudio(rate, channels, bits, nFrames, samples.toArray)

  private val genImage: Gen[Decoded] = for {
    channels <- Gen.oneOf(1, 3)
    w <- Gen.chooseNum(1, 20)
    h <- Gen.chooseNum(1, 15)
    px <- Gen.listOfN(channels * w * h,
      Gen.chooseNum(0, 255).map(_.toByte))
  } yield Decoded(w, h, channels, px.toArray)

  // ---- audio -----------------------------------------------------------

  test("property: WAV round-trip is lossless over the full PCM space") {
    val prop = forAll(genClip) { d =>
      val back = AudioCodec.tryDecode(AudioCodec.encodeWav(d))
      back != null && back.sampleRate == d.sampleRate &&
      back.channels == d.channels && back.bitsPerSample == d.bitsPerSample &&
      back.nFrames == d.nFrames && back.samples.toSeq == d.samples.toSeq
    }
    assert(check(params, prop).passed)
  }

  test("property: audio resample yields exactly outFrames, samples from source frames") {
    val prop = forAll(genClip, Gen.chooseNum(1, 80)) { (d, outFrames) =>
      val rs = AudioCodec.tryDecode(
        AudioCodec.resampleEncoded(AudioCodec.encodeWav(d), outFrames))
      val frames = d.samples.grouped(d.channels).map(_.toSeq).toSet
      rs != null && rs.nFrames == outFrames && rs.channels == d.channels &&
      rs.samples.grouped(rs.channels).forall(f => frames.contains(f.toSeq))
    }
    assert(check(params, prop).passed)
  }

  test("fuzz: corrupt WAV inputs null out, never throw") {
    val mutated = for {
      d <- genClip
      bytes = AudioCodec.encodeWav(d)
      i <- Gen.chooseNum(0, bytes.length - 1)
      b <- Gen.chooseNum(Byte.MinValue.toInt, Byte.MaxValue.toInt)
    } yield { val m = bytes.clone(); m(i) = b.toByte; m }
    val truncated = for {
      d <- genClip
      bytes = AudioCodec.encodeWav(d)
      n <- Gen.chooseNum(0, bytes.length - 1)
    } yield bytes.take(n)
    val random = Gen.listOf(
      Gen.chooseNum(Byte.MinValue.toInt, Byte.MaxValue.toInt).map(_.toByte))
      .map(_.toArray)
    val never = (bytes: Array[Byte]) => {
      AudioCodec.tryDecode(bytes) // Decoded or null — a throw fails the prop
      AudioCodec.resampleEncoded(bytes, 4)
      AudioCodec.statsRow(bytes)
      true
    }
    assert(check(params, forAll(mutated)(never)).passed, "mutation fuzz")
    assert(check(params, forAll(truncated)(never)).passed, "truncation fuzz")
    assert(check(params, forAll(random)(never)).passed, "random-bytes fuzz")
  }

  // ---- image -----------------------------------------------------------

  test("property: netpbm and PNG round-trips are lossless over the dim/pixel space") {
    val prop = forAll(genImage) { d =>
      val viaPbm = ImageCodec.tryDecode(ImageCodec.encodeNetpbm(d))
      val viaPng = ImageCodec.tryDecode(ImageCodec.encodePng(d))
      val bmpOk =
        if (d.channels != 3) true // BMP is 24-bit only
        else {
          val viaBmp = ImageCodec.tryDecode(ImageCodec.encodeBmp(d))
          viaBmp != null && viaBmp.pixels.toSeq == d.pixels.toSeq &&
          viaBmp.width == d.width && viaBmp.height == d.height
        }
      viaPbm != null && viaPbm.pixels.toSeq == d.pixels.toSeq &&
      viaPng != null && viaPng.pixels.toSeq == d.pixels.toSeq &&
      viaPng.width == d.width && viaPng.height == d.height &&
      viaPng.channels == d.channels && bmpOk
    }
    assert(check(params, prop).passed)
  }

  test("fuzz: corrupt image inputs null out, never throw") {
    val encode = (d: Decoded) =>
      if (d.channels == 3 && d.width % 2 == 0) ImageCodec.encodeBmp(d)
      else if (d.width % 3 == 0) ImageCodec.encodePng(d)
      else ImageCodec.encodeNetpbm(d)
    val mutated = for {
      d <- genImage
      bytes = encode(d)
      i <- Gen.chooseNum(0, bytes.length - 1)
      b <- Gen.chooseNum(Byte.MinValue.toInt, Byte.MaxValue.toInt)
    } yield { val m = bytes.clone(); m(i) = b.toByte; m }
    val truncated = for {
      d <- genImage
      bytes = encode(d)
      n <- Gen.chooseNum(0, bytes.length - 1)
    } yield bytes.take(n)
    val never = (bytes: Array[Byte]) => {
      ImageCodec.tryDecode(bytes)
      ImageCodec.statsRow(bytes)
      ImageCodec.resizeEncoded(bytes, 4, 3)
      true
    }
    assert(check(params, forAll(mutated)(never)).passed, "mutation fuzz")
    assert(check(params, forAll(truncated)(never)).passed, "truncation fuzz")
  }

  // ---- video -----------------------------------------------------------

  private val genVideo: Gen[DecodedVideo] = for {
    cs444 <- Gen.oneOf(true, false)
    // C420 needs even dims; generate even and optionally +1 under C444
    w0 <- Gen.chooseNum(1, 8).map(_ * 2)
    h0 <- Gen.chooseNum(1, 6).map(_ * 2)
    odd <- Gen.oneOf(0, 1)
    w = if (cs444) w0 + odd else w0
    h = if (cs444) h0 + odd else h0
    nFrames <- Gen.chooseNum(1, 8)
    cSize = if (cs444) w * h else (w / 2) * (h / 2)
    data <- Gen.listOfN(nFrames * (w * h + 2 * cSize),
      Gen.chooseNum(0, 255).map(_.toByte))
  } yield DecodedVideo(w, h, cs444, nFrames, data.toArray)

  test("property: Y4M round-trip is lossless over both plane layouts") {
    val prop = forAll(genVideo) { d =>
      val back = VideoCodec.tryDecode(VideoCodec.encodeY4m(d))
      back != null && back.width == d.width && back.height == d.height &&
      back.cs444 == d.cs444 && back.nFrames == d.nFrames &&
      back.data.toSeq == d.data.toSeq
    }
    assert(check(params, prop).passed)
  }

  test("property: frame sample yields exactly outFrames, each a source frame") {
    val prop = forAll(genVideo, Gen.chooseNum(1, 12)) { (d, outFrames) =>
      val fs = VideoCodec.tryDecode(
        VideoCodec.frameSampleEncoded(VideoCodec.encodeY4m(d), outFrames))
      val frames = d.data.grouped(d.frameBytes).map(_.toSeq).toSet
      fs != null && fs.nFrames == outFrames && fs.width == d.width &&
      fs.cs444 == d.cs444 &&
      fs.data.grouped(fs.frameBytes).forall(f => frames.contains(f.toSeq))
    }
    assert(check(params, prop).passed)
  }

  test("fuzz: corrupt Y4M inputs null out, never throw") {
    val mutated = for {
      d <- genVideo
      bytes = VideoCodec.encodeY4m(d)
      i <- Gen.chooseNum(0, bytes.length - 1)
      b <- Gen.chooseNum(Byte.MinValue.toInt, Byte.MaxValue.toInt)
    } yield { val m = bytes.clone(); m(i) = b.toByte; m }
    val truncated = for {
      d <- genVideo
      bytes = VideoCodec.encodeY4m(d)
      n <- Gen.chooseNum(0, bytes.length - 1)
    } yield bytes.take(n)
    val random = Gen.listOf(
      Gen.chooseNum(Byte.MinValue.toInt, Byte.MaxValue.toInt).map(_.toByte))
      .map(_.toArray)
    val never = (bytes: Array[Byte]) => {
      VideoCodec.tryDecode(bytes) // DecodedVideo or null — a throw fails
      VideoCodec.frameSampleEncoded(bytes, 3)
      VideoCodec.frameLumaSums(bytes)
      VideoCodec.statsRow(bytes)
      true
    }
    assert(check(params, forAll(mutated)(never)).passed, "mutation fuzz")
    assert(check(params, forAll(truncated)(never)).passed, "truncation fuzz")
    assert(check(params, forAll(random)(never)).passed, "random-bytes fuzz")
  }
  // ---- cross-codec sampler invariants ---------------------------------

  /** The ONE index-mapping contract both nearest-neighbor samplers
    * implement independently: output index k reads source index
    * floor(k*n/m). Shared so the two implementations cannot drift. */
  private def expectedSourceIdx(n: Int, m: Int): Seq[Int] =
    (0 until m).map(k => ((k.toLong * n) / m).toInt)

  test("property: audio resample and video frame-sample share the exact index mapping") {
    // distinguishable sources: audio frame i carries sample value i;
    // video frame i is filled with byte i — so each output maps back
    // to exactly one source index and the mapping is observable
    val prop = forAll(Gen.chooseNum(1, 60), Gen.chooseNum(1, 90)) { (n, m) =>
      val expect = expectedSourceIdx(n, m)
      // endpoints pinned: first output is the first source frame, and
      // the mapping never reaches past the last source frame
      assert(expect.head == 0 && expect.last < n)
      val clip = AudioCodec.encodeWav(
        DecodedAudio(8000, 1, 16, n, Array.tabulate(n)(identity)))
      val audioIdx = AudioCodec.tryDecode(
        AudioCodec.resampleEncoded(clip, m)).samples.toSeq
      val vid = VideoCodec.encodeY4m(DecodedVideo(2, 2, cs444 = true,
        n, Array.tabulate(n * 12)(i => (i / 12).toByte)))
      val videoIdx = VideoCodec.tryDecode(
        VideoCodec.frameSampleEncoded(vid, m))
        .data.grouped(12).map(f => f(0).toInt).toSeq
      audioIdx == expect && videoIdx == expect
    }
    assert(check(params, prop).passed)
  }

  test("zero-frame clips: samplers null out in both codecs, by each format's own contract") {
    // the formats draw the empty-clip line differently — a WAV with an
    // empty data chunk is a VALID zero-frame clip (decodes, sampler
    // guard nulls), while a header-only Y4M is rejected at decode
    // ("no frames") — but the OBSERVABLE sampler contract is the same:
    // no source frame to map => null, never an index crash
    val wav = AudioCodec.encodeWav(DecodedAudio(8000, 1, 16, 0, Array.empty))
    val y4m = VideoCodec.encodeY4m(DecodedVideo(2, 2, cs444 = false, 0, Array.empty))
    assert(AudioCodec.tryDecode(wav).nFrames == 0)
    assert(VideoCodec.tryDecode(y4m) == null)
    assert(AudioCodec.resampleEncoded(wav, 4) == null)
    assert(VideoCodec.frameSampleEncoded(y4m, 4) == null)
  }
}
