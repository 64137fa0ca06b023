package graft

import graft.operators.{AudioCodec, AudioEnergyExpr, AudioResampleExpr, AudioStatsExpr, TestWavExpr}
import graft.operators.AudioCodec.DecodedAudio

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.Bridge

class AudioCodecSpec extends SparkTestBase {
  import spark.implicits._

  private def clip(channels: Int, bits: Int, nFrames: Int): DecodedAudio = {
    val n = nFrames * channels
    val max = if (bits == 8) 127 else 32767
    DecodedAudio(8000, channels, bits, nFrames,
      Array.tabulate(n)(i => ((i * 977 + 13) % (2 * max + 1)) - max))
  }

  test("WAV round trip across all four PCM shapes") {
    for (channels <- Seq(1, 2); bits <- Seq(8, 16)) {
      val d = clip(channels, bits, 7)
      val back = AudioCodec.tryDecode(AudioCodec.encodeWav(d))
      assert(back != null, s"decode failed for ch=$channels bits=$bits")
      assert(back.sampleRate == 8000 && back.channels == channels &&
        back.bitsPerSample == bits && back.nFrames == 7)
      assert(back.samples.toSeq == d.samples.toSeq,
        s"samples diverged for ch=$channels bits=$bits")
    }
  }

  test("decode of hand-built bytes: 16-bit LE sign extension and interleave") {
    // one stereo frame: ch0 = -2 (0xFFFE LE), ch1 = 259 (0x0103 LE)
    val d = AudioCodec.tryDecode(AudioCodec.encodeWav(
      DecodedAudio(44100, 2, 16, 1, Array(-2, 259))))
    assert(d.samples.toSeq == Seq(-2, 259))
    // byte-level check of the encoding itself (LE order, header fields)
    val b = AudioCodec.encodeWav(DecodedAudio(44100, 2, 16, 1, Array(-2, 259)))
    assert(b.length == 48)
    assert((b(44) & 0xff, b(45) & 0xff) == (0xfe, 0xff), "ch0 not LE -2")
    assert((b(46) & 0xff, b(47) & 0xff) == (0x03, 0x01), "ch1 not LE 259")
  }

  test("8-bit samples are unsigned on disk, centered when decoded") {
    val d = AudioCodec.tryDecode(AudioCodec.encodeWav(
      DecodedAudio(8000, 1, 8, 3, Array(-128, 0, 127))))
    assert(d.samples.toSeq == Seq(-128, 0, 127))
    val b = AudioCodec.encodeWav(DecodedAudio(8000, 1, 8, 3, Array(-128, 0, 127)))
    assert((b(44) & 0xff, b(45) & 0xff, b(46) & 0xff) == (0, 128, 255))
  }

  test("chunk scan: an extra chunk before fmt/data is skipped (odd size padded)") {
    val base = AudioCodec.encodeWav(clip(1, 16, 2))
    // splice a 3-byte "LIST" chunk (odd => 1 pad byte) after "WAVE"
    val extra = Array[Byte]('L', 'I', 'S', 'T', 3, 0, 0, 0, 1, 2, 3, 0)
    val spliced = base.take(12) ++ extra ++ base.drop(12)
    // fix the RIFF size (not validated against buffer, but keep honest)
    val d = AudioCodec.tryDecode(spliced)
    assert(d != null && d.nFrames == 2 && d.samples.toSeq ==
      clip(1, 16, 2).samples.toSeq)
  }

  test("corrupt inputs land on the null path, never throw") {
    val good = AudioCodec.encodeWav(clip(2, 16, 4))
    val cases = Seq[Array[Byte]](
      null,
      Array.emptyByteArray,
      good.take(30),                               // truncated header
      "JUNKJUNKJUNKJUNKJUNKJUNKJUNKJUNKJUNKJUNKJUNK".getBytes,
      { val b = good.clone(); b(20) = 3; b },      // format tag != PCM (IEEE float)
      { val b = good.clone(); b(34) = 24; b },     // 24-bit unsupported
      { val b = good.clone(); b(22) = 6; b },      // 6 channels unsupported
      { val b = good.clone(); b(32) = 5; b },      // lying blockAlign
      { val b = good.clone(); b(40) = 3; b },      // data not whole frames
      { val b = good.clone();                      // data chunk overruns buffer
        b(40) = -1; b(41) = -1; b(42) = -1; b(43) = 0x7f; b },
      { val b = good.clone(); b(16) = 8; b },      // fmt size < 16: fields would
                                                   // read into neighboring chunks
      good.take(36))                               // fmt present, data missing
    cases.foreach { c =>
      assert(AudioCodec.tryDecode(c) == null,
        s"expected null for ${if (c == null) "null" else c.length + " bytes"}")
    }
  }

  test("statsRow: per-channel sums split by interleave position; mono uses ch0") {
    val stereo = AudioCodec.statsRow(AudioCodec.encodeWav(
      DecodedAudio(8000, 2, 16, 3, Array(1, 10, 2, 20, 3, 30))))
    assert(stereo.getLong(4) == 6L && stereo.getLong(5) == 60L &&
      stereo.getLong(6) == 66L)
    val mono = AudioCodec.statsRow(AudioCodec.encodeWav(
      DecodedAudio(8000, 1, 16, 3, Array(-5, 7, -1))))
    assert(mono.getLong(4) == 1L && mono.getLong(5) == 0L &&
      mono.getLong(6) == 13L)
  }

  test("resample: nearest-neighbor frame math, format preserved") {
    // 8 frames stereo -> 4: source frames (k*8)//4 = 0,2,4,6
    val d = clip(2, 16, 8)
    val rs = AudioCodec.tryDecode(AudioCodec.resampleEncoded(
      AudioCodec.encodeWav(d), 4))
    assert(rs.nFrames == 4 && rs.channels == 2 && rs.bitsPerSample == 16)
    val expect = Seq(0, 2, 4, 6).flatMap(f =>
      Seq(d.samples(2 * f), d.samples(2 * f + 1)))
    assert(rs.samples.toSeq == expect)
    // upsample keeps working: 2 -> 5 frames, sources (k*2)//5 = 0,0,0,1,1
    val up = AudioCodec.tryDecode(AudioCodec.resampleEncoded(
      AudioCodec.encodeWav(clip(1, 8, 2)), 5))
    assert(up.nFrames == 5)
    val src = clip(1, 8, 2).samples
    assert(up.samples.toSeq == Seq(src(0), src(0), src(0), src(1), src(1)))
  }

  test("windowEnergies: full windows only, channels summed, corrupt null") {
    // 7 stereo frames, window 3 -> 2 windows; frame 7 dropped
    val d = DecodedAudio(8000, 2, 16, 7,
      Array(1, -1, 2, -2, 3, -3, 4, -4, 5, -5, 6, -6, 100, -100))
    val e = AudioCodec.windowEnergies(AudioCodec.encodeWav(d), 3)
    assert(e.toSeq == Seq(12L, 30L)) // |1..3|*2=12, |4..6|*2=30; 100s dropped
    // shorter than one window -> empty array, not null
    val short = AudioCodec.windowEnergies(
      AudioCodec.encodeWav(DecodedAudio(8000, 1, 16, 2, Array(9, 9))), 3)
    assert(short != null && short.isEmpty)
    assert(AudioCodec.windowEnergies(Array[Byte](1, 2, 3), 3) == null)
  }

  test("testWav sweep: decodable, shape matches the documented formulas") {
    (0L to 24L).foreach { id =>
      val d = AudioCodec.tryDecode(AudioCodec.testWav(id))
      assert(d != null, s"id=$id undecodable")
      assert(d.sampleRate == 8000 && d.channels == (1 + id % 2).toInt &&
        d.bitsPerSample == (if (id % 3 == 0) 8 else 16) &&
        d.nFrames == (1 + id % 9).toInt, s"shape diverged at id=$id")
      d.samples.zipWithIndex.foreach { case (v, i) =>
        val expect =
          if (d.bitsPerSample == 8) ((id * 31 + i) % 256 - 128).toInt
          else ((id * 37 + i.toLong * 101) % 65536 - 32768).toInt
        assert(v == expect, s"sample $i diverged at id=$id")
      }
    }
  }

  test("expressions: codegen'd decode over a DataFrame, corrupt rows null") {
    val df = Seq(0L, 1L, 2L, 3L, 4L, 5L).toDF("id")
      .select(col("id"), Bridge.column(AudioStatsExpr(Bridge.expression(
        Bridge.column(TestWavExpr(Bridge.expression(col("id"))))))).as("st"))
    val rows = df.select(col("id"), col("st.channels"), col("st.bits"),
      col("st.n_frames")).as[(Long, Int, Int, Int)].collect().sortBy(_._1)
    assert(rows.map(r => (r._2, r._3, r._4)).toSeq == Seq(
      (1, 8, 1), (2, 16, 2), (1, 16, 3), (2, 8, 4), (1, 16, 5), (2, 16, 6)))
    // corrupt binary -> null struct, job survives
    val bad = Seq(Array[Byte](1, 2, 3)).toDF("content")
      .select(Bridge.column(AudioStatsExpr(Bridge.expression(col("content")))).as("st"))
    assert(bad.filter(col("st").isNull).count() == 1)
    // resample expression end to end
    val rs = Seq(7L).toDF("id").select(
      Bridge.column(AudioStatsExpr(Bridge.expression(
        Bridge.column(AudioResampleExpr(Bridge.expression(
          Bridge.column(TestWavExpr(Bridge.expression(col("id"))))), 4)))))
        .as("st"))
      .select(col("st.n_frames")).as[Int].collect()
    assert(rs.toSeq == Seq(4))
  }

  test("two energy expressions in one projection compile (no local-name collision)") {
    // With codegen fallback off, a Janino collision between the two
    // generated blocks would throw instead of silently degrading to the
    // interpreted path — this pins the freshName fix in AudioEnergyExpr.
    val prev = spark.conf.getOption("spark.sql.codegen.fallback")
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try {
      // spark.range, NOT Seq(..).toDF: ConvertToLocalRelation would fold a
      // LocalRelation projection interpreted at plan time, skipping codegen
      val wav = Bridge.column(TestWavExpr(Bridge.expression(col("id"))))
      val rows = spark.range(8L, 9L).toDF("id").select(
          Bridge.column(AudioEnergyExpr(Bridge.expression(wav), 1)).as("e1"),
          Bridge.column(AudioEnergyExpr(Bridge.expression(wav), 2)).as("e2"))
        .as[(Seq[Long], Seq[Long])].collect()
      val d = AudioCodec.tryDecode(AudioCodec.testWav(8L))
      assert(rows.head._1.toSeq == AudioCodec.windowEnergies(
        AudioCodec.encodeWav(d), 1).toSeq)
      assert(rows.head._2.toSeq == AudioCodec.windowEnergies(
        AudioCodec.encodeWav(d), 2).toSeq)
    } finally prev match {
      case Some(v) => spark.conf.set("spark.sql.codegen.fallback", v)
      case None    => spark.conf.unset("spark.sql.codegen.fallback")
    }
  }
  test("zero-frame WAV: valid decode, resample takes the null path") {
    // an empty data chunk is a VALID wav (dataLen=0 divides frameBytes);
    // resampling it has no source frame to map, so the expression must
    // yield NULL, not an index crash that kills the stage
    val empty = AudioCodec.encodeWav(DecodedAudio(8000, 1, 16, 0, Array.empty))
    val d = AudioCodec.tryDecode(empty)
    assert(d != null && d.nFrames == 0 && d.samples.isEmpty)
    assert(AudioCodec.resampleEncoded(empty, 4) == null)
    assert(AudioCodec.windowEnergies(empty, 2).isEmpty)
    val viaExpr = Seq(empty).toDF("b")
      .select(Bridge.column(AudioResampleExpr(
        Bridge.expression(col("b")), 4)).as("r"))
      .collect()
    assert(viaExpr.head.isNullAt(0))
  }
}
