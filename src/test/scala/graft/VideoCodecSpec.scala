package graft

import graft.operators.{VideoCodec, TestY4mExpr, VideoFrameSampleExpr, VideoLumaExpr, VideoStatsExpr}
import graft.operators.VideoCodec.DecodedVideo

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.Bridge

import java.nio.charset.StandardCharsets.US_ASCII

class VideoCodecSpec extends SparkTestBase {
  import spark.implicits._

  private def clip(w: Int, h: Int, cs444: Boolean, nFrames: Int): DecodedVideo = {
    val ySize = w * h
    val cSize = if (cs444) ySize else (w / 2) * (h / 2)
    val fb = ySize + 2 * cSize
    DecodedVideo(w, h, cs444, nFrames,
      Array.tabulate(nFrames * fb)(i => ((i * 131 + 7) % 256).toByte))
  }

  test("Y4M round trip across both plane layouts") {
    for (cs444 <- Seq(true, false); (w, h) <- Seq((4, 2), (6, 4))) {
      val d = clip(w, h, cs444, 3)
      val back = VideoCodec.tryDecode(VideoCodec.encodeY4m(d))
      assert(back != null, s"decode failed for cs444=$cs444 ${w}x$h")
      assert(back.width == w && back.height == h &&
        back.cs444 == cs444 && back.nFrames == 3)
      assert(back.data.toSeq == d.data.toSeq,
        s"planes diverged for cs444=$cs444 ${w}x$h")
    }
  }

  test("header leniency and strictness") {
    val d = clip(4, 2, cs444 = false, nFrames = 1)
    // unknown-but-legal parameters (F/I/A/X) are ignored; C absent
    // defaults to 4:2:0 per the spec
    val body = VideoCodec.encodeY4m(d)
    val payload = body.drop(new String(body.takeWhile(_ != '\n'), US_ASCII).length + 1)
    def withHeader(hdr: String): Array[Byte] =
      hdr.getBytes(US_ASCII) ++ payload
    val lenient = VideoCodec.tryDecode(
      withHeader("YUV4MPEG2 W4 H2 F30000:1001 It A0:0 Xcustom\n"))
    assert(lenient != null && !lenient.cs444 && lenient.nFrames == 1)
    // C420 siting variants share the plane layout
    for (v <- Seq("C420jpeg", "C420mpeg2", "C420paldv")) {
      val got = VideoCodec.tryDecode(withHeader(s"YUV4MPEG2 W4 H2 $v\n"))
      assert(got != null && !got.cs444, s"variant $v rejected")
    }
    // strict rejects: bad magic, unsupported colorspace, odd 420 dims,
    // zero/huge dims, truncated payload, missing FRAME marker
    assert(VideoCodec.tryDecode(withHeader("YUV4MPEG3 W4 H2\n")) == null)
    assert(VideoCodec.tryDecode(withHeader("YUV4MPEG2 W4 H2 C422\n")) == null)
    assert(VideoCodec.tryDecode(withHeader("YUV4MPEG2 W3 H2 C420\n")) == null)
    assert(VideoCodec.tryDecode(withHeader("YUV4MPEG2 W0 H2\n")) == null)
    assert(VideoCodec.tryDecode(withHeader("YUV4MPEG2 W999999999 H2\n")) == null)
    assert(VideoCodec.tryDecode(body.dropRight(1)) == null)
    assert(VideoCodec.tryDecode(
      withHeader("YUV4MPEG2 W4 H2 C420\n").patch(21, "FRAMX".getBytes(US_ASCII), 5)) == null)
    assert(VideoCodec.tryDecode(null) == null)
    assert(VideoCodec.tryDecode(Array[Byte](1, 2, 3)) == null)
  }

  test("testY4m sweep: decodable, shape and bytes match the documented formulas") {
    (0L to 23L).foreach { id =>
      val d = VideoCodec.tryDecode(VideoCodec.testY4m(id))
      assert(d != null, s"id=$id undecodable")
      assert(d.width == (4 + 2 * (id % 3)).toInt &&
        d.height == (2 + 2 * (id % 2)).toInt &&
        d.cs444 == (id % 4 < 2) && d.nFrames == (1 + id % 5).toInt,
        s"shape diverged at id=$id")
      val ySize = d.ySize; val cSize = d.cSize; val fb = d.frameBytes
      d.data.zipWithIndex.foreach { case (b, j) =>
        val f = j / fb; val r = j % fb
        val p = if (r < ySize) 0 else if (r < ySize + cSize) 1 else 2
        val i = if (p == 0) r else if (p == 1) r - ySize else r - ySize - cSize
        val expect = ((id * 13 + f * 7 + p * 3 + i) % 256).toInt
        assert((b & 0xff) == expect, s"byte $j diverged at id=$id")
      }
    }
  }

  test("frame sampling: NN selection math, both up- and down-sample") {
    val d = clip(4, 2, cs444 = true, nFrames = 5)
    val enc = VideoCodec.encodeY4m(d)
    // downsample 5 -> 2: sources (0*5)/2=0, (1*5)/2=2
    val down = VideoCodec.tryDecode(VideoCodec.frameSampleEncoded(enc, 2))
    assert(down.nFrames == 2)
    val fb = d.frameBytes
    assert(down.data.slice(0, fb).toSeq == d.data.slice(0, fb).toSeq)
    assert(down.data.slice(fb, 2 * fb).toSeq ==
      d.data.slice(2 * fb, 3 * fb).toSeq)
    // upsample 1 -> 3: all three outputs replay frame 0
    val one = clip(4, 2, cs444 = false, nFrames = 1)
    val up = VideoCodec.tryDecode(
      VideoCodec.frameSampleEncoded(VideoCodec.encodeY4m(one), 3))
    assert(up.nFrames == 3)
    (0 until 3).foreach { k =>
      assert(up.data.slice(k * one.frameBytes, (k + 1) * one.frameBytes).toSeq ==
        one.data.toSeq, s"upsampled frame $k diverged")
    }
    assert(VideoCodec.frameSampleEncoded(Array[Byte](9, 9), 2) == null)
  }

  test("frameLumaSums: per-frame unsigned Y sums, corrupt null") {
    val d = clip(4, 2, cs444 = false, nFrames = 3)
    val lumas = VideoCodec.frameLumaSums(VideoCodec.encodeY4m(d))
    val expect = (0 until 3).map { f =>
      (0 until d.ySize).map(i => d.data(f * d.frameBytes + i) & 0xff).sum.toLong
    }
    assert(lumas.toSeq == expect)
    assert(VideoCodec.frameLumaSums(Array[Byte](0)) == null)
  }

  test("fuzz: mutated streams never throw and never lie about size") {
    val rnd = new scala.util.Random(4242)
    val base = VideoCodec.testY4m(7L)
    (0 until 300).foreach { _ =>
      val mutated = base.clone()
      (0 until 1 + rnd.nextInt(4)).foreach { _ =>
        mutated(rnd.nextInt(mutated.length)) = rnd.nextInt(256).toByte
      }
      val d = VideoCodec.tryDecode(mutated) // must not throw
      if (d != null) {
        assert(d.data.length == d.nFrames * d.frameBytes,
          "decoded payload disagrees with its own geometry")
        assert(d.width > 0 && d.height > 0 && d.nFrames > 0)
      }
    }
    // truncations at every boundary class
    (0 until 100).foreach { _ =>
      val cut = rnd.nextInt(base.length)
      VideoCodec.tryDecode(base.take(cut)) // must not throw
    }
  }

  test("expressions: codegen'd decode + frame sample over a DataFrame, corrupt rows null") {
    val df = spark.range(0L, 6L).toDF("id")
      .select(col("id"), Bridge.column(VideoStatsExpr(Bridge.expression(
        Bridge.column(TestY4mExpr(Bridge.expression(col("id"))))))).as("st"))
    val rows = df.select(col("id"), col("st.width"), col("st.colorspace"),
        col("st.n_frames")).as[(Long, Int, Int, Int)].collect().sortBy(_._1)
    assert(rows.map(r => (r._2, r._3, r._4)).toSeq == Seq(
      (4, 444, 1), (6, 444, 2), (8, 420, 3), (4, 420, 4), (6, 444, 5), (8, 444, 1)))
    val bad = Seq(Array[Byte](1, 2, 3)).toDF("content")
      .select(Bridge.column(VideoStatsExpr(Bridge.expression(col("content")))).as("st"))
    assert(bad.filter(col("st").isNull).count() == 1)
    // frame-sample + luma end to end: id=3 has nf=4, sampled to 2
    // frames with sources (0*4)/2=0 and (1*4)/2=2
    val lm = spark.range(3L, 4L).toDF("id").select(
      Bridge.column(VideoLumaExpr(Bridge.expression(
        Bridge.column(VideoFrameSampleExpr(Bridge.expression(
          Bridge.column(TestY4mExpr(Bridge.expression(col("id"))))), 2)))))
        .as("lumas")).as[Seq[Long]].collect().head
    val full = VideoCodec.frameLumaSums(VideoCodec.testY4m(3L))
    assert(lm.toSeq == Seq(full(0), full(2)))
  }
}
