package graft

import graft.operators.{ImageCodec, ImageResizeExpr, ImageStatsExpr, Multimodal, TestImageExpr}
import graft.operators.ImageCodec.Decoded

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.Bridge

class ImageCodecSpec extends SparkTestBase {
  import spark.implicits._

  private def rgb(n: Int): Array[Byte] =
    Array.tabulate(n)(i => ((i * 7 + 3) % 256).toByte)

  test("PPM/BMP round trip: same logical image, identical decoded pixels") {
    // width 5 => BMP rows need 1 pad byte (3*5=15 -> 16): the padding
    // path is exercised, not just the aligned case
    val d = Decoded(5, 3, 3, rgb(45))
    val viaPpm = ImageCodec.tryDecode(ImageCodec.encodeNetpbm(d))
    val viaBmp = ImageCodec.tryDecode(ImageCodec.encodeBmp(d))
    assert(viaPpm.width == 5 && viaPpm.height == 3 && viaPpm.channels == 3)
    assert(viaBmp.width == 5 && viaBmp.height == 3 && viaBmp.channels == 3)
    assert(java.util.Arrays.equals(viaPpm.pixels, d.pixels))
    assert(java.util.Arrays.equals(viaBmp.pixels, d.pixels))
  }

  test("PGM grayscale: P5 round trip, stats put gray sum in sum_r") {
    val g = Decoded(4, 2, 1, Array.tabulate(8)(i => (i * 30).toByte))
    val back = ImageCodec.tryDecode(ImageCodec.encodeNetpbm(g))
    assert(back.channels == 1 && java.util.Arrays.equals(back.pixels, g.pixels))
    val st = ImageCodec.statsRow(ImageCodec.encodeNetpbm(g))
    assert(st.getInt(2) == 1)
    assert(st.getLong(3) == (0 until 8).map(i => (i * 30) & 0xff).sum.toLong)
    assert(st.getLong(4) == 0L && st.getLong(5) == 0L)
  }

  test("netpbm header edge cases: comments and multi-digit dims") {
    val px = rgb(6)
    val withComment = ("P6\n# a comment line\n2 1\n# another\n255\n"
      .getBytes("US-ASCII") ++ px)
    val d = ImageCodec.tryDecode(withComment)
    assert(d != null && d.width == 2 && d.height == 1)
    assert(java.util.Arrays.equals(d.pixels, px))
  }

  test("undecodable bytes: null, not an exception") {
    assert(ImageCodec.tryDecode(null) == null)
    assert(ImageCodec.tryDecode(Array[Byte]()) == null)
    assert(ImageCodec.tryDecode("not an image at all".getBytes) == null)
    assert(ImageCodec.tryDecode("P6\n2 1\n255\nXY".getBytes) == null) // truncated
    // BMP with an unsupported bpp (8) must refuse, not misparse
    val bmp = ImageCodec.encodeBmp(Decoded(2, 2, 3, rgb(12)))
    bmp(28) = 8
    assert(ImageCodec.tryDecode(bmp) == null)
    // zeroed pixel-offset field (common corruption): header bytes must
    // not silently decode as pixels
    val bmp2 = ImageCodec.encodeBmp(Decoded(2, 2, 3, rgb(12)))
    bmp2(10) = 0
    assert(ImageCodec.tryDecode(bmp2) == null)
  }

  test("PNG round trip: lossless for RGB and grayscale, canonical layout") {
    val d = Decoded(5, 3, 3, rgb(45))
    val png = ImageCodec.encodePng(d)
    assert((png(0) & 0xff) == 0x89 && png(1) == 'P') // real PNG signature
    val back = ImageCodec.tryDecode(png)
    assert(back.width == 5 && back.height == 3 && back.channels == 3)
    assert(java.util.Arrays.equals(back.pixels, d.pixels))
    // grayscale survives as 1 channel (no silent RGB promotion)
    val g = Decoded(4, 2, 1, Array.tabulate(8)(i => (i * 30).toByte))
    val gBack = ImageCodec.tryDecode(ImageCodec.encodePng(g))
    assert(gBack.channels == 1 && java.util.Arrays.equals(gBack.pixels, g.pixels))
    // the SAME logical image via PPM and PNG decodes to identical bytes
    assert(java.util.Arrays.equals(
      ImageCodec.tryDecode(ImageCodec.encodeNetpbm(d)).pixels, back.pixels))
  }

  test("PNG: corrupt payload and unsupported variants null out") {
    val png = ImageCodec.encodePng(Decoded(5, 3, 3, rgb(45)))
    // flip a byte inside the DEFLATE stream: CRC check must refuse
    val corrupt = png.clone(); corrupt(png.length / 2) = (corrupt(png.length / 2) ^ 0x5a).toByte
    assert(ImageCodec.tryDecode(corrupt) == null)
    // truncated PNG
    assert(ImageCodec.tryDecode(png.take(png.length / 2)) == null)
    // alpha is out of scope: must refuse, not premultiply silently
    val argb = new java.awt.image.BufferedImage(
      2, 2, java.awt.image.BufferedImage.TYPE_INT_ARGB)
    argb.setRGB(0, 0, 0x80FF0000)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(argb, "png", bos)
    assert(ImageCodec.tryDecode(bos.toByteArray) == null)
  }

  test("testImagePng carries the same pixels as testImage (shared oracle)") {
    (0L to 12L).foreach { id =>
      val raster = ImageCodec.tryDecode(ImageCodec.testImage(id))
      val png = ImageCodec.tryDecode(ImageCodec.testImagePng(id))
      assert(png.width == raster.width && png.height == raster.height)
      assert(java.util.Arrays.equals(png.pixels, raster.pixels), s"id=$id")
    }
  }

  test("dHash: brute-force replay, k-times-upscale invariance, gradient sensitivity") {
    // brute replay of one hash against an independent scalar recompute
    def brute(id: Long): (Long, Long) = {
      val w = (1 + id % 7).toInt; val h = (1 + id % 5).toInt
      def px(i: Int) = java.lang.Math.floorMod(id * 31 + i, 256L).toInt
      def gray(x: Int, y: Int) = {
        val sx = x * w / 9; val sy = y * h / 8
        (0 until 3).map(c => px(3 * (sy * w + sx) + c)).sum
      }
      var hi = 0L; var lo = 0L
      for (y <- 0 until 8; x <- 0 until 8 if gray(x + 1, y) > gray(x, y)) {
        val b = y * 8 + x
        if (b < 32) lo |= 1L << b else hi |= 1L << (b - 32)
      }
      (hi, lo)
    }
    for (id <- Seq(0L, 7L, 13L, 123L)) {
      val row = ImageCodec.dHashRow(ImageCodec.testImage(id))
      assert((row.getLong(0), row.getLong(1)) == brute(id), s"id $id")
    }
    // NN index math composes exactly under integer upscale:
    // floor(floor(k*a/9)/k) == floor(a/9) => identical hash
    for (id <- Seq(3L, 42L); k <- Seq(2, 3)) {
      val img = ImageCodec.testImage(id)
      val d = ImageCodec.tryDecode(img)
      val up = ImageCodec.resizeEncoded(img, d.width * k, d.height * k)
      assert(java.util.Arrays.equals(
        Array(ImageCodec.dHashRow(img).getLong(0),
              ImageCodec.dHashRow(img).getLong(1)),
        Array(ImageCodec.dHashRow(up).getLong(0),
              ImageCodec.dHashRow(up).getLong(1))), s"id $id k $k")
    }
    // a genuinely different gradient structure changes the hash
    val flat = Decoded(8, 8, 1, Array.fill(64)(100.toByte))
    val ramp = Decoded(8, 8, 1, Array.tabulate(64)(i => (i % 8 * 30).toByte))
    val hFlat = ImageCodec.dHashRow(ImageCodec.encodeNetpbm(flat))
    val hRamp = ImageCodec.dHashRow(ImageCodec.encodeNetpbm(ramp))
    assert(hFlat.getLong(0) == 0L && hFlat.getLong(1) == 0L,
      "flat image must have no gradient bits")
    assert((hRamp.getLong(0), hRamp.getLong(1)) !=
      (hFlat.getLong(0), hFlat.getLong(1)))
    // undecodable bytes -> null
    assert(ImageCodec.dHashRow("not an image".getBytes) == null)
  }

  test("imageNearDupPairs: recompressed copy pairs at hamming 0, distant images filtered") {
    val base = ImageCodec.testImage(11L)
    val flat = ImageCodec.encodeNetpbm(
      Decoded(8, 8, 1, Array.fill(64)(100.toByte))) // hash (0, 0)
    // precondition: the base image's hash is genuinely far from flat's
    val h = ImageCodec.dHashRow(base)
    val baseDist = java.lang.Long.bitCount(h.getLong(0)) +
      java.lang.Long.bitCount(h.getLong(1))
    assert(baseDist > 3, s"crafted images too close: $baseDist")
    val imgs = Seq(
      (1L, base),
      (2L, ImageCodec.testImagePng(11L)),          // same pixels, PNG
      (3L, flat),
      (4L, Array[Byte](1, 2, 3))                   // undecodable: skipped
    ).toDF("id", "img")
    val pairs = Multimodal.imageNearDupPairs(imgs, "id", "img", maxHamming = 3)
      .as[(Long, Long, Int)].collect().toSet
    assert(pairs == Set((1L, 2L, 0)), s"got $pairs")
  }

  test("corrupt headers with overflowing dims land on the null path") {
    // netpbm dims whose product overflows Int: 100000*100000*3 wraps
    // positive-small and would pass a naive truncation check
    val evil = "P6\n100000 100000\n255\n".getBytes("US-ASCII") ++ rgb(16)
    assert(ImageCodec.tryDecode(evil) == null)
    // a single header integer that overflows Int on its own
    val evil2 = "P6\n99999999999999 1\n255\n".getBytes("US-ASCII") ++ rgb(16)
    assert(ImageCodec.tryDecode(evil2) == null)
    // BMP with height == Int.MinValue: abs() stays negative — must refuse
    val bmp = ImageCodec.encodeBmp(Decoded(2, 2, 3, rgb(12)))
    bmp(22) = 0; bmp(23) = 0; bmp(24) = 0; bmp(25) = 0x80.toByte
    assert(ImageCodec.tryDecode(bmp) == null)
    // BMP with a width that overflows rowSize math in Int
    val bmp2 = ImageCodec.encodeBmp(Decoded(2, 2, 3, rgb(12)))
    bmp2(18) = 0xff.toByte; bmp2(19) = 0xff.toByte
    bmp2(20) = 0xff.toByte; bmp2(21) = 0x7f.toByte
    assert(ImageCodec.tryDecode(bmp2) == null)
  }

  test("real resize: nearest-neighbor on decoded pixels, format preserved") {
    // 2x2 distinct-color image scaled to 4x4: each source pixel becomes
    // a 2x2 block (exact NN semantics, not byte resampling)
    val px = Array[Byte](
      10, 11, 12,  20, 21, 22,
      30, 31, 32,  40, 41, 42)
    val src = ImageCodec.encodeNetpbm(Decoded(2, 2, 3, px))
    val up = ImageCodec.tryDecode(ImageCodec.resizeEncoded(src, 4, 4))
    assert(up.width == 4 && up.height == 4)
    def at(x: Int, y: Int): Seq[Byte] =
      up.pixels.slice(3 * (y * 4 + x), 3 * (y * 4 + x) + 3).toSeq
    assert(at(0, 0) == Seq[Byte](10, 11, 12) && at(1, 1) == Seq[Byte](10, 11, 12))
    assert(at(2, 0) == Seq[Byte](20, 21, 22) && at(3, 3) == Seq[Byte](40, 41, 42))
    // BMP in => BMP out
    val bmpOut = ImageCodec.resizeEncoded(
      ImageCodec.encodeBmp(Decoded(2, 2, 3, px)), 3, 3)
    assert(bmpOut(0) == 'B' && bmpOut(1) == 'M')
    assert(ImageCodec.tryDecode(bmpOut).width == 3)
    // PNG in => PNG out
    val pngOut = ImageCodec.resizeEncoded(
      ImageCodec.encodePng(Decoded(2, 2, 3, px)), 3, 3)
    assert((pngOut(0) & 0xff) == 0x89)
    assert(ImageCodec.tryDecode(pngOut).width == 3)
  }

  test("expressions: decode stats + resize are codegen'd, nulls propagate") {
    val df = Seq(Some(2L), Some(3L), None).toDF("id")
    val img = Bridge.column(TestImageExpr(Bridge.expression(col("id"))))
    val out = df.select(col("id"),
        Bridge.column(ImageStatsExpr(Bridge.expression(img))).as("st"),
        Bridge.column(ImageResizeExpr(Bridge.expression(img), 2, 2)).as("rz"))
      .orderBy(col("id").asc_nulls_last)
    val rows = out.collect()
    // null id => null all the way through (no NPE in codegen)
    assert(rows(2).isNullAt(1) && rows(2).isNullAt(2))
    // id=2 (PPM): w=3,h=3; id=3 (BMP): w=4,h=4 — matches the formula
    val st2 = rows(0).getStruct(1)
    assert(st2.getInt(0) == 3 && st2.getInt(1) == 3 && st2.getInt(2) == 3)
    val st3 = rows(1).getStruct(1)
    assert(st3.getInt(0) == 4 && st3.getInt(1) == 4)
    // resized output is itself decodable at the requested dims
    val rz = ImageCodec.tryDecode(rows(0).getAs[Array[Byte]](2))
    assert(rz.width == 2 && rz.height == 2)
    // undecodable content => null stats (corrupt blob skips, job lives)
    val junk = Seq("junk").toDF("s")
      .select(Bridge.column(ImageStatsExpr(
        Bridge.expression(col("s").cast("binary")))).as("st"))
    assert(junk.first().isNullAt(0))
    // whole-stage codegen keeps the projection UDF-free
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("ScalaUDF"), plan)
  }

  test("Multimodal API: decodedStats and resizedImage wire the real codec") {
    val df = Seq((0L, 0L), (5L, 5L)).toDF("id", "seed")
    val assets = Multimodal.asAssets(df, "id",
      Bridge.column(TestImageExpr(Bridge.expression(col("seed")))), "image/x-test")
    val st = Multimodal.decodedStats(assets).orderBy("asset_id").collect()
    // id=0: w=1,h=1, pixels 0,1,2 => sums (0,1,2)
    val s0 = st(0).getAs[org.apache.spark.sql.Row]("image_stats")
    assert(s0.getInt(0) == 1 && s0.getLong(3) == 0L &&
      s0.getLong(4) == 1L && s0.getLong(5) == 2L)
    val rz = Multimodal.resizedImage(assets, 2, 3).orderBy("asset_id").collect()
    val meta = rz(0).getAs[org.apache.spark.sql.Row]("meta")
    assert(meta.getInt(1) == 2 && meta.getInt(2) == 3)
    val dec = ImageCodec.tryDecode(rz(0).getAs[Array[Byte]]("content"))
    assert(dec.width == 2 && dec.height == 3)
  }
  test("sub-8-bit gray PNG: values scale exactly, never raw {0,1} samples") {
    // a hand-built bit-depth-1 GRAYSCALE png (colour type 0). The JDK
    // reader represents it with an IndexColorModel (3 components of 8
    // bits), so decode runs the palette/getRGB path and yields exactly
    // scaled {0,255} values — NOT the raw raster samples {0,1}, which
    // would be plausible-wrong stats. The 1-component raster branch is
    // additionally guarded to 8-bit samples (componentSize != 8 nulls
    // out) in case a reader ever hands back a sub-8-bit gray raster.
    import java.util.zip.{CRC32, Deflater}
    def chunk(typ: String, data: Array[Byte]): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream()
      val len = data.length
      out.write(Array[Byte]((len >>> 24).toByte, (len >>> 16).toByte,
        (len >>> 8).toByte, len.toByte))
      val tb = typ.getBytes("US-ASCII")
      out.write(tb); out.write(data)
      val crc = new CRC32(); crc.update(tb); crc.update(data)
      val c = crc.getValue
      out.write(Array[Byte]((c >>> 24).toByte, (c >>> 16).toByte,
        (c >>> 8).toByte, c.toByte))
      out.toByteArray
    }
    val sig = Array[Byte](0x89.toByte, 0x50, 0x4E, 0x47, 0x0D, 0x0A, 0x1A, 0x0A)
    val ihdr = Array[Byte](0, 0, 0, 2, 0, 0, 0, 2, 1, 0, 0, 0, 0) // 2x2 depth1 gray
    val raw = Array[Byte](0, 0x80.toByte, 0, 0x40) // per row: filter0 + packed bits
    val defl = new Deflater(); defl.setInput(raw); defl.finish()
    val buf = new Array[Byte](64); val n = defl.deflate(buf)
    val png = sig ++ chunk("IHDR", ihdr) ++ chunk("IDAT", buf.take(n)) ++
      chunk("IEND", Array.empty)
    val d = ImageCodec.tryDecode(png)
    assert(d != null && d.width == 2 && d.height == 2 && d.channels == 3)
    // bits (0,0)=1,(1,0)=0,(0,1)=0,(1,1)=1 => white/black/black/white
    val px = d.pixels.map(_ & 0xff).toSeq
    assert(px == Seq(255, 255, 255, 0, 0, 0, 0, 0, 0, 255, 255, 255), px)
  }
}
