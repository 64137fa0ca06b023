package graft.operators

import org.apache.spark.sql.catalyst.expressions.GenericInternalRow

/** Real raster-image codec for the multimodal tier, byte-exact formats
  * only: PPM (P6, RGB), PGM (P5, grayscale), 24-bit uncompressed
  * (BI_RGB) BMP — full, honest implementations of their specs (netpbm
  * binary headers with whitespace/comment handling; BMP 54-byte header
  * layout, bottom-up row order, BGR channel order, 4-byte row padding)
  * — and PNG via the JDK's built-in `javax.imageio` reader (PNG is
  * LOSSLESS, so decoded pixel values are exact by spec — deterministic
  * across executors on the same JDK). Lossy codecs (JPEG, audio,
  * video) stay outside: JPEG decode is NOT bit-deterministic across
  * decoder implementations (IDCT rounding is implementation-defined),
  * so it cannot sit behind an exact oracle gate; the per-partition
  * batch seam in [[Multimodal.mapBatchesStub]] is where such a library
  * would be initialized once per partition.
  *
  * All decoders return pixels as row-major, top-down, interleaved RGB
  * (3 channels) or gray (1 channel) — a canonical layout, so the same
  * logical image encoded as PPM, BMP or PNG decodes to identical bytes
  * (spec-pinned in ImageCodecSpec).
  */
object ImageCodec {

  // ImageIO's default stream cache spills to TEMP FILES per decode —
  // per-row disk I/O in a hot projection. Memory-cache the (small)
  // image streams instead. Global JVM flag; set once.
  javax.imageio.ImageIO.setUseCache(false)

  /** Canonical decoded form: top-down row-major, interleaved,
    * channels in (1, 3). */
  final case class Decoded(width: Int, height: Int, channels: Int,
                           pixels: Array[Byte])

  /** Decode PPM/PGM/BMP/PNG; null when the bytes are not a supported
    * image (callers surface that as a NULL row — at corpus scale a
    * corrupt blob must skip, not kill the job; count nulls to monitor). */
  def tryDecode(bytes: Array[Byte]): Decoded = {
    if (bytes == null || bytes.length < 2) return null
    try {
      if (bytes(0) == 'P' && (bytes(1) == '5' || bytes(1) == '6'))
        decodeNetpbm(bytes)
      else if (bytes(0) == 'B' && bytes(1) == 'M') decodeBmp(bytes)
      else if ((bytes(0) & 0xff) == 0x89 && bytes(1) == 'P') decodePng(bytes)
      else null
    } catch { case _: Exception => null }
  }

  // decoded pixel buffers are Int-indexed Java arrays; a corrupt header
  // declaring huge dims must land on the null path, not overflow Int
  // and pass a too-small truncation check with plausible-wrong stats
  private def checkedPixelCount(w: Int, h: Int, channels: Int): Int = {
    val n = channels.toLong * w * h
    if (w <= 0 || h <= 0 || n > Int.MaxValue)
      throw new IllegalArgumentException("image dims overflow")
    n.toInt
  }

  // ---- netpbm (PPM P6 / PGM P5) ---------------------------------------

  /** Header token scan: skips whitespace and '#' comments-to-newline,
    * per the netpbm spec. */
  private def decodeNetpbm(b: Array[Byte]): Decoded = {
    val channels = if (b(1) == '6') 3 else 1
    var pos = 2
    def nextInt(): Int = {
      // skip whitespace / comments
      var inComment = false
      while (pos < b.length &&
             (inComment || b(pos).toChar.isWhitespace || b(pos) == '#')) {
        if (b(pos) == '#') inComment = true
        else if (b(pos) == '\n') inComment = false
        pos += 1
      }
      var v = 0
      var any = false
      while (pos < b.length && b(pos) >= '0' && b(pos) <= '9') {
        v = v * 10 + (b(pos) - '0'); pos += 1; any = true
        // a header integer that itself overflows Int would wrap into a
        // plausible small value; no real dim/maxval exceeds 10^8
        if (v > 100000000)
          throw new IllegalArgumentException("netpbm header value overflow")
      }
      if (!any) throw new IllegalArgumentException("bad netpbm header")
      v
    }
    val w = nextInt(); val h = nextInt(); val maxval = nextInt()
    if (w <= 0 || h <= 0 || maxval <= 0 || maxval > 255)
      throw new IllegalArgumentException("unsupported netpbm dims/maxval")
    pos += 1 // exactly ONE whitespace byte separates header and raster
    val n = checkedPixelCount(w, h, channels)
    if (b.length - pos < n)
      throw new IllegalArgumentException("truncated netpbm raster")
    Decoded(w, h, channels, java.util.Arrays.copyOfRange(b, pos, pos + n))
  }

  /** Encode canonical pixels as P6 (3-channel) / P5 (1-channel). */
  def encodeNetpbm(d: Decoded): Array[Byte] = {
    require(d.channels == 1 || d.channels == 3, "channels must be 1 or 3")
    val magic = if (d.channels == 3) "P6" else "P5"
    val header = s"$magic\n${d.width} ${d.height}\n255\n"
      .getBytes(java.nio.charset.StandardCharsets.US_ASCII)
    val out = new Array[Byte](header.length + d.pixels.length)
    System.arraycopy(header, 0, out, 0, header.length)
    System.arraycopy(d.pixels, 0, out, header.length, d.pixels.length)
    out
  }

  // ---- BMP (24bpp BI_RGB) ---------------------------------------------

  private def le16(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8)
  private def le32(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8) |
    ((b(off + 2) & 0xff) << 16) | ((b(off + 3) & 0xff) << 24)
  private def putLe16(b: Array[Byte], off: Int, v: Int): Unit = {
    b(off) = v.toByte; b(off + 1) = (v >>> 8).toByte
  }
  private def putLe32(b: Array[Byte], off: Int, v: Int): Unit = {
    b(off) = v.toByte; b(off + 1) = (v >>> 8).toByte
    b(off + 2) = (v >>> 16).toByte; b(off + 3) = (v >>> 24).toByte
  }

  /** 24-bit BI_RGB only; positive height = bottom-up rows (the common
    * case), negative = top-down. Rows padded to 4-byte boundaries;
    * stored channel order is BGR — both undone into the canonical
    * top-down RGB layout. */
  private def decodeBmp(b: Array[Byte]): Decoded = {
    if (b.length < 54) throw new IllegalArgumentException("short BMP")
    val pixelOffset = le32(b, 10)
    val w = le32(b, 18)
    val rawH = le32(b, 22)
    // math.abs(Int.MinValue) is still negative: it would pass the h == 0
    // check below and return an empty-pixel Decoded with negative height
    if (rawH == Int.MinValue)
      throw new IllegalArgumentException("bad BMP height")
    val bottomUp = rawH > 0
    val h = math.abs(rawH)
    val bpp = le16(b, 28)
    val compression = le32(b, 30)
    if (w <= 0 || h == 0 || bpp != 24 || compression != 0)
      throw new IllegalArgumentException("unsupported BMP variant")
    // a corrupt offset pointing inside (or before) the 54-byte header
    // would silently decode header bytes as pixels — refuse, so the
    // caller gets the promised NULL instead of plausible wrong stats
    if (pixelOffset < 54 || pixelOffset > b.length)
      throw new IllegalArgumentException("bad BMP pixel offset")
    // reject Int-overflowing pixel counts BEFORE any stride math: with
    // 3*w*h <= Int.MaxValue established, rowSize*h below cannot
    // overflow Long either
    val n = checkedPixelCount(w, h, 3)
    // row stride in Long: 3*w alone overflows Int for w > ~715M, which
    // would wrap rowSize negative and defeat the truncation check
    val rowSize = ((3L * w + 3) / 4) * 4
    if (b.length - pixelOffset < rowSize * h)
      throw new IllegalArgumentException("truncated BMP raster")
    val stride = rowSize.toInt // rowSize * h <= b.length: fits Int now
    val px = new Array[Byte](n)
    var y = 0
    while (y < h) {
      val srcRow = pixelOffset + stride * (if (bottomUp) h - 1 - y else y)
      var x = 0
      while (x < w) {
        val s = srcRow + 3 * x
        val t = 3 * (y * w + x)
        px(t) = b(s + 2)     // R
        px(t + 1) = b(s + 1) // G
        px(t + 2) = b(s)     // B
        x += 1
      }
      y += 1
    }
    Decoded(w, h, 3, px)
  }

  /** Encode canonical 3-channel pixels as a 24bpp BI_RGB bottom-up BMP
    * (grayscale input is replicated to RGB — BMP has no 8-bit
    * palette-free form). */
  def encodeBmp(d: Decoded): Array[Byte] = {
    val (w, h) = (d.width, d.height)
    val rowSize = ((3 * w + 3) / 4) * 4
    val size = 54 + rowSize * h
    val out = new Array[Byte](size)
    out(0) = 'B'; out(1) = 'M'
    putLe32(out, 2, size)
    putLe32(out, 10, 54)
    putLe32(out, 14, 40)       // BITMAPINFOHEADER
    putLe32(out, 18, w)
    putLe32(out, 22, h)        // positive => bottom-up
    putLe16(out, 26, 1)        // planes
    putLe16(out, 28, 24)       // bpp
    putLe32(out, 30, 0)        // BI_RGB
    putLe32(out, 34, rowSize * h)
    var y = 0
    while (y < h) {
      val dstRow = 54 + rowSize * (h - 1 - y)
      var x = 0
      while (x < w) {
        val t = dstRow + 3 * x
        if (d.channels == 3) {
          val s = 3 * (y * w + x)
          out(t) = d.pixels(s + 2); out(t + 1) = d.pixels(s + 1)
          out(t + 2) = d.pixels(s)
        } else {
          val g = d.pixels(y * w + x)
          out(t) = g; out(t + 1) = g; out(t + 2) = g
        }
        x += 1
      }
      y += 1
    }
    out
  }

  // ---- PNG (javax.imageio — JDK built-in, no new dependency) ----------

  /** PNG decode via the JDK reader. PNG is lossless, so the recovered
    * samples are exact by spec. Scope: 8-bit-per-sample images (the
    * training-data norm); 16-bit PNGs are rejected to the null path —
    * truncating them would produce plausible-wrong stats. Alpha is
    * rejected too (the canonical layout has no alpha plane and
    * premultiplication would change the pixel bytes). */
  private def decodePng(b: Array[Byte]): Decoded = {
    // parse the IHDR dims BEFORE handing the stream to ImageIO: its
    // read() allocates the full BufferedImage for whatever dims the
    // header declares, so a corrupt/hostile width would raise
    // OutOfMemoryError — an Error, not Exception — past the null-path
    // catch and kill the executor. IHDR is by spec the first chunk:
    // width/height are big-endian u32 at offsets 16/20. The pixel cap
    // matches checkedPixelCount's decoded-buffer bound.
    if (b.length < 24) throw new IllegalArgumentException("truncated PNG")
    def beInt(off: Int): Long =
      ((b(off) & 0xffL) << 24) | ((b(off + 1) & 0xffL) << 16) |
      ((b(off + 2) & 0xffL) << 8) | (b(off + 3) & 0xffL)
    val wHdr = beInt(16); val hHdr = beInt(20)
    // per-dim bound first (the netpbm parser's 1e8) so the product
    // below cannot itself overflow Long for u32 dims
    if (wHdr <= 0 || hHdr <= 0 || wHdr > 100000000L || hHdr > 100000000L ||
        3L * wHdr * hHdr > Int.MaxValue)
      throw new IllegalArgumentException("PNG header dims overflow")
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(b))
    if (img == null) throw new IllegalArgumentException("undecodable PNG")
    val w = img.getWidth; val h = img.getHeight
    val cm = img.getColorModel
    // exact 8-bit samples only: raster.getSample returns RAW unscaled
    // values, so a 1-bit PNG would yield {0,1} instead of {0,255} —
    // plausible-wrong stats. Sub-8-bit takes the null path like >8-bit.
    if (cm.hasAlpha || cm.getComponentSize.exists(_ != 8))
      throw new IllegalArgumentException("unsupported PNG variant")
    if (cm.getNumComponents == 1) {
      val n = checkedPixelCount(w, h, 1)
      val px = new Array[Byte](n)
      val raster = img.getRaster
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          px(y * w + x) = raster.getSample(x, y, 0).toByte
          x += 1
        }
        y += 1
      }
      Decoded(w, h, 1, px)
    } else {
      val n = checkedPixelCount(w, h, 3)
      val px = new Array[Byte](n)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val rgb = img.getRGB(x, y) // sRGB, exact for 8-bit samples
          val t = 3 * (y * w + x)
          px(t) = (rgb >>> 16).toByte
          px(t + 1) = (rgb >>> 8).toByte
          px(t + 2) = rgb.toByte
          x += 1
        }
        y += 1
      }
      Decoded(w, h, 3, px)
    }
  }

  /** Encode canonical pixels as PNG (lossless: decodePng(encodePng(d))
    * == d, spec-pinned). */
  def encodePng(d: Decoded): Array[Byte] = {
    require(d.channels == 1 || d.channels == 3, "channels must be 1 or 3")
    val imgType =
      if (d.channels == 3) java.awt.image.BufferedImage.TYPE_3BYTE_BGR
      else java.awt.image.BufferedImage.TYPE_BYTE_GRAY
    val img = new java.awt.image.BufferedImage(d.width, d.height, imgType)
    if (d.channels == 3) {
      var y = 0
      while (y < d.height) {
        var x = 0
        while (x < d.width) {
          val s = 3 * (y * d.width + x)
          img.setRGB(x, y,
            ((d.pixels(s) & 0xff) << 16) | ((d.pixels(s + 1) & 0xff) << 8) |
            (d.pixels(s + 2) & 0xff))
          x += 1
        }
        y += 1
      }
    } else {
      val raster = img.getRaster
      var y = 0
      while (y < d.height) {
        var x = 0
        while (x < d.width) {
          raster.setSample(x, y, 0, d.pixels(y * d.width + x) & 0xff)
          x += 1
        }
        y += 1
      }
    }
    val bos = new java.io.ByteArrayOutputStream()
    if (!javax.imageio.ImageIO.write(img, "png", bos))
      throw new IllegalStateException("JDK PNG writer unavailable")
    bos.toByteArray
  }

  // ---- kernels used by the Catalyst expressions -----------------------

  /** Decode + per-channel pixel sums as one codegen-callable kernel:
    * struct(width, height, channels, sum_r, sum_g, sum_b). Grayscale
    * puts its single-channel sum in sum_r (sum_g = sum_b = 0). Null for
    * undecodable bytes. Integer outputs on purpose — they cross
    * engine/hash boundaries losslessly. */
  def statsRow(bytes: Array[Byte]): GenericInternalRow = {
    val d = tryDecode(bytes)
    if (d == null) return null
    var sr = 0L; var sg = 0L; var sb = 0L
    if (d.channels == 3) {
      var i = 0
      while (i < d.pixels.length) {
        sr += d.pixels(i) & 0xff
        sg += d.pixels(i + 1) & 0xff
        sb += d.pixels(i + 2) & 0xff
        i += 3
      }
    } else {
      var i = 0
      while (i < d.pixels.length) { sr += d.pixels(i) & 0xff; i += 1 }
    }
    new GenericInternalRow(
      Array[Any](d.width, d.height, d.channels, sr, sg, sb))
  }

  /** Perceptual difference hash (dHash, Krawetz 2013) over the REAL
    * decoded raster: nearest-neighbor sample to a 9×8 gray grid (gray
    * = channel sum — scale-invariant for the comparisons, and integer-
    * exact so the SQL oracle replays it), then 64 horizontal-gradient
    * bits (bit y·8+x set iff gray(x+1,y) > gray(x,y)). Returned as
    * (hi, lo) 32-bit halves — two non-negative BIGINTs survive every
    * engine's signed-shift rules, unlike a packed 64-bit value whose
    * top bit goes negative. Near-duplicate images (recompressed,
    * resized, lightly edited) land within a few hamming bits:
    * `bit_count(hi_a ^ hi_b) + bit_count(lo_a ^ lo_b)`. The NN index
    * math composes exactly under integer upscaling
    * (floor(floor(2a/9)/2) = floor(a/9)), so the hash is INVARIANT
    * under k× nearest-neighbor resize — pinned in ImageCodecSpec.
    * Null for undecodable input. */
  def dHashRow(bytes: Array[Byte]): GenericInternalRow = {
    val d = tryDecode(bytes)
    if (d == null) return null
    val gw = 9; val gh = 8
    val gray = new Array[Int](gw * gh)
    var y = 0
    while (y < gh) {
      val sy = (y.toLong * d.height / gh).toInt
      var x = 0
      while (x < gw) {
        val sx = (x.toLong * d.width / gw).toInt
        val base = (sy * d.width + sx) * d.channels
        var s = 0; var c = 0
        while (c < d.channels) { s += d.pixels(base + c) & 0xff; c += 1 }
        gray(y * gw + x) = s
        x += 1
      }
      y += 1
    }
    var hi = 0L; var lo = 0L
    y = 0
    while (y < gh) {
      var x = 0
      while (x < 8) {
        if (gray(y * gw + x + 1) > gray(y * gw + x)) {
          val bit = y * 8 + x
          if (bit < 32) lo |= 1L << bit else hi |= 1L << (bit - 32)
        }
        x += 1
      }
      y += 1
    }
    new GenericInternalRow(Array[Any](hi, lo))
  }

  /** Real nearest-neighbor resize on DECODED pixels (not raw bytes),
    * re-encoded in the input's family (netpbm in, netpbm out; BMP in,
    * BMP out). Null for undecodable input. */
  def resizeEncoded(bytes: Array[Byte], outW: Int, outH: Int): Array[Byte] = {
    val d = tryDecode(bytes)
    if (d == null) return null
    val out = new Array[Byte](outW * outH * d.channels)
    var y = 0
    while (y < outH) {
      val sy = (y.toLong * d.height / outH).toInt
      var x = 0
      while (x < outW) {
        val sx = (x.toLong * d.width / outW).toInt
        var c = 0
        while (c < d.channels) {
          out((y * outW + x) * d.channels + c) =
            d.pixels((sy * d.width + sx) * d.channels + c)
          c += 1
        }
        x += 1
      }
      y += 1
    }
    val r = Decoded(outW, outH, d.channels, out)
    if (bytes(0) == 'B') encodeBmp(r)
    else if ((bytes(0) & 0xff) == 0x89) encodePng(r)
    else encodeNetpbm(r)
  }

  /** Deterministic test image for oracle-checked fixtures: dims and
    * every pixel are pure functions of `id` (w = 1 + id mod 7,
    * h = 1 + id mod 5, pixel i = (id*31 + i) mod 256, RGB), so a SQL
    * oracle recomputes the decoded stats from the id alone. Even ids
    * encode as PPM, odd as BMP — one fixture exercises both decoders. */
  def testImage(id: Long): Array[Byte] = {
    val d = testPixels(id)
    if (id % 2 == 0) encodeNetpbm(d) else encodeBmp(d)
  }

  /** The same deterministic pixels, PNG-encoded: exercises the
    * compressed (DEFLATE) decode path against the identical closed-form
    * oracle as [[testImage]]. */
  def testImagePng(id: Long): Array[Byte] = encodePng(testPixels(id))

  private def testPixels(id: Long): Decoded = {
    val w = (1 + java.lang.Math.floorMod(id, 7L)).toInt
    val h = (1 + java.lang.Math.floorMod(id, 5L)).toInt
    val n = 3 * w * h
    val px = new Array[Byte](n)
    var i = 0
    while (i < n) {
      px(i) = java.lang.Math.floorMod(id * 31 + i, 256L).toByte
      i += 1
    }
    Decoded(w, h, 3, px)
  }
}
