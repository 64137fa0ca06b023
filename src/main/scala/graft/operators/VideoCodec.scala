package graft.operators

import org.apache.spark.sql.catalyst.expressions.GenericInternalRow

/** Real video codec for the multimodal tier, byte-exact format only:
  * YUV4MPEG2 ("Y4M", the mjpegtools/ffmpeg interchange container)
  * carrying uncompressed planar YUV frames — an honest implementation
  * of the ASCII stream header (`YUV4MPEG2 W.. H.. [F..] [C..]`), the
  * per-frame `FRAME` markers, and the C444 / C420-family plane
  * layouts. Raw planes are uncompressed, so decoded bytes are exact by
  * construction — the video analog of the PPM/BMP raster path and the
  * RIFF/PCM audio path, and it sits behind the same closed-form oracle
  * gate. COMPRESSED video (H.264/VP9/AV1) stays outside for the same
  * reason as JPEG and MP3: decode is not bit-deterministic across
  * decoder implementations, so it belongs at the per-partition
  * [[Multimodal.mapBatchesStub]] seam.
  *
  * Corrupt or unsupported bytes land on the null path — at corpus
  * scale a bad blob must skip, not kill a 1000-executor stage — and
  * every size computation runs in Long with bounded dimensions so a
  * malformed header cannot overflow Int into a plausible-wrong decode
  * (same contract as [[ImageCodec]] and [[AudioCodec]]).
  */
object VideoCodec {

  /** Canonical decoded form: `data` is all frame payloads concatenated,
    * each frame `ySize + 2*cSize` bytes in Y,U,V plane order, where
    * `ySize = width*height` and `cSize` is `width*height` for C444 or
    * `(width/2)*(height/2)` for the C420 family. */
  final case class DecodedVideo(width: Int, height: Int, cs444: Boolean,
                                nFrames: Int, data: Array[Byte]) {
    def ySize: Int = width * height
    def cSize: Int = if (cs444) width * height else (width / 2) * (height / 2)
    def frameBytes: Int = ySize + 2 * cSize
  }

  private val MaxDim = 32768L

  /** Decode a Y4M stream; null when the bytes are not a supported clip
    * (callers surface that as a NULL row). */
  def tryDecode(bytes: Array[Byte]): DecodedVideo = {
    if (bytes == null || bytes.length < 10) return null
    try decodeY4m(bytes)
    catch { case _: Exception => null }
  }

  // ASCII line starting at `off`, ending before '\n'; bounded so a
  // headerless blob can't make us scan megabytes.
  private def line(b: Array[Byte], off: Int, maxLen: Int): String = {
    var i = off
    val end = math.min(b.length, off + maxLen)
    while (i < end && b(i) != '\n') i += 1
    if (i >= end) throw new IllegalArgumentException("unterminated header line")
    new String(b, off, i - off, java.nio.charset.StandardCharsets.US_ASCII)
  }

  private def decodeY4m(b: Array[Byte]): DecodedVideo = {
    val header = line(b, 0, 256)
    val tokens = header.split(" ").filter(_.nonEmpty)
    if (tokens.isEmpty || tokens(0) != "YUV4MPEG2")
      throw new IllegalArgumentException("not a YUV4MPEG2 stream")
    var w = -1L; var h = -1L; var cs444 = false; var csSeen = false
    tokens.drop(1).foreach { t =>
      t.charAt(0) match {
        case 'W' => w = t.substring(1).toLong
        case 'H' => h = t.substring(1).toLong
        case 'C' =>
          csSeen = true
          t.substring(1) match {
            case "444" => cs444 = true
            // the C420 siting variants (jpeg/mpeg2/paldv) differ only in
            // chroma sample POSITION, not plane layout — same bytes
            case "420" | "420jpeg" | "420mpeg2" | "420paldv" => cs444 = false
            case other =>
              throw new IllegalArgumentException(s"unsupported colorspace $other")
          }
        case _ => // F (rate), I (interlace), A (aspect), X (extension): ignored
      }
    }
    if (!csSeen) cs444 = false // spec default is 4:2:0
    if (w <= 0 || h <= 0 || w > MaxDim || h > MaxDim)
      throw new IllegalArgumentException("bad dimensions")
    if (!cs444 && ((w & 1L) != 0 || (h & 1L) != 0))
      throw new IllegalArgumentException("C420 requires even dimensions")
    val ySize = w * h
    val cSize = if (cs444) ySize else (w / 2) * (h / 2)
    val frameBytes = ySize + 2 * cSize
    if (frameBytes > Int.MaxValue)
      throw new IllegalArgumentException("frame size overflow")
    // frame scan: "FRAME[ params]\n" + payload, repeated to EOF
    var pos = header.length + 1L
    val frames = Array.newBuilder[Byte]
    var nFrames = 0
    while (pos < b.length) {
      val fh = line(b, pos.toInt, 256)
      if (fh != "FRAME" && !fh.startsWith("FRAME "))
        throw new IllegalArgumentException("missing FRAME marker")
      pos += fh.length + 1
      if (pos + frameBytes > b.length)
        throw new IllegalArgumentException("truncated frame payload")
      frames ++= java.util.Arrays.copyOfRange(b, pos.toInt, (pos + frameBytes).toInt)
      pos += frameBytes
      nFrames += 1
      if (nFrames.toLong * frameBytes > Int.MaxValue)
        throw new IllegalArgumentException("video size overflow")
    }
    if (nFrames == 0)
      throw new IllegalArgumentException("no frames")
    DecodedVideo(w.toInt, h.toInt, cs444, nFrames, frames.result())
  }

  /** Encode canonical planes as a minimal Y4M stream (the header/FRAME
    * layout every Y4M reader accepts; fixed 25fps progressive 1:1). */
  def encodeY4m(d: DecodedVideo): Array[Byte] = {
    require(d.width > 0 && d.height > 0, "dimensions must be positive")
    require(d.cs444 || ((d.width & 1) == 0 && (d.height & 1) == 0),
      "C420 requires even dimensions")
    require(d.data.length == d.nFrames * d.frameBytes, "payload size mismatch")
    val cs = if (d.cs444) "444" else "420"
    val header = s"YUV4MPEG2 W${d.width} H${d.height} F25:1 Ip A1:1 C$cs\n"
      .getBytes(java.nio.charset.StandardCharsets.US_ASCII)
    val marker = "FRAME\n".getBytes(java.nio.charset.StandardCharsets.US_ASCII)
    val out = new Array[Byte](
      header.length + d.nFrames * (marker.length + d.frameBytes))
    System.arraycopy(header, 0, out, 0, header.length)
    var pos = header.length
    var f = 0
    while (f < d.nFrames) {
      System.arraycopy(marker, 0, out, pos, marker.length)
      pos += marker.length
      System.arraycopy(d.data, f * d.frameBytes, out, pos, d.frameBytes)
      pos += d.frameBytes
      f += 1
    }
    out
  }

  /** Decoded-clip stats as integers (cross engine/hash lossless):
    * (width, height, colorspace as 444|420, n_frames, per-plane sums
    * of the unsigned bytes across all frames). Null for undecodable
    * bytes. */
  def statsRow(bytes: Array[Byte]): GenericInternalRow = {
    val d = tryDecode(bytes)
    if (d == null) return null
    var sy = 0L; var su = 0L; var sv = 0L
    val ys = d.ySize; val cs = d.cSize; val fb = d.frameBytes
    var f = 0
    while (f < d.nFrames) {
      val base = f * fb
      var i = 0
      while (i < ys) { sy += d.data(base + i) & 0xff; i += 1 }
      i = 0
      while (i < cs) { su += d.data(base + ys + i) & 0xff; i += 1 }
      i = 0
      while (i < cs) { sv += d.data(base + ys + cs + i) & 0xff; i += 1 }
      f += 1
    }
    new GenericInternalRow(Array[Any](
      d.width, d.height, if (d.cs444) 444 else 420, d.nFrames, sy, su, sv))
  }

  /** Real nearest-neighbor frame sampling on DECODED frames to exactly
    * `outFrames`, re-encoded as Y4M with the same geometry and
    * colorspace: source frame for output k is (k * nFrames) / outFrames
    * — the video analog of [[AudioCodec.resampleEncoded]]. Null for
    * undecodable input. */
  def frameSampleEncoded(bytes: Array[Byte], outFrames: Int): Array[Byte] = {
    val d = tryDecode(bytes)
    // a header-only stream decodes to null ("no frames" is rejected in
    // decodeY4m), so unlike AudioCodec.resampleEncoded — where a
    // zero-frame WAV is a VALID clip needing its own guard — the
    // zero-source case cannot reach the copy loop here
    if (d == null) return null
    val fb = d.frameBytes
    val out = new Array[Byte](outFrames * fb)
    var k = 0
    while (k < outFrames) {
      val src = ((k.toLong * d.nFrames) / outFrames).toInt
      System.arraycopy(d.data, src * fb, out, k * fb, fb)
      k += 1
    }
    encodeY4m(DecodedVideo(d.width, d.height, d.cs444, outFrames, out))
  }

  /** Per-frame luma feature over decoded planes: the sum of the frame's
    * unsigned Y bytes — the integer-exact brightness contour (the
    * shot-boundary / static-frame screen that real video pipelines run
    * first). Null for undecodable bytes. */
  def frameLumaSums(bytes: Array[Byte]): Array[Long] = {
    val d = tryDecode(bytes)
    if (d == null) return null
    val out = new Array[Long](d.nFrames)
    val ys = d.ySize; val fb = d.frameBytes
    var f = 0
    while (f < d.nFrames) {
      var s = 0L
      val base = f * fb
      var i = 0
      while (i < ys) { s += d.data(base + i) & 0xff; i += 1 }
      out(f) = s
      f += 1
    }
    out
  }

  /** Deterministic test clip for oracle-checked fixtures: every field
    * and plane byte is a pure function of `id` (width = 4 + 2*(id mod
    * 3), height = 2 + 2*(id mod 2), colorspace = C444 when id mod 4 <
    * 2 else C420, nFrames = 1 + id mod 5, and the byte at frame f,
    * plane p in {0=Y,1=U,2=V}, plane index i is (id*13 + f*7 + p*3 +
    * i) mod 256), so a SQL oracle recomputes the decoded stats from
    * the id alone. The id sweep covers both plane layouts and all
    * geometry combinations; every width/height is even, so both
    * colorspaces are valid at every id. */
  def testY4m(id: Long): Array[Byte] = {
    val w = (4 + 2 * java.lang.Math.floorMod(id, 3L)).toInt
    val h = (2 + 2 * java.lang.Math.floorMod(id, 2L)).toInt
    val cs444 = java.lang.Math.floorMod(id, 4L) < 2
    val nFrames = (1 + java.lang.Math.floorMod(id, 5L)).toInt
    val ySize = w * h
    val cSize = if (cs444) ySize else (w / 2) * (h / 2)
    val fb = ySize + 2 * cSize
    val data = new Array[Byte](nFrames * fb)
    var f = 0
    while (f < nFrames) {
      var j = 0
      while (j < fb) {
        val p = if (j < ySize) 0 else if (j < ySize + cSize) 1 else 2
        val i = if (p == 0) j else if (p == 1) j - ySize else j - ySize - cSize
        data(f * fb + j) =
          java.lang.Math.floorMod(id * 13 + f * 7 + p * 3 + i, 256L).toByte
        j += 1
      }
      f += 1
    }
    encodeY4m(DecodedVideo(w, h, cs444, nFrames, data))
  }
}
