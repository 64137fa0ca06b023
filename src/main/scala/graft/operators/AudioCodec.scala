package graft.operators

import org.apache.spark.sql.catalyst.expressions.GenericInternalRow

/** Real audio codec for the multimodal tier, byte-exact format only:
  * RIFF/WAVE with uncompressed integer PCM (format tag 1), 8- or
  * 16-bit, mono or stereo — a full, honest implementation of the RIFF
  * container (chunk scan with word alignment, "fmt " field validation,
  * "data" payload) and the PCM sample layouts (8-bit unsigned, 16-bit
  * signed little-endian, frame-interleaved channels). PCM is
  * uncompressed, so decoded samples are exact by construction — the
  * audio analog of the PPM/BMP/PNG raster path, and it can sit behind
  * the same closed-form oracle gate. COMPRESSED audio (MP3/AAC/Vorbis)
  * stays outside for the same reason as JPEG: decode is not
  * bit-deterministic across decoder implementations, so it belongs at
  * the per-partition [[Multimodal.mapBatchesStub]] seam.
  *
  * Decoded form is canonical: frame-major interleaved centered Ints
  * (8-bit values are re-centered to [-128, 127]), so the same logical
  * clip at either bit depth yields directly comparable statistics.
  *
  * Corrupt or unsupported bytes land on the null path — at corpus
  * scale a bad blob must skip, not kill a 1000-executor stage — and
  * every size computation runs in Long so a malformed header cannot
  * overflow Int into a plausible-wrong decode (same contract as
  * [[ImageCodec]]).
  */
object AudioCodec {

  /** Canonical decoded form: interleaved centered samples,
    * `samples.length == nFrames * channels`. */
  final case class DecodedAudio(sampleRate: Int, channels: Int,
                                bitsPerSample: Int, nFrames: Int,
                                samples: Array[Int])

  private def le16(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8)
  private def le32(b: Array[Byte], off: Int): Long =
    ((b(off) & 0xffL)) | ((b(off + 1) & 0xffL) << 8) |
    ((b(off + 2) & 0xffL) << 16) | ((b(off + 3) & 0xffL) << 24)
  private def tag(b: Array[Byte], off: Int): String =
    new String(b, off, 4, java.nio.charset.StandardCharsets.US_ASCII)

  /** Decode RIFF/WAVE integer PCM; null when the bytes are not a
    * supported clip (callers surface that as a NULL row). */
  def tryDecode(bytes: Array[Byte]): DecodedAudio = {
    if (bytes == null || bytes.length < 44) return null
    try decodeWav(bytes)
    catch { case _: Exception => null }
  }

  private def decodeWav(b: Array[Byte]): DecodedAudio = {
    if (tag(b, 0) != "RIFF" || tag(b, 8) != "WAVE")
      throw new IllegalArgumentException("not a RIFF/WAVE stream")
    // chunk scan: [id(4) size(4) payload(size, padded to even)]*.
    // Sizes are u32 — read as Long; positions tracked in Long so a
    // hostile size can't wrap Int and re-enter the buffer.
    var pos = 12L
    var fmtOff = -1L; var dataOff = -1L; var dataLen = -1L
    while (pos + 8 <= b.length && (fmtOff < 0 || dataOff < 0)) {
      val id = tag(b, pos.toInt)
      val size = le32(b, pos.toInt + 4)
      val payload = pos + 8
      if (payload + size > b.length)
        throw new IllegalArgumentException("chunk overruns buffer")
      if (id == "fmt ") {
        // the 6 PCM fmt fields span 16 bytes; a smaller declared size
        // would make the field reads below land in NEIGHBORING chunks
        if (size < 16)
          throw new IllegalArgumentException("fmt chunk too small")
        fmtOff = payload
      }
      else if (id == "data") { dataOff = payload; dataLen = size }
      pos = payload + size + (size & 1L) // RIFF pads chunks to even
    }
    if (fmtOff < 0 || dataOff < 0)
      throw new IllegalArgumentException("missing fmt/data chunk")
    val fo = fmtOff.toInt
    val audioFormat = le16(b, fo)
    val channels = le16(b, fo + 2)
    val sampleRate = le32(b, fo + 4)
    val byteRate = le32(b, fo + 8)
    val blockAlign = le16(b, fo + 12)
    val bits = le16(b, fo + 14)
    if (audioFormat != 1) // integer PCM only; IEEE-float/ADPCM -> null
      throw new IllegalArgumentException("unsupported format tag")
    if (channels < 1 || channels > 2 || (bits != 8 && bits != 16) ||
        sampleRate <= 0 || sampleRate > Int.MaxValue)
      throw new IllegalArgumentException("unsupported PCM shape")
    val frameBytes = channels * (bits / 8)
    // internally consistent header or null: a lying blockAlign/byteRate
    // means the writer and this reader would disagree on sample layout
    if (blockAlign != frameBytes || byteRate != sampleRate * frameBytes)
      throw new IllegalArgumentException("inconsistent fmt fields")
    if (dataLen % frameBytes != 0)
      throw new IllegalArgumentException("data not a whole frame count")
    val nSamplesL = dataLen / (bits / 8)
    if (nSamplesL > Int.MaxValue)
      throw new IllegalArgumentException("audio size overflow")
    val nSamples = nSamplesL.toInt
    val samples = new Array[Int](nSamples)
    val off = dataOff.toInt
    var i = 0
    if (bits == 8) {
      // 8-bit WAV is UNSIGNED; canonical form centers it
      while (i < nSamples) { samples(i) = (b(off + i) & 0xff) - 128; i += 1 }
    } else {
      while (i < nSamples) {
        samples(i) = le16(b, off + 2 * i).toShort.toInt // sign-extend
        i += 1
      }
    }
    DecodedAudio(sampleRate.toInt, channels, bits,
      nSamples / channels, samples)
  }

  /** Encode canonical samples as a minimal RIFF/WAVE PCM file
    * (44-byte header + data, the layout every WAV reader accepts). */
  def encodeWav(d: DecodedAudio): Array[Byte] = {
    require(d.channels == 1 || d.channels == 2, "channels must be 1 or 2")
    require(d.bitsPerSample == 8 || d.bitsPerSample == 16, "bits must be 8 or 16")
    require(d.samples.length == d.nFrames * d.channels, "sample count mismatch")
    val frameBytes = d.channels * (d.bitsPerSample / 8)
    val dataLen = d.samples.length * (d.bitsPerSample / 8)
    val out = new Array[Byte](44 + dataLen)
    def putTag(off: Int, s: String): Unit = {
      val t = s.getBytes(java.nio.charset.StandardCharsets.US_ASCII)
      System.arraycopy(t, 0, out, off, 4)
    }
    def putLe16(off: Int, v: Int): Unit = {
      out(off) = v.toByte; out(off + 1) = (v >>> 8).toByte
    }
    def putLe32(off: Int, v: Long): Unit = {
      out(off) = v.toByte; out(off + 1) = (v >>> 8).toByte
      out(off + 2) = (v >>> 16).toByte; out(off + 3) = (v >>> 24).toByte
    }
    putTag(0, "RIFF"); putLe32(4, 36L + dataLen); putTag(8, "WAVE")
    putTag(12, "fmt "); putLe32(16, 16L)
    putLe16(20, 1); putLe16(22, d.channels)
    putLe32(24, d.sampleRate.toLong)
    putLe32(28, d.sampleRate.toLong * frameBytes)
    putLe16(32, frameBytes); putLe16(34, d.bitsPerSample)
    putTag(36, "data"); putLe32(40, dataLen.toLong)
    var i = 0
    if (d.bitsPerSample == 8) {
      while (i < d.samples.length) {
        out(44 + i) = (d.samples(i) + 128).toByte; i += 1
      }
    } else {
      while (i < d.samples.length) {
        val v = d.samples(i)
        out(44 + 2 * i) = v.toByte; out(44 + 2 * i + 1) = (v >>> 8).toByte
        i += 1
      }
    }
    out
  }

  /** Decoded-clip stats as integers (cross engine/hash lossless):
    * (sample_rate, channels, bits, n_frames, per-channel sums of the
    * centered samples, sum of |sample| as an exact energy proxy).
    * Null for undecodable bytes. */
  def statsRow(bytes: Array[Byte]): GenericInternalRow = {
    val d = tryDecode(bytes)
    if (d == null) return null
    var s0 = 0L; var s1 = 0L; var sa = 0L
    var i = 0
    while (i < d.samples.length) {
      val v = d.samples(i)
      if (d.channels == 2 && i % 2 == 1) s1 += v else s0 += v
      sa += math.abs(v)
      i += 1
    }
    new GenericInternalRow(Array[Any](
      d.sampleRate, d.channels, d.bitsPerSample, d.nFrames, s0, s1, sa))
  }

  /** Real nearest-neighbor resample on DECODED frames (not raw bytes)
    * to exactly `outFrames`, re-encoded as WAV with the same rate,
    * channels, and bit depth: source frame for output k is
    * (k * nFrames) / outFrames — the audio analog of
    * [[ImageCodec.resizeEncoded]]. Null for undecodable input. */
  def resampleEncoded(bytes: Array[Byte], outFrames: Int): Array[Byte] = {
    val d = tryDecode(bytes)
    if (d == null) return null
    // a zero-frame clip is a VALID wav (empty data chunk) but has no
    // source frame to map output frames onto — null, not an index crash
    if (d.nFrames == 0 && outFrames > 0) return null
    val out = new Array[Int](outFrames * d.channels)
    var k = 0
    while (k < outFrames) {
      val src = ((k.toLong * d.nFrames) / outFrames).toInt
      var c = 0
      while (c < d.channels) {
        out(k * d.channels + c) = d.samples(src * d.channels + c)
        c += 1
      }
      k += 1
    }
    encodeWav(DecodedAudio(d.sampleRate, d.channels, d.bitsPerSample,
      outFrames, out))
  }

  /** Per-window energy over decoded frames: sum of |sample| (all
    * channels) for each complete non-overlapping window of
    * `windowFrames` frames — the integer-exact voice-activity-style
    * feature; a trailing partial window is dropped, mirroring the
    * frame sampler's full-windows-only contract. Null for undecodable
    * bytes; a clip shorter than one window yields an empty array. */
  def windowEnergies(bytes: Array[Byte], windowFrames: Int): Array[Long] = {
    val d = tryDecode(bytes)
    if (d == null) return null
    val nWin = d.nFrames / windowFrames
    val out = new Array[Long](nWin)
    val perWin = windowFrames * d.channels
    var w = 0
    while (w < nWin) {
      var s = 0L
      var i = w * perWin
      val end = i + perWin
      while (i < end) { s += math.abs(d.samples(i)); i += 1 }
      out(w) = s
      w += 1
    }
    out
  }

  /** Deterministic test clip for oracle-checked fixtures: every field
    * and sample is a pure function of `id` (channels = 1 + id mod 2,
    * bits = 8 when id mod 3 = 0 else 16, nFrames = 1 + id mod 9,
    * 8-bit sample i = (id*31 + i) mod 256 - 128, 16-bit sample i =
    * (id*37 + i*101) mod 65536 - 32768), so a SQL oracle recomputes
    * the decoded stats from the id alone. The id sweep covers all four
    * (channels x bits) PCM shapes. */
  def testWav(id: Long): Array[Byte] = {
    val channels = (1 + java.lang.Math.floorMod(id, 2L)).toInt
    val bits = if (java.lang.Math.floorMod(id, 3L) == 0L) 8 else 16
    val nFrames = (1 + java.lang.Math.floorMod(id, 9L)).toInt
    val n = nFrames * channels
    val samples = new Array[Int](n)
    var i = 0
    while (i < n) {
      samples(i) =
        if (bits == 8) java.lang.Math.floorMod(id * 31 + i, 256L).toInt - 128
        else java.lang.Math.floorMod(id * 37 + i.toLong * 101, 65536L).toInt - 32768
      i += 1
    }
    encodeWav(DecodedAudio(8000, channels, bits, nFrames, samples))
  }
}
