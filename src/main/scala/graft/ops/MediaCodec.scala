package graft.ops

import java.nio.{ByteBuffer, ByteOrder}

/** Real pure-JVM media codecs (no format library): WAV/RIFF (PCM) and
  * BMP (BITMAPINFOHEADER, 24-bit). These replace the deterministic
  * fake for the formats simple enough to parse honestly in-container —
  * the [[Multimodal]] round-trip queries ENCODE real files from
  * closed-form parameters, push the bytes through the binary payload
  * column, and DECODE them back with these parsers; the DuckDB oracle
  * recomputes the expected fields from the generating parameters, so
  * any header-layout, chunk-walk, endianness, row-padding, or
  * bottom-up error in either codec breaks the hash match.
  *
  * Both decoders parse what a real file carries:
  *  - WAV: RIFF/WAVE magic, a proper chunk WALK (unknown chunks like
  *    LIST/INFO are skipped, odd-sized chunks honor the RIFF pad
  *    byte), `fmt ` field extraction (PCM format tag, channels, rate,
  *    block align, bits), and little-endian int16 frame decoding from
  *    the `data` chunk.
  *  - BMP: BM magic, file size, pixel-array offset, DIB header
  *    (width, signed height, planes, bpp), 4-byte row-stride padding,
  *    and bottom-up vs top-down row order (positive height means the
  *    FIRST stored row is the LAST logical row).
  *
  * Everything is exact integer arithmetic — peak/energy/pixel sums
  * are BIGINT-exact on both engines.
  */
object MediaCodec {

  // ───────────────────────── WAV / RIFF ─────────────────────────

  /** Decoded facts about a PCM WAV file, derived ONLY from the bytes. */
  final case class WavInfo(
      sample_rate: Int,
      n_channels: Int,
      bits_per_sample: Int,
      n_samples: Long,
      duration_us: Long,
      peak: Int,
      energy: Long)

  /** Encode 16-bit mono PCM samples as a standard 44-byte-header WAV.
    * `extraChunk` optionally inserts an unknown chunk before `data`
    * (specs use it to prove the decoder's chunk walk skips it).
    */
  def encodeWavPcm16Mono(samples: Array[Short], sampleRate: Int,
      extraChunk: Option[(String, Array[Byte])] = None): Array[Byte] = {
    val dataSize  = samples.length * 2
    val extraSize = extraChunk.map { case (_, b) =>
      8 + b.length + (b.length & 1) // RIFF pads odd chunks to a word
    }.getOrElse(0)
    val riffSize = 36 + extraSize + dataSize
    val buf = ByteBuffer.allocate(8 + riffSize)
      .order(ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("ASCII")).putInt(riffSize)
      .put("WAVE".getBytes("ASCII"))
    buf.put("fmt ".getBytes("ASCII")).putInt(16)
      .putShort(1)                       // PCM format tag
      .putShort(1)                       // mono
      .putInt(sampleRate)
      .putInt(sampleRate * 2)            // byte rate
      .putShort(2)                       // block align
      .putShort(16)                      // bits per sample
    extraChunk.foreach { case (id, body) =>
      buf.put(id.getBytes("ASCII").take(4).padTo(4, ' '.toByte))
        .putInt(body.length).put(body)
      if ((body.length & 1) == 1) buf.put(0.toByte)
    }
    buf.put("data".getBytes("ASCII")).putInt(dataSize)
    samples.foreach(buf.putShort)
    buf.array()
  }

  /** Parse a PCM WAV: validate magic, walk chunks (skipping unknown
    * ones, honoring the odd-size pad byte), read `fmt `, then decode
    * the `data` chunk's little-endian int16 frames into exact
    * integer stats. Requires format tag 1 (PCM) and 16-bit samples.
    */
  def decodeWav(bytes: Array[Byte]): WavInfo = {
    val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    def tag4(off: Int): String =
      new String(bytes, off, 4, "ASCII")
    require(bytes.length >= 12 && tag4(0) == "RIFF" && tag4(8) == "WAVE",
      "not a RIFF/WAVE file")
    var off = 12
    var rate = 0; var channels = 0; var bits = 0; var blockAlign = 0
    var haveFmt = false
    var info: Option[WavInfo] = None
    while (off + 8 <= bytes.length && info.isEmpty) {
      val id   = tag4(off)
      val size = buf.getInt(off + 4)
      require(size >= 0 && off + 8 + size <= bytes.length,
        s"chunk '$id' overruns the file")
      id match {
        case "fmt " =>
          require(size >= 16, "fmt chunk too short")
          val fmtTag = buf.getShort(off + 8) & 0xffff
          require(fmtTag == 1, s"not PCM (format tag $fmtTag)")
          channels   = buf.getShort(off + 10) & 0xffff
          rate       = buf.getInt(off + 12)
          blockAlign = buf.getShort(off + 20) & 0xffff
          bits       = buf.getShort(off + 22) & 0xffff
          require(bits == 16, s"only 16-bit PCM supported, got $bits")
          haveFmt = true
        case "data" =>
          require(haveFmt, "data chunk before fmt chunk")
          val nFrames = size / blockAlign
          val nVals   = size / 2
          var peak = 0; var energy = 0L
          var i = 0
          while (i < nVals) {
            val s = buf.getShort(off + 8 + 2 * i).toInt
            val a = math.abs(s)
            if (a > peak) peak = a
            energy += s.toLong * s.toLong
            i += 1
          }
          info = Some(WavInfo(rate, channels, bits, nFrames.toLong,
            nFrames.toLong * 1000000L / rate, peak, energy))
        case _ => // unknown chunk (LIST, fact, …): skip
      }
      off += 8 + size + (size & 1) // word-align
    }
    info.getOrElse(throw new IllegalArgumentException("no data chunk"))
  }

  /** The raw int16 frames of the data chunk, via the same chunk walk
    * as [[decodeWav]] — for feature extraction over decoded samples
    * (zero-crossing rate, silence runs) rather than summary stats.
    */
  def decodeWavSamples(bytes: Array[Byte]): Array[Short] = {
    val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    def tag4(off: Int): String = new String(bytes, off, 4, "ASCII")
    require(bytes.length >= 12 && tag4(0) == "RIFF" && tag4(8) == "WAVE",
      "not a RIFF/WAVE file")
    var off = 12
    while (off + 8 <= bytes.length) {
      val id   = tag4(off)
      val size = buf.getInt(off + 4)
      require(size >= 0 && off + 8 + size <= bytes.length,
        s"chunk '$id' overruns the file")
      if (id == "data") {
        val out = new Array[Short](size / 2)
        var i = 0
        while (i < out.length) { out(i) = buf.getShort(off + 8 + 2 * i); i += 1 }
        return out
      }
      off += 8 + size + (size & 1)
    }
    throw new IllegalArgumentException("no data chunk")
  }

  // ───────────────────────── BMP ─────────────────────────

  /** Decoded facts about a BMP, derived ONLY from the bytes. The two
    * sums prove structural handling: `pix_sum` (all logical pixel
    * bytes — wrong iff padding leaks in) and `first_row_sum` (the
    * LOGICAL top row — wrong iff bottom-up storage is mishandled).
    */
  final case class BmpInfo(
      width: Int,
      height: Int,
      bpp: Int,
      file_size: Long,
      pix_sum: Long,
      first_row_sum: Long)

  /** Encode a 24-bit bottom-up BMP (BITMAPINFOHEADER). `pix(k)` gives
    * logical byte k of the row-major top-down pixel stream
    * (k ∈ [0, w·h·3)); rows are stored bottom-up with 4-byte stride
    * padding, as the format requires.
    */
  def encodeBmp24(width: Int, height: Int, pix: Int => Int): Array[Byte] = {
    require(width > 0 && height > 0)
    val stride   = ((3 * width + 3) / 4) * 4
    val imgSize  = stride * height
    val fileSize = 54 + imgSize
    val buf = ByteBuffer.allocate(fileSize).order(ByteOrder.LITTLE_ENDIAN)
    buf.put('B'.toByte).put('M'.toByte)
      .putInt(fileSize).putShort(0).putShort(0).putInt(54)
    buf.putInt(40).putInt(width).putInt(height)  // positive → bottom-up
      .putShort(1).putShort(24).putInt(0).putInt(imgSize)
      .putInt(2835).putInt(2835).putInt(0).putInt(0)
    var storedRow = 0
    while (storedRow < height) {
      val logicalRow = height - 1 - storedRow // bottom-up
      var c = 0
      while (c < 3 * width) {
        buf.put((pix(logicalRow * 3 * width + c) & 0xff).toByte)
        c += 1
      }
      var p = 3 * width
      while (p < stride) { buf.put(0.toByte); p += 1 }
      storedRow += 1
    }
    buf.array()
  }

  /** Parse a 24-bit BMP: magic, file size, pixel offset, DIB width /
    * signed height / bpp; then rebuild the LOGICAL top-down pixel
    * stream honoring stride padding and row order (positive height =
    * bottom-up, negative = top-down).
    */
  def decodeBmp(bytes: Array[Byte]): BmpInfo = {
    val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    require(bytes.length >= 54 && bytes(0) == 'B' && bytes(1) == 'M',
      "not a BMP file")
    val fileSize  = buf.getInt(2).toLong & 0xffffffffL
    val pixOff    = buf.getInt(10)
    val width     = buf.getInt(18)
    val rawHeight = buf.getInt(22)
    val bpp       = buf.getShort(28) & 0xffff
    require(bpp == 24, s"only 24-bit BMP supported, got $bpp")
    val height   = math.abs(rawHeight)
    val bottomUp = rawHeight > 0
    val stride   = ((3 * width + 3) / 4) * 4
    require(pixOff + stride.toLong * height <= bytes.length,
      "pixel array overruns the file")
    var pixSum = 0L; var firstRowSum = 0L
    var logicalRow = 0
    while (logicalRow < height) {
      val storedRow = if (bottomUp) height - 1 - logicalRow else logicalRow
      val rowOff = pixOff + storedRow * stride
      var c = 0
      while (c < 3 * width) {
        val v = bytes(rowOff + c) & 0xff
        pixSum += v
        if (logicalRow == 0) firstRowSum += v
        c += 1
      }
      logicalRow += 1
    }
    BmpInfo(width, height, bpp, fileSize, pixSum, firstRowSum)
  }

  /** The LOGICAL top-down pixel byte stream (stride padding stripped,
    * bottom-up storage unwound) — for per-channel feature extraction
    * over decoded pixels.
    */
  def decodeBmpPixels(bytes: Array[Byte]): Array[Byte] = {
    val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    require(bytes.length >= 54 && bytes(0) == 'B' && bytes(1) == 'M',
      "not a BMP file")
    val pixOff    = buf.getInt(10)
    val width     = buf.getInt(18)
    val rawHeight = buf.getInt(22)
    val bpp       = buf.getShort(28) & 0xffff
    require(bpp == 24, s"only 24-bit BMP supported, got $bpp")
    val height   = math.abs(rawHeight)
    val bottomUp = rawHeight > 0
    val stride   = ((3 * width + 3) / 4) * 4
    require(pixOff + stride.toLong * height <= bytes.length,
      "pixel array overruns the file")
    val out = new Array[Byte](3 * width * height)
    var logicalRow = 0
    while (logicalRow < height) {
      val storedRow = if (bottomUp) height - 1 - logicalRow else logicalRow
      System.arraycopy(bytes, pixOff + storedRow * stride,
        out, logicalRow * 3 * width, 3 * width)
      logicalRow += 1
    }
    out
  }
}
