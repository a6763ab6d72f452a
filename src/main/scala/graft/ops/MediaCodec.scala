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

  // ───────────────────── Y4M (YUV4MPEG2) video ─────────────────────

  /** Decoded facts about a Y4M stream, derived ONLY from the bytes. */
  final case class Y4mInfo(
      width: Int,
      height: Int,
      fps_num: Int,
      fps_den: Int,
      n_frames: Int)

  /** Encode an uncompressed YUV4MPEG2 (mjpegtools) stream, C444
    * (full-resolution planes — no even-dimension constraint): the
    * ASCII stream header `YUV4MPEG2 W.. H.. F..:.. Ip A1:1 C444\n`,
    * then per frame the `FRAME\n` marker followed by the Y, U, V
    * planes (w·h bytes each, row-major). `yuvAt(frame, plane, pixel)`
    * supplies bytes (plane 0 = Y, 1 = U, 2 = V).
    */
  def encodeY4m(width: Int, height: Int, fpsNum: Int, fpsDen: Int,
      frames: Int, yuvAt: (Int, Int, Int) => Int): Array[Byte] = {
    val header =
      s"YUV4MPEG2 W$width H$height F$fpsNum:$fpsDen Ip A1:1 C444\n"
        .getBytes("ASCII")
    val planeSz = width * height
    val out = ByteBuffer.allocate(
      header.length + frames * (6 + 3 * planeSz))
    out.put(header)
    var f = 0
    while (f < frames) {
      out.put("FRAME\n".getBytes("ASCII"))
      var pl = 0
      while (pl < 3) {
        var p = 0
        while (p < planeSz) {
          out.put((yuvAt(f, pl, p) & 0xff).toByte); p += 1
        }
        pl += 1
      }
      f += 1
    }
    out.array()
  }

  /** Parse a Y4M stream header + frame markers: validate the magic,
    * read the W/H/F parameters (tolerating unknown ones — Ip, A, X…),
    * require C444 (or absent colorspace, whose mjpegtools default is
    * 4:2:0 — rejected here since plane math would differ), then walk
    * `FRAME` markers (tolerating per-frame parameters after the
    * marker) counting frames and validating plane sizes.
    */
  def decodeY4m(bytes: Array[Byte]): Y4mInfo = {
    val nlHeader = bytes.indexOf('\n'.toByte)
    require(nlHeader > 0, "no Y4M stream header line")
    val header = new String(bytes, 0, nlHeader, "ASCII")
    val toks = header.split(' ')
    require(toks.head == "YUV4MPEG2", s"bad Y4M magic: ${toks.head}")
    var w = -1; var h = -1; var fn = -1; var fd = -1; var cs = "C444"
    toks.tail.foreach { t =>
      if (t.nonEmpty) t.charAt(0) match {
        case 'W' => w = t.drop(1).toInt
        case 'H' => h = t.drop(1).toInt
        case 'F' =>
          val Array(a, b) = t.drop(1).split(':'); fn = a.toInt; fd = b.toInt
        case 'C' => cs = t
        case _   => () // Ip / A / X… — tolerated, not interpreted
      }
    }
    require(w > 0 && h > 0 && fn > 0 && fd > 0,
      s"incomplete Y4M header: $header")
    require(cs == "C444", s"only C444 supported, got $cs")
    val planeSz = w * h
    var off = nlHeader + 1
    var frames = 0
    while (off < bytes.length) {
      require(off + 5 <= bytes.length &&
        new String(bytes, off, 5, "ASCII") == "FRAME",
        s"expected FRAME marker at offset $off")
      var nl = off + 5
      while (nl < bytes.length && bytes(nl) != '\n'.toByte) nl += 1
      require(nl < bytes.length, "unterminated FRAME header")
      off = nl + 1 + 3 * planeSz
      require(off <= bytes.length, "frame planes overrun the stream")
      frames += 1
    }
    Y4mInfo(w, h, fn, fd, frames)
  }

  /** Per-frame exact luma statistics from the DECODED Y planes:
    * (sum, min, max) per frame, in stream order.
    */
  def decodeY4mLumaStats(bytes: Array[Byte]): Array[(Long, Int, Int)] = {
    val info = decodeY4m(bytes)
    val planeSz = info.width * info.height
    val out = Array.newBuilder[(Long, Int, Int)]
    var off = bytes.indexOf('\n'.toByte) + 1
    var f = 0
    while (f < info.n_frames) {
      var nl = off + 5
      while (bytes(nl) != '\n'.toByte) nl += 1
      val y0 = nl + 1
      var sum = 0L; var mn = 255; var mx = 0
      var p = 0
      while (p < planeSz) {
        val v = bytes(y0 + p) & 0xff
        sum += v; if (v < mn) mn = v; if (v > mx) mx = v
        p += 1
      }
      out += ((sum, mn, mx))
      off = y0 + 3 * planeSz
      f += 1
    }
    out.result()
  }
}
