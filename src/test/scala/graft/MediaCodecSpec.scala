package graft

import java.nio.{ByteBuffer, ByteOrder}

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.MediaCodec

/** [[MediaCodec]] against HAND-BUILT binary fixtures: the WAV and BMP
  * byte layouts are assembled field by field here (not via the
  * encoder), so an encoder/decoder bug pair that cancels out cannot
  * hide — the decoder must read the format as published.
  */
class MediaCodecSpec extends AnyFunSuite {

  /** 4-sample 44.1 kHz mono PCM16 WAV, assembled byte by byte. */
  private def handWav(samples: Seq[Short] = Seq(1000, -2000, 32767, -32768),
      rate: Int = 44100): Array[Byte] = {
    val data = samples.length * 2
    val b = ByteBuffer.allocate(44 + data).order(ByteOrder.LITTLE_ENDIAN)
    b.put("RIFF".getBytes("ASCII")).putInt(36 + data)
      .put("WAVE".getBytes("ASCII"))
    b.put("fmt ".getBytes("ASCII")).putInt(16)
      .putShort(1).putShort(1).putInt(rate).putInt(rate * 2)
      .putShort(2).putShort(16)
    b.put("data".getBytes("ASCII")).putInt(data)
    samples.foreach(b.putShort)
    b.array()
  }

  test("decodeWav reads a hand-assembled PCM WAV exactly") {
    val info = MediaCodec.decodeWav(handWav())
    assert(info.sample_rate === 44100)
    assert(info.n_channels === 1)
    assert(info.bits_per_sample === 16)
    assert(info.n_samples === 4L)
    assert(info.duration_us === 4L * 1000000L / 44100L) // 90
    assert(info.peak === 32768)
    // 1000² + 2000² + 32767² + 32768² — hand-computed
    assert(info.energy === 1000000L + 4000000L + 1073676289L + 1073741824L)
  }

  test("decodeWav walks past an unknown odd-sized chunk (RIFF pad byte)") {
    val samples = Array[Short](5, -5, 17)
    // LIST chunk with a 5-byte body → 1 pad byte before the next chunk
    val wav = MediaCodec.encodeWavPcm16Mono(samples, 8000,
      extraChunk = Some(("LIST", Array[Byte](1, 2, 3, 4, 5))))
    val info = MediaCodec.decodeWav(wav)
    assert(info.n_samples === 3L)
    assert(info.peak === 17)
    assert(info.energy === 25L + 25L + 289L)
    assert(info.sample_rate === 8000)
  }

  test("decodeWav rejects bad magic, truncated chunks, and missing data") {
    val good = handWav()
    val badMagic = good.clone(); badMagic(0) = 'X'.toByte
    intercept[IllegalArgumentException](MediaCodec.decodeWav(badMagic))
    // declared data size overruns the file
    val truncated = good.take(good.length - 2)
    intercept[IllegalArgumentException](MediaCodec.decodeWav(truncated))
    // fmt-only file: no data chunk
    intercept[IllegalArgumentException](MediaCodec.decodeWav(good.take(36)))
  }

  /** 2×2 bottom-up 24-bit BMP, assembled byte by byte: logical top row
    * bytes [1..6], bottom row [7..12]; stride 8 → 2 pad bytes per row;
    * STORED first row is the logical BOTTOM row.
    */
  private def handBmp(height: Int = 2): Array[Byte] = {
    val stride = 8; val img = stride * 2
    val b = ByteBuffer.allocate(54 + img).order(ByteOrder.LITTLE_ENDIAN)
    b.put('B'.toByte).put('M'.toByte).putInt(54 + img)
      .putShort(0).putShort(0).putInt(54)
    b.putInt(40).putInt(2).putInt(height).putShort(1).putShort(24)
      .putInt(0).putInt(img).putInt(2835).putInt(2835).putInt(0).putInt(0)
    val rows = Seq(Array[Byte](7, 8, 9, 10, 11, 12, 0, 0), // stored first
                   Array[Byte](1, 2, 3, 4, 5, 6, 0, 0))
    val ordered = if (height > 0) rows else rows.reverse
    ordered.foreach(b.put)
    b.array()
  }

  test("decodeBmp reads a hand-assembled bottom-up BMP exactly") {
    val info = MediaCodec.decodeBmp(handBmp())
    assert(info.width === 2)
    assert(info.height === 2)
    assert(info.bpp === 24)
    assert(info.file_size === 70L)
    assert(info.pix_sum === (1 to 12).sum.toLong) // padding excluded
    assert(info.first_row_sum === (1 to 6).sum.toLong) // logical TOP row
  }

  test("decodeBmp honors top-down storage (negative height)") {
    val info = MediaCodec.decodeBmp(handBmp(height = -2))
    assert(info.height === 2)
    assert(info.pix_sum === (1 to 12).sum.toLong)
    assert(info.first_row_sum === (1 to 6).sum.toLong)
  }

  test("decodeBmp rejects bad magic and overrunning pixel arrays") {
    val good = handBmp()
    val bad = good.clone(); bad(0) = 'X'.toByte
    intercept[IllegalArgumentException](MediaCodec.decodeBmp(bad))
    intercept[IllegalArgumentException](
      MediaCodec.decodeBmp(good.take(good.length - 4)))
  }

  test("encodeBmp24 round-trips widths that need stride padding") {
    for (w <- 1 to 5; h <- Seq(1, 3)) {
      val n = w * h * 3
      val bmp = MediaCodec.encodeBmp24(w, h, k => (k * 11 + 7) % 256)
      val info = MediaCodec.decodeBmp(bmp)
      assert(info.width === w && info.height === h)
      assert(info.file_size === bmp.length.toLong)
      assert(info.pix_sum ===
        (0 until n).map(k => ((k * 11 + 7) % 256).toLong).sum)
      assert(info.first_row_sum ===
        (0 until 3 * w).map(k => ((k * 11 + 7) % 256).toLong).sum)
    }
  }

  test("decodeWavSamples returns the exact frames, skipping unknown chunks") {
    assert(MediaCodec.decodeWavSamples(handWav()).toSeq ===
      Seq[Short](1000, -2000, 32767, -32768))
    val withList = MediaCodec.encodeWavPcm16Mono(Array[Short](3, -4), 8000,
      extraChunk = Some(("LIST", Array[Byte](9, 9, 9))))
    assert(MediaCodec.decodeWavSamples(withList).toSeq === Seq[Short](3, -4))
  }

  test("decodeBmpPixels unwinds bottom-up rows and strips padding") {
    assert(MediaCodec.decodeBmpPixels(handBmp()).toSeq ===
      (1 to 12).map(_.toByte))
    assert(MediaCodec.decodeBmpPixels(handBmp(height = -2)).toSeq ===
      (1 to 12).map(_.toByte))
  }

  test("encodeWavPcm16Mono emits the published 44-byte header layout") {
    val wav = MediaCodec.encodeWavPcm16Mono(Array[Short](1, 2), 16000)
    val b = ByteBuffer.wrap(wav).order(ByteOrder.LITTLE_ENDIAN)
    assert(new String(wav, 0, 4, "ASCII") === "RIFF")
    assert(b.getInt(4) === 36 + 4)
    assert(new String(wav, 8, 4, "ASCII") === "WAVE")
    assert(new String(wav, 12, 4, "ASCII") === "fmt ")
    assert(b.getInt(16) === 16)
    assert(b.getShort(20) === 1)      // PCM
    assert(b.getShort(22) === 1)      // mono
    assert(b.getInt(24) === 16000)    // rate
    assert(b.getInt(28) === 32000)    // byte rate
    assert(b.getShort(32) === 2)      // block align
    assert(b.getShort(34) === 16)     // bits
    assert(new String(wav, 36, 4, "ASCII") === "data")
    assert(b.getInt(40) === 4)
    assert(b.getShort(44) === 1 && b.getShort(46) === 2)
  }

  test("nearest-neighbor 4x4 resample samples the hand-computed source pixels") {
    // 8×4 image, byte value = logical byte index — so sampled values
    // are readable off the coordinate map: sx = 2x, sy = y,
    // p = (y·8 + 2x), channel byte = p·3 + ch
    val bmp = graft.ops.MediaCodec.encodeBmp24(8, 4, k => k % 256)
    val pix = graft.ops.MediaCodec.decodeBmpPixels(bmp)
    assert(pix.length === 8 * 4 * 3)
    for (y <- 0 until 4; x <- 0 until 4) {
      val sx = x * 8 / 4
      val sy = y * 4 / 4
      val p = (sy * 8 + sx) * 3
      assert((pix(p) & 0xff) === (p % 256), s"($x,$y)")
      assert((pix(p + 1) & 0xff) === ((p + 1) % 256), s"($x,$y)")
      assert((pix(p + 2) & 0xff) === ((p + 2) % 256), s"($x,$y)")
    }
    // a 1×1 source maps every output pixel to the single source pixel
    val tiny = graft.ops.MediaCodec.encodeBmp24(1, 1, k => 10 + k)
    val tp = graft.ops.MediaCodec.decodeBmpPixels(tiny)
    for (y <- 0 until 4; x <- 0 until 4) {
      val sx = x * 1 / 4; val sy = y * 1 / 4
      assert(sx === 0 && sy === 0)
    }
    assert((tp(0) & 0xff, tp(1) & 0xff, tp(2) & 0xff) === ((10, 11, 12)))
  }
  // ───────────────────── Y4M (YUV4MPEG2) ─────────────────────

  test("Y4M roundtrip: header fields, frame count, and decoded luma " +
    "stats match the generator") {
    val y4m = MediaCodec.encodeY4m(3, 2, 30000, 1001, 4,
      (f, pl, p) => (p * 10 + f + pl * 50) % 256)
    val info = MediaCodec.decodeY4m(y4m)
    assert(info === MediaCodec.Y4mInfo(3, 2, 30000, 1001, 4))
    val stats = MediaCodec.decodeY4mLumaStats(y4m)
    assert(stats.length === 4)
    for (f <- 0 until 4) {
      val ys = (0 until 6).map(p => (p * 10 + f) % 256)
      assert(stats(f) === ((ys.map(_.toLong).sum, ys.min, ys.max)), s"frame $f")
    }
  }

  test("Y4M decoder tolerates unknown header and per-frame parameters " +
    "(hand-assembled fixture)") {
    // stream header with an X extension param; frames carry their own
    // parameters after the FRAME marker — both legal in the mjpegtools
    // format and both must be skipped, not parsed
    val planes = Array.tabulate(3 * 2 * 2)(i => (i * 3 % 256).toByte)
    val bytes =
      "YUV4MPEG2 W2 H2 F25:1 Ip A1:1 C444 XCOLORRANGE=FULL\n".getBytes("ASCII") ++
        "FRAME Xgood\n".getBytes("ASCII") ++ planes ++
        "FRAME\n".getBytes("ASCII") ++ planes
    val info = MediaCodec.decodeY4m(bytes)
    assert(info === MediaCodec.Y4mInfo(2, 2, 25, 1, 2))
    val stats = MediaCodec.decodeY4mLumaStats(bytes)
    val ys = (0 until 4).map(p => p * 3 % 256)
    assert(stats.toSeq === Seq.fill(2)((ys.map(_.toLong).sum, ys.min, ys.max)))
  }

  test("Y4M decoder rejects bad magic, subsampled color, and truncation") {
    val good = MediaCodec.encodeY4m(2, 2, 25, 1, 1, (_, _, _) => 7)
    intercept[IllegalArgumentException] {
      MediaCodec.decodeY4m("JUNK4MPEG W2 H2 F25:1 C444\n".getBytes("ASCII"))
    }
    intercept[IllegalArgumentException] {
      MediaCodec.decodeY4m(
        "YUV4MPEG2 W2 H2 F25:1 C420jpeg\nFRAME\n".getBytes("ASCII") ++
          Array.fill(6)(0.toByte))
    }
    intercept[IllegalArgumentException] {
      MediaCodec.decodeY4m(good.dropRight(1)) // last plane byte missing
    }
  }

}
