package graft.llm

import java.nio.charset.StandardCharsets.UTF_8

import org.scalatest.funsuite.AnyFunSuite

import graft.llm.Multimodal.{GvidCodec, PpmCodec, WavCodec}

/** Pure-JVM codec tests — no Spark. The DataFrame-level plumbing is covered
  * by LlmOpsSpec ("multimodal media frames decode ...") and the q29/q50
  * DuckDB oracles. */
class MultimodalSpec extends AnyFunSuite {

  test("PPM round-trip: encode then decode recovers dims, maxval, pixels") {
    val px = Array.tabulate(2 * 3 * 3)(i => (i * 7).toByte)
    val ppm = PpmCodec.decode(PpmCodec.encode(2, 3, px))
    assert((ppm.width, ppm.height, ppm.maxVal) === (2, 3, 255))
    assert(ppm.pixels.toSeq === px.toSeq)
  }

  test("PPM decode handles comments and arbitrary header whitespace") {
    val raster = Array.tabulate(6)(_.toByte)
    val header = "P6 # a comment\n# another full-line comment\n 2\t1 # dims done\n255\n"
    val ppm = PpmCodec.decode(header.getBytes(UTF_8) ++ raster)
    assert((ppm.width, ppm.height) === (2, 1))
    assert(ppm.pixels.toSeq === raster.toSeq)
  }

  test("PPM decode rejects malformed input loudly") {
    val ok = PpmCodec.encode(2, 1, Array.fill(6)(1.toByte))
    // wrong magic
    val badMagic = ok.clone(); badMagic(1) = '5'
    assertThrows[IllegalArgumentException](PpmCodec.decode(badMagic))
    // truncated raster
    assertThrows[IllegalArgumentException](PpmCodec.decode(ok.dropRight(1)))
    // 16-bit maxval (unsupported)
    assertThrows[IllegalArgumentException](
      PpmCodec.decode("P6\n1 1\n65535\n".getBytes(UTF_8) ++ Array.fill[Byte](3)(0)))
    // zero dims
    assertThrows[IllegalArgumentException](
      PpmCodec.decode("P6\n0 1\n255\n".getBytes(UTF_8)))
  }

  test("WAV round-trip: PCM16 mono samples and header survive") {
    val samples = Array[Short](0, 1, -1, 32767, -32768, 12345)
    val wav = WavCodec.decode(WavCodec.encode(samples, 44100))
    assert((wav.sampleRate, wav.nChannels, wav.bitsPerSample) === (44100, 1, 16))
    assert(wav.samples.toSeq === samples.toSeq)
  }

  test("WAV decoder walks past unknown chunks (LIST before data)") {
    val base = WavCodec.encode(Array[Short](7, -7, 300), 8000)
    // splice an odd-sized LIST chunk between fmt and data (ends at offset 36)
    val listBody = Array[Byte](1, 2, 3) // size 3 -> padded to 4 in the stream
    val chunk = java.nio.ByteBuffer.allocate(8 + 4)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .put("LIST".getBytes(UTF_8)).putInt(listBody.length).put(listBody).put(0.toByte)
      .array()
    val spliced = base.take(36) ++ chunk ++ base.drop(36)
    val wav = WavCodec.decode(spliced)
    assert(wav.samples.toSeq === Seq[Short](7, -7, 300))
  }

  test("WAV round-trip survives the full byte range of document-derived samples") {
    // every possible text byte maps into [-32768, 32512] step 256
    val samples = (0 until 256).map(b => ((b - 128) * 256).toShort).toArray
    val wav = WavCodec.decode(WavCodec.encode(samples, 8000))
    assert(wav.samples.toSeq === samples.toSeq)
  }

  test("WAV decoder rejects non-PCM, bad framing, and overrunning chunks") {
    val ok = WavCodec.encode(Array[Short](1, 2), 8000)
    val notRiff = ok.clone(); notRiff(0) = 'X'
    assertThrows[IllegalArgumentException](WavCodec.decode(notRiff))
    // audioFormat = 3 (IEEE float) at offset 20
    val float32 = ok.clone(); float32(20) = 3
    assertThrows[IllegalArgumentException](WavCodec.decode(float32))
    // data chunk size overruns the file
    val overrun = ok.clone(); overrun(40) = 99
    assertThrows[IllegalArgumentException](WavCodec.decode(overrun))
  }

  test("PNG round-trip: ImageIO encode then decode recovers the exact raster") {
    import graft.llm.Multimodal.PngCodec
    val pixels = Array.tabulate(4 * 3 * 3)(i => ((i * 37 + 11) % 256).toByte)
    val png = PngCodec.encode(4, 3, pixels)
    assert(PngCodec.isPng(png), "encoded payload must carry the PNG signature")
    val back = PngCodec.decode(png)
    assert(back.width === 4 && back.height === 3 && back.maxVal === 255)
    assert(back.pixels.toSeq === pixels.toSeq, "PNG is lossless RGB — raster must survive")
  }

  test("sniffing decodeImage dispatches PNG vs PPM; rejects garbage loudly") {
    import graft.llm.Multimodal.{decodeImage, PngCodec}
    val pixels = Array.tabulate(2 * 2 * 3)(i => (i * 19).toByte)
    val asPng = decodeImage(PngCodec.encode(2, 2, pixels))
    val asPpm = decodeImage(PpmCodec.encode(2, 2, pixels))
    assert(asPng.pixels.toSeq === asPpm.pixels.toSeq)
    assert(asPng.width === asPpm.width && asPng.height === asPpm.height)
    // non-image bytes fail on the PPM branch's loud magic check
    val e = intercept[IllegalArgumentException](decodeImage("not an image".getBytes(UTF_8)))
    assert(e.getMessage.contains("magic"))
    // a PNG signature with a corrupt body fails on the PNG branch
    val broken = PngCodec.encode(2, 2, pixels).take(12)
    intercept[Exception](decodeImage(broken))
  }

  test("GVID round-trip: dims, frame count, and frame bytes survive") {
    val frames = Array.tabulate(3 * 4)(i => (i * 11).toByte) // 3 frames of 2x2
    val v = GvidCodec.decode(GvidCodec.encode(2, 2, frames))
    assert((v.width, v.height, v.nFrames) === (2, 2, 3))
    assert(v.frames.toSeq === frames.toSeq)
  }

  test("GVID decode rejects malformed input loudly") {
    val ok = GvidCodec.encode(2, 1, Array.fill(4)(7.toByte))
    val badMagic = ok.clone(); badMagic(2) = '2'
    assertThrows[IllegalArgumentException](GvidCodec.decode(badMagic))
    assertThrows[IllegalArgumentException](GvidCodec.decode(ok.dropRight(1)))
    assertThrows[IllegalArgumentException](
      GvidCodec.decode("GV1\n0 1 1\n".getBytes(UTF_8)))
    assertThrows[IllegalArgumentException](
      GvidCodec.encode(2, 1, Array.fill(3)(0.toByte))) // not a whole frame
    // geometry whose Int product wraps (each value under the per-value cap)
    // must fail the truncation check loudly, not pass with a wrapped `need`
    val wrapped = GvidCodec.decode _
    val e = intercept[IllegalArgumentException](
      wrapped(("GV1\n100000 100000 10\n" + "x" * 64).getBytes(UTF_8)))
    assert(e.getMessage.contains("truncated frames"), e.getMessage)
  }

  test("JPEG round-trip: dims exact, pixels bounded-error, decode deterministic") {
    import graft.llm.Multimodal.JpegCodec
    // a fixture-profile raster: ASCII-ish text bytes zero-padded to 16x3
    val text = ("graft jpeg codec fixture " * 6).getBytes(UTF_8)
    val pixels = java.util.Arrays.copyOf(text, 16 * 3 * 3)
    val jpg = JpegCodec.encode(16, 3, pixels)
    assert(JpegCodec.isJpeg(jpg), "encoded payload must carry the SOI signature")
    val back = JpegCodec.decode(jpg)
    // geometry survives the lossy roundtrip EXACTLY
    assert(back.width === 16 && back.height === 3 && back.maxVal === 255)
    // pixel content survives approximately: mean absolute error bounded
    val mae = pixels.indices.map(i =>
      math.abs((pixels(i) & 0xff) - (back.pixels(i) & 0xff))).sum.toDouble / pixels.length
    assert(mae < 30.0, s"JPEG mean abs pixel error $mae — decoder produced garbage")
    // decode of a FIXED payload is deterministic
    assert(JpegCodec.decode(jpg).pixels.toSeq === back.pixels.toSeq)
  }

  test("JPEG fixture golden: a pinned payload decodes to pinned stats") {
    import graft.llm.Multimodal.JpegCodec
    // a real ImageIO-encoded JPEG of the 16x2 raster of
    // "the quick brown fox jumps over the lazy dog 0123456789 grafted
    // onto spark" (73 UTF-8 bytes zero-padded to 96) — pinned bytes, so
    // the decode side is tested against a stored artifact, independent of
    // the encoder (the q33 rows-only precedent, tightened to goldens)
    val b64 =
      "/9j/4AAQSkZJRgABAgAAAQABAAD/2wBDAAgGBgcGBQgHBwcJCQgKDBQNDAsLDBkSEw8UHRofHh0aHBwgJC4nICIsIxwcKDcpLDAxNDQ0Hyc5PTgyPC4zNDL/2wBDAQkJCQwLDBgNDRgyIRwhMjIyMjIyMjIyMjIyMjIyMjIyMjIyMjIyMjIyMjIyMjIyMjIyMjIyMjIyMjIyMjIyMjL/wAARCAACABADASIAAhEBAxEB/8QAHwAAAQUBAQEBAQEAAAAAAAAAAAECAwQFBgcICQoL/8QAtRAAAgEDAwIEAwUFBAQAAAF9AQIDAAQRBRIhMUEGE1FhByJxFDKBkaEII0KxwRVS0fAkM2JyggkKFhcYGRolJicoKSo0NTY3ODk6Q0RFRkdISUpTVFVWV1hZWmNkZWZnaGlqc3R1dnd4eXqDhIWGh4iJipKTlJWWl5iZmqKjpKWmp6ipqrKztLW2t7i5usLDxMXGx8jJytLT1NXW19jZ2uHi4+Tl5ufo6erx8vP09fb3+Pn6/8QAHwEAAwEBAQEBAQEBAQAAAAAAAAECAwQFBgcICQoL/8QAtREAAgECBAQDBAcFBAQAAQJ3AAECAxEEBSExBhJBUQdhcRMiMoEIFEKRobHBCSMzUvAVYnLRChYkNOEl8RcYGRomJygpKjU2Nzg5OkNERUZHSElKU1RVVldYWVpjZGVmZ2hpanN0dXZ3eHl6goOEhYaHiImKkpOUlZaXmJmaoqOkpaanqKmqsrO0tba3uLm6wsPExcbHyMnK0tPU1dbX2Nna4uPk5ebn6Onq8vP09fb3+Pn6/9oADAMBAAIRAxEAPwDlLF2ksEd2LNvByTk/fH+J/OvN7jUb4yyoby4KbsbfNbGB070UVo9n/XRBT/g/9vH/2Q=="
    val payload = java.util.Base64.getDecoder.decode(b64)
    assert(JpegCodec.isJpeg(payload))
    val img = Multimodal.decodeImage(payload) // through the sniffing dispatch
    assert(img.width === 16 && img.height === 2)
    var sum = 0L
    val ch = new Array[Long](3)
    var i = 0
    while (i < img.pixels.length) {
      val v = img.pixels(i) & 0xff
      sum += v; ch(i % 3) += v; i += 1
    }
    assert(sum === 6569L, s"byte_sum drifted: $sum")
    assert(ch.toSeq === Seq(2129L, 2073L, 2367L), s"channel sums drifted: ${ch.toSeq}")
    // and the golden sits within the q80 tolerance of its source raster
    // (source sums 6468 / r=2090 g=2014 b=2364 over 32 pixels)
    assert(math.abs(sum - 6468L) / 96.0 <= 8.0)
    assert(math.abs(ch(0) - 2090L) / 32.0 <= 16.0)
    assert(math.abs(ch(1) - 2014L) / 32.0 <= 16.0)
    assert(math.abs(ch(2) - 2364L) / 32.0 <= 16.0)
  }

  test("sniffing decodeImage dispatches JPEG alongside PNG and PPM") {
    import graft.llm.Multimodal.{decodeImage, JpegCodec, PngCodec}
    val pixels = Array.tabulate(8 * 2 * 3)(i => ((i * 13 + 40) % 256).toByte)
    val viaJpeg = decodeImage(JpegCodec.encode(8, 2, pixels))
    val viaPng = decodeImage(PngCodec.encode(8, 2, pixels))
    assert(viaJpeg.width === viaPng.width && viaJpeg.height === viaPng.height)
    // JPEG approximates what PNG preserves exactly
    val mae = pixels.indices.map(i =>
      math.abs((viaPng.pixels(i) & 0xff) - (viaJpeg.pixels(i) & 0xff)))
      .sum.toDouble / pixels.length
    assert(mae < 30.0)
    // an SOI signature with a corrupt body fails loudly on the JPEG branch
    intercept[Exception](decodeImage(JpegCodec.encode(8, 2, pixels).take(8)))
  }

  test("video decimation: every stride-th frame survives byte-exact, geometry updates") {
    // 7 frames of 2x2; stride 3 keeps frames 0, 3, 6
    val frames = Array.tabulate(7 * 4)(i => (i * 5 + 1).toByte)
    val v = GvidCodec.decode(GvidCodec.encode(2, 2, frames))
    assert(v.nFrames === 7)
    // the operator itself is exercised through Spark in q81; here the
    // codec-level invariant: re-encoding kept frames loses nothing
    val kept = Array(0, 3, 6).flatMap(f => frames.slice(f * 4, f * 4 + 4))
    val re = GvidCodec.decode(GvidCodec.encode(2, 2, kept))
    assert(re.nFrames === 3)
    assert(re.frames.toSeq === kept.toSeq)
  }
}
